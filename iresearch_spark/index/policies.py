"""Consolidation policies: decide WHICH segments to merge.

Reference: `core/utils/index_utils.hpp:30-84` (ConsolidateBytes /
BytesAccum / Count / DocsLive / DocsFill / Tier option structs, each
with its selection formula in the comment) and
`core/utils/index_utils.cpp:95-168` (tier candidate scoring) /
`:307-473` (tier candidate enumeration). Semantics re-derived here as
driver-side pure Python over per-segment stats — policy selection is a
planning step over a handful of numbers and needs no Spark job; the
merge itself is the Spark union in `merge.py` /
`IncrementalIndexer.consolidate_segments`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass
class SegmentStats:
    """What a policy sees per segment. `size` is the segment's on-disk
    bytes; `docs`/`live_docs` are total vs non-deleted doc counts."""

    id: str
    size: int
    docs: int
    live_docs: int

    @property
    def removed(self) -> int:
        return self.docs - self.live_docs

    @property
    def fill_factor(self) -> float:
        return self.live_docs / self.docs if self.docs else 0.0

    @property
    def live_size(self) -> float:
        """Estimated bytes after purging deletes (byte_size * fill) —
        the reference's tier::SegmentStats.size."""
        return self.size * self.fill_factor


def select_count(segments: list[SegmentStats], threshold: int) -> list[str]:
    """Merge the first `threshold` segments (ConsolidateCount)."""
    return [s.id for s in segments[: max(0, int(threshold))]]


def select_bytes(segments: list[SegmentStats], threshold: float) -> list[str]:
    """Merge segments with threshold > segment_bytes /
    (all_segment_bytes / #segments) (ConsolidateBytes) — i.e. segments
    smaller than `threshold` x the mean segment size."""
    if not segments:
        return []
    avg = sum(s.size for s in segments) / len(segments)
    return [s.id for s in segments if threshold > (s.size / avg if avg else 0)]


def select_bytes_accum(
    segments: list[SegmentStats], threshold: float
) -> list[str]:
    """Accumulate smallest-first while threshold >= (segment_bytes +
    accumulated_bytes) / all_segment_bytes (ConsolidateBytesAccum)."""
    total = sum(s.size for s in segments)
    if not total:
        return [s.id for s in segments]
    out, acc = [], 0
    for s in sorted(segments, key=lambda s: (s.size, s.id)):
        if threshold >= (s.size + acc) / total:
            out.append(s.id)
            acc += s.size
    return out


def select_docs_live(
    segments: list[SegmentStats], threshold: float
) -> list[str]:
    """Merge segments with threshold >= segment_live_docs /
    (total_live_docs / #segments) (ConsolidateDocsLive)."""
    if not segments:
        return []
    avg = sum(s.live_docs for s in segments) / len(segments)
    return [
        s.id for s in segments if threshold >= (s.live_docs / avg if avg else 0)
    ]


def select_docs_fill(
    segments: list[SegmentStats], threshold: float
) -> list[str]:
    """Merge segments with threshold > live / (live + removed)
    (ConsolidateDocsFill) — i.e. segments whose fill factor dropped
    below `threshold` from deletions."""
    return [
        s.id
        for s in segments
        if s.docs and threshold > (s.live_docs / s.docs)
    ]


def tier_score(
    candidate: list[SegmentStats],
    segments_per_tier: int,
    floor_segment_bytes: int,
) -> float:
    """The reference's consolidation score
    (`index_utils.cpp:95-168`): start from 1 - coefficient_of_variation
    of the (floored) live sizes — even candidates beat skewed ones —
    then favor candidates near `segments_per_tier` segments
    (* (count/tier)^1.5), prefer smaller consolidations
    (/ sqrt(total_live_size)), and favor ones that clean out removals
    (/ (live_size/byte_size)^2)."""
    if len(candidate) == 0:
        return -math.inf
    if len(candidate) == 1:
        s = candidate[0]
        # singleton only makes sense when it cleans removals, and only
        # as a last resort
        return -math.inf if s.removed == 0 else -math.inf + 1.0
    size_before = sum(s.size for s in candidate)
    size_after = sum(s.live_size for s in candidate)
    floored = [max(s.live_size, floor_segment_bytes) for s in candidate]
    mean = sum(floored) / len(candidate)
    var = sum((f - mean) ** 2 for f in floored) / len(candidate)
    cv = math.sqrt(var) / mean if mean else 0.0
    score = 1.0 - cv
    score *= (len(candidate) / segments_per_tier) ** 1.5
    if size_after > 0:
        score /= size_after ** 0.5
        score /= (size_after / size_before) ** 2
    return score


def select_tier(
    segments: list[SegmentStats],
    min_segments: int = 1,
    max_segments: int = 10,
    max_segments_bytes: int = 5 * (1 << 30),
    floor_segment_bytes: int = 2 * (1 << 20),
    min_score: float = 0.0,
) -> list[str]:
    """Tiered selection (`index_utils.cpp:307-473`): drop empty
    segments; drop too-big segments (live size > max_segments_bytes/2
    with fill factor at least the index average); sort by live size;
    slide windows of min..max consecutive segments capped by
    `max_segments_bytes`; return the best-scoring window (ties keep the
    earlier window, as the reference's strict `<` does)."""
    max_segments = max(1, max_segments)
    min_segments = min(max(1, min_segments), max_segments)
    max_segments_bytes = max(1, max_segments_bytes)
    floor_segment_bytes = max(1, floor_segment_bytes)

    live = [s for s in segments if s.live_docs > 0]
    total_docs = sum(s.docs for s in live)
    total_live = sum(s.live_docs for s in live)
    if not total_docs:
        return []
    total_fill = total_live / total_docs
    too_big = max_segments_bytes / 2
    live = [
        s
        for s in live
        if not (s.live_size > too_big and total_fill <= s.fill_factor)
    ]
    live.sort(key=lambda s: (s.live_size, s.id))

    best: list[SegmentStats] = []
    best_score = -math.inf
    if len(live) >= min_segments:
        for i in range(len(live)):
            size = 0.0
            for j in range(i, min(len(live), i + max_segments)):
                size += live[j].live_size
                if size > max_segments_bytes:
                    break
                count = j - i + 1
                if count < min_segments:
                    continue
                cand = live[i : j + 1]
                score = tier_score(cand, max_segments, floor_segment_bytes)
                if score < min_score:
                    continue
                if best_score < score:
                    best, best_score = cand, score
    return [s.id for s in best]


_POLICIES = {
    "count": select_count,
    "bytes": select_bytes,
    "bytes_accum": select_bytes_accum,
    "docs_live": select_docs_live,
    "docs_fill": select_docs_fill,
    "tier": select_tier,
}


def select(segments: list[SegmentStats], policy: str, **opts) -> list[str]:
    """Dispatch by policy name (the registry analogue of
    `MakePolicy`)."""
    try:
        fn = _POLICIES[policy]
    except KeyError:
        raise ValueError(
            f"unknown policy {policy!r}; one of {sorted(_POLICIES)}"
        ) from None
    return fn(segments, **opts)
