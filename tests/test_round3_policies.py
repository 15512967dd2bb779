"""Consolidation policies (index_utils.hpp analogues): pure selection
semantics + policy-driven partial consolidation of a streaming index."""

from __future__ import annotations

import pytest

from iresearch_spark.index.policies import (
    SegmentStats,
    select,
    select_bytes,
    select_bytes_accum,
    select_count,
    select_docs_fill,
    select_docs_live,
    select_tier,
    tier_score,
)
from iresearch_spark.search import SearchEngine, Term
from iresearch_spark.streaming.incremental import IncrementalIndexer


def seg(i, size, docs=100, live=None):
    return SegmentStats(
        id=f"s{i}", size=size, docs=docs, live_docs=live if live is not None else docs
    )


def test_count_policy():
    segs = [seg(i, 100) for i in range(5)]
    assert select_count(segs, 3) == ["s0", "s1", "s2"]
    assert select(segs, "count", threshold=0) == []


def test_bytes_policy_selects_below_threshold_x_mean():
    # sizes 10,10,10,70 -> mean 25; threshold 1.0 keeps those < 25
    segs = [seg(0, 10), seg(1, 10), seg(2, 10), seg(3, 70)]
    assert select_bytes(segs, 1.0) == ["s0", "s1", "s2"]
    assert select_bytes(segs, 3.0) == ["s0", "s1", "s2", "s3"]


def test_bytes_accum_smallest_first():
    # total 100; threshold .5: 10 -> (10+0)/100 ok, 20 -> 30/100 ok,
    # 30 -> 60/100 > .5 stop; 40 no
    segs = [seg(0, 40), seg(1, 10), seg(2, 30), seg(3, 20)]
    assert select_bytes_accum(segs, 0.5) == ["s1", "s3"]


def test_docs_live_and_fill():
    segs = [seg(0, 10, docs=100, live=100), seg(1, 10, docs=100, live=40)]
    # avg live = 70; threshold 1.0: keep those with live <= 70
    assert select_docs_live(segs, 1.0) == ["s1"]
    # fill: s1 fill=.4 < .5
    assert select_docs_fill(segs, 0.5) == ["s1"]
    assert select_docs_fill(segs, 0.3) == []


def test_tier_prefers_even_small_groups():
    # three even small segments + one huge: the huge one must not be in
    # the best candidate (skew kills the CV term and size term)
    segs = [seg(0, 100), seg(1, 110), seg(2, 90), seg(3, 100_000)]
    got = select_tier(
        segs, min_segments=2, max_segments=3, floor_segment_bytes=1
    )
    assert sorted(got) == ["s0", "s1", "s2"]


def test_tier_respects_max_bytes_and_min_segments():
    segs = [seg(i, 100) for i in range(4)]
    assert (
        select_tier(segs, min_segments=5, max_segments=8, floor_segment_bytes=1)
        == []
    )
    got = select_tier(
        segs,
        min_segments=2,
        max_segments=4,
        max_segments_bytes=250,
        floor_segment_bytes=1,
    )
    assert len(got) == 2  # 3 segments would exceed 250 bytes


def test_tier_score_favors_cleaning_removals():
    clean = [seg(0, 100), seg(1, 100)]
    dirty = [seg(0, 100, docs=100, live=50), seg(1, 100, docs=100, live=50)]
    assert tier_score(dirty, 10, 1) > tier_score(clean, 10, 1)


def test_policy_driven_consolidation_of_streaming_index(spark, tmp_path):
    ix = IncrementalIndexer(index_dir=str(tmp_path / "ixp"), bucket_bits=7)
    for e in range(3):
        docs = spark.createDataFrame(
            [
                (f"u{e}_{i:03d}", f"alpha epoch{e} doc{i % 3}")
                for i in range(20)
            ],
            "url string, text string",
        )
        ix.process_batch(docs, epoch_id=e)
    before = ix.read(spark)
    eng = SearchEngine(before)
    want_alpha = eng.matches(Term("alpha")).count()
    want_e1 = eng.matches(Term("epoch1")).count()
    assert (want_alpha, want_e1) == (60, 20)

    stats = ix.segment_stats()
    assert [s.docs for s in stats] == [20, 20, 20]
    assert all(s.size > 0 for s in stats)

    plan = ix.plan_consolidation(policy="count", threshold=2)
    assert plan == ["seg_0", "seg_1"]
    new_id = ix.consolidate_segments(spark, plan)
    assert new_id is not None

    manifest = ix._read_manifest()
    ids = [s["id"] for s in manifest["segments"]]
    assert ids == [new_id, "seg_2"]
    merged_entry = manifest["segments"][0]
    assert merged_entry["consolidated_from"] == ["seg_0", "seg_1"]
    assert merged_entry["n_docs"] == 40
    assert manifest["next_doc_id"] == 60  # untouched

    after = ix.read(spark)
    eng2 = SearchEngine(after)
    assert eng2.matches(Term("alpha")).count() == want_alpha
    assert eng2.matches(Term("epoch1")).count() == want_e1
    # old segment dirs are gone
    import os

    segdirs = sorted(os.listdir(tmp_path / "ixp" / "segments"))
    assert segdirs == sorted([new_id, "seg_2"])


def test_consolidate_requires_two_segments(spark, tmp_path):
    ix = IncrementalIndexer(index_dir=str(tmp_path / "ixq"), bucket_bits=7)
    docs = spark.createDataFrame(
        [("u0", "alpha beta")], "url string, text string"
    )
    ix.process_batch(docs, epoch_id=0)
    assert ix.consolidate_segments(spark, ["seg_0"]) is None
    with pytest.raises(ValueError):
        ix.consolidate_segments(spark, ["seg_0", "nope"])
