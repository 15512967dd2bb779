"""Incremental (streaming) indexing — the reference's segment-append
model (`IndexWriter` flush/commit cycle + consolidation, SURVEY §2.6)
re-expressed as Structured Streaming foreachBatch.

Each micro-batch becomes one immutable SEGMENT: its own postings/docs/
term_stats parquet dirs under `<index_dir>/segments/seg_<epoch>`, plus
a lineage row (segment id, doc-id range, counts). The manifest commit
is atomic (write-temp + rename), so readers always see a consistent
set of fully-written segments — the two-phase `Begin()`/`Commit()`
equivalent. Doc ids are assigned per segment from a reserved range
(base = manifest high-watermark), so segments merge with a plain union
(merge.py).

Resumability: Structured Streaming's checkpointLocation replays failed
micro-batches; `_process_batch` is idempotent (a segment that already
exists in the manifest is skipped), giving exactly-once index commits —
the "resumable from checkpoint with per-partition lineage + metrics"
requirement of the north rule.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from iresearch_spark.analysis.analyzers import Analyzer, get_analyzer
from iresearch_spark.index.builder import build_index
from iresearch_spark.index.merge import build_metrics
from iresearch_spark.index.model import FieldStats, InvertedIndex


def _concat_ranges(paths, sub_manifests, key):
    """Concatenated absolute-path [min, max] file ranges of one
    dictionary layout across segments; None unless EVERY segment has
    the layout (a range-less segment's terms would otherwise be
    invisible to that seek path)."""
    if not all(m.get(key) for m in sub_manifests):
        return None
    return [
        (os.path.join(p, f), mn, mx)
        for p, m in zip(paths, sub_manifests)
        for f, mn, mx in m[key]
    ]


@dataclass
class IncrementalIndexer:
    index_dir: str
    analyzer: str = "simple"
    text_col: str = "text"
    sort_key: str = "url"
    with_positions: bool = True
    bucket_bits: int = 16
    # granular numeric dictionary per segment (index/numeric.py);
    # the merged view unions them when every segment agrees
    numeric_fields: list | None = None
    precision_step: int = 64
    # OFFS / PAY occurrence streams per segment (index_features.hpp):
    # the merged read enforces homogeneity, so highlight()/payloads()
    # work over streaming indexes exactly like batch saves
    with_offsets: bool = False
    payload_delimiter: str | None = None
    # at-rest encryption provider (index.encryption.IndexEncryption):
    # every segment's tables are sealed with Parquet Modular
    # Encryption exactly like a batch save(encryption=); the merged
    # read arms the session and decrypts transparently
    encryption: object | None = None

    def _wopts(self) -> dict:
        return (
            self.encryption.write_options()
            if self.encryption is not None
            else {}
        )

    # ---------------- manifest ----------------

    def _manifest_path(self) -> str:
        return os.path.join(self.index_dir, "manifest.json")

    def _read_manifest(self) -> dict:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"version": 0, "segments": [], "next_doc_id": 0}

    def _commit_manifest(self, manifest: dict) -> None:
        manifest["version"] += 1
        tmp = self._manifest_path() + ".tmp"
        os.makedirs(self.index_dir, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path())  # atomic commit

    # ---------------- batch processing ----------------

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch hook. Idempotent per epoch."""
        manifest = self._read_manifest()
        seg_id = f"seg_{epoch_id}"
        if any(s["id"] == seg_id for s in manifest["segments"]):
            return  # checkpoint replay — already committed
        n_rows = batch_df.count()
        if n_rows == 0:
            return
        base = manifest["next_doc_id"]
        # fused build with an id offset: the micro-batch's segment claims
        # the doc-id range [base, base+n) in one projected shuffle (no
        # separate window-rank pass per epoch)
        idx = build_index(
            batch_df,
            text_col=self.text_col,
            id_col=None,
            sort_key=self.sort_key,
            analyzer=self.analyzer,
            with_positions=self.with_positions,
            bucket_bits=self.bucket_bits,
            id_base=base,
            numeric_fields=self.numeric_fields,
            precision_step=self.precision_step,
            with_offsets=self.with_offsets,
            payload_delimiter=self.payload_delimiter,
        )
        seg_path = os.path.join(self.index_dir, "segments", seg_id)
        idx.save(seg_path, encryption=self.encryption)
        build_metrics(idx, self.bucket_bits).write.options(
            **self._wopts()
        ).mode("overwrite").parquet(
            os.path.join(seg_path, "metrics")
        )
        manifest["segments"].append(
            {
                "id": seg_id,
                "n_docs": idx.field_stats.n_docs,
                "total_term_freq": idx.field_stats.total_term_freq,
                "doc_id_base": base,
                "doc_id_end": base + n_rows,
                "committed_at": time.time(),
            }
        )
        manifest["next_doc_id"] = base + n_rows
        self._commit_manifest(manifest)

    # ---------------- streaming wiring ----------------

    def start(self, stream_df: DataFrame, checkpoint_dir: str, trigger_once=True):
        writer = stream_df.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    # ---------------- policy-driven consolidation ----------------

    def segment_stats(self, spark: SparkSession | None = None):
        """Per-segment `policies.SegmentStats` for policy selection:
        on-disk bytes (walked driver-side — the manifest lives on the
        same FS), doc counts from the manifest, deleted counts from the
        per-segment tombstone dirs (counted only when `spark` is given;
        otherwise deletes are assumed zero, which only makes docs_fill/
        tier slightly pessimistic about cleanup wins)."""
        from iresearch_spark.index.policies import SegmentStats

        manifest = self._read_manifest()
        out = []
        for s in manifest["segments"]:
            path = os.path.join(self.index_dir, "segments", s["id"])
            size = 0
            for root, _dirs, files in os.walk(path):
                for fn in files:
                    try:
                        size += os.path.getsize(os.path.join(root, fn))
                    except OSError:
                        pass
            removed = 0
            if spark is not None and os.path.isdir(
                os.path.join(path, "deleted")
            ):
                if self.encryption is not None:
                    self.encryption.apply(spark)
                removed = (
                    spark.read.parquet(os.path.join(path, "deleted"))
                    .select("doc_id")
                    .distinct()
                    .count()
                )
            out.append(
                SegmentStats(
                    id=s["id"],
                    size=size,
                    docs=s["n_docs"],
                    live_docs=s["n_docs"] - removed,
                )
            )
        return out

    def plan_consolidation(
        self,
        policy: str = "tier",
        spark: SparkSession | None = None,
        **opts,
    ) -> list[str]:
        """Segment ids the named policy would merge (ConsolidateTier /
        Bytes / BytesAccum / Count / DocsLive / DocsFill —
        `index_utils.hpp:30-84`). Pure planning; no data moves."""
        from iresearch_spark.index import policies

        return policies.select(self.segment_stats(spark), policy, **opts)

    def consolidate_segments(
        self,
        spark: SparkSession,
        seg_ids: list[str],
        reblock: bool = False,
        bucket_bits: int | None = None,
    ) -> str | None:
        """Merge the named segments into ONE new segment and atomically
        swap them in the manifest (the reference's
        `IndexWriter::Consolidate` on a policy's candidate set,
        `index_writer.cpp:1340`). Pending deletes inside the selected
        segments are purged during the rewrite (merge-time doc_id_map
        skip, `merge_writer.cpp:1448-1472`); unselected segments are
        untouched, readers see either the old or the new committed set.
        Returns the new segment id (None when <2 segments selected)."""
        from iresearch_spark.index.merge import (
            consolidate as _reblock,
            merge_indexes,
            purge_deleted,
        )

        chosen = set(seg_ids)
        manifest = self._read_manifest()
        sel = [s for s in manifest["segments"] if s["id"] in chosen]
        missing = chosen - {s["id"] for s in sel}
        if missing:
            raise ValueError(f"unknown segment ids: {sorted(missing)}")
        if len(sel) < 2:
            return None
        bits = bucket_bits if bucket_bits is not None else self.bucket_bits
        paths = [
            os.path.join(self.index_dir, "segments", s["id"]) for s in sel
        ]
        idx = InvertedIndex.load(spark, paths[0], encryption=self.encryption)
        for p in paths[1:]:
            idx = merge_indexes(
                idx, InvertedIndex.load(spark, p, encryption=self.encryption)
            )
        if idx.deleted is not None:
            idx = purge_deleted(idx, bits)
        elif reblock:
            idx = _reblock(idx, bits)
        new_id = f"seg_cons_{manifest['version'] + 1}"
        new_path = os.path.join(self.index_dir, "segments", new_id)
        idx.save(new_path, encryption=self.encryption)
        build_metrics(idx, bits).write.options(**self._wopts()).mode(
            "overwrite"
        ).parquet(
            os.path.join(new_path, "metrics")
        )
        entry = {
            "id": new_id,
            "n_docs": idx.field_stats.n_docs,
            "total_term_freq": idx.field_stats.total_term_freq,
            "doc_id_base": min(s["doc_id_base"] for s in sel),
            "doc_id_end": max(s["doc_id_end"] for s in sel),
            "consolidated_from": [s["id"] for s in sel],
            "committed_at": time.time(),
        }
        # swap in place of the first selected entry to keep manifest order
        segs, placed = [], False
        for s in manifest["segments"]:
            if s["id"] in chosen:
                if not placed:
                    segs.append(entry)
                    placed = True
            else:
                segs.append(s)
        manifest["segments"] = segs
        self._commit_manifest(manifest)
        # old dirs are unreachable once the manifest committed; a crash
        # here leaves harmless orphans, never a broken index
        import shutil

        for p in paths:
            shutil.rmtree(p, ignore_errors=True)
        return new_id

    # ---------------- reading ----------------

    def read(self, spark: SparkSession) -> InvertedIndex | None:
        """Point-in-time merged view of all committed segments (the
        reference DirectoryReader over SubReaders).

        ONE multi-path parquet scan per table + one stats aggregation,
        regardless of segment count: the earlier pairwise merge_indexes
        loop grew the plan (and re-aggregated term_stats) O(#segments),
        a driver-side plan explosion after months of daily micro-batches.
        Doc-id disjointness across segments is the manifest's contract,
        so a plain union IS the merged index."""
        import json as _json

        manifest = self._read_manifest()
        segs = manifest["segments"]
        if not segs:
            return None
        paths = [
            os.path.join(self.index_dir, "segments", s["id"]) for s in segs
        ]
        if len(paths) == 1:
            return InvertedIndex.load(
                spark, paths[0], encryption=self.encryption
            )
        sub_manifests = []
        for p in paths:
            with open(os.path.join(p, "manifest.json")) as f:
                sub_manifests.append(_json.load(f))
        if any(m.get("encryption") for m in sub_manifests):
            if self.encryption is None:
                raise ValueError(
                    "segments are encrypted: construct IncrementalIndexer"
                    " with encryption= to read them"
                )
        if self.encryption is not None:
            self.encryption.apply(spark)
        # the merged view assumes homogeneous feature/analyzer config
        # across segments (same contract merge_indexes enforces) —
        # a silent mismatch would drop positions/offsets or mix
        # incompatible token streams in one postings union
        for key in (
            "with_positions", "with_offsets", "with_payloads", "analyzer",
            "norm",
        ):
            vals = {m.get(key, False) for m in sub_manifests}
            if len(vals) > 1:
                raise ValueError(
                    f"segments disagree on {key!r}: {sorted(map(str, vals))}; "
                    "consolidate or rebuild before reading a merged view"
                )
        if any(m.get("has_deleted") for m in sub_manifests):
            # deletes are per-segment parquet dirs; only some exist, so
            # they can't ride one multi-path read
            parts = [
                spark.read.parquet(os.path.join(p, "deleted")).select("doc_id")
                for p, m in zip(paths, sub_manifests)
                if m.get("has_deleted")
            ]
            deleted = parts[0]
            for d in parts[1:]:
                deleted = deleted.unionByName(d)
            deleted = deleted.distinct()
        else:
            deleted = None
        # recursiveFileLookup: each segment's postings dir is its own
        # _tb=<bucket> partition tree; multiple partitioned roots in one
        # read trip partition discovery (CONFLICTING_DIRECTORY_STRUCTURES),
        # so read the files flat. Bucket pruning survives via the _tbd
        # DATA column each bucket file carries (written by
        # InvertedIndex.save since round 3): rename it to _tb and the
        # engine's postings_for_terms keeps its seek analogue — the
        # term-bucket predicate skips non-matching files on their
        # (constant per file) parquet min/max stats. Segments may have
        # different bucket counts, so term_buckets becomes the LIST of
        # distinct counts (pruning includes a term's bucket under every
        # count — over-includes, never drops).
        postings = spark.read.option("recursiveFileLookup", "true").parquet(
            *[os.path.join(p, "postings") for p in paths]
        )
        if all(m.get("tb_data_col") for m in sub_manifests):
            postings = postings.withColumnRenamed("_tbd", "_tb")
            counts = sorted({int(m["term_buckets"]) for m in sub_manifests})
            term_buckets = counts[0] if len(counts) == 1 else counts
        else:  # pre-_tbd segments in the mix: no bucket column to prune on
            term_buckets = None
        term_stats = (
            spark.read.parquet(*[os.path.join(p, "term_stats") for p in paths])
            .groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        )
        # granular numeric dictionary: one multi-path read when EVERY
        # segment carries a compatible layout (doc ids are disjoint, so
        # union == merged dictionary); a partial or mismatched set
        # degrades to the stored-column fallback (None) rather than
        # silently dropping some segments' docs from GranularRange
        num_terms = None
        numeric_meta = None
        metas = [m.get("numeric_meta") for m in sub_manifests]
        steps = {m.get("precision_step", 64) for m in sub_manifests}
        if all(metas) and len({json.dumps(x, sort_keys=True) for x in metas}) == 1 and len(steps) == 1:
            num_terms = spark.read.parquet(
                *[os.path.join(p, "num_terms") for p in paths]
            )
            numeric_meta = metas[0]
        return InvertedIndex(
            postings=postings,
            docs=spark.read.parquet(*[os.path.join(p, "docs") for p in paths]),
            term_stats=term_stats,
            field_stats=FieldStats(
                n_docs=sum(m["n_docs"] for m in sub_manifests),
                total_term_freq=sum(m["total_term_freq"] for m in sub_manifests),
                max_dl=(
                    max(m["max_dl"] for m in sub_manifests)
                    if all(m.get("max_dl") is not None for m in sub_manifests)
                    else None
                ),
            ),
            with_positions=sub_manifests[0]["with_positions"],
            with_offsets=sub_manifests[0].get("with_offsets", False),
            with_payloads=sub_manifests[0].get("with_payloads", False),
            norm=sub_manifests[0].get("norm", "norm2"),
            analyzer_name=sub_manifests[0]["analyzer"],
            deleted=deleted,
            term_buckets=term_buckets,
            # ALL dictionary layouts survive the merged view: lookups
            # intersect the CONCATENATED per-segment file ranges
            # (overlapping intervals — gram_df_duplicated routes the
            # accessors through a linear scan + a sum-df re-aggregation
            # so per-segment rows reconstitute global stats exactly;
            # doc ids are disjoint across segments). Without this,
            # every stats lookup on a merged view re-shuffled the FULL
            # re-aggregated vocabulary — the per-query cost the
            # dictionary seek exists to avoid. All-or-nothing per
            # layout: one range-less segment would make its terms
            # invisible to that seek path, silently dropping matches.
            term_stats_ranges=_concat_ranges(
                paths, sub_manifests, "term_stats_ranges"
            ),
            term_stats_rev_ranges=_concat_ranges(
                paths, sub_manifests, "term_stats_rev_ranges"
            ),
            term_grams_ranges=_concat_ranges(
                paths, sub_manifests, "term_grams_ranges"
            ),
            gram_df_duplicated=True,
            num_terms=num_terms,
            numeric_meta=numeric_meta,
            precision_step=min(steps),  # irrelevant when num_terms is None
        )
