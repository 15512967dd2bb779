"""Segment merge / consolidation (reference `IndexWriter::Consolidate`,
`core/index/merge_writer.cpp` — SURVEY §2.6, §3.3).

Because block_ids encode contiguous doc-id ranges ((bucket << k) |
local), posting blocks from different segments with DISJOINT doc-id
ranges union without any re-sort: the reference's k-way heap merge of
term iterators (`merge_writer.cpp:511` CompoundTermIterator) becomes a
plain `unionByName` + optional re-blocking pass. The re-blocking
("consolidation") rewrites underfull blocks into full 128-doc blocks —
a groupBy (term, coarse-bucket) + applyInPandas, the same skew-bounded
shape as the initial build.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iresearch_spark.index.builder import build_postings
from iresearch_spark.index.model import FieldStats, InvertedIndex


def merge_indexes(a: InvertedIndex, b: InvertedIndex) -> InvertedIndex:
    """Union two indexes with disjoint doc-id spaces (the reference's
    segment-import path, `index_writer.hpp` Import). Doc-id disjointness
    is the caller's contract (incremental indexing assigns each segment
    a dedicated id range)."""
    if a.with_positions != b.with_positions:
        raise ValueError("cannot merge indexes with different position settings")
    if a.with_offsets != b.with_offsets:
        raise ValueError("cannot merge indexes with different offset settings")
    if a.with_payloads != b.with_payloads:
        raise ValueError("cannot merge indexes with different payload settings")

    def _strip(df):  # loaded indexes carry the _tb/_tbd bucket columns
        for c in ("_tb", "_tbd"):
            if c in df.columns:
                df = df.drop(c)
        return df

    postings = _strip(a.postings).unionByName(_strip(b.postings))
    docs = a.docs.unionByName(b.docs)
    # the delete masks must survive the merge — otherwise a consolidate
    # over segments with pending deletes would resurrect deleted docs
    deleted = None
    if a.deleted is not None or b.deleted is not None:
        parts = [d.select("doc_id") for d in (a.deleted, b.deleted) if d is not None]
        deleted = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1]).distinct()
    term_stats = (
        a.term_stats.unionByName(b.term_stats)
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
    )
    fs = FieldStats(
        n_docs=a.field_stats.n_docs + b.field_stats.n_docs,
        total_term_freq=a.field_stats.total_term_freq + b.field_stats.total_term_freq,
        max_dl=(
            max(a.field_stats.max_dl, b.field_stats.max_dl)
            if a.field_stats.max_dl is not None
            and b.field_stats.max_dl is not None
            else None
        ),
    )
    if a.norm != b.norm:
        raise ValueError(
            f"cannot merge indexes with different norm modes: "
            f"{a.norm!r} vs {b.norm!r}"
        )
    # numeric dictionaries union like postings (disjoint doc ids); the
    # merged view only keeps the seek path when both sides carry a
    # compatible layout — a one-sided dictionary would silently drop
    # the other side's docs from GranularRange, so it degrades to the
    # stored-column fallback instead (None)
    num_terms = None
    numeric_meta = None
    precision_step = a.precision_step
    if (
        a.num_terms is not None
        and b.num_terms is not None
        and a.numeric_meta == b.numeric_meta
        and a.precision_step == b.precision_step
    ):
        num_terms = a.num_terms.unionByName(b.num_terms)
        numeric_meta = a.numeric_meta
    return InvertedIndex(
        postings=postings,
        docs=docs,
        term_stats=term_stats,
        field_stats=fs,
        with_positions=a.with_positions,
        with_offsets=a.with_offsets,
        with_payloads=a.with_payloads,
        norm=a.norm,
        analyzer_name=a.analyzer_name,
        deleted=deleted,
        num_terms=num_terms,
        numeric_meta=numeric_meta,
        precision_step=precision_step,
        # a disjoint-id-range union is NOT globally sort-ordered even
        # when both inputs were built with the same sort_field (the
        # reference merge_writer re-sorts through the comparator-aware
        # doc_id_map, merge_writer.cpp:266-329; here restoring order
        # means rebuilding via build_index(sort_field=...)). The merged
        # view honestly drops the sorted property.
        sort_field=None,
    )


def _reblock_columns(decoded, index: InvertedIndex):
    """Project decoded rows to the token-row shape build_postings
    expects, with null placeholders for absent occurrence streams."""
    cols = [
        F.col("doc_id"),
        F.col("term"),
        F.col("freq"),
        (
            F.col("positions")
            if index.with_positions
            else F.lit(None).cast("array<int>").alias("positions")
        ),
        F.col("dl").cast("int").alias("dl"),
    ]
    if index.with_offsets:
        cols.extend([F.col("off_starts"), F.col("off_lens")])
    if index.with_payloads:
        cols.append(F.col("payloads"))
    return decoded.select(*cols)


def consolidate(index: InvertedIndex, bucket_bits: int = 16) -> InvertedIndex:
    """Rewrite posting blocks into full 128-doc blocks under a (possibly
    coarser) doc-bucket grid: decode -> re-block. One shuffle keyed by
    (term, bucket) — bounded group sizes, skew-proof (SURVEY §3.3)."""
    decoded = index.decoded_postings(
        with_positions=index.with_positions,
        with_offsets=index.with_offsets,
        with_payloads=index.with_payloads,
    )
    decoded = _reblock_columns(decoded, index)
    postings = build_postings(
        decoded, index.with_positions, bucket_bits, index.with_offsets,
        index.with_payloads,
    )
    # the re-encoded blocks still contain deleted docs' postings (decode
    # above is mask-free), so pending deletes must survive as a mask —
    # dropping it here would silently resurrect deleted docs. Callers
    # wanting a mask-free result run purge_deleted first (the
    # consolidate job does).
    return InvertedIndex(
        postings=postings,
        docs=index.docs,
        term_stats=index.term_stats,
        field_stats=index.field_stats,
        with_positions=index.with_positions,
        with_offsets=index.with_offsets,
        with_payloads=index.with_payloads,
        norm=index.norm,
        analyzer_name=index.analyzer_name,
        deleted=index.deleted,
        num_terms=index.num_terms,
        numeric_meta=index.numeric_meta,
        precision_step=index.precision_step,
        # doc ids are unchanged by re-blocking, so index order survives
        sort_field=index.sort_field,
        sort_ascending=index.sort_ascending,
    )


def purge_deleted(index: InvertedIndex, bucket_bits: int = 16) -> InvertedIndex:
    """Physically drop deleted docs and recompute stats (the
    reference's merge-time doc_id_map skip of deleted docs,
    `merge_writer.cpp:1448-1472`). Until this runs, deletes are
    read-time masks and scoring stats are intentionally stale — the
    reference behaves identically between consolidations."""
    if index.deleted is None:
        return index
    mask = index.deleted.select("doc_id")
    decoded = index.decoded_postings(
        with_positions=index.with_positions,
        with_offsets=index.with_offsets,
        with_payloads=index.with_payloads,
    )
    live = _reblock_columns(decoded.join(mask, "doc_id", "left_anti"), index)
    postings = build_postings(
        live, index.with_positions, bucket_bits, index.with_offsets,
        index.with_payloads,
    )
    docs = index.docs.join(mask, "doc_id", "left_anti")
    term_stats = live.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("freq").alias("cf")
    )
    # BM25's N = docs_with_field (dl>0), matching build_index — the
    # docs table itself keeps dl=0 rows for AllDocs coverage
    stats_row = docs.agg(
        F.count(F.when(F.col("dl") > 0, True)).alias("n"),
        F.sum("dl").alias("ttf"),
        F.max("dl").alias("mx"),
    ).collect()[0]
    return InvertedIndex(
        postings=postings,
        docs=docs,
        term_stats=term_stats,
        field_stats=FieldStats(
            n_docs=int(stats_row["n"] or 0),
            total_term_freq=int(stats_row["ttf"] or 0),
            max_dl=int(stats_row["mx"] or 0),
        ),
        with_positions=index.with_positions,
        with_offsets=index.with_offsets,
        with_payloads=index.with_payloads,
        norm=index.norm,
        analyzer_name=index.analyzer_name,
        deleted=None,
        num_terms=(
            index.num_terms.join(mask, "doc_id", "left_anti")
            if index.num_terms is not None
            else None
        ),
        numeric_meta=index.numeric_meta,
        precision_step=index.precision_step,
        # purge keeps surviving ids (and hence their relative order)
        sort_field=index.sort_field,
        sort_ascending=index.sort_ascending,
    )


def build_metrics(index: InvertedIndex, bucket_bits: int = 16) -> "DataFrame":
    """Per-bucket lineage/metrics rows (the north rule's per-partition
    lineage + build-metrics table): doc-bucket -> blocks, postings,
    distinct terms, doc-id range. Deterministic (bucket = doc-id range),
    independent of physical partitioning."""
    return (
        index.postings.withColumn(
            "bucket", F.shiftright(F.col("first_doc"), bucket_bits)
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum("n_docs").alias("n_postings"),
            F.countDistinct("term").alias("n_terms"),
            F.min("first_doc").alias("min_doc"),
            F.max("last_doc").alias("max_doc"),
        )
    )
