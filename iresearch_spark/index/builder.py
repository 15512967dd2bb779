"""Inverted-index construction as a Spark DataFrame pipeline.

Pipeline (reference lifecycle §3.1 of SURVEY.md — `IndexWriter::Insert`
-> `field_data::invert` -> segment flush -> consolidation — re-expressed
Spark-first):

  pages/docs DF
    -> [mapInPandas]  analyze + per-doc term aggregation
                      (one row per (doc, distinct term): freq, positions,
                      dl — this is the map-side combine that keeps the
                      token shuffle at distinct-term granularity, not
                      per-occurrence)
    -> docs table     (doc_id, dl)                [groupBy doc_id]
    -> term_stats     (term, df, cf)              [groupBy term,
                      partial-agg map-side; hot terms are no problem
                      because input rows are already (doc,term)-unique]
    -> postings       [groupBy (term, doc_bucket) + applyInPandas]
                      128-doc blocks, delta-gap varint docs, varint dls,
                      position deltas, per-block WAND maxima

Skew handling (explicit, per north_rule): posting lists are built per
(term, doc_bucket) where doc_bucket = doc_id >> bucket_bits. A term
appearing in every document of a 10^12-doc corpus never lands in one
task: each group holds at most 2^bucket_bits postings. Because buckets
partition the doc-id space into contiguous ranges, block_ids derived as
(bucket << k) | local_block are globally ordered by doc range — the
"merge" of bucket-local runs is free (the reference's k-way segment
merge, `core/index/merge_writer.cpp:511`, becomes a no-op by
construction).

Determinism: output tables are value-deterministic regardless of
parallelism — block content depends only on (term, doc-id set), never on
partition enumeration order.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F, types as T

from iresearch_spark.analysis.analyzers import Analyzer, get_analyzer
from iresearch_spark.index import codec
from iresearch_spark.index.model import (
    POSTINGS_SCHEMA,
    FieldStats,
    InvertedIndex,
)

TOKEN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("freq", T.IntegerType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType()), True),
        T.StructField("dl", T.IntegerType(), False),
    ]
)

BLOCK_SIZE = 128  # posting block granularity (formats_10.cpp:88-129)


def tokenize(
    df: DataFrame,
    analyzer: Analyzer,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_positions: bool = True,
) -> DataFrame:
    """(doc_id, text) -> one row per (doc, distinct term).

    One mapInPandas pass; inside, tokenization + (doc, term) aggregation
    is vectorized with numpy lexsort + boundary detection (no pandas
    groupby.apply, no per-token Python in the aggregation).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids = pdf[id_col].to_numpy()
            analyzed = analyzer.analyze_batch(pdf[text_col].tolist())
            n_tokens = np.fromiter(
                (len(t[0]) for t in analyzed), dtype=np.int64, count=len(analyzed)
            )
            if n_tokens.sum() == 0:
                continue
            flat_terms = np.concatenate(
                [np.asarray(t[0], dtype=object) for t in analyzed if t[0]]
            )
            flat_pos = np.concatenate(
                [np.asarray(t[1], dtype=np.int64) for t in analyzed if t[0]]
            )
            flat_doc = np.repeat(doc_ids, n_tokens)
            flat_dl = np.repeat(n_tokens, n_tokens)
            # stable sort by (doc, term); positions stay ascending per group
            order = np.lexsort((flat_terms, flat_doc))
            flat_terms = flat_terms[order]
            flat_doc = flat_doc[order]
            flat_pos = flat_pos[order]
            flat_dl = flat_dl[order]
            boundary = np.empty(flat_terms.size, dtype=bool)
            boundary[0] = True
            boundary[1:] = (flat_doc[1:] != flat_doc[:-1]) | (
                flat_terms[1:] != flat_terms[:-1]
            )
            starts = np.flatnonzero(boundary)
            freqs = np.diff(np.append(starts, flat_terms.size))
            out = {
                "doc_id": flat_doc[starts],
                "term": flat_terms[starts],
                "freq": freqs.astype(np.int32),
                "dl": flat_dl[starts].astype(np.int32),
            }
            if with_positions:
                out["positions"] = [
                    p.astype(np.int32).tolist()
                    for p in np.split(flat_pos, starts[1:])
                ]
            else:
                out["positions"] = None
            yield pd.DataFrame(out)[
                ["doc_id", "term", "freq", "positions", "dl"]
            ]

    return df.select(
        F.col(id_col).cast("long").alias(id_col), text_col
    ).mapInPandas(run, TOKEN_SCHEMA)


def assign_doc_ids(df: DataFrame, key_col: str) -> DataFrame:
    """Deterministic global doc ids by sort on a stable key.

    Scalable two-pass scheme (no single-partition window): range-
    repartition by the key, count rows per partition, broadcast the
    cumulative offsets, then add partition-local ranks. Ids depend only
    on the key order — never on parallelism (SURVEY §7.0 determinism
    rule; reference assigns segment-local ids in insertion order,
    `core/index/segment_writer.cpp:76`, and remaps on merge — we assign
    the global order once instead).
    """
    spark = df.sparkSession
    n_part = max(df.rdd.getNumPartitions(), 1)
    ranged = df.repartitionByRange(n_part, F.col(key_col)).sortWithinPartitions(
        key_col
    )
    ranged = ranged.withColumn("_pid", F.spark_partition_id())
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offs = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy(key_col)
    return (
        ranged.withColumn("_rank", F.row_number().over(w) - 1)
        .join(F.broadcast(offs), "_pid")
        .withColumn("doc_id", F.col("_offset") + F.col("_rank"))
        .drop("_pid", "_rank", "_offset")
    )


def build_postings(
    tokens: DataFrame, with_positions: bool, bucket_bits: int = 16
) -> DataFrame:
    """(doc,term) rows -> posting-block rows, skew-bounded by doc bucket.

    Physical shape: repartition by (term, bucket) + in-partition sort,
    then ONE mapInPandas pass per partition that walks the sorted runs
    with numpy boundary detection (carrying a partial trailing group
    across Arrow batches). This avoids applyInPandas' per-group pandas
    overhead — with a 30k-term vocabulary that is 30k tiny groups, which
    dominated build time — while keeping identical output: block content
    is a pure function of (term, bucket, doc-id set)."""
    bucketed = tokens.withColumn(
        "_bucket", F.shiftright(F.col("doc_id"), bucket_bits)
    )
    arranged = bucketed.repartition("term", "_bucket").sortWithinPartitions(
        "term", "_bucket", "doc_id"
    )
    return arranged.mapInPandas(
        _make_partition_block_builder(with_positions, bucket_bits),
        POSTINGS_SCHEMA,
    )


def _make_partition_block_builder(with_positions: bool, bucket_bits: int):
    blocks_per_bucket_bits = max(bucket_bits - 7, 1)

    def encode_group(term, bucket, doc_ids, freqs, dls, pos_lists, out):
        n = doc_ids.size
        for local_blk, start in enumerate(range(0, n, BLOCK_SIZE)):
            end = min(start + BLOCK_SIZE, n)
            b_docs = doc_ids[start:end]
            b_freqs = freqs[start:end]
            b_dls = dls[start:end]
            pos_blob = None
            if with_positions:
                concat = (
                    np.concatenate([np.asarray(p) for p in pos_lists[start:end]])
                    if end > start
                    else np.empty(0, np.int64)
                )
                pos_blob = codec.encode_position_lists(concat, b_freqs)
            out["term"].append(term)
            out["block_id"].append(
                (int(bucket) << blocks_per_bucket_bits) | local_blk
            )
            out["n_docs"].append(int(end - start))
            out["first_doc"].append(int(b_docs[0]))
            out["last_doc"].append(int(b_docs[-1]))
            out["docs"].append(codec.pack_docs_freqs(b_docs, b_freqs))
            out["dls"].append(codec.varint_encode(b_dls))
            out["positions"].append(pos_blob)
            out["block_max_freq"].append(int(b_freqs.max()))
            out["block_min_dl"].append(int(b_dls.min()))

    cols = [
        "term", "block_id", "n_docs", "first_doc", "last_doc",
        "docs", "dls", "positions", "block_max_freq", "block_min_dl",
    ]

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if pending is not None:
                pdf = pd.concat([pending, pdf], ignore_index=True)
                pending = None
            terms = pdf["term"].to_numpy()
            buckets = pdf["_bucket"].to_numpy()
            n = len(pdf)
            if n == 0:
                continue
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = (terms[1:] != terms[:-1]) | (buckets[1:] != buckets[:-1])
            starts = np.flatnonzero(change)
            # the trailing group may continue into the next Arrow batch
            if starts.size > 1:
                cut = starts[-1]
                pending = pdf.iloc[cut:]
                pdf = pdf.iloc[:cut]
                starts = starts[:-1]
            else:
                pending = pdf
                continue
            yield _encode_groups(pdf, starts, with_positions, encode_group, cols)
        if pending is not None and len(pending):
            terms = pending["term"].to_numpy()
            buckets = pending["_bucket"].to_numpy()
            change = np.empty(len(pending), dtype=bool)
            change[0] = True
            change[1:] = (terms[1:] != terms[:-1]) | (buckets[1:] != buckets[:-1])
            yield _encode_groups(
                pending.reset_index(drop=True),
                np.flatnonzero(change),
                with_positions,
                encode_group,
                cols,
            )

    return build


def _encode_groups(pdf, starts, with_positions, encode_group, cols):
    doc_ids = pdf["doc_id"].to_numpy()
    freqs = pdf["freq"].to_numpy().astype(np.int64)
    dls = pdf["dl"].to_numpy().astype(np.int64)
    terms = pdf["term"].to_numpy()
    buckets = pdf["_bucket"].to_numpy()
    pos = pdf["positions"].to_numpy() if with_positions else None
    ends = np.append(starts[1:], len(pdf))
    out = {c: [] for c in cols}
    for s, e in zip(starts, ends):
        encode_group(
            terms[s],
            buckets[s],
            doc_ids[s:e],
            freqs[s:e],
            dls[s:e],
            pos[s:e] if with_positions else None,
            out,
        )
    return pd.DataFrame(out)


def build_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = "doc_id",
    sort_key: str | None = None,
    analyzer: str | Analyzer = "simple",
    with_positions: bool = True,
    bucket_bits: int = 16,
    extra_doc_cols: list[str] | None = None,
) -> InvertedIndex:
    """End-to-end index build. See module docstring for the plan shape.

    If `id_col` is None, global doc ids are assigned deterministically by
    sorting on `sort_key` (e.g. url — SURVEY §7.0).
    """
    if isinstance(analyzer, str):
        analyzer = get_analyzer(analyzer)
    if id_col is None:
        if sort_key is None:
            raise ValueError("need id_col or sort_key")
        df = assign_doc_ids(df, sort_key)
        id_col = "doc_id"

    tokens = tokenize(df, analyzer, text_col, id_col, with_positions)
    # Reused twice (docs+stats downstream) — worth materializing once on
    # small/medium corpora; at 100 TB you would instead checkpoint this
    # stage to a parquet dir (see streaming.incremental for the resumable
    # variant which does exactly that per micro-batch).
    tokens.cache()

    docs = tokens.groupBy("doc_id").agg(F.max("dl").alias("dl"))
    if extra_doc_cols:
        passthrough = df.select(
            F.col(id_col).cast("long").alias("doc_id"), *extra_doc_cols
        )
        docs = docs.join(passthrough, "doc_id")

    term_stats = tokens.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("freq").alias("cf")
    )

    # field stats off the (small) docs table — one row per doc, cheap agg
    stats_row = tokens.groupBy("doc_id").agg(F.max("dl").alias("dl")).agg(
        F.count("*").alias("n"), F.sum("dl").alias("ttf")
    ).collect()[0]
    field_stats = FieldStats(
        n_docs=int(stats_row["n"] or 0),
        total_term_freq=int(stats_row["ttf"] or 0),
    )

    postings = build_postings(tokens, with_positions, bucket_bits)

    return InvertedIndex(
        postings=postings,
        docs=docs,
        term_stats=term_stats,
        field_stats=field_stats,
        with_positions=with_positions,
        analyzer_name=analyzer.name,
    )
