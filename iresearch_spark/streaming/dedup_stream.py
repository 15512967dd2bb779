"""Cross-batch streaming deduplication — the stateful-streaming member
of the training-data ops tier (`ops/dedup.py` covers batch; this covers
a document FIREHOSE feeding an incremental index).

Spark-first shape: content-hash the stream with JVM expressions, group
by the hash, and keep one tiny per-key state cell via
`applyInPandasWithState` — the custom-stateful-operator API Structured
Streaming provides for exactly this (arbitrary state per key, Arrow
batches in, Arrow batches out). State volume is one long per DISTINCT
document ever seen, hash-partitioned across executors with the
checkpoint handling failover — the 100 TB shape, no driver-side set.

A duplicate arriving any number of micro-batches after the original is
suppressed; within one batch the lowest `id_col` survives
(deterministic). First-seen-wins across batches is arrival order by
definition of a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupStateTimeout


def content_hash(text_col: str = "text", normalize: bool = True):
    """64-bit JVM-side content hash; `normalize` folds case and
    whitespace runs first (same canonicalization as
    `ops.dedup.exact_duplicates`)."""
    c = F.col(text_col)
    if normalize:
        c = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.xxhash64(c)


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    normalize: bool = True,
) -> DataFrame:
    """Emit only the FIRST document per content hash across the whole
    stream; later duplicates (same or later micro-batch) are dropped.

    Returns the input columns plus `content_hash` and `n_seen` (how
    many copies of this content had arrived when the survivor was
    emitted — 1 unless the first batch itself contained duplicates).
    Feed the output to `IncrementalIndexer.start` for a dedup-then-
    index pipeline."""
    hashed = stream_df.withColumn("content_hash", content_hash(text_col, normalize))
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in hashed.schema.fields
    )
    out_schema = f"{fields}, n_seen bigint"
    state_schema = "n bigint"

    def dedup_group(key, pdfs, state):
        import pandas as pd

        seen = state.get[0] if state.exists else 0
        first = None
        n_new = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n_new += len(pdf)
            if seen == 0 and first is None:
                first = pdf.sort_values(id_col).iloc[[0]].copy()
        state.update((seen + n_new,))
        if first is not None:
            first["n_seen"] = n_new
            yield first
        else:
            return

    return hashed.groupBy("content_hash").applyInPandasWithState(
        dedup_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
