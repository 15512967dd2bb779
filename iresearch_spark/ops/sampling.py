"""Deterministic sampling and sequence packing for training-data
pipelines.

Every sampler here is seeded and ENGINE-PORTABLE (the md5-derived
60-bit hash from ops/hashing), so runs are reproducible across Spark
versions, partitionings, and cluster sizes, and every op is exactly
replayable in the DuckDB oracle. `df.sample()` is deliberately NOT used:
its output depends on partitioning, which breaks lineage at scale.

Ops:
- hash_rate_sample: Bernoulli-style rate sampling by hashed key.
  Zero shuffles — a pure filter, pushed to the scan.
- stratified_quota_sample: exactly-k-per-stratum (e.g. per language /
  per source) by seeded hash order. One shuffle (window per stratum);
  quota rows per stratum bound the output.
- pack_sequences: GPT-style pretraining sequence packing — concatenate
  all documents' tokens in a deterministic order and cut into
  fixed-length windows. Emits per-(doc, sequence) span assignments
  without materializing tokens: one cumulative-sum window over doc
  lengths, then an explode over the (few) sequences each doc touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from iresearch_spark.ops.hashing import seeded_hash60

_RATE_MOD = 1_000_000


def hash_rate_sample(
    df: DataFrame, key_col: str, rate: float, seed: int = 0
) -> DataFrame:
    """Keep a deterministic ~`rate` fraction of rows: rows where
    hash60(seed:key) % 1e6 < rate*1e6. Consistent across runs and
    partitionings; the same (seed, key) always lands on the same side,
    so train/held-out splits made this way never leak into each other.
    No shuffle — the predicate evaluates at the scan."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    # round, don't truncate: float repr of e.g. 0.7 is a hair under and
    # int() would shave one hash value off the nominal bound
    bound = int(rate * _RATE_MOD + 0.5)
    h = seeded_hash60(F.col(key_col).cast("string"), seed) % _RATE_MOD
    return df.filter(h < F.lit(bound))


def stratified_quota_sample(
    df: DataFrame,
    strata_col: str,
    quota: int,
    key_col: str,
    seed: int = 0,
) -> DataFrame:
    """Keep at most `quota` rows per stratum (language balancing, per-
    source caps): rank rows inside each stratum by seeded hash of the
    key (ties by the key itself) and keep rank <= quota. One shuffle on
    the stratum key; a hot stratum is one sorted partition group, and
    the per-group sort can spill — no driver-side state."""
    h = (seeded_hash60(F.col(key_col).cast("string"), seed) % _RATE_MOD).alias(
        "_h"
    )
    w = Window.partitionBy(strata_col).orderBy(
        F.col("_h").asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_h", h)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .drop("_h", "_rk")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    eos: int = 1,
) -> DataFrame:
    """Plan GPT-style sequence packing: documents are laid out in
    `id_col` order as one virtual token stream (each doc contributes
    n_tokens whitespace tokens + `eos` separator tokens), which is cut
    into windows of `seq_len`. Returns one row per (document, sequence)
    overlap:

      (id_col, n_tokens, seq_id, doc_start, doc_end, seq_offset)

    where the doc's tokens [doc_start, doc_end) (doc-relative,
    separator excluded) land in sequence `seq_id` starting at
    `seq_offset`. Documents longer than seq_len simply span several
    sequences; empty docs contribute only their separator and emit no
    row.

    Scale shape: the global cumulative sum is a DISTRIBUTED prefix sum,
    not a single-partition window — doc-length rows are range-
    partitioned by id, each partition computes its local running sum
    (window partitioned by the physical partition id), and the
    per-partition totals (one row per partition) are offset-summed and
    broadcast back. No task ever sees more than its own range; token
    counts, not tokens, move through the plan. The explode emits
    ceil(n/seq_len)+1 rows per doc — linear. `id_col` must be unique
    (it defines the layout order).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n = df.select(id_col, F.size(toks).alias("n_tokens"))
    nparts = max(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    # distributed prefix sum over (n_tokens + eos) in id order: range
    # partitions are assigned ascending ranges in ascending partition-id
    # order, so per-partition offsets compose correctly
    part = (
        n.repartitionByRange(nparts, F.col(id_col).asc())
        .sortWithinPartitions(F.col(id_col).asc())
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("_pid").orderBy(F.col(id_col).asc())
    local = part.withColumn(
        "_lend", F.sum(F.col("n_tokens") + F.lit(eos)).over(w_local)
    )
    totals = local.groupBy("_pid").agg(F.max("_lend").alias("_ptot"))
    w_tot = (
        Window.orderBy(F.col("_pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # one row per partition — trivially small
    offsets = totals.withColumn(
        "_poff", F.coalesce(F.sum("_ptot").over(w_tot), F.lit(0))
    ).select("_pid", "_poff")
    laid = local.join(F.broadcast(offsets), "_pid").select(
        id_col,
        "n_tokens",
        (
            F.col("_poff") + F.col("_lend") - F.col("n_tokens") - F.lit(eos)
        ).alias("_begin"),
    )
    first_seq = (F.col("_begin") / seq_len).cast("long")
    last_seq = ((F.col("_begin") + F.col("n_tokens") - 1) / seq_len).cast(
        "long"
    )
    spans = laid.filter(F.col("n_tokens") > 0).select(
        id_col,
        "n_tokens",
        "_begin",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * seq_len
    doc_start = F.greatest(seq_start - F.col("_begin"), F.lit(0))
    doc_end = F.least(
        seq_start + F.lit(seq_len) - F.col("_begin"), F.col("n_tokens")
    )
    return spans.select(
        id_col,
        "n_tokens",
        "seq_id",
        doc_start.cast("long").alias("doc_start"),
        doc_end.cast("long").alias("doc_end"),
        (F.col("_begin") + doc_start - seq_start).cast("long").alias(
            "seq_offset"
        ),
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    seed: int = 0,
) -> DataFrame:
    """Deterministic dataset split: adds a `split` column assigning each
    row to one of the named buckets with the given weights (must sum to
    1), by seeded hash of the key — the train/val/test assignment that
    stays stable across runs, partitionings and cluster sizes, and
    never leaks a key between buckets (same key => same split, even
    across reruns with added data). Buckets are assigned in sorted name
    order over contiguous hash ranges, so the mapping is reproducible
    from the weights alone. Pure column expression — no shuffle."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError("weights must sum to 1")
    h = seeded_hash60(F.col(key_col).cast("string"), seed) % _RATE_MOD
    expr = None
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += weights[name]
        # round, don't truncate: float repr of e.g. 0.7 is a hair under
        # and int() would shave one hash value off the nominal bound
        bound = int(acc * _RATE_MOD + 0.5)
        expr = (
            F.when(h < bound, F.lit(name))
            if expr is None
            else expr.when(h < bound, F.lit(name))
        )
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", out)
