"""Physical-plan audits for the sampling/packing ops — pins the scale
claims in ops/sampling.py docstrings."""

from iresearch_spark.ops.sampling import (
    hash_rate_sample,
    hash_split,
    pack_sequences,
    stratified_quota_sample,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hash_rate_sample_no_shuffle(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["id"])
    plan = _plan(hash_rate_sample(df, "id", 0.5))
    assert "Exchange" not in plan  # pure filter at the scan


def test_hash_split_no_shuffle(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["id"])
    plan = _plan(hash_split(df, "id", {"a": 0.5, "b": 0.5}))
    assert "Exchange" not in plan  # pure column expression


def test_stratified_one_hash_shuffle(spark):
    df = spark.createDataFrame(
        [(i, "s") for i in range(100)], ["id", "lang"]
    )
    plan = _plan(stratified_quota_sample(df, "lang", 5, "id"))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


def test_pack_sequences_no_big_single_partition(spark):
    df = spark.createDataFrame(
        [(i, "a b c") for i in range(100)], ["doc_id", "text"]
    )
    plan = _plan(pack_sequences(df, seq_len=8))
    # the doc-length stream is RANGE partitioned (distributed prefix
    # sum); the only single-partition exchange allowed is the
    # one-row-per-partition offsets table
    assert "Exchange rangepartitioning" in plan
    assert plan.count("Exchange SinglePartition") <= 1
