"""Round-4 continuation: deterministic sampling + sequence packing."""

import hashlib

import pytest
from pyspark.sql import functions as F

from iresearch_spark.ops.sampling import (
    hash_rate_sample,
    pack_sequences,
    stratified_quota_sample,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hash_rate_sample_matches_python_and_partitioning(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
    got = sorted(
        r["id"] for r in hash_rate_sample(df, "id", 0.25, seed=3).collect()
    )
    expect = [
        i for i in range(2000) if _h60(f"3:{i}") % 1_000_000 < 250_000
    ]
    assert got == expect
    # approximate rate + partitioning invariance
    assert 0.2 < len(got) / 2000 < 0.3
    got2 = sorted(
        r["id"]
        for r in hash_rate_sample(df.repartition(13), "id", 0.25, seed=3).collect()
    )
    assert got2 == got
    # different seed -> different split; rate 0/1 edges
    got_s9 = sorted(
        r["id"] for r in hash_rate_sample(df, "id", 0.25, seed=9).collect()
    )
    assert got_s9 != got
    assert hash_rate_sample(df, "id", 0.0).count() == 0
    assert hash_rate_sample(df, "id", 1.0).count() == 2000
    with pytest.raises(ValueError):
        hash_rate_sample(df, "id", 1.5)


def test_stratified_quota_sample(spark):
    rows = [(i, "en" if i < 100 else "de") for i in range(103)]
    df = spark.createDataFrame(rows, ["id", "lang"])
    out = stratified_quota_sample(df, "lang", quota=10, key_col="id", seed=5)
    got = [(r["id"], r["lang"]) for r in out.collect()]
    by_lang = {}
    for i, l in got:
        by_lang.setdefault(l, []).append(i)
    # quota respected; small stratum kept whole
    assert len(by_lang["en"]) == 10
    assert sorted(by_lang["de"]) == [100, 101, 102]
    # selection replays in pure Python: lowest seeded hashes win
    expect_en = sorted(
        range(100), key=lambda i: (_h60(f"5:{i}") % 1_000_000, i)
    )[:10]
    assert sorted(by_lang["en"]) == sorted(expect_en)
    # partitioning invariance
    out2 = stratified_quota_sample(
        df.repartition(7), "lang", quota=10, key_col="id", seed=5
    )
    assert sorted((r["id"], r["lang"]) for r in out2.collect()) == sorted(got)


def test_pack_sequences_closed_form(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, ""), (2, "d e f g h")], ["doc_id", "text"]
    )
    out = sorted(
        (r["doc_id"], r["seq_id"], r["doc_start"], r["doc_end"], r["seq_offset"])
        for r in pack_sequences(df, seq_len=4).collect()
    )
    # stream: doc0 [0,3) sep@3 | doc1 sep@4 | doc2 [5,10) sep@10
    assert out == [
        (0, 0, 0, 3, 0),
        (2, 1, 0, 3, 1),
        (2, 2, 3, 5, 0),
    ]


def test_pack_sequences_invariants(spark):
    rows = [(i, " ".join(["t"] * ((i * 7) % 23))) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_sequences(df, seq_len=16).collect()
    # every token of every doc is assigned exactly once, contiguously
    spans = {}
    for r in out:
        spans.setdefault(r["doc_id"], []).append(r)
        assert 0 <= r["seq_offset"] < 16
        assert 0 <= r["doc_start"] < r["doc_end"] <= r["n_tokens"]
    for i, text in rows:
        n = len(text.split())
        if n == 0:
            assert i not in spans
            continue
        ss = sorted(spans[i], key=lambda r: r["doc_start"])
        assert ss[0]["doc_start"] == 0 and ss[-1]["doc_end"] == n
        for a, b in zip(ss, ss[1:]):
            assert a["doc_end"] == b["doc_start"]
            assert b["seq_id"] == a["seq_id"] + 1 and b["seq_offset"] == 0
        # a doc's slice inside one sequence never exceeds seq_len
        assert all(r["doc_end"] - r["doc_start"] <= 16 for r in ss)
    # sequences are filled exactly (every seq offset range is disjoint)
    per_seq = {}
    for r in out:
        per_seq.setdefault(r["seq_id"], []).append(
            (r["seq_offset"], r["seq_offset"] + r["doc_end"] - r["doc_start"])
        )
    for sid, segs in per_seq.items():
        segs.sort()
        for (a0, a1), (b0, b1) in zip(segs, segs[1:]):
            assert a1 <= b0  # separators account for any gaps
    # partitioning invariance of the distributed prefix sum
    out2 = pack_sequences(df.repartition(11), seq_len=16).collect()
    key = lambda r: (r["doc_id"], r["seq_id"])
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_pack_sequences_long_doc_spans_many(spark):
    df = spark.createDataFrame(
        [(0, " ".join(["w"] * 100))], ["doc_id", "text"]
    )
    out = sorted(
        (r["seq_id"], r["doc_start"], r["doc_end"])
        for r in pack_sequences(df, seq_len=10).collect()
    )
    assert out == [(s, s * 10, min((s + 1) * 10, 100)) for s in range(10)]


def test_hash_split(spark):
    from iresearch_spark.ops.sampling import hash_split

    df = spark.createDataFrame([(i,) for i in range(5000)], ["id"])
    out = hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3)
    rows = out.collect()
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 5000 < 0.85
    assert 0.07 < counts["val"] / 5000 < 0.13
    # python replay: sorted names over contiguous ranges (test<train<val)
    expect = {}
    for i in range(5000):
        h = _h60(f"3:{i}") % 1_000_000
        expect[i] = "test" if h < 100_000 else ("train" if h < 900_000 else "val")
    got = {r["id"]: r["split"] for r in rows}
    assert got == expect
    # partitioning + rerun stability
    out2 = hash_split(
        df.repartition(9), "id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3
    )
    assert {r["id"]: r["split"] for r in out2.collect()} == got
    import pytest as _pytest
    with _pytest.raises(ValueError):
        hash_split(df, "id", {"a": 0.5, "b": 0.6})
