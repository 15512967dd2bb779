"""PAY posting stream (reference IndexFeatures PAY,
index_features.hpp:40-58; payload stream formats_10.cpp:714-765):
delimited-payload build, decode, query API, and survival across
save/load, merge, consolidate, and purge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iresearch_spark.index.builder import build_index
from iresearch_spark.index.merge import consolidate, merge_indexes, purge_deleted
from iresearch_spark.index.model import InvertedIndex
from iresearch_spark.search import SearchEngine, Term

ROWS = [
    (0, "red|r1 blue|b1 red|r2"),
    (1, "blue|b2 plain red|r3"),
    (2, "green|g1 green|g2 green|g3"),
    (3, "red|r4"),
]

EXPECTED_RED = {
    (0, 1, b"r1"),
    (0, 2, b"r2"),
    (1, 1, b"r3"),
    (3, 1, b"r4"),
}


def _build(spark, rows=ROWS, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return build_index(
        df, analyzer="simple", bucket_bits=4, payload_delimiter="|", **kw
    )


def _pay_set(engine, term):
    return {
        (r["doc_id"], r["occurrence"], bytes(r["payload"]))
        for r in engine.payloads([term]).collect()
    }


def test_payloads_basic(spark):
    idx = _build(spark)
    assert idx.with_payloads
    eng = SearchEngine(idx)
    assert _pay_set(eng, "red") == EXPECTED_RED
    assert _pay_set(eng, "blue") == {(0, 1, b"b1"), (1, 1, b"b2")}
    # token without a delimiter gets an empty payload
    assert _pay_set(eng, "plain") == {(1, 1, b"")}
    # terms are the split heads: searching works on them
    assert {r["doc_id"] for r in eng.matches(Term("red")).collect()} == {0, 1, 3}


def test_payloads_survive_save_load(spark, tmp_path):
    idx = _build(spark)
    path = str(tmp_path / "payix")
    idx.save(path)
    loaded = InvertedIndex.load(spark, path)
    assert loaded.with_payloads
    assert _pay_set(SearchEngine(loaded), "red") == EXPECTED_RED


def test_payloads_survive_merge_and_consolidate(spark):
    a = _build(spark, rows=ROWS[:2])
    b = _build(spark, rows=ROWS[2:], id_base=0)
    merged = merge_indexes(a, b)
    assert merged.with_payloads
    assert _pay_set(SearchEngine(merged), "red") == EXPECTED_RED
    compact = consolidate(merged, bucket_bits=4)
    assert _pay_set(SearchEngine(compact), "red") == EXPECTED_RED


def test_payloads_survive_purge(spark):
    idx = _build(spark)
    masked = idx.delete_docs(
        spark.createDataFrame([(0,)], "doc_id long")
    )
    # read-time mask: doc 0's payloads disappear immediately
    assert _pay_set(SearchEngine(masked), "red") == EXPECTED_RED - {
        (0, 1, b"r1"),
        (0, 2, b"r2"),
    }
    purged = purge_deleted(masked, bucket_bits=4)
    assert _pay_set(SearchEngine(purged), "red") == EXPECTED_RED - {
        (0, 1, b"r1"),
        (0, 2, b"r2"),
    }


def test_payloads_mixed_merge_rejected(spark):
    a = _build(spark, rows=ROWS[:2])
    plain = build_index(
        spark.createDataFrame(ROWS[2:], "doc_id long, text string"),
        analyzer="simple",
        bucket_bits=4,
    )
    with pytest.raises(ValueError, match="payload"):
        merge_indexes(a, plain)


def test_payloads_require_positions(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    with pytest.raises(ValueError, match="payload_delimiter"):
        build_index(
            df, analyzer="simple", with_positions=False, payload_delimiter="|"
        )


def test_payloads_on_engine_without_them(spark):
    idx = build_index(
        spark.createDataFrame(ROWS, "doc_id long, text string"),
        analyzer="simple",
        bucket_bits=4,
    )
    with pytest.raises(ValueError, match="without payloads"):
        SearchEngine(idx).payloads(["red"])


def test_payload_scoring_unaffected_by_split(spark):
    """BM25 over the payload-built index == BM25 over an index built on
    the pre-split term text: the payload split must not perturb freqs,
    positions, dls, or stats."""
    stripped = [
        (i, " ".join(t.split("|")[0] for t in txt.split()))
        for i, txt in enumerate(r[1] for r in ROWS)
    ]
    plain = build_index(
        spark.createDataFrame(stripped, "doc_id long, text string"),
        analyzer="simple",
        bucket_bits=4,
    )
    pay = _build(spark)
    got = {
        (r["doc_id"], round(r["score"], 9))
        for r in SearchEngine(pay).search(Term("red"), k=10).collect()
    }
    want = {
        (r["doc_id"], round(r["score"], 9))
        for r in SearchEngine(plain).search(Term("red"), k=10).collect()
    }
    assert got == want
