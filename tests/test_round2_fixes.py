"""Round-2 regression tests: WAND theta under delete masks, consolidate
with pending deletes, bm15/bm11 scorer opts, zero-token docs."""

import math

import pytest

from iresearch_spark.index.builder import build_index
from iresearch_spark.index.merge import consolidate
from iresearch_spark.search import AllDocs, SearchEngine, Term
from iresearch_spark.search.scorers import get_scorer


def test_wand_theta_respects_delete_mask(spark):
    # doc 1 is the top-scoring doc and gets deleted; with the unmasked
    # seed eval its achieved score inflated theta above the true live
    # k-th score, pruning the block holding the live top doc
    rows = [(i, "x " * (50 if i == 1 else 30 if i == 256 else 1)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # small segments -> many blocks per term, so pruning actually runs
    idx = build_index(df, analyzer="simple", bucket_bits=3).cache()
    mask = df.sparkSession.createDataFrame([(1,)], "doc_id long")
    eng = SearchEngine(idx.delete_docs(mask))
    exhaustive = eng.search(Term("x"), k=1, mode="exhaustive").collect()
    wand = eng.search(Term("x"), k=1, mode="wand").collect()
    assert [r["doc_id"] for r in exhaustive] == [256]
    assert [(r["doc_id"], round(r["score"], 9)) for r in wand] == [
        (r["doc_id"], round(r["score"], 9)) for r in exhaustive
    ]
    idx.unpersist()


def test_consolidate_preserves_delete_mask(spark):
    rows = [(i, "apple banana" if i % 2 else "apple") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(df, analyzer="simple", bucket_bits=7)
    mask = spark.createDataFrame([(0,), (3,)], "doc_id long")
    deleted = idx.delete_docs(mask)
    cons = consolidate(deleted, bucket_bits=7)
    assert cons.deleted is not None
    got = {r["doc_id"] for r in SearchEngine(cons).matches(Term("apple")).collect()}
    assert got == set(range(10)) - {0, 3}


def test_bm15_bm11_accept_opts():
    assert get_scorer("bm15", k=2.0).k == 2.0
    assert get_scorer("bm15").b == 0.0
    assert get_scorer("bm11", k=0.9).b == 1.0
    with pytest.raises(ValueError):
        get_scorer("bm15", b=0.5)


def test_zero_token_docs_visible_to_alldocs(spark):
    rows = [(0, "apple pie"), (1, ""), (2, "banana"), (3, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(df, analyzer="simple", bucket_bits=7)
    # docs table covers every doc, empty ones with dl=0
    dls = {r["doc_id"]: r["dl"] for r in idx.docs.collect()}
    assert dls == {0: 2, 1: 0, 2: 1, 3: 0}
    # AllDocs matches every doc (reference all(), filter.hpp:160)
    eng = SearchEngine(idx)
    got = {r["doc_id"] for r in eng.matches(AllDocs(boost=2.0)).collect()}
    assert got == {0, 1, 2, 3}
    # BM25's N stays docs_with_field (bm25.cpp:48-54)
    assert idx.field_stats.n_docs == 2
    assert idx.field_stats.total_term_freq == 3
