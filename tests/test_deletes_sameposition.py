"""Delete-mask semantics (reference remove-by-filter + merge purge) and
the by_same_position filter."""

import math

import pytest

from iresearch_spark.index.builder import build_index
from iresearch_spark.index.merge import purge_deleted
from iresearch_spark.search import And, Or, SamePosition, SearchEngine, Term
from tests.oracle import PyIndex

ROWS = [
    (0, "apple banana cherry"),
    (1, "banana apple cherry"),
    (2, "apple apple banana"),
    (3, "cherry banana apple"),
    (4, "durian elderberry fig"),
    (5, "apple banana"),
]


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    ix = build_index(df, analyzer="simple", bucket_bits=7)
    ix.cache()
    return ix


def test_delete_mask_hides_docs(spark, idx):
    eng_all = SearchEngine(idx)
    before = {r["doc_id"] for r in eng_all.matches(Term("apple")).collect()}
    assert before == {0, 1, 2, 3, 5}
    mask = spark.createDataFrame([(0,), (2,)], "doc_id long")
    ix2 = idx.delete_docs(mask)
    eng = SearchEngine(ix2)
    after = {r["doc_id"] for r in eng.matches(Term("apple")).collect()}
    assert after == {1, 3, 5}
    # scores of surviving docs unchanged (stats stay stale until purge,
    # matching the reference between consolidations)
    s_before = {
        r["doc_id"]: r["score"] for r in eng_all.matches(Term("apple")).collect()
    }
    s_after = {r["doc_id"]: r["score"] for r in eng.matches(Term("apple")).collect()}
    for d in after:
        assert math.isclose(s_before[d], s_after[d], rel_tol=1e-12)
    # WAND path also masks
    wd = {r["doc_id"] for r in eng.search(Term("apple"), k=10, mode="wand").collect()}
    assert wd == after


def test_purge_rebuilds_stats(spark, idx):
    mask = spark.createDataFrame([(0,), (2,)], "doc_id long")
    purged = purge_deleted(idx.delete_docs(mask), bucket_bits=7)
    assert purged.deleted is None
    assert purged.field_stats.n_docs == 4
    # scores now equal a fresh index built without the deleted docs
    fresh_rows = [r for r in ROWS if r[0] not in (0, 2)]
    fresh = build_index(
        spark.createDataFrame(fresh_rows, "doc_id long, text string"),
        analyzer="simple",
        bucket_bits=7,
    )
    a = {
        r["doc_id"]: round(r["score"], 9)
        for r in SearchEngine(purged).matches(Term("apple")).collect()
    }
    b = {
        r["doc_id"]: round(r["score"], 9)
        for r in SearchEngine(fresh).matches(Term("apple")).collect()
    }
    assert a == b


def test_same_position(idx):
    eng = SearchEngine(idx)
    # position 0: apple in docs 0,2,5; banana in docs 1; cherry in 3 ...
    # same position for (apple, banana): doc where some p has both -> none
    assert eng.matches(SamePosition(["apple", "banana"])).count() == 0
    # same term twice at same position is trivially itself
    got = {r["doc_id"] for r in eng.matches(SamePosition(["apple", "apple"])).collect()}
    assert got == {0, 1, 2, 3, 5}
    # cross-check: same-position tf for doc 2 is 2 (positions 0 and 1)
    rows = {r["doc_id"]: r["score"] for r in eng.matches(SamePosition(["apple", "apple"])).collect()}
    py = PyIndex(ROWS)
    # score = 2*c0(apple) * g(tf,dl) where tf = #positions with apple
    for d, s in rows.items():
        tf = len(py.postings["apple"][d])
        dl = py.dl[d]
        k, b = 1.2, 0.75
        c0 = 2 * (k + 1.0) * py.idf_bm25(len(py.postings["apple"]))
        c1 = k * (1 - b) + (k * b / py.avg_dl) * dl
        assert math.isclose(s, c0 * tf / (c1 + tf), rel_tol=1e-9)
