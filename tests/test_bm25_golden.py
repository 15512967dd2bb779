"""Hand-computed BM25 goldens on a tiny fixed corpus — the recipe of the
reference's scorer tests (`tests/search/bm25_test.cpp:528-600`, which
indexes a small JSON fixture, runs by_term, and asserts the exact ranked
doc list). Every expected value below is computed by hand from the
formula in `core/search/bm25.cpp:381-402`."""

import math

import pytest

from iresearch_spark.index.builder import build_index
from iresearch_spark.search import SearchEngine, Term

# 4 docs; term "seven" appears with tf 1,2,3 in docs 0,1,5 and 0 in others
DOCS = [
    (0, "seven alpha beta gamma"),            # dl=4, tf(seven)=1
    (1, "seven seven alpha"),                 # dl=3, tf=2
    (2, "alpha beta"),                        # dl=2
    (5, "seven seven seven"),                 # dl=3, tf=3
    (7, "beta seven"),                        # dl=2, tf=1
]
# N=5 docs, total_tf = 4+3+2+3+2 = 14, avg_dl = 2.8
# df(seven)=4 -> idf = ln(1 + (5-4+0.5)/(4+0.5)) = ln(1+1.5/4.5) = ln(4/3)
K, B = 1.2, 0.75
IDF = math.log(1.0 + 1.5 / 4.5)
AVG = 14.0 / 5.0


def bm25(tf, dl):
    c0 = (K + 1.0) * IDF
    c1 = K * (1 - B) + (K * B / AVG) * dl
    return c0 * tf / (c1 + tf)


@pytest.fixture(scope="module")
def engine(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_index(df, analyzer="simple", bucket_bits=7)
    return SearchEngine(idx)


def test_bm25_exact_scores(engine):
    got = {
        r["doc_id"]: r["score"]
        for r in engine.matches(Term("seven")).collect()
    }
    want = {0: bm25(1, 4), 1: bm25(2, 3), 5: bm25(3, 3), 7: bm25(1, 2)}
    assert set(got) == set(want)
    for d in want:
        assert math.isclose(got[d], want[d], rel_tol=1e-12), (d, got[d], want[d])


def test_bm25_expected_ranking(engine):
    # hand-ordering: tf3/dl3 > tf2/dl3 > tf1/dl2 > tf1/dl4
    order = [r["doc_id"] for r in engine.search(Term("seven"), k=10).collect()]
    assert order == [5, 1, 7, 0]


def test_float32_parity(engine):
    """Reference computes in float32 (score_t); our float64 scores must
    round-trip to the same float32 values (rank-identity guard)."""
    import numpy as np

    got = {
        r["doc_id"]: r["score"]
        for r in engine.matches(Term("seven")).collect()
    }
    for d, s in got.items():
        want32 = np.float32(
            bm25({0: 1, 1: 2, 5: 3, 7: 1}[d], {0: 4, 1: 3, 5: 3, 7: 2}[d])
        )
        assert np.float32(s) == want32
