"""Terms min_match / merge_type (terms_filter.hpp:63-67) ride the Or
machinery — differentials against the explicit boolean forms."""

import pytest

from iresearch_spark.index.builder import build_index
from iresearch_spark.search import SearchEngine, Or, Term, Terms


@pytest.fixture(scope="module")
def eng(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta"),
            (3, "alpha alpha"),
            (4, "gamma delta"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs, text_col="text", id_col="doc_id", analyzer="simple")
    return SearchEngine(idx)


def _scores(eng, node):
    return {r["doc_id"]: r["score"] for r in eng.matches(node).collect()}


def test_min_match_counts_distinct_terms(eng):
    got = _scores(eng, Terms(["alpha", "beta", "gamma"], min_match=2))
    want = _scores(
        eng, Or([Term("alpha"), Term("beta"), Term("gamma")], min_match=2)
    )
    assert got == want
    assert set(got) == {1, 2}  # doc 3 has only one distinct term


def test_merge_type_max(eng):
    got = _scores(eng, Terms(["alpha", "beta"], merge_type="max"))
    want = _scores(eng, Or([Term("alpha"), Term("beta")], merge_type="max"))
    assert got == want


def test_min_match_with_term_boosts(eng):
    got = _scores(
        eng,
        Terms(
            ["alpha", "beta", "gamma"],
            min_match=2,
            term_boosts={"beta": 3.0},
        ),
    )
    want = _scores(
        eng,
        Or([Term("alpha"), Term("beta", 3.0), Term("gamma")], min_match=2),
    )
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], rel=1e-9)
