"""Exists prefix_match (ColumnAcceptor prefix mode,
column_existence_filter.hpp:38-39)."""

import pytest

from iresearch_spark.index.builder import build_index
from iresearch_spark.search import SearchEngine, Exists


@pytest.fixture(scope="module")
def eng(spark):
    docs = spark.createDataFrame(
        [
            (1, "a", "en", 0.9),
            (2, "b", None, 0.5),
            (3, "c", None, None),
            (4, "d", "fr", None),
        ],
        "doc_id long, text string, lang string, lang_score double",
    )
    idx = build_index(
        docs,
        text_col="text",
        id_col="doc_id",
        analyzer="simple",
        extra_doc_cols=["lang", "lang_score"],
    )
    return SearchEngine(idx)


def test_prefix_match_any_column(eng):
    got = {r["doc_id"] for r in eng.matches(Exists("lang", prefix_match=True)).collect()}
    assert got == {1, 2, 4}  # doc 3 has neither lang nor lang_score


def test_exact_still_single_column(eng):
    got = {r["doc_id"] for r in eng.matches(Exists("lang")).collect()}
    assert got == {1, 4}
    got2 = {r["doc_id"] for r in eng.matches(Exists("lang_score")).collect()}
    assert got2 == {1, 2}


def test_prefix_match_unknown_prefix_raises(eng):
    with pytest.raises(ValueError):
        eng.matches(Exists("nope", prefix_match=True)).collect()
