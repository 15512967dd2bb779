import pytest
from pyspark.sql import functions as F
from iresearch_spark.index.builder import build_index
from iresearch_spark.search import SearchEngine, Or, Term, Terms

def test_per_term_boosts_match_boosted_or(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i%5} " + ("alpha " * (i % 3))) for i in range(60)],
        "doc_id long, text string",
    )
    idx = build_index(docs, text_col="text", id_col="doc_id", analyzer="simple")
    eng = SearchEngine(idx)
    a = {
        r["doc_id"]: r["score"]
        for r in eng.matches(
            Terms(["alpha", "beta", "gamma"], term_boosts={"alpha": 2.0, "gamma": 0.25})
        ).collect()
    }
    b = {
        r["doc_id"]: r["score"]
        for r in eng.matches(
            Or([Term("alpha", 2.0), Term("beta"), Term("gamma", 0.25)])
        ).collect()
    }
    assert set(a) == set(b)
    for d in a:
        assert a[d] == pytest.approx(b[d], rel=1e-9)

def test_single_term_terms_folds_boost(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta beta")], "doc_id long, text string"
    )
    idx = build_index(docs, text_col="text", id_col="doc_id", analyzer="simple")
    eng = SearchEngine(idx)
    a = {r["doc_id"]: r["score"] for r in eng.matches(Terms(["alpha"], term_boosts={"alpha": 3.0})).collect()}
    b = {r["doc_id"]: r["score"] for r in eng.matches(Term("alpha", 3.0)).collect()}
    assert a == b
