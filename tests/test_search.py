"""Operator-by-operator differential tests: Spark engine vs pure-Python
oracle (the reference's per-filter test layer, tests/search/*_tests.cpp),
plus the WAND-vs-exhaustive differential (wand_test.cpp:234-240)."""

import math
import random

import pytest

from iresearch_spark.index.builder import build_index
from iresearch_spark.search import (
    AllDocs,
    And,
    Empty,
    Fuzzy,
    Not,
    Or,
    Phrase,
    Prefix,
    Range,
    SearchEngine,
    Term,
    Terms,
    Wildcard,
)
from tests.oracle import PyIndex

VOCAB = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "spark", "index", "search", "engine", "term", "query", "score",
    "rank", "merge", "block", "posting", "delta",
]
WEIGHTS = [40, 25, 18, 14, 11, 9, 8, 7, 6, 6, 5, 5, 4, 3, 3, 2, 2, 2, 1, 1]


def _corpus(n=400, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.randint(4, 60)
        rows.append((i, " ".join(rng.choices(VOCAB, weights=WEIGHTS, k=k))))
    return rows


@pytest.fixture(scope="module")
def env(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(df, analyzer="simple", bucket_bits=7)
    idx.cache()
    idx.postings.count()  # materialize
    return PyIndex(rows), SearchEngine(idx)


def _got(engine, q, **kw):
    return {r["doc_id"]: r["score"] for r in engine.matches(q, **kw).collect()}


def _assert_same(got: dict, want: dict):
    assert set(got) == set(want), (
        f"doc sets differ: only_got={set(got) - set(want)}, "
        f"only_want={set(want) - set(got)}"
    )
    for d in want:
        assert math.isclose(got[d], want[d], rel_tol=1e-9, abs_tol=1e-12), (
            d,
            got[d],
            want[d],
        )


QUERIES = [
    Term("quick"),
    Term("missingterm"),
    Term("delta"),
    Terms(["quick", "dog", "posting"]),
    And([Term("quick"), Term("dog")]),
    And([Term("the"), Term("delta"), Term("fox")]),
    Or([Term("quick"), Term("posting")]),
    Or([Term("the"), Term("lazy"), Term("delta")], min_match=2),
    Or([Term("quick"), Term("brown"), Term("fox"), Term("dog")], min_match=3),
    And([Term("the"), Not(Term("dog"))]),
    And([Term("quick"), Or([Term("posting"), Term("delta")])]),
    Prefix("qu"),
    Prefix("s"),
    Prefix("zz"),
    Wildcard("%ck"),
    Wildcard("s_ar%"),
    Range(min_term="delta", max_term="fox"),
    Range(min_term="delta", max_term="fox", include_min=False, include_max=False),
    Range(max_term="c"),
    Fuzzy("quicc", distance=1),
    Fuzzy("spurk", distance=2),
    Phrase(["quick", "brown"]),
    Phrase(["the", "quick", "brown"]),
    Phrase(["dog", "dog"]),
    AllDocs(),
    And([AllDocs(), Term("quick")]),
    Or([Term("quick"), Phrase(["lazy", "dog"])]),
    Term("quick", boost=2.5),
    And([Term("quick", boost=2.0), Term("dog")], boost=3.0),
]


@pytest.mark.parametrize("q", QUERIES, ids=lambda q: repr(q)[:60])
def test_matches_vs_oracle(env, q):
    py, engine = env
    _assert_same(_got(engine, q), py.eval(q))


def test_topk_rank_identical(env):
    py, engine = env
    for q in [Term("quick"), Or([Term("quick"), Term("dog")]),
              And([Term("the"), Term("delta")])]:
        for k in (10, 100):
            got = [
                (r["doc_id"], r["score"]) for r in engine.search(q, k=k).collect()
            ]
            want = py.topk(q, k)
            assert [g[0] for g in got] == [w[0] for w in want]
            for g, w in zip(got, want):
                assert math.isclose(g[1], w[1], rel_tol=1e-9)


def test_wand_differential(env):
    """WAND-enabled and exhaustive collection must be identical
    (reference wand_test.cpp:234-240; limits 10/100 as there)."""
    py, engine = env
    queries = [
        Term("quick"),
        Term("the"),
        Term("delta"),
        Or([Term("quick"), Term("posting")]),
        Or([Term("the"), Term("lazy"), Term("delta")]),
        And([Term("quick"), Term("dog")]),
    ]
    for q in queries:
        for k in (10, 100):
            ex = [
                (r["doc_id"], round(r["score"], 9))
                for r in engine.search(q, k=k, mode="exhaustive").collect()
            ]
            wd = [
                (r["doc_id"], round(r["score"], 9))
                for r in engine.search(q, k=k, mode="wand").collect()
            ]
            assert ex == wd, f"WAND mismatch for {q} k={k}"


def test_tfidf_scorer(env):
    py, engine = env
    from iresearch_spark.search.executor import SearchEngine as SE

    eng2 = SE(engine.index, scorer="tfidf")
    got = _got(eng2, Term("quick"))
    d = py.postings["quick"]
    for doc, ps in d.items():
        idf = math.log(1.0 + (py.n_docs + 1.0) / (len(d) + 1.0))
        assert math.isclose(got[doc], math.sqrt(len(ps)) * idf, rel_tol=1e-9)


def test_empty_and_unsatisfiable(env):
    _, engine = env
    assert engine.matches(Empty()).count() == 0
    assert engine.matches(Or([Term("quick")], min_match=5)).count() == 0
    assert engine.matches(And([Term("quick"), Empty()])).count() == 0


def test_ngram_similarity_query(spark):
    """by_ngram_similarity as a query node: LCS(query ngram seq, doc
    ngram stream)/m >= threshold (ngram_similarity_filter.hpp:33-49).
    Index built with the char-ngram analyzer so positions ARE the ngram
    stream order."""
    from iresearch_spark.analysis.analyzers import get_analyzer
    from iresearch_spark.search import NgramSimilarity

    docs = [
        (0, "abcd"),    # ngrams(2): ab bc cd  -- exact target
        (1, "abxd"),    # ab bx xd -- shares only 'ab' -> 1/3
        (2, "zabcd"),   # za ab bc cd -- contains full target subsequence
        (3, "dcba"),    # dc cb ba -- none
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = build_index(
        df, analyzer=get_analyzer("ngram", min_gram=2, max_gram=2),
        bucket_bits=7,
    )
    eng = SearchEngine(idx)
    q = NgramSimilarity(["ab", "bc", "cd"], threshold=0.9)
    got = {r["doc_id"]: r["score"] for r in eng.search(q, k=10).collect()}
    assert set(got) == {0, 2}
    assert abs(got[0] - 1.0) < 1e-9
    q2 = NgramSimilarity(["ab", "bc", "cd"], threshold=0.3)
    got2 = {r["doc_id"]: round(r["score"], 6) for r in eng.search(q2, k=10).collect()}
    assert set(got2) == {0, 1, 2}
    assert abs(got2[1] - 1.0 / 3) < 1e-6


def test_search_many_matches_individual(spark):
    """Batched multi-query execution returns exactly the per-query
    search() results (one job, same plans)."""
    rows = _corpus(200, seed=5)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(df, analyzer="simple", bucket_bits=7)
    eng = SearchEngine(idx)
    qs = {
        "t": Term("the"),
        "and": And([Term("quick"), Term("fox")]),
        "or": Or([Term("lazy"), Term("dog")], min_match=1),
        "phrase": Phrase(["quick", "brown"]),
    }
    batched = {}
    for r in eng.search_many(qs, k=5).collect():
        batched.setdefault(r["query"], []).append((r["doc_id"], round(r["score"], 9)))
    for name, node in qs.items():
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in eng.search(node, k=5).collect()
        ]
        assert sorted(batched.get(name, [])) == sorted(want), name


def test_search_many_shared_scan_matches_per_query(spark):
    """The shared-scan batch path must produce exactly search()'s
    results for every query shape it accepts — and fall back cleanly
    for the rest (phrase, exclusions, non-sum merges)."""
    from iresearch_spark.index.builder import build_index
    from iresearch_spark.search import And, Not, Or, Phrase, SearchEngine, Term

    rows = [
        (i, " ".join(
            ["alpha"] * (1 + i % 3)
            + (["beta"] if i % 2 else [])
            + (["gamma", "delta"] if i % 5 == 0 else ["epsilon"])
        ))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ix = build_index(df, analyzer="simple", bucket_bits=7)
    eng = SearchEngine(ix)
    queries = {
        "t": Term("alpha", boost=2.0),
        "and": And([Term("alpha"), Term("beta")]),
        "or_mm": Or([Term("beta"), Term("gamma"), Term("delta")], min_match=2),
        "boosted": Or([Term("alpha", boost=0.5), Term("epsilon")], boost=3.0),
        "phrase": Phrase(["gamma", "delta"]),          # fallback path
        "not": And([Term("alpha"), Not(Term("beta"))]),  # fallback path
        "maxm": Or([Term("alpha"), Term("beta")], merge_type="max"),  # fallback
    }
    got = {}
    for r in eng.search_many(queries, k=7).collect():
        got.setdefault(r["query"], []).append((r["doc_id"], round(r["score"], 9)))
    for name, node in queries.items():
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in eng.search(node, k=7).collect()
        ]
        assert got.get(name, []) == want, name
    # deleted docs excluded on the shared path too
    masked = SearchEngine(ix.delete_docs(
        spark.createDataFrame([(0,), (5,)], "doc_id long")
    ))
    got2 = {}
    for r in masked.search_many({"t": Term("alpha")}, k=7).collect():
        got2.setdefault(r["query"], []).append(r["doc_id"])
    assert 0 not in got2["t"] and 5 not in got2["t"]
