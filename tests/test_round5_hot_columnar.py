"""HotEngine columnar leaves: Exists / NumericRange / GranularRange /
Nested / AllDocs / Cached served driver-resident, differential vs the
cluster engine (same queries, same index) incl. NaN/null semantics,
deletes, booleans, f32 parity, and the fallback gates."""

import math
import random

import pytest

from iresearch_spark.index.builder import build_index
from iresearch_spark.search import (
    AllDocs,
    And,
    Cached,
    Exists,
    GranularRange,
    Nested,
    Not,
    NumericRange,
    Or,
    SearchEngine,
    Term,
)
from iresearch_spark.search.hot import HotEngine

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon"]


@pytest.fixture(scope="module")
def engines(spark):
    rng = random.Random(5)
    rows = []
    for i in range(300):
        n = None if i % 17 == 0 else (
            float("nan") if i % 23 == 5 else float(i % 40 - 10)
        )
        meta_a = f"a{i}" if i % 3 else None
        meta_b = f"b{i}" if i % 4 else None
        # docs 0..49 are parents; 50.. are children of parent i % 50
        parent = None if i < 50 else i % 50
        rows.append(
            (
                i,
                " ".join(rng.choices(WORDS, k=rng.randint(3, 12))),
                n,
                meta_a,
                meta_b,
                parent,
            )
        )
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, n double, meta_a string, "
        "meta_b string, parent_id long",
    )
    idx = build_index(
        df,
        id_col="doc_id",
        text_col="text",
        numeric_fields=["n"],
        extra_doc_cols=["n", "meta_a", "meta_b", "parent_id"],
    )
    eng = SearchEngine(idx)
    return eng, HotEngine(eng)


QUERIES = [
    Exists("n"),
    Exists("meta_a", boost=2.0),
    Exists("meta", prefix_match=True),
    NumericRange("n", 0.0, 10.0),
    NumericRange("n", 0.0, 10.0, include_min=False, include_max=False),
    NumericRange("n", 5.0, None),          # NaN matches (Spark order)
    NumericRange("n", None, 5.0),          # NaN excluded
    NumericRange("n", None, None, boost=1.5),
    GranularRange("n", 0.0, 10.0),
    GranularRange("n", 5.0, None),         # dictionary tier: no NaN
    GranularRange("n", None, None),
    AllDocs(boost=0.5),
    And([Term("alpha"), NumericRange("n", -5.0, 5.0)]),
    Or([Term("delta"), Exists("meta_b"), Not(NumericRange("n", None, 0.0))]),
    Or([Term("alpha"), GranularRange("n", 20.0, None)], min_match=2),
    Cached(Term("beta"), boost=3.0),
    Nested(Term("alpha"), min_children=2),
    Nested(Term("alpha"), min_children=1, max_children=3, boost=2.0),
    Nested(Term("beta"), merge_type="max"),
    Nested(Term("beta"), merge_type="min"),
    Nested(Or([Term("alpha"), Term("gamma")]), merge_type="noop"),
    And([Term("alpha"), Nested(Term("beta"), min_children=1)]),
]


def _want(eng, q, k=400):
    return sorted(
        (r["doc_id"], round(r["score"], 6))
        for r in eng.matches(q).collect()
    )


@pytest.mark.parametrize(
    "q", QUERIES, ids=[type(q).__name__ + str(i) for i, q in enumerate(QUERIES)]
)
def test_hot_columnar_matches_cluster(engines, q):
    eng, hot = engines
    assert hot._servable(q) or not hot._servable(q)  # smoke the gate
    want = _want(eng, q)
    got = sorted((d, round(s, 6)) for d, s in hot.matches(q))
    assert got == want


def test_hot_columnar_is_served_not_fallback(engines):
    """The shapes above actually take the in-memory path."""
    eng, hot = engines
    from iresearch_spark.search import planner

    for q in QUERIES:
        assert hot._servable(planner.normalize(q)), q


def test_hot_topk_order_with_columnar(engines):
    eng, hot = engines
    q = And([Term("alpha"), NumericRange("n", -5.0, 15.0, boost=2.0)])
    want = [
        (r["doc_id"], round(r["score"], 6))
        for r in eng.search(q, k=12).collect()
    ]
    got = [(d, round(s, 6)) for d, s in hot.search(q, k=12)]
    assert got == want


def test_hot_granular_nan_tiers_match_cluster(spark):
    """build_index always stores numeric fields in docs too (so the
    two tiers agree on values) — a GranularRange therefore serves hot
    from the stored column but must keep the DICTIONARY tier's NaN
    semantics (never match), while a plain NumericRange keeps Spark's
    NaN-above-everything comparison semantics. Differential on a
    corpus where the two genuinely diverge (min-only range)."""
    rows = [
        (i, "alpha beta", float("nan") if i % 5 == 0 else float(i))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, m double")
    idx = build_index(
        df, id_col="doc_id", text_col="text", numeric_fields=["m"]
    )
    eng = SearchEngine(idx)
    hot = HotEngine(eng)
    for q in (
        GranularRange("m", 10.0, None),
        NumericRange("m", 10.0, None),
        GranularRange("m", None, None),
        NumericRange("m", None, None),
    ):
        want = _want(eng, q)
        got = sorted((d, round(s, 6)) for d, s in hot.matches(q))
        assert got == want, q
    # and they really diverge on NaN docs (premise check)
    g = {d for d, _ in hot.matches(GranularRange("m", 10.0, None))}
    n = {d for d, _ in hot.matches(NumericRange("m", 10.0, None))}
    assert n - g == {i for i in range(40) if i % 5 == 0}


def test_hot_columnar_missing_column_same_error(engines):
    eng, hot = engines
    with pytest.raises(ValueError, match="no column"):
        hot.matches(Exists("nope"))
    with pytest.raises(ValueError, match="no column with prefix"):
        hot.matches(Exists("zz", prefix_match=True))
    with pytest.raises(ValueError, match="min_children"):
        hot.matches(Nested(Term("alpha"), min_children=0))


def test_hot_columnar_respects_deletes(spark):
    rows = [
        (i, "alpha" if i % 2 else "alpha beta", float(i), None if i < 5 else i % 5)
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, n double, parent_id long"
    )
    idx = build_index(
        df,
        id_col="doc_id",
        text_col="text",
        extra_doc_cols=["n", "parent_id"],
    )
    idx2 = idx.delete_docs(
        spark.createDataFrame([(2,), (7,), (12,)], "doc_id long")
    )
    eng = SearchEngine(idx2)
    hot = HotEngine(eng)
    for q in (
        NumericRange("n", 0.0, 30.0),
        Exists("n"),
        Nested(Term("beta"), min_children=2),
        AllDocs(),
    ):
        want = _want(eng, q)
        got = sorted((d, round(s, 6)) for d, s in hot.matches(q))
        assert got == want, q
        assert not {2, 7, 12} & {d for d, _ in got}


def test_hot_cached_reuses_result(engines):
    eng, hot = engines
    q = Cached(Term("gamma"))
    first = hot.matches(q)
    assert hot._proxy  # populated
    # poke: second run returns identical pairs without re-deriving
    assert hot.matches(q) == first
    # boost scales the cached result, never re-rounds through const
    b = sorted(hot.matches(Cached(Term("gamma"), boost=2.0)))
    base = sorted(first)
    for (d1, s1), (d2, s2) in zip(base, b):
        assert d1 == d2 and math.isclose(s2, 2.0 * s1, rel_tol=1e-12)


def test_hot_columnar_f32_parity(spark):
    rows = [
        (i, "alpha beta gamma", float(i % 7)) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n double")
    idx = build_index(
        df, id_col="doc_id", text_col="text", extra_doc_cols=["n"]
    )
    eng32 = SearchEngine(idx, score_dtype="float32")
    hot32 = HotEngine(eng32)
    for q in (
        Exists("n", boost=1.7),
        And([Term("alpha"), NumericRange("n", 2.0, None, boost=0.3)]),
    ):
        want = sorted(
            (r["doc_id"], r["score"]) for r in eng32.matches(q).collect()
        )
        got = sorted(hot32.matches(q))
        assert got == want  # const scores round through f32 identically


def test_hot_ngram_similarity_matches_cluster(spark):
    """NgramSimilarity served in-memory: same candidates, same LCS/m
    similarities, same boost multiply as the cluster's pandas kernel;
    deletes respected; falls back only when positions are absent."""
    from iresearch_spark.analysis.analyzers import get_analyzer
    from iresearch_spark.search import NgramSimilarity

    rng = random.Random(11)
    alpha = "abcdxyz"
    docs = [(0, "abcd"), (1, "abxd"), (2, "zabcd"), (3, "dcba")]
    docs += [
        (i, "".join(rng.choices(alpha, k=rng.randint(4, 12))))
        for i in range(4, 120)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = build_index(
        df, analyzer=get_analyzer("ngram", min_gram=2, max_gram=2),
        bucket_bits=7,
    )
    eng = SearchEngine(idx)
    hot = HotEngine(eng)
    for q in (
        NgramSimilarity(["ab", "bc", "cd"], threshold=0.9),
        NgramSimilarity(["ab", "bc", "cd"], threshold=0.3, boost=2.5),
        NgramSimilarity(["ab", "ab", "cd"], threshold=0.5),  # repeat gram
        NgramSimilarity(["qq", "zz"], threshold=0.4),        # partly absent
        Or([Term("ab"), NgramSimilarity(["ab", "bc"], threshold=0.9)]),
    ):
        assert hot._servable(q) or isinstance(q, Or)
        want = _want(eng, q)
        got = sorted((d, round(s, 6)) for d, s in hot.matches(q))
        assert got == want, q
    # deletes
    idx2 = idx.delete_docs(spark.createDataFrame([(0,)], "doc_id long"))
    eng2 = SearchEngine(idx2)
    hot2 = HotEngine(eng2)
    q = NgramSimilarity(["ab", "bc", "cd"], threshold=0.3)
    want = _want(eng2, q)
    got = sorted((d, round(s, 6)) for d, s in hot2.matches(q))
    assert got == want and 0 not in {d for d, _ in got}
    # no positions -> not servable (cluster raises the same error)
    idx3 = build_index(
        df, analyzer=get_analyzer("ngram", min_gram=2, max_gram=2),
        bucket_bits=7, with_positions=False,
    )
    hot3 = HotEngine(SearchEngine(idx3))
    assert not hot3._servable(q)
