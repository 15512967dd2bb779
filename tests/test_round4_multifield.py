"""Multi-field documents + field-scoped queries (reference: per-leaf
field names on every term-level filter, filter.hpp; per-field term
dictionaries/norms/stats via field_meta + FieldCollector,
core/index/field_meta.cpp, bm25.cpp:45-80).

Gate semantics pinned here: per-field BM25 uses that field's OWN
df/N/avg_dl (not corpus-wide), cross-field booleans compose doc-id-wise
with sum/max/min_match/Not, and a single-Field-rooted query runs
natively (WAND-able) on its field's engine."""

import math

import pytest
from pyspark.sql import functions as F

from iresearch_spark.index.multifield import MultiFieldIndex, build_multi_field_index
from iresearch_spark.search import (
    And,
    Field,
    MultiFieldEngine,
    Not,
    Or,
    SearchEngine,
    Term,
)
from iresearch_spark.search import ast
from iresearch_spark.search.planner import normalize


@pytest.fixture(scope="module")
def mf(spark):
    rows = []
    for i in range(80):
        title = f"doc{'x' if i % 3 == 0 else 'y'} spark" if i % 2 == 0 else "plain title"
        body = (
            f"alpha beta {'spark shuffle' if i % 5 == 0 else 'gamma delta'} tail{i % 7}"
        )
        rows.append((f"u{i:03d}", title, body))
    df = spark.createDataFrame(rows, "url string, title string, body string")
    idx = build_multi_field_index(
        df, ["title", "body"], sort_key="url", bucket_bits=8,
        extra_doc_cols=["url"],
    )
    yield df, idx
    idx.unpersist()


def _by_url(ix, df_scores):
    m = df_scores.join(ix.docs.select("doc_id", "url"), "doc_id")
    return sorted((r["url"], round(r["score"], 9)) for r in m.collect())


def test_field_routed_equals_single_field_engine(spark, mf):
    df, idx = mf
    eng = MultiFieldEngine(idx)
    got = _by_url(idx.indexes["body"], eng.matches(Field("body", Term("shuffle"))))
    solo = build_multi_field_index(
        df, ["body"], sort_key="url", bucket_bits=8, extra_doc_cols=["url"]
    )
    want = _by_url(
        solo.indexes["body"],
        SearchEngine(solo.indexes["body"]).matches(Term("shuffle")),
    )
    assert got == want and got


def test_per_field_stats_differ_from_corpus_wide(spark, mf):
    """'spark' appears in both fields — the title hit must score with
    TITLE's df/N/avg_dl, the body hit with BODY's. Closed-form check
    on one document."""
    df, idx = mf
    eng = MultiFieldEngine(idx)
    t = idx.indexes["title"]
    doc = (
        t.docs.filter(F.col("url") == "u000")
        .select("doc_id", "dl")
        .collect()[0]
    )
    df_t = (
        t.term_stats.filter(F.col("term") == "spark").collect()[0]["df"]
    )
    n, avg = t.field_stats.n_docs, t.field_stats.avg_dl
    k, b = 1.2, 0.75
    idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
    want = (
        (k + 1) * idf * 1.0 / (k * (1 - b) + (k * b / avg) * doc["dl"] + 1.0)
    )
    got = {
        r["doc_id"]: r["score"]
        for r in eng.matches(Field("title", Term("spark"))).collect()
    }[doc["doc_id"]]
    assert got == pytest.approx(want, rel=1e-12)


def test_cross_field_and_sums_scores(spark, mf):
    df, idx = mf
    eng = MultiFieldEngine(idx)
    q = And([Field("title", Term("spark")), Field("body", Term("shuffle"))])
    got = {r["doc_id"]: r["score"] for r in eng.matches(q).collect()}
    a = {r["doc_id"]: r["score"]
         for r in eng.matches(Field("title", Term("spark"))).collect()}
    b = {r["doc_id"]: r["score"]
         for r in eng.matches(Field("body", Term("shuffle"))).collect()}
    want = {d: a[d] + b[d] for d in set(a) & set(b)}
    assert set(got) == set(want) and got
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_cross_field_or_min_match_and_not(spark, mf):
    df, idx = mf
    eng = MultiFieldEngine(idx)
    a = {r["doc_id"] for r in eng.matches(Field("title", Term("spark"))).collect()}
    b = {r["doc_id"] for r in eng.matches(Field("body", Term("shuffle"))).collect()}
    got2 = {
        r["doc_id"]
        for r in eng.matches(
            Or([Field("title", Term("spark")), Field("body", Term("shuffle"))],
               min_match=2)
        ).collect()
    }
    assert got2 == (a & b)
    gotn = {
        r["doc_id"]
        for r in eng.matches(
            And([Field("title", Term("spark")),
                 Not(Field("body", Term("shuffle")))])
        ).collect()
    }
    assert gotn == (a - b)


def test_unqualified_defaults_to_first_field(spark, mf):
    df, idx = mf
    assert idx.default_field == "title"
    eng = MultiFieldEngine(idx)
    assert _by_url(idx.indexes["title"], eng.matches(Term("spark"))) == _by_url(
        idx.indexes["title"], eng.matches(Field("title", Term("spark")))
    )


def test_single_field_root_runs_native_wand(spark, mf):
    df, idx = mf
    eng = MultiFieldEngine(idx)
    q = Or([Term("spark"), Term("alpha")])
    ex = [
        (r["doc_id"], round(r["score"], 9))
        for r in eng.search(Field("body", q), k=10, mode="exhaustive").collect()
    ]
    wd = [
        (r["doc_id"], round(r["score"], 9))
        for r in eng.search(Field("body", q), k=10, mode="wand").collect()
    ]
    assert ex == wd and ex


def test_planner_passes_field_through(spark):
    n = normalize(Field("title", Or([Term("a")], min_match=1)))
    assert isinstance(n, ast.Field) and isinstance(n.child, ast.Term)
    assert isinstance(
        normalize(And([Field("t", Term("a")), ast.Empty()])), ast.Empty
    )


def test_doc_id_space_shared(spark, mf):
    df, idx = mf
    a = {r["url"]: r["doc_id"] for r in idx.indexes["title"].docs.collect()}
    b = {r["url"]: r["doc_id"] for r in idx.indexes["body"].docs.collect()}
    assert a == b and len(a) == 80


def test_save_load_delete_roundtrip(spark, mf, tmp_path):
    df, idx = mf
    p = str(tmp_path / "mfi")
    idx.save(p)
    loaded = MultiFieldIndex.load(spark, p)
    assert sorted(loaded.indexes) == ["body", "title"]
    assert loaded.default_field == "title"
    eng = MultiFieldEngine(loaded)
    before = {r["doc_id"] for r in eng.matches(Field("body", Term("shuffle"))).collect()}
    victim = sorted(before)[0]
    dropped = loaded.delete_docs(
        spark.createDataFrame([(victim,)], "doc_id long")
    )
    eng2 = MultiFieldEngine(dropped)
    after = {r["doc_id"] for r in eng2.matches(Field("body", Term("shuffle"))).collect()}
    assert after == before - {victim}
    # the mask applies to EVERY field
    aftert = {r["doc_id"] for r in eng2.matches(Field("title", Term("spark"))).collect()}
    assert victim not in aftert


def test_search_many_mixes_fields(spark, mf):
    """Batched queries may target different fields: per-query results
    must equal the individual search() results, and same-field queries
    share that field's batch path."""
    df, idx = mf
    eng = MultiFieldEngine(idx)
    queries = {
        "t_spark": Field("title", Term("spark")),
        "b_shuffle": Field("body", Term("shuffle")),
        "b_alpha": Field("body", Term("alpha")),
        "default_plain": Term("plain"),
        # cross-field boolean rides the default engine's per-query
        # subplan fallback inside the same batch
        "cross": And([Field("title", Term("spark")),
                      Field("body", Term("shuffle"))]),
    }
    batched = eng.search_many(queries, k=5)
    got = {
        name: [
            (r["doc_id"], round(r["score"], 9))
            for r in batched.filter(F.col("query") == name)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .collect()
        ]
        for name in queries
    }
    for name, q in queries.items():
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in eng.search(q, k=5).collect()
        ]
        assert got[name] == want, name


def test_sorted_multifield_composition(spark, mf):
    """sort_field forwards per field: every field index shares the
    sorted doc-id space, so cross-field queries compose AND top_docs
    serves first-k-by-sort with a cross-field filter."""
    df, idx = mf
    dfn = df.withColumn("n", F.length("body"))
    s = build_multi_field_index(
        dfn, ["title", "body"], sort_key="url", bucket_bits=8,
        extra_doc_cols=["url"], sort_field="n", sort_ascending=False,
    )
    a = {r["url"]: r["doc_id"] for r in s.indexes["title"].docs.collect()}
    b = {r["url"]: r["doc_id"] for r in s.indexes["body"].docs.collect()}
    assert a == b
    eng = MultiFieldEngine(s)
    got = [
        tuple(r)
        for r in eng.top_docs(
            k=6,
            query=And([Field("title", Term("spark")),
                       Field("body", Term("shuffle"))]),
            columns=["url", "n"],
        ).collect()
    ]
    both = (
        {r["url"] for r in eng.matches(Field("title", Term("spark")))
         .join(s.indexes["title"].docs.select("doc_id", "url"), "doc_id")
         .collect()}
        & {r["url"] for r in eng.matches(Field("body", Term("shuffle")))
           .join(s.indexes["body"].docs.select("doc_id", "url"), "doc_id")
           .collect()}
    )
    want = [
        tuple(r)
        for r in dfn.filter(F.col("url").isin(list(both)))
        .orderBy(F.desc("n"), F.asc("url")).select("url", "n")
        .limit(6).collect()
    ]
    assert got == want and got


def test_unknown_field_raises(spark, mf):
    df, idx = mf
    eng = MultiFieldEngine(idx)
    with pytest.raises(ValueError, match="no indexed field"):
        eng.matches(Field("nope", Term("x")))
    with pytest.raises(ValueError, match="no indexed field"):
        eng.matches(And([Field("title", Term("spark")), Field("nope", Term("x"))]))
