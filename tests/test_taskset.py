"""Reference 18-category task set, end-to-end rank-identical against
the pure-Python oracle over the synthetic pages corpus (the reference's
benchmark-as-oracle layer, SURVEY §5(d); task categories from
`scripts/iresearch-benchmark.tasks:1-18` / FIXTURES.md §2)."""

import math

import pytest
from pyspark.sql import functions as F

from iresearch_spark.corpus import generate_pages
from iresearch_spark.index.builder import build_index
from iresearch_spark.search import (
    And,
    Fuzzy,
    Or,
    Phrase,
    Prefix,
    SearchEngine,
    Term,
    Wildcard,
)
from tests.oracle import PyIndex

N_PAGES = 1200


@pytest.fixture(scope="module")
def env(spark):
    pages = generate_pages(spark, N_PAGES, seed=42)
    rows = [
        (i, r)
        for i, r in enumerate(
            x["text"] for x in sorted(pages.collect(), key=lambda r: r["url"])
        )
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(df, analyzer="segmentation", bucket_bits=10)
    idx.cache()
    idx.postings.count()
    py = PyIndex(rows, analyzer="segmentation")
    return py, SearchEngine(idx)


def _pick_terms(py):
    """df-ranked term picks mirroring the High/Med/Low annotations."""
    ranked = sorted(py.postings, key=lambda t: (-len(py.postings[t]), t))
    high = [t for t in ranked[:6]]
    med = [t for t in ranked if 0.003 * py.n_docs < len(py.postings[t]) < 0.02 * py.n_docs]
    low = [t for t in ranked if 1 < len(py.postings[t]) <= 0.003 * py.n_docs]
    return high, med[:6], low[:6]


def _phrase_pick(py, high):
    """A bigram that actually occurs somewhere."""
    t0 = high[0]
    for doc, ps in py.postings[t0].items():
        toks_next = [
            t for t, d in py.postings.items() if doc in d and any(
                p + 1 in d[doc] for p in ps
            )
        ]
        for t1 in sorted(toks_next):
            if any(p + 1 in py.postings[t1][doc] for p in ps):
                return [t0, t1]
    return [t0, t0]


def test_18_task_set_rank_identical(env):
    py, engine = env
    high, med, low = _pick_terms(py)
    assert len(high) >= 4 and len(med) >= 2 and len(low) >= 2
    phrase_hh = _phrase_pick(py, high)
    tasks = {
        "HighTerm": Term(high[0]),
        "MedTerm": Term(med[0]),
        "LowTerm": Term(low[0]),
        "HighPhrase": Phrase(phrase_hh),
        "MedPhrase": Phrase([high[0], med[0]]),
        "LowPhrase": Phrase([high[0], low[0]]),
        "AndHighHigh": And([Term(high[0]), Term(high[1])]),
        "AndHighMed": And([Term(high[0]), Term(med[0])]),
        "AndHighLow": And([Term(high[0]), Term(low[0])]),
        "OrHighHigh": Or([Term(high[0]), Term(high[1])]),
        "OrHighMed": Or([Term(high[0]), Term(med[0])]),
        "OrHighLow": Or([Term(high[0]), Term(low[0])]),
        "Or4High": Or([Term(t) for t in high[:4]]),
        "Or6High4Med2Low": Or(
            [Term(t) for t in high[:6]]
            + [Term(t) for t in med[:4]]
            + [Term(t) for t in low[:2]]
        ),
        "MinMatch2High2Med": Or(
            [Term(high[0]), Term(high[1]), Term(med[0]), Term(med[1])],
            min_match=2,
        ),
        "Prefix3": Prefix(high[0][:3]),
        "Wildcard": Wildcard(high[0][:2] + "%"),
        "Fuzzy1": Fuzzy(high[0], distance=1),
    }
    assert len(tasks) == 18
    for name, node in tasks.items():
        want = py.topk(node, 10)
        got = [
            (r["doc_id"], r["score"])
            for r in engine.search(node, k=10).collect()
        ]
        assert [g[0] for g in got] == [w[0] for w in want], (
            f"{name}: rank mismatch {got} vs {want}"
        )
        for (gd, gs), (wd, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-9), (name, gd, gs, ws)


def test_wand_rank_identical_on_taskset(env):
    py, engine = env
    high, med, low = _pick_terms(py)
    for node in [
        Term(high[0]),
        Term(low[0]),
        Or([Term(high[0]), Term(med[0])]),
        Or([Term(t) for t in high[:4]]),
    ]:
        ex = [
            (r["doc_id"], round(r["score"], 9))
            for r in engine.search(node, k=10, mode="exhaustive").collect()
        ]
        wd = [
            (r["doc_id"], round(r["score"], 9))
            for r in engine.search(node, k=10, mode="wand").collect()
        ]
        assert ex == wd
