"""Round-4: float32 score parity (SURVEY §7.0 — the reference computes
every score in float32, core/search/scorer.hpp score_t = float) and the
legacy `Norm` BM25 variant (bm25.hpp:29-46, norm.hpp:46-70).

The parity oracle is scorers.ref_bm25_f32 — an independent scalar
transcription of bm25.cpp:198-365 (idf via double log1p then float32
cast; c0/c1 float32 products; kNorm2Tiny inverse-norm-cache path when
the segment's max dl <= 255; the stored-1/sqrt(dl) legacy inversion).
Engine scores under score_dtype="float32" must be BIT-EQUAL to it, and
float32 vs float64 rankings must agree on the task set.
"""

import collections
import math

import numpy as np
import pytest
from pyspark.sql import SparkSession

from iresearch_spark.index.builder import build_index
from iresearch_spark.search import And, Or, Phrase, SearchEngine, Term
from iresearch_spark.search.scorers import ref_bm25_f32, ref_tfidf_f32


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("round4-f32")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    yield s


ROWS = [
    (0, "alpha beta gamma alpha"),
    (1, "alpha beta beta delta epsilon zeta"),
    (2, "gamma gamma gamma alpha beta"),
    (3, "delta epsilon"),
    (4, "alpha " * 300),  # dl > 255 -> segment is NOT norm2-tiny
]
TOKS = {r[0]: r[1].split() for r in ROWS}
DLS = {d: len(t) for d, t in TOKS.items()}
TFS = {d: collections.Counter(t) for d, t in TOKS.items()}
DF = collections.Counter(t for c in TFS.values() for t in c)
N = len(ROWS)
TTF = sum(DLS.values())

TINY_ROWS = [r for r in ROWS if r[0] < 4]
TINY_N = 4
TINY_TTF = sum(DLS[d] for d in range(4))
TINY_DF = collections.Counter(
    t for d in range(4) for t in TFS[d]
)


@pytest.fixture(scope="module")
def wide_idx(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    return build_index(docs, analyzer="simple", bucket_bits=4)


@pytest.fixture(scope="module")
def tiny_idx(spark):
    docs = spark.createDataFrame(TINY_ROWS, "doc_id long, text string")
    return build_index(docs, analyzer="simple", bucket_bits=4)


@pytest.fixture(scope="module")
def legacy_idx(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    return build_index(docs, analyzer="simple", bucket_bits=4, norm="legacy")


def _scores(engine, node):
    return {r["doc_id"]: r["score"] for r in engine.matches(node).collect()}


def test_max_dl_recorded(wide_idx, tiny_idx):
    assert wide_idx.field_stats.max_dl == 300
    assert tiny_idx.field_stats.max_dl == 6


def test_f32_single_term_full_path(wide_idx):
    """dl > 255 in the segment -> the c0 - c0*c1/(c1+tf) path."""
    eng = SearchEngine(wide_idx, score_dtype="float32")
    for term in ("alpha", "beta", "gamma"):
        got = _scores(eng, Term(term))
        assert got, term
        for d, s in got.items():
            exp = ref_bm25_f32(
                TFS[d][term], DLS[d], DF[term], N, TTF, max_dl=300
            )
            assert s == exp, (term, d, s, exp)


def test_f32_single_term_tiny_path(tiny_idx):
    """All dl <= 255 -> the kNorm2Tiny inverse-cache path, which rounds
    DIFFERENTLY from the full path (c0 - c0/(1 + tf*inv_c1))."""
    eng = SearchEngine(tiny_idx, score_dtype="float32")
    for term in ("alpha", "beta"):
        got = _scores(eng, Term(term))
        for d, s in got.items():
            exp = ref_bm25_f32(
                TFS[d][term], DLS[d], TINY_DF[term], TINY_N, TINY_TTF,
                max_dl=6,
            )
            assert s == exp, (term, d, s, exp)
    # the two paths really do differ for some (tf, dl): parity is by
    # construction, not by luck of magnitude
    diffs = [
        (tf, dl)
        for tf in range(1, 30)
        for dl in range(1, 256)
        if ref_bm25_f32(tf, dl, 3, 100, 5000, max_dl=200)
        != ref_bm25_f32(tf, dl, 3, 100, 5000, max_dl=300)
    ]
    assert diffs, "tiny and full paths never diverged — test is vacuous"


def test_f32_bm_variants(tiny_idx):
    params = {"bm15": (1.2, 0.0), "bm11": (1.2, 1.0), "bm1": (0.0, 0.75)}
    for name, (k, b) in params.items():
        eng = SearchEngine(tiny_idx, scorer=name, score_dtype="float32")
        got = _scores(eng, Term("alpha"))
        for d, s in got.items():
            exp = ref_bm25_f32(
                TFS[d]["alpha"], DLS[d], TINY_DF["alpha"], TINY_N, TINY_TTF,
                k=k, b=b, max_dl=6,
            )
            assert s == exp, (name, d, s, exp)


def test_f32_boost(tiny_idx):
    eng = SearchEngine(tiny_idx, score_dtype="float32")
    got = _scores(eng, Term("alpha", boost=2.5))
    for d, s in got.items():
        exp = ref_bm25_f32(
            TFS[d]["alpha"], DLS[d], TINY_DF["alpha"], TINY_N, TINY_TTF,
            boost=2.5, max_dl=6,
        )
        assert s == exp


def test_f32_ordered_sum_or_and(tiny_idx):
    """Multi-term sums accumulate in float32 in leaf order — the fixed
    summation order the reference's disjunction applies."""
    eng = SearchEngine(tiny_idx, score_dtype="float32")
    terms = ["alpha", "beta", "gamma"]

    def expected(d):
        acc = np.float32(0.0)
        hit = 0
        for t in terms:
            if TFS[d][t]:
                hit += 1
                acc = np.float32(
                    acc
                    + np.float32(
                        ref_bm25_f32(
                            TFS[d][t], DLS[d], TINY_DF[t], TINY_N, TINY_TTF,
                            max_dl=6,
                        )
                    )
                )
        return float(acc), hit

    got = _scores(eng, Or([Term(t) for t in terms]))
    for d, s in got.items():
        exp, _ = expected(d)
        assert s == exp, (d, s, exp)
    got_and = _scores(eng, And([Term(t) for t in terms]))
    for d, s in got_and.items():
        exp, hit = expected(d)
        assert hit == 3
        assert s == exp


def test_f32_legacy_norm(legacy_idx):
    eng = SearchEngine(legacy_idx, score_dtype="float32")
    got = _scores(eng, Term("alpha"))
    for d, s in got.items():
        exp = ref_bm25_f32(
            TFS[d]["alpha"], DLS[d], DF["alpha"], N, TTF,
            norm="legacy", max_dl=300,
        )
        assert s == exp, (d, s, exp)


def test_f32_tfidf(tiny_idx, legacy_idx):
    eng = SearchEngine(tiny_idx, scorer="tfidf", score_dtype="float32")
    for d, s in _scores(eng, Term("alpha")).items():
        exp = ref_tfidf_f32(TFS[d]["alpha"], DLS[d], TINY_DF["alpha"], TINY_N)
        assert s == exp
    # legacy index -> tfidf picks up the stored 1/sqrt(dl) norms
    eng2 = SearchEngine(legacy_idx, scorer="tfidf", score_dtype="float32")
    for d, s in _scores(eng2, Term("alpha")).items():
        exp = ref_tfidf_f32(
            TFS[d]["alpha"], DLS[d], DF["alpha"], N, with_norms=True
        )
        assert s == exp


def test_f64_legacy_norm_formula(legacy_idx):
    """float64 legacy scoring matches the closed form (the DuckDB
    oracle's replay): tf = sqrt(freq), |doc| = sqrt(dl)."""
    eng = SearchEngine(legacy_idx)
    k, b = 1.2, 0.75
    avg = TTF / N
    for d, s in _scores(eng, Term("alpha")).items():
        idf = math.log(1.0 + (N - DF["alpha"] + 0.5) / (DF["alpha"] + 0.5))
        tf = math.sqrt(TFS[d]["alpha"])
        c1 = k * (1 - b) + (k * b / avg) * math.sqrt(DLS[d])
        exp = (k + 1) * idf * tf / (c1 + tf)
        assert s == pytest.approx(exp, rel=1e-12)


def test_legacy_norm_column_matches_reference_roundtrip(legacy_idx):
    """The stored docs.norm column equals the reference NormWriter value
    float32(1 / float32(sqrt_f64(dl))) (norm.cpp:36-41)."""
    for r in legacy_idx.docs.select("dl", "norm").collect():
        exp = np.float32(1.0) / np.float32(np.sqrt(np.float64(r["dl"])))
        assert r["norm"] == pytest.approx(float(np.float32(exp)), abs=0.0)


def test_f32_phrase_matches_f32_python(tiny_idx):
    """The positional path's JVM float-cast chain reproduces the same
    float32 op sequence computed in numpy."""
    eng32 = SearchEngine(tiny_idx, score_dtype="float32")
    got = _scores(eng32, Phrase(["alpha", "beta"]))
    # phrase freq per doc (adjacent positions)
    k, b = np.float32(1.2), np.float32(0.75)
    from iresearch_spark.search.scorers import f32_stats

    nc, nl = f32_stats(1.2, 0.75, TINY_N, TINY_TTF)
    for d, s in got.items():
        toks = TOKS[d]
        pf = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == "alpha" and toks[i + 1] == "beta"
        )
        assert pf > 0
        c0 = np.float32(
            sum(
                2.2 * math.log1p((TINY_N - TINY_DF[t] + 0.5) / (TINY_DF[t] + 0.5))
                for t in ("alpha", "beta")
            )
        )
        tf = np.float32(pf)
        nrm = np.float32(DLS[d])
        c1 = np.float32(nc + np.float32(nl * nrm))
        inv_c1 = np.float32(np.float32(1.0) / c1)  # tiny segment
        exp = float(
            np.float32(
                c0
                - np.float32(
                    c0 / np.float32(np.float32(1.0) + np.float32(tf * inv_c1))
                )
            )
        )
        assert s == exp, (d, s, exp)


def test_f32_vs_f64_rank_identity(wide_idx, tiny_idx):
    nodes = [
        Term("alpha"),
        Or([Term("alpha"), Term("beta")]),
        Or([Term("alpha"), Term("beta"), Term("gamma")], min_match=2),
        And([Term("alpha"), Term("beta")]),
        Phrase(["alpha", "beta"]),
    ]
    for idx in (wide_idx, tiny_idx):
        e64 = SearchEngine(idx)
        e32 = SearchEngine(idx, score_dtype="float32")
        for node in nodes:
            r64 = [
                r["doc_id"] for r in e64.search(node, k=10).collect()
            ]
            r32 = [
                r["doc_id"] for r in e32.search(node, k=10).collect()
            ]
            assert r64 == r32, node


def test_f32_wand_equals_exhaustive(tiny_idx):
    e32 = SearchEngine(tiny_idx, score_dtype="float32")
    node = Or([Term("alpha"), Term("beta"), Term("gamma")])
    exh = [(r["doc_id"], r["score"]) for r in e32.search(node, k=3).collect()]
    wnd = [
        (r["doc_id"], r["score"])
        for r in e32.search(node, k=3, mode="wand").collect()
    ]
    assert exh == wnd


def test_f32_search_many_matches_search(tiny_idx):
    e32 = SearchEngine(tiny_idx, score_dtype="float32")
    qs = {
        "a": Term("alpha"),
        "ab": Or([Term("alpha"), Term("beta")]),
    }
    batched = e32.search_many(qs, k=5).collect()
    for name, node in qs.items():
        solo = [
            (r["doc_id"], r["score"])
            for r in e32.search(node, k=5).collect()
        ]
        got = [
            (r["doc_id"], r["score"]) for r in batched if r["query"] == name
        ]
        assert solo == got
