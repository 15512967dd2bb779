"""Round-4: WAND coverage for Terms leaves and boosted children
(VERDICT r3 #7 — the reference serves EVERY scored multiterm through
the wanderator's sample collector, multiterm_query.cpp:36-100).
Differential: mode="wand" must be result-identical to exhaustive for
each shape, including leaves whose expansion holds 0-weight terms
(scored_terms_limit smaller than the set)."""

import pytest
from pyspark.sql import SparkSession

from iresearch_spark.index.builder import build_index
from iresearch_spark.search import And, Or, SearchEngine, Term, Terms


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("round4-wand")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def engine(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = build_index(docs, analyzer="simple", bucket_bits=8)
    idx.cache()
    idx.postings.count()
    return SearchEngine(idx)


SHAPES = [
    Terms(["batch", "scan", "join"]),
    Terms(["batch", "scan", "join"], term_boosts={"batch": 2.0, "join": 0.5}),
    Or([Terms(["batch", "scan"]), Term("key", boost=3.0)]),
    And([Terms(["batch", "small"], term_boosts={"small": 1.7}), Term("scan")]),
    Or(
        [Term("batch", boost=2.0), Term("small", boost=0.25), Term("dup")],
        boost=1.5,
    ),
    Or([Terms(["batch", "key"]), Terms(["scan", "join"])], min_match=2),
]


@pytest.mark.parametrize("shape", SHAPES, ids=lambda s: type(s).__name__ + str(SHAPES.index(s) if s in SHAPES else ""))
def test_wand_equals_exhaustive(engine, shape):
    exh = [
        (r["doc_id"], round(r["score"], 9))
        for r in engine.search(shape, k=10).collect()
    ]
    wnd = [
        (r["doc_id"], round(r["score"], 9))
        for r in engine.search(shape, k=10, mode="wand").collect()
    ]
    assert exh and exh == wnd


def test_wand_with_zero_weight_terms(engine):
    """scored_terms_limit below the set size leaves 0-weight (matched
    but unscored) terms — pruning their blocks is sound because such a
    doc's score is bounded by the other terms' rest mass."""
    limited = SearchEngine(engine.index, scored_terms_limit=2)
    shape = Terms(["batch", "small", "scan", "join"])
    exh = [
        (r["doc_id"], round(r["score"], 9))
        for r in limited.search(shape, k=10).collect()
    ]
    wnd = [
        (r["doc_id"], round(r["score"], 9))
        for r in limited.search(shape, k=10, mode="wand").collect()
    ]
    assert exh and exh == wnd


def test_wand_pruning_engages(spark):
    """On a corpus with real block-max spread (one hot doc, many weak
    postings in other blocks), forced WAND must actually DROP blocks —
    and stay result-identical. (The synthetic bench corpora have almost
    no prunable spread; this pins the machinery itself.)"""
    rows = []
    # doc 0: 'zzkey' 60 times in a short doc -> huge tf, low dl
    rows.append((0, "zzkey " * 60))
    # 2000 docs: one 'zzkey' buried in 120 filler tokens -> low tf,
    # high dl -> low block bounds (many 128-doc blocks)
    for i in range(1, 2001):
        rows.append((i, "zzkey " + " ".join(f"f{i}x{j}" for j in range(120))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs, analyzer="simple", bucket_bits=8)
    idx.cache()
    idx.postings.count()
    eng = SearchEngine(idx)
    eng.collect_wand_stats = True
    exh = [
        (r["doc_id"], round(r["score"], 9))
        for r in eng.search(Term("zzkey"), k=1).collect()
    ]
    wnd = [
        (r["doc_id"], round(r["score"], 9))
        for r in eng.search(Term("zzkey"), k=1, mode="wand").collect()
    ]
    assert exh == wnd
    stats = eng.last_wand_stats
    assert stats is not None
    assert stats["blocks_total"] > 4
    assert stats["blocks_kept"] < stats["blocks_total"]
    assert stats["theta"] > 0


def test_wand_shape_detection(engine):
    """Ineligible shapes fall back to exhaustive (no error, same
    results): non-sum merge, duplicate terms across children."""
    for shape in (
        Or([Term("batch"), Term("small")], merge_type="max"),
        Or([Terms(["batch", "scan"]), Term("batch")]),  # dup across kids
    ):
        exh = [
            (r["doc_id"], round(r["score"], 9))
            for r in engine.search(shape, k=10).collect()
        ]
        wnd = [
            (r["doc_id"], round(r["score"], 9))
            for r in engine.search(shape, k=10, mode="wand").collect()
        ]
        assert exh == wnd
