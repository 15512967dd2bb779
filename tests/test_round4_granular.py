"""Granular numeric terms + GranularRange (reference typed numeric
token streams, token_streams.hpp:118-230, and by_granular_range,
granular_range_filter.cpp) — trie decomposition properties, end-to-end
differentials against plain predicates, persistence, merge, deletes,
and file pruning of the saved (field, shift, prefix)-sorted layout.
"""

import math
import os
import random

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from iresearch_spark.index.builder import build_index
from iresearch_spark.index.merge import merge_indexes, purge_deleted
from iresearch_spark.index.model import InvertedIndex
from iresearch_spark.index.numeric import (
    LONG_MAX,
    LONG_MIN,
    sortable_py,
    split_range,
)
from iresearch_spark.search import (
    And,
    GranularRange,
    Not,
    NumericRange,
    Or,
    SearchEngine,
    Term,
)

U64 = 1 << 64


# ---------------------------------------------------------------- unit


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=U64 - 1),
    st.integers(min_value=0, max_value=U64 - 1),
    st.sampled_from([1, 4, 8, 16, 32, 64]),
    st.data(),
)
def test_split_range_properties(a, b, step, data):
    """The trie decomposition (Schindler & Diepenbroek 2008) must
    cover [lo, hi] exactly with pairwise-disjoint intervals, each
    matched value matching exactly ONE level, and at most
    2*(64/step)+1 pieces."""
    lo, hi = min(a, b), max(a, b)
    pieces = split_range(lo, hi, step)
    assert len(pieces) <= 2 * math.ceil(64 / step) + 1
    # value-space union: (shift, a, b) covers [a, b + 2^shift - 1]
    ivals = sorted((p_lo, p_hi + (1 << s) - 1) for (s, p_lo, p_hi) in pieces)
    cur = lo
    for x, y in ivals:
        assert x == cur and y >= x
        cur = y + 1
    assert cur == hi + 1
    # matching semantics against sampled values incl. the bound edges
    vals = {lo, hi, max(lo - 1, 0), min(hi + 1, U64 - 1)}
    vals |= {
        data.draw(st.integers(min_value=0, max_value=U64 - 1))
        for _ in range(5)
    }
    for v in vals:
        hits = 0
        for shift, p_lo, p_hi in pieces:
            keep = ((-(1 << shift)) % U64) if shift else (U64 - 1)
            if (p_lo & keep) <= (v & keep) <= (p_hi & keep):
                hits += 1
        assert hits == (1 if lo <= v <= hi else 0)


def test_sortable_double_monotone():
    xs = [
        float("-inf"), -1e308, -123.456, -1.0, -1e-300, -0.0, 0.0,
        1e-300, 0.5, 2.0, 7e77, 1e308, float("inf"),
    ]
    ks = [sortable_py(x, "double") for x in xs]
    assert all(k0 <= k1 for k0, k1 in zip(ks, ks[1:]))
    # -0.0 and 0.0 share one key (SQL equality semantics)
    assert sortable_py(-0.0, "double") == sortable_py(0.0, "double") == 0
    # +1 on the key is nextafter: strictly-greater test stays exact
    assert sortable_py(math.nextafter(2.0, 3.0), "double") == (
        sortable_py(2.0, "double") + 1
    )
    assert sortable_py(LONG_MIN, "long") == LONG_MIN
    assert sortable_py(LONG_MAX, "long") == LONG_MAX


# ---------------------------------------------------------- end-to-end


@pytest.fixture(scope="module")
def corpus(spark):
    random.seed(41)
    rows = []
    for i in range(800):
        rows.append(
            (
                i,
                "alpha beta gamma " + ("delta " * (i % 3)),
                random.randint(-(10**12), 10**12)
                if i % 7
                else random.choice([LONG_MIN, LONG_MAX, 0, -1, 1]),
                None if i % 11 == 0 else random.uniform(-1e6, 1e6),
            )
        )
    return spark.createDataFrame(
        rows, "doc_id long, text string, n long, x double"
    )


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


@pytest.mark.parametrize("step", [64, 16])
def test_granular_matches_predicate(spark, corpus, step):
    """GranularRange over the numeric dictionary ≡ the plain stored-
    column predicate, across bound shapes (inclusive/exclusive/open/
    extreme), both dtypes, both precision steps."""
    idx = build_index(
        corpus, analyzer="simple", numeric_fields=["n", "x"],
        precision_step=step,
    )
    eng = SearchEngine(idx)
    cases = [
        ("n", -(10**11), 5 * 10**11, True, True),
        ("n", -(10**11), 5 * 10**11, False, False),
        ("n", None, 0, True, True),
        ("n", 0, None, False, True),
        ("n", LONG_MIN, LONG_MAX, True, True),
        ("n", 7, 7, True, True),
        ("n", 7, 7, True, False),  # empty after adjustment
        ("x", -250000.5, 333333.25, True, True),
        ("x", -250000.5, 333333.25, False, False),
        ("x", None, -1.5, True, False),
        ("x", 0.0, None, False, True),
    ]
    for col, lo, hi, inc_lo, inc_hi in cases:
        got = _ids(
            eng.matches(
                GranularRange(col, lo, hi, include_min=inc_lo,
                              include_max=inc_hi)
            )
        )
        c = F.col(col)
        pred = c.isNotNull()
        if lo is not None:
            pred = pred & ((c >= lo) if inc_lo else (c > lo))
        if hi is not None:
            pred = pred & ((c <= hi) if inc_hi else (c < hi))
        want = _ids(corpus.filter(pred))
        assert got == want, (col, lo, hi, inc_lo, inc_hi, step)
    # constant score = boost (kNoBoost-style constant collection)
    scores = {
        r["score"]
        for r in eng.matches(GranularRange("n", 0, None, boost=2.5)).collect()
    }
    assert scores == {2.5}
    idx.unpersist()


def test_granular_composes_and_falls_back(spark, corpus):
    """Inside booleans; ≡ NumericRange; stored-column fallback when the
    index lacks the dictionary; error when neither exists."""
    idx = build_index(
        corpus, analyzer="simple", numeric_fields=["n"],
        extra_doc_cols=["x"],
    )
    eng = SearchEngine(idx)
    node = And([Term("alpha"), GranularRange("n", 0, None)])
    want = And([Term("alpha"), NumericRange("n", 0, None)])
    got_df = eng.search(node, k=20).collect()
    want_df = eng.search(want, k=20).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got_df] == [
        (r["doc_id"], round(r["score"], 9)) for r in want_df
    ]
    # Not-wrapped under Or
    got = _ids(eng.matches(Or([Term("delta"), Not(GranularRange("n", None, 0))])))
    want_ids = _ids(eng.matches(Or([Term("delta"), Not(NumericRange("n", None, 0))])))
    assert got == want_ids
    # x is stored but NOT in the numeric dictionary -> silent fallback
    assert _ids(eng.matches(GranularRange("x", 0.0, None))) == _ids(
        eng.matches(NumericRange("x", 0.0, None))
    )
    # unknown column -> clear error
    with pytest.raises(ValueError, match="numeric"):
        eng.matches(GranularRange("nope", 0, 1)).collect()
    idx.unpersist()


def test_granular_save_load_prune(spark, corpus, tmp_path):
    """Survives save/load; the saved layout actually prunes: a narrow
    range reads fewer num_terms files/row-groups than the full scan
    (asserted on the pushed predicate reaching the parquet source)."""
    idx = build_index(corpus, analyzer="simple", numeric_fields=["n"])
    p = str(tmp_path / "gidx")
    idx.save(p)
    idx.unpersist()
    loaded = InvertedIndex.load(spark, p)
    assert loaded.numeric_meta == {"n": "long"}
    assert loaded.precision_step == 64
    eng = SearchEngine(loaded)
    got = _ids(eng.matches(GranularRange("n", 0, 10**11)))
    want = _ids(corpus.filter("n >= 0 and n <= 100000000000"))
    assert got == want
    # the BETWEEN reaches the scan as a pushed filter
    plan = (
        eng.matches(GranularRange("n", 0, 10**11))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan and "prefix" in plan
    # num_terms dir exists and is sorted-by-prefix (file stats disjoint)
    d = os.path.join(p, "num_terms")
    assert os.path.isdir(d)


def test_granular_merge_delete_purge(spark, corpus):
    half1 = corpus.filter("doc_id < 400")
    half2 = corpus.filter("doc_id >= 400")
    a = build_index(half1, analyzer="simple", numeric_fields=["n"])
    b = build_index(half2, analyzer="simple", numeric_fields=["n"])
    m = merge_indexes(a, b)
    eng = SearchEngine(m)
    want = _ids(corpus.filter("n >= 0"))
    assert _ids(eng.matches(GranularRange("n", 0, None))) == want
    # delete mask applies at read; purge drops dictionary rows too
    victims = corpus.filter("n >= 0 and doc_id % 2 = 0").select("doc_id")
    md = m.delete_docs(victims)
    got = _ids(SearchEngine(md).matches(GranularRange("n", 0, None)))
    want_masked = _ids(
        corpus.filter("n >= 0").join(victims, "doc_id", "left_anti")
    )
    assert got == want_masked
    purged = purge_deleted(md)
    assert purged.num_terms is not None
    assert _ids(
        SearchEngine(purged).matches(GranularRange("n", 0, None))
    ) == want_masked
    # mismatched steps degrade the merged dictionary to fallback
    c = build_index(half2, analyzer="simple", numeric_fields=["n"],
                    precision_step=16)
    m2 = merge_indexes(a, c)
    assert m2.num_terms is None  # falls back to the stored column
    assert _ids(SearchEngine(m2).matches(GranularRange("n", 0, None))) == want
    for i in (a, b, c):
        i.unpersist()


def test_granular_timestamp_and_date(spark):
    """Timestamp/date fields key as epoch micros/days; bounds accept
    datetime/date/ISO-string/raw ints; exclusive = one key step."""
    from datetime import date, datetime

    rows = [
        (
            i,
            "alpha beta",
            datetime(2024, 1, 1 + i % 28, i % 24, i % 60, i % 60,
                     (i * 137) % 1_000_000),
            date(2023, 1 + i % 12, 1 + i % 28),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp, d date"
    )
    idx = build_index(
        df, analyzer="simple", numeric_fields=["ts", "d"],
        precision_step=16,
    )
    eng = SearchEngine(idx)
    lo, hi = datetime(2024, 1, 8), datetime(2024, 1, 15)
    got = _ids(eng.matches(GranularRange("ts", lo, hi, include_max=False)))
    want = _ids(
        df.filter(
            (F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))
        )
    )
    assert got == want and got
    # ISO-string bounds hit the same keys
    assert got == _ids(
        eng.matches(
            GranularRange("ts", "2024-01-08", "2024-01-15",
                          include_max=False)
        )
    )
    # exclusive timestamp bound = +1 microsecond
    edge = datetime(2024, 1, 8, 0, 0, 0, 0)
    with_edge = _ids(eng.matches(GranularRange("ts", edge, hi)))
    without = _ids(
        eng.matches(GranularRange("ts", edge, hi, include_min=False))
    )
    edge_ids = _ids(df.filter(F.col("ts") == F.lit(edge)))
    assert sorted(set(with_edge) - set(without)) == edge_ids
    # dates
    got = _ids(eng.matches(GranularRange("d", date(2023, 3, 1), "2023-06-30")))
    want = _ids(
        df.filter(
            (F.col("d") >= F.lit(date(2023, 3, 1)))
            & (F.col("d") <= F.lit(date(2023, 6, 30)))
        )
    )
    assert got == want and got
    idx.unpersist()


def test_granular_incremental_multisegment(spark, tmp_path):
    """Streaming segments carry per-segment numeric dictionaries; the
    merged multi-segment view unions them (doc ids disjoint) and
    GranularRange over it matches the predicate over all batches."""
    from iresearch_spark.streaming.incremental import IncrementalIndexer

    ix = IncrementalIndexer(
        index_dir=str(tmp_path / "ixnum"), bucket_bits=7,
        numeric_fields=["price"],
    )
    b1 = spark.createDataFrame(
        [(f"u{i:03d}", "alpha beta", float(i * 7 - 100)) for i in range(50)],
        "url string, text string, price double",
    )
    b2 = spark.createDataFrame(
        [(f"v{i:03d}", "alpha gamma", float(i * 11 - 150)) for i in range(40)],
        "url string, text string, price double",
    )
    ix.process_batch(b1, epoch_id=0)
    ix.process_batch(b2, epoch_id=1)
    merged = ix.read(spark)
    assert merged.num_terms is not None
    assert merged.numeric_meta == {"price": "double"}
    eng = SearchEngine(merged)
    got = len(_ids(eng.matches(GranularRange("price", 0.0, 150.0))))
    want = b1.filter("price >= 0 and price <= 150").count() + b2.filter(
        "price >= 0 and price <= 150"
    ).count()
    assert got == want
