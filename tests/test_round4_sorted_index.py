"""Sorted index — the reference's Comparer (core/index/comparer.hpp;
index_writer.hpp:159 `comparator`, segment_writer lays documents out in
comparator order and merge_writer remaps ids through a comparator-aware
doc map, merge_writer.cpp:266-329).

Spark-first re-expression: `build_index(sort_field=..., sort_ascending=)`
assigns doc ids in (sort_field, sort_key) order via an order-preserving
quantized bucket layout (builder._sorted_bucket_layout) — same
deterministic two-pass shape as the hash layout, so ids stay
partitioning-independent — making index order == sort order.
`SearchEngine.top_docs(k, query=...)` is then the early-termination
"first k in sort order" shape (TakeOrderedAndProject: per-partition
top-k heaps, never a full sort)."""

import pytest
from pyspark.sql import functions as F

from iresearch_spark.index.builder import build_index
from iresearch_spark.index.merge import consolidate, merge_indexes, purge_deleted
from iresearch_spark.index.model import InvertedIndex
from iresearch_spark.search import SearchEngine, Term


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        # (url, n, tag) — n has ties; unicode tags exercise the string
        # surrogate (BMP chars, multi-byte UTF-8)
        (f"https://site{i:03d}.example/p", (i * 37) % 19, f"t{chr(0x00E0 + i % 7)}{i % 5}")
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "url string, n long, tag string")
    return df.withColumn(
        "text", F.concat(F.lit("alpha beta gamma "), F.col("tag"))
    ).select("url", "n", "tag", "text")


def _order(df, col, ascending, keycol="url"):
    c = F.asc(col) if ascending else F.desc(col)
    return [tuple(r) for r in df.orderBy(c, F.asc(keycol)).select(keycol, col).collect()]


@pytest.mark.parametrize("ascending", [True, False])
def test_numeric_sort_order(spark, pages, ascending):
    idx = build_index(
        pages, analyzer="simple", id_col=None, sort_key="url",
        sort_field="n", sort_ascending=ascending, bucket_bits=8,
        extra_doc_cols=["url"],
    )
    got = [
        tuple(r)
        for r in idx.docs.orderBy("doc_id").select("url", "n").collect()
    ]
    assert got == _order(pages, "n", ascending)
    # index metadata records the sort
    assert idx.sort_field == "n" and idx.sort_ascending is ascending


def test_string_sort_order_unicode(spark, pages):
    idx = build_index(
        pages, analyzer="simple", id_col=None, sort_key="url",
        sort_field="tag", bucket_bits=8, extra_doc_cols=["url"],
    )
    got = [
        tuple(r)
        for r in idx.docs.orderBy("doc_id").select("url", "tag").collect()
    ]
    assert got == _order(pages, "tag", True)


def test_sorted_ids_partitioning_independent(spark, pages):
    """SURVEY §7.0 determinism: the quantized layout is a pure function
    of the data — ids identical at any input partitioning."""
    a = build_index(
        pages.repartition(13), analyzer="simple", id_col=None,
        sort_key="url", sort_field="n", sort_ascending=False, bucket_bits=8,
        extra_doc_cols=["url"],
    )
    b = build_index(
        pages.coalesce(1), analyzer="simple", id_col=None,
        sort_key="url", sort_field="n", sort_ascending=False, bucket_bits=8,
        extra_doc_cols=["url"],
    )
    ga = sorted(tuple(r) for r in a.docs.select("doc_id", "url").collect())
    gb = sorted(tuple(r) for r in b.docs.select("doc_id", "url").collect())
    assert ga == gb


def test_scores_unaffected_by_sort(spark, pages):
    """BM25 depends on (tf, dl, df, N) only — a sorted layout must not
    change any score (rank identity vs the hash-ordered index)."""
    srt = build_index(
        pages, analyzer="simple", id_col=None, sort_key="url",
        sort_field="n", bucket_bits=8, extra_doc_cols=["url"],
    )
    base = build_index(
        pages, analyzer="simple", id_col=None, sort_key="url",
        bucket_bits=8, extra_doc_cols=["url"],
    )

    def by_url(ix):
        m = SearchEngine(ix).matches(Term("alpha"))
        return sorted(
            (r["url"], round(r["score"], 9))
            for r in m.join(ix.docs.select("doc_id", "url"), "doc_id").collect()
        )

    assert by_url(srt) == by_url(base)


def test_top_docs_early_termination_and_filter(spark, pages):
    idx = build_index(
        pages, analyzer="simple", id_col=None, sort_key="url",
        sort_field="n", sort_ascending=False, bucket_bits=8,
        extra_doc_cols=["url"],
    )
    eng = SearchEngine(idx)
    got = [
        tuple(r) for r in eng.top_docs(k=7, columns=["url", "n"]).collect()
    ]
    assert got == _order(pages, "n", False)[:7]
    # filtered: first k BY SORT ORDER among matches of a query
    got_f = [
        tuple(r)
        for r in eng.top_docs(
            k=5, query=Term("alpha"), columns=["url", "n"]
        ).collect()
    ]
    # every page contains 'alpha' in this fixture -> same head
    assert got_f == _order(pages, "n", False)[:5]
    # the plan is a TakeOrderedAndProject (no full sort stage)
    plan = eng.top_docs(k=7)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_sorted_save_load_merge_purge(spark, pages, tmp_path):
    idx = build_index(
        pages, analyzer="simple", id_col=None, sort_key="url",
        sort_field="n", sort_ascending=False, bucket_bits=8,
        extra_doc_cols=["url"],
    )
    p = str(tmp_path / "ix")
    idx.save(p)
    loaded = InvertedIndex.load(spark, p)
    assert loaded.sort_field == "n" and loaded.sort_ascending is False
    got = [
        tuple(r)
        for r in loaded.docs.orderBy("doc_id").select("url", "n").collect()
    ]
    assert got == _order(pages, "n", False)

    # consolidation re-blocks in place: order survives
    cons = consolidate(loaded, bucket_bits=8)
    assert cons.sort_field == "n" and cons.sort_ascending is False

    # deletes keep relative order of survivors
    loaded = loaded.delete_docs(
        loaded.docs.filter(F.col("n") >= 15).select("doc_id")
    )
    purged = purge_deleted(loaded, bucket_bits=8)
    assert purged.sort_field == "n"
    surv = [
        tuple(r)
        for r in purged.docs.orderBy("doc_id").select("url", "n").collect()
    ]
    want = _order(pages.filter(F.col("n") < 15), "n", False)
    assert surv == want

    # a disjoint-id merge is NOT globally ordered: property drops
    other = build_index(
        pages.limit(10), analyzer="simple", id_col=None, sort_key="url",
        sort_field="n", sort_ascending=False, bucket_bits=8,
        id_base=1_000_000, extra_doc_cols=["url"],
    )
    merged = merge_indexes(purged, other)
    assert merged.sort_field is None


def test_top_docs_file_pruning_on_saved_index(spark, pages, tmp_path):
    """A saved sorted index stores per-file doc-id ranges: top_docs(k)
    must read only the head files covering k rows (in-order iteration
    stopping at k), and return exactly the unpruned result."""
    idx = build_index(
        pages, analyzer="simple", id_col=None, sort_key="url",
        sort_field="n", sort_ascending=False, bucket_bits=8,
        extra_doc_cols=["url"],
    )
    p = str(tmp_path / "ixp")
    idx.save(p)
    loaded = InvertedIndex.load(spark, p)
    assert loaded.docs_ranges and len(loaded.docs_ranges) >= 2
    # ranges are disjoint, sorted, and cover every doc
    ends = [(mn, mx) for _, mn, mx, _ in loaded.docs_ranges]
    assert all(a[1] < b[0] for a, b in zip(ends, ends[1:]))
    assert sum(n for *_, n in loaded.docs_ranges) == 120
    eng = SearchEngine(loaded)
    out = eng.top_docs(k=5, columns=["url", "n"])
    assert [tuple(r) for r in out.collect()] == _order(pages, "n", False)[:5]
    assert len(out.inputFiles()) < len(loaded.docs_ranges)


def test_double_sort_field_with_negatives(spark):
    """Doubles ride the IEEE sortable transform (index/numeric.py) in
    the layout quantizer: negatives, zeros and wide magnitudes must
    order exactly; the -0.0/0.0 tie resolves by key like SQL."""
    vals = [-1e12, -3.5, -0.0, 0.0, 1e-9, 2.25, 7.0, 9e11]
    rows = [
        (f"k{i:03d}", float(vals[i % len(vals)]), "alpha beta")
        for i in range(64)
    ]
    df = spark.createDataFrame(rows, "url string, x double, text string")
    idx = build_index(
        df, analyzer="simple", id_col=None, sort_key="url",
        sort_field="x", bucket_bits=8, extra_doc_cols=["url"],
    )
    got = [
        tuple(r)
        for r in idx.docs.orderBy("doc_id").select("url", "x").collect()
    ]
    assert got == _order(df, "x", True)


def test_sorted_layout_skew_resistant(spark):
    """A dominant cluster 9 orders of magnitude narrower than the value
    span must still spread across segments (the hot-cell refinement
    pass), not collapse into one giant segment — the 100 TB skew bound.
    Order stays exact end-to-end."""
    rows = [
        (f"k{i:05d}", int(i % 97) if i % 20 else 10**12, "alpha beta")
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "url string, n long, text string")
    from iresearch_spark.index.builder import _sorted_bucket_layout

    offsets, seg_of, bkt, order = _sorted_bucket_layout(
        df, "n", "url", 1024, 128
    )
    cnts = {
        r["b"]: r["cnt"]
        for r in df.select(bkt.alias("b")).groupBy("b")
        .agg(F.count("*").alias("cnt")).collect()
    }
    per_seg: dict = {}
    for b, c in cnts.items():
        per_seg[seg_of[b]] = per_seg.get(seg_of[b], 0) + c
    # the 1900-row cluster spans many buckets (97 distinct values after
    # refinement), so no segment exceeds target + one bucket's ties
    assert len(per_seg) >= 10
    assert max(per_seg.values()) <= 128 + max(cnts.values())
    # end-to-end order identical to the oracle sort
    idx = build_index(
        df, analyzer="simple", id_col=None, sort_key="url",
        sort_field="n", bucket_bits=8, extra_doc_cols=["url"],
    )
    got = [
        tuple(r)
        for r in idx.docs.orderBy("doc_id").select("url", "n").collect()
    ]
    assert got == _order(df, "n", True)


_DISTRIBUTIONS = {
    "all_equal": lambda i: 7,
    "two_point_outlier": lambda i: 0 if i % 50 else -(2**62),
    "dense_plus_spread": lambda i: (i % 13) if i % 3 else i * 10**9,
    "alternating_sign": lambda i: (-1) ** i * (i**3),
    "full_int64_range": lambda i: (-(2**63) + 1) if i == 0 else (
        2**63 - 1 if i == 1 else i * 7919
    ),
}


@pytest.mark.parametrize("name", sorted(_DISTRIBUTIONS))
@pytest.mark.parametrize("ascending", [True, False])
def test_sorted_layout_monotone_invariant(spark, name, ascending):
    """The layout's soundness rests on ONE invariant: the bucket id is
    monotone (non-strict) in the sort value, at any refinement depth,
    in either direction — checked here against adversarial value
    distributions (ties, extreme outliers, full int64 span)."""
    gen = _DISTRIBUTIONS[name]
    rows = [(f"k{i:04d}", int(gen(i)), "alpha") for i in range(300)]
    df = spark.createDataFrame(rows, "url string, n long, text string")
    from iresearch_spark.index.builder import _sorted_bucket_layout

    offsets, seg_of, bkt, order = _sorted_bucket_layout(
        df, "n", "url", 1024, 64, ascending=ascending
    )
    pairs = (
        df.select(F.col("n"), bkt.alias("b")).orderBy("n").collect()
    )
    bs = [r["b"] for r in pairs]
    if ascending:
        assert all(a <= b for a, b in zip(bs, bs[1:]))
    else:
        # descending layouts negate the id: value asc == id non-increasing
        assert all(a >= b for a, b in zip(bs, bs[1:]))
    # offsets cover every bucket once, counts sum to the corpus
    assert sorted(offsets) == sorted(set(r["b"] for r in pairs))
    assert len(seg_of) == len(offsets)


def test_null_sort_value_rejected(spark):
    df = spark.createDataFrame(
        [("a", 1, "x y"), ("b", None, "y z")], "url string, n long, text string"
    )
    with pytest.raises(ValueError, match="NULL"):
        build_index(
            df, analyzer="simple", id_col=None, sort_key="url", sort_field="n"
        )


def test_sort_field_requires_fused_path(spark, pages):
    with pytest.raises(ValueError, match="id_col"):
        build_index(
            pages.withColumn("doc_id", F.monotonically_increasing_id()),
            analyzer="simple", id_col="doc_id", sort_field="n",
        )
