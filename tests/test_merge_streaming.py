"""Segment merge + incremental indexing tests (reference
merge_writer_tests.cpp / index_writer two-phase-commit semantics)."""

import math

import pytest
from pyspark.sql import functions as F

from iresearch_spark.index.builder import build_index
from iresearch_spark.index.merge import build_metrics, consolidate, merge_indexes
from iresearch_spark.search import Or, SearchEngine, Term
from iresearch_spark.streaming.incremental import IncrementalIndexer

ROWS_A = [(i, f"alpha beta doc{i % 3} gamma") for i in range(0, 150)]
ROWS_B = [(i, f"alpha delta doc{i % 3} zeta") for i in range(150, 300)]


def _decoded_set(idx):
    return sorted(
        (r["term"], r["doc_id"], r["freq"], r["dl"])
        for r in idx.decoded_postings().collect()
    )


def test_merge_equals_monolithic(spark):
    df_a = spark.createDataFrame(ROWS_A, "doc_id long, text string")
    df_b = spark.createDataFrame(ROWS_B, "doc_id long, text string")
    df_all = spark.createDataFrame(ROWS_A + ROWS_B, "doc_id long, text string")
    merged = merge_indexes(
        build_index(df_a, analyzer="simple", bucket_bits=7),
        build_index(df_b, analyzer="simple", bucket_bits=7),
    )
    mono = build_index(df_all, analyzer="simple", bucket_bits=7)
    assert _decoded_set(merged) == _decoded_set(mono)
    assert merged.field_stats.n_docs == mono.field_stats.n_docs
    assert merged.field_stats.total_term_freq == mono.field_stats.total_term_freq
    ts_m = {r["term"]: (r["df"], r["cf"]) for r in merged.term_stats.collect()}
    ts_o = {r["term"]: (r["df"], r["cf"]) for r in mono.term_stats.collect()}
    assert ts_m == ts_o


def test_consolidate_preserves_content_and_fills_blocks(spark):
    df_a = spark.createDataFrame(ROWS_A, "doc_id long, text string")
    df_b = spark.createDataFrame(ROWS_B, "doc_id long, text string")
    merged = merge_indexes(
        build_index(df_a, analyzer="simple", bucket_bits=7),
        build_index(df_b, analyzer="simple", bucket_bits=7),
    )
    before = merged.postings.count()
    cons = consolidate(merged, bucket_bits=16)
    assert _decoded_set(cons) == _decoded_set(merged)
    after = cons.postings.count()
    assert after < before  # underfull bucket-edge blocks got re-packed
    # canonical block ordering restored
    import collections

    by_term = collections.defaultdict(list)
    for b in cons.postings.collect():
        by_term[b["term"]].append(b)
    for t, bs in by_term.items():
        bs.sort(key=lambda b: b["block_id"])
        for x, y in zip(bs, bs[1:]):
            assert x["last_doc"] < y["first_doc"]


def test_merged_index_searches_identically(spark):
    df_a = spark.createDataFrame(ROWS_A, "doc_id long, text string")
    df_b = spark.createDataFrame(ROWS_B, "doc_id long, text string")
    df_all = spark.createDataFrame(ROWS_A + ROWS_B, "doc_id long, text string")
    merged = merge_indexes(
        build_index(df_a, analyzer="simple", bucket_bits=7),
        build_index(df_b, analyzer="simple", bucket_bits=7),
    )
    mono = build_index(df_all, analyzer="simple", bucket_bits=7)
    q = Or([Term("beta"), Term("delta")])
    a = [(r["doc_id"], round(r["score"], 9))
         for r in SearchEngine(merged).search(q, k=20).collect()]
    b = [(r["doc_id"], round(r["score"], 9))
         for r in SearchEngine(mono).search(q, k=20).collect()]
    assert a == b


def test_build_metrics(spark):
    df_all = spark.createDataFrame(ROWS_A + ROWS_B, "doc_id long, text string")
    idx = build_index(df_all, analyzer="simple", bucket_bits=7)
    m = {r["bucket"]: r for r in build_metrics(idx, bucket_bits=7).collect()}
    assert sum(r["n_postings"] for r in m.values()) == sum(
        1 for _ in idx.decoded_postings().collect()
    )
    for b, r in m.items():
        assert r["min_doc"] >= b * 128
        assert r["max_doc"] < (b + 1) * 128


def test_incremental_indexer_batches_and_idempotency(spark, tmp_path):
    docs1 = spark.createDataFrame(
        [(f"u{i:04d}", f"alpha beta doc{i % 3}") for i in range(40)],
        "url string, text string",
    )
    docs2 = spark.createDataFrame(
        [(f"v{i:04d}", f"alpha gamma doc{i % 3}") for i in range(30)],
        "url string, text string",
    )
    ix = IncrementalIndexer(index_dir=str(tmp_path / "ix"), bucket_bits=7)
    ix.process_batch(docs1, epoch_id=0)
    ix.process_batch(docs2, epoch_id=1)
    ix.process_batch(docs2, epoch_id=1)  # checkpoint replay -> no-op
    manifest = ix._read_manifest()
    assert [s["id"] for s in manifest["segments"]] == ["seg_0", "seg_1"]
    assert manifest["next_doc_id"] == 70
    idx = ix.read(spark)
    assert idx.field_stats.n_docs == 70
    eng = SearchEngine(idx)
    hits = eng.matches(Term("gamma")).count()
    assert hits == 30
    both = eng.matches(Term("alpha")).count()
    assert both == 70


def test_incremental_via_structured_streaming(spark, tmp_path):
    """Real readStream -> foreachBatch -> segment commit, availableNow."""
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(f"u{i:04d}", f"alpha beta doc{i % 3}") for i in range(25)],
        "url string, text string",
    ).coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema("url string, text string").parquet(str(src))
    ix = IncrementalIndexer(index_dir=str(tmp_path / "ix2"), bucket_bits=7)
    q = ix.start(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    idx = ix.read(spark)
    assert idx is not None and idx.field_stats.n_docs == 25
    assert SearchEngine(idx).matches(Term("alpha")).count() == 25


def test_multi_segment_read_constant_plan_size(spark, tmp_path):
    """20 segments -> still ONE parquet relation per table (the r1
    pairwise-merge loop produced one scan per segment, a plan that grew
    without bound under daily micro-batches)."""
    ix = IncrementalIndexer(index_dir=str(tmp_path / "ix20"), bucket_bits=7)
    for e in range(20):
        docs = spark.createDataFrame(
            [(f"u{e:02d}{i:03d}", f"alpha tok{e} doc{i % 3}") for i in range(10)],
            "url string, text string",
        )
        ix.process_batch(docs, epoch_id=e)
    idx = ix.read(spark)
    assert idx.field_stats.n_docs == 200
    plan = idx.postings._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation") == 1, plan
    eng = SearchEngine(idx)
    assert eng.matches(Term("alpha")).count() == 200
    assert eng.matches(Term("tok7")).count() == 10
    # per-segment term pruned + scored correctly against a monolithic build
    mono_rows = [
        (e * 10 + i, f"alpha tok{e} doc{i % 3}")
        for e in range(20)
        for i in range(10)
    ]
    # doc ids differ (hash-bucket order within segments) — compare the
    # score MULTISET, which is id-assignment invariant
    mono = build_index(
        spark.createDataFrame(mono_rows, "doc_id long, text string"),
        analyzer="simple",
        bucket_bits=7,
    )
    import collections

    def score_bag(ix_, term):
        return collections.Counter(
            round(r["score"], 9)
            for r in SearchEngine(ix_).matches(Term(term)).collect()
        )

    for t in ("alpha", "tok3", "doc1"):
        assert score_bag(idx, t) == score_bag(mono, t)


def test_multi_segment_read_keeps_bucket_pruning(spark, tmp_path):
    """Round-3: the flat multi-root read must NOT lose the term-bucket
    seek analogue — _tbd rides inside the data files, is renamed to
    _tb, and exact-term queries push an In(_tbd, ...) predicate into
    the parquet scan (each file is a single bucket, so its min/max
    stats skip the whole file)."""
    import zlib

    ix = IncrementalIndexer(index_dir=str(tmp_path / "ixtb"), bucket_bits=7)
    for e in range(3):
        docs = spark.createDataFrame(
            [(f"u{e:02d}{i:03d}", f"alpha tok{e} doc{i % 3}") for i in range(30)],
            "url string, text string",
        )
        ix.process_batch(docs, epoch_id=e)
    idx = ix.read(spark)
    assert idx.term_buckets, "multi-segment view lost term_buckets"
    counts = (
        [idx.term_buckets]
        if isinstance(idx.term_buckets, int)
        else idx.term_buckets
    )
    pruned = idx.postings_for_terms(["tok1"])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "_tbd" in plan or "_tb" in plan, plan
    assert "PushedFilters" in plan
    # the pushed bucket set must contain tok1's bucket for every count
    for b in counts:
        assert str(zlib.crc32(b"tok1") % b) in plan, (b, plan)
    # and the pruned scan still returns exactly tok1's postings
    eng = SearchEngine(idx)
    assert eng.matches(Term("tok1")).count() == 30
