"""Stateful streaming dedup: cross-micro-batch duplicate suppression
via applyInPandasWithState (file source, one file per micro-batch)."""

from __future__ import annotations

import os
import time

from iresearch_spark.streaming.dedup_stream import streaming_exact_dedup


def test_cross_batch_duplicates_suppressed(spark, tmp_path):
    src = tmp_path / "src"
    os.makedirs(src)
    schema = "url string, text string"
    # batch 0: A, B, and an in-batch duplicate of A (higher url)
    spark.createDataFrame(
        [
            ("u0", "alpha content one"),
            ("u1", "beta content two"),
            ("u9", "ALPHA   content one"),  # dup of u0 after normalize
        ],
        schema,
    ).coalesce(1).write.parquet(str(src / "f0.parquet"))
    # batch 1: a cross-batch duplicate of B plus a new doc C
    spark.createDataFrame(
        [
            ("u2", "beta content two"),  # dup of u1, later batch
            ("u3", "gamma content three"),
        ],
        schema,
    ).coalesce(1).write.parquet(str(src / "f1.parquet"))
    # file source orders micro-batches by modification time
    now = time.time()
    os.utime(src / "f0.parquet", (now - 100, now - 100))
    os.utime(src / "f1.parquet", (now, now))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = streaming_exact_dedup(stream, text_col="text", id_col="url")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["url"]: r for r in spark.sql("select * from dedup_out").collect()}

    assert set(rows) == {"u0", "u1", "u3"}  # u9, u2 suppressed
    assert rows["u0"]["n_seen"] == 2  # in-batch dup counted
    assert rows["u1"]["n_seen"] == 1
    assert rows["u3"]["n_seen"] == 1
    assert all(r["content_hash"] is not None for r in rows.values())


def test_restart_resumes_state(spark, tmp_path):
    """A new file arriving after the first run must still be deduped
    against state recovered from the checkpoint."""
    src = tmp_path / "src2"
    os.makedirs(src)
    schema = "url string, text string"
    spark.createDataFrame(
        [("a0", "delta content")], schema
    ).coalesce(1).write.parquet(str(src / "g0.parquet"))

    sink = str(tmp_path / "sink2")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        out = streaming_exact_dedup(stream, text_col="text", id_col="url")
        # the memory sink cannot recover from a checkpoint; the file
        # sink is the restartable production shape
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    first = {r["url"] for r in spark.read.parquet(sink).collect()}
    assert first == {"a0"}
    # second run: one duplicate (suppressed via recovered state) + one new
    spark.createDataFrame(
        [("a1", "delta content"), ("a2", "epsilon content")], schema
    ).coalesce(1).write.parquet(str(src / "g1.parquet"))
    run()
    urls = [r["url"] for r in spark.read.parquet(sink).collect()]
    assert "a1" not in urls
    assert "a2" in urls


def test_dedup_then_index_pipeline(spark, tmp_path):
    """The composed firehose shape: files -> stateful dedup ->
    incremental indexer; the index must contain exactly the deduped
    docs and search them."""
    from iresearch_spark.search import SearchEngine, Term
    from iresearch_spark.streaming.incremental import IncrementalIndexer

    src = tmp_path / "src3"
    os.makedirs(src)
    schema = "url string, text string"
    spark.createDataFrame(
        [("p0", "zeta common words"), ("p1", "eta common words")], schema
    ).coalesce(1).write.parquet(str(src / "h0.parquet"))
    spark.createDataFrame(
        [("p2", "zeta common words"), ("p3", "theta fresh words")], schema
    ).coalesce(1).write.parquet(str(src / "h1.parquet"))
    now = time.time()
    os.utime(src / "h0.parquet", (now - 100, now - 100))
    os.utime(src / "h1.parquet", (now, now))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    deduped = streaming_exact_dedup(stream, text_col="text", id_col="url")
    ix = IncrementalIndexer(index_dir=str(tmp_path / "ixd"), bucket_bits=7)
    q = (
        deduped.select("url", "text")
        .writeStream.foreachBatch(ix.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    idx = ix.read(spark)
    assert idx.field_stats.n_docs == 3  # p2 (dup of p0) never indexed
    eng = SearchEngine(idx)
    assert eng.matches(Term("zeta")).count() == 1
    assert eng.matches(Term("common")).count() == 2
    assert eng.matches(Term("theta")).count() == 1
