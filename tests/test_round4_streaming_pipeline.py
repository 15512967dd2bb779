"""The stateless cleaning/annotation ops are streaming-compatible via
foreachBatch: each micro-batch is processed with the SAME batch
pipeline (the ops aggregate only within a document, never across
documents in different batches), so streaming output == batch output.
This is the continuous crawl-ingest shape; ops needing cross-batch
state (exact dedup) have their own stateful operator
(streaming/dedup_stream.py)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from iresearch_spark.ops.textstats import (
    gopher_quality_filter,
    lang_id_ngram,
    scrub_pii,
)

ROWS = [
    (0, "contact bob@example.com and the cat sat with the dog today."),
    (1, "the quick brown fox jumped over the lazy dog near the barn."),
    (2, "der hund und die katze sind nicht mit der maus im haus."),
    (3, "short."),
]
SCHEMA = "doc_id long, text string"


def _pipeline(df):
    scrubbed = scrub_pii(df)
    gq = gopher_quality_filter(scrubbed, min_words=5, min_stop_hits=1)
    lang = lang_id_ngram(scrubbed)
    return (
        scrubbed.join(gq.select("doc_id", "keep"), "doc_id")
        .join(lang, "doc_id")
        .select("doc_id", "text", "keep", "pred_lang")
    )


def test_streaming_matches_batch(spark, tmp_path):
    src = tmp_path / "src"
    os.makedirs(src)
    for i, row in enumerate(ROWS):
        spark.createDataFrame([row], SCHEMA).coalesce(1).write.parquet(
            str(src / f"f{i}.parquet")
        )
        now = time.time()
        os.utime(src / f"f{i}.parquet", (now - 100 + i, now - 100 + i))

    batch_out = sorted(
        tuple(r) for r in _pipeline(spark.createDataFrame(ROWS, SCHEMA)).collect()
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    sink = str(tmp_path / "sink")
    q = (
        stream.writeStream.foreachBatch(
            lambda batch_df, _bid: _pipeline(batch_df)
            .write.mode("append")
            .parquet(sink)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_out = sorted(
        tuple(r) for r in spark.read.parquet(sink).collect()
    )
    assert stream_out == batch_out
    # sanity on content: PII scrubbed, language split, quality flags
    by_id = {r[0]: r for r in stream_out}
    assert "<EMAIL>" in by_id[0][1]
    assert by_id[2][3] == "de"
    assert by_id[1][3] == "en"
    assert by_id[3][2] == 0  # too short -> gopher rejects
    assert by_id[1][2] == 1
