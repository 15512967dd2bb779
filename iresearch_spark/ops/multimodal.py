"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched pandas UDFs via
mapInPandas.

The Spark-side contract (schemas, batch shapes, partitioning) is real
and tested; the actual media decoding is STUBBED behind
`NotImplementedError` / deterministic fakes because no media libraries
ship in this environment — swap `_decode_image_impl` for a PIL/ffmpeg
call in production and nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("ok", T.BooleanType(), False),
    ]
)


def _decode_image_impl(payload: bytes) -> np.ndarray:
    """Real decoder goes here (PIL.Image.open etc.). Stubbed."""
    raise NotImplementedError(
        "media decoding requires an image library not present in this "
        "environment; use fake_feature_extract for pipeline testing"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in: byte-histogram projection. Keeps the
    whole pipeline testable end-to-end with real Arrow batches."""
    if payload is None:
        return None
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    total = hist.sum()
    return hist / total if total else hist


def feature_extract(
    media: DataFrame, dim: int = 8, use_real_decoder: bool = False
) -> DataFrame:
    """binary payloads -> feature vectors, Arrow-batched.

    Partitioning contract: payloads are processed where they live (no
    shuffle); batch size is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch so executor memory is
    payload_size * batch_rows bounded."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes, oks = [], [], []
            for payload in pdf["payload"]:
                if use_real_decoder:
                    img = _decode_image_impl(payload)  # pragma: no cover
                    f = img.mean(axis=(0, 1)).astype(np.float32)
                else:
                    f = _fake_feature(payload, dim)
                feats.append(None if f is None else f.tolist())
                nbytes.append(0 if payload is None else len(payload))
                oks.append(f is not None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "n_bytes": np.asarray(nbytes, dtype=np.int32),
                    "ok": oks,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    use_real_decoder: bool = False,
) -> DataFrame:
    """Image payloads -> resized payloads, Arrow-batched, no shuffle
    (payloads processed where they live). The decode+resample is the
    stubbed step: the fake emits a deterministic byte subsample sized
    width*height (so downstream size accounting is exercised for real);
    swap `_decode_image_impl` + a resampler in production."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            outs, oks = [], []
            for payload in pdf["payload"]:
                # zero-length payloads are undecodable like nulls — an
                # empty arr would make arr[idx] fail the whole batch
                if payload is None or len(payload) == 0:
                    outs.append(None)
                    oks.append(False)
                    continue
                if use_real_decoder:
                    _decode_image_impl(payload)  # pragma: no cover
                arr = np.frombuffer(payload, dtype=np.uint8)
                idx = (np.arange(target) * max(len(arr), 1) // max(target, 1)) % max(len(arr), 1)
                outs.append(arr[idx].tobytes())
                oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": outs,
                    "width": np.full(len(pdf), width, dtype=np.int32),
                    "height": np.full(len(pdf), height, dtype=np.int32),
                    "ok": oks,
                }
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(run, RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp
    (the decode itself is the stubbed step). Demonstrates the explode
    pattern that keeps sampling declarative."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "sample_ts",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "sample_ts", "payload")
    )
