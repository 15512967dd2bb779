"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched pandas UDFs via
mapInPandas.

The Spark-side contract (schemas, batch shapes, partitioning) is real
and tested. The decode step is feature-flagged: `use_real_decoder=True`
uses Pillow when it is importable (the production path — import-tried
once per worker, never a hard dependency) and raises a clear
NotImplementedError otherwise; the default is the deterministic fake,
which keeps the whole pipeline testable in environments without media
libraries (like this one).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T


def _pil():
    """Import-try Pillow once (per process); None when unavailable."""
    global _PIL_MOD
    try:
        return _PIL_MOD
    except NameError:
        pass
    try:
        from PIL import Image as _img  # noqa: PLC0415

        _PIL_MOD = _img
    except ImportError:
        _PIL_MOD = None
    return _PIL_MOD

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
    """Decode an image payload to an (H, W, C) uint8 array via Pillow
    when available; otherwise raise — the caller opted into
    use_real_decoder, so a silent fake here would be a wrong answer."""
    img_mod = _pil()
    if img_mod is None:
        raise NotImplementedError(
            "use_real_decoder=True requires Pillow, which is not "
            "installed in this environment; the default (fake) path "
            "exercises the identical Spark plumbing"
        )
    import io

    with img_mod.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("RGB"))


def _resize_image_impl(payload: bytes, width: int, height: int) -> bytes:
    """Decode + resample + re-encode (PNG) via Pillow."""
    img_mod = _pil()
    if img_mod is None:
        raise NotImplementedError(
            "use_real_decoder=True requires Pillow, which is not "
            "installed in this environment"
        )
    import io

    with img_mod.open(io.BytesIO(payload)) as im:
        out = io.BytesIO()
        im.convert("RGB").resize((width, height)).save(out, format="PNG")
        return out.getvalue()


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
                    if payload is None:
                        f = None
                    else:
                        img = _decode_image_impl(payload)
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
                    outs.append(_resize_image_impl(payload, width, height))
                    oks.append(True)
                    continue
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
