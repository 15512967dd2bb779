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


# ---------------------------------------------------------------------------
# Audio: RIFF/WAVE PCM decode is pure numpy (no media library), so the
# audio path ships a REAL decoder even in this sandbox; compressed
# formats (mp3/ogg/...) remain the stubbed step.
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("rms", T.FloatType(), True),
        T.StructField("zero_crossing_rate", T.FloatType(), True),
        T.StructField("spectral_centroid_hz", T.FloatType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)

_WAV_PCM_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def decode_wav(payload: bytes):
    """Parse a RIFF/WAVE payload -> (float32 mono samples in [-1, 1],
    sample_rate, channels). Walks the chunk list (fmt may be followed
    by fact/LIST/cue before data), supports PCM (format 1: 8-bit
    unsigned, 16/32-bit signed) and IEEE float32 (format 3), averages
    channels to mono. Raises ValueError on anything else — compressed
    WAV subformats are the stubbed step, like non-WAV containers."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = np.frombuffer(payload[pos + 4 : pos + 8], dtype="<u4")
        size = int(size)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels = np.frombuffer(body[0:4], dtype="<u2")
            (rate,) = np.frombuffer(body[4:8], dtype="<u4")
            (bits,) = np.frombuffer(body[14:16], dtype="<u2")
            fmt = (int(audio_fmt), int(channels), int(rate), int(bits))
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE payload missing fmt/data chunk")
    audio_fmt, channels, rate, bits = fmt
    if channels < 1 or rate < 1:
        raise ValueError("corrupt fmt chunk")
    if audio_fmt == 3 and bits == 32:
        x = np.frombuffer(
            data[: len(data) - len(data) % 4], dtype="<f4"
        ).astype(np.float32)
    elif audio_fmt == 1 and bits in _WAV_PCM_DTYPES:
        dt = np.dtype(_WAV_PCM_DTYPES[bits]).newbyteorder("<")
        step = dt.itemsize
        x = np.frombuffer(data[: len(data) - len(data) % step], dtype=dt)
        if bits == 8:  # unsigned, midpoint 128
            x = (x.astype(np.float32) - 128.0) / 128.0
        else:
            x = x.astype(np.float32) / float(2 ** (bits - 1))
    else:
        raise ValueError(
            f"unsupported WAVE encoding (format {audio_fmt}, {bits}-bit) — "
            "only PCM 8/16/32 and float32 decode natively"
        )
    frames = len(x) // channels
    x = x[: frames * channels]
    if channels > 1:
        x = x.reshape(frames, channels).mean(axis=1)
    return x, rate, channels


def _audio_feature_row(samples: np.ndarray, rate: int):
    """(rms, zero-crossing rate per sample, spectral centroid in Hz)
    of a mono float signal — the classic cheap audio descriptors."""
    if samples.size == 0:
        return 0.0, 0.0, 0.0
    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
    signs = np.signbit(samples)
    zcr = float(np.count_nonzero(signs[1:] != signs[:-1])) / max(
        samples.size - 1, 1
    )
    mag = np.abs(np.fft.rfft(samples.astype(np.float64)))
    freqs = np.fft.rfftfreq(samples.size, d=1.0 / rate)
    denom = mag.sum()
    centroid = float((freqs * mag).sum() / denom) if denom > 0 else 0.0
    return rms, zcr, centroid


def audio_features(
    media: DataFrame, use_real_decoder: bool = True
) -> DataFrame:
    """Audio payloads -> (sample_rate, channels, duration_ms, rms,
    zero-crossing rate, spectral centroid), Arrow-batched via
    mapInPandas, no shuffle (payloads processed where they live — the
    same partitioning contract as feature_extract).

    WAV/PCM payloads decode for REAL (numpy RIFF walk — no media
    library needed); non-WAV payloads are the stubbed step: with
    use_real_decoder=True they come back ok=False (a compressed-codec
    decode needs an external library this environment lacks), and with
    use_real_decoder=False they get the deterministic fake features so
    pipelines exercise the full batch shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "sample_rate", "channels", "duration_ms", "rms",
                "zero_crossing_rate", "spectral_centroid_hz", "ok",
            )}
            for payload in pdf["payload"]:
                row = None
                if payload is not None and len(payload) >= 12 \
                        and payload[:4] == b"RIFF":
                    try:
                        x, rate, ch = decode_wav(payload)
                        rms, zcr, cen = _audio_feature_row(x, rate)
                        row = (rate, ch, int(round(1000.0 * x.size / rate)),
                               rms, zcr, cen, True)
                    except ValueError:
                        row = None
                if row is None and not use_real_decoder \
                        and payload is not None:
                    f = _fake_feature(payload, 4)
                    row = (0, 0, len(payload), float(f[0]), float(f[1]),
                           float(f[2]), True)
                if row is None:
                    row = (None, None, None, None, None, None, False)
                for k, v in zip(out, row):
                    out[k].append(v)
            yield pd.DataFrame({"media_id": pdf["media_id"], **out})

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "payload"
    ).mapInPandas(run, AUDIO_FEATURE_SCHEMA)
