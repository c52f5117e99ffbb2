"""Multimodal binary-column operators: decode / feature-extract / resize /
frame-sample over opaque ``binary`` payloads with typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
``mapInPandas`` signatures, partitioning — while the codec layer delegates to
:mod:`colly_spark.imagecodec` (deterministic stand-in; PIL path when
available). Audio decodes WAV/PCM natively (stdlib ``wave`` + numpy);
compressed audio and all video remain explicit stubs raising
``NotImplementedError`` at the decode step only, so swapping in a real
library touches one function.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from colly_spark import imagecodec

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("decode_ok", BooleanType()),
        StructField("mean_luma", DoubleType()),
        StructField("phash", LongType()),
    ]
)


def image_features(images: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode + feature-extract each image payload (mean luma, phash) in
    Arrow-batched pandas; partition-parallel over the payload table."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for iid, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                try:
                    arr = imagecodec.decode(data)
                except NotImplementedError:
                    arr = None
                if arr is None:
                    rows.append((iid, int(w), int(h), fmt, False, 0.0, 0))
                    continue
                luma = float(
                    (0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]).mean()
                )
                rows.append(
                    (iid, int(w), int(h), fmt, True, round(luma, 4),
                     imagecodec.average_hash(arr))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return images.mapInPandas(gen, schema=IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("decode_ok", BooleanType()),
    ]
)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize re-encoded lossless; numpy-vectorized per
    image. Undecodable payloads are NOT silently dropped: they come back
    with ``decode_ok=false`` and NULL bytes, so a 100-TB pipeline can count
    and quarantine them instead of losing rows."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    arr = imagecodec.decode(data)
                except NotImplementedError:  # unknown/unsupported codec
                    arr = None
                if arr is None:
                    rows.append((iid, None, out_w, out_h, None, False))
                    continue
                h, w, _ = arr.shape
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                small = arr[yi][:, xi]
                rows.append(
                    (iid, imagecodec.encode(small, "png"), out_w, out_h, "png", True)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return images.mapInPandas(gen, schema=RESIZE_SCHEMA)


def decode_audio(data: bytes) -> tuple[int, np.ndarray]:
    """Decode WAV/PCM audio (stdlib ``wave`` + numpy — no external codec
    needed): returns ``(sample_rate, samples)`` with samples float32 in
    [-1, 1], shape (frames, channels). Supports 8/16/24/32-bit integer
    PCM; anything else (MP3, float WAV, ...) raises NotImplementedError —
    those genuinely need soundfile/ffmpeg, which this container lacks."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(data)) as w:
            rate = w.getframerate()
            nch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise NotImplementedError(f"not integer-PCM WAV: {e}") from None
    if width == 1:  # 8-bit WAV is unsigned
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
        samples = (samples - 128.0) / 128.0
    elif width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 3:  # 24-bit: widen each triple to int32, shift-extend
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        i32 = (
            b[:, 0].astype(np.uint32)
            | (b[:, 1].astype(np.uint32) << 8)
            | (b[:, 2].astype(np.uint32) << 16)
        ).astype(np.int32)
        i32 = (i32 << 8) >> 8  # sign-extend from 24 bits
        samples = i32.astype(np.float32) / 8388608.0
    elif width == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:  # pragma: no cover - wave only yields 1..4
        raise NotImplementedError(f"unsupported PCM sample width {width}")
    return rate, samples.reshape(-1, nch)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("audio_id", StringType()),
        StructField("decode_ok", BooleanType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
    ]
)


def audio_features(audio: DataFrame, id_col: str = "audio_id",
                   bytes_col: str = "bytes") -> DataFrame:
    """Decode + feature-extract audio payloads (duration, RMS, peak) in
    Arrow-batched pandas over ``mapInPandas`` — the same shape as
    :func:`image_features`. Undecodable rows come back ``decode_ok=false``
    instead of being dropped (quarantine-and-count at 100 TB)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                try:
                    rate, samples = decode_audio(data)
                except NotImplementedError:
                    rows.append((aid, False, 0, 0, 0, 0.0, 0.0, 0.0))
                    continue
                n = samples.shape[0]
                rows.append((
                    aid, True, int(rate), int(samples.shape[1]), int(n),
                    round(n / rate, 6) if rate else 0.0,
                    round(float(np.sqrt((samples ** 2).mean())), 6) if n else 0.0,
                    round(float(np.abs(samples).max()), 6) if n else 0.0,
                ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    from pyspark.sql import functions as F

    return audio.select(
        F.col(id_col).alias("audio_id"), F.col(bytes_col).alias("bytes")
    ).mapInPandas(gen, schema=AUDIO_FEATURES_SCHEMA)


def sample_video_frames(data: bytes, every_n: int = 30):  # pragma: no cover - stub
    """STUB: no video codec in this container. Contract: yields HxWx3 uint8
    frames at the given stride."""
    raise NotImplementedError("video decoding requires pyav/ffmpeg (not installed)")
