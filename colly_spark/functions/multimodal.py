"""Multimodal binary-column operators: decode / feature-extract / resize /
frame-sample over opaque ``binary`` payloads with typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
``mapInPandas`` signatures, partitioning — while the codec layer delegates to
:mod:`colly_spark.imagecodec` (deterministic stand-in; PIL path when
available). Audio/video decoders are explicit stubs: the wrappers validate
schema and raise ``NotImplementedError`` at the decode step only, so swapping
in a real library touches one function.
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


def decode_audio(data: bytes):  # pragma: no cover - stub by design
    """STUB: no audio codec in this container. Schema/plumbing contract:
    returns (sample_rate:int, samples:np.ndarray[float32])."""
    raise NotImplementedError("audio decoding requires soundfile/ffmpeg (not installed)")


def sample_video_frames(data: bytes, every_n: int = 30):  # pragma: no cover - stub
    """STUB: no video codec in this container. Contract: yields HxWx3 uint8
    frames at the given stride."""
    raise NotImplementedError("video decoding requires pyav/ffmpeg (not installed)")
