"""Multimodal binary-column operators: decode / feature-extract / resize /
frame-sample over opaque ``binary`` payloads with typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
``mapInPandas`` signatures, partitioning — while the codec layer delegates to
:mod:`colly_spark.imagecodec` (deterministic stand-in; PIL path when
available). Audio decodes WAV/PCM natively (stdlib ``wave`` + numpy); video
decodes uncompressed YUV4MPEG2 (Y4M) natively (pure numpy: planar YUV
420/422/444/mono, BT.601 limited-range to RGB). Compressed audio (MP3/AAC)
and compressed video (mp4/h264/webm) raise ``NotImplementedError`` at the
decode step only, so swapping in a real library touches one function.
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


# ---------------------------------------------------------------------------
# Video: native YUV4MPEG2 (Y4M) decode — pure numpy, no codec library.
# Y4M is the uncompressed interchange format (mjpegtools spec): an ASCII
# header line, then per frame an ASCII "FRAME" marker + raw planar YUV.
# Compressed containers (mp4/h264/webm/mkv) genuinely need ffmpeg/pyav and
# raise NotImplementedError at the decode step only.
# ---------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"


def _parse_y4m_header(data: bytes) -> tuple[int, int, tuple[int, int], str, int]:
    """Y4M stream header -> (w, h, (fps_num, fps_den), colorspace, body_off)."""
    try:
        nl = data.index(b"\n", 0, 512)
    except ValueError:
        raise NotImplementedError("Y4M header line unterminated") from None
    w = h = 0
    fps = (30, 1)
    cs = "420"  # spec default when no C tag
    try:
        for field in data[len(_Y4M_MAGIC):nl].decode("ascii", "replace").split(" "):
            if not field:
                continue
            tag, val = field[0], field[1:]
            if tag == "W":
                w = int(val)
            elif tag == "H":
                h = int(val)
            elif tag == "F":
                num, den = val.split(":")
                fps = (int(num), int(den))
            elif tag == "C":
                cs = val
    except ValueError:  # e.g. 'Wabc' — malformed header int must reject as
        raise NotImplementedError("Y4M header field unparseable") from None
    if w <= 0 or h <= 0:
        raise NotImplementedError("Y4M header missing W/H")
    return w, h, fps, cs, nl + 1


def _y4m_plane_sizes(w: int, h: int, cs: str) -> tuple[int, int, int]:
    if cs.startswith("mono"):
        return w * h, 0, 0
    if cs.startswith("420"):
        # odd W/H with subsampled chroma would make the upsampled plane
        # mismatch the luma plane (raw numpy shape error downstream) —
        # reject here with the documented exception type instead
        if w % 2 or h % 2:
            raise NotImplementedError(f"Y4M C420 requires even W/H, got {w}x{h}")
        c = (w // 2) * (h // 2)
    elif cs.startswith("422"):
        if w % 2:
            raise NotImplementedError(f"Y4M C422 requires even W, got {w}")
        c = (w // 2) * h
    elif cs.startswith("444"):
        c = w * h
    else:
        raise NotImplementedError(f"Y4M colorspace C{cs} unsupported")
    return w * h, c, c


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray | None, v: np.ndarray | None) -> np.ndarray:
    """BT.601 limited-range YCbCr -> RGB uint8 (the Y4M convention)."""
    c = 1.164 * (y.astype(np.float32) - 16.0)
    if u is None:  # mono
        g = np.clip(c, 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    d = u.astype(np.float32) - 128.0
    e = v.astype(np.float32) - 128.0
    rgb = np.stack(
        [c + 1.596 * e, c - 0.392 * d - 0.813 * e, c + 2.017 * d], axis=-1
    )
    return np.clip(rgb, 0, 255).astype(np.uint8)


def iter_video_frames(data: bytes):
    """Decode a Y4M stream: yields ``(frame_index, HxWx3 uint8 RGB)`` lazily
    (one frame resident at a time — streams bigger than memory sample fine).
    Raises NotImplementedError for anything that is not an integer-plane
    Y4M stream (compressed video needs ffmpeg/pyav, absent here)."""
    if data is None or not bytes(data[: len(_Y4M_MAGIC)]) == _Y4M_MAGIC:
        raise NotImplementedError(
            "only uncompressed YUV4MPEG2 (Y4M) video decodes natively; "
            "compressed containers require pyav/ffmpeg (not installed)"
        )
    data = bytes(data)
    w, h, _fps, cs, off = _parse_y4m_header(data)
    ysz, usz, vsz = _y4m_plane_sizes(w, h, cs)
    fsz = ysz + usz + vsz
    idx = 0
    while off < len(data):
        try:
            nl = data.index(b"\n", off, off + 256)
        except ValueError:
            raise NotImplementedError(
                f"unterminated Y4M frame marker at {off}"
            ) from None
        if data[off:nl][:5] != b"FRAME":
            raise NotImplementedError(f"malformed Y4M frame marker at {off}")
        off = nl + 1
        if off + fsz > len(data):
            raise NotImplementedError("truncated Y4M frame payload")
        y = np.frombuffer(data, np.uint8, ysz, off).reshape(h, w)
        if usz:
            u = np.frombuffer(data, np.uint8, usz, off + ysz)
            v = np.frombuffer(data, np.uint8, vsz, off + ysz + usz)
            if cs.startswith("420"):
                u = u.reshape(h // 2, w // 2).repeat(2, 0).repeat(2, 1)
                v = v.reshape(h // 2, w // 2).repeat(2, 0).repeat(2, 1)
            elif cs.startswith("422"):
                u = u.reshape(h, w // 2).repeat(2, 1)
                v = v.reshape(h, w // 2).repeat(2, 1)
            else:  # 444
                u = u.reshape(h, w)
                v = v.reshape(h, w)
            yield idx, _yuv_to_rgb(y, u, v)
        else:
            yield idx, _yuv_to_rgb(y, None, None)
        off += fsz
        idx += 1


def sample_video_frames(data: bytes, every_n: int = 30) -> list[tuple[int, np.ndarray]]:
    """Every ``every_n``-th frame of a Y4M stream as ``(index, HxWx3 uint8
    RGB)`` — the frame-sample operator of the multimodal pipeline."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    return [(i, f) for i, f in iter_video_frames(data) if i % every_n == 0]


VIDEO_FEATURES_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("decode_ok", BooleanType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fps", DoubleType()),
        StructField("n_frames", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("n_sampled", LongType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def video_features(videos: DataFrame, id_col: str = "video_id",
                   bytes_col: str = "bytes", sample_every: int = 30) -> DataFrame:
    """Decode + feature-extract video payloads (dims, fps, duration,
    BT.601-weighted mean luma over sampled frames — the same ``mean_luma``
    definition as :func:`image_features`) in Arrow-batched pandas over
    ``mapInPandas`` —
    same quarantine-and-count shape as :func:`audio_features`: undecodable
    rows come back ``decode_ok=false`` instead of being dropped."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                try:
                    if data is None or bytes(data[:9]) != _Y4M_MAGIC:
                        raise NotImplementedError("not a Y4M stream")
                    w, h, (fn, fd), _cs, _off = _parse_y4m_header(bytes(data))
                    lumas = []
                    n = 0
                    n_sampled = 0
                    for i, frame in iter_video_frames(data):
                        n = i + 1
                        if i % sample_every == 0:
                            n_sampled += 1
                            # BT.601-weighted luma — the SAME definition as
                            # image_features' mean_luma (one name, one formula)
                            lumas.append(float(
                                (0.299 * frame[..., 0] + 0.587 * frame[..., 1]
                                 + 0.114 * frame[..., 2]).mean()
                            ))
                except (NotImplementedError, ValueError):
                    rows.append((vid, False, 0, 0, 0.0, 0, 0.0, 0, 0.0))
                    continue
                fps = fn / fd if fd else 0.0
                rows.append((
                    vid, True, int(w), int(h), round(fps, 6), int(n),
                    round(n / fps, 6) if fps else 0.0, int(n_sampled),
                    round(float(np.mean(lumas)), 6) if lumas else 0.0,
                ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_FEATURES_SCHEMA.fields]
            )

    from pyspark.sql import functions as F

    return videos.select(
        F.col(id_col).alias("video_id"), F.col(bytes_col).alias("bytes")
    ).mapInPandas(gen, schema=VIDEO_FEATURES_SCHEMA)
