"""Deterministic image payload codec + validation kernels (U5).

The BASELINE input table carries image payloads
``(image_id, bytes, w, h, fmt, caption, phash)`` and the per-row invariant is
"decoded-pixel allclose (PSNR >= 40 dB for lossy) + caption equality".

Real decoders (PIL/libjpeg) are not in this container, so the codec is a
deterministic stand-in with the same *shape* as a real one:

- ``fmt='png'``  -> lossless: zlib of raw RGB (PSNR = inf)
- ``fmt='jpeg'`` -> lossy: 6-bit quantization then zlib (PSNR ~ 47 dB,
  comfortably over the 40 dB gate, so the gate is exercised for real)

If PIL ever becomes available, :func:`decode` falls through to it for real
PNG/JPEG magic bytes — the Spark-side plumbing (binary column in, validation
struct out, Arrow batches) is identical either way.

All functions are numpy-vectorized per image; the Spark surface batches them
through ``mapInPandas`` in :mod:`colly_spark.operators.payload`.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

MAGIC_LOSSLESS = b"FPNG"
MAGIC_LOSSY = b"FJPG"
_QUANT_SHIFT = 2  # 4-level quantization step -> ~47 dB PSNR

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def reference_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic RGB pixels for an image_id: gradient + seeded noise."""
    seed = int.from_bytes(hashlib.blake2b(image_id.encode(), digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int16)
    noise = rng.integers(-16, 17, size=(h, w, 3), dtype=np.int16)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    h, w, _ = pixels.shape
    header = struct.pack("<II", w, h)
    if fmt == "png":
        return MAGIC_LOSSLESS + header + zlib.compress(pixels.tobytes(), 6)
    if fmt == "jpeg":
        q = (pixels >> _QUANT_SHIFT).astype(np.uint8)
        return MAGIC_LOSSY + header + zlib.compress(q.tobytes(), 6)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes) -> np.ndarray | None:
    """bytes -> HxWx3 uint8, or None if undecodable."""
    if data is None or len(data) < 12:
        return None
    magic, rest = bytes(data[:4]), bytes(data[4:])
    if magic in (MAGIC_LOSSLESS, MAGIC_LOSSY):
        w, h = struct.unpack("<II", rest[:8])
        try:
            raw = zlib.decompress(rest[8:])
        except zlib.error:
            return None
        if len(raw) != w * h * 3:
            return None
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
        if magic == MAGIC_LOSSY:
            # dequantize to bin centers
            arr = np.minimum(
                (arr.astype(np.int16) << _QUANT_SHIFT) + (1 << (_QUANT_SHIFT - 1)), 255
            ).astype(np.uint8)
        return arr
    if _HAVE_PIL:  # pragma: no cover - real codec path
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    raise NotImplementedError(
        "real image codecs (PIL/libjpeg) unavailable in this container; "
        "only the deterministic FPNG/FJPG stand-in formats are supported"
    )


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio; inf for identical images."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def average_hash(pixels: np.ndarray) -> int:
    """64-bit average hash: 8x8 block-mean luma vs global mean (signed i64)."""
    h, w, _ = pixels.shape
    luma = (
        0.299 * pixels[..., 0] + 0.587 * pixels[..., 1] + 0.114 * pixels[..., 2]
    )
    ys = np.linspace(0, h, 9, dtype=int)
    xs = np.linspace(0, w, 9, dtype=int)
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = luma[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    bits = (cells > cells.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v  # two's-complement into i64


def validate_payload(
    data: bytes, image_id: str, w: int, h: int, fmt: str, phash: int
) -> tuple[bool, str]:
    """Per-row invariant: dims match, PSNR>=40dB vs reference pixels for
    lossy / exact for lossless, phash recompute match. Returns (ok, psnr)."""
    arr = decode(data)
    if arr is None or arr.shape != (h, w, 3):
        return False, "0.0"
    ref = reference_pixels(image_id, w, h)
    p = psnr_db(arr, ref)
    if fmt == "png":
        ok = np.array_equal(arr, ref)
    else:
        ok = p >= 40.0
    ok = ok and average_hash(ref) == phash
    return bool(ok), ("inf" if p == float("inf") else f"{p:.2f}")
