"""Pure-Python xxHash64 matching Spark's ``F.xxhash64`` bit-for-bit.

Why this exists: the engine derives deterministic quantities from
``F.xxhash64`` columns (the F2 request hash, colly.go:1669-1678; the seeded
RandomDelay stand-in, http_backend.go:210-213), and the serial golden
simulator plus the DuckDB/golden oracles must reproduce those exact values
WITHOUT a SparkSession. Spark's implementation is Catalyst's ``XXH64``
(sql/catalyst .../expressions/XXH64.java) — the standard xxHash64 spec with
per-type dispatch:

- long/int columns -> ``hashLong`` (ints are widened to long),
- string/binary   -> ``hashBytes`` over the UTF-8 / raw bytes,
- multiple columns fold left with the running hash as the next seed,
  starting from seed 42.

Everything is 64-bit modular arithmetic; Python ints are masked per step.
Validated against Spark in tests/test_xxh.py.
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1

PRIME64_1 = 0x9E3779B185EBCA87
PRIME64_2 = 0xC2B2AE3D27D4EB4F
PRIME64_3 = 0x165667B19E3779F9
PRIME64_4 = 0x85EBCA77C2B2AE63
PRIME64_5 = 0x27D4EB2F165667C5

SPARK_SEED = 42  # Catalyst XxHash64 default seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * PRIME64_2) & MASK64
    h ^= h >> 29
    h = (h * PRIME64_3) & MASK64
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64.hashLong: one 8-byte lane (Spark hashes long/int columns so)."""
    value &= MASK64
    h = (seed + PRIME64_5 + 8) & MASK64
    h ^= (_rotl((value * PRIME64_2) & MASK64, 31) * PRIME64_1) & MASK64
    h = (_rotl(h, 27) * PRIME64_1 + PRIME64_4) & MASK64
    return _fmix(h)


def hash_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64.hashUnsafeBytes: the full xxHash64 spec over a byte string."""
    length = len(data)
    end = (length // 8) * 8
    if length >= 32:
        v1 = (seed + PRIME64_1 + PRIME64_2) & MASK64
        v2 = (seed + PRIME64_2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - PRIME64_1) & MASK64
        i = 0
        limit = (length // 32) * 32
        while i < limit:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little") * PRIME64_2) & MASK64, 31) * PRIME64_1) & MASK64
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little") * PRIME64_2) & MASK64, 31) * PRIME64_1) & MASK64
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little") * PRIME64_2) & MASK64, 31) * PRIME64_1) & MASK64
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little") * PRIME64_2) & MASK64, 31) * PRIME64_1) & MASK64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * PRIME64_2) & MASK64, 31) * PRIME64_1) & MASK64
            h = (h * PRIME64_1 + PRIME64_4) & MASK64
        off = limit
    else:
        h = (seed + PRIME64_5) & MASK64
        off = 0
    h = (h + length) & MASK64
    while off + 8 <= length:
        k1 = int.from_bytes(data[off:off + 8], "little")
        h ^= (_rotl((k1 * PRIME64_2) & MASK64, 31) * PRIME64_1) & MASK64
        h = (_rotl(h, 27) * PRIME64_1 + PRIME64_4) & MASK64
        off += 8
    if off + 4 <= length:
        h ^= (int.from_bytes(data[off:off + 4], "little") * PRIME64_1) & MASK64
        h = (_rotl(h, 23) * PRIME64_2 + PRIME64_3) & MASK64
        off += 4
    while off < length:
        h ^= (data[off] * PRIME64_5) & MASK64
        h = (_rotl(h, 11) * PRIME64_1) & MASK64
        off += 1
    return _fmix(h)


def hash_int(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64.hashInt — what Spark uses for IntegerType lanes (an int
    literal like ``F.lit(42)`` hashes through this, NOT hashLong)."""
    h = (seed + PRIME64_5 + 4) & MASK64
    h ^= ((value & 0xFFFFFFFF) * PRIME64_1) & MASK64
    h = (_rotl(h, 23) * PRIME64_2 + PRIME64_3) & MASK64
    return _fmix(h)


def _to_signed(u: int) -> int:
    u &= MASK64
    return u - (1 << 64) if u >= (1 << 63) else u


class I32(int):
    """Marks a value as an IntegerType lane (Spark hashes int32 columns
    with hashInt, long columns with hashLong — the TYPE decides, not the
    value)."""


def spark_xxhash64(*values) -> int:
    """Replicates ``F.xxhash64(*cols)``: left-fold with the running hash as
    the next lane's seed, starting at 42; returns Spark's SIGNED long.

    Python type -> Spark column type: ``str`` = StringType (UTF-8 bytes),
    ``bytes`` = BinaryType, ``int`` = LongType (hashLong), :class:`I32` =
    IntegerType (hashInt — e.g. a plain ``F.lit(42)``), ``None`` = null
    lane (skipped: a null leaves the running hash unchanged, matching
    Catalyst's HashExpression).
    """
    h = SPARK_SEED
    for v in values:
        if v is None:
            continue
        if isinstance(v, str):
            h = hash_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (bytes, bytearray, memoryview)):
            h = hash_bytes(bytes(v), h)
        elif isinstance(v, I32):
            h = hash_int(int(v), h)
        elif isinstance(v, int):
            h = hash_long(v, h)
        else:
            raise TypeError(f"unsupported type for spark_xxhash64: {type(v)}")
    return _to_signed(h)


def pmod(value: int, mod: int) -> int:
    """Spark's pmod for signed-long value: non-negative remainder."""
    return value % mod if mod > 0 else 0


def request_hash(canon_url: str, body: bytes | None) -> int:
    """F2 request hash exactly as the engine computes it:
    ``F.xxhash64(coalesce(canon_url, ''), coalesce(body, b''))``."""
    return spark_xxhash64(canon_url or "", body or b"")


def random_delay_ms(url_hash: int, seed: int, random_delay: int) -> int:
    """The engine's seeded RandomDelay stand-in (operators/fetch.py):
    ``pmod(xxhash64(lit(seed), url_hash), random_delay)``. ``lit(seed)``
    is an IntegerType literal, so its lane hashes through hashInt."""
    if not random_delay:
        return 0
    return pmod(spark_xxhash64(I32(seed), url_hash), random_delay)
