"""Partitioned Bloom-filter sidecar for the url_seen table (SURVEY.md §4.3).

The reference dedups with an O(1) in-process hash map
(storage/storage.go:70-83). At the 10^10-URL design point the Spark
equivalent — an exact anti-join against the full seen table every round —
shuffles the entire 10^10-row table per round, which is the scalability
cliff. The sidecar keeps **one Bloom filter per ``domain_hash`` partition**
(politeness-aligned bucketing, so a partition's filter co-locates with the
domains an executor fetches):

* Bloom-NEGATIVE candidates are *definitively new* — they skip the exact
  join entirely (the overwhelming majority of a healthy frontier).
* Bloom-POSITIVE candidates (all true dupes + ~fpp of the new ones) go to
  the exact anti-join, whose candidate side is now tiny. At cluster scale
  the seen table is bucketed by ``domain_hash`` so that residual join
  reshuffles nothing but the survivors.

Sizing (unit-tested in tests/test_bloomseen.py):
    m = ceil(-n * ln(p) / ln(2)^2) bits,   k = round(m/n * ln 2)
    10^10 capacity / 4096 partitions -> n = 2.45e6 per partition; p = 0.01
    -> m = 23.4 Mbit = 2.93 MiB per partition, k = 7 — ~12 GiB total across
    the cluster, held partition-local, never on one node. The sandbox
    default (CrawlConfig.seen_bloom_partitions = 64) is the same structure
    at fixture scale.

Probes derive from the already-computed ``xxhash64(canon_url, body)`` via
Kirsch–Mitzenmacher double hashing: ``h1 = low32, h2 = high32 | 1,
probe_i = (h1 + i*h2) mod m``. Inserts and membership tests are numpy bit
ops over whole Arrow batches — no per-row Python anywhere.

URLs are never *un*-seen (colly has no delete either), so a plain Bloom
filter suffices; a cuckoo filter would only pay off if we needed deletes.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

SEEN_FILTERS = StructType(
    [
        StructField("domain_hash", IntegerType()),
        StructField("bits", BinaryType()),
        StructField("n_items", LongType()),
    ]
)


def bloom_params(capacity: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k_hashes) for ``capacity`` items at target ``fpp``.

    m is rounded up to a byte boundary so the bit array maps 1:1 onto the
    binary column.
    """
    capacity = max(capacity, 1)
    m = math.ceil(-capacity * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / capacity * math.log(2)))
    return m, k


def _probes(hashes: np.ndarray, m: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(byte_idx, bit_mask) arrays of shape (n, k) for the k probe positions."""
    h = hashes.astype(np.int64).view(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)
    return (pos >> 3).astype(np.int64), (
        np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
    )


def insert_into_bits(bits: np.ndarray, hashes: np.ndarray, m: int, k: int) -> None:
    """Set the probe bits of ``hashes`` in ``bits`` (uint8 array) in place."""
    if len(hashes) == 0:
        return
    byte_idx, mask = _probes(hashes, m, k)
    # np.bitwise_or.at handles duplicate byte indices within one batch
    np.bitwise_or.at(bits, byte_idx.ravel(), mask.ravel())


def membership(bits: np.ndarray, hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """Vectorized might-contain over ``hashes`` against one filter."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    byte_idx, mask = _probes(hashes, m, k)
    return ((bits[byte_idx] & mask) == mask).all(axis=1)


def update_filters(
    filters_df: DataFrame,
    new_hashes: DataFrame,
    m: int,
    k: int,
) -> DataFrame:
    """OR the round's newly seen hashes into the per-partition filters.

    ``new_hashes``: (domain_hash:int, url_hash:long). Distributed cogroup —
    each partition's filter is rebuilt executor-side from its previous bits
    plus that partition's new hashes; nothing funnels through the driver.
    """
    nbytes = m // 8

    def merge(key, old: pd.DataFrame, new: pd.DataFrame) -> pd.DataFrame:
        if len(old):
            bits = np.frombuffer(old["bits"].iloc[0], dtype=np.uint8).copy()
            n = int(old["n_items"].iloc[0])
        else:
            bits = np.zeros(nbytes, dtype=np.uint8)
            n = 0
        hashes = new["url_hash"].to_numpy(dtype=np.int64)
        insert_into_bits(bits, hashes, m, k)
        return pd.DataFrame(
            {
                "domain_hash": [int(key[0])],
                "bits": [bits.tobytes()],
                "n_items": [n + len(hashes)],
            }
        )

    return (
        filters_df.groupBy("domain_hash")
        .cogroup(new_hashes.groupBy("domain_hash"))
        .applyInPandas(merge, schema=SEEN_FILTERS)
    )


def make_might_contain_udf(spark, filters_df: DataFrame, m: int, k: int):
    """Vectorized (url_hash, domain_hash) -> might_contain boolean column,
    broadcast delivery. Returns ``(udf, broadcast_handle)`` — the caller owns
    the handle and must destroy the previous round's broadcast once its jobs
    are done, or broadcast memory accrues linearly over rounds.

    Broadcast delivery is the small-filter-set strategy (total bytes =
    partitions × m/8, known statically from config); beyond
    ``bloom_delivery_threshold`` the engine switches to
    :func:`cogroup_might_contain`, which never moves the whole filter set to
    any single node.
    """
    from pyspark.sql.functions import pandas_udf

    blobs = {int(r["domain_hash"]): r["bits"] for r in filters_df.collect()}
    bc = spark.sparkContext.broadcast(blobs)

    @pandas_udf("boolean")
    def might_contain(url_hash: pd.Series, domain_hash: pd.Series) -> pd.Series:
        table = bc.value
        uh = url_hash.to_numpy(dtype=np.int64)
        dh = domain_hash.to_numpy(dtype=np.int64)
        out = np.zeros(len(uh), dtype=bool)
        for d in np.unique(dh):
            blob = table.get(int(d))
            if blob is None:
                continue  # no filter yet for this partition -> definitively new
            sel = dh == d
            bits = np.frombuffer(blob, dtype=np.uint8)
            out[sel] = membership(bits, uh[sel], m, k)
        return pd.Series(out)

    return might_contain, bc


def cogroup_might_contain(
    rows: DataFrame, filters_df: DataFrame, m: int, k: int, key_col: str = "__dh"
) -> DataFrame:
    """Partition-local probe delivery (the 10^10-scale path, SURVEY.md §4.3):
    candidates and filters are cogrouped on the domain-hash partition key, so
    each task reads exactly ONE filter blob — its own partition's — and the
    full filter set (≈12 GiB at the design point) never funnels through the
    driver or a broadcast. Adds ``__maybe`` to ``rows``.

    ``rows`` must carry ``url_hash`` and ``key_col``; the probe is the same
    vectorized :func:`membership` kernel as broadcast delivery — only the
    delivery of the bits differs, which is what keeps the two modes
    parity-testable against each other.
    """
    from pyspark.sql.types import BooleanType

    out_schema = StructType(list(rows.schema.fields) + [StructField("__maybe", BooleanType())])
    cols = [f.name for f in rows.schema.fields]

    def probe(left: pd.DataFrame, filt: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame(columns=cols + ["__maybe"])
        if len(filt) == 0:  # no filter yet for this partition -> all new
            left["__maybe"] = False
            return left
        bits = np.frombuffer(filt["bits"].iloc[0], dtype=np.uint8)
        uh = left["url_hash"].to_numpy(dtype=np.int64)
        left["__maybe"] = membership(bits, uh, m, k)
        return left

    return (
        rows.groupBy(key_col)
        .cogroup(filters_df.groupBy(F.col("domain_hash").alias(key_col)))
        .applyInPandas(probe, schema=out_schema)
    )
