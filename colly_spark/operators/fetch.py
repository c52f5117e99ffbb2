"""X1/X3/X6: synthetic fetch, redirect resolution, fetch timing.

There is no live network in this project: "fetch" is a join of the dispatch
batch against the synthetic ``pages`` table (the content the httptest server
would have served, FIXTURES.md §1) plus a deterministic service-time model.
The operator boundary and row contract are identical to a real fetcher — a
``requests``-based ``mapInPandas`` stage is a drop-in replacement.

Redirects (colly.go:1461-1530): hops are resolved against a broadcast map of
redirect edges (redirect rows are a tiny fraction of any web). Per hop the
static filters are re-applied (colly.go:1463-1465), cycles are detected
against the request's own via-chain and exempted from revisit errors
(colly.go:1476-1485), at most ``max_redirects`` hops are followed with the
last response used beyond that (colly.go:1516-1519). Hop-level *seen*
conflicts (colly.go:1486-1510) are resolved set-wise by the engine after
exploding the hop lists — they need the url_seen table, which cannot live in
a broadcast at 10^10 scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from colly_spark.config import CrawlConfig
from colly_spark.simulator import check_static_filters
from colly_spark.urlkit import canonicalize, hostname

RESOLVE_SCHEMA = StructType(
    [
        StructField("final_url", StringType()),
        StructField("hops", ArrayType(StringType())),  # excludes the start URL
        StructField("is_cycle", BooleanType()),
        StructField("abort_kind", StringType()),  # hop failed a filter
    ]
)


def resolve_redirects_one(
    start: str, redirect_map: dict[str, str], cfg: CrawlConfig
) -> tuple[str, list[str], bool, str | None]:
    """Follow the redirect chain from ``start`` (already canonical)."""
    cur = start
    hops: list[str] = []
    chain = {start}
    for _ in range(cfg.max_redirects):
        nxt_raw = redirect_map.get(cur)
        if nxt_raw is None:
            break
        nxt = canonicalize(nxt_raw)
        if nxt is None:
            return cur, hops, False, "ErrURLParse"
        kind = check_static_filters(nxt, hostname(nxt), cfg)
        if kind:
            return cur, hops, False, kind
        if nxt in chain:  # cycle: stop, use last response, no revisit error
            return cur, hops, True, None
        chain.add(nxt)
        hops.append(nxt)
        cur = nxt
    return cur, hops, False, None


def make_resolver_udf(spark, cfg: CrawlConfig, redirect_map: dict[str, str]):
    bmap = spark.sparkContext.broadcast(redirect_map)

    def resolve_pd(url: pd.Series) -> pd.DataFrame:
        rmap = bmap.value
        rows = [resolve_redirects_one(u, rmap, cfg) for u in url]
        return pd.DataFrame(rows, columns=["final_url", "hops", "is_cycle", "abort_kind"])

    return F.pandas_udf(resolve_pd, RESOLVE_SCHEMA)


FETCH_EXEC_FIELDS = [
    StructField("fetch_ms", LongType()),
    StructField("fetch_partition", IntegerType()),
]


def make_fetch_exec(cfg: CrawlConfig, in_schema: StructType):
    """The partition-parallel fetch executor (mapInPandas over the salted
    domain-keyed batch). Synthetic timing: serve_delay + rule delay + a
    seeded pseudo-random component standing in for RandomDelay
    (http_backend.go:202-214) — deterministic in (seed, url_hash), never
    wall-clock. Emits the physical partition id for the lineage table."""
    delays = [r.delay_ms for r in cfg.limit_rules]
    rnd_delays = [r.random_delay_ms for r in cfg.limit_rules]
    seed = cfg.seed
    out_schema = StructType(in_schema.fields + FETCH_EXEC_FIELDS)

    def exec_pd(batches):
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            rule = pdf["rule_idx"].fillna(-1).astype(int).to_numpy()
            base = pdf["serve_delay_ms"].fillna(0).astype(int).to_numpy()
            delay = np.zeros(n, dtype=np.int64)
            for i, d in enumerate(delays):
                delay[rule == i] = d
            rand = np.zeros(n, dtype=np.int64)
            for i, rd in enumerate(rnd_delays):
                if rd:
                    mask = rule == i
                    if mask.any():
                        h = np.array(
                            [
                                _det_u64(seed, int(uh)) % rd
                                for uh in pdf.loc[mask, "url_hash"]
                            ],
                            dtype=np.int64,
                        )
                        rand[mask] = h
            pdf = pdf.copy()
            pdf["fetch_ms"] = base + delay + rand
            pdf["fetch_partition"] = pid
            yield pdf

    return exec_pd, out_schema


def _det_u64(seed: int, url_hash: int) -> int:
    key = f"{seed}:{url_hash}".encode()
    return int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "big")
