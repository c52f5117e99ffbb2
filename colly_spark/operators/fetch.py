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

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
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


def fetch_ms_col(cfg: CrawlConfig):
    """Synthetic fetch-time model as a pure JVM column expression:
    serve_delay + first-matching rule's Delay + a seeded deterministic
    stand-in for RandomDelay (http_backend.go:202-214) —
    ``xxhash64(seed, url_hash) mod random_delay``, never wall-clock.

    This used to be a ``mapInPandas`` executor, which piped the whole
    fetched row set (page bodies included) through Arrow just to add two
    integers — the single widest Python round-trip in the engine. A REAL
    network fetcher is still a ``mapInPandas`` over the salted
    domain-keyed batch (narrow: urls in, bodies out) and slots back into
    the same engine seam; the synthetic model has no business leaving the
    JVM."""
    from pyspark.sql import Column

    delay: Column = F.lit(0).cast("long")
    rand: Column = F.lit(0).cast("long")
    for idx in reversed(range(len(cfg.limit_rules))):
        r = cfg.limit_rules[idx]
        delay = F.when(F.col("rule_idx") == idx, F.lit(r.delay_ms).cast("long")).otherwise(delay)
        if r.random_delay_ms:
            rand = F.when(
                F.col("rule_idx") == idx,
                F.pmod(
                    F.xxhash64(F.lit(cfg.seed), F.col("url_hash")),
                    F.lit(r.random_delay_ms),
                ),
            ).otherwise(rand)
    return F.coalesce(F.col("serve_delay_ms"), F.lit(0)).cast("long") + delay + rand
