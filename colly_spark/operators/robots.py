"""F6: two-phase robots.txt gate (cache fill + vectorized evaluation).

Reference semantics (colly.go:847-906): at most one robots fetch per host per
collector (cached in ``robotsMap``); rules evaluated against escaped path +
'?query'; a robots *fetch error blocks the URL* (colly.go:878-886, test
colly_test.go:1342-1353); HEAD requests skip the gate (colly.go:785); the
gate only runs when ``IgnoreRobotsTxt`` is false (default true, colly.go:507).

Spark shape:
- Phase A (cache fill): ``distinct`` hosts of the surviving batch, anti-join
  the robots_cache table, "fetch" the missing ones (here: a join against the
  synthetic robots fixture; a real HTTP fetch is a drop-in ``mapInPandas``),
  append to the cache.
- Phase B (gate): broadcast-join the candidate batch to the cache on host
  (hosts are orders of magnitude fewer than URLs) and evaluate rules in an
  Arrow-vectorized pandas UDF that parses each distinct robots body once per
  batch (LRU-cached parse in :mod:`colly_spark.robotskit`).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType

from colly_spark.robotskit import robots_allowed


def fill_robots_cache(
    batch_domains: DataFrame,
    robots_cache: DataFrame,
    robots_fixture: DataFrame,
    round_no: int,
) -> DataFrame:
    """New robots_cache rows for hosts in the batch not yet cached.

    ``batch_domains``: single-column DF ``domain``. Returns rows in
    ROBOTS_CACHE schema (empty DF if nothing new).
    """
    new_hosts = (
        batch_domains.select(F.col("domain").alias("host"))
        .where(F.col("host").isNotNull())
        .distinct()
        .join(robots_cache.select("host"), on="host", how="left_anti")
    )
    fetched = (
        new_hosts.join(
            F.broadcast(robots_fixture.withColumnRenamed("body", "robots_body")),
            on="host",
            how="left",
        )
        .select(
            "host",
            # a host with no robots fixture row serves no robots.txt ->
            # everything allowed (empty body), fetch succeeded
            F.when(F.col("fetch_fails"), F.lit(None)).otherwise(
                F.coalesce("robots_body", F.lit(""))
            ).alias("robots_body"),
            F.coalesce("fetch_fails", F.lit(False)).alias("fetch_failed"),
            F.lit(round_no).alias("fetched_round"),
        )
    )
    return fetched


def robots_gate_kind(user_agent: str):
    """Column fn: (robots_body, path_query, fetch_failed, method) -> error
    kind or NULL, with the allow-check vectorized in pandas."""

    def allowed_pd(body: pd.Series, pq: pd.Series) -> pd.Series:
        return pd.Series(
            [robots_allowed(b, user_agent, p or "/") for b, p in zip(body, pq)],
            dtype="bool",
        )

    allowed_udf = F.pandas_udf(allowed_pd, BooleanType())

    def kind(robots_body, path_query, fetch_failed, method):
        return (
            F.when(method == "HEAD", F.lit(None).cast("string"))  # colly.go:785
            .when(fetch_failed, F.lit("ErrRobotsTxtFetch"))
            .when(~allowed_udf(robots_body, path_query), F.lit("ErrRobotsTxtBlocked"))
            .otherwise(F.lit(None).cast("string"))
        )

    return kind


def robots_delay_caps(
    cache: DataFrame, user_agent: str, round_budget_ms: int, service_est_ms: int
) -> DataFrame:
    """(domain, __delay_tokens) from the robots cache: hosts whose
    robots.txt declares a Crawl-delay for ``user_agent`` get a per-round
    token ceiling (config.tokens_for_delay — serialized requests spaced by
    the delay). Host-cardinality output, broadcast by the dispatch join;
    hosts without a declared delay are absent (uncapped). S2 extension
    beyond colly: the reference's robots library parses CrawlDelay
    (temoto/robotstxt) but colly never reads it, hence
    CrawlConfig.respect_crawl_delay defaults off."""
    from pyspark.sql.types import LongType

    from colly_spark.config import tokens_for_delay
    from colly_spark.robotskit import robots_crawl_delay

    @F.pandas_udf(LongType())
    def _caps(body: pd.Series) -> pd.Series:
        def one(b):
            d = robots_crawl_delay(b, user_agent)
            if d is None:
                return None
            return tokens_for_delay(d, round_budget_ms, service_est_ms)

        return body.map(one).astype("object")

    return (
        cache.where(~F.col("fetch_failed"))
        .select(
            F.col("host").alias("domain"),
            _caps(F.col("robots_body")).alias("__delay_tokens"),
        )
        .where(F.col("__delay_tokens").isNotNull())
        # defensive: the cache's anti-join fill keeps hosts unique, but a
        # duplicate here would DUPLICATE frontier rows through the dispatch
        # join and corrupt the FIFO window — a host-sized agg is cheap
        # insurance (min = the strictest declared cap)
        .groupBy("domain")
        .agg(F.min("__delay_tokens").alias("__delay_tokens"))
    )
