"""S1/S2/S4: FIFO dispatch ordering, per-domain politeness token windows,
domain-keyed repartitioning with hot-domain salting.

Reference semantics:
- strict FIFO dispatch (queue/queue.go:160-205): our total order is
  ``enqueue_seq`` (dense submission order, = colly's Request.ID counter
  colly.go:705);
- per-domain LimitRule (http_backend.go:52-107): a domain group with
  Parallelism P and Delay D sustains at most ``tokens_for_rule`` fetches per
  round of wall-budget; first-match-wins rule selection by registration
  order (http_backend.go:143-155);
- S4/north rule: the fetch batch is repartitioned by (domain, salt) where
  hot domains are split so no partition's fetch budget exceeds ~2x the
  median (skew clause).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import IntegerType

from colly_spark.config import CrawlConfig, match_rule_idx, tokens_for_rule


def make_rule_idx_udf(cfg: CrawlConfig):
    """domain -> first-matching LimitRule index (-1 = none), vectorized.
    Caches per distinct domain within each Arrow batch."""
    rules = cfg.limit_rules

    def match_pd(domain: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def one(d):
            if d is None:
                return -1
            if d not in cache:
                cache[d] = match_rule_idx(d, rules)
            return cache[d]

        return domain.map(one).astype("int32")

    return F.pandas_udf(match_pd, IntegerType())


def tokens_map_expr(cfg: CrawlConfig):
    """rule_idx -> per-round token cap, as a literal CASE expression
    (rules are plan constants, not data)."""
    expr = F.lit(tokens_for_rule(None, cfg.round_budget_ms, cfg.service_est_ms))
    out = None
    for idx in reversed(range(len(cfg.limit_rules))):
        t = tokens_for_rule(cfg.limit_rules[idx], cfg.round_budget_ms, cfg.service_est_ms)
        out = F.when(F.col("rule_idx") == idx, F.lit(t)).otherwise(
            out if out is not None else expr
        )
    return out if out is not None else expr


def dispatch_seq_map(
    frontier: DataFrame,
    cfg: CrawlConfig,
    fetched: int,
    num_partitions: int | None = None,
    pins: list | None = None,
    delay_caps: DataFrame | None = None,
):
    """(seqmap, totals): the politeness split + global FIFO rank computed on
    a skinny (enqueue_seq, domain, rule_idx) projection of the frontier.

    seqmap = (enqueue_seq, fetch_seq) for rows dispatched this round; rows
    absent from the map are deferred. The caller joins it back to the wide
    frontier by the unique enqueue_seq key — the heavy columns (body, ctx,
    urls) never enter the window shuffle or the range sort, so the dispatch
    phase moves ~30 B/row regardless of payload width.
    """
    from colly_spark.operators.seq import with_ordered_counts

    skinny = frontier.select("enqueue_seq", "domain", "rule_idx")
    cap = tokens_map_expr(cfg)
    if delay_caps is not None:
        # robots Crawl-delay caps (respect_crawl_delay): per-domain token
        # ceilings derived from the robots cache, broadcast onto the skinny
        # projection — domains without a declared delay stay uncapped
        skinny = skinny.join(F.broadcast(delay_caps), "domain", "left")
        cap = F.least(cap, F.coalesce(F.col("__delay_tokens"), F.lit(1 << 30)))
    w = Window.partitionBy("domain").orderBy("enqueue_seq")
    flagged = skinny.withColumn("__disp", F.row_number().over(w) <= cap)
    if delay_caps is not None:
        flagged = flagged.drop("__delay_tokens")
    seqd, totals = with_ordered_counts(
        flagged, ["enqueue_seq"], ["__disp"], num_partitions=num_partitions,
        return_totals=True, pins=pins,
    )
    seqmap = seqd.where("__disp").select(
        "enqueue_seq", (F.col("__disp_before") + F.lit(fetched)).alias("fetch_seq")
    )
    return seqmap, totals


def salted_repartition(
    batch: DataFrame,
    num_partitions: int,
    target_per_bucket: int,
    stamp_partition_col: str | None = None,
) -> DataFrame:
    """Domain-keyed repartition with explicit skew splitting: a domain with
    cnt rows is split into ceil(cnt/target) salt buckets keyed by url_hash,
    so no single partition carries a hot domain's whole fetch budget
    (north rule: max executor budget <= 2x median). AQE skew-join handling
    is the backstop; this makes the fetch stage balanced by construction.

    ``stamp_partition_col`` folds a ``spark_partition_id()`` stamp into the
    salt-dropping projection (one select instead of a drop + withColumn)."""
    w = Window.partitionBy("domain")
    salt = F.pmod(
        F.col("url_hash"),
        F.greatest(
            F.lit(1),
            F.ceil(F.count(F.lit(1)).over(w) / F.lit(target_per_bucket)),
        ),
    ).cast("int")
    out = batch.select("*", salt.alias("__salt")).repartition(
        num_partitions, "domain", "__salt"
    )
    if stamp_partition_col:
        return out.select(
            *batch.columns, F.spark_partition_id().alias(stamp_partition_col)
        )
    return out.select(*batch.columns)
