"""X1/X3/X6: synthetic fetch, redirect resolution, fetch timing.

There is no live network in this project: "fetch" is a join of the dispatch
batch against the synthetic ``pages`` table (the content the httptest server
would have served, FIXTURES.md §1) plus a deterministic service-time model.
The operator boundary and row contract are identical to a real fetcher — a
``requests``-based ``mapInPandas`` stage is a drop-in replacement.

Redirects (colly.go:1461-1530): the redirect *graph* is config-static (which
URL redirects where, and which hops pass the static filters, never changes
during a crawl), so its bounded transitive closure is computed ONCE as a
distributed DataFrame — ``max_redirects`` chained joins over the (small)
edge set — and each round's dispatch batch left-joins the closure. Nothing
funnels through the driver: at 10^10 scale the closure is an edges-sized
table, bucketed/broadcast by Catalyst, while per-hop *seen* conflicts
(colly.go:1486-1510) — the only dynamic part — are resolved set-wise by the
engine after exploding the hop lists against the url_seen table.

Per hop the static filters are re-applied (colly.go:1463-1465), cycles are
detected against the request's own via-chain and exempted from revisit
errors (colly.go:1476-1485), at most ``max_redirects`` hops are followed
with the last response used beyond that (colly.go:1516-1519).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from colly_spark.config import CrawlConfig


def redirect_closure(
    pages: DataFrame, cfg: CrawlConfig, url_parts_udf, static_filter_kind
) -> DataFrame:
    """Bounded transitive closure of the redirect graph, fully distributed.

    Input: the synthetic web's ``pages`` table (url, redirect_to). Output one
    row per redirect *source* URL:
    ``(src, final_url, hops:array<string>, is_cycle, abort_kind)`` where
    ``hops`` excludes the start URL, ``abort_kind`` is the first hop's
    filter-rejection kind (colly.go:1463-1465) and cycles stop the chain
    without error (colly.go:1476-1485). URLs that are not redirect sources
    are simply absent (the engine's left join fills identity defaults).

    ``max_redirects`` chained joins over the edge set — each join moves only
    edge-sized skinny rows, so the closure is linear in the number of
    redirect edges, never in crawl size.
    """
    parts = url_parts_udf(F.col("redirect_to"))
    edges = (
        pages.where(F.col("redirect_to").isNotNull())
        .select(F.col("url").alias("e_src"), parts.alias("__p"))
        .select(
            "e_src",
            F.col("__p.canon_url").alias("e_next"),
            F.col("__p.domain").alias("e_domain"),
        )
        .withColumn(
            "e_kind",
            F.when(F.col("e_next").isNull(), F.lit("ErrURLParse")).otherwise(
                static_filter_kind(cfg, F.col("e_next"), F.col("e_domain"))
            ),
        )
        .select("e_src", "e_next", "e_kind")
    )
    state = edges.select(
        F.col("e_src").alias("src"),
        F.col("e_src").alias("cur"),
        F.array().cast("array<string>").alias("hops"),
        F.lit(False).alias("is_cycle"),
        F.lit(None).cast("string").alias("abort_kind"),
        F.lit(False).alias("done"),
    )
    for _ in range(cfg.max_redirects):
        j = state.join(edges, state.cur == edges.e_src, "left")
        active = ~F.col("done") & F.col("e_src").isNotNull()
        bad = active & F.col("e_kind").isNotNull()
        cycle = (
            active
            & F.col("e_kind").isNull()
            & (F.array_contains("hops", F.col("e_next")) | (F.col("e_next") == F.col("src")))
        )
        step = active & F.col("e_kind").isNull() & ~cycle
        state = j.select(
            "src",
            F.when(step, F.col("e_next")).otherwise(F.col("cur")).alias("cur"),
            F.when(step, F.array_append("hops", F.col("e_next")))
            .otherwise(F.col("hops"))
            .alias("hops"),
            (F.col("is_cycle") | cycle).alias("is_cycle"),
            F.coalesce("abort_kind", F.when(bad, F.col("e_kind"))).alias("abort_kind"),
            (F.col("done") | ~active | bad | cycle).alias("done"),
        )
    return state.select(
        "src", F.col("cur").alias("final_url"), "hops", "is_cycle", "abort_kind"
    )


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
