#!/usr/bin/env python
"""bench.py — headline crawl throughput + per-query timings (one JSON line).

Headline: frontier URLs/sec (fetch-scheduled) for a crawl over a synthetic
web generated *distributedly* (never materialized on the driver), seeded
with every page URL — the steady-state shape of a big frontier batch, which
is what the 10^10 design point stresses. Queries from ``__spark_entry__``
run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1); each is fully
materialized through the noop sink (count() would let Catalyst prune work).

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
     BENCH_DOMAINS / BENCH_PAGES_PER_DOMAIN to resize the crawl fixture.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _cpu_times() -> tuple[int, int] | None:
    """(steal_ticks, total_ticks) from /proc/stat — None off-Linux."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):  # pragma: no cover
        return None


def steal_pct_since(before: tuple[int, int] | None) -> float | None:
    """Hypervisor CPU-steal %% across the window since ``before``.

    The host shows 1-12%% steal varying by the hour (BENCH/BASELINE.md) —
    enough to move the sf0.1 crawl number 3x between rounds. Embedding the
    measured steal in the bench JSON lets a reader judge the number against
    host conditions instead of re-adjudicating by hand (VERDICT r3 item 10).
    """
    after = _cpu_times()
    if before is None or after is None:
        return None
    dt = after[1] - before[1]
    return round(100.0 * (after[0] - before[0]) / dt, 2) if dt > 0 else None


def wake_rt_per_sec(n: int = 4000) -> int:
    """Thread wake round-trips/sec (futex ping-pong) — host-health probe.

    Two threads alternate on Events; each cycle is a futex sleep+wake pair.
    A healthy host sustains tens of thousands of round-trips/sec; a
    hypervisor-degraded scheduler drops to ~3k (measured on this box:
    identical code+fixture ran 141s in one window and >600s in another, with
    CPU-steal% near zero BOTH times — wake latency, not steal, was the
    difference; pure-CPU microbenches stayed flat). Spark's executor
    threads, Arrow python<->JVM handoffs, and GC all ride this path, so the
    probe is embedded in the bench JSON next to steal_pct to let a reader
    judge a throughput number against host conditions.
    """
    import threading

    e1, e2 = threading.Event(), threading.Event()

    def side(mine: threading.Event, other: threading.Event) -> None:
        for _ in range(n):
            mine.wait()
            mine.clear()
            other.set()

    t1 = threading.Thread(target=side, args=(e1, e2), daemon=True)
    t2 = threading.Thread(target=side, args=(e2, e1), daemon=True)
    t0 = time.time()
    t1.start()
    t2.start()
    e1.set()
    t1.join(timeout=60)
    t2.join(timeout=5)
    return int(n / (time.time() - t0))


def crawl_bench(spark, n_domains: int, pages_per_domain: int) -> dict:
    from pyspark.sql import functions as F

    from colly_spark import schemas
    from colly_spark.config import CrawlConfig, LimitRule
    from colly_spark.engine import Crawler
    from colly_spark.fixtures import SiteSpec, build_images, build_pages_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spec = SiteSpec(
        n_domains=n_domains,
        pages_per_domain=pages_per_domain,
        with_specials=True,
        image_pool_per_domain=4,
        image_w=16,
        image_h=12,
        links_per_page=3,
        domain_offset=int(os.environ.get("BENCH_DOMAIN_OFFSET", "0")),
    )
    pages = build_pages_spark(spark, spec).persist()
    if os.environ.get("BENCH_NO_COOKIE_PAGES"):
        # diagnostic knob: exclude the cookie scenario pages so the engine's
        # cookie machinery stays fully off
        pages = pages.where(
            F.col("set_cookie").isNull() & F.col("require_cookie").isNull()
        ).persist()
    n_pages = pages.count()  # materialize fixture outside the timed window
    images = spark.createDataFrame(
        [tuple(i.values()) for i in build_images(spec)], schema=schemas.IMAGES
    )
    robots = spark.createDataFrame(
        [(spec.host(d), "User-agent: *\nDisallow: /disallowed\n", False)
         for d in range(n_domains)],
        schema=schemas.ROBOTS_FIXTURE,
    )
    # seeds = every regular page URL, distributed; seed_seq derived from the
    # (domain, page) indexes — deterministic total order with NO global window
    stride = pages_per_domain * max(spec.hot_domain_factor, 1) + 64
    seeds = pages.where(F.col("url").rlike(r"/page/\d+$")).select(
        (
            F.regexp_extract("url", r"http://d(\d+)\.test", 1).cast("long") * stride
            + F.regexp_extract("url", r"/page/(\d+)$", 1).cast("long")
        ).alias("seed_seq"),
        F.col("url"),
        F.lit("GET").alias("method"),
        F.lit(None).cast("binary").alias("body"),
        F.create_map().cast("map<string,string>").alias("ctx"),
    )
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    # politeness budget is part of the JOB, not the cluster: hold the rule
    # constant across parallelism levels so N-vs-4N runs are the same crawl
    rule_par = int(os.environ.get("BENCH_RULE_PARALLELISM", "16"))
    # multi-process scaling mode (bench_multiproc.py): this process owns the
    # domains with d % n_shards == shard — domain-hash sharding, the same
    # partitioning a sharded production crawl uses; cross-shard links fall
    # to the AllowedDomains filter exactly like off-site links
    allowed: tuple = ()
    shard_env = os.environ.get("BENCH_DOMAIN_SHARD") or ""
    if "/" in shard_env:
        k, n = (int(x) for x in shard_env.split("/"))
        allowed = tuple(spec.host(d) for d in range(n_domains) if d % n == k)
        seeds = seeds.where(
            F.regexp_extract("url", r"http://d(\d+)\.test", 1).cast("long") % n == k
        )
    cfg = CrawlConfig(
        max_depth=2,
        ignore_robots_txt=False,
        allowed_domains=allowed,
        limit_rules=(LimitRule(domain_glob="*.test", delay_ms=0, parallelism=rule_par),),
        shuffle_partitions=shuffle,
        seen_bloom_enabled=os.environ.get("BENCH_BLOOM", "1") != "0",
        # BENCH_BLOOM_MIN_SEEN=0 arms the Bloom path from round 0 (the
        # committed under-load evidence for the cogroup/broadcast probe);
        # BENCH_BLOOM_DELIVERY=cogroup forces the partition-local 10^10
        # delivery mode regardless of filter-set size
        seen_bloom_min_seen=int(
            os.environ.get("BENCH_BLOOM_MIN_SEEN",
                           str(CrawlConfig.seen_bloom_min_seen))
        ),
        seen_bloom_delivery=os.environ.get("BENCH_BLOOM_DELIVERY", "auto"),
    )
    # BENCH_CHECKPOINT_DIR: run the crawl in disk (resumable) mode — the
    # configuration a production 10^10 crawl would actually run; a *.db
    # path selects the sqlite backend. Cleared between runs by the caller.
    ckpt = os.environ.get("BENCH_CHECKPOINT_DIR") or None
    crawler = Crawler(spark, cfg, pages, images, robots, checkpoint_dir=ckpt)
    wake0 = wake_rt_per_sec()
    cpu0 = _cpu_times()
    t0 = time.time()
    out = crawler.run(seeds, max_rounds=3)
    n_visits = out["visits"].count()
    n_results = out["results"].count()
    wall = time.time() - t0
    steal = steal_pct_since(cpu0)
    for s in crawler.stats:
        print(s, file=sys.stderr)
    pages.unpersist()
    return {
        "pages": n_pages,
        "visits": n_visits,
        "results": n_results,
        "wall_s": round(wall, 2),
        "urls_per_sec": round(n_visits / wall, 1),
        "steal_pct": steal,
        "wake_rt_per_sec": {"before": wake0, "after": wake_rt_per_sec()},
        "mode": ("sqlite" if ckpt.endswith((".db", ".sqlite")) else "disk")
        if ckpt else "memory",
    }


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # local[32] runs driver+executors in ONE JVM: the default heap thrashes
    # GC once fixture + state caches accumulate (measured ~20% of task time)
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    import __spark_entry__ as entrymod
    from colly_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        "colly-spark-bench",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", 0)) or None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_domains = int(os.environ.get("BENCH_DOMAINS", "100"))
    ppd = int(os.environ.get("BENCH_PAGES_PER_DOMAIN", "1000"))
    crawl = crawl_bench(spark, n_domains, ppd)

    qtimes: dict[str, float] = {}
    items = {} if os.environ.get("BENCH_SKIP_QUERIES") else entrymod.queries()
    qcpu0 = _cpu_times()
    for name, fn in items.items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        qtimes[name] = round(time.time() - t0, 3)
    q_steal = steal_pct_since(qcpu0)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "frontier_urls_per_sec_fetch_scheduled",
                "value": crawl["urls_per_sec"],
                "unit": "urls/sec",
                "crawl": crawl,
                "queries": qtimes,
                "steal_pct": crawl.get("steal_pct"),
                "queries_steal_pct": q_steal,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
