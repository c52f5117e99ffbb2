"""U4: ports of the reference's ``extensions/`` package as request-column
helpers (extensions/random_user_agent.go, extensions/referer.go,
extensions/url_length_filter.go).

Colly's extensions mutate each Request inside an OnRequest callback; here
they are column expressions applied to the frontier/dispatch frame — the
set-oriented equivalent (one vectorized JVM expression instead of a
per-request callback).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# extensions/random_user_agent.go:8-25 ships a fixed UA pool; any pool works
DEFAULT_UA_POOL = (
    "Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/125.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/124.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 14_4) Version/17.4 Safari/605.1.15",
    "colly-spark/0.1",
)


def random_user_agent_col(
    uas: tuple[str, ...] = DEFAULT_UA_POOL, seed: int = 42,
    url_hash: Column | None = None,
) -> Column:
    """Deterministic 'random' UA per request (extensions/random_user_agent.go:
    27-39 draws rand per request; we key on (seed, url_hash) so reruns and
    resumes assign identical UAs — randomness must never depend on task
    scheduling)."""
    h = url_hash if url_hash is not None else F.col("url_hash")
    idx = F.pmod(F.xxhash64(F.lit(seed), h), F.lit(len(uas)))
    expr = F.lit(uas[0])
    for i in range(1, len(uas)):
        expr = F.when(idx == i, F.lit(uas[i])).otherwise(expr)
    return expr


def referer_col(parent_url: Column | None = None) -> Column:
    """Referer = the response URL that produced this request
    (extensions/referer.go:10-19 carries it via ctx; the frontier carries
    ``parent_url`` natively)."""
    return parent_url if parent_url is not None else F.col("parent_url")


def url_length_ok(limit: int, url: Column | None = None) -> Column:
    """extensions/url_length_filter.go:8-14 — also available declaratively
    as ``CrawlConfig.max_url_length`` (F3d, enforced in requestCheck)."""
    u = url if url is not None else F.col("canon_url")
    return F.length(u) <= F.lit(limit)
