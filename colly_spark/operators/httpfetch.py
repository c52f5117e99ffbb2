"""X1 real-fetch seam: an HTTP fetcher drop-in for the synthetic content join.

The engine's fetch step is a left join of the dispatch batch against the
pages fixture (engine.py, "X1 content join") — the documented seam where a
real fetcher belongs. :class:`HttpFetcher` IS that fetcher: it turns each
dispatch row's ``__effective_url`` into the same five page columns
(status, content type, body, base href, serve-delay) by issuing real GETs
over a socket from an Arrow-batched pandas UDF, so the rest of the round
DAG — politeness, dedup, redirect closure, parse, cache write-back — is
untouched and identical between the two fetch modes.

Reference behaviors mirrored (http_backend.go:202-271 ``Do``):
- request timeout (httpBackend's client timeout): socket errors and
  timeouts yield NULL page columns — the engine classifies them exactly
  like a missing fixture row (a fetch error, OnError in colly);
- MaxBodySize applied AT THE WIRE via a capped read (io.LimitReader,
  http_backend.go:235-237) — the engine's downstream substring cap is
  then a no-op;
- redirects are NOT followed by the fetcher (the engine resolves the
  redirect closure upstream and dispatches final URLs; colly's
  checkRedirectFunc runs per hop inside its Client, our hops are
  plan-side) — a 3xx response is recorded as-is like any other status;
- identity transfer-encoding: no Accept-Encoding is sent and response
  bytes are delivered unmodified, so the parse layer's gzip sniffing
  (P2, http_backend.go:198 parity) sees the same bytes as the synthetic
  join path.

Loopback-fixture convention (tests/test_httpfetch.py serves it): the test
server carries fixture metadata that real pages embed in-band as response
headers — ``X-Serve-Delay-Ms`` (the fetch-time model input column),
``X-Base-Href`` (the fixture's out-of-band base href), and
``X-Fixture-Miss: 1`` on unknown routes, which the fetcher maps to the
synthetic join's left-miss (all-NULL page columns) so both paths classify
an unroutable URL identically.
"""

from __future__ import annotations

import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

RESP_SCHEMA = StructType(
    [
        StructField("page_status", IntegerType()),
        StructField("page_content_type", StringType()),
        StructField("page_body", BinaryType()),
        StructField("page_base_href", StringType()),
        StructField("serve_delay_ms", IntegerType()),
    ]
)

_MISS = (None, None, None, None, None)


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    """3xx responses raise HTTPError instead of being followed — the engine
    resolves redirect chains plan-side (X3) and dispatches final URLs."""

    def redirect_request(self, req, fp, code, msg, headers, newurl):  # noqa: D102
        return None


def _read_capped(resp, max_body_size: int) -> bytes:
    # io.LimitReader parity: never pull more than the cap off the wire
    return resp.read(max_body_size) if max_body_size > 0 else resp.read()


def _fetch_one(url, rewrite_to, timeout_s, max_body_size, user_agent):
    if url is None:
        return _MISS
    target = url
    headers = {"User-Agent": user_agent}
    if rewrite_to:
        # route to the test/loopback server, preserving the logical host in
        # the Host header (http.client skips its auto-Host when one is given)
        sp = urlsplit(url)
        pq = sp.path or "/"
        if sp.query:
            pq += "?" + sp.query
        target = rewrite_to.rstrip("/") + pq
        headers["Host"] = sp.netloc
    opener = urllib.request.build_opener(_NoRedirect)
    req = urllib.request.Request(target, headers=headers)
    try:
        with opener.open(req, timeout=timeout_s) as resp:
            code, hdrs = resp.status, resp.headers
            body = _read_capped(resp, max_body_size)
    except urllib.error.HTTPError as e:  # any non-2xx RESPONSE is a response
        code, hdrs = e.code, e.headers
        try:
            body = _read_capped(e, max_body_size)
        finally:
            e.close()
    except (urllib.error.URLError, TimeoutError, OSError):
        # timeout / refused / DNS — colly's err != nil: the engine sees the
        # same NULL page columns as a fixture-table left-join miss
        return _MISS
    delay = None
    if rewrite_to:
        # fixture-protocol headers are only meaningful from the loopback
        # fixture server; a real origin emitting a header that happens to
        # be named X-Fixture-Miss must not silently drop its page, and a
        # malformed X-Serve-Delay-Ms must not crash the task
        if hdrs.get("X-Fixture-Miss"):
            return _MISS
        raw_delay = hdrs.get("X-Serve-Delay-Ms")
        if raw_delay is not None:
            try:
                delay = int(raw_delay)
            except ValueError:
                delay = None
    return (
        int(code),
        hdrs.get("Content-Type"),
        body,
        hdrs.get("X-Base-Href") if rewrite_to else None,
        delay,
    )


def _fetch_batch(urls: pd.Series, rewrite_to, timeout_s, max_body_size,
                 user_agent, max_workers) -> pd.DataFrame:
    # per-partition concurrency (colly's Async mode); global politeness and
    # per-domain parallelism were already enforced by the dispatch window
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        rows = list(
            pool.map(
                lambda u: _fetch_one(u, rewrite_to, timeout_s, max_body_size,
                                     user_agent),
                urls,
            )
        )
    return pd.DataFrame(rows, columns=[f.name for f in RESP_SCHEMA.fields])


class HttpFetcher:
    """Callable fetch stage: ``Crawler(..., fetcher=HttpFetcher(...))``.

    Appends the five page columns to the dispatch frame via one
    Arrow-batched pandas UDF over ``__effective_url`` — no extra shuffle,
    no join; bodies materialize exactly where the synthetic join would
    have produced them.

    ``rewrite_to``: optional base URL (scheme://host:port) all requests are
    routed to, with the logical host preserved in the Host header — the
    loopback-test hook. ``None`` fetches URLs as-is (production shape).
    """

    def __init__(
        self,
        rewrite_to: str | None = None,
        timeout_s: float = 10.0,
        max_body_size: int = 0,
        user_agent: str = "colly - https://github.com/gocolly/colly",
        max_workers: int = 16,
    ):
        self.rewrite_to = rewrite_to
        self.timeout_s = timeout_s
        self.max_body_size = max_body_size
        self.user_agent = user_agent
        self.max_workers = max_workers

    def __call__(self, d: DataFrame) -> DataFrame:
        args = (self.rewrite_to, self.timeout_s, self.max_body_size,
                self.user_agent, self.max_workers)

        @F.pandas_udf(RESP_SCHEMA)
        def fetch_udf(urls: pd.Series) -> pd.DataFrame:
            return _fetch_batch(urls, *args)

        return (
            d.withColumn("__resp", fetch_udf(F.col("__effective_url")))
            .select("*", "__resp.*")
            .drop("__resp")
        )
