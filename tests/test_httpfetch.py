"""X1 fetch-seam proof: the engine produces IDENTICAL crawls whether page
content arrives via the synthetic fixture join or via real HTTP GETs from a
loopback server (the reference's own test pattern — colly_test.go:71-318
serves its fixtures from httptest.NewServer).

The loopback server serves the same Site the fixture tables are built from;
fixture metadata that real pages carry out-of-band rides response headers
(X-Serve-Delay-Ms, X-Base-Href), and unknown routes answer X-Fixture-Miss
so both fetch modes classify an unroutable URL identically.
"""

from __future__ import annotations

import threading
import time
from collections import Counter
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlsplit

import pytest
from pyspark.sql import functions as F

from colly_spark.config import CrawlConfig
from colly_spark.engine import Crawler
from colly_spark.fixtures import SiteSpec, build_site, make_seeds, site_to_spark
from colly_spark.operators.httpfetch import HttpFetcher


def _routes_of(site) -> dict:
    routes = {}
    for p in site.pages:
        sp = urlsplit(p["url"])
        pq = sp.path or "/"
        if sp.query:
            pq += "?" + sp.query
        routes[(sp.netloc, pq)] = p
    return routes


class _FixtureHandler(BaseHTTPRequestHandler):
    def log_message(self, *args):  # keep pytest output clean
        pass

    def do_GET(self):
        if self.path == "/__slow__":  # the timeout route (never in a site)
            time.sleep(2.0)
            body = b"slow"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        host = (self.headers.get("Host") or "").strip()
        page = self.server.routes.get((host, self.path))
        if page is None:
            self.send_response(404)
            self.send_header("X-Fixture-Miss", "1")
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        body = page["body"] or b""
        self.send_response(page["status"])
        if page["content_type"]:
            self.send_header("Content-Type", page["content_type"])
        if page["redirect_to"]:
            self.send_header("Location", page["redirect_to"])
        if page["base_href"]:
            self.send_header("X-Base-Href", page["base_href"])
        self.send_header("X-Serve-Delay-Ms", str(page["serve_delay_ms"]))
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def loopback():
    site = build_site(SiteSpec(n_domains=2, pages_per_domain=8))
    # cookie/header gates live server-side over real HTTP (the jar rides the
    # Cookie header) — out of scope for the drop-in fetcher, and the engine
    # loudly rejects the combination (test below); neutralize them here so
    # the rest of the specials (redirect chains, cycles, 404/500, gzip XML,
    # robots paths, deep links) are all exercised over the socket
    for p in site.pages:
        p["set_cookie"] = p["require_cookie"] = p["require_header"] = None
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FixtureHandler)
    srv.routes = _routes_of(site)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield site, f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _crawl(spark, site, fetcher=None, **cfg_kw):
    tabs = site_to_spark(spark, site)
    cfg = CrawlConfig(max_depth=3, ignore_robots_txt=False,
                      shuffle_partitions=8, **cfg_kw)
    cr = Crawler(spark, cfg, tabs["pages"], tabs["images"], tabs["robots"],
                 fetcher=fetcher)
    out = cr.run(
        make_seeds(["http://d00.test/page/0", "http://d01.test/page/0"]),
        max_rounds=10,
    )
    visits = [
        (r["fetch_seq"], r["url"], r["depth"], r["round"])
        for r in out["visits"].orderBy("fetch_seq").collect()
    ]
    errors = Counter((r["url"], r["error_kind"]) for r in out["errors"].collect())
    seen = {r["url_hash"] for r in out["url_seen"].collect()}
    results = sorted(
        (r["url"], r["image_id"], r["caption"], bool(r["payload_ok"]))
        for r in out["results"].collect()
    )
    return visits, errors, seen, results


def test_http_fetcher_parity(spark, loopback):
    """Visits, errors, url_seen and results equal between the synthetic-join
    path and the real-socket path on the same site — redirect chains, error
    statuses and gzip bodies included."""
    site, base = loopback
    syn = _crawl(spark, site)
    real = _crawl(
        spark, site, fetcher=HttpFetcher(rewrite_to=base, max_workers=8)
    )
    assert real[0] == syn[0], "visit order differs between fetch modes"
    assert real[1] == syn[1], "error rows differ between fetch modes"
    assert real[2] == syn[2], "url_seen set differs between fetch modes"
    assert real[3] == syn[3], "results differ between fetch modes"
    assert len(syn[0]) > 10  # non-trivial crawl


def test_http_fetcher_parity_with_body_cap(spark, loopback):
    """MaxBodySize over a real socket: the fetcher caps at the wire
    (io.LimitReader parity, http_backend.go:235-237) and the crawl still
    equals the synthetic path, whose cap is the downstream substring."""
    site, base = loopback
    cap = 180  # small enough to cut some link lists mid-body
    syn = _crawl(spark, site, max_body_size=cap)
    real = _crawl(
        spark, site,
        fetcher=HttpFetcher(rewrite_to=base, max_body_size=cap, max_workers=8),
        max_body_size=cap,
    )
    assert real == syn
    # and the cap genuinely changed the crawl vs the uncapped run
    assert syn != _crawl(spark, site)


def test_http_fetcher_timeout_and_wire_cap(spark, loopback):
    """Timeout and body cap exercised directly over the socket: a slow route
    times out to NULL page columns (the engine's fetch-error shape), a
    capped fetch returns exactly max_body_size bytes."""
    site, base = loopback
    p0 = next(p for p in site.pages if p["url"] == "http://d00.test/page/0")
    df = spark.createDataFrame(
        [("http://d00.test/__slow__",), ("http://d00.test/page/0",)],
        "__effective_url string",
    )
    fast = HttpFetcher(rewrite_to=base, timeout_s=0.3, max_workers=2)
    rows = {r["__effective_url"]: r for r in fast(df).collect()}
    assert rows["http://d00.test/__slow__"]["page_status"] is None
    assert rows["http://d00.test/page/0"]["page_status"] == 200
    assert rows["http://d00.test/page/0"]["serve_delay_ms"] == p0["serve_delay_ms"]

    capped = HttpFetcher(rewrite_to=base, max_body_size=5, max_workers=2)
    r2 = capped(df.where(F.col("__effective_url").endswith("/page/0"))).collect()[0]
    assert len(r2["page_body"]) == 5


def test_fetcher_rejects_cookie_gated_fixture(spark, loopback):
    """The engine loudly refuses fetcher mode when the fixture carries
    cookie/header-gated pages (those gates live server-side on real HTTP)."""
    _, base = loopback
    site = build_site(SiteSpec(n_domains=1, pages_per_domain=4))
    tabs = site_to_spark(spark, site)  # specials include /set_cookie et al.
    with pytest.raises(NotImplementedError, match="fetcher"):
        Crawler(spark, CrawlConfig(max_depth=2, shuffle_partitions=8),
                tabs["pages"], tabs["images"], tabs["robots"],
                fetcher=HttpFetcher(rewrite_to=base))


def test_production_shape_ignores_fixture_headers(loopback):
    """With rewrite_to=None (real-origin shape) the fixture-protocol headers
    are untrusted input: X-Fixture-Miss must not drop the page, a malformed
    X-Serve-Delay-Ms must not crash the task, and X-Base-Href is not
    honored (a real origin steering link resolution via a custom header)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    import threading

    from colly_spark.operators.httpfetch import _fetch_one

    class _Hostile(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = b"<html>real page</html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("X-Fixture-Miss", "1")
            self.send_header("X-Serve-Delay-Ms", "fast")
            self.send_header("X-Base-Href", "http://evil.test/")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Hostile)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/p"
        status, ct, body, base_href, delay = _fetch_one(
            url, None, 2.0, 1 << 20, "ua")
        assert status == 200 and body == b"<html>real page</html>"
        assert base_href is None and delay is None
        # fixture shape (rewrite_to set) still honors the protocol headers
        status2, *_rest = _fetch_one(
            "http://d00.test/p", f"http://127.0.0.1:{srv.server_port}",
            2.0, 1 << 20, "ua")
        assert status2 is None  # X-Fixture-Miss -> miss tuple
    finally:
        srv.shutdown()
