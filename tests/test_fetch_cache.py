"""X2 response cache (http_backend.go:157-200): hits skip the fetch path
(fetch_ms == 0), outputs stay identical to a cache-off run, 5xx are never
cached, expiration refetches."""

import pytest
from pyspark.sql import functions as F

from colly_spark import schemas
from colly_spark.config import CrawlConfig
from colly_spark.engine import Crawler
from colly_spark.fixtures import _html_body, make_seeds


@pytest.fixture(scope="module")
def two_page_cycle(spark):
    """a <-> b link cycle plus a 500 page; with AllowURLRevisit the crawl
    refetches a and b every other round — rounds >= 2 are cache hits."""
    base = "http://c00.test"
    pages = [
        (f"{base}/a", "c00.test", 200, "text/html",
         _html_body(["/b", "/boom"], [], None), None, ["/b", "/boom"], None, [], False, 5, None, None, None),
        (f"{base}/b", "c00.test", 200, "text/html",
         _html_body(["/a"], [], None), None, ["/a"], None, [], False, 5, None, None, None),
        (f"{base}/boom", "c00.test", 500, "text/html", b"oops",
         None, [], None, [], False, 5, None, None, None),
    ]
    t = {
        "pages": spark.createDataFrame(pages, schema=schemas.PAGES).cache(),
        "images": spark.createDataFrame([], schema=schemas.IMAGES),
        "robots": spark.createDataFrame([], schema=schemas.ROBOTS_FIXTURE),
    }
    return base, t


def run(spark, tabs, **cfg_kwargs):
    cfg = CrawlConfig(allow_url_revisit=True, parse_http_error_response=True,
                      shuffle_partitions=4, **cfg_kwargs)
    cr = Crawler(spark, cfg, tabs["pages"], tabs["images"], tabs["robots"])
    return cr.run(make_seeds(["http://c00.test/a"]), max_rounds=5)


def test_cache_hits_skip_fetch_and_match_uncached(spark, two_page_cycle):
    base, tabs = two_page_cycle
    outs = {}
    for cached in (False, True):
        out = run(spark, tabs, fetch_cache_enabled=cached)
        outs[cached] = {
            "visits": [
                (r["fetch_seq"], r["url"], r["status"])
                for r in out["visits"].orderBy("fetch_seq").collect()
            ],
            "errors": sorted(
                (r["url"], r["error_kind"]) for r in out["errors"].collect()
            ),
        }
        if cached:
            rows = out["visits"].orderBy("fetch_seq").collect()
            by_round = {}
            for r in rows:
                by_round.setdefault(r["round"], []).append(r)
            assert max(by_round) >= 2
            # rounds 0-1 are all misses (first sight of a and b)
            assert all(r["fetch_ms"] > 0 for r in by_round[0] + by_round[1])
            # every later GET of a previously CACHED URL is a hit; /boom is
            # a 500 and must keep missing (never cached)
            hits = [r for rnd in by_round for r in by_round[rnd]
                    if rnd >= 2 and not r["url"].endswith("/boom")]
            assert hits and all(r["fetch_ms"] == 0 for r in hits)
            boom = [r for rnd in by_round for r in by_round[rnd]
                    if rnd >= 2 and r["url"].endswith("/boom")]
            assert all(r["fetch_ms"] > 0 for r in boom)
            # 5xx never cached (http_backend.go:177-182)
            cache_rows = out["fetch_cache"].collect()
            assert {r["final_url"] for r in cache_rows} == {f"{base}/a", f"{base}/b"}
            assert all(r["status"] < 500 for r in cache_rows)
    assert outs[True]["visits"] == outs[False]["visits"]
    assert outs[True]["errors"] == outs[False]["errors"]


def test_cache_expiration_refetches(spark, two_page_cycle):
    base, tabs = two_page_cycle
    out = run(spark, tabs, fetch_cache_enabled=True, cache_expiration_rounds=1)
    rows = out["visits"].orderBy("fetch_seq").collect()
    # with a 1-round lifetime, a refetch 2 rounds later is a miss again
    later = [r for r in rows if r["round"] >= 2 and r["url"] != f"{base}/boom"]
    assert later and all(r["fetch_ms"] > 0 for r in later)
