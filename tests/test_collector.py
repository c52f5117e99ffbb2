"""Collector facade (U1/U2/E2/E3/F7), OnRequest abort parity, selector
detach parity, extensions (U4), COLLY_* env config."""

import pytest
from pyspark.sql import functions as F

from colly_spark.collector import Collector, from_env
from colly_spark.config import CrawlConfig
from colly_spark.engine import Crawler
from colly_spark.extensions import (
    DEFAULT_UA_POOL,
    random_user_agent_col,
    referer_col,
)
from colly_spark.fixtures import SiteSpec, build_site, make_seeds, site_to_spark
from colly_spark.simulator import simulate

SPEC = SiteSpec(n_domains=2, pages_per_domain=8)
SITE = build_site(SPEC)


@pytest.fixture(scope="module")
def tabs(spark):
    return {k: v.cache() for k, v in site_to_spark(spark, SITE).items()}


def test_collector_facade_end_to_end(spark, tabs):
    seen_tables = []
    col = (
        Collector(spark, tabs["pages"], tabs["images"], tabs["robots"],
                  max_depth=3, ignore_robots_txt=False)
        .on_html("a[href]")
        .on_html("figure img + figcaption")
        .on_response(lambda df: seen_tables.append(("visits", df.count())))
        .on_error(lambda df: seen_tables.append(("errors", df.count())))
        .on_scraped(lambda df: seen_tables.append(("results", df.count())))
        .visit("http://d00.test/page/0")
    )
    out = col.wait(max_rounds=6)
    sim = simulate(SITE, make_seeds(["http://d00.test/page/0"]),
                   CrawlConfig(max_depth=3, ignore_robots_txt=False), max_rounds=6)
    eng = [(r["fetch_seq"], r["url"]) for r in out["visits"].orderBy("fetch_seq").collect()]
    assert eng == [(v["fetch_seq"], v["url"]) for v in sim.visits]
    assert dict(seen_tables)["visits"] == len(sim.visits)
    # F7 point lookups
    assert col.has_visited("http://d00.test/page/0")
    assert not col.has_visited("http://d00.test/never-seen")
    # U2 clone: fresh callbacks (selectors reset), same config otherwise
    c2 = col.clone()
    assert c2.cfg.max_depth == 3
    assert not c2.cfg.follow_links and not c2.cfg.extract_images


def test_unsupported_selector_rejected(spark, tabs):
    """Arbitrary CSS selectors register (P3 general engine); syntax outside
    the supported subset fails loudly at registration, not mid-crawl inside
    the parse UDF. Structural pseudo-classes (:nth-child et al.) are part
    of the supported subset since round 4 (:nth-child and the of-type
    family both register); dynamic/UA-state pseudos stay rejected."""
    col = Collector(spark, tabs["pages"], tabs["images"], tabs["robots"])
    with pytest.raises(ValueError, match="unsupported pseudo-class"):
        col.on_html("div.article > p:hover")
    with pytest.raises(ValueError, match="unsupported CSS selector"):
        col.on_html("div.article ! p")
    col.on_html("div.article > p:nth-child(2)")  # structural pseudo registers
    assert col.cfg.html_extractors[-1].selector == "div.article > p:nth-child(2)"
    col.on_html("div.article > p:nth-of-type(2)")  # of-type family too
    assert col.cfg.html_extractors[-1].selector == "div.article > p:nth-of-type(2)"


def test_detach_stops_link_follow_parity(spark, tabs):
    """OnHTMLDetach (E3): with the link selector off, only seeds fetch —
    engine and simulator agree."""
    cfg = CrawlConfig(max_depth=4, ignore_robots_txt=False,
                      follow_links=False, extract_images=True)
    seeds = make_seeds(["http://d00.test/page/0", "http://d01.test/page/1"])
    cr = Crawler(spark, cfg, tabs["pages"], tabs["images"], tabs["robots"])
    out = cr.run(seeds, max_rounds=4)
    sim = simulate(SITE, seeds, cfg, max_rounds=4)
    eng = [(r["fetch_seq"], r["url"]) for r in out["visits"].orderBy("fetch_seq").collect()]
    assert eng == [(v["fetch_seq"], v["url"]) for v in sim.visits]
    assert len(eng) == 2  # nothing followed
    assert out["results"].count() == len(sim.results) > 0  # images still on


def test_on_request_abort_parity(spark, tabs):
    """E2/E4: aborted URLs are seen-marked and budget-counted but never
    fetched; visit order stays equal to the simulator."""
    cfg = CrawlConfig(max_depth=3, ignore_robots_txt=False,
                      abort_url_filters=(r"/page/[24]$",))
    seeds = make_seeds(["http://d00.test/page/0"])
    cr = Crawler(spark, cfg, tabs["pages"], tabs["images"], tabs["robots"])
    out = cr.run(seeds, max_rounds=6)
    sim = simulate(SITE, seeds, cfg, max_rounds=6)
    eng = [(r["fetch_seq"], r["url"]) for r in out["visits"].orderBy("fetch_seq").collect()]
    assert eng == [(v["fetch_seq"], v["url"]) for v in sim.visits]
    assert all("/page/2" not in u and "/page/4" not in u for _, u in eng)
    eng_err = sorted((r["url"], r["error_kind"]) for r in out["errors"].collect())
    sim_err = sorted((e["url"], e["error_kind"]) for e in sim.errors)
    assert eng_err == sim_err
    assert any(k == "AbortedBeforeRequest" for _, k in eng_err)
    # aborted URLs are marked seen (colly builds the Request first)
    eng_seen = {r["url_hash"] for r in out["url_seen"].collect()}
    exp = {
        r["h"]
        for r in spark.createDataFrame(
            [(u, b if b else b"") for u, b in sim.seen_keys], "url string, body binary"
        ).select(F.xxhash64("url", "body").alias("h")).collect()
    }
    assert eng_seen == exp


def _one_page_tabs(spark, url, domain, content_type, body):
    from colly_spark import schemas

    pages = spark.createDataFrame(
        [(url, domain, 200, content_type, body, None, [], None, [], False, 0,
          None, None, None)],
        schema=schemas.PAGES,
    )
    images = spark.createDataFrame([], schema=schemas.IMAGES)
    return pages, images


def test_on_html_elements_table_e2e(spark):
    """TestCollectorOnHTML through the whole engine: general selectors land
    in the elements output table with the HTMLElement surface + Unmarshal
    fields (colly_test.go:684-726)."""
    from tests.test_dom import REF_HTML

    pages, images = _one_page_tabs(
        spark, "http://t.test/html", "t.test", "text/html", REF_HTML)
    col = (
        Collector(spark, pages, images, None)
        .on_html("title", name="title")
        .on_html("p", name="para")
        .unmarshal("body", {"first_class": ("p", "class"),
                            "all_classes": ("p", "class[]")}, name="body")
        .visit("http://t.test/html")
    )
    out = col.wait(max_rounds=2)
    els = sorted(
        ((r["selector"], r["elem_idx"], r["tag"], r["text"],
          dict(r["attrs"] or {}), dict(r["fields"] or {}))
         for r in out["elements"].collect()),
    )
    by_name = {}
    for sel, idx, tag, text, attrs, fields in els:
        by_name.setdefault(sel, []).append((idx, tag, text, attrs, fields))
    assert [t[2] for t in by_name["title"]] == ["Test Page"]
    assert len(by_name["para"]) == 2
    assert all(t[3]["class"] == "description" for t in by_name["para"])
    import json
    assert by_name["body"][0][4]["first_class"] == "description"
    assert json.loads(by_name["body"][0][4]["all_classes"]) == [
        "description", "description"]


def test_on_xml_elements_table_e2e(spark):
    """TestCollectorOnXMLWithXML through the engine (colly_test.go:1607-1653)."""
    from tests.test_dom import REF_XML

    pages, images = _one_page_tabs(
        spark, "http://t.test/xml", "t.test", "application/xml", REF_XML)
    col = (
        Collector(spark, pages, images, None)
        .on_xml("//page/title", name="title")
        .on_xml("//page/paragraph", name="para")
        .visit("http://t.test/xml")
    )
    out = col.wait(max_rounds=2)
    rows = [(r["selector"], r["text"], dict(r["attrs"] or {}))
            for r in out["elements"].collect()]
    assert ("title", "Test Page", {}) in rows
    assert sum(1 for s, _, a in rows
               if s == "para" and a.get("type") == "description") == 2


def test_extensions_columns(spark):
    df = spark.range(100).select(F.xxhash64("id").alias("url_hash"),
                                 F.lit("http://parent").alias("parent_url"))
    out = df.select(
        random_user_agent_col().alias("ua"), referer_col().alias("referer")
    ).collect()
    uas = {r["ua"] for r in out}
    assert uas.issubset(set(DEFAULT_UA_POOL)) and len(uas) > 1
    assert all(r["referer"] == "http://parent" for r in out)
    # deterministic across evaluations
    out2 = df.select(random_user_agent_col().alias("ua")).collect()
    assert [r["ua"] for r in out] == [r["ua"] for r in out2]


def test_from_env():
    cfg = from_env(env={
        "COLLY_USER_AGENT": "ua-x",
        "COLLY_MAX_DEPTH": "7",
        "COLLY_ALLOWED_DOMAINS": "a.test,b.test",
        "COLLY_ALLOW_URL_REVISIT": "true",
        "COLLY_IGNORE_ROBOTSTXT": "false",
        "COLLY_MAX_REQUESTS": "9",
    })
    assert cfg.user_agent == "ua-x"
    assert cfg.max_depth == 7
    assert cfg.allowed_domains == ("a.test", "b.test")
    assert cfg.allow_url_revisit is True
    assert cfg.ignore_robots_txt is False
    assert cfg.max_requests == 9
