"""WARC reader/serializer: spec-shaped records, gzip members, Spark
round-trip through the binaryFile source."""

import gzip

import pytest
from pyspark.sql import functions as F

from colly_spark.sources import warc


def _mk(uri, body, status=200, ctype="text/html"):
    return warc._one_record(uri, "2026-01-01T00:00:00Z", status, ctype, body, "x1")


def test_iter_records_plain_and_gzip():
    data = _mk("http://a.test/1", b"hello") + _mk(
        "http://a.test/2", b"<html>two</html>", status=404
    )
    for blob in (data, gzip.compress(data)):
        recs = list(warc.iter_warc_records(blob))
        assert [r["target_uri"] for r in recs] == [
            "http://a.test/1", "http://a.test/2"
        ]
        assert recs[0]["payload"] == b"hello"
        assert recs[0]["http_status"] == 200 and recs[1]["http_status"] == 404
        assert recs[0]["content_type"] == "text/html"
        assert recs[0]["warc_type"] == "response"


def test_iter_records_per_member_gzip():
    """Common Crawl layout: each record its own gzip member, members
    concatenated."""
    blob = gzip.compress(_mk("http://a.test/1", b"one")) + gzip.compress(
        _mk("http://a.test/2", b"two")
    )
    recs = list(warc.iter_warc_records(blob))
    assert [r["payload"] for r in recs] == [b"one", b"two"]


def test_iter_records_non_http_block_and_truncation():
    meta = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 7\r\n\r\n"
        b"robots\n\r\n\r\n"
    )
    recs = list(warc.iter_warc_records(meta))
    assert recs[0]["warc_type"] == "warcinfo" and recs[0]["payload"] == b"robots\n"
    with pytest.raises(ValueError, match="truncated"):
        list(warc.iter_warc_records(_mk("http://a.test/1", b"hello")[:-20]))


def test_spark_roundtrip_write_then_read(spark, tmp_path):
    """Rows -> warc_record_bytes -> concatenated per-record-gzip file on
    disk -> read_warc: payloads, URIs, statuses survive; record ids are
    deterministic (content-addressed)."""
    rows = [
        (f"http://d00.test/page/{i}", 200, "text/html",
         f"<html>body {i}</html>".encode())
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "url string, status int, content_type string, body binary"
    )
    out = warc.warc_record_bytes(df, compress=True)
    recs = {r["url"]: r["warc_record"] for r in out.collect()}
    # deterministic: a second run serializes identically
    recs2 = {r["url"]: r["warc_record"] for r in out.collect()}
    assert recs == recs2

    path = tmp_path / "shard-00000.warc.gz"
    with open(path, "wb") as f:
        for u, _, _, _ in rows:
            f.write(recs[u])

    raw = warc.read_warc(spark, str(tmp_path))
    back = [(r["target_uri"], r["http_status"], r["content_type"], r["payload"])
            for r in raw.orderBy("record_offset").collect()]
    assert back == [(u, s, c, b) for u, s, c, b in rows]
    # one binaryFile task per file; the scan+parse itself has no shuffle
    raw.collect()
    plan = raw._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("== Initial Plan ==")[0], plan


def test_crawl_results_to_warc(spark):
    """The engine's results surface serializes to WARC directly — the
    ecosystem hand-off a web-scale crawl needs (Common Crawl layout)."""
    from colly_spark.fixtures import SiteSpec, build_site, site_to_spark

    site = build_site(SiteSpec(n_domains=1, pages_per_domain=4))
    tabs = site_to_spark(spark, site)
    pages = tabs["pages"].select(
        F.col("url"),
        F.lit(200).alias("status"),
        F.lit("text/html").alias("content_type"),
        F.col("body").cast("binary").alias("body"),
    )
    out = warc.warc_record_bytes(pages).select("url", "warc_record").collect()
    whole = b"".join(r["warc_record"] for r in out)
    assert len(list(warc.iter_warc_records(whole))) == len(out)


# ---------------------------------------------------------------------------
# sitemaps
# ---------------------------------------------------------------------------

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://d00.test/page/0</loc><lastmod>2026-01-01</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>http://d00.test/page/1</loc></url>
  <url><lastmod>2026-01-02</lastmod></url>
</urlset>"""

INDEX = b"""<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://d00.test/sitemap-a.xml</loc>
           <lastmod>2026-02-01</lastmod></sitemap>
  <sitemap><loc>http://d00.test/sitemap-b.xml.gz</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap_urlset_and_index():
    from colly_spark.sources.sitemap import parse_sitemap

    is_index, entries = parse_sitemap(URLSET)
    assert not is_index
    assert [e["loc"] for e in entries] == [
        "http://d00.test/page/0", "http://d00.test/page/1"
    ]  # loc-less entry skipped
    assert entries[0]["lastmod"] == "2026-01-01"
    assert entries[0]["changefreq"] == "daily" and entries[0]["priority"] == "0.8"

    is_index, entries = parse_sitemap(gzip.compress(INDEX))  # .xml.gz
    assert is_index
    assert [e["loc"] for e in entries] == [
        "http://d00.test/sitemap-a.xml", "http://d00.test/sitemap-b.xml.gz"
    ]
    # namespace-free documents parse too
    assert parse_sitemap(b"<urlset><url><loc>http://x/</loc></url></urlset>")[1]

    with pytest.raises(ValueError, match="not a sitemap"):
        parse_sitemap(b"<html></html>")
    with pytest.raises(ValueError, match="malformed"):
        parse_sitemap(b"<urlset><url>")


def test_robots_sitemap_directives():
    from colly_spark.robotskit import parse_robots, robots_sitemaps

    body = (
        "Sitemap: http://d00.test/sitemap.xml\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "Sitemap: http://d00.test/sitemap2.xml.gz\n"
    )
    assert robots_sitemaps(body) == [
        "http://d00.test/sitemap.xml", "http://d00.test/sitemap2.xml.gz"
    ]
    # global directive does not disturb group rules
    assert not parse_robots(body).allowed("bot", "/private/x")
    assert robots_sitemaps(None) == []


def test_sitemap_entries_dataframe(spark):
    from colly_spark.sources.sitemap import sitemap_entries

    df = spark.createDataFrame(
        [
            ("http://d00.test/sitemap.xml", URLSET),
            ("http://d00.test/sitemap-index.xml", INDEX),
            ("http://d00.test/broken.xml", b"not xml at all"),
            ("http://d00.test/null.xml", None),
        ],
        "url string, body binary",
    )
    rows = sitemap_entries(df).collect()
    seeds = [r["loc"] for r in rows if r["is_index"] is False]
    children = [r["loc"] for r in rows if r["is_index"]]
    bad = [r for r in rows if r["loc"] is None]
    assert seeds == ["http://d00.test/page/0", "http://d00.test/page/1"]
    assert children == [
        "http://d00.test/sitemap-a.xml", "http://d00.test/sitemap-b.xml.gz"
    ]
    assert len(bad) == 2  # malformed XML + NULL body both quarantine
    assert all("malformed" in r["lastmod"] for r in bad)


def test_cdxj_index(spark, tmp_path):
    """CDXJ rows from a read archive: SURT urlkey, 14-digit timestamp,
    sha1 digest, offsets/lengths that tile the decompressed stream."""
    import hashlib

    data = _mk("http://WWW.Example.test/Path?q=1", b"hello") + _mk(
        "http://a.test/", b"two"
    )
    p = tmp_path / "x.warc"
    p.write_bytes(data)
    rows = (
        warc.cdxj_index(warc.read_warc(spark, str(tmp_path)))
        .orderBy("offset")
        .collect()
    )
    assert rows[0]["urlkey"] == "test,example,www)/path?q=1"
    assert rows[1]["urlkey"] == "test,a)/"
    assert rows[0]["timestamp"] == "20260101000000"
    assert rows[0]["digest"] == hashlib.sha1(b"hello").hexdigest()
    assert rows[0]["offset"] == 0
    assert rows[1]["offset"] == rows[0]["length"]
    assert rows[0]["length"] + rows[1]["length"] == len(data)
    assert rows[0]["status"] == 200 and rows[0]["mime"] == "text/html"
