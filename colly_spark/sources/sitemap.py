"""sitemaps.org protocol parser: urlset / sitemapindex seed discovery.

A production crawl seeds from sitemaps before (or alongside) link
discovery: robots.txt advertises them (``Sitemap:`` global directives —
:func:`colly_spark.robotskit.robots_sitemaps`), index files fan out to
child sitemaps, and urlset files carry the page URLs with freshness
hints. colly core has no sitemap support; this is protocol surface the
reference leaves to users, implemented from the public sitemaps.org
spec.

:func:`parse_sitemap` is the pure kernel (namespace-tolerant
ElementTree, auto-gunzip). :func:`sitemap_entries` runs it over a
DataFrame of fetched sitemap bodies in Arrow batches — expansion of an
index tree is a driver-side loop only over the INDEX layer (index files
are tiny and bounded); the urlset layer, which carries the volume,
explodes distributed.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)

SITEMAP_ENTRIES = StructType(
    [
        StructField("sitemap_url", StringType()),
        StructField("is_index", BooleanType()),
        StructField("loc", StringType()),
        StructField("lastmod", StringType()),
        StructField("changefreq", StringType()),
        StructField("priority", StringType()),
    ]
)


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(data: bytes | str) -> tuple[bool, list[dict]]:
    """(is_index, entries) from one sitemap document.

    Handles gzip payloads (.xml.gz), any/missing XML namespace, and both
    root forms: ``<urlset><url>...`` (is_index=False; entries carry loc /
    lastmod / changefreq / priority) and ``<sitemapindex><sitemap>...``
    (is_index=True; entries carry loc / lastmod). Entries without a
    ``<loc>`` are skipped. Malformed XML raises ``ValueError`` — a broken
    sitemap should be loud, the caller quarantines."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    try:
        root = ET.fromstring(data)
    except ET.ParseError as e:
        raise ValueError(f"malformed sitemap XML: {e}") from None
    kind = _localname(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap document: root <{kind}>")
    is_index = kind == "sitemapindex"
    want = "sitemap" if is_index else "url"
    entries = []
    for child in root:
        if _localname(child.tag) != want:
            continue
        fields: dict[str, str | None] = {
            "loc": None, "lastmod": None, "changefreq": None, "priority": None,
        }
        for sub in child:
            name = _localname(sub.tag)
            if name in fields and sub.text is not None:
                fields[name] = sub.text.strip()
        if fields["loc"]:
            entries.append(fields)
    return is_index, entries


def sitemap_entries(
    sitemaps: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Explode fetched sitemap documents into SITEMAP_ENTRIES rows —
    urlset rows are the crawl seeds (join ``is_index`` rows back through
    the fetcher to descend an index tree). Arrow-batched; malformed
    documents yield a single row with ``loc`` NULL and the error in
    ``lastmod`` (quarantine-and-count, the multimodal decode convention)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SITEMAP_ENTRIES.fields]
        for pdf in batches:
            rows = []
            for u, b in zip(pdf[url_col], pdf[body_col]):
                try:
                    if b is None:
                        raise ValueError("malformed sitemap XML: null body")
                    is_index, entries = parse_sitemap(
                        bytes(b) if not isinstance(b, str) else b
                    )
                except ValueError as e:
                    rows.append(
                        {"sitemap_url": u, "is_index": None, "loc": None,
                         "lastmod": str(e), "changefreq": None,
                         "priority": None}
                    )
                    continue
                for ent in entries:
                    rows.append({"sitemap_url": u, "is_index": is_index, **ent})
            yield pd.DataFrame(rows, columns=cols)

    return sitemaps.select(url_col, body_col).mapInPandas(
        parse, SITEMAP_ENTRIES
    )
