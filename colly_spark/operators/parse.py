"""P1-P11: content-type gating, HTML parsing, link/image extraction (the
reference's OnHTML dispatch, colly.go:1179-1239).

The extraction is an Arrow-vectorized pandas UDF: parse each HTML body once
per row (stdlib ``html.parser`` — lxml/selectolax are not in this container),
evaluate the registered extractors, and return
``array<struct<sel_idx, elem_idx, kind, value, extra>>`` which the engine
explodes — exactly SURVEY.md §2 P3's "parse once, explode matches" shape.

Extractors implemented (the image+caption crawl surface):
- sel 0: ``a[href]``      -> kind 'link',  value = absolutized href
  (absolutization against <base href> or the final request URL happens here,
  mirroring colly.go:1209-1218 + request.go:101-117)
- sel 1: ``img[src] + figcaption`` -> kind 'image', value = image_id
  (``img://<id>`` refs), extra = figcaption text (P9 Unmarshal-style
  declarative pair extraction, unmarshal.go:51-223)
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from colly_spark.urlkit import absolutize

MATCH_SCHEMA = ArrayType(
    StructType(
        [
            StructField("sel_idx", IntegerType()),
            StructField("elem_idx", IntegerType()),
            StructField("kind", StringType()),
            StructField("value", StringType()),
            StructField("extra", StringType()),
        ]
    )
)

HTML_MEDIA_TYPES = ("text/html", "application/xhtml+xml")  # colly.go:1186-1203


def is_html_content_type(ct: str | None) -> bool:
    if not ct:
        return False
    return ct.split(";")[0].strip().lower() in HTML_MEDIA_TYPES


class _Extractor(HTMLParser):
    """One-pass extractor: base href, anchor hrefs, img/figcaption pairs."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.base_href: str | None = None
        self.links: list[str] = []
        self.images: list[list] = []  # [src, caption]
        self._pending_img: str | None = None
        self._in_figcaption = False
        self._caption_parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "base" and self.base_href is None and a.get("href"):
            self.base_href = a["href"]
        elif tag == "a" and a.get("href") is not None:
            self.links.append(a["href"])
        elif tag == "img" and a.get("src"):
            self._pending_img = a["src"]
        elif tag == "figcaption":
            self._in_figcaption = True
            self._caption_parts = []

    handle_startendtag = handle_starttag

    def handle_endtag(self, tag):
        if tag == "figcaption":
            self._in_figcaption = False
            caption = "".join(self._caption_parts).strip()  # ChildText trims
            if self._pending_img is not None:
                self.images.append([self._pending_img, caption])
                self._pending_img = None
        elif tag == "figure" and self._pending_img is not None:
            self.images.append([self._pending_img, None])  # img w/o caption
            self._pending_img = None

    def handle_data(self, data):
        if self._in_figcaption:
            self._caption_parts.append(data)


def extract_one(body: bytes | None, content_type: str | None, page_url: str | None,
                base_href_col: str | None, follow_links: bool = True,
                extract_images: bool = True) -> list[tuple]:
    """Extract matches from one page. Pure function — used by the pandas UDF
    and unit tests alike. ``follow_links`` / ``extract_images`` mirror which
    OnHTML selectors are registered (E2/E3: colly.go:929-1051, detach
    colly.go:1008-1029)."""
    if body is None or not is_html_content_type(content_type):
        return []
    if not follow_links and not extract_images:
        return []
    try:
        text = bytes(body).decode("utf-8", errors="replace")
    except Exception:
        return []
    p = _Extractor()
    try:
        p.feed(text)
        p.close()
    except Exception:
        return []
    if p._pending_img is not None:  # img not closed by figure/figcaption
        p.images.append([p._pending_img, None])
    base = base_href_col or p.base_href or page_url
    if base and p.base_href and page_url:
        # <base href> itself may be relative to the document URL
        base = absolutize(page_url, p.base_href) or page_url
    out: list[tuple] = []
    if follow_links:
        for i, href in enumerate(p.links):
            absu = absolutize(base, href)
            if absu is None:  # fragment-only (request.go:102-104)
                continue
            out.append((0, i, "link", absu, None))
    if extract_images:
        for i, (src, caption) in enumerate(p.images):
            image_id = src[6:] if src.startswith("img://") else src
            out.append((1, i, "image", image_id, caption))
    return out


def make_extract_udf(follow_links: bool = True, extract_images: bool = True):
    from pyspark.sql import functions as F

    def extract_matches_pd(
        body: pd.Series, content_type: pd.Series, page_url: pd.Series,
        base_href: pd.Series,
    ) -> pd.Series:
        return pd.Series(
            [
                extract_one(b, ct, u, bh, follow_links, extract_images)
                for b, ct, u, bh in zip(body, content_type, page_url, base_href)
            ],
            dtype="object",
        )

    return F.pandas_udf(extract_matches_pd, MATCH_SCHEMA)
