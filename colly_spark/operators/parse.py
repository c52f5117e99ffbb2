"""P1-P9: content gating/sniffing, gzip, HTML/XML parsing, extraction (the
reference's OnHTML/OnXML dispatch, colly.go:1179-1317).

The extraction is an Arrow-vectorized pandas UDF: parse each body once per
row into one DOM tree (:mod:`colly_spark.dom` — lxml/selectolax are not in
this container), evaluate every registered extractor, and return
``array<struct<sel_idx, elem_idx, kind, value, extra, tag, text, attrs,
fields>>`` which the engine explodes — exactly SURVEY.md §2 P3's "parse
once, explode matches" shape.

Extractor surface:
- built-in sel 0: ``a[href]`` -> kind 'link', value = absolutized href
  (absolutization against <base href> or the final request URL mirrors
  colly.go:1209-1218 + request.go:101-117);
- built-in sel 1: ``figure img + figcaption`` -> kind 'image', value =
  image_id (``img://<id>`` refs), extra = figcaption ChildText;
- general extractors (sel 2+): any CSS selector or XPath
  (:class:`colly_spark.config.ExtractorSpec`) with colly's HTMLElement
  surface — Attr (htmlelement.go:56-63), Text, ChildText(s)
  (htmlelement.go:67-80), ChildAttr(s) (htmlelement.go:84-101) — and
  declarative Unmarshal field schemas (unmarshal.go:51-223): each
  ``(field, child_selector, attr-or-None)`` compiles into one entry of the
  match's ``fields`` map. 'follow' extractors emit kind 'link' and feed the
  frontier exactly like the built-in.

Content gates:
- HTML (colly.go:1186-1203): header Content-Type, sniffed from body magic
  when missing (Go http.DetectContentType subset); mediatype must be
  text/html or application/xhtml+xml.
- XML (colly.go:1249-1259): ct contains "html" (HTML-mode XPath) OR
  mediatype in {text/xml, application/xml, *+xml} OR path ends
  .xml/.xml.gz (XML-mode).
- gzip (http_backend.go:238-261): bodies carrying the RFC-1952 magic are
  gunzipped before parsing when Content-Encoding/Content-Type say gzip or
  the path ends .xml.gz (the body *column* stays compressed — only the
  parse sees decoded bytes; colly decodes at fetch, an observable-equal
  placement since nothing downstream reads raw bytes).
"""

from __future__ import annotations

import gzip as _gzip
import io
import re
import xml.etree.ElementTree as ET
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from colly_spark import dom
from colly_spark.dom import IMPLICIT_CLOSERS, VOID_ELEMENTS
from colly_spark.urlkit import absolutize

MATCH_SCHEMA = ArrayType(
    StructType(
        [
            StructField("sel_idx", IntegerType()),
            StructField("elem_idx", IntegerType()),
            StructField("kind", StringType()),
            StructField("value", StringType()),
            StructField("extra", StringType()),
            StructField("tag", StringType()),
            StructField("text", StringType()),
            StructField("attrs", MapType(StringType(), StringType())),
            StructField("fields", MapType(StringType(), StringType())),
        ]
    )
)

HTML_MEDIA_TYPES = ("text/html", "application/xhtml+xml")  # colly.go:1186-1203
GZIP_MAGIC = b"\x1f\x8b"  # RFC 1952, http_backend.go:252


def _media_type(ct: str | None) -> str:
    return (ct or "").split(";")[0].strip().lower()


def sniff_content_type(body: bytes) -> str:
    """Subset of Go http.DetectContentType (net/http/sniff.go) covering the
    types this crawl meets: HTML tags, XML declarations, gzip, PNG/JPEG,
    and a text/plain fallback."""
    if body[:2] == GZIP_MAGIC:
        return "application/x-gzip"
    if body[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if body[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    head = bytes(body[:512]).lstrip(b" \t\n\r\f")
    upper = head[:64].upper()
    for pat in (b"<!DOCTYPE HTML", b"<HTML", b"<HEAD", b"<SCRIPT", b"<IFRAME",
                b"<H1", b"<DIV", b"<FONT", b"<TABLE", b"<A", b"<STYLE",
                b"<TITLE", b"<B", b"<BODY", b"<BR", b"<P", b"<!--"):
        if upper.startswith(pat) and len(upper) > len(pat) and upper[len(pat):len(pat) + 1] in (b" ", b">"):
            return "text/html; charset=utf-8"
    if head.startswith(b"<?xml"):
        return "text/xml; charset=utf-8"
    return "text/plain; charset=utf-8"


def is_html_content_type(ct: str | None) -> bool:
    if not ct:
        return False
    return _media_type(ct) in HTML_MEDIA_TYPES


def is_xml_eligible(ct: str | None, path: str) -> tuple[bool, bool]:
    """(eligible, html_mode) per colly.go:1249-1259."""
    ctl = (ct or "").lower()
    mt = _media_type(ct)
    p = path.lower()
    is_xml_file = p.endswith(".xml") or p.endswith(".xml.gz")
    is_xml_content = mt in ("text/xml", "application/xml") or mt.endswith("+xml")
    if "html" in ctl:
        return True, True
    return (is_xml_content or is_xml_file), False


def maybe_gunzip(body: bytes, content_type: str | None, path: str) -> bytes:
    """http_backend.go:238-261: gunzip when headers/path say gzip AND the
    magic bytes confirm it (a .xml.gz URL may serve a plain 404 page)."""
    ctl = (content_type or "").lower()
    if ("gzip" in ctl or path.lower().endswith(".xml.gz")) and bytes(body[:2]) == GZIP_MAGIC:
        try:
            return _gzip.GzipFile(fileobj=io.BytesIO(bytes(body))).read()
        except OSError:
            return body
    return body


_CHARSET_RE = re.compile(r"charset=[\"']?([\w.\-]+)", re.IGNORECASE)


_META_TAG_RE = re.compile(rb"<meta\b([^>]*)>", re.IGNORECASE)
_META_ATTR_RE = re.compile(
    rb"([a-zA-Z-]+)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s\"'>]+))"
)
_META_CONTENT_CHARSET_RE = re.compile(
    rb"charset\s*=\s*[\"']?([\w.\-]+)", re.IGNORECASE
)


def _meta_prescan(body: bytes) -> str | None:
    """WHATWG-style meta prescan over the first 1024 bytes — the window
    x/net/html/charset.DetermineEncoding scans for the reference
    (response.go:86-108, the encoding chain colly inherits). Per the spec's
    algorithm the label is honored only from a ``charset`` ATTRIBUTE or
    from the ``content`` attribute of an http-equiv=content-type meta
    (a charset= inside some unrelated attribute value is not a
    declaration), UTF-16 labels map to utf-8 (if the ASCII tag was
    readable the stream cannot be UTF-16), x-user-defined maps to
    windows-1252, and the label is only trusted if Python knows the
    codec."""
    for mt in _META_TAG_RE.finditer(body[:1024]):
        attrs: dict[bytes, bytes] = {}
        for am in _META_ATTR_RE.finditer(mt.group(1)):
            name = am.group(1).lower()
            if name not in attrs:
                attrs[name] = am.group(2) or am.group(3) or am.group(4) or b""
        raw = attrs.get(b"charset")
        if raw is None and attrs.get(b"http-equiv", b"").lower() == b"content-type":
            cm = _META_CONTENT_CHARSET_RE.search(attrs.get(b"content", b""))
            raw = cm.group(1) if cm else None
        if raw is None:
            continue
        label = raw.decode("ascii", errors="replace").strip().lower()
        if label.startswith("utf-16") or label.startswith("utf16"):
            label = "utf-8"
        elif label == "x-user-defined":
            label = "windows-1252"
        try:
            b"".decode(label)
        except LookupError:
            continue
        return label
    return None


def detect_charset(body: bytes) -> str:
    """P0 DetectCharset (response.go:97-106): the x/net/html/charset
    precedence — BOM sniff, WHATWG meta prescan (first 1024 bytes),
    strict-UTF-8 probe — then the statistical tail (the reference's
    chardet step), implemented from scratch in operators/charset.py:
    structural strict-decode probes + home-script + frequent-character
    scoring over CJK multibyte and Cyrillic/Greek/Hebrew/Arabic
    single-byte candidates, windows-1252/latin-1 fallback."""
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"
    meta = _meta_prescan(body)
    if meta:
        return meta
    try:
        body.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        from .charset import detect_statistical

        return detect_statistical(body)


def body_text(decoded: bytes, ct: str | None, detect: bool = False) -> str:
    """P0 charset fix (response.go:65-116): decode per the Content-Type
    charset parameter, else (with DetectCharset) a detection heuristic,
    else UTF-8 with replacement. The image/video/audio/font MIME skip of
    the reference is inherent here — those types never pass the HTML/XML
    gates that guard the only call site."""
    charset = None
    m = _CHARSET_RE.search(ct or "")
    if m:
        charset = m.group(1)
    if not charset and detect:
        charset = detect_charset(decoded)
    if charset:
        try:
            return decoded.decode(charset)
        except (UnicodeDecodeError, LookupError):
            pass
    return decoded.decode("utf-8", errors="replace")


def _trim(s: str) -> str:
    return s.strip()


def _parent_map(root: ET.Element) -> dict:
    return {id(c): p for p in root.iter() for c in p}


def _select(tree: ET.Element, spec, compiled_cache: dict) -> list[ET.Element]:
    if spec.xpath:
        return dom.xpath_select(tree, spec.selector)
    key = spec.selector
    if key not in compiled_cache:
        compiled_cache[key] = dom.compile_css(key)
    return dom.css_select(tree, compiled_cache[key])


def _element_fields(el: ET.Element, spec) -> dict:
    """Unmarshal-style declarative extraction (unmarshal.go:51-223): each
    (name, child_selector, attr) -> first matching descendant's attr
    (ChildAttr, htmlelement.go:84-89) or ChildText (htmlelement.go:67-72);
    empty selector targets the element itself. Plural forms — the reference's
    []string struct fields / ChildAttrs / ChildTexts (htmlelement.go:75-80,
    93-101) — use a ``[]`` suffix: attr ``"class[]"`` collects every match's
    attr, attr ``"[]"`` collects every match's trimmed text; both are
    JSON-encoded (the fields map is string-valued)."""
    import json

    out = {}
    for name, child_sel, attr in spec.fields:
        plural = bool(attr) and attr.endswith("[]")
        attr_name = attr[:-2] if plural else attr
        matches = dom.css_select(el, child_sel) if child_sel else [el]
        if plural:
            if attr_name:
                vals = [_trim(m.get(attr_name)) for m in matches if m.get(attr_name) is not None]
            else:
                vals = [_trim(dom.text_content(m)) for m in matches]
            out[name] = json.dumps(vals)
            continue
        target = matches[0] if matches else None
        if target is None:
            out[name] = None
        elif attr_name:
            v = target.get(attr_name)
            out[name] = _trim(v) if v is not None else None
        else:
            out[name] = _trim(dom.text_content(target))
    return out


class _FastBuiltins(HTMLParser):
    """One-pass streaming extractor for the built-in selectors only
    (a[href] links, img[src] + figure>figcaption pairs, base[href]).

    The general path builds a full ElementTree and walks it per selector —
    right for arbitrary CSS, but ~10x the work when only the two built-ins
    are registered, and the built-ins ARE the crawl hot path (100 TB of
    pages pay this kernel). Produces byte-identical matches to the DOM path
    (asserted by tests/test_dom.py::test_fast_path_equals_dom_path)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.base_href: str | None = None
        self.links: list[str] = []
        self.images: list[list] = []  # [src, figure_idx | None]
        self.fig_caption: dict[int, str] = {}  # figure_idx -> first figcaption
        self._stack: list[str] = []  # open non-void tags
        self._fig_stack: list[int] = []  # open figure indexes
        self._fig_count = 0
        self._cap_fig: int | None = None  # figure whose figcaption is open
        self._cap_parts: list[str] = []

    def _open(self, tag: str, attrs, void: bool) -> None:
        a = dict(attrs)
        if tag == "base" and self.base_href is None and a.get("href") is not None:
            self.base_href = a["href"]
        elif tag == "a" and a.get("href") is not None:
            self.links.append(a["href"])
        elif tag == "img" and a.get("src") is not None:
            parent_fig = (
                self._fig_stack[-1]
                if self._stack and self._stack[-1] == "figure" and self._fig_stack
                else None
            )
            self.images.append([a["src"], parent_fig])
        if void:
            return
        # mirror dom._TreeBuilder's implicit closers so parent-of-img
        # agrees with the DOM path on li/p/td-style markup
        closers = IMPLICIT_CLOSERS.get(tag)
        if closers and self._stack and self._stack[-1] in closers:
            self._pop()
        if tag == "figcaption" and self._cap_fig is None and self._fig_stack:
            fig = self._fig_stack[-1]
            if fig not in self.fig_caption:
                self._cap_fig = fig
                self._cap_parts = []
        if tag == "figure":
            self._fig_stack.append(self._fig_count)
            self._fig_count += 1
        self._stack.append(tag)

    def _pop(self) -> None:
        t = self._stack.pop()
        if t == "figure" and self._fig_stack:
            self._fig_stack.pop()
        if t == "figcaption" and self._cap_fig is not None:
            self.fig_caption[self._cap_fig] = "".join(self._cap_parts)
            self._cap_fig = None

    def handle_starttag(self, tag, attrs):
        self._open(tag, attrs, tag in VOID_ELEMENTS)

    def handle_startendtag(self, tag, attrs):
        self._open(tag, attrs, True)

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i] == tag:
                while len(self._stack) > i:
                    self._pop()
                return

    def handle_data(self, data):
        if self._cap_fig is not None and data:
            self._cap_parts.append(data)


def _fast_extract(text: str, page_url: str | None, base_href_col: str | None,
                  follow_links: bool, extract_images: bool) -> list[tuple]:
    p = _FastBuiltins()
    try:
        p.feed(text)
        p.close()
    except Exception:
        return []
    base = base_href_col
    if base is None:
        base = p.base_href
    if base and page_url:
        base = absolutize(page_url, base) or page_url
    base = base or page_url
    out: list[tuple] = []
    if follow_links:
        for i, href in enumerate(p.links):
            absu = absolutize(base, href)
            if absu is None:  # fragment-only (request.go:102-104)
                continue
            out.append((0, i, "link", absu, None, None, None, None, None))
    if extract_images:
        for i, (src, fig) in enumerate(p.images):
            image_id = src[6:] if src.startswith("img://") else src
            caption = None
            if fig is not None and fig in p.fig_caption:
                caption = _trim(p.fig_caption[fig])
            out.append((1, i, "image", image_id, caption, None, None, None, None))
    return out


def extract_one(
    body: bytes | None,
    content_type: str | None,
    page_url: str | None,
    base_href_col: str | None,
    follow_links: bool = True,
    extract_images: bool = True,
    extractors: tuple = (),
    detect_charset_opt: bool = False,
    _cache: dict | None = None,
) -> list[tuple]:
    """Extract matches from one page. Pure function — used by the pandas UDF
    and unit tests alike. ``follow_links`` / ``extract_images`` mirror which
    built-in OnHTML selectors are registered (E2/E3: colly.go:929-1051,
    detach colly.go:1008-1029); ``extractors`` are the general OnHTML/OnXML
    registrations (sel_idx 2+)."""
    if body is None:
        return []
    path = ""
    if page_url:
        rest = page_url.split("://", 1)[-1]
        path = "/" + rest.split("/", 1)[1].split("?")[0] if "/" in rest else "/"
    raw = bytes(body)
    ct = content_type
    if not ct and raw:
        ct = sniff_content_type(raw)
    decoded = maybe_gunzip(raw, ct, path)
    if decoded is not raw and not content_type:
        ct = sniff_content_type(decoded)  # sniff the decoded stream
    html_ok = is_html_content_type(ct)
    xml_extractors = tuple(e for e in extractors if e.xpath)
    css_extractors = tuple(e for e in extractors if not e.xpath)
    xml_ok, xml_html_mode = is_xml_eligible(ct, path) if xml_extractors else (False, False)
    if not html_ok and not xml_ok:
        return []
    try:
        text = body_text(decoded, ct, detect_charset_opt)
    except Exception:
        return []

    if not extractors and html_ok:
        # built-ins only: the one-pass streaming kernel (crawl hot path)
        return _fast_extract(text, page_url, base_href_col,
                             follow_links, extract_images)

    cache = _cache if _cache is not None else {}
    out: list[tuple] = []
    html_tree = None
    if html_ok:
        try:
            html_tree = dom.parse_html(text)
        except Exception:
            html_tree = None
    # <base href> itself may be relative to the document URL; the resolved
    # base applies to the built-in a[href] extractor AND to general
    # 'follow' extractors alike (colly resolves Request.AbsoluteURL against
    # resp.Request.baseURL for every callback, colly.go:1209-1218). For
    # XML-mode documents (no HTML tree) there is no <base>; the column /
    # page URL fallback applies.
    base = base_href_col
    if base is None and html_tree is not None:
        bases = dom.css_select(html_tree, "base[href]")
        base = bases[0].get("href") if bases else None
    if base and page_url:
        base = absolutize(page_url, base) or page_url
    base = base or page_url

    if html_tree is not None:
        if follow_links:
            i = 0
            for a in dom.css_select(html_tree, "a[href]"):
                absu = absolutize(base, a.get("href"))
                i += 1
                if absu is None:  # fragment-only (request.go:102-104)
                    continue
                out.append((0, i - 1, "link", absu, None, None, None, None, None))
        if extract_images:
            parents = _parent_map(html_tree)
            for i, img in enumerate(dom.css_select(html_tree, "img[src]")):
                src = img.get("src")
                image_id = src[6:] if src.startswith("img://") else src
                caption = None
                par = parents.get(id(img))
                if par is not None and par.tag == "figure":
                    caps = dom.css_select(par, "figcaption")
                    if caps:
                        caption = _trim(dom.text_content(caps[0]))  # ChildText trims
                out.append((1, i, "image", image_id, caption, None, None, None, None))

    for sel_idx, spec in enumerate(css_extractors + xml_extractors, start=2):
        if spec.xpath:
            if not xml_ok:
                continue
            tree = html_tree if xml_html_mode else dom.parse_xml(text)
            if tree is None:
                continue
        else:
            if html_tree is None:
                continue
            tree = html_tree
        try:
            matches = _select(tree, spec, cache)
        except dom.CssSelectorError:
            raise
        if spec.break_selector and not spec.xpath:
            # ForEachWithBreak (htmlelement.go:119-131): stop at the first
            # match that also matches the break selector — it and all later
            # matches are not emitted
            key = ("__break__", spec.break_selector)
            if key not in cache:
                cache[key] = dom.compile_css(spec.break_selector)
            stop_ids = {id(e) for e in dom.css_select(tree, cache[key])}
            kept = []
            for el in matches:
                if id(el) in stop_ids:
                    break
                kept.append(el)
            matches = kept
        for i, el in enumerate(matches):
            if isinstance(el, str):
                # string results from XPath text()/@attr selection
                # (dom.xpath_select): the value IS the match
                if spec.action == "follow":
                    absu = absolutize(base, el)
                    if absu is None:
                        continue
                    out.append((sel_idx, i, "link", absu, None, None, None, None, None))
                else:
                    v = _trim(el)
                    out.append(
                        (sel_idx, i, "element", v, spec.name or spec.selector,
                         None, v, None, None)
                    )
                continue
            if spec.action == "follow":
                href = el.get(spec.attr or "href")
                absu = absolutize(base, href) if href else None
                if absu is None:
                    continue
                out.append((sel_idx, i, "link", absu, None, None, None, None, None))
            else:
                fields = _element_fields(el, spec) if spec.fields else None
                value = el.get(spec.attr) if spec.attr else _trim(dom.text_content(el))
                out.append(
                    (
                        sel_idx, i, "element", value, spec.name or spec.selector,
                        el.tag, dom.text_content(el), dict(el.attrib), fields,
                    )
                )
    return out


def make_extract_udf(follow_links: bool = True, extract_images: bool = True,
                     extractors: tuple = (), detect_charset_opt: bool = False):
    from pyspark.sql import functions as F

    def extract_matches_pd(
        body: pd.Series, content_type: pd.Series, page_url: pd.Series,
        base_href: pd.Series,
    ) -> pd.Series:
        cache: dict = {}  # compiled selectors shared across the Arrow batch
        return pd.Series(
            [
                extract_one(b, ct, u, bh, follow_links, extract_images,
                            extractors, detect_charset_opt, cache)
                for b, ct, u, bh in zip(body, content_type, page_url, base_href)
            ],
            dtype="object",
        )

    return F.pandas_udf(extract_matches_pd, MATCH_SCHEMA)
