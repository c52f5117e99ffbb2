"""URL kernel: canonicalize / absolutize / host extraction (F1, P10, F2 prep).

Reproduces the observable URL behaviors of the reference:

- WHATWG-style tab/CR/LF stripping inside URLs
  (reference test: colly_test.go:1187-1217 ``TestTabsAndNewlines``),
- percent-encoding a lone ``%`` that is not a valid escape
  (colly.go:310 extension; test colly_test.go:1219-1250 ``TestLonePercent``),
- re-serialization that normalizes ``http://x.test`` vs ``http://x.test/``
  (colly.go:1661-1667 ``normalizeURL`` via whatwg ``Href(false)``),
- fragment dropped from the canonical form (``Href(false)`` excludes it),
- scheme/host lowercased, default ports stripped, dot-segments resolved,
- fragment-only hrefs absolutize to ``""`` (request.go:102-104),
- filter/politeness domain key is the port-less hostname (colly.go:782).

Implementation is pure Python on top of :mod:`urllib.parse`; the Spark surface
is Arrow-vectorized pandas UDFs (one Python call per Arrow batch, never one
per row via the JVM). String-level URL parsing has no Spark built-in with
these semantics, so this is one of the few justified pandas-UDF hot paths.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_WHITESPACE_RE = re.compile(r"[\t\n\r]")
# a '%' not followed by two hex digits is not a valid escape -> encode it
_LONE_PERCENT_RE = re.compile(r"%(?![0-9A-Fa-f]{2})")
_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}


def strip_url_whitespace(raw: str) -> str:
    """WHATWG pre-parse: remove ASCII tab/newline anywhere, trim C0/space ends."""
    return _WHITESPACE_RE.sub("", raw).strip(" \x00\x01\x02\x03\x04\x05\x06\x07\x08\x0b\x0c\x0e\x0f\x10\x11\x12\x13\x14\x15\x16\x17\x18\x19\x1a\x1b\x1c\x1d\x1e\x1f\x7f")


def encode_lone_percent(raw: str) -> str:
    """Encode a '%' that does not start a valid escape (colly.go:310)."""
    return _LONE_PERCENT_RE.sub("%25", raw)


def _normalize_path(path: str) -> str:
    """Resolve '.'/'..' segments, preserving a trailing slash; '' -> '/'."""
    if path == "":
        return "/"
    trailing = path.endswith("/") and path != "/"
    # posixpath.normpath collapses '//' too aggressively for URL semantics on
    # interior empty segments, but the WHATWG serializer does collapse dot
    # segments only; keep interior '//' intact by splitting manually.
    segments = path.split("/")
    out: list[str] = []
    for seg in segments:
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    norm = "/".join(out)
    if not norm.startswith("/"):
        norm = "/" + norm
    if trailing and not norm.endswith("/"):
        norm += "/"
    return norm


def canonicalize(raw: str | None) -> str | None:
    """Canonical absolute URL string; None/unparseable/relative -> None.

    Mirrors the parse -> re-serialize (``Href(false)``) round trip the
    reference applies to every URL before filtering and hashing
    (colly.go:637-644, 1661-1667).
    """
    if raw is None:
        return None
    s = encode_lone_percent(strip_url_whitespace(str(raw)))
    if not s:
        return None
    try:
        parts = urlsplit(s)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if not scheme or not parts.netloc:
        return None  # only absolute http(s)-style URLs are fetchable
    host = (parts.hostname or "").lower()
    if not host:
        return None
    userinfo = ""
    if parts.username:
        userinfo = parts.username
        if parts.password:
            userinfo += ":" + parts.password
        userinfo += "@"
    try:
        port = parts.port
    except ValueError:
        return None
    if ":" in host:
        # IPv6 literal: urlsplit().hostname strips the brackets; the
        # serialized form must restore them or the URL can't be re-parsed
        # (Go's net/url keeps the bracketed form through String(),
        # url.go Host handling — parity for http://[::1]/ style seeds)
        host = "[" + host + "]"
    netloc = userinfo + host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc += f":{port}"
    path = _normalize_path(parts.path)
    # Href(false): fragment excluded from the canonical serialization
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def hostname(canon_url: str | None) -> str | None:
    """Port-less lowercase hostname — colly's filter key (colly.go:782)."""
    if not canon_url:
        return None
    try:
        return (urlsplit(canon_url).hostname or "").lower() or None
    except ValueError:
        return None


def path_query(canon_url: str | None) -> str | None:
    """escaped path + '?query' — what robots.txt rules match against
    (colly.go:898-905, query included per colly_test.go:1304-1319)."""
    if not canon_url:
        return None
    p = urlsplit(canon_url)
    pq = p.path or "/"
    if p.query:
        pq += "?" + p.query
    return pq


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments, verbatim state machine."""
    inp, out = path, []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1) if inp.startswith("/") else inp.find("/")
            if i == -1:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:i])
                inp = inp[i:]
    return "".join(out)


def absolutize(base: str | None, href: str | None) -> str | None:
    """Resolve ``href`` against ``base``; fragment-only -> None
    (request.go:101-117: ``AbsoluteURL`` returns "" for '#...').

    Resolution is RFC 3986 §5.2 implemented over :func:`urlsplit`, matching
    Go's ``net/url.ResolveReference`` (the reference's resolver). The stdlib
    ``urljoin`` is deliberately NOT used: it round-trips through ``urlparse``,
    which splits ``;params`` off the last path segment and silently drops an
    EMPTY params on re-assembly, so ``urljoin(u, u) != u`` for URLs whose last
    segment ends in a bare ``;`` (hypothesis counterexample
    ``http://[::1]/;``) — a url_seen divergence from colly on such links.
    ``urlsplit`` never separates params from the path, so the segment
    survives intact here.
    """
    if href is None:
        return None
    h = strip_url_whitespace(str(href))
    if h.startswith("#"):
        return None
    if not base:
        return h or None
    try:
        b = urlsplit(base)
        r = urlsplit(h)
    except ValueError:
        return None
    # §5.2.2 transform references (strict: a ref scheme always wins)
    if r.scheme:
        scheme, netloc = r.scheme, r.netloc
        path, query = _remove_dot_segments(r.path), r.query
    elif r.netloc:
        scheme, netloc = b.scheme, r.netloc
        path, query = _remove_dot_segments(r.path), r.query
    elif r.path == "":
        scheme, netloc, path = b.scheme, b.netloc, b.path
        query = r.query if r.query else b.query
    else:
        scheme, netloc, query = b.scheme, b.netloc, r.query
        if r.path.startswith("/"):
            path = _remove_dot_segments(r.path)
        else:
            # §5.2.3 merge: base-with-authority-and-empty-path -> "/" + ref
            if b.netloc and not b.path:
                merged = "/" + r.path
            else:
                merged = b.path[: b.path.rfind("/") + 1] + r.path
            path = _remove_dot_segments(merged)
    return urlunsplit((scheme, netloc, path, query, r.fragment))


# --------------------------------------------------------------------------
# Spark surface: Arrow-vectorized pandas UDFs
# --------------------------------------------------------------------------

URL_PARTS_SCHEMA = StructType(
    [
        StructField("canon_url", StringType()),
        StructField("domain", StringType()),
        StructField("path_query", StringType()),
    ]
)


def url_parts_pd(raw: pd.Series) -> pd.DataFrame:
    """Batch canonicalize: raw url -> (canon_url, domain, path_query)."""
    canon = raw.map(canonicalize)
    return pd.DataFrame(
        {
            "canon_url": canon,
            "domain": canon.map(hostname),
            "path_query": canon.map(path_query),
        }
    )


def absolutize_pd(base: pd.Series, href: pd.Series) -> pd.Series:
    return pd.Series(
        [absolutize(b, h) for b, h in zip(base, href)], dtype="object"
    )


def register_udfs():
    """Build the pandas UDF objects (deferred so import has no Spark dep)."""
    url_parts_udf = F.pandas_udf(url_parts_pd, URL_PARTS_SCHEMA)
    absolutize_udf = F.pandas_udf(absolutize_pd, StringType())
    return url_parts_udf, absolutize_udf
