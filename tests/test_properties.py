"""Hypothesis property tests for the from-scratch pure-Python kernels.

These are the modules rewritten from spec because the container lacks the
usual libraries (lxml, xxhash, PIL, chardet): the URL canonicalizer, the
Bloom sidecar, the WAV decoder, the FPNG/FJPG payload codec and the CSS
positional pseudo-classes. Example-based tests pin the reference-parity
cases; the properties here pin the algebraic laws any correct
implementation must satisfy, over randomized inputs.

All Spark-free (pure Python/numpy) so the whole module runs in seconds.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest
from hypothesis import example, given, settings, strategies as st

from colly_spark import imagecodec
from colly_spark.bloomseen import bloom_params, insert_into_bits, membership
from colly_spark.dom import css_select, parse_html
from colly_spark.functions.multimodal import decode_audio
from colly_spark.urlkit import absolutize, canonicalize, hostname, path_query

SETTINGS = dict(max_examples=80, deadline=None)

# ---------------------------------------------------------------------------
# URL canonicalizer
# ---------------------------------------------------------------------------

_label = st.text(alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-", min_size=1, max_size=8)
_hosts = st.one_of(
    st.lists(_label, min_size=1, max_size=3).map(".".join),
    st.sampled_from(["[::1]", "[2001:db8::1]", "[fe80::a]", "127.0.0.1"]),
)
_segment = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789._~!$&'()*+,;=:@-", max_size=6
).filter(lambda s: s not in ("",))
_paths = st.one_of(
    st.just(""),
    st.lists(st.one_of(_segment, st.sampled_from([".", "..", ""])), max_size=6).map(
        lambda segs: "/" + "/".join(segs)
    ),
)
_urls = st.builds(
    lambda scheme, host, port, path, query, frag: scheme
    + "://"
    + host
    + ("" if port is None else f":{port}")
    + path
    + ("" if not query else "?" + query)
    + ("" if not frag else "#" + frag),
    st.sampled_from(["http", "https", "HTTP", "Https"]),
    _hosts,
    st.one_of(st.none(), st.integers(min_value=1, max_value=65535)),
    _paths,
    st.text(alphabet="abc=&%251", max_size=8),
    st.text(alphabet="xyz", max_size=4),
)


@settings(**SETTINGS)
@given(_urls)
def test_canonicalize_idempotent_and_invariant(url):
    c = canonicalize(url)
    assert c is not None, url
    # idempotence: the canonical form is a fixed point
    assert canonicalize(c) == c
    # invariants of the canonical serialization
    assert "#" not in c  # Href(false): fragment never serialized
    scheme, rest = c.split("://", 1)
    assert scheme == scheme.lower()
    assert hostname(c) == hostname(c).lower()
    pq = path_query(c)
    assert pq.startswith("/")
    # dot segments are resolved away
    path = pq.split("?", 1)[0]
    assert ".." not in path.split("/") and "." not in path.split("/")
    # default ports never serialized
    assert not (scheme == "http" and c.split("/")[2].endswith(":80"))
    assert not (scheme == "https" and c.split("/")[2].endswith(":443"))


@settings(**SETTINGS)
@given(st.text(max_size=40))
def test_canonicalize_total_on_junk(raw):
    """Never raises; returns None or a fixed-point canonical URL."""
    c = canonicalize(raw)
    if c is not None:
        assert canonicalize(c) == c


@settings(**SETTINGS)
@given(_urls, st.text(alphabet="abcxyz/.?=%", max_size=12))
@example(base="http://[::1]/;", href="")  # round-4 counterexample: urljoin
# drops the empty ';params' of the last segment (urlkit.absolutize docstring)
@example(base="http://h.test/a;/x;", href="y;")  # bare ';' in base AND href
@example(base="http://h.test/a", href="..//b")  # dot-segment into '//' keep
def test_absolutize_closure(base, href):
    """Resolving any href against a canonical base yields either None or a
    string the canonicalizer accepts-or-rejects deterministically; and
    resolving an already-absolute canonical URL is the identity."""
    cbase = canonicalize(base)
    assert cbase is not None
    absd = absolutize(cbase, href)
    if href.startswith("#"):
        assert absd is None  # request.go:101-117 AbsoluteURL("") for '#...'
    if absd is not None:
        c = canonicalize(absd)
        if c is not None:
            assert canonicalize(c) == c
    # absolute hrefs pass through untouched
    assert absolutize(cbase, cbase) == cbase


def test_canonicalize_ipv6_regression():
    """IPv6 literals keep their brackets through canonicalization (the
    urlsplit().hostname accessor strips them; Go's net/url re-serializes
    bracketed, so un-bracketed output could never be re-parsed)."""
    assert canonicalize("http://[::1]:8080/a") == "http://[::1]:8080/a"
    assert canonicalize("HTTP://[2001:DB8::1]:80/x") == "http://[2001:db8::1]/x"
    assert hostname(canonicalize("http://[::1]/")) == "::1"


# ---------------------------------------------------------------------------
# Bloom sidecar: no false negatives, ever
# ---------------------------------------------------------------------------


@settings(**SETTINGS)
@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200),
    st.integers(min_value=1, max_value=500),
    st.floats(min_value=0.001, max_value=0.2),
)
def test_bloom_no_false_negatives(hashes, capacity, fpp):
    m, k = bloom_params(capacity, fpp)
    assert m % 8 == 0 and k >= 1
    bits = np.zeros(m // 8, dtype=np.uint8)
    arr = np.array(hashes, dtype=np.int64)
    insert_into_bits(bits, arr, m, k)
    assert membership(bits, arr, m, k).all()


@settings(**SETTINGS)
@given(st.integers(min_value=1, max_value=10**7))
def test_bloom_params_sized_for_fpp(capacity):
    """At the design capacity the filter is big enough: classic bound
    m >= n*ln(1/p)/ln(2)^2 (rounded up to bytes)."""
    m, k = bloom_params(capacity, 0.01)
    assert m >= capacity * 9.5  # ln(100)/ln(2)^2 = 9.58
    assert 1 <= k <= 20


# ---------------------------------------------------------------------------
# WAV/PCM decoder: exact round-trip at every integer width
# ---------------------------------------------------------------------------


def _encode_wav(ints: np.ndarray, width: int, nch: int, rate: int) -> bytes:
    if width == 1:
        raw = (ints + 128).astype(np.uint8).tobytes()
    elif width == 2:
        raw = ints.astype("<i4").astype("<i2").tobytes()
    elif width == 3:
        i = ints.astype("<i4")
        b = i.view(np.uint32)
        raw = np.stack(
            [b & 0xFF, (b >> 8) & 0xFF, (b >> 16) & 0xFF], axis=-1
        ).astype(np.uint8).tobytes()
    else:
        raw = ints.astype("<i4").tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(raw)
    return buf.getvalue()


@settings(**SETTINGS)
@given(
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=2),
    st.sampled_from([8000, 16000, 44100]),
    st.lists(st.integers(min_value=-(2**23), max_value=2**23 - 1), min_size=2, max_size=64),
)
def test_wav_roundtrip_exact(width, nch, rate, values):
    full_scale = {1: 128, 2: 32768, 3: 8388608, 4: 2147483648}[width]
    lim = full_scale - 1
    ints = np.array([max(-full_scale, min(lim, v)) for v in values], dtype=np.int64)
    if len(ints) % nch:
        ints = ints[: len(ints) - 1]
    if len(ints) == 0:
        return
    if width == 4:
        ints = ints << 8  # exercise the high bytes too
    got_rate, samples = decode_audio(_encode_wav(ints, width, nch, rate))
    assert got_rate == rate
    assert samples.shape == (len(ints) // nch, nch)
    expect = ints.astype(np.float32) / np.float32(full_scale)
    np.testing.assert_array_equal(samples.ravel(), expect)


# ---------------------------------------------------------------------------
# Payload codec: lossless exact, lossy over the 40 dB gate
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=24), st.integers(min_value=1, max_value=24), st.integers())
def test_imagecodec_roundtrip(w, h, seed):
    px = imagecodec.reference_pixels(f"img-{seed}", w, h)
    assert px.shape == (h, w, 3) and px.dtype == np.uint8
    # lossless: exact
    back = imagecodec.decode(imagecodec.encode(px, "png"))
    np.testing.assert_array_equal(back, px)
    # lossy: within the quantization step and over the PSNR gate
    lossy = imagecodec.decode(imagecodec.encode(px, "jpeg"))
    assert lossy.shape == px.shape
    assert int(np.abs(lossy.astype(int) - px.astype(int)).max()) <= 2
    assert imagecodec.psnr_db(px, lossy) >= 40.0
    # deterministic generator: same id -> same pixels
    np.testing.assert_array_equal(px, imagecodec.reference_pixels(f"img-{seed}", w, h))


# ---------------------------------------------------------------------------
# CSS positional pseudo-classes vs brute force
# ---------------------------------------------------------------------------


@settings(**SETTINGS)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=-3, max_value=3),
    st.integers(min_value=-2, max_value=6),
)
def test_nth_child_matches_bruteforce(n, a, b):
    html = "<ul>" + "".join(f'<li id="i{i}"></li>' for i in range(n)) + "</ul>"
    root = parse_html(html)
    sel = f"li:nth-child({a}n{b:+d})" if a else f"li:nth-child({b})"
    got = {el.get("id") for el in css_select(root, sel)}
    want = {
        f"i{p - 1}"
        for p in range(1, n + 1)
        if (p == b if a == 0 else ((p - b) % a == 0 and (p - b) // a >= 0))
    }
    assert got == want


@settings(**SETTINGS)
@given(st.integers(min_value=1, max_value=10), st.integers(min_value=1, max_value=5))
def test_not_is_complement(n, modulus):
    """:not(X) partitions the candidate set: li == li:X ∪ li:not(X), disjoint."""
    html = "<div>" + "".join(f'<li id="i{i}"></li>' for i in range(n)) + "</div>"
    root = parse_html(html)
    inner = f"nth-child({modulus}n+1)"
    all_ids = {el.get("id") for el in css_select(root, "li")}
    pos = {el.get("id") for el in css_select(root, f"li:{inner}")}
    neg = {el.get("id") for el in css_select(root, f"li:not(:{inner})")}
    assert pos | neg == all_ids
    assert pos & neg == set()


@settings(**SETTINGS)
@given(st.lists(st.sampled_from(["p", "span", "em"]), min_size=1, max_size=10))
def test_nth_of_type_counts_same_tag_only(tags):
    html = "<div>" + "".join(f'<{t} id="i{i}"></{t}>' for i, t in enumerate(tags)) + "</div>"
    root = parse_html(html)
    for tag in set(tags):
        first = css_select(root, f"{tag}:first-of-type")
        want_idx = tags.index(tag)
        assert [el.get("id") for el in first] == [f"i{want_idx}"]
        last = css_select(root, f"{tag}:last-of-type")
        want_last = len(tags) - 1 - tags[::-1].index(tag)
        assert [el.get("id") for el in last] == [f"i{want_last}"]


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])


# ---------------------------------------------------------------------------
# Winnowing fingerprint kernel (functions/text.py)
# ---------------------------------------------------------------------------


def _py_winnow_ref(text, k=8, w=4, base=1000003):
    import re

    m = 1 << 64
    s = re.sub(r"[^a-z0-9]", "", (text or "").lower())
    if len(s) < k:
        return []
    hs = []
    for i in range(len(s) - k + 1):
        h = 0
        for ch in s[i:i + k]:
            h = (h * base + ord(ch)) % m
        hs.append(h)
    wins = [min(hs)] if len(hs) <= w else [
        min(hs[j:j + w]) for j in range(len(hs) - w + 1)
    ]
    return sorted({(f - m) if f >= (1 << 63) else f for f in wins})


@settings(**SETTINGS)
@given(st.text(alphabet="abcXYZ 0123.,!?-\n", max_size=120))
@example("")
@example("abcdefgh")          # exactly k
@example("a" * 11)            # hash count == window
def test_winnow_kernel_matches_pure_python(text):
    from colly_spark.functions.text import winnow_doc

    assert sorted(winnow_doc(text).tolist()) == _py_winnow_ref(text)


@settings(**SETTINGS)
@given(
    st.text(alphabet="qwerty123", min_size=11, max_size=30),
    st.text(alphabet="abc def.", max_size=30),
    st.text(alphabet="ghi jkl!", max_size=30),
)
def test_winnow_guarantee_property(shared, pre, post):
    """Any two docs sharing a normalized substring of length >= window+k-1
    (= 11) share at least one fingerprint, whatever surrounds it."""
    from colly_spark.functions.text import winnow_doc

    a = set(winnow_doc(pre + shared + post).tolist())
    b = set(winnow_doc(post + shared + pre).tolist())
    assert a & b


# ---------------------------------------------------------------------------
# XPath numeric predicates (dom.py)
# ---------------------------------------------------------------------------


@settings(**SETTINGS)
@given(
    st.lists(st.one_of(st.integers(-9, 20), st.just(None), st.just("junk")),
             min_size=1, max_size=12),
    st.integers(-5, 15),
    st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
)
def test_xpath_numeric_attr_matches_bruteforce(vals, rhs, op):
    """[@v OP n] equals a python-side filter under XPath number()
    semantics: absent and non-numeric attributes always compare false."""
    import operator

    from colly_spark.dom import parse_xml, xpath_select

    body = "".join(
        f'<item id="i{i}"/>' if v is None else f'<item id="i{i}" v="{v}"/>'
        for i, v in enumerate(vals)
    )
    root = parse_xml(f"<r>{body}</r>")
    got = {e.get("id") for e in xpath_select(root, f"//item[@v {op} {rhs}]")}
    ops = {"=": operator.eq, "!=": operator.ne, "<": operator.lt,
           "<=": operator.le, ">": operator.gt, ">=": operator.ge}
    want = {
        f"i{i}" for i, v in enumerate(vals)
        if isinstance(v, int) and ops[op](float(v), float(rhs))
    }
    assert got == want


@settings(**SETTINGS)
@given(st.lists(st.integers(0, 4), min_size=1, max_size=8),
       st.integers(0, 5),
       st.sampled_from(["=", "<", ">", ">=", "<=", "!="]))
def test_xpath_count_matches_bruteforce(kid_counts, rhs, op):
    import operator

    from colly_spark.dom import parse_xml, xpath_select

    body = "".join(
        f'<g id="g{i}">' + "<c/>" * n + "</g>" for i, n in enumerate(kid_counts)
    )
    root = parse_xml(f"<r>{body}</r>")
    got = {e.get("id") for e in xpath_select(root, f"//g[count(c) {op} {rhs}]")}
    ops = {"=": operator.eq, "!=": operator.ne, "<": operator.lt,
           "<=": operator.le, ">": operator.gt, ">=": operator.ge}
    want = {f"g{i}" for i, n in enumerate(kid_counts) if ops[op](n, rhs)}
    assert got == want


# ---------------------------------------------------------------------------
# WARC / sitemap parser properties
# ---------------------------------------------------------------------------

_bodies = st.lists(
    st.binary(max_size=200), min_size=1, max_size=8
)


@settings(**SETTINGS)
@given(_bodies, st.booleans())
@example([b"\r\n\r\nWARC/1.0\r\n"], False)  # body that mimics a record head
@example([b"HTTP/1.1 200 \r\n\r\nx"], True)  # body that mimics an HTTP msg
def test_warc_roundtrip_arbitrary_bodies(bodies, compress):
    """Serialize N records with ARBITRARY binary bodies (including bytes
    that mimic record headers or HTTP messages), concatenate, parse back:
    exactly N records, payloads byte-identical, statuses preserved —
    records are length-delimited, so no body can confuse the framing."""
    import gzip as _gz

    from colly_spark.sources import warc as w

    blob = b""
    for i, body in enumerate(bodies):
        rec = w._one_record(
            f"http://t.test/{i}", "2026-01-01T00:00:00Z", 200 + i,
            "application/octet-stream", body, f"r{i}",
        )
        blob += _gz.compress(rec) if compress else rec
    recs = list(w.iter_warc_records(blob))
    assert len(recs) == len(bodies)
    for i, (r, body) in enumerate(zip(recs, bodies)):
        assert r["payload"] == body
        assert r["http_status"] == 200 + i
        assert r["target_uri"] == f"http://t.test/{i}"


_locs = st.lists(
    st.integers(min_value=0, max_value=10**9), min_size=0, max_size=20,
    unique=True,
)


@settings(**SETTINGS)
@given(_locs, st.booleans())
def test_sitemap_roundtrip(ids, as_index):
    """Build a urlset/sitemapindex document from N ids, parse back: same
    N locs in order, kind preserved."""
    from colly_spark.sources.sitemap import parse_sitemap

    tag, item = ("sitemapindex", "sitemap") if as_index else ("urlset", "url")
    inner = "".join(
        f"<{item}><loc>http://t.test/{i}</loc></{item}>" for i in ids
    )
    body = (
        f'<{tag} xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"{inner}</{tag}>"
    )
    is_index, entries = parse_sitemap(body.encode())
    assert is_index == as_index
    assert [e["loc"] for e in entries] == [f"http://t.test/{i}" for i in ids]
