"""P3/P9/P10 extractor unit tests (pure Python side of the parse UDF)."""

from colly_spark.operators.parse import extract_one, is_html_content_type


def test_content_type_gate():
    # colly.go:1186-1203: only text/html and application/xhtml+xml parse
    assert is_html_content_type("text/html")
    assert is_html_content_type("text/html; charset=utf-8")
    assert is_html_content_type("application/xhtml+xml")
    assert not is_html_content_type("application/xml")
    assert not is_html_content_type("image/png")
    assert not is_html_content_type(None)


def test_links_absolutized_in_order():
    body = b'<html><body><a href="/a">1</a><a href="b">2</a><a href="#f">3</a>' \
           b'<a href="http://y.test/z">4</a></body></html>'
    out = extract_one(body, "text/html", "http://x.test/dir/page", None)
    links = [(m[1], m[3]) for m in out if m[2] == "link"]
    assert links == [
        (0, "http://x.test/a"),
        (1, "http://x.test/dir/b"),
        # fragment-only href dropped entirely (request.go:102-104)
        (3, "http://y.test/z"),
    ]


def test_base_tag_wins():
    # colly.go:1209-1218: <base href> resolved before links
    body = b'<html><head><base href="/sub/dir/"></head>' \
           b'<body><a href="child">c</a></body></html>'
    out = extract_one(body, "text/html", "http://x.test/page", None)
    assert out[0][3] == "http://x.test/sub/dir/child"


def test_img_figcaption_pairs():
    body = (b'<figure><img src="img://im-1"/><figcaption> cap one </figcaption></figure>'
            b'<figure><img src="img://im-2"/></figure>')
    out = extract_one(b"<html><body>" + body + b"</body></html>",
                      "text/html", "http://x.test/", None)
    images = [(m[3], m[4]) for m in out if m[2] == "image"]
    assert images == [("im-1", "cap one"), ("im-2", None)]  # ChildText trims


def test_non_html_and_broken_bodies():
    assert extract_one(b"<a href='/x'>", "application/xml", "http://x.test/", None) == []
    assert extract_one(None, "text/html", "http://x.test/", None) == []
    # truncated/garbage HTML must not raise
    out = extract_one(b"<html><a href='/ok'><di", "text/html", "http://x.test/", None)
    assert ("link", "http://x.test/ok") in [(m[2], m[3]) for m in out]


def test_foreach_with_break():
    """P8 ForEachWithBreak (htmlelement.go:119-131): iteration over a
    spec's matches stops at the first match that also matches
    break_selector — it and everything after are not emitted."""
    from colly_spark.config import ExtractorSpec
    from colly_spark.operators.parse import extract_one

    body = (
        b"<html><body>"
        b"<li class='a'>one</li><li class='a'>two</li>"
        b"<li class='stop a'>three</li><li class='a'>four</li>"
        b"</body></html>"
    )
    spec = ExtractorSpec(selector="li", break_selector="li.stop")
    out = extract_one(body, "text/html", "http://x.test/", None,
                      follow_links=False, extract_images=False,
                      extractors=(spec,))
    assert [m[6] for m in out] == ["one", "two"]  # text field; stops before 'three'
    # without the break the same selector yields all four
    out_all = extract_one(body, "text/html", "http://x.test/", None,
                          follow_links=False, extract_images=False,
                          extractors=(ExtractorSpec(selector="li"),))
    assert [m[6] for m in out_all] == ["one", "two", "three", "four"]


def test_meta_prescan_whatwg_rules():
    """WHATWG prescan details: utf-16 labels map to utf-8 (a readable ASCII
    tag cannot be UTF-16), x-user-defined maps to windows-1252, and a
    charset= inside an unrelated attribute value is NOT a declaration."""
    from colly_spark.operators.parse import detect_charset

    assert detect_charset(b'<meta charset="utf-16"><p>hi</p>') == "utf-8"
    assert detect_charset(b"<meta charset=UTF-16BE>") == "utf-8"
    assert detect_charset(b"<meta charset=x-user-defined>") == "windows-1252"
    assert detect_charset(
        b'<meta name="description" content="charset=koi8-r">') == "utf-8"
    assert detect_charset(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=iso8859-2">') == "iso8859-2"
    assert detect_charset(b"<META CHARSET=KOI8-R>") == "koi8-r"
