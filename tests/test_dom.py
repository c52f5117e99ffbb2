"""P3-P9 parse surface: ports of the reference's extraction tests against
the pure-Python DOM/CSS/XPath engine and ``extract_one``.

Ports: TestCollectorOnHTML (colly_test.go:684-726), TestHTMLElement
(colly_test.go:1525-1562), TestCollectorOnXMLWithHtml/XML/XMLCompressed
(colly_test.go:1564-1658), TestCollectorContentSniffing
(colly_test.go:728-754), plus unit coverage of the CSS subset. No Spark —
these run the same pure function the Arrow UDF batches over.
"""

import gzip
import json

from colly_spark import dom
from colly_spark.config import ExtractorSpec
from colly_spark.operators.parse import (
    extract_one,
    is_html_content_type,
    is_xml_eligible,
    maybe_gunzip,
    sniff_content_type,
)

# the reference test server's /html body (colly_test.go:85-103)
REF_HTML = b"""<!DOCTYPE html>
<html>
<head>
<title>Test Page</title>
</head>
<body>
<h1>Hello World</h1>
<p class="description">This is a test page</p>
<p class="description">This is a test paragraph</p>
</body>
</html>
"""

# the reference testXML fixture (colly_test.go:61-67)
REF_XML = b"""<?xml version="1.0" encoding="UTF-8"?>
<page>
\t<title>Test Page</title>
\t<paragraph type="description">This is a test page</paragraph>
\t<paragraph type="description">This is a test paragraph</paragraph>
</page>"""


def _by_sel(matches, sel_idx):
    return [m for m in matches if m[0] == sel_idx]


# ---------------------------------------------------------------------------
# CSS engine unit coverage
# ---------------------------------------------------------------------------

HTML = (
    '<div id="a" class="x y"><p class="x">one</p><span data-k="v1">s1</span>'
    '<section><p class="y">two</p></section></div>'
    '<p class="x z">three</p><span data-k="other">s2</span>'
)


def _sel(selector):
    tree = dom.parse_html(HTML)
    return dom.css_select(tree, selector)


def test_css_tag_class_id_attr():
    assert [e.get("class") for e in _sel("p")] == ["x", "y", "x z"]
    assert [dom.text_content(e) for e in _sel(".x")] != []
    assert {dom.text_content(e) for e in _sel("p.x")} == {"one", "three"}
    assert [e.get("id") for e in _sel("#a")] == ["a"]
    assert len(_sel("[data-k]")) == 2
    assert [dom.text_content(e) for e in _sel('[data-k="v1"]')] == ["s1"]
    assert [dom.text_content(e) for e in _sel('[data-k^="v"]')] == ["s1"]
    assert [dom.text_content(e) for e in _sel('[data-k$="er"]')] == ["s2"]
    assert [dom.text_content(e) for e in _sel('[data-k*="the"]')] == ["s2"]
    assert {e.get("class") for e in _sel('[class~="z"]')} == {"x z"}


def test_css_combinators_groups_order():
    # descendant vs child
    assert {dom.text_content(e) for e in _sel("div p")} == {"one", "two"}
    assert {dom.text_content(e) for e in _sel("div > p")} == {"one"}
    assert {dom.text_content(e) for e in _sel("div > section > p")} == {"two"}
    # group: document order across alternatives (goquery semantics)
    got = [dom.text_content(e) for e in _sel("p.x, span")]
    assert got == ["one", "s1", "three", "s2"]
    # deduped when alternatives overlap
    assert [dom.text_content(e) for e in _sel("p.x, .z")] == ["one", "three"]
    # universal
    assert len(_sel("*")) == 7


def test_css_unsupported_raises():
    import pytest

    with pytest.raises(dom.CssSelectorError):
        dom.compile_css("a:hover")  # dynamic-state pseudo stays rejected
    with pytest.raises(dom.CssSelectorError):
        dom.compile_css("a:visited")  # browser history: unknowable here
    with pytest.raises(dom.CssSelectorError):
        dom.compile_css("p:not()")  # empty argument
    with pytest.raises(dom.CssSelectorError):
        dom.compile_css("a >")  # dangling combinator
    with pytest.raises(dom.CssSelectorError):
        dom.compile_css("+ b")


NTH = """
<ul id="u1"><li>a</li><li class="x">b</li><li>c</li><li>d</li><li>e</li></ul>
<ul id="u2"><li>f</li><li>g</li></ul>
<div><span>s</span><p>only-p</p></div>
"""


def _texts(root, sel):
    return [dom.text_content(e) for e in dom.css_select(root, sel)]


def test_css_pseudo_classes():
    root = dom.parse_html(NTH)
    # positional pseudos count ELEMENT siblings per parent, like goquery
    assert _texts(root, "li:first-child") == ["a", "f"]
    assert _texts(root, "li:last-child") == ["e", "g"]
    assert _texts(root, "li:nth-child(2)") == ["b", "g"]
    assert _texts(root, "li:nth-child(odd)") == ["a", "c", "e", "f"]
    assert _texts(root, "li:nth-child(2n)") == ["b", "d", "g"]
    assert _texts(root, "li:nth-child(n+4)") == ["d", "e"]
    assert _texts(root, "li:nth-child(-n+2)") == ["a", "b", "f", "g"]
    # :not over compounds, and stacking with other simple selectors
    assert _texts(root, "li:not(.x)") == ["a", "c", "d", "e", "f", "g"]
    assert _texts(root, "li:not(:first-child)") == ["b", "c", "d", "e", "g"]
    assert _texts(root, "ul#u1 > li.x:nth-child(2)") == ["b"]
    # p:first-child must NOT match a p whose previous sibling is a span
    assert _texts(root, "p:first-child") == []


OF_TYPE = """
<div id="m"><span>s1</span><p>p1</p><span>s2</span><p>p2</p><p>p3</p><em>e1</em></div>
<div id="n"><p>q1</p></div>
<div id="e"><i></i><i> </i><i>t</i><b><u></u></b></div>
<div id="l"><p lang="en">l1</p><p lang="en-US">l2</p><p lang="enx">l3</p></div>
"""


def test_css_of_type_family_and_empty():
    root = dom.parse_html(OF_TYPE)
    # *-of-type counts position among same-TAG element siblings only
    assert _texts(root, "#m p:first-of-type") == ["p1"]
    assert _texts(root, "#m p:last-of-type") == ["p3"]
    assert _texts(root, "#m span:last-of-type") == ["s2"]
    assert _texts(root, "#m p:nth-of-type(2)") == ["p2"]
    assert _texts(root, "#m p:nth-last-of-type(1)") == ["p3"]
    assert _texts(root, "#m p:nth-of-type(odd)") == ["p1", "p3"]
    assert _texts(root, "#m em:only-of-type") == ["e1"]
    assert _texts(root, "#m p:only-of-type") == []
    # only-child: sole ELEMENT child of its parent
    assert _texts(root, "#n p:only-child") == ["q1"]
    assert _texts(root, "#m p:only-child") == []
    # nth-last-child counts from the end per parent (NTH: u1 has 5, u2 has 2)
    nth = dom.parse_html(NTH)
    assert _texts(nth, "li:nth-last-child(1)") == ["e", "g"]
    assert _texts(nth, "li:nth-last-child(2n)") == ["b", "d", "f"]
    # :empty — no element children, no non-whitespace direct text
    # (cascadia semantics: whitespace-only text nodes don't count)
    empties = dom.css_select(root, "#e :empty")
    assert [e.tag for e in empties] == ["i", "i", "u"]
    # [attr|=] dash-match: exact value or value + '-' prefix
    assert _texts(root, '#l p[lang|="en"]') == ["l1", "l2"]


def test_css_contains_and_has():
    """cascadia's jQuery-extension pseudos (goquery dispatches through
    cascadia's full matcher, colly.go:1219-1237): :contains("text") is a
    case-insensitive substring over the element's text content (descendants
    included); :has(sel) is a subtree-scoped descendant-exists test."""
    root = dom.parse_html(
        '<ul><li><a href="/1">Download Now</a></li>'
        "<li><span>plain</span></li>"
        '<li class="x"><em>download</em> later</li></ul>'
    )
    # matches descendants' text, lowercased both sides
    assert _texts(root, 'a:contains("download")') == ["Download Now"]
    assert _texts(root, "li:contains(download)") == ["Download Now", "download later"]
    # :has scopes to the subtree; composes with other simple selectors
    assert _texts(root, "li:has(a)") == ["Download Now"]
    assert _texts(root, "li:has(em):not(.y)") == ["download later"]
    assert _texts(root, "ul:has(li.x em)") == ["Download Nowplaindownload later"]
    assert _texts(root, "li:has(div)") == []
    # :has never matches the element itself, only descendants
    assert _texts(root, "em:has(em)") == []
    import pytest

    with pytest.raises(dom.CssSelectorError):
        dom.compile_css("li:has()")


def test_css_pseudo_with_combinators():
    # the VERDICT's done-criterion: combinator interaction
    html = (
        '<ul><li><a href="1">one</a></li><li><a href="2">two</a></li></ul>'
        "<ol><li><em>x</em><a href='3'>three</a></li></ol>"
    )
    root = dom.parse_html(html)
    assert [e.get("href") for e in dom.css_select(root, "ul > li:first-child a")] == ["1"]
    assert [e.get("href") for e in dom.css_select(root, "li:first-child > a")] == ["1", "3"]
    assert [e.get("href") for e in dom.css_select(root, "li:last-child a")] == ["2", "3"]


SIBS = """
<article>
  <figure><img src="i1"><figcaption>cap1</figcaption><p>note</p></figure>
  <figure><p>lead</p><img src="i2"><span>gap</span><figcaption>cap2</figcaption></figure>
  <figcaption>stray</figcaption>
  <h2>t</h2><p>after-h2</p><em>e</em><p>late</p>
</article>
"""


def test_css_sibling_combinators():
    tree = dom.parse_html(SIBS)
    # adjacent: figcaption immediately after img (the flagship extraction shape)
    caps = dom.css_select(tree, "figure > img + figcaption")
    assert [dom.text_content(e) for e in caps] == ["cap1"]
    # general sibling: any figcaption after an img within the figure
    caps2 = dom.css_select(tree, "figure > img ~ figcaption")
    assert [dom.text_content(e) for e in caps2] == ["cap1", "cap2"]
    # adjacent after a heading
    assert [dom.text_content(e) for e in dom.css_select(tree, "h2 + p")] == ["after-h2"]
    # general sibling collects both following p's, in document order
    assert [dom.text_content(e) for e in dom.css_select(tree, "h2 ~ p")] == [
        "after-h2", "late",
    ]
    # '~' inside an attribute bracket is NOT a combinator
    assert dom.compile_css('[class~="z"]')[0][0][1] == [("attr", "class", "~=", "z")]


def test_css_descendant_backtracking():
    # nearest y ancestor's parent is NOT x, but an outer y's parent is —
    # a greedy nearest-ancestor matcher falsely rejects this (goquery doesn't)
    tree = dom.parse_html(
        '<x><y id="outer"><div><y id="inner"><z>hit</z></y></div></y></x>'
    )
    assert [dom.text_content(e) for e in dom.css_select(tree, "x > y z")] == ["hit"]
    # sibling backtracking: 'a ~ b c' where only the FARTHER preceding b
    # qualifies via its own left context
    tree2 = dom.parse_html(
        "<div><a>1</a><b><c>first</c></b><p>pad</p><b><c>second</c></b></div>"
    )
    got = [dom.text_content(e) for e in dom.css_select(tree2, "a ~ b c")]
    assert got == ["first", "second"]


def test_lenient_html_unclosed_tags():
    tree = dom.parse_html("<ul><li>a<li>b</ul><p>x<div>y</div>")
    assert [dom.text_content(e) for e in dom.css_select(tree, "li")] == ["a", "b"]
    assert dom.text_content(dom.css_select(tree, "div")[0]) == "y"


# ---------------------------------------------------------------------------
# reference test ports
# ---------------------------------------------------------------------------


def test_html_element_port():
    """TestHTMLElement (colly_test.go:1525-1562): one a[href] match with
    Name/Text/Attr surface."""
    matches = extract_one(
        b'<a href="http://go-colly.org">Colly</a>',
        "text/html", "http://x.test/", None,
        follow_links=False, extract_images=False,
        extractors=(ExtractorSpec(selector="a[href]"),),
    )
    assert len(matches) == 1
    sel_idx, elem_idx, kind, value, extra, tag, text, attrs, fields = matches[0]
    assert (sel_idx, elem_idx, kind) == (2, 0, "element")
    assert tag == "a"
    assert text == "Colly"
    assert attrs["href"] == "http://go-colly.org"


def test_collector_on_html_port():
    """TestCollectorOnHTML (colly_test.go:684-726): title text, 2 p matches
    with class attr, body ChildAttr/ChildAttrs."""
    extractors = (
        ExtractorSpec(selector="title"),
        ExtractorSpec(selector="p"),
        ExtractorSpec(
            selector="body",
            fields=(("first_class", "p", "class"), ("all_classes", "p", "class[]")),
        ),
    )
    matches = extract_one(
        REF_HTML, "text/html", "http://x.test/html", None,
        follow_links=False, extract_images=False, extractors=extractors,
    )
    titles = _by_sel(matches, 2)
    assert len(titles) == 1 and titles[0][3] == "Test Page"
    paragraphs = _by_sel(matches, 3)
    assert len(paragraphs) == 2
    assert all(m[7]["class"] == "description" for m in paragraphs)
    body = _by_sel(matches, 4)
    assert len(body) == 1
    assert body[0][8]["first_class"] == "description"
    assert json.loads(body[0][8]["all_classes"]) == ["description", "description"]


def test_collector_on_xml_with_html_port():
    """TestCollectorOnXMLWithHtml (colly_test.go:1564-1605): HTML-mode XPath
    because content-type contains 'html'."""
    extractors = (
        ExtractorSpec(selector="/html/head/title", xpath=True),
        ExtractorSpec(selector="/html/body/p", xpath=True),
        ExtractorSpec(
            selector="/html/body", xpath=True,
            fields=(("first_type", "p", "class"), ("all_types", "p", "class[]")),
        ),
    )
    matches = extract_one(
        REF_HTML, "text/html", "http://x.test/html", None,
        follow_links=False, extract_images=False, extractors=extractors,
    )
    titles = _by_sel(matches, 2)
    assert len(titles) == 1 and titles[0][3] == "Test Page"
    paragraphs = _by_sel(matches, 3)
    assert len(paragraphs) == 2
    assert all(m[7]["class"] == "description" for m in paragraphs)
    body = _by_sel(matches, 4)
    assert body[0][8]["first_type"] == "description"
    assert json.loads(body[0][8]["all_types"]) == ["description", "description"]


def _xml_port_extractors():
    return (
        ExtractorSpec(selector="//page/title", xpath=True),
        ExtractorSpec(selector="//page/paragraph", xpath=True),
        ExtractorSpec(
            selector="/page", xpath=True,
            fields=(("first_type", "paragraph", "type"),
                    ("all_types", "paragraph", "type[]")),
        ),
    )


def _assert_xml_port(matches):
    titles = _by_sel(matches, 2)
    assert len(titles) == 1 and titles[0][3] == "Test Page"
    paragraphs = _by_sel(matches, 3)
    assert len(paragraphs) == 2
    assert all(m[7]["type"] == "description" for m in paragraphs)
    body = _by_sel(matches, 4)
    assert body[0][8]["first_type"] == "description"
    assert json.loads(body[0][8]["all_types"]) == ["description", "description"]


def test_collector_on_xml_with_xml_port():
    """TestCollectorOnXMLWithXML (colly_test.go:1607-1653) at /xml."""
    matches = extract_one(
        REF_XML, "application/xml", "http://x.test/xml", None,
        follow_links=False, extract_images=False,
        extractors=_xml_port_extractors(),
    )
    _assert_xml_port(matches)


def test_collector_on_xml_compressed_port():
    """TestCollectorOnXMLWithXMLCompressed (colly_test.go:1655-1658): gzip
    body at a .xml.gz path, no content-type header — gunzip + sniff."""
    matches = extract_one(
        gzip.compress(REF_XML), None, "http://x.test/test.xml.gz", None,
        follow_links=False, extract_images=False,
        extractors=_xml_port_extractors(),
    )
    _assert_xml_port(matches)


def test_content_sniffing_port():
    """TestCollectorContentSniffing (colly_test.go:728-754): no Content-Type
    header -> body magic sniff -> OnHTML fires."""
    matches = extract_one(
        REF_HTML, None, "http://x.test/html", None,
        follow_links=False, extract_images=False,
        extractors=(ExtractorSpec(selector="html"),),
    )
    assert len(_by_sel(matches, 2)) == 1


def test_nonexistent_xml_gz_is_safe():
    """TestCollectorNonexistentXMLGZ shape: a .xml.gz URL serving a plain
    text 404 body must not crash the gunzip/parse path."""
    body = b"404 not found"
    assert maybe_gunzip(body, None, "/nonexistent.xml.gz") == body
    assert extract_one(body, None, "http://x.test/nonexistent.xml.gz", None,
                       follow_links=True, extract_images=False,
                       extractors=_xml_port_extractors()) == []
    assert extract_one(b"", None, "http://x.test/empty-response.xml.gz", None,
                       extractors=_xml_port_extractors()) == []


def test_sniff_and_gates():
    assert sniff_content_type(b"\x1f\x8b\x08rest").startswith("application/x-gzip")
    assert sniff_content_type(b"<?xml version='1.0'?><a/>") == "text/xml; charset=utf-8"
    assert sniff_content_type(b"  <html><body>x").startswith("text/html")
    assert sniff_content_type(b"plain words").startswith("text/plain")
    assert is_html_content_type("text/html; charset=utf-8")
    assert is_html_content_type("application/xhtml+xml")
    assert not is_html_content_type("application/json")
    assert is_xml_eligible("text/xml", "/a") == (True, False)
    assert is_xml_eligible("application/rss+xml", "/a") == (True, False)
    assert is_xml_eligible("text/html", "/a") == (True, True)
    assert is_xml_eligible(None, "/feed.xml") == (True, False)
    assert is_xml_eligible(None, "/feed.xml.gz") == (True, False)
    assert is_xml_eligible("application/json", "/a") == (False, False)


def test_charset_decode():
    """P0 charset fix (response.go:65-116): header charset decodes the
    body; DetectCharset falls back to a heuristic when the header is bare."""
    from colly_spark.operators.parse import body_text

    latin = "<html><body><p>café détour</p></body></html>".encode("latin-1")
    # header charset wins
    matches = extract_one(
        latin, "text/html; charset=iso-8859-1", "http://x.test/", None,
        follow_links=False, extract_images=False,
        extractors=(ExtractorSpec(selector="p"),),
    )
    assert matches[0][6] == "café détour"
    # without charset + without detection: replacement chars
    assert "café" not in body_text(latin, "text/html")
    # DetectCharset: invalid-UTF8 accented-Latin -> latin-1 family (the
    # statistical tail must NOT misread sparse accents as Cyrillic)
    assert body_text(latin, "text/html", detect=True) == latin.decode("latin-1")
    # BOM detection
    assert body_text("ü".encode("utf-8-sig"), None, detect=True) == "ü"
    # WHATWG meta prescan (first 1024 bytes): the declared label wins even
    # when the bytes would pass the UTF-8 probe or fall to latin-1
    cp1251 = "<html><head><meta charset=windows-1251></head><body>мир</body></html>".encode("windows-1251")
    assert "мир" in body_text(cp1251, "text/html", detect=True)
    meta_httpequiv = (b'<html><head><meta http-equiv="Content-Type" '
                      b'content="text/html; charset=iso-8859-1"></head>'
                      b'<body>caf\xe9</body></html>')
    assert "caf\xe9" in body_text(meta_httpequiv, "text/html", detect=True)
    # an unknown declared label is ignored, not fatal
    junk = b"<meta charset=not-a-codec><p>plain ascii</p>"
    assert "plain ascii" in body_text(junk, "text/html", detect=True)
    # the prescan window is 1024 bytes: a declaration past it is not seen
    # (pinned on detect_charset directly — the statistical tail now
    # recovers raw Cyrillic regardless, which body_text would show)
    from colly_spark.operators.parse import detect_charset

    far = b"<!--" + b"x" * 1100 + b"--><meta charset=koi8-r><p>ascii</p>"
    assert detect_charset(far) == "utf-8"
    # ... and the statistical tail (chardet parity, response.go:97-106)
    # recovers undeclared legacy encodings from the bytes alone:
    ru = ("Мы все учились понемногу, чему-нибудь и как-нибудь. "
          "Так воспитаньем, слава богу, у нас немудрено блеснуть.")
    assert "Мы все" in body_text(ru.encode("windows-1251"), "text/html", detect=True)
    assert "Мы все" in body_text(ru.encode("koi8-r"), "text/html", detect=True)


def test_fast_path_equals_dom_path():
    """The streaming built-ins kernel (crawl hot path) must produce
    byte-identical matches to the general DOM path on every fixture shape:
    quirky links, base tags, figure/img/figcaption in both orders, images
    outside figures, fragment links, implicit closers."""
    from colly_spark.fixtures import SiteSpec, build_site

    bodies = [p["body"] for p in build_site(SiteSpec(n_domains=2, pages_per_domain=6)).pages]
    bodies += [
        REF_HTML,
        b'<figure><figcaption> cap first </figcaption><img src="img://x"/></figure>',
        b'<figure><img src="img://a"/><img src="img://b"/><figcaption>c</figcaption></figure>',
        b'<img src="free"/><a href="#frag">f</a><a href="/go">g</a>',
        b'<base href="/sub/"><a href="child">c</a>',
        b'<ul><li><a href="/one">1</a><li><a href="/two">2</a></ul>',
        b'<figure><div><figcaption>nested <b>bold</b> cap</figcaption></div><img src="img://n"/></figure>',
        b'<figure><img src="img://nocap"/></figure>',
    ]
    for body in bodies:
        url = "http://x.test/page/0"
        fast = extract_one(body, "text/html", url, None, True, True, ())
        # force the DOM path by registering a never-matching extractor and
        # dropping its (empty) matches
        slow = [m for m in extract_one(
            body, "text/html", url, None, True, True,
            (ExtractorSpec(selector="nonexistenttag"),),
        ) if m[0] < 2]
        assert fast == slow, body


def test_follow_extractor_feeds_links():
    """A general 'follow' extractor emits absolutized link matches exactly
    like the built-in a[href] loop edge (request.go:122-124)."""
    body = b'<div class="nav"><a class="go" href="/x">x</a>' \
           b'<a class="stay" href="#frag">y</a></div>'
    matches = extract_one(
        body, "text/html", "http://x.test/start", None,
        follow_links=False, extract_images=False,
        extractors=(ExtractorSpec(selector="a.go", action="follow"),),
    )
    assert [(m[0], m[2], m[3]) for m in matches] == [(2, "link", "http://x.test/x")]


def test_xpath_text_attr_contains():
    """XPath depth beyond colly's own test forms (xmlelement.go:26-42
    evaluates full XPath 1.0): //x/text(), //x/@attr, contains()
    predicates in any step."""
    xml = (
        "<urlset>"
        "<url><loc>http://a.test/1</loc><pri>0.5</pri></url>"
        "<url><loc>http://b.test/2</loc></url>"
        "</urlset>"
    )
    tree = dom.parse_xml(xml)
    assert dom.xpath_select(tree, "//loc/text()") == [
        "http://a.test/1", "http://b.test/2",
    ]
    html = dom.parse_html(
        '<div><img src="i1.png"><a href="/dl/x">get</a>'
        '<a href="/page/y">view</a><p class="note alert">n</p></div>'
    )
    assert dom.xpath_select(html, "//img/@src") == ["i1.png"]
    got = dom.xpath_select(html, '//a[contains(@href, "dl")]')
    assert [e.get("href") for e in got] == ["/dl/x"]
    assert [e.tag for e in dom.xpath_select(html, '//p[contains(@class, "alert")]')] == ["p"]
    assert dom.xpath_select(html, '//a[contains(text(), "vie")]/@href') == ["/page/y"]
    # mid-path contains: the predicate filters that step, the path continues
    assert dom.xpath_select(html, '//div[contains(@class, "x")]/a') == []
    html2 = dom.parse_html(
        '<div class="box wide"><a href="/in">i</a></div>'
        '<div class="box"><a href="/out">o</a></div>'
    )
    assert dom.xpath_select(html2, '//div[contains(@class, "wide")]/a/@href') == ["/in"]
    # contains stacked with an attr-equality predicate in the same step
    assert dom.xpath_select(
        html2, '//div[contains(@class, "box")][@class="box"]/a/@href'
    ) == ["/out"]


def test_xpath_sibling_parent_axes():
    """parent::/../self::/following-sibling::/preceding-sibling:: with
    simple predicates; positional [n] counts along the axis direction
    (nearest-first on the reverse preceding-sibling axis), XPath 1.0
    semantics. Deeper tree axes stay loud-rejected
    (test_xpath_axes_rejected_loudly)."""
    xml = (
        "<r>"
        "<item><k>1</k><a>A1</a><b>B1</b><a>A2</a></item>"
        "<item><k>2</k><a>A3</a></item>"
        "</r>"
    )
    tree = dom.parse_xml(xml)
    # following-sibling from each <k>
    assert dom.xpath_select(tree, "//k/following-sibling::a/text()") == [
        "A1", "A2", "A3",
    ]
    assert dom.xpath_select(tree, "//k/following-sibling::a[1]/text()") == [
        "A1", "A3",
    ]
    assert dom.xpath_select(tree, "//b/preceding-sibling::a/text()") == ["A1"]
    # parent:: and '..' climb one level; node-set dedups
    assert [e.tag for e in dom.xpath_select(tree, "//a/parent::item")] == [
        "item", "item",
    ]
    assert [e.tag for e in dom.xpath_select(tree, "//a/..")] == ["item", "item"]
    assert dom.xpath_select(tree, "//b/../k/text()") == ["1"]
    # self:: with a predicate filters in place
    assert dom.xpath_select(tree, "//item/self::item[@missing]") == []
    assert len(dom.xpath_select(tree, "//item/self::item")) == 2


def test_xpath_positional_predicates():
    """[n] / [last()] / [last()-n] pass through ElementPath with XPath
    1.0's per-parent semantics (VERDICT r3 item 6): //item[1]/title is
    every channel's first item title, not the document's first match."""
    xml = (
        "<rss>"
        "<channel><item><title>A</title></item><item><title>B</title></item>"
        "<item><title>C</title></item></channel>"
        "<channel><item><title>D</title></item><item><title>E</title></item>"
        "</channel>"
        "</rss>"
    )
    tree = dom.parse_xml(xml)
    first = dom.xpath_select(tree, "//item[1]/title/text()")
    assert first == ["A", "D"]
    assert dom.xpath_select(tree, "//item[last()]/title/text()") == ["C", "E"]
    assert dom.xpath_select(tree, "//item[last()-1]/title/text()") == ["B", "D"]
    assert dom.xpath_select(tree, "/rss/channel[2]/item[2]/title/text()") == ["E"]
    # positional + attr tail compose
    html = dom.parse_html('<ul><li><a href="/a">a</a></li><li><a href="/b">b</a></li></ul>')
    assert dom.xpath_select(html, "//li[2]/a/@href") == ["/b"]


def test_xpath_tree_axes():
    """The deep tree axes (ancestor, descendant, following, preceding and
    the -or-self forms) — full XPath 1.0 surface xmlquery evaluates
    (xmlelement.go:26-42)."""
    xml = (
        "<r><s><a><x>inA</x></a><m/></s>"
        "<t><b/><n><y/></n></t></r>"
    )
    tree = dom.parse_xml(xml)
    # ancestor: nearest-first reverse axis; [1] is the closest match
    assert [e.tag for e in dom.xpath_select(tree, "//x/ancestor::*")] == [
        "r", "s", "a",  # node-set re-sorts to document order
    ]
    assert [e.tag for e in dom.xpath_select(tree, "//x/ancestor::*[1]")] == ["a"]
    assert [e.tag for e in dom.xpath_select(tree, "//x/ancestor-or-self::*[1]")] == ["x"]
    # descendant excludes self; descendant-or-self includes it
    assert [e.tag for e in dom.xpath_select(tree, "/r/t/descendant::*")] == [
        "b", "n", "y",
    ]
    assert [e.tag for e in dom.xpath_select(tree, "/r/t/descendant-or-self::*")] == [
        "t", "b", "n", "y",
    ]
    # following: document order after the node, its own subtree excluded;
    # preceding: before the node, ancestors excluded
    assert [e.tag for e in dom.xpath_select(tree, "//a/following::*")] == [
        "m", "t", "b", "n", "y",
    ]
    assert [e.tag for e in dom.xpath_select(tree, "//n/preceding::*")] == [
        "s", "a", "x", "m", "b",
    ]
    assert [e.tag for e in dom.xpath_select(tree, "//n/preceding::*[1]")] == ["b"]


def test_xpath_unsupported_rejected_loudly():
    """Whatever the evaluator does not implement raises ValueError, never a
    silent [] (a typo'd selector must not look like an empty page)."""
    import pytest

    tree = dom.parse_xml("<r><a/><b/></r>")
    for bad in ("//a/namespace::x",
                "//a[following::b]",  # named axes inside a predicate
                "//a[4 / 2 = 2]",  # '/' is a path, XPath divides with div
                "//a[foo(1)]",  # unknown function
                "//a[@n + ]",  # malformed expression
                "//a/attribute::href/parent::a"):
        with pytest.raises(ValueError):
            dom.xpath_select(tree, bad)
    # formerly-rejected forms the expression fallback now evaluates:
    # bare numeric truthiness (non-zero matches), string truthiness of a
    # substring over an absent attribute ('' is falsy), and arithmetic
    assert [e.tag for e in dom.xpath_select(tree, "//a[position() mod 2]")] == ["a"]
    assert dom.xpath_select(tree, "//a[substring(@href, 1)]") == []
    assert dom.xpath_select(tree, "//a[concat(@x, 'y') = 'zy']") == []
    assert dom.xpath_select(tree, "//a[@n + 1 = 2]") == []


def test_xpath_starts_with_and_text_equality():
    """starts-with() and [text()='v'] / [.='v'] predicates, any step."""
    tree = dom.parse_xml(
        "<list>"
        "<item><href>/docs/a</href><title>Alpha</title></item>"
        "<item><href>/blog/b</href><title>Beta</title></item>"
        "<item><href>/docs/c</href><title>Gamma</title></item>"
        "</list>"
    )
    docs = dom.xpath_select(tree, "//item[starts-with(href, '')]/title/text()")
    assert docs == ["Alpha", "Beta", "Gamma"]
    # starts-with over an attribute subject
    atree = dom.parse_xml(
        '<r><a href="/docs/a">x</a><a href="/blog/b">y</a>'
        '<a href="/docs/c">z</a></r>'
    )
    assert dom.xpath_select(atree, "//a[starts-with(@href, '/docs')]/text()")         == ["x", "z"]
    # text() equality, direct-text semantics
    assert dom.xpath_select(atree, "//a[text()='y']/@href") == ["/blog/b"]
    # [.='v'] full text content equality in a mid step
    assert dom.xpath_select(tree, "//item/title[.='Beta']/text()") == ["Beta"]
    # stepwise interaction: starts-with then a sibling axis
    assert dom.xpath_select(
        atree, "//a[starts-with(@href, '/blog')]/following-sibling::a/@href"
    ) == ["/docs/c"]


def test_xpath_string_results_through_extractor():
    from colly_spark.config import ExtractorSpec
    from colly_spark.operators.parse import extract_one

    body = (
        b"<?xml version='1.0'?><urlset>"
        b"<url><loc>http://a.test/1</loc></url>"
        b"<url><loc>relative/2</loc></url></urlset>"
    )
    spec = ExtractorSpec(selector="//loc/text()", xpath=True, action="follow")
    out = extract_one(body, "application/xml", "http://a.test/sitemap.xml", None,
                      follow_links=False, extract_images=False, extractors=(spec,))
    assert [(m[2], m[3]) for m in out] == [
        ("link", "http://a.test/1"), ("link", "http://a.test/relative/2"),
    ]
    spec2 = ExtractorSpec(selector="//loc/text()", xpath=True, name="locs")
    out2 = extract_one(body, "application/xml", "http://a.test/sitemap.xml", None,
                       follow_links=False, extract_images=False, extractors=(spec2,))
    assert [m[3] for m in out2] == ["http://a.test/1", "relative/2"]


def test_css_element_state_pseudos():
    """cascadia's :root/:checked/:disabled/:enabled/:link pseudos."""
    root = dom.parse_html(
        "<html><body>"
        '<form><input type="checkbox" checked id="c1">'
        '<input type="checkbox" id="c2">'
        '<input type="radio" checked id="r1">'
        '<input type="text" id="t1">'
        '<select><option selected id="o1">a</option><option id="o2">b</option></select>'
        '<button disabled id="b1">x</button><button id="b2">y</button>'
        "</form>"
        '<a href="/x" id="a1">l</a><a id="a2">n</a><div id="d1"></div>'
        "</body></html>"
    )
    ids = lambda sel: [e.get("id") for e in dom.css_select(root, sel)]
    assert ids(":checked") == ["c1", "r1", "o1"]
    assert ids("input:checked") == ["c1", "r1"]
    assert ids(":disabled") == ["b1"]
    assert ids("button:enabled") == ["b2"]
    # a text input is enabled; a div is not a form control at all
    assert "t1" in ids(":enabled") and "d1" not in ids(":enabled")
    assert ids("a:link") == ["a1"]
    assert [e.tag for e in dom.css_select(root, ":root")] == ["html"]
    assert ids(":root > body a:link") == ["a1"]


def test_xpath_function_predicates():
    """position()/not()/normalize-space() predicates (VERDICT r4 item 6;
    reference xmlquery evaluates full XPath 1.0, xmlelement.go:26-42)."""
    import pytest

    tree = dom.parse_xml(
        "<list>"
        '<item><a href="/a">Alpha</a></item>'
        '<item><a href="/b">  Beta   two </a></item>'
        "<item><a>Gamma</a></item>"
        '<item><a href="/d">Delta</a></item>'
        "</list>"
    )
    sel = lambda p: dom.xpath_select(tree, p)
    txt = lambda p: [dom.text_content(e).strip() for e in sel(p)]

    # position() with every comparison op, per-parent ('//' step) and
    # relative-step contexts
    assert txt("//item[position()>2]/a") == ["Gamma", "Delta"]
    assert txt("//list/item[position()<=2]/a") == ["Alpha", "Beta   two"]
    assert txt("//list/item[position()!=1]/a") == ["Beta   two", "Gamma", "Delta"]
    assert txt("//list/item[position()=4]/a") == ["Delta"]
    # per-PARENT proximity: position() inside '//' counts within each parent
    ptree = dom.parse_xml("<r><g><x>1</x><x>2</x></g><g><x>3</x><x>4</x></g></r>")
    assert [dom.text_content(e) for e in dom.xpath_select(ptree, "//x[position()=2]")] == ["2", "4"]

    # not() over attribute, function, and child-tag predicates
    assert txt("//item/a[not(@href)]") == ["Gamma"]
    assert txt("//item/a[not(contains(@href,'b'))]") == ["Alpha", "Gamma", "Delta"]
    assert txt("//list/item[not(a)]") == []

    # normalize-space(): bare (string(.)), of text(), of an attribute
    assert txt("//a[normalize-space()='Beta two']") == ["Beta   two"]
    assert txt("//a[contains(normalize-space(text()),'Beta two')]") == ["Beta   two"]
    assert sel("//a[starts-with(normalize-space(@href),'/d')]/@href") == ["/d"]

    # last()-n in a stepwise path, and position composing after an axis
    assert txt("//list/item[last()-2]/a") == ["Beta   two"]
    assert txt("//item[2]/following-sibling::item[position()<=1]/a") == ["Gamma"]

    # not() of a positional term: per XPath, not(2) = not(boolean(2)) =
    # false everywhere (the expression fallback carries position context)
    assert sel("//item[not(2)]") == []
    assert txt("//item[not(position()=2) and position()<=2]/a") == ["Alpha"]


def test_xpath_quoted_brackets_in_literals():
    """A ']' or '/' inside a predicate string literal is content, not
    structure (ADVICE r4: the splitter must be quote-aware)."""
    tree = dom.parse_xml(
        '<r><a href="x]/y">one</a><a href="plain">two</a></r>'
    )
    assert [dom.text_content(e) for e in
            dom.xpath_select(tree, "//a[contains(@href,']/y')]")] == ["one"]
    assert dom.xpath_select(tree, "//a[@href='x]/y']/text()") == ["one"]


def test_css_is_where_grouping():
    """:is()/:where() match-any grouping (cascadia-style), comma-aware
    splitting inside parens and quoted :contains arguments."""
    import pytest

    root = dom.parse_html(
        "<html><body>"
        '<h1 id="h">t</h1><h2 id="h2">s</h2>'
        '<p id="p1" class="x">one,two</p><p id="p2">b</p>'
        '<div id="d"><span id="s">q</span></div>'
        "</body></html>"
    )
    ids = lambda sel: [e.get("id") for e in dom.css_select(root, sel)]
    assert ids(":is(h1, h2)") == ["h", "h2"]
    assert ids(":where(h1, p.x)") == ["h", "p1"]      # alias of :is here
    assert ids("div :is(span, em)") == ["s"]
    assert ids(":is(p:not(.x))") == ["p2"]            # one nesting level
    # CSS4 list argument to :not — none of the alternatives may match
    assert ids("p:not(.x, #p2)") == []
    # a top-level comma inside a quoted :contains argument is content
    assert ids('p:contains("one,two")') == ["p1"]
    # group + :is in the same selector string
    assert ids(":is(h1, h2), p.x") == ["h", "h2", "p1"]
    for bad in (":is()", ":where( , )", "p:not(.x,)"):
        with pytest.raises(dom.CssSelectorError):
            dom.css_select(root, bad)


def test_css_nth_child_of_selector():
    """':nth-child(An+B of S)': position counts among siblings matching S,
    and the element itself must match S."""
    import pytest

    root = dom.parse_html(
        "<ul>"
        '<li class="a" id="l1">1</li><li class="b" id="l2">2</li>'
        '<li class="a" id="l3">3</li><li class="b" id="l4">4</li>'
        '<li class="a" id="l5">5</li>'
        "</ul>"
    )
    ids = lambda sel: [e.get("id") for e in dom.css_select(root, sel)]
    assert ids(":nth-child(2n+1 of .a)") == ["l1", "l5"]
    assert ids(":nth-child(even of li.a)") == ["l3"]
    assert ids(":nth-last-child(1 of .b)") == ["l4"]
    assert ids("li:nth-child(1 of .a, .b)") == ["l1"]   # selector-list S
    # plain an+b still counts ALL element siblings
    assert ids(":nth-child(2)") == ["l2"]
    with pytest.raises(dom.CssSelectorError):
        dom.css_select(root, ":nth-child(2 of )")


def test_xpath_attribute_axis_spelling():
    """'attribute::x' normalizes to '@x' (final step and predicates); the
    mid-path attribute axis stays a loud reject."""
    import pytest

    tree = dom.parse_xml('<r><a href="/x">one</a><a>two</a></r>')
    assert dom.xpath_select(tree, "//a/attribute::href") == ["/x"]
    assert dom.xpath_select(tree, "//a[attribute::href]/text()") == ["one"]
    assert dom.xpath_select(
        tree, "//a[contains(attribute::href,'x')]/text()"
    ) == ["one"]
    with pytest.raises(ValueError):
        dom.xpath_select(tree, "//attribute::href/parent::a")


def test_xpath_numeric_comparisons_count_stringlength():
    """XPath 1.0 number() comparisons — [@a OP n], [text() OP n],
    [child OP n] (node-set: ANY child), count(), string-length(), and the
    string != form (reference xmlquery is full XPath 1.0,
    xmlelement.go:26-42)."""
    import pytest

    tree = dom.parse_xml(
        "<cat>"
        '<prod rank="3"><price>12.5</price><tag>x</tag><tag>y</tag>'
        "<name>Widget</name></prod>"
        '<prod rank="10"><price>7</price><name>Gadget</name></prod>'
        '<prod rank="n/a"><price>30</price><price>2</price>'
        "<name>Gizmo</name></prod>"
        "<prod><name>Nameless</name></prod>"
        "</cat>"
    )
    names = lambda p: [
        dom.text_content(e) for e in dom.xpath_select(tree, p + "/name")
    ]

    # attribute numeric comparisons; non-numeric ('n/a') and absent -> false
    assert names("//prod[@rank > 5]") == ["Gadget"]
    assert names("//prod[@rank <= 3]") == ["Widget"]
    assert names("//prod[@rank = 10]") == ["Gadget"]
    assert names("//prod[@rank != 3]") == ["Gadget"]  # numeric != over node-set
    # child-element numeric comparison: ANY matching child satisfies
    assert names("//prod[price < 10]") == ["Gadget", "Gizmo"]
    assert names("//prod[price >= 12.5]") == ["Widget", "Gizmo"]
    # count() of a child test (and '*'), composing with other predicates
    assert names("//prod[count(tag) = 2]") == ["Widget"]
    assert names("//prod[count(price) > 1]") == ["Gizmo"]
    assert names("//prod[count(*) = 1]") == ["Nameless"]
    assert names("//prod[count(tag) = 0][price > 1]") == ["Gadget", "Gizmo"]
    # string-length of an attribute / bare (string(.))
    assert names("//prod[string-length(@rank) = 3]") == ["Gizmo"]
    assert [dom.text_content(e) for e in
            dom.xpath_select(tree, "//name[string-length() > 6]")] == ["Nameless"]
    # string inequality (quoted literal), absent attr compares false
    assert names("//prod[@rank != '3']") == ["Gadget", "Gizmo"]
    # text() numeric comparison inside a deeper step
    assert [dom.text_content(e) for e in
            dom.xpath_select(tree, "//price[text() > 12]")] == ["12.5", "30"]
    # not() composes with the numeric forms
    assert names("//prod[not(count(price) > 0)]") == ["Nameless"]
    # multi-step count() arguments evaluate as child-axis paths now
    assert names("//prod[count(a/b) > 1]") == []  # no prod has nested a/b
    # last() compares as this step's per-context size (4 prods: > 2 is
    # position-independently true, = position() picks the final one)
    assert names("//prod[last() > 2]") == ["Widget", "Gadget", "Gizmo", "Nameless"]
    assert names("//prod[position() = last()]") == ["Nameless"]


def test_xpath_string_functions_and_mod():
    """XPath 1.0 substring()/translate()/substring-before/-after as
    predicate subjects, and mod on position() or any numeric subject
    (reference xmlquery is full XPath 1.0, xmlelement.go:26-42)."""
    import pytest

    tree = dom.parse_xml(
        "<links>"
        '<a href="https://example.com/docs/intro" n="4">Intro</a>'
        '<a href="http://example.org/blog/post" n="7">Post</a>'
        '<a href="https://other.net/docs/ref" n="10">Ref</a>'
        "<a>NoHref</a>"
        "</links>"
    )
    texts = lambda p: [dom.text_content(e) for e in dom.xpath_select(tree, p)]

    # substring(): XPath 1-based positions, optional length, rounding
    assert texts("//a[substring(@href, 1, 5) = 'https']") == ["Intro", "Ref"]
    assert texts("//a[substring(@href, 5, 1) != 's']") == ["Post"]
    # start beyond the string -> empty; absent attr -> comparison false
    assert texts("//a[substring(@href, 200) = '']") == ["Intro", "Post", "Ref"]
    # fractional positions round (floor(x+0.5)) per the spec:
    # substring(x, 2, 3) — chars 2-4 are 'ttp' for http and https alike
    assert texts("//a[substring(@href, 1.7, 3.2) = 'ttp']") == [
        "Intro", "Post", "Ref"]

    # substring-before / substring-after
    assert texts("//a[substring-before(@href, ':') = 'http']") == ["Post"]
    assert texts(
        "//a[starts-with(substring-after(@href, '//'), 'example')]"
    ) == ["Intro", "Post"]
    # separator absent from the string -> '' (not the whole string)
    assert texts("//a[substring-after(@href, '#') = '']") == [
        "Intro", "Post", "Ref"]

    # translate(): mapping, surplus-from chars delete, first mapping wins
    assert texts(
        "//a[translate(substring(@href, 1, 5), 'https', 'HTTPS') = 'HTTPS']"
    ) == ["Intro", "Ref"]
    assert texts("//a[translate(@href, ':/', '') = "
                 "'httpsexample.comdocsintro']") == ["Intro"]

    # string functions compose with numeric comparisons
    assert texts("//a[string-length(substring-after(@href, '//')) > 21]") == [
        "Intro"]

    # position() mod N OP K — odd/even selection along the step
    assert texts("//a[position() mod 2 = 1]") == ["Intro", "Ref"]
    assert texts("//a[position() mod 2 = 0]") == ["Post", "NoHref"]
    # mod on a numeric subject; XPath mod keeps the dividend's sign
    assert texts("//a[@n mod 3 = 1]") == ["Intro", "Post", "Ref"]
    assert texts("//a[@n mod 4 = 2]") == ["Ref"]  # 4%4=0, 7%4=3, 10%4=2

    # loud rejects: non-literal substring positions, bad arity
    with pytest.raises(ValueError):
        dom.xpath_select(tree, "//a[substring(@href, @n) = 'x']")
    with pytest.raises(ValueError):
        dom.xpath_select(tree, "//a[translate(@href, 'x') = 'y']")


def test_xpath_expression_fallback():
    """General XPath 1.0 predicate expressions — boolean or/and, arithmetic
    (+ - * div mod), computed-vs-computed comparisons, concat()/boolean()/
    number()/string() — via the recursive-descent fallback that runs when
    the pinned special forms reject a body (reference xmlquery evaluates
    full XPath 1.0, xmlelement.go:26-42)."""
    import pytest

    tree = dom.parse_xml(
        "<ul>"
        "<li>a</li><li>b</li><li>c</li><li>d</li>"
        '<s n="3">s</s>'
        "</ul>"
    )
    txt = lambda p: [dom.text_content(e) for e in dom.xpath_select(tree, p)]

    # boolean structure, with and binding tighter than or
    assert txt("//li[position()=1 or position()=3]") == ["a", "c"]
    assert txt("//li[text() = 'a' or text() = 'd']") == ["a", "d"]
    assert txt("//li[contains(., 'a') or contains(., 'b')]") == ["a", "b"]
    assert txt(
        "//li[position()=4 or position()=1 and text()='x']") == ["d"]
    # computed comparisons on both sides
    assert txt("//li[position() < last()]") == ["a", "b", "c"]
    assert txt("//li[position() = last() - 1]") == ["c"]
    # arithmetic: + - * div mod, unary minus, attr coercion
    assert txt("//li[position() + 1 = 2]") == ["a"]
    assert txt("//s[@n * 2 = 6]") == ["s"]
    assert txt("//li[8 div 4 = 2]") == ["a", "b", "c", "d"]
    assert txt("//li[5 mod 2 = 1]") == ["a", "b", "c", "d"]
    assert txt("//li[-1 + 2 = 1]") == ["a", "b", "c", "d"]
    assert txt("//li[1 div 0 > 1000000]") == ["a", "b", "c", "d"]  # +Inf
    assert txt("//li[0 div 0 = 0 div 0]") == []  # NaN = NaN is false
    # string/boolean/number functions, nesting
    assert txt("//li[concat(text(), 'x') = 'ax']") == ["a"]
    assert txt("//s[boolean(@n)]") == ["s"]
    assert txt("//li[boolean(@n)]") == []
    assert txt("//li[string(position()) = '2']") == ["b"]
    assert txt("//li[number('2') > 1 and position() <= 2]") == ["a", "b"]
    assert txt("//li[normalize-space(concat(' ', text(), ' ')) = 'c']") == ["c"]
    assert txt("//li[substring(text(),1,1) = 'b' or . = 'c']") == ["b", "c"]
    # a quoted literal may contain the OTHER quote kind and ' or '
    assert txt('//li[text() = "x or y" or text() = \'a\']') == ["a"]
    # node-set existential comparison over an attribute
    assert txt("//s[@n = 3]") == ["s"]
    assert txt("//s[@n != 4]") == ["s"]
    # parse failures stay loud
    for bad in ("//li[position() ==1]", "//li[@a =]", "//li[foo(,)]",
                "//li[concat(text())]"):  # concat needs >= 2 args
        with pytest.raises(ValueError):
            dom.xpath_select(tree, bad)


def test_xpath_union_operator():
    """Top-level '|' union: node-set union in document order with identical
    nodes deduped; text()/@attr tails concatenate per operand; mixed
    element/string unions reject (xmlquery evaluates full XPath 1.0 unions,
    xmlelement.go:26-42). Without this, ElementPath silently returned []."""
    import pytest

    tree = dom.parse_xml("<r><a>1</a><b>2</b><c>3</c><a>4</a></r>")
    txt = lambda p: [e.text for e in dom.xpath_select(tree, p)]
    assert txt("//a | //b") == ["1", "2", "4"]  # doc order, not operand order
    assert txt("//b | //a") == ["1", "2", "4"]
    assert txt("//a | //a") == ["1", "4"]  # same nodes dedup
    assert txt("//a[text()='1'] | //c | //missing") == ["1", "3"]
    html = dom.parse_html('<p><a href="/x">x</a><img src="/i.png"/></p>')
    assert dom.xpath_select(html, "//a/@href | //img/@src") == ["/x", "/i.png"]
    with pytest.raises(ValueError):
        dom.xpath_select(html, "//a | //img/@src")  # mixed operand kinds
    with pytest.raises(ValueError):
        dom.xpath_select(tree, "//a | ")  # empty operand
    # '|' inside a string literal is content, not a union separator
    assert txt("//a[text() != 'x|y']") == ["1", "4"]
    # boolean-literal predicates route through the expression fallback
    assert txt("//a[true()]") == ["1", "4"]
    assert txt("//a[false()]") == []
    assert txt("//r[name() = 'r']/a") == ["1", "4"]


def test_xpath_keyword_named_elements():
    """Elements named 'or'/'and'/'div'/'mod' are operands when they appear
    at a value position and operators only after a complete operand — the
    XPath 1.0 lexical disambiguation rule."""
    tree = dom.parse_xml(
        '<r><a n="2">x</a><or>keep</or><div>d</div><mod>m</mod></r>'
    )
    txt = lambda p: [e.text for e in dom.xpath_select(tree, p)]
    assert txt("//r[or = 'keep']/a") == ["x"]
    assert txt("//r[div]/a") == ["x"]
    assert txt("//r[count(div) + count(mod) = 2]/a") == ["x"]
    assert txt("//a[@n div 2 = 1]") == ["x"]
    assert txt("//a[@n mod 2 = 0]") == ["x"]
    assert txt("//a[-(-(@n)) = 2]") == ["x"]
    assert txt("//a[((1 + 2) * 2) = 6]") == ["x"]
    assert txt("//r[count(a) < count(*)]/a") == ["x"]


def test_xpath_attribute_axis_spelling_quote_safe():
    """'attribute::' normalizes to '@' only OUTSIDE string literals — a
    needle containing '/attribute::' is content, not an axis."""
    tree = dom.parse_xml(
        '<r><a href="x/attribute::y">one</a><a href="plain">two</a></r>'
    )
    got = [dom.text_content(e) for e in
           dom.xpath_select(tree, "//a[contains(@href, 'x/attribute::y')]")]
    assert got == ["one"]
    # the unquoted spelling still normalizes
    assert dom.xpath_select(tree, "//a/attribute::href") == [
        "x/attribute::y", "plain"]


def test_xpath_location_path_predicate_operands():
    """Relative child-axis paths as predicate values — [a/b = 'v'],
    count(a/b), contains(a/@href, 'x'), a/text(), wildcard steps — the
    XPath 1.0 location-path-operand surface xmlquery evaluates
    (xmlelement.go:26-42). Descendant '//' inside predicates and '/' as
    division stay loud rejects."""
    tree = dom.parse_xml(
        "<cat>"
        "<prod><info><sku>A1</sku></info><a href='/x/1'>l</a>"
        "<name>W</name></prod>"
        "<prod><info><sku>B2</sku></info><name>G</name></prod>"
        "<prod><info><sku>A9</sku><sku>A8</sku></info><name>Z</name></prod>"
        "</cat>"
    )
    names = lambda p: [e.text for e in dom.xpath_select(tree, p + "/name")]
    assert names("//prod[info/sku = 'A1']") == ["W"]
    assert names("//prod[count(info/sku) > 1]") == ["Z"]
    assert names("//prod[contains(a/@href, '/x/')]") == ["W"]
    assert names("//prod[starts-with(info/sku, 'A')]") == ["W", "Z"]
    assert names("//prod[info/sku/text() = 'B2']") == ["G"]
    assert names("//prod[*/sku]") == ["W", "G", "Z"]
    assert names("//prod[*/sku = 'B2']") == ["G"]
    assert names("//prod[not(a/@href)]") == ["G", "Z"]


def test_xpath_descendant_paths_in_predicates():
    """'.//x' and 'a//b' location paths as predicate operands — the
    scraper idiom [.//img] / [.//sku = 'v'] (xmlquery: full XPath 1.0,
    xmlelement.go:26-42). Node identity dedups the walk; './' alone and
    the ambiguous './/@x' stay loud rejects."""
    import pytest

    tree = dom.parse_xml(
        "<cat>"
        "<prod><info><sku>A1</sku></info><a href='/x/1'><img src='i.png'/>"
        "</a><name>W</name></prod>"
        "<prod><info><deep><sku>B2</sku></deep></info><name>G</name></prod>"
        "<prod><name>Z</name></prod>"
        "</cat>"
    )
    names = lambda p: [e.text for e in dom.xpath_select(tree, p + "/name")]
    assert names("//prod[.//sku]") == ["W", "G"]
    assert names("//prod[.//sku = 'B2']") == ["G"]
    assert names("//prod[.//img]") == ["W"]
    assert names("//prod[info//sku = 'B2']") == ["G"]
    assert names("//prod[count(.//sku) = 1]") == ["W", "G"]
    assert names("//prod[not(.//sku)]") == ["Z"]
    assert names("//prod[contains(.//a/@href, '/x/')]") == ["W"]
    for bad in ("//prod[./]", "//prod[.//@x]"):
        with pytest.raises(ValueError):
            dom.xpath_select(tree, bad)
