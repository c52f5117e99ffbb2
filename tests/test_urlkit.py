"""Ports of the reference's URL canonicalization tests.

TestTabsAndNewlines (colly_test.go:1187-1217), TestLonePercent
(colly_test.go:1219-1250), normalizeURL trailing-slash behavior
(colly.go:1661-1667), AbsoluteURL fragment rule (request.go:101-117).
"""

from colly_spark.urlkit import absolutize, canonicalize, hostname, path_query


def test_tabs_and_newlines_stripped():
    assert canonicalize("http://x.test/\tpa\nge/7\r") == "http://x.test/page/7"
    assert canonicalize("ht\ttp://x.test/a") == "http://x.test/a"


def test_lone_percent_encoded():
    assert canonicalize("http://x.test/lone%") == "http://x.test/lone%25"
    assert canonicalize("http://x.test/p?x=100%") == "http://x.test/p?x=100%25"
    # valid escapes untouched
    assert canonicalize("http://x.test/a%20b") == "http://x.test/a%20b"


def test_root_path_normalized():
    assert canonicalize("http://X.Test") == "http://x.test/"
    assert canonicalize("http://x.test") == canonicalize("http://x.test/")


def test_trailing_slash_on_nonroot_preserved():
    assert canonicalize("http://x.test/a/") == "http://x.test/a/"
    assert canonicalize("http://x.test/a") != canonicalize("http://x.test/a/")


def test_default_port_stripped_and_kept():
    assert canonicalize("http://x.test:80/a") == "http://x.test/a"
    assert canonicalize("https://x.test:443/a") == "https://x.test/a"
    assert canonicalize("http://x.test:8080/a") == "http://x.test:8080/a"


def test_fragment_dropped():
    assert canonicalize("http://x.test/a#frag") == "http://x.test/a"


def test_dot_segments_resolved():
    assert canonicalize("http://x.test/a/../b/./c") == "http://x.test/b/c"


def test_unparseable_and_relative_rejected():
    assert canonicalize(None) is None
    assert canonicalize("") is None
    assert canonicalize("/relative/only") is None
    assert canonicalize("http://") is None


def test_absolutize():
    assert absolutize("http://x.test/sub/dir/", "child") == "http://x.test/sub/dir/child"
    assert absolutize("http://x.test/page/0", "2") == "http://x.test/page/2"
    assert absolutize("http://x.test/a", "/b") == "http://x.test/b"
    assert absolutize("http://x.test/a", "#frag") is None  # request.go:102-104
    assert absolutize("http://x.test/a", "http://y.test/z") == "http://y.test/z"


def test_hostname_and_path_query():
    u = canonicalize("http://D00.Test:80/Allowed?q=1#f")
    assert hostname(u) == "d00.test"
    assert path_query(u) == "/Allowed?q=1"
