"""robots.txt evaluator tests — ports of TestRobotsWhenAllowed /
TestRobotsWhenDisallowed / DisallowedWithQueryParameter
(colly_test.go:1267-1319) against the reference's fixture robots body
(colly_test.go:55-60)."""

from colly_spark.fixtures import DEFAULT_ROBOTS_BODY
from colly_spark.robotskit import robots_allowed


def test_allowed_path():
    assert robots_allowed(DEFAULT_ROBOTS_BODY, "colly", "/allowed")


def test_disallowed_path():
    assert not robots_allowed(DEFAULT_ROBOTS_BODY, "colly", "/disallowed")
    assert not robots_allowed(DEFAULT_ROBOTS_BODY, "colly", "/disallowed/sub")


def test_disallowed_with_query_parameter():
    # wildcard rule 'Disallow: /allowed*q=' — query participates in matching
    assert not robots_allowed(DEFAULT_ROBOTS_BODY, "colly", "/allowed?q=1")
    assert robots_allowed(DEFAULT_ROBOTS_BODY, "colly", "/allowed?x=1")


def test_unlisted_path_allowed():
    assert robots_allowed(DEFAULT_ROBOTS_BODY, "colly", "/other")


def test_empty_body_allows_everything():
    assert robots_allowed(None, "ua", "/anything")
    assert robots_allowed("", "ua", "/anything")


def test_specific_agent_group_wins():
    body = "User-agent: badbot\nDisallow: /\n\nUser-agent: *\nAllow: /\n"
    assert not robots_allowed(body, "badbot/1.0", "/x")
    assert robots_allowed(body, "goodbot", "/x")


def test_longest_rule_wins():
    body = "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
    assert not robots_allowed(body, "ua", "/a/c")
    assert robots_allowed(body, "ua", "/a/b/c")


def test_end_anchor():
    body = "User-agent: *\nDisallow: /exact$\n"
    assert not robots_allowed(body, "ua", "/exact")
    assert robots_allowed(body, "ua", "/exactly")
