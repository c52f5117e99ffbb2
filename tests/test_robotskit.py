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


def test_crawl_delay_parsing_and_group_resolution():
    from colly_spark.robotskit import parse_robots, robots_crawl_delay

    body = (
        "User-agent: *\n"
        "Crawl-delay: 2\n"
        "Disallow: /x\n"
        "\n"
        "User-agent: specialbot\n"
        "Crawl-delay: 0.5\n"
        "\n"
        "User-agent: badbot\n"
        "Crawl-delay: soon\n"   # unparseable -> ignored
    )
    r = parse_robots(body)
    assert r.crawl_delay("anything") == 2.0          # * fallback
    assert r.crawl_delay("SpecialBot/1.0") == 0.5    # longest agent match
    # badbot has its OWN group whose delay line is invalid: REP says a UA
    # obeys exactly one group, so no delay applies — not the * fallback
    assert r.crawl_delay("badbot") is None
    assert robots_crawl_delay(None, "x") is None
    assert robots_crawl_delay("User-agent: *\nDisallow:\n", "x") is None
    # a specific group that declares NO delay shields its UA from *'s
    shielded = (
        "User-agent: specialbot\nDisallow:\n\n"
        "User-agent: *\nCrawl-delay: 10\n"
    )
    assert parse_robots(shielded).crawl_delay("specialbot") is None
    assert parse_robots(shielded).crawl_delay("otherbot") == 10.0


def test_crawl_delay_does_not_break_allow_rules():
    """A Crawl-delay line inside a group must not terminate the group's
    Allow/Disallow accumulation (rules_open bookkeeping)."""
    from colly_spark.robotskit import parse_robots

    body = (
        "User-agent: *\n"
        "Crawl-delay: 1\n"
        "Disallow: /private\n"
    )
    r = parse_robots(body)
    assert not r.allowed("bot", "/private/x")
    assert r.allowed("bot", "/public")
    assert r.crawl_delay("bot") == 1.0
