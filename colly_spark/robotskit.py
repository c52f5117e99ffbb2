"""robots.txt evaluator with wildcard support (F6).

Reproduces the matching semantics the reference gets from its robotstxt
library (colly.go:893-905 ``FindGroup(UserAgent).Test(path?query)``):

- user-agent groups, longest-prefix agent match, ``*`` fallback group,
- ``Allow``/``Disallow`` rules with ``*`` wildcards and ``$`` end anchor,
- longest-rule-wins; tie -> Allow wins (Google/REP semantics),
- empty Disallow == allow all; no matching rule == allowed,
- the query string participates in matching (colly_test.go:1304-1319).

stdlib ``urllib.robotparser`` is NOT used: it lacks ``*`` wildcard support,
which the reference's fixture robots file relies on
(``Disallow: /allowed*q=``, colly_test.go:55-60).
"""

from __future__ import annotations

import re
from functools import lru_cache


def _rule_regex(pattern: str) -> re.Pattern:
    """Compile a robots path pattern ('*' wildcard, '$' anchor) to a regex."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    body = "(?:.*?)".join(parts)
    return re.compile("^" + body + ("$" if anchored else ""))


class RobotsRules:
    """Parsed rule groups for one robots.txt body."""

    __slots__ = ("groups", "delays", "sitemaps")

    def __init__(self, body: str):
        # groups: list of (agent_lower, [(is_allow, pattern, weight)])
        self.groups: list[tuple[str, list[tuple[bool, str]]]] = []
        # delays: agent_lower -> Crawl-delay seconds (float). The reference's
        # robots library (temoto/robotstxt, CrawlDelay field) parses this
        # even though colly itself never reads it — exposed here for the
        # opt-in politeness integration (CrawlConfig.respect_crawl_delay);
        # parity with colly is the default-off path.
        self.delays: dict[str, float] = {}
        # Sitemap: lines are GLOBAL per the sitemaps.org protocol — they
        # belong to no user-agent group and don't affect group bookkeeping
        self.sitemaps: list[str] = []
        current_agents: list[str] = []
        rules_open = False
        for raw_line in (body or "").splitlines():
            line = raw_line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                if rules_open:
                    current_agents = []
                    rules_open = False
                agent = val.lower()
                current_agents.append(agent)
                self.groups.append((agent, []))
            elif key in ("allow", "disallow"):
                rules_open = True
                if not current_agents:
                    continue
                for g_agent, g_rules in self.groups:
                    if g_agent in current_agents:
                        g_rules.append((key == "allow", val))
            elif key == "sitemap":
                if val:
                    self.sitemaps.append(val)
            elif key == "crawl-delay":
                rules_open = True
                try:
                    secs = float(val)
                except ValueError:
                    continue
                if secs >= 0:
                    for agent in current_agents:
                        self.delays[agent] = secs

    def _group_for(self, user_agent: str) -> list[tuple[bool, str]] | None:
        ua = (user_agent or "").lower()
        best: tuple[int, list] | None = None
        star: list | None = None
        for agent, rules in self.groups:
            if agent == "*":
                if star is None:
                    star = rules
            elif agent in ua or ua.startswith(agent):
                if best is None or len(agent) > best[0]:
                    best = (len(agent), rules)
        if best is not None:
            return best[1]
        return star

    def crawl_delay(self, user_agent: str) -> float | None:
        """Crawl-delay seconds for this agent, or None when its group
        declares none. Group resolution mirrors :meth:`allowed` over the
        GROUPS (not just the delay entries): a UA matching a specific
        group takes that group's delay — None if it declares none, even
        when ``*`` does — and only group-less UAs fall back to ``*``
        (REP: a UA obeys exactly one group)."""
        ua = (user_agent or "").lower()
        best: tuple[int, str] | None = None
        has_star = False
        for agent, _rules in self.groups:
            if agent == "*":
                has_star = True
            elif agent in ua or ua.startswith(agent):
                if best is None or len(agent) > best[0]:
                    best = (len(agent), agent)
        if best is not None:
            return self.delays.get(best[1])
        return self.delays.get("*") if has_star else None

    def allowed(self, user_agent: str, path_query: str) -> bool:
        rules = self._group_for(user_agent)
        if not rules:
            return True
        pq = path_query or "/"
        best_len = -1
        best_allow = True
        for is_allow, pattern in rules:
            if pattern == "":
                continue  # empty Disallow = no restriction; empty Allow = no-op
            if _compiled(pattern).match(pq):
                match_len = len(pattern)
                if match_len > best_len or (match_len == best_len and is_allow):
                    best_len = match_len
                    best_allow = is_allow
        return best_allow if best_len >= 0 else True


@lru_cache(maxsize=4096)
def _compiled(pattern: str) -> re.Pattern:
    return _rule_regex(pattern)


@lru_cache(maxsize=1024)
def parse_robots(body: str) -> RobotsRules:
    return RobotsRules(body)


def robots_allowed(body: str | None, user_agent: str, path_query: str) -> bool:
    """Top-level check; None/empty body -> everything allowed."""
    if not body:
        return True
    return parse_robots(body).allowed(user_agent, path_query)


def robots_crawl_delay(body: str | None, user_agent: str) -> float | None:
    """Crawl-delay seconds declared for this agent, or None."""
    if not body:
        return None
    return parse_robots(body).crawl_delay(user_agent)


def robots_sitemaps(body: str | None) -> list[str]:
    """Sitemap URLs declared in a robots.txt body (global directives)."""
    if not body:
        return []
    return list(parse_robots(body).sitemaps)
