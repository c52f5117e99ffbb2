"""Golden-spec simulator tests — validate the serial simulator against the
reference behaviors it models (cited per test), before it is used as the
oracle for the distributed engine."""

from collections import Counter

from colly_spark.config import CrawlConfig, LimitRule
from colly_spark.fixtures import SiteSpec, build_site, make_seeds
from colly_spark.simulator import simulate

SPEC = SiteSpec(n_domains=2, pages_per_domain=8)
SITE = build_site(SPEC)


def seeds(*urls):
    return make_seeds(list(urls))


def test_visit_basic_single_page():
    # TestCollectorVisit (colly_test.go:542-594): one visit, marked seen
    cfg = CrawlConfig(max_depth=1)
    r = simulate(SITE, seeds("http://d00.test/page/1"), cfg)
    assert r.visit_urls == ["http://d00.test/page/1"]
    assert "http://d00.test/page/1" in r.url_seen
    assert r.results  # the page references an image+caption pair


def test_dedup_revisit_two_visits_one_request():
    # TestCollectorURLRevisit (colly_test.go:756-783)
    cfg = CrawlConfig(max_depth=1)
    r = simulate(SITE, seeds("http://d00.test/page/1", "http://d00.test/page/1"), cfg)
    assert len(r.visits) == 1
    assert sum(e["error_kind"] == "AlreadyVisited" for e in r.errors) == 1


def test_allow_url_revisit():
    cfg = CrawlConfig(max_depth=1, allow_url_revisit=True)
    r = simulate(SITE, seeds("http://d00.test/page/1", "http://d00.test/page/1"), cfg)
    assert len(r.visits) == 2


def test_post_dedup_body_in_hash():
    # TestCollectorPostRevisit (colly_test.go:785-822): same URL, different
    # bodies dedup separately; same body dedups
    cfg = CrawlConfig(max_depth=1)
    sds = seeds("http://d00.test/page/1", "http://d00.test/page/1", "http://d00.test/page/1")
    for i, b in enumerate([b"a=1", b"a=1", b"a=2"]):
        sds[i]["method"] = "POST"
        sds[i]["body"] = b
    r = simulate(SITE, sds, cfg)
    assert len(r.visits) == 2
    assert sum(e["error_kind"] == "AlreadyVisited" for e in r.errors) == 1


def test_domain_filters():
    # TestCollectorVisitWithAllowedDomains / DisallowedDomains
    # (colly_test.go:625-660): exact hostname membership
    cfg = CrawlConfig(max_depth=1, allowed_domains=("d00.test",))
    r = simulate(SITE, seeds("http://d00.test/page/1", "http://d01.test/page/1"), cfg)
    assert r.visit_urls == ["http://d00.test/page/1"]
    assert r.errors[0]["error_kind"] == "ErrForbiddenDomain"
    cfg2 = CrawlConfig(max_depth=1, disallowed_domains=("d01.test",))
    r2 = simulate(SITE, seeds("http://d01.test/page/1"), cfg2)
    assert not r2.visits and r2.errors[0]["error_kind"] == "ErrForbiddenDomain"
    # denied URL is NOT marked seen (colly_test.go:993-1013)
    assert "http://d01.test/page/1" not in r2.url_seen


def test_url_filters_order():
    # DisallowedURLFilters evaluated before URLFilters (colly.go:820-830)
    cfg = CrawlConfig(
        max_depth=1,
        disallowed_url_filters=(r"/page/1",),
        url_filters=(r"/page/\d+",),
    )
    r = simulate(SITE, seeds("http://d00.test/page/1", "http://d00.test/page/2",
                             "http://d00.test/allowed"), cfg)
    kinds = [e["error_kind"] for e in r.errors if e["depth"] == 1]
    assert r.visit_urls == ["http://d00.test/page/2"]
    assert kinds == ["ErrForbiddenURL", "ErrNoURLFiltersMatch"]


def test_depth_limit_exactly_two():
    # TestCollectorDepth (colly_test.go:1754-1796): MaxDepth=2 => 2 requests
    cfg = CrawlConfig(max_depth=2)
    r = simulate(SITE, seeds("http://d00.test/deep/1"), cfg)
    assert r.visit_urls == ["http://d00.test/deep/1", "http://d00.test/deep/2"]
    assert Counter(e["error_kind"] for e in r.errors)["ErrMaxDepth"] == 1


def test_max_requests_exactly_five():
    # TestCollectorRequests (colly_test.go:1798-1815): MaxRequests=5 => 5
    cfg = CrawlConfig(max_requests=5)
    r = simulate(SITE, seeds("http://d00.test/page/0"), cfg)
    assert len(r.visits) == 5


def test_robots_allowed_disallowed_and_query():
    # colly_test.go:1267-1319
    cfg = CrawlConfig(max_depth=1, ignore_robots_txt=False)
    r = simulate(SITE, seeds("http://d00.test/allowed",
                             "http://d00.test/disallowed/0",
                             "http://d00.test/allowed?q=1"), cfg)
    assert r.visit_urls == ["http://d00.test/allowed"]
    assert [e["error_kind"] for e in r.errors] == ["ErrRobotsTxtBlocked"] * 2


def test_ignore_robots_default_fetches_disallowed():
    # TestIgnoreRobotsWhenDisallowed: default IgnoreRobotsTxt=true (colly.go:507)
    cfg = CrawlConfig(max_depth=1)
    r = simulate(SITE, seeds("http://d00.test/disallowed/0"), cfg)
    assert r.visit_urls == ["http://d00.test/disallowed/0"]


def test_robots_fetch_error_blocks():
    # TestConnectionErrorOnRobotsTxtResultsInError (colly_test.go:1342-1353)
    site = build_site(SPEC, robots_fail_hosts=("d00.test",))
    cfg = CrawlConfig(max_depth=1, ignore_robots_txt=False)
    r = simulate(site, seeds("http://d00.test/page/1"), cfg)
    assert not r.visits
    assert r.errors[0]["error_kind"] == "ErrRobotsTxtFetch"


def test_redirect_chain_marks_hops_and_rewrites_url():
    # TestRedirect (colly_test.go:1083-1107): final Request.URL = destination;
    # every hop marked visited (colly.go:1486-1510)
    cfg = CrawlConfig(max_depth=1)
    r = simulate(SITE, seeds("http://d00.test/redirect/0"), cfg)
    assert r.visits[0]["final_url"] == "http://d00.test/page/1"
    for u in ("http://d00.test/redirect/0", "http://d00.test/redirect/1",
              "http://d00.test/page/1"):
        assert u in r.url_seen


def test_redirect_cycle_no_revisit_error():
    # colly_test.go:885-934: cycles exempt from AlreadyVisited
    cfg = CrawlConfig(max_depth=1)
    r = simulate(SITE, seeds("http://d00.test/loop/a"), cfg)
    assert len(r.visits) == 1
    assert not any(e["error_kind"] == "AlreadyVisited" for e in r.errors)


def test_redirect_to_disallowed_domain_aborts():
    # TestRedirectWithDisallowedURLs flavor (colly_test.go:1122-1137)
    cfg = CrawlConfig(max_depth=1, disallowed_url_filters=(r"/redirect/1",))
    r = simulate(SITE, seeds("http://d00.test/redirect/0"), cfg)
    assert any(e["error_kind"] == "ErrForbiddenURL" for e in r.errors)


def test_base_tag_resolution():
    # TestBaseTag (colly_test.go:1139-1162)
    cfg = CrawlConfig(max_depth=2)
    r = simulate(SITE, seeds("http://d00.test/base"), cfg)
    assert "http://d00.test/sub/dir/child" in r.visit_urls


def test_error_statuses():
    # colly_test.go:596-623: 404/500 -> OnError, 204 -> ok no parse
    cfg = CrawlConfig(max_depth=1)
    r = simulate(SITE, seeds("http://d00.test/e404", "http://d00.test/e500",
                             "http://d00.test/e204"), cfg)
    assert len(r.visits) == 3
    kinds = sorted(e["error_kind"] for e in r.errors)
    assert kinds == ["HTTPError404", "HTTPError500"]


def test_politeness_tokens_defer_not_drop():
    # LimitRule Delay: per-round token cap defers, total visits unchanged
    rule = LimitRule(domain_glob="*", delay_ms=400, parallelism=1)
    base = CrawlConfig(max_depth=2)
    lim = CrawlConfig(max_depth=2, limit_rules=(rule,), round_budget_ms=1000)
    r_base = simulate(SITE, seeds("http://d00.test/page/0"), base)
    r_lim = simulate(SITE, seeds("http://d00.test/page/0"), lim, max_rounds=64)
    assert sorted(r_base.visit_urls) == sorted(r_lim.visit_urls)
    per_round = Counter(v["round"] for v in r_lim.visits)
    assert max(per_round.values()) <= 2 * SPEC.n_domains  # tokens=2/domain/round
    assert r_lim.rounds > r_base.rounds  # deferral stretched the schedule


def test_fifo_order_is_submission_order():
    # queue FIFO contract (queue/queue.go:160-205): dispatch order == enqueue order
    cfg = CrawlConfig(max_depth=2)
    r = simulate(SITE, seeds("http://d00.test/page/0"), cfg)
    seqs = [v["enqueue_seq"] for v in r.visits]
    assert seqs == sorted(seqs)


def test_max_queue_size_overflow():
    # queue/queue.go:234-236: overflow discarded with ErrQueueFull
    cfg = CrawlConfig(max_depth=1, max_queue_size=2)
    r = simulate(SITE, seeds("http://d00.test/page/0", "http://d00.test/page/1",
                             "http://d00.test/page/2"), cfg)
    assert len(r.visits) == 2
    assert [e["error_kind"] for e in r.errors if e["depth"] == 1] == ["ErrQueueFull"]
