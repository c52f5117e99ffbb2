"""End-to-end parity: the distributed engine's visit order, URL-seen set,
error rows and image results must EQUAL the serial golden simulator's under
the same seed list and politeness budget — the north rule's equality clause.

Each scenario is a port of a reference test (FIXTURES.md §7 matrix)."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from colly_spark.config import CrawlConfig, LimitRule
from colly_spark.engine import Crawler
from colly_spark.fixtures import SiteSpec, build_site, make_seeds, site_to_spark
from colly_spark.simulator import simulate

SPEC = SiteSpec(n_domains=2, pages_per_domain=8)
SITE = build_site(SPEC)


@pytest.fixture(scope="module")
def tabs(spark):
    t = site_to_spark(spark, SITE)
    return {k: v.cache() for k, v in t.items()}


def run_compare(spark, tabs, seeds, cfg, max_rounds=12, site=SITE,
                checkpoint_dir=None, check_seen=True):
    cr = Crawler(spark, cfg, tabs["pages"], tabs["images"], tabs["robots"],
                 checkpoint_dir=checkpoint_dir)
    out = cr.run(seeds, max_rounds=max_rounds)
    sim = simulate(site, seeds, cfg, max_rounds=max_rounds)

    eng_visits = [
        (r["fetch_seq"], r["url"], r["depth"], r["round"])
        for r in out["visits"].orderBy("fetch_seq").collect()
    ]
    sim_visits = [(v["fetch_seq"], v["url"], v["depth"], v["round"]) for v in sim.visits]
    assert eng_visits == sim_visits, (
        f"visit order mismatch:\nengine={eng_visits}\nsim   ={sim_visits}"
    )

    eng_err = Counter((r["url"], r["error_kind"]) for r in out["errors"].collect())
    sim_err = Counter((e["url"], e["error_kind"]) for e in sim.errors)
    assert eng_err == sim_err

    if check_seen:
        eng_seen = {r["url_hash"] for r in out["url_seen"].collect()}
        exp = {
            r["h"]
            for r in spark.createDataFrame(
                [(u, b if b else b"") for u, b in sim.seen_keys],
                "url string, body binary",
            ).select(F.xxhash64("url", "body").alias("h")).collect()
        }
        assert eng_seen == exp

    eng_res = sorted(
        (r["url"], r["image_id"], r["caption"], bool(r["payload_ok"]))
        for r in out["results"].collect()
    )
    sim_res = sorted((x["url"], x["image_id"], x["caption"], True) for x in sim.results)
    assert eng_res == sim_res
    return out, sim, cr


def test_basic_crawl_with_robots(spark, tabs):
    cfg = CrawlConfig(max_depth=3, ignore_robots_txt=False, shuffle_partitions=8)
    out, sim, _ = run_compare(spark, tabs, make_seeds(["http://d00.test/page/0"]), cfg)
    assert len(sim.visits) > 10  # non-trivial crawl


def test_domain_allowlist(spark, tabs):
    cfg = CrawlConfig(max_depth=3, allowed_domains=("d00.test",), shuffle_partitions=8)
    run_compare(spark, tabs, make_seeds(
        ["http://d00.test/page/0", "http://d01.test/page/0"]), cfg)


def test_url_filters(spark, tabs):
    cfg = CrawlConfig(
        max_depth=3,
        disallowed_url_filters=(r"/redirect/", r"/loop/"),
        url_filters=(r"d0[01]\.test",),
        shuffle_partitions=8,
    )
    run_compare(spark, tabs, make_seeds(["http://d00.test/page/0"]), cfg)


def test_max_requests_budget(spark, tabs):
    cfg = CrawlConfig(max_requests=5, shuffle_partitions=8)
    out, sim, _ = run_compare(
        spark, tabs, make_seeds(["http://d00.test/page/0"]), cfg, max_rounds=8)
    assert len(sim.visits) == 5


def test_max_depth_two_on_chain(spark, tabs):
    cfg = CrawlConfig(max_depth=2, shuffle_partitions=8)
    out, sim, _ = run_compare(
        spark, tabs, make_seeds(["http://d00.test/deep/1"]), cfg)
    assert [v[1] for v in
            [(x["fetch_seq"], x["url"]) for x in sim.visits]] == [
        "http://d00.test/deep/1", "http://d00.test/deep/2"]


def test_politeness_deferral(spark, tabs):
    cfg = CrawlConfig(
        max_depth=2,
        limit_rules=(LimitRule(domain_glob="*", delay_ms=400, parallelism=1),),
        round_budget_ms=1000,
        shuffle_partitions=8,
    )
    out, sim, _ = run_compare(
        spark, tabs, make_seeds(["http://d00.test/page/0"]), cfg, max_rounds=20)
    assert sim.rounds > 3  # deferral stretched the schedule


def test_post_body_in_dedup_hash(spark, tabs):
    sds = make_seeds(["http://d00.test/page/1"] * 3)
    for i, b in enumerate([b"a=1", b"a=1", b"a=2"]):
        sds[i]["method"] = "POST"
        sds[i]["body"] = b
    cfg = CrawlConfig(max_depth=1, shuffle_partitions=8)
    out, sim, _ = run_compare(spark, tabs, sds, cfg)
    assert len(sim.visits) == 2


def test_error_statuses_and_parse_error_response(spark, tabs):
    seeds = make_seeds(["http://d00.test/e404", "http://d00.test/e500",
                        "http://d00.test/e204"])
    run_compare(spark, tabs, seeds, CrawlConfig(max_depth=1, shuffle_partitions=8))
    run_compare(spark, tabs, seeds,
                CrawlConfig(max_depth=1, parse_http_error_response=True,
                            shuffle_partitions=8))


def test_redirects_and_cycles(spark, tabs):
    cfg = CrawlConfig(max_depth=2, shuffle_partitions=8)
    seeds = make_seeds(["http://d00.test/redirect/0", "http://d00.test/loop/a"])
    out, sim, _ = run_compare(spark, tabs, seeds, cfg)
    assert "http://d00.test/redirect/1" in sim.url_seen  # hop marked


def test_base_tag(spark, tabs):
    cfg = CrawlConfig(max_depth=2, shuffle_partitions=8)
    out, sim, _ = run_compare(spark, tabs, make_seeds(["http://d00.test/base"]), cfg)
    assert "http://d00.test/sub/dir/child" in [v["url"] for v in sim.visits]


def test_shuffle_partition_invariance(spark, tabs):
    """Ordering must derive from data, never partition layout (north rule)."""
    seeds = make_seeds(["http://d00.test/page/0", "http://d01.test/page/3"])
    traces = []
    for parts in (3, 8):
        cfg = CrawlConfig(max_depth=3, ignore_robots_txt=False, shuffle_partitions=parts)
        cr = Crawler(spark, cfg, tabs["pages"], tabs["images"], tabs["robots"])
        out = cr.run(seeds, max_rounds=6)
        traces.append(
            [(r["fetch_seq"], r["url"]) for r in out["visits"].orderBy("fetch_seq").collect()]
        )
    assert traces[0] == traces[1]


def test_hot_domain_skew_budget(spark):
    """North rule: salted repartition keeps max partition fetch budget
    bounded vs the median (no executor starves behind a hot domain)."""
    spec = SiteSpec(n_domains=4, pages_per_domain=12, hot_domain_factor=8,
                    with_specials=False, quirky_links=False)
    site = build_site(spec)
    t = site_to_spark(spark, site)
    cfg = CrawlConfig(max_depth=3, shuffle_partitions=8)
    cr = Crawler(spark, cfg, t["pages"], t["images"], t["robots"])
    out = cr.run(make_seeds([f"http://d0{d}.test/page/0" for d in range(4)]),
                 max_rounds=4)
    lineage = out["lineage"].where("stage = 'fetch'").collect()
    by_round: dict[int, list[int]] = {}
    for r in lineage:
        by_round.setdefault(r["round"], []).append(r["urls_in"])
    for rnd, counts in by_round.items():
        if len(counts) < 3 or sum(counts) < 24:
            continue
        counts = sorted(counts)
        median = counts[len(counts) // 2]
        assert max(counts) <= max(2 * median, 16), (rnd, counts)


def test_random_delay_fetch_ms_parity(spark, tabs):
    """RandomDelay (http_backend.go:210-213): the seeded rand term must be
    IDENTICAL engine vs simulator, asserted on fetch_ms per visit."""
    cfg = CrawlConfig(
        max_depth=2,
        limit_rules=(LimitRule(domain_glob="*", delay_ms=100,
                               random_delay_ms=77, parallelism=4),),
        round_budget_ms=100000,
        shuffle_partitions=8,
    )
    out, sim, _ = run_compare(
        spark, tabs, make_seeds(["http://d00.test/page/0"]), cfg, max_rounds=6)
    eng_ms = [(r["fetch_seq"], r["fetch_ms"])
              for r in out["visits"].orderBy("fetch_seq").collect()]
    sim_ms = [(v["fetch_seq"], v["fetch_ms"]) for v in sim.visits]
    assert eng_ms == sim_ms
    assert len({ms for _, ms in eng_ms}) > 1  # the rand term actually varies


def test_retry_reenters_frontier(spark, tabs):
    """E4 Request.Retry (request.go:157-163; colly_test.go:1961-2060 shape):
    a retried fetch re-enters with checkRevisit=false, once."""
    cfg = CrawlConfig(max_depth=1, retry_on_status=(500,), max_retries=1,
                      shuffle_partitions=8)
    seeds = make_seeds(["http://d00.test/e500", "http://d00.test/e404"])
    out, sim, _ = run_compare(spark, tabs, seeds, cfg, max_rounds=4)
    urls = [v["url"] for v in sim.visits]
    assert urls.count("http://d00.test/e500") == 2  # original + 1 retry
    assert urls.count("http://d00.test/e404") == 1  # 404 not in retry set


def test_response_header_abort(spark, tabs):
    """E2 OnResponseHeaders abort (http_backend.go:228-232): matching
    Content-Type kills the response after headers, body never parsed."""
    cfg = CrawlConfig(max_depth=2,
                      abort_response_header_filters=(r"application/octet-stream",),
                      shuffle_partitions=8)
    seeds = make_seeds(["http://d00.test/binary", "http://d00.test/page/7"])
    out, sim, _ = run_compare(spark, tabs, seeds, cfg)
    assert any(e["error_kind"] == "AbortedAfterHeaders" for e in sim.errors)


def test_queue_full_not_seen_marked(spark, tabs):
    """ErrQueueFull fires in AddRequest before requestCheck
    (queue/queue.go:234-236): overflowed URLs never reach url_seen —
    run_compare's seen-set equality is the assertion."""
    cfg = CrawlConfig(max_depth=2, max_queue_size=2, shuffle_partitions=8)
    seeds = make_seeds([f"http://d00.test/page/{i}" for i in range(5)])
    out, sim, _ = run_compare(spark, tabs, seeds, cfg, max_rounds=6)
    assert any(e["error_kind"] == "ErrQueueFull" for e in sim.errors)


def test_cookies_parity(spark, tabs):
    """U3 (colly.go:1612-1650; TestSetCookieRedirect colly_test.go:2040+):
    a cookie set inside a redirect chain satisfies the chain's final page;
    the jar persists across rounds; an unset cookie serves 403."""
    cfg = CrawlConfig(max_depth=3, shuffle_partitions=8)
    seeds = make_seeds([
        "http://d00.test/set_cookie",    # 302 -> /check_cookie (needs chain cookie)
        "http://d00.test/cookie/set",    # sets tok=a, links /cookie/need
        "http://d01.test/cookie/need",   # no setter on d01 -> 403
    ])
    out, sim, _ = run_compare(spark, tabs, seeds, cfg, max_rounds=4)
    by_url = {v["url"]: v["status"] for v in sim.visits}
    assert by_url["http://d00.test/set_cookie"] == 200     # chain cookie worked
    assert by_url["http://d01.test/cookie/need"] == 403    # cookie missing
    # jar persistence: d00's /cookie/need reached via link in round 1+
    assert by_url.get("http://d00.test/cookie/need") == 200


def test_proxy_rotation_parity(spark, tabs):
    """X5 (proxy/proxy.go:31-57): deterministic round-robin assignment
    recorded per visit, equal engine vs simulator."""
    cfg = CrawlConfig(max_depth=2, proxies=("p0:8080", "p1:8080", "p2:8080"),
                      shuffle_partitions=8)
    out, sim, _ = run_compare(spark, tabs, make_seeds(["http://d00.test/page/0"]), cfg)
    eng = [(r["fetch_seq"], r["proxy"]) for r in out["visits"].orderBy("fetch_seq").collect()]
    assert eng == [(v["fetch_seq"], v["proxy"]) for v in sim.visits]
    assert {p for _, p in eng} == {"p0:8080", "p1:8080", "p2:8080"}


def test_check_head_parity(spark, tabs):
    """X4 CheckHead (colly.go:537-544; colly_test.go:1735-1752): HEAD then
    GET per URL; a failing HEAD suppresses the GET."""
    cfg = CrawlConfig(max_depth=1, check_head=True, shuffle_partitions=8)
    seeds = make_seeds(["http://d00.test/page/0", "http://d00.test/e404"])
    out, sim, _ = run_compare(spark, tabs, seeds, cfg, max_rounds=2)
    counts = Counter(v["url"] for v in sim.visits)
    assert counts["http://d00.test/page/0"] == 2  # HEAD + GET
    assert counts["http://d00.test/e404"] == 1    # HEAD only, GET skipped


def test_check_head_parse_http_error_parity(spark, tabs):
    """X4 x E1 interaction (colly.go:1320-1323): under ParseHTTPErrorResponse
    handleOnError returns nil for error statuses, so the HEAD "succeeds" and
    Visit() still issues (and parses) the GET — previously both sides
    suppressed the GET unconditionally (ADVICE r2)."""
    cfg = CrawlConfig(max_depth=1, check_head=True, parse_http_error_response=True,
                      shuffle_partitions=8)
    seeds = make_seeds(["http://d00.test/page/0", "http://d00.test/e404"])
    out, sim, _ = run_compare(spark, tabs, seeds, cfg, max_rounds=2)
    counts = Counter(v["url"] for v in sim.visits)
    assert counts["http://d00.test/page/0"] == 2  # HEAD + GET
    # the error status no longer fails the HEAD: GET happens too
    assert counts["http://d00.test/e404"] == 2


def test_max_url_length_parity(spark, tabs):
    """F3d (extensions/url_length_filter.go:8-14): canonical URLs longer
    than the limit reject with ErrURLTooLong — checked before the regex
    filters, on both engine and simulator (previously untested)."""
    cfg = CrawlConfig(max_depth=3, max_url_length=26, shuffle_partitions=8)
    out, sim, _ = run_compare(
        spark, tabs, make_seeds(["http://d00.test/page/0"]), cfg)
    kinds = Counter(e["error_kind"] for e in sim.errors)
    assert kinds.get("ErrURLTooLong", 0) > 0, (
        "fixture produced no overlong URL; pick a smaller max_url_length"
    )
    assert any(len(v["url"]) <= 26 for v in sim.visits)


def test_request_headers_parity(spark, tabs):
    """E2 request headers as data (colly.go:645-657 merge;
    http_backend.go:215-217 OnRequestHeaders abort). Three behaviors in one
    crawl, engine == simulator:
    - a seed carrying the auth header gets /auth/need at 200 (and its link
      is followed); default-header requests (children, other seeds) 403;
    - an abort filter on a custom header kills matching requests after
      dispatch (token spent, ErrAbortedBeforeRequest, no response);
    - children fall back to collector defaults (hdr=nil in Request.Visit)."""
    cfg = CrawlConfig(
        max_depth=2,
        default_headers=(("x-flag", "plain"),),
        abort_request_header_filters=(("x-kill", "^yes$"),),
        shuffle_partitions=8,
    )
    seeds = (
        make_seeds(["http://d00.test/auth/need"], headers={"x-token": "s3cr3t"})
        + [
            {"seed_seq": 1, "url": "http://d00.test/auth/need", "method": "GET",
             "body": None, "headers": None, "ctx": {}},
            {"seed_seq": 2, "url": "http://d00.test/page/0", "method": "GET",
             "body": None, "headers": {"x-kill": "yes"}, "ctx": {}},
            {"seed_seq": 3, "url": "http://d00.test/redirect/0", "method": "GET",
             "body": None, "headers": {"x-kill": "yes"}, "ctx": {}},
        ]
    )
    out, sim, _ = run_compare(spark, tabs, seeds, cfg, max_rounds=3)
    by_url = {v["url"]: v for v in sim.visits}
    assert by_url["http://d00.test/auth/need"]["status"] == 200  # authed seed wins (first-wins dedup)
    kinds = Counter(e["error_kind"] for e in sim.errors)
    assert kinds["ErrAbortedBeforeRequest"] == 2  # both x-kill seeds
    # the aborted redirect source never followed/marked its hops: the
    # redirect target is absent from url_seen
    assert "http://d00.test/redirect/1" not in sim.url_seen
    # authed page's child link was followed with DEFAULT headers
    assert "http://d00.test/auth/inner" in {v["url"] for v in sim.visits}


def test_seen_base_merge_every_round_parity(spark, tabs):
    """The url_seen base/tail store under aggressive compaction: merging the
    tail into the partitioned base EVERY round (seen_merge_every=1) must not
    change any crawl output — probes hit the base instead of the broadcast
    tail, which is the 10^10 steady state."""
    cfg = CrawlConfig(max_depth=3, ignore_robots_txt=False,
                      seen_merge_every=1, shuffle_partitions=8)
    run_compare(spark, tabs, make_seeds(["http://d00.test/page/0"]), cfg)


@pytest.mark.parametrize("backend", ["ck", "ck.db"])
def test_checkpoint_resume_equals_uninterrupted(spark, tabs, tmp_path, backend):
    """Parameterized over both durable backends (parquet tree / sqlite) —
    the Storage seam the reference ships (storage/storage.go:30-42)."""
    cfg = CrawlConfig(max_depth=3, shuffle_partitions=8)
    seeds = make_seeds(["http://d00.test/page/0"])
    # uninterrupted
    cr_full = Crawler(spark, cfg, tabs["pages"], tabs["images"], tabs["robots"],
                      checkpoint_dir=str(tmp_path / "full"))
    full = cr_full.run(seeds, max_rounds=6)
    full_visits = [(r["fetch_seq"], r["url"]) for r in
                   full["visits"].orderBy("fetch_seq").collect()]
    # interrupted after 2 rounds, then resumed by a NEW crawler instance
    ck = str(tmp_path / backend)
    cr1 = Crawler(spark, cfg, tabs["pages"], tabs["images"], tabs["robots"],
                  checkpoint_dir=ck)
    cr1.run(seeds, max_rounds=2)
    cr2 = Crawler(spark, cfg, tabs["pages"], tabs["images"], tabs["robots"],
                  checkpoint_dir=ck)
    resumed = cr2.run(seeds, max_rounds=6)
    res_visits = [(r["fetch_seq"], r["url"]) for r in
                  resumed["visits"].orderBy("fetch_seq").collect()]
    assert res_visits == full_visits


def test_round_aqe_policy(spark, tabs):
    """Per-round AQE policy (config.adaptive_min_round_rows): below the
    threshold each round runs with adaptive execution OFF (its per-exchange
    scheduling-barrier jobs dominate small rounds — measured 2.1x whole-crawl
    wall on the 250k fixture, BENCH/BASELINE.md r4); at/above it AQE stays ON
    (the 100-TB regime needs coalescing + skew splits); threshold 0 disables
    the policy; and the session setting is restored after run(). Crawl output
    must be identical in every mode (run_compare asserts parity with the
    serial simulator each time)."""
    seeds = make_seeds(["http://d00.test/page/0"])
    seen_flags: list[str] = []
    orig_run_round = Crawler._run_round

    def spy(self, *a, **k):
        seen_flags.append(self.spark.conf.get("spark.sql.adaptive.enabled"))
        return orig_run_round(self, *a, **k)

    def crawl(cfg):
        seen_flags.clear()
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(Crawler, "_run_round", spy)
            run_compare(spark, tabs, seeds, cfg)

    # default threshold (10M): every fixture round is tiny -> AQE off in-round
    crawl(CrawlConfig(max_depth=2, shuffle_partitions=8))
    assert seen_flags and all(v == "false" for v in seen_flags)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"  # restored

    # threshold 1: every non-empty round qualifies -> AQE on in-round
    crawl(CrawlConfig(max_depth=2, shuffle_partitions=8,
                      adaptive_min_round_rows=1))
    assert seen_flags and all(v == "true" for v in seen_flags)

    # threshold 0: policy disabled, session default flows through untouched
    crawl(CrawlConfig(max_depth=2, shuffle_partitions=8,
                      adaptive_min_round_rows=0))
    assert seen_flags and all(v == "true" for v in seen_flags)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_ipv6_host_parity(spark):
    """IPv6-literal hosts survive the whole pipeline: canonicalization keeps
    the brackets (urlkit regression — hostname() strips them, so the
    serialized form must restore them), default :80 is elided, the robots
    cache keys on the UNbracketed hostname, and engine visits/url_seen/
    errors equal the simulator's. Seed carries an explicit default port."""
    from colly_spark.fixtures import DEFAULT_ROBOTS_BODY, Site, _html_body

    host = "2001:db8::1"
    base = f"http://[{host}]"

    def page(j: int, links: list[str]) -> dict:
        return {
            "url": f"{base}/page/{j}", "domain": host, "status": 200,
            "content_type": "text/html", "body": _html_body(links, [], None),
            "redirect_to": None, "links": links, "base_href": None,
            "image_refs": [], "gzip_body": False, "serve_delay_ms": 0,
            "set_cookie": None, "require_cookie": None, "require_header": None,
        }

    site = Site(spec=SiteSpec(n_domains=0, with_specials=False))
    site.pages = [
        # relative link, default-port absolute (canonicalizes portless),
        # fragment self-link (dedup'd), and a /disallowed robots path
        page(0, ["/page/1", f"{base}:80/page/2", f"{base}/page/0#frag",
                 "/disallowed/x"]),
        page(1, [f"{base}/page/2"]),
        page(2, []),
    ]
    site.robots = [{"host": host, "body": DEFAULT_ROBOTS_BODY,
                    "fetch_fails": False}]
    tabs6 = site_to_spark(spark, site)
    seeds = make_seeds([f"{base}:80/page/0"])
    cfg = CrawlConfig(max_depth=3, shuffle_partitions=8, ignore_robots_txt=False)
    out, _, _ = run_compare(spark, tabs6, seeds, cfg, site=site)
    urls = [r["url"] for r in out["visits"].orderBy("fetch_seq").collect()]
    assert urls == [f"{base}/page/0", f"{base}/page/1", f"{base}/page/2"]


def test_bare_semicolon_segment_hash_parity(spark):
    """A URL whose last path segment ends in a bare ``;`` must hash the same
    whether it arrives as a SEED or as an EXTRACTED link (request.go:101-117:
    Go's net/url preserves the empty ';params' through ResolveReference, so
    colly dedups the two). Round-4 regression: stdlib urljoin dropped the
    ';' on the extracted path only, splitting the url_seen key. The crawl
    below seeds both the linking page and the ';' URL itself; parity =
    exactly one visit of it, and run_compare's url_seen clause proves the
    hash sets match the simulator."""
    from colly_spark.fixtures import DEFAULT_ROBOTS_BODY, Site, _html_body

    host, base = "semi.test", "http://semi.test"

    def page(path: str, links: list[str]) -> dict:
        return {
            "url": base + path, "domain": host, "status": 200,
            "content_type": "text/html", "body": _html_body(links, [], None),
            "redirect_to": None, "links": links, "base_href": None,
            "image_refs": [], "gzip_body": False, "serve_delay_ms": 0,
            "set_cookie": None, "require_cookie": None, "require_header": None,
        }

    site = Site(spec=SiteSpec(n_domains=0, with_specials=False))
    site.pages = [
        # root page links to the ';' URL absolutely AND via a relative href
        # ending in ';' — both must resolve to the same canonical form
        page("/", [f"{base}/x;", "x;"]),
        page("/x;", []),
    ]
    site.robots = [{"host": host, "body": DEFAULT_ROBOTS_BODY,
                    "fetch_fails": False}]
    tabs = site_to_spark(spark, site)
    # the ';' URL is also a seed: seed-hash and extracted-link-hash collide
    seeds = make_seeds([f"{base}/", f"{base}/x;"])
    cfg = CrawlConfig(max_depth=2, shuffle_partitions=8)
    out, _, _ = run_compare(spark, tabs, seeds, cfg, site=site)
    urls = [r["url"] for r in out["visits"].orderBy("fetch_seq").collect()]
    assert urls == [f"{base}/", f"{base}/x;"]  # visited exactly once


def test_queue_cap_ignores_aborted_rows(spark, tabs):
    """OnRequest-aborted requests never enter the queue (they return before
    pending.append in colly's scrape), so they must not count toward
    max_queue_size occupancy — with raw prefix counts the engine wrongly
    ErrQueueFull'd later rows (round-5 review finding)."""
    cfg = CrawlConfig(max_depth=2, max_queue_size=3,
                      abort_url_filters=(r"/page/[123]$",),
                      shuffle_partitions=8)
    seeds = make_seeds([f"http://d00.test/page/{i}" for i in range(8)])
    out, sim, _ = run_compare(spark, tabs, seeds, cfg, max_rounds=6)
    assert any(e["error_kind"] == "AbortedBeforeRequest" for e in sim.errors)
    assert any(e["error_kind"] == "ErrQueueFull" for e in sim.errors)


def test_budget_and_queue_caps_interact(spark, tabs):
    """When the queue cap binds before the request budget, overflow rows
    never spend budget — they are ErrQueueFull, not ErrMaxRequests
    (simulator checks built_requests, which freezes once the queue
    blocks; round-5 review finding)."""
    cfg = CrawlConfig(max_depth=2, max_requests=6, max_queue_size=3,
                      shuffle_partitions=8)
    seeds = make_seeds([f"http://d00.test/page/{i}" for i in range(8)])
    out, sim, _ = run_compare(spark, tabs, seeds, cfg, max_rounds=6)
    assert any(e["error_kind"] == "ErrQueueFull" for e in sim.errors)


def test_allow_url_revisit_follows_seen_redirect_hops(spark, tabs):
    """AllowURLRevisit guards the redirect hop-seen conflict
    (colly.go:1486-1510): a re-dispatched chain re-follows previously seen
    hops and serves the final page instead of aborting AlreadyVisited at
    the hop; url_seen stays a set (first-ever mark)."""
    cfg = CrawlConfig(max_depth=3, allow_url_revisit=True, shuffle_partitions=8)
    seeds = make_seeds(["http://d00.test/redirect/0", "http://d00.test/page/0"])
    out, sim, _ = run_compare(spark, tabs, seeds, cfg, max_rounds=4)
    # the chain's final page is visited at least twice (seed + re-dispatch)
    finals = [v for v in sim.visits if v["url"] == "http://d00.test/redirect/0"]
    assert len(finals) >= 2


def test_check_head_header_abort_proxy_slot(spark, tabs):
    """A header-aborted request under CheckHead records the HEAD visit at
    slot 2k — its proxy must derive from THAT fetch_seq, not the GET's
    2k+1 slot (round-5 review finding: the simulator relabeled the seq
    without recomputing the proxy)."""
    cfg = CrawlConfig(max_depth=1, check_head=True,
                      proxies=("p0:8080", "p1:8080"),
                      abort_request_header_filters=(("x-kill", "^yes$"),),
                      shuffle_partitions=8)
    seeds = [
        {"seed_seq": 0, "url": "http://d00.test/page/0", "method": "GET",
         "body": None, "headers": {"x-kill": "yes"}, "ctx": {}},
        {"seed_seq": 1, "url": "http://d00.test/page/1", "method": "GET",
         "body": None, "headers": None, "ctx": {}},
    ]
    out, sim, _ = run_compare(spark, tabs, seeds, cfg, max_rounds=3)
    eng = [(r["fetch_seq"], r["proxy"])
           for r in out["visits"].orderBy("fetch_seq").collect()]
    assert eng == [(v["fetch_seq"], v["proxy"]) for v in sim.visits]


def test_respect_crawl_delay_parity(spark):
    """S2 extension (default off, opt-in): a robots Crawl-delay caps each
    domain's per-round tokens (tokens_for_delay: serialized requests).
    Engine visit order/errors/seen/results equal the simulator's, the cap
    provably bites (no domain exceeds it in any round, and the crawl takes
    more rounds than with the flag off), and with the flag OFF the delay
    line changes nothing (colly parity: Crawl-delay parsed, never read)."""
    from collections import Counter as C

    from colly_spark.config import tokens_for_delay
    from colly_spark.fixtures import DEFAULT_ROBOTS_BODY

    body = DEFAULT_ROBOTS_BODY + "Crawl-delay: 0.3\n"
    site = build_site(SPEC, robots_body=body)
    tabs2 = site_to_spark(spark, site)
    seeds = make_seeds([site.pages[0]["url"], site.pages[10]["url"]])

    cfg_on = CrawlConfig(
        max_depth=3, ignore_robots_txt=False, respect_crawl_delay=True,
        shuffle_partitions=8,
    )
    out, sim, _ = run_compare(spark, tabs2, seeds, cfg_on, max_rounds=30,
                              site=site)

    cap = tokens_for_delay(0.3, cfg_on.round_budget_ms, cfg_on.service_est_ms)
    assert cap == 3
    per_round = C()
    for v in sim.visits:
        per_round[(v["round"], v["url"].split("/")[2])] += 1
    assert max(per_round.values()) <= cap
    assert any(n == cap for n in per_round.values())  # the cap bites

    cfg_off = CrawlConfig(max_depth=3, ignore_robots_txt=False,
                          shuffle_partitions=8)
    sim_off = simulate(site, seeds, cfg_off, max_rounds=30)
    assert sim.rounds > sim_off.rounds  # deferrals stretch the crawl
    # flag off: identical to a site without the Crawl-delay line
    sim_plain = simulate(build_site(SPEC), seeds, cfg_off, max_rounds=30)
    assert [v["url"] for v in sim_off.visits] == [
        v["url"] for v in sim_plain.visits
    ]
