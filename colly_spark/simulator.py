"""Serial reference simulator — the golden visit-order / URL-seen spec.

A ~250-line pure-Python restatement of colly's queue-driven crawl loop
(queue/queue.go:133-212 FIFO dispatch + colly.go:774-818 requestCheck order +
colly.go:1461-1530 redirect rules), expressed as BFS rounds with per-domain
politeness token deferral — exactly the semantics the distributed engine
(:mod:`colly_spark.engine`) must reproduce. Tests assert the engine's
scheduled order == this trace, url_seen sets equal, and per-outcome error
rows match (FIXTURES.md §6-7).

requestCheck order (colly.go:774-818): depth -> maxRequests -> url-length ->
DisallowedURLFilters -> URLFilters -> domains -> robots -> seen. Error kinds
mirror colly's sentinel errors (colly.go:220-253).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from colly_spark import xxh
from colly_spark.config import (CrawlConfig, match_rule_idx, tokens_for_delay,
                                tokens_for_rule)
from colly_spark.fixtures import Site
from colly_spark.robotskit import robots_allowed, robots_crawl_delay
from colly_spark.urlkit import absolutize, canonicalize, hostname, path_query

GET = "GET"


def _compiled_header_aborts(cfg: CrawlConfig):
    import re as _re

    return [_re.compile(p) for p in cfg.abort_response_header_filters]


def _compiled_request_header_aborts(cfg: CrawlConfig):
    import re as _re

    return [(name, _re.compile(p)) for name, p in cfg.abort_request_header_filters]


def merged_headers(cand_headers: dict | None, cfg: CrawlConfig) -> dict:
    """colly.go:645-657: a request with no headers of its own gets the
    collector defaults; User-Agent set on top unless already present."""
    hdr = dict(cand_headers) if cand_headers else dict(cfg.default_headers)
    if "User-Agent" not in hdr:
        hdr["User-Agent"] = cfg.user_agent
    return hdr


def check_static_filters(canon: str, domain: str, cfg: CrawlConfig) -> str | None:
    """F3a/b/c/d filters in reference order; also re-applied per redirect hop
    (colly.go:1463-1465). Returns error kind or None."""
    if cfg.max_url_length and len(canon) > cfg.max_url_length:
        return "ErrURLTooLong"
    for pat in cfg.compiled_disallowed():  # before URLFilters, colly.go:820-830
        if pat.search(canon):
            return "ErrForbiddenURL"
    allowed_pats = cfg.compiled_allowed()
    if allowed_pats and not any(p.search(canon) for p in allowed_pats):
        return "ErrNoURLFiltersMatch"
    if domain in cfg.disallowed_domains:
        return "ErrForbiddenDomain"
    if cfg.allowed_domains and domain not in cfg.allowed_domains:
        return "ErrForbiddenDomain"
    return None


def seen_key(canon: str, body: bytes | None) -> tuple[str, bytes]:
    """URL-seen identity: normalized URL ++ request body (colly.go:1669-1678)."""
    return (canon, body or b"")


@dataclass
class SimResult:
    visits: list[dict] = field(default_factory=list)  # dispatch order
    errors: list[dict] = field(default_factory=list)
    results: list[dict] = field(default_factory=list)  # image+caption rows
    url_seen: set = field(default_factory=set)  # canonical URLs
    seen_keys: set = field(default_factory=set)  # (canon_url, body) identity
    rounds: int = 0

    @property
    def visit_urls(self) -> list[str]:
        return [v["url"] for v in self.visits]


def simulate(site: Site, seeds: list[dict], cfg: CrawlConfig, max_rounds: int | None = None) -> SimResult:
    pages = site.pages_by_url()
    robots = site.robots_by_host()
    res = SimResult()
    seen: set = set()
    jar: dict[str, set] = {}  # U3 cookie jar, committed per round
    jar_pending: list[tuple[str, str]] = []
    enqueue_counter = 0
    fetch_counter = 0
    built_requests = 0  # colly requestCount (colly.go:705)
    pending: list[dict] = []  # passed checks, waiting for dispatch

    def submit(cand: dict, rnd: int) -> None:
        nonlocal enqueue_counter, built_requests
        canon = canonicalize(cand["url"])
        if canon is None:
            res.errors.append(_err(None, cand["url"], cand["depth"], "ErrURLParse", rnd))
            return
        domain = hostname(canon)
        if cfg.max_depth and cand["depth"] > cfg.max_depth:
            res.errors.append(_err(None, canon, cand["depth"], "ErrMaxDepth", rnd))
            return
        if cfg.max_requests and built_requests >= cfg.max_requests:
            res.errors.append(_err(None, canon, cand["depth"], "ErrMaxRequests", rnd))
            return
        kind = check_static_filters(canon, domain, cfg)
        if kind:
            res.errors.append(_err(None, canon, cand["depth"], kind, rnd))
            return
        if not cfg.ignore_robots_txt and cand["method"] != "HEAD":
            r = robots.get(domain)
            if r is not None and r["fetch_fails"]:
                res.errors.append(_err(None, canon, cand["depth"], "ErrRobotsTxtFetch", rnd))
                return
            body = r["body"] if r is not None else None
            if not robots_allowed(body, cfg.user_agent, path_query(canon)):
                res.errors.append(_err(None, canon, cand["depth"], "ErrRobotsTxtBlocked", rnd))
                return
        # ErrQueueFull fires in AddRequest (queue/queue.go:234-236), before
        # scrape's requestCheck runs — so a queue-full URL is never
        # seen-marked and ErrQueueFull outranks AlreadyVisited
        if cfg.max_queue_size and len(pending) >= cfg.max_queue_size:
            res.errors.append(_err(None, canon, cand["depth"], "ErrQueueFull", rnd))
            return
        check_seen = (
            not cand.get("skip_seen_check", False)
            and not cfg.allow_url_revisit
            # quirk colly.go:794-796: non-GET with nil body skips the check
            and not (cand["method"] != GET and cand["body"] is None)
        )
        key = seen_key(canon, cand["body"])
        if check_seen and key in seen:
            res.errors.append(_err(None, canon, cand["depth"], "AlreadyVisited", rnd))
            return
        seen.add(key)
        built_requests += 1
        cand = dict(cand, canon_url=canon, domain=domain, enqueue_seq=enqueue_counter)
        enqueue_counter += 1
        # E2/E4 OnRequest abort: Request built (ID assigned, budget spent,
        # seen marked) but never fetched — and no politeness token consumed
        # (the LimitRule semaphore sits inside backend.Do, past the abort)
        if any(p.search(canon) for p in cfg.compiled_aborts()):
            res.errors.append(_err(None, canon, cand["depth"], "AbortedBeforeRequest", rnd))
            return
        pending.append(cand)

    def fetch_one(cand: dict, rnd: int) -> None:
        nonlocal fetch_counter
        slot = fetch_counter
        fetch_counter += 1
        # X4 CheckHead: HEAD takes slot 2k, its GET 2k+1 (colly.go:537-544)
        fetch_seq = 2 * slot + 1 if cfg.check_head else slot
        cur = cand["canon_url"]
        via: list[str] = []
        page = None
        aborted_kind = None
        chain_cookies: set[str] = set()  # set by this chain's responders

        # politeness delay model (hoisted: it applies even to requests
        # aborted at the header stage — the LimitRule slot is taken and the
        # deferred sleep in Do runs regardless, http_backend.go:202-217)
        rule_idx = match_rule_idx(cand["domain"], cfg.limit_rules)
        rule = cfg.limit_rules[rule_idx] if rule_idx >= 0 else None
        delay = rule.delay_ms if rule else 0
        # seeded RandomDelay stand-in, SAME formula as the engine
        # (operators/fetch.py fetch_ms_col): pmod(xxhash64(seed, url_hash),
        # random_delay) — http_backend.go:210-213's rand term made
        # deterministic and partition-independent
        if rule and rule.random_delay_ms:
            delay += xxh.random_delay_ms(
                xxh.request_hash(cand["canon_url"], cand["body"]),
                cfg.seed, rule.random_delay_ms,
            )

        # E2 OnRequestHeaders abort (http_backend.go:215-217): evaluated on
        # the MERGED headers after the rule slot, before the request is
        # sent — no response, no redirect hops, no cookies, status 0
        hdr = merged_headers(cand.get("headers"), cfg)
        if any(
            name in hdr and pat.search(hdr[name])
            for name, pat in _compiled_request_header_aborts(cfg)
        ):
            visit = {
                "fetch_seq": fetch_seq, "enqueue_seq": cand["enqueue_seq"],
                "url": cand["canon_url"], "final_url": cur,
                "domain": cand["domain"], "depth": cand["depth"],
                "status": 0, "fetch_ms": delay,
                "proxy": (cfg.proxies[fetch_seq % len(cfg.proxies)]
                          if cfg.proxies else None),
                "round": rnd,
            }
            if cfg.check_head:
                # the HEAD takes slot 2k — its proxy derives from ITS
                # fetch_seq (the model assigns proxies[seq % n] per emitted
                # visit), not from the GET slot computed above
                res.visits.append(dict(
                    visit, fetch_seq=2 * slot,
                    proxy=(cfg.proxies[(2 * slot) % len(cfg.proxies)]
                           if cfg.proxies else None),
                ))  # the HEAD
                # the aborted HEAD errors -> GET never issued
            else:
                res.visits.append(visit)
            res.errors.append(_err(cand["enqueue_seq"], cand["canon_url"],
                                   cand["depth"], "ErrAbortedBeforeRequest",
                                   rnd, 0))
            return

        def register(p: dict) -> None:
            # a redirect response was received from p: its cookie enters
            # both the live chain (available to later hops of THIS request)
            # and next round's jar (U3, colly.go:1612-1650)
            ck = p.get("set_cookie")
            if ck is not None:
                chain_cookies.add(ck)
                jar_pending.append((p["domain"], ck))

        for _hop in range(cfg.max_redirects + 1):
            page = pages.get(cur)
            if page is None or page.get("redirect_to") is None:
                break
            nxt = canonicalize(page["redirect_to"])
            if nxt is None:
                register(page)
                aborted_kind = "ErrURLParse"
                break
            # per-hop filter re-application (colly.go:1463-1465)
            kind = check_static_filters(nxt, hostname(nxt), cfg)
            if kind:
                register(page)
                aborted_kind = kind
                break
            is_cycle = nxt in via or nxt == cand["canon_url"]
            key = seen_key(nxt, None)
            if not cfg.allow_url_revisit and key in seen and not is_cycle:
                register(page)
                aborted_kind = "AlreadyVisited"
                break
            seen.add(key)  # every hop marked visited (colly.go:1486-1510)
            if is_cycle:
                # stop following; use last response (colly.go:1476-1485).
                # No register: this page IS the final response — its
                # set_cookie goes through the require-gated final path.
                break
            register(page)
            via.append(cur)
            cur = nxt

        # U3 require check on the FINAL page only: the jar (previous
        # rounds) plus cookies set within this chain; failure serves 403.
        # require_header likewise: the merged request headers must carry
        # the demanded "Name=value" (auth-token pages)
        cookie_fail = False
        if page is not None and aborted_kind is None:
            req = page.get("require_cookie")
            if req is not None and req not in (jar.get(page["domain"], set()) | chain_cookies):
                cookie_fail = True
            hreq = page.get("require_header")
            if hreq is not None:
                name, _, want = hreq.partition("=")
                if hdr.get(name) != want:
                    cookie_fail = True

        if page is None:
            status = 0
            fetch_ms = delay
        else:
            status = 403 if cookie_fail else page["status"]
            fetch_ms = page["serve_delay_ms"] + delay
        # E2 OnResponseHeaders abort (http_backend.go:228-232): matching
        # Content-Type kills the response after the header read — preempts
        # the HTTPError classification and the parse
        if page is not None and aborted_kind is None and any(
            p.search(page.get("content_type") or "")
            for p in _compiled_header_aborts(cfg)
        ):
            aborted_kind = "AbortedAfterHeaders"

        def _visit(seq: int) -> dict:
            return {
                "fetch_seq": seq,
                "enqueue_seq": cand["enqueue_seq"],
                "url": cand["canon_url"],
                "final_url": cur,
                "domain": cand["domain"],
                "depth": cand["depth"],
                "status": status,
                "fetch_ms": fetch_ms,
                # X5 round-robin proxy assignment (proxy/proxy.go:31-38)
                "proxy": (cfg.proxies[seq % len(cfg.proxies)]
                          if cfg.proxies else None),
                "round": rnd,
            }

        head_ok = True
        if cfg.check_head:
            res.visits.append(_visit(2 * slot))  # the HEAD precheck
            # an error STATUS only fails the HEAD when ParseHTTPErrorResponse
            # is off — handleOnError returns nil for any status under it
            # (colly.go:1320-1323), so Visit() still issues the GET
            head_ok = (
                page is not None
                and aborted_kind is None
                and (status < 300 or cfg.parse_http_error_response)
            )
        if head_ok:
            res.visits.append(_visit(fetch_seq))
        # final page's set_cookie registers require-gated (a 403'd page
        # does not set; a header-aborted/never-fetched page neither)
        if page is not None and aborted_kind is None and not cookie_fail:
            ck = page.get("set_cookie")
            if ck is not None:
                jar_pending.append((page["domain"], ck))
        def _maybe_retry() -> None:
            # E4 Request.Retry (request.go:157-163): re-submit next round,
            # checkRevisit=false, same depth; sel_idx=-2 orders the retry
            # before this parent's link children (OnError precedes OnHTML,
            # colly.go:744 vs :759)
            if (
                cfg.retry_on_status
                and status in cfg.retry_on_status
                and cand.get("retries", 0) < cfg.max_retries
            ):
                next_children.append(
                    {
                        "url": cand["canon_url"],
                        "depth": cand["depth"],
                        "method": cand["method"],
                        "body": cand["body"],
                        # Retry keeps the request's headers (request.go:157-163
                        # only deletes the Cookie header, which the jar models
                        # separately)
                        "headers": cand.get("headers"),
                        "ctx": cand.get("ctx") or {},
                        "parent_seq": fetch_seq,
                        "sel_idx": -2,
                        "elem_idx": 0,
                        "link_idx": 0,
                        "skip_seen_check": True,
                        "retries": cand.get("retries", 0) + 1,
                    }
                )

        if aborted_kind:
            res.errors.append(_err(cand["enqueue_seq"], cand["canon_url"], cand["depth"], aborted_kind, rnd, status))
            return
        if page is None:
            res.errors.append(_err(cand["enqueue_seq"], cand["canon_url"], cand["depth"], "ErrFetch", rnd, 0))
            _maybe_retry()
            return
        ok = status < 300 or cfg.parse_http_error_response
        if status >= 300:
            res.errors.append(_err(cand["enqueue_seq"], cand["canon_url"], cand["depth"], f"HTTPError{status}", rnd, status))
            _maybe_retry()
            # without ParseHTTPErrorResponse there is nothing to parse; with
            # it the GET happened (head_ok above passes error statuses under
            # it) and its response parses like any other
            if not cfg.parse_http_error_response:
                return
        if not _is_html(page):
            return
        base = page.get("base_href") or cur
        for li, raw in enumerate(page["links"] or [] if cfg.follow_links else []):
            child_url = absolutize(base, raw)
            if child_url is None:
                continue  # fragment-only (request.go:102-104)
            next_children.append(
                {
                    "url": child_url,
                    "depth": cand["depth"] + 1,
                    "method": GET,
                    "body": None,
                    "ctx": cand.get("ctx") or {},
                    "parent_seq": fetch_seq,
                    "sel_idx": 0,
                    "elem_idx": li,
                    "link_idx": li,
                }
            )
        if ok and cfg.extract_images:
            for iid in page.get("image_refs") or []:
                img = site.images_by_id().get(iid)
                res.results.append(
                    {
                        "fetch_seq": fetch_seq,
                        "url": cur,
                        "depth": cand["depth"],
                        "status": status,
                        "image_id": iid,
                        "caption": img["caption"] if img else None,
                        "round": rnd,
                    }
                )

    # round 0 submissions: seeds in input order (queue/queue.go:81-99)
    new_candidates: list[dict] = [
        {
            "url": s["url"],
            "depth": 1,  # root Visit depth=1 (colly.go:543)
            "method": s.get("method", GET),
            "body": s.get("body"),
            "headers": s.get("headers"),
            "ctx": s.get("ctx") or {},
            "parent_seq": -1,
            "sel_idx": -1,
            "elem_idx": i,
            "link_idx": i,
        }
        for i, s in enumerate(seeds)
    ]

    limit = max_rounds if max_rounds is not None else cfg.max_rounds
    rnd = 0
    while rnd < limit and (new_candidates or pending):
        next_children: list[dict] = []
        for cand in new_candidates:
            submit(cand, rnd)
        new_candidates = []
        # dispatch: FIFO by enqueue_seq with per-domain politeness tokens
        pending.sort(key=lambda c: c["enqueue_seq"])
        taken_by_domain: dict[str, int] = {}
        dispatch, deferred = [], []
        for cand in pending:
            rule_idx = match_rule_idx(cand["domain"], cfg.limit_rules)
            rule = cfg.limit_rules[rule_idx] if rule_idx >= 0 else None
            tokens = tokens_for_rule(rule, cfg.round_budget_ms, cfg.service_est_ms)
            if cfg.respect_crawl_delay and not cfg.ignore_robots_txt:
                # S2 extension mirror: robots Crawl-delay caps the domain's
                # tokens (parallelism 1 while delaying), same formula as
                # the engine's _robots_delay_caps
                r = robots.get(cand["domain"])
                body = r["body"] if r is not None and not r["fetch_fails"] else None
                d = robots_crawl_delay(body, cfg.user_agent)
                if d is not None:
                    tokens = min(
                        tokens,
                        tokens_for_delay(d, cfg.round_budget_ms, cfg.service_est_ms),
                    )
            n = taken_by_domain.get(cand["domain"], 0)
            if n < tokens:
                taken_by_domain[cand["domain"]] = n + 1
                dispatch.append(cand)
            else:
                deferred.append(cand)
        pending = deferred
        for cand in dispatch:
            fetch_one(cand, rnd)
        # jar commit: cookies set this round become visible next round
        # (the engine's cookies table commits at the round barrier)
        for h, ck in jar_pending:
            jar.setdefault(h, set()).add(ck)
        jar_pending = []
        new_candidates = next_children
        rnd += 1

    res.rounds = rnd
    res.seen_keys = set(seen)
    res.url_seen = {k[0] for k in seen}
    return res


def _is_html(page: dict) -> bool:
    ct = (page.get("content_type") or "").split(";")[0].strip().lower()
    return ct in ("text/html", "application/xhtml+xml")


def _err(seq, url, depth, kind, rnd, status=0) -> dict:
    return {
        "enqueue_seq": seq,
        "url": url,
        "depth": depth,
        "error_kind": kind,
        "status": status,
        "round": rnd,
    }
