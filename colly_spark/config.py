"""CrawlConfig / LimitRule — the frozen config broadcast to executors.

Field-for-field coverage of the reference Collector options (colly.go:56-142)
and LimitRule (http_backend.go:52-67). Mutable collector *state* (store,
robotsMap, counters) is NOT here — it lives in state tables managed by
:mod:`colly_spark.statestore`.
"""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class LimitRule:
    """Per-domain politeness rule (http_backend.go:52-67).

    First matching rule wins, in registration (``rule_idx``) order
    (http_backend.go:143-155). ``parallelism`` caps concurrent fetches for
    matching domains (semaphore of cap max(parallelism,1),
    http_backend.go:105); after each response the worker sleeps
    ``delay + rand(random_delay)`` (http_backend.go:202-214).
    """

    domain_regexp: str | None = None
    domain_glob: str | None = None
    delay_ms: int = 0
    random_delay_ms: int = 0
    parallelism: int = 1

    def matches(self, domain: str) -> bool:
        if self.domain_regexp:
            return re.search(self.domain_regexp, domain) is not None
        if self.domain_glob:
            return fnmatch.fnmatch(domain, self.domain_glob)
        return False


def match_rule_idx(domain: str, rules: tuple[LimitRule, ...]) -> int:
    """Index of first matching rule, or -1 (http_backend.go:143-155)."""
    for i, r in enumerate(rules):
        if r.matches(domain):
            return i
    return -1


def tokens_for_rule(rule: LimitRule | None, round_budget_ms: int, service_est_ms: int = 10) -> int:
    """Fetch tokens one domain gets per round under ``rule``.

    Derived from the reference's steady-state throughput bound: a domain
    group with Parallelism P, Delay D and mean service time S sustains at
    most ``P * budget / (D + D_rand/2 + S)`` requests per ``budget`` of wall
    time (semaphore + post-response sleep, http_backend.go:202-214).
    Deterministic — shared by the engine and the serial simulator so visit
    order matches exactly under the same politeness budget.
    """
    if rule is None:
        return 1 << 30  # unlimited
    per_req_ms = rule.delay_ms + rule.random_delay_ms // 2 + service_est_ms
    par = max(rule.parallelism, 1)
    return max(par, int(par * round_budget_ms // max(per_req_ms, 1)))


def tokens_for_delay(delay_secs: float, round_budget_ms: int,
                     service_est_ms: int = 10) -> int:
    """Fetch tokens per round a robots Crawl-delay allows: serialized
    requests (parallelism 1) spaced ``delay_secs`` apart within the round
    budget, never below 1 so a delaying domain still progresses. Shared by
    the engine and the serial simulator (visit-order parity under
    respect_crawl_delay)."""
    per_req_ms = int(delay_secs * 1000) + service_est_ms
    return max(1, int(round_budget_ms // max(per_req_ms, 1)))


@dataclass(frozen=True)
class ExtractorSpec:
    """One general OnHTML/OnXML registration (colly.go:929-1051) in
    declarative form — the E2 callback surface restated as an extraction
    spec the vectorized parse UDF can run.

    action 'follow': matched elements' ``attr`` (default href) is
    absolutized and unioned into the next round's frontier, the
    ``e.Request.Visit(e.Attr("href"))`` pattern (request.go:122-124).
    action 'extract': matches land in the ``elements`` output table with
    the HTMLElement surface (tag/Text/attrs, htmlelement.go:25-63) plus
    ``fields`` — a declarative Unmarshal schema (unmarshal.go:51-223):
    each (field_name, child_selector, attr_or_None) yields the first
    matching descendant's attribute or trimmed ChildText
    (htmlelement.go:67-101).

    ``xpath=True`` makes ``selector`` an XPath evaluated per the XML gate
    (colly.go:1241-1259); otherwise it is a CSS selector (tag/.class/#id/
    [attr(=val)] compounds, descendant/``>``/``+``/``~`` combinators,
    groups).

    ``break_selector`` is ForEachWithBreak (htmlelement.go:119-131) in
    declarative form: iteration over this spec's matches stops at the first
    match that ALSO matches ``break_selector`` (that element and everything
    after it are not emitted) — the ``return false`` of the reference's
    callback restated as a stop predicate.
    """

    selector: str
    action: str = "extract"  # 'extract' | 'follow'
    attr: str | None = None
    fields: tuple[tuple[str, str, str | None], ...] = ()
    xpath: bool = False
    name: str | None = None
    break_selector: str | None = None


@dataclass(frozen=True)
class CrawlConfig:
    """Frozen crawl configuration (reference Collector fields, colly.go:56-142)."""

    user_agent: str = "colly-spark/0.1"  # colly.go:59 UserAgent
    max_depth: int = 0  # colly.go:63 (0 = unlimited; root Visit has depth 1)
    allowed_domains: tuple[str, ...] = ()  # colly.go:66 exact-hostname match
    disallowed_domains: tuple[str, ...] = ()  # colly.go:68
    disallowed_url_filters: tuple[str, ...] = ()  # colly.go:74, checked first
    url_filters: tuple[str, ...] = ()  # colly.go:81, any-match required if set
    allow_url_revisit: bool = False  # colly.go:84
    max_body_size: int = 10 * 1024 * 1024  # colly.go:499 default 10 MiB
    ignore_robots_txt: bool = True  # colly.go:95,507 (default: ignore)
    # S2 extension beyond colly: honor robots.txt Crawl-delay as an extra
    # per-domain token cap (parallelism 1 while delaying, REP convention).
    # The reference's robots library PARSES CrawlDelay (temoto/robotstxt)
    # but colly never reads it — so this is default-OFF to preserve visit
    # order parity, and only meaningful with ignore_robots_txt=False.
    respect_crawl_delay: bool = False
    parse_http_error_response: bool = False  # colly.go:102
    detect_charset: bool = False  # colly.go:107; P0 response.go:97-106
    max_requests: int = 0  # colly.go:121 (0 = unlimited)
    max_url_length: int = 0  # extensions/url_length_filter.go:8-14 (0 = off)
    max_redirects: int = 10  # colly.go:1516-1519
    max_queue_size: int = 0  # queue/queue.go:234-236 (0 = unbounded)
    # X2 response cache (http_backend.go:157-200): GET-only, 5xx never
    # cached; 0 expiration = never expires (CacheExpiration :166-170).
    # Off by default like a colly Collector without CacheDir (colly.go:91).
    fetch_cache_enabled: bool = False
    cache_expiration_rounds: int = 0
    # X4 CheckHead (colly.go:537-544): issue a HEAD before every GET; the
    # GET is skipped when the HEAD errors. HEAD visits take the even
    # dispatch slots (2k), their GETs the odd (2k+1).
    check_head: bool = False

    # E2/E3 callback surface (colly.go:929-1051): which extractors are
    # active (OnHTML / OnHTMLDetach) and declarative OnRequest-abort
    # predicates (request.go:89-96 Abort inside an OnRequest callback).
    # Abort happens AFTER requestCheck: the URL is seen-marked and consumes
    # MaxRequests budget (colly assigns Request.ID first), but is never
    # fetched and consumes no politeness tokens (the LimitRule semaphore
    # sits inside backend.Do, past the abort point).
    # Request headers (colly.go:645-657): a request carrying NO headers
    # gets the collector defaults; User-Agent is set on top unless already
    # present. Seeds may carry per-request maps (queue AddRequest /
    # UnmarshalRequest preserve Headers); link children never do
    # (Request.Visit passes hdr=nil, request.go:122-124).
    default_headers: tuple[tuple[str, str], ...] = ()
    # E2 OnRequestHeaders abort (http_backend.go:215-217,
    # ErrAbortedBeforeRequest): declarative (header_name, value_regex)
    # predicates over the MERGED request headers, evaluated after the
    # LimitRule slot is taken (the politeness token is consumed and the
    # delay still sleeps — the deferred release in Do) but before the
    # request is sent: no response, no redirect hops, no cookies.
    abort_request_header_filters: tuple[tuple[str, str], ...] = ()
    follow_links: bool = True  # OnHTML("a[href]") registered
    extract_images: bool = True  # OnHTML("figure img + figcaption") registered
    html_extractors: tuple[ExtractorSpec, ...] = ()  # general OnHTML/OnXML
    abort_url_filters: tuple[str, ...] = ()  # regex on canonical URL
    # E2 OnResponseHeaders abort (http_backend.go:228-232): a response whose
    # Content-Type matches any regex is dropped after the header read —
    # ErrAbortedAfterHeaders, body never parsed/cached. The common
    # "abort binaries by header" callback in declarative form.
    abort_response_header_filters: tuple[str, ...] = ()
    # E4 Request.Retry (request.go:157-163) declaratively: a fetch whose
    # status lands in retry_on_status (0 = network error) is re-submitted
    # next round with checkRevisit=false (skip_seen_check), same depth, up
    # to max_retries times. colly leaves the loop to the OnError callback;
    # the cap replaces the user's own retry bookkeeping.
    retry_on_status: tuple[int, ...] = ()
    max_retries: int = 1
    # X5 proxy rotation (proxy/proxy.go:31-57): round-robin by request —
    # deterministically proxies[fetch_seq % n], recorded per visit. A no-op
    # under synthetic fetch beyond the recorded assignment.
    proxies: tuple[str, ...] = ()
    # X2 maintenance: every N rounds the cache table is rewritten keeping
    # only the newest live entry per url_hash and dropping expired rounds
    # (the reference removes expired cache files; an append-only cache of
    # full page bodies otherwise grows without bound). 0 = never.
    fetch_cache_compact_every: int = 8

    limit_rules: tuple[LimitRule, ...] = ()
    round_budget_ms: int = 1000  # wall budget a round models for politeness
    service_est_ms: int = 10
    seed: int = 42  # drives RandomDelay determinism

    # engine knobs (no reference analog; scale controls)
    shuffle_partitions: int = 32
    # Per-round AQE policy. AQE's value (partition coalescing, skew splits,
    # runtime broadcast) scales with the round's DATA size, but its cost is
    # CONSTANT per exchange: every shuffle stage of every state query
    # becomes its own driver-side scheduling-barrier job (~35 jobs/round
    # measured by tools/prof_jobs.py). For small rounds that barrier chain
    # dominates: the identical 250k-page crawl measured 565.7 urls/s with
    # AQE on vs 1,183.8 with it off, back-to-back (BENCH/BASELINE.md r4).
    # The engine therefore sets spark.sql.adaptive.enabled per round:
    # ON when the round's frontier is at least this many rows (the 100-TB
    # regime, where a 10^10-URL frontier needs skew handling), OFF below
    # it. 0 = never manage (leave the session setting untouched).
    adaptive_min_round_rows: int = 10_000_000
    seen_bloom_enabled: bool = True  # Bloom pre-filter in front of the exact anti-join
    # adaptive activation: below this many cumulative enqueued requests the
    # exact anti-join is strictly cheaper than filter maintenance + probe
    # (measured 2x whole-crawl wall at a 1M-page fixture), so the Bloom
    # path arms itself only once the seen set is big enough to matter; at
    # activation the filters are rebuilt once from url_seen. 0 = always on
    # (parity tests force this).
    seen_bloom_min_seen: int = 2_000_000
    seen_bloom_fpp: float = 0.01
    seen_bloom_partitions: int = 64  # sandbox-scale stand-in for 4096 at 10^10
    seen_bloom_capacity_per_partition: int = 65536  # 2.45e6 at the 10^10 point
    # 'broadcast' ships all filter blobs to every executor (right while the
    # set is small); 'cogroup' keeps each blob partition-local (the 10^10
    # path); 'auto' picks by the statically-known total size
    seen_bloom_delivery: str = "auto"
    seen_bloom_broadcast_max_bytes: int = 64 * 1024 * 1024
    # url_seen base/tail maintenance (statestore bucketed tables): recent
    # appends live in a small broadcast-joined tail; every N rounds the
    # tail folds into the hash-partitioned base with one shuffle. The base
    # side of the per-round seen probe never re-shuffles (its partitioning
    # survives the checkpoint), so per-round seen cost is O(frontier +
    # tail), not O(all URLs ever seen) — the 10^10-URL cliff §4.3 removes.
    seen_merge_every: int = 8
    max_rounds: int = 64

    extra: dict = field(default_factory=dict, compare=False, hash=False)

    def compiled_disallowed(self) -> list[re.Pattern]:
        return [re.compile(p) for p in self.disallowed_url_filters]

    def compiled_allowed(self) -> list[re.Pattern]:
        return [re.compile(p) for p in self.url_filters]

    def compiled_aborts(self) -> list[re.Pattern]:
        return [re.compile(p) for p in self.abort_url_filters]
