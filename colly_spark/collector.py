"""U1/U2/E2/E3/F7 user surface: a colly-shaped ``Collector`` facade over the
round-based engine.

Colly's API is imperative and callback-driven (colly.go:313-511 options,
colly.go:929-1051 callback registration, colly.go:1423-1459 Clone); the
engine is declarative and set-oriented. The facade maps between them:

- functional options -> :class:`colly_spark.config.CrawlConfig` fields,
  same names (U1); ``from_env`` mirrors the ``COLLY_*`` variables
  (colly.go:255-308).
- ``on_html(selector)`` / ``on_html_detach`` (E3) toggle which extractors
  the vectorized parse stage runs. The supported selector surface is the
  image+caption crawl schema (SURVEY.md §2 P9): ``a[href]`` (link follow)
  and ``figure img + figcaption`` (payload extraction). Arbitrary CSS
  selectors would need a general engine in the parse UDF — out of scope,
  and loudly rejected rather than silently ignored.
- ``on_request(abort_if=...)`` (E2/E4) registers declarative OnRequest
  abort predicates (URL regexes) evaluated identically by the engine
  (``rlike``) and the serial simulator (``re.search``) — the common
  ``if bad(url) { r.Abort() }`` pattern. Arbitrary Python callbacks would
  fork engine/simulator semantics; declarative predicates keep the parity
  guarantee.
- ``on_response`` / ``on_error`` / ``on_scraped`` register DataFrame taps:
  after the crawl they are applied, in registration order, to the visits /
  errors / results tables sorted by ``fetch_seq`` — the set-oriented
  restatement of colly's per-request dispatch order (colly.go:691-772).
- ``clone()`` -> same config + state location, fresh callbacks (U2). With a
  ``checkpoint_dir`` the URL-seen state is genuinely shared, matching
  colly's shared-``storage.Storage`` semantics.
- ``has_visited(url)`` / ``has_posted(url, body)`` -> point lookups against
  the url_seen table (F7, colly.go:547-555).
"""

from __future__ import annotations

import os
from dataclasses import replace
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from colly_spark.config import CrawlConfig
from colly_spark.engine import Crawler
from colly_spark.urlkit import canonicalize

SUPPORTED_SELECTORS = {
    "a[href]": "follow_links",
    "figure img + figcaption": "extract_images",
    "img[src]": "extract_images",
}


class Collector:
    """Facade: colly's Collector surface over the batch-iterative engine."""

    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        images: DataFrame,
        robots: DataFrame | None = None,
        checkpoint_dir: str | None = None,
        config: CrawlConfig | None = None,
        **options,
    ):
        # functional options (colly.go:326-488) by CrawlConfig field name;
        # selectors start UNregistered like a fresh colly.NewCollector()
        base = config if config is not None else CrawlConfig(
            follow_links=False, extract_images=False
        )
        if options:
            base = replace(base, **options)
        self.cfg = base
        self.spark = spark
        self.tables = dict(pages=pages, images=images, robots=robots)
        self.checkpoint_dir = checkpoint_dir
        self._seeds: list[dict] = []
        self._taps: list[tuple[str, Callable[[DataFrame], object]]] = []
        self._out: dict | None = None

    # ---------------- registration (E2/E3) ----------------

    def on_html(
        self,
        selector: str,
        follow: bool = False,
        attr: str | None = None,
        fields: dict | None = None,
        name: str | None = None,
        break_selector: str | None = None,
    ) -> "Collector":
        """Register an OnHTML extractor (colly.go:929-942).

        The two crawl built-ins keep their shortcut forms (``a[href]``
        follows links, the figure/img selectors extract the image payload —
        these are the parity-verified pipeline). Any other CSS selector
        registers a general extractor: ``follow=True`` feeds matched
        ``attr`` (default href) links into the frontier
        (request.go:122-124); otherwise matches land in the ``elements``
        output table with tag/Text/attrs (htmlelement.go:25-63) plus a
        declarative ``fields`` Unmarshal schema (unmarshal.go:51-223):
        ``{field: "child selector"}`` for ChildText or
        ``{field: ("child selector", "attr")}`` for ChildAttr.
        """
        shortcut = SUPPORTED_SELECTORS.get(selector)
        if shortcut is not None and not (follow or attr or fields or break_selector):
            self.cfg = replace(self.cfg, **{shortcut: True})
            return self
        return self._register(selector, follow, attr, fields, name, xpath=False,
                              break_selector=break_selector)

    def on_xml(
        self,
        xpath: str,
        follow: bool = False,
        attr: str | None = None,
        fields: dict | None = None,
        name: str | None = None,
    ) -> "Collector":
        """Register an OnXML XPath extractor (colly.go:946-959); evaluated
        under the XML content gate (colly.go:1249-1259): html-ish
        content-types get HTML-mode XPath, xml media types and .xml/.xml.gz
        paths get strict XML."""
        return self._register(xpath, follow, attr, fields, name, xpath=True)

    def _register(self, selector, follow, attr, fields, name, xpath,
                  break_selector=None) -> "Collector":
        from colly_spark import dom
        from colly_spark.config import ExtractorSpec

        if not xpath:
            dom.compile_css(selector)  # fail at registration, not mid-crawl
            if break_selector:
                dom.compile_css(break_selector)
        spec = ExtractorSpec(
            selector=selector,
            action="follow" if follow else "extract",
            attr=attr,
            fields=tuple(
                (k, v[0], v[1]) if isinstance(v, tuple) else (k, v, None)
                for k, v in (fields or {}).items()
            ),
            xpath=xpath,
            name=name,
            break_selector=break_selector,
        )
        self.cfg = replace(
            self.cfg, html_extractors=self.cfg.html_extractors + (spec,)
        )
        return self

    def on_html_detach(self, selector: str) -> "Collector":
        """OnHTMLDetach (colly.go:1008-1018): deactivate by selector."""
        shortcut = SUPPORTED_SELECTORS.get(selector)
        if shortcut is not None:
            self.cfg = replace(self.cfg, **{shortcut: False})
            return self
        kept = tuple(
            e for e in self.cfg.html_extractors
            if e.xpath or e.selector != selector
        )
        self.cfg = replace(self.cfg, html_extractors=kept)
        return self

    def on_xml_detach(self, xpath: str) -> "Collector":
        """OnXMLDetach (colly.go:1021-1029)."""
        kept = tuple(
            e for e in self.cfg.html_extractors
            if not e.xpath or e.selector != xpath
        )
        self.cfg = replace(self.cfg, html_extractors=kept)
        return self

    def unmarshal(self, selector: str, schema: dict, name: str | None = None) -> "Collector":
        """Declarative struct extraction (P9, unmarshal.go:51-223): one
        ``elements`` row per ``selector`` match, its ``fields`` map filled
        from the schema — the `selector:"..."` struct-tag form as a dict."""
        return self.on_html(selector, fields=schema, name=name)

    def on_request(self, abort_if: str | None = None) -> "Collector":
        """Register an OnRequest tap. Only the declarative abort form is
        supported: ``abort_if`` is a regex on the canonical URL."""
        if abort_if is not None:
            self.cfg = replace(
                self.cfg, abort_url_filters=self.cfg.abort_url_filters + (abort_if,)
            )
        return self

    def on_request_headers(
        self, abort_if: tuple[str, str] | None = None
    ) -> "Collector":
        """Register an OnRequestHeaders tap (colly.go:736-739; abort at
        http_backend.go:215-217). Declarative form only: ``abort_if`` is a
        ``(header_name, value_regex)`` pair over the MERGED request headers
        (defaults + per-request + User-Agent); a match kills the request
        after its politeness slot but before it is sent
        (ErrAbortedBeforeRequest)."""
        if abort_if is not None:
            self.cfg = replace(
                self.cfg,
                abort_request_header_filters=self.cfg.abort_request_header_filters
                + (tuple(abort_if),),
            )
        return self

    def set_headers(self, headers: dict[str, str]) -> "Collector":
        """Collector-default request headers (colly Collector.Headers,
        colly.go:645-657): merged into every request that carries none of
        its own."""
        self.cfg = replace(
            self.cfg, default_headers=tuple(sorted(headers.items()))
        )
        return self

    def on_response(self, fn: Callable[[DataFrame], object]) -> "Collector":
        self._taps.append(("visits", fn))
        return self

    def on_error(self, fn: Callable[[DataFrame], object]) -> "Collector":
        self._taps.append(("errors", fn))
        return self

    def on_scraped(self, fn: Callable[[DataFrame], object]) -> "Collector":
        self._taps.append(("results", fn))
        return self

    # ---------------- crawling ----------------

    def visit(self, url: str, headers: dict[str, str] | None = None) -> "Collector":
        """Queue a seed; ``headers`` rides on the request (the queue
        AddRequest path that preserves Request.Headers)."""
        self._seeds.append(
            {"url": url, "seed_seq": len(self._seeds), "headers": headers}
        )
        return self

    def wait(self, max_rounds: int | None = None) -> dict:
        """Run the crawl (colly's Async submit + Wait collapse into one
        barrier here) and fire the registered taps in order."""
        crawler = Crawler(
            self.spark, self.cfg, self.tables["pages"], self.tables["images"],
            self.tables["robots"], checkpoint_dir=self.checkpoint_dir,
        )
        self._out = crawler.run(self._seeds, max_rounds=max_rounds)
        for table, fn in self._taps:
            df = self._out[table]
            order = "fetch_seq" if table in ("visits", "results") else "round"
            fn(df.orderBy(order))
        return self._out

    # ---------------- state queries (F7) ----------------

    def _seen_hashes(self) -> DataFrame:
        if self._out is None:
            raise RuntimeError("call wait() first")
        return self._out["url_seen"]

    def has_visited(self, url: str) -> bool:
        canon = canonicalize(url)
        return not (
            self._seen_hashes()
            .where(F.col("url_hash") == F.xxhash64(F.lit(canon), F.lit(b"")))
            .isEmpty()
        )

    def has_posted(self, url: str, body: bytes) -> bool:
        canon = canonicalize(url)
        return not (
            self._seen_hashes()
            .where(F.col("url_hash") == F.xxhash64(F.lit(canon), F.lit(body)))
            .isEmpty()
        )

    # ---------------- clone (U2) ----------------

    def clone(self) -> "Collector":
        """Same config + state location, fresh callback registrations
        (colly.go:1423-1459: config copied, store shared, callbacks reset)."""
        return Collector(
            self.spark, self.tables["pages"], self.tables["images"],
            self.tables["robots"], checkpoint_dir=self.checkpoint_dir,
            config=replace(self.cfg, follow_links=False, extract_images=False,
                           html_extractors=(), abort_url_filters=(),
                           abort_request_header_filters=()),
        )


def from_env(base: CrawlConfig | None = None, env=os.environ) -> CrawlConfig:
    """COLLY_* environment configuration (colly.go:255-308, 1532-1544)."""
    cfg = base or CrawlConfig()
    fields = {}
    if "COLLY_USER_AGENT" in env:
        fields["user_agent"] = env["COLLY_USER_AGENT"]
    if "COLLY_MAX_DEPTH" in env:
        fields["max_depth"] = int(env["COLLY_MAX_DEPTH"])
    if "COLLY_ALLOWED_DOMAINS" in env:
        fields["allowed_domains"] = tuple(env["COLLY_ALLOWED_DOMAINS"].split(","))
    if "COLLY_DISALLOWED_DOMAINS" in env:
        fields["disallowed_domains"] = tuple(env["COLLY_DISALLOWED_DOMAINS"].split(","))
    if "COLLY_DISALLOWED_URL_FILTERS" in env:
        fields["disallowed_url_filters"] = tuple(
            env["COLLY_DISALLOWED_URL_FILTERS"].split(",")
        )
    if "COLLY_URL_FILTERS" in env:
        fields["url_filters"] = tuple(env["COLLY_URL_FILTERS"].split(","))
    if "COLLY_ALLOW_URL_REVISIT" in env:
        fields["allow_url_revisit"] = env["COLLY_ALLOW_URL_REVISIT"].lower() in (
            "1", "true", "y", "yes",
        )
    if "COLLY_MAX_BODY_SIZE" in env:
        fields["max_body_size"] = int(env["COLLY_MAX_BODY_SIZE"])
    if "COLLY_IGNORE_ROBOTSTXT" in env:
        fields["ignore_robots_txt"] = env["COLLY_IGNORE_ROBOTSTXT"].lower() in (
            "1", "true", "y", "yes",
        )
    if "COLLY_PARSE_HTTP_ERROR_RESPONSE" in env:
        fields["parse_http_error_response"] = env[
            "COLLY_PARSE_HTTP_ERROR_RESPONSE"
        ].lower() in ("1", "true", "y", "yes")
    if "COLLY_MAX_REQUESTS" in env:
        fields["max_requests"] = int(env["COLLY_MAX_REQUESTS"])
    return replace(cfg, **fields) if fields else cfg
