"""The batch-iterative crawl engine: colly's Collector as a driver round loop
over state tables (SURVEY.md §3.4).

Per round, one Catalyst-optimized submission plan runs the full requestCheck
pipeline set-wise (F1 canonicalize -> F2 hash -> F3/F4 static gates -> F6
robots -> F5 seen dedup -> enqueue sequencing), then the scheduler splits the
FIFO frontier under per-domain politeness tokens (S1/S2), the fetch stage
resolves redirects and joins the synthetic web (X1/X3), and the parse stage
extracts links + image/caption pairs feeding the next round (P1-P11). Every
table append is checkpointed through :class:`colly_spark.statestore.StateStore`
so any round is resumable.

The produced dispatch order (``fetch_seq``) and url_seen set are asserted
equal to the serial golden simulator (:mod:`colly_spark.simulator`) — the
north rule's equality clause. All sequencing derives from data (enqueue
order tuples), never from partition or task ids, so results are identical at
any parallelism.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from colly_spark import bloomseen, schemas
from colly_spark.config import CrawlConfig
from colly_spark.operators import parse as parse_op
from colly_spark.operators import payload as payload_op
from colly_spark.operators import robots as robots_op
from colly_spark.operators import schedule as sched_op
from colly_spark.operators.fetch import fetch_ms_col, redirect_closure
from colly_spark.operators.filters import static_filter_kind
from colly_spark.operators.seq import with_ordered_counts
from colly_spark.statestore import make_state_store
from colly_spark.urlkit import register_udfs

GET = "GET"

# internal candidate schema (pre-acceptance); FRONTIER = accepted superset
CANDIDATES = StructType(
    [
        StructField("url_raw", StringType()),
        StructField("depth", IntegerType()),
        StructField("method", StringType()),
        StructField("body", BinaryType()),
        # NULL = "collector defaults" (colly.go:645-657); only seeds and
        # retries ever carry a map — link children are always NULL
        StructField("headers", MapType(StringType(), StringType())),
        StructField("ctx", MapType(StringType(), StringType())),
        StructField("parent_url", StringType()),
        StructField("parent_seq", LongType()),
        StructField("sel_idx", IntegerType()),
        StructField("elem_idx", IntegerType()),
        StructField("link_idx", IntegerType()),
        StructField("skip_seen_check", BooleanType()),
        StructField("retries", IntegerType()),
    ]
)

ORDER_COLS = ["parent_seq", "sel_idx", "elem_idx", "link_idx"]

STATE_SCHEMAS = {
    "url_seen": schemas.URL_SEEN,
    "robots_cache": schemas.ROBOTS_CACHE,
    "visits": schemas.VISITS,
    "errors": schemas.ERRORS,
    "results": schemas.RESULTS,
    "elements": schemas.ELEMENTS,
    "lineage": schemas.LINEAGE,
    "pending": schemas.FRONTIER,
    "candidates": CANDIDATES,
    "seen_filters": bloomseen.SEEN_FILTERS,
    "fetch_cache": schemas.FETCH_CACHE,
    "cookies": schemas.COOKIES,
}


@dataclass
class RoundStats:
    round: int
    submitted: int
    accepted: int
    dispatched: int
    deferred: int
    children: int
    t_submit: float = 0.0
    t_dispatch: float = 0.0
    t_fetch: float = 0.0
    t_parse: float = 0.0
    t_commit: float = 0.0


class Crawler:
    """Collector facade over the round-based dataflow (U1/U2 surface)."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: CrawlConfig,
        pages: DataFrame,
        images: DataFrame,
        robots: DataFrame | None = None,
        checkpoint_dir: str | None = None,
        fetcher=None,
    ):
        self.spark = spark
        self.cfg = cfg
        self.pages = pages
        self.images = images
        # X1 seam: an optional real fetch stage (operators/httpfetch.py) that
        # replaces the synthetic content join — it must append the same page
        # columns the join provides, given the dispatch frame
        self.fetcher = fetcher
        self.robots_fixture = robots if robots is not None else spark.createDataFrame(
            [], schema=schemas.ROBOTS_FIXTURE
        )
        self.store = make_state_store(
            spark, STATE_SCHEMAS, checkpoint_dir,
            replace_tables=("pending", "candidates", "seen_filters"),
            # url_seen as an LSM-shaped bucketed table: partitioned base
            # (probe joins re-shuffle only the candidate side) + small
            # recent-append tail (broadcast). Keys = (domain_hash,
            # url_hash) — the same politeness-aligned bucketing as the
            # Bloom sidecar, so filter partitions and seen buckets line up.
            bucketed={
                "url_seen": {
                    "keys": ("domain_hash", "url_hash"),
                    "partitions": cfg.shuffle_partitions,
                    "merge_every": cfg.seen_merge_every,
                }
            },
        )
        self.bloom_m, self.bloom_k = bloomseen.bloom_params(
            cfg.seen_bloom_capacity_per_partition, cfg.seen_bloom_fpp
        )
        # total filter bytes are statically known from config — pick the
        # delivery mode without any runtime probe
        if cfg.seen_bloom_delivery == "auto":
            total = cfg.seen_bloom_partitions * (self.bloom_m // 8)
            self._bloom_delivery = (
                "broadcast" if total <= cfg.seen_bloom_broadcast_max_bytes else "cogroup"
            )
        else:
            self._bloom_delivery = cfg.seen_bloom_delivery
        self._bloom_bcs: list = []  # (round, broadcast) pairs pending destroy
        self._bloom_ready = False  # filters known to cover url_seen fully
        self.url_parts_udf, _ = register_udfs()
        self.rule_idx_udf = sched_op.make_rule_idx_udf(cfg)
        self.robots_kind_fn = robots_op.robots_gate_kind(cfg.user_agent)
        self.validate_udf = payload_op.make_validate_udf()
        self.extract_udf = parse_op.make_extract_udf(
            cfg.follow_links, cfg.extract_images, cfg.html_extractors,
            cfg.detect_charset,
        )
        # X3: distributed bounded closure of the (config-static) redirect
        # graph, computed once — never a driver collect (redirect edges are
        # billions of rows at 10^10 scale). Materialized here so every
        # round's left join reads a cached, size-known frame.
        self.redirects = redirect_closure(
            pages, cfg, self.url_parts_udf, static_filter_kind
        ).persist()
        self._n_redirects = self.redirects.count()
        # U3 cookies (colly.go:1612-1650): the set/require surface of the
        # synthetic web is config-static, so one tiny projection decides
        # whether the crawl pays ANY cookie work. Zero cookie pages (the
        # normal crawl, and the bench) -> zero extra joins per round.
        # A small cookie-page set (the overwhelmingly common case — colly's
        # jar is an in-process map) collects ONCE to literal map columns:
        # every per-row cookie decision then folds into the fetch plan as
        # plain expressions, adding zero joins/aggregations/actions per
        # round (measured: the join-based path cost ~4x crawl wall on a
        # 102k-page fixture with 400 never-visited cookie pages). Beyond
        # the threshold the join-based path takes over.
        self.cookie_pages = None
        self._n_cookie_pages = 0
        self._cookie_set_map: dict[str, str] | None = None
        self._cookie_dom_map: dict[str, str] | None = None
        if "set_cookie" in pages.columns:
            self.cookie_pages = pages.where(
                F.col("set_cookie").isNotNull() | F.col("require_cookie").isNotNull()
            ).select("url", "domain", "set_cookie").persist()
            self._n_cookie_pages = self.cookie_pages.count()
            if 0 < self._n_cookie_pages <= 10_000:
                setters = [
                    r for r in self.cookie_pages.collect() if r["set_cookie"] is not None
                ]
                self._cookie_set_map = {r["url"]: r["set_cookie"] for r in setters}
                self._cookie_dom_map = {r["url"]: r["domain"] for r in setters}
        # E2 request headers: like cookies, one config/fixture probe decides
        # whether the crawl pays ANY per-round header work (the merged-map
        # column, the abort predicate, the require-header join column)
        self._n_hdr_pages = 0
        if "require_header" in pages.columns:
            self._n_hdr_pages = pages.where(
                F.col("require_header").isNotNull()
            ).count()
        if self.fetcher is not None and (self._n_cookie_pages or self._n_hdr_pages):
            # over real HTTP those gates live server-side (the jar rides the
            # Cookie header); the fetcher seam would need to send/receive
            # them on the wire — loudly out of scope for the drop-in fetcher
            raise NotImplementedError(
                "fetcher mode does not support cookie/header-gated fixture "
                "pages; serve them from the fixture join or extend "
                "HttpFetcher to carry the jar on the wire"
            )
        self.stats: list[RoundStats] = []
        self._pins: list[DataFrame] = []
        self._prebuild()

    # ------------------------------------------------------------------
    def _robots_delay_caps(self):
        """See operators/robots.robots_delay_caps (S2 Crawl-delay caps)."""
        return robots_op.robots_delay_caps(
            self.store.get("robots_cache"),
            self.cfg.user_agent,
            self.cfg.round_budget_ms,
            self.cfg.service_est_ms,
        )

    def _prebuild(self) -> None:
        """Build every config-static plan fragment ONCE.

        The round DAG is config-static — only the input frames change — so
        all Column expressions and projection lists that depend only on the
        CrawlConfig (filters, header/cookie machinery, the fetch-time
        model, the fetch-phase select lists) are constructed here and
        reused by every round. Re-building them per round was the dominant
        serial term of the round loop (BENCH/BASELINE.md r3 attribution:
        ~4 s/round of pure py4j DataFrame-API chatter, ratio 1.0x between
        2 and 8 cores — the Amdahl cap behind the 0.65 scaling
        efficiency). Column objects are immutable expression trees bound
        to names, not frames, so reuse across rounds is safe.
        """
        cfg = self.cfg
        hdr_on = bool(cfg.abort_request_header_filters)

        # ---- submission: cwide projection (F1 canonicalize + F2 hash) ----
        cand_cols = [f.name for f in CANDIDATES.fields]
        self._sel_cwide = [
            *cand_cols,
            F.col("__p.canon_url").alias("canon_url"),
            F.col("__p.domain").alias("domain"),
            F.col("__p.path_query").alias("path_query"),
            F.xxhash64(
                F.coalesce(F.col("__p.canon_url"), F.lit("")),
                F.coalesce("body", F.lit(b"")),
            ).alias("url_hash"),
            self.rule_idx_udf(F.col("__p.domain")).alias("rule_idx"),
            # politeness-aligned seen-partition key, shared by the url_seen
            # insert and the Bloom probe (must match on both sides — a
            # mismatch would turn Bloom false negatives into missed dedups)
            F.pmod(F.xxhash64(F.col("__p.domain")), F.lit(cfg.seen_bloom_partitions))
            .cast("int").alias("__dh"),
        ]
        # ---- skinny requestCheck projection + static gates ----
        self._sk_carry = [
            *ORDER_COLS, "url_hash", "__dh", "domain", "path_query", "method",
            "depth", "skip_seen_check", "rule_idx", "__body_notnull",
            "__url_bad", "__static_kind", "__abort",
        ]
        self._sel_sk = [
            *ORDER_COLS, "url_hash", "__dh", "domain", "path_query", "method",
            "depth", "skip_seen_check", "rule_idx",
            F.col("body").isNotNull().alias("__body_notnull"),
            F.col("canon_url").isNull().alias("__url_bad"),
            static_filter_kind(cfg, F.col("canon_url"), F.col("domain")).alias(
                "__static_kind"
            ),
            _abort_match(cfg, F.col("canon_url")).alias("__abort"),
        ]
        self._x_depth_bad = (
            (F.lit(cfg.max_depth) > 0) & (F.col("depth") > cfg.max_depth)
        )
        # pre_ok before the robots verdict exists (feeds the robots
        # cache-fill host filter)...
        self._x_pre_static = (
            ~F.col("__url_bad") & ~self._x_depth_bad & F.col("__static_kind").isNull()
        )
        if cfg.ignore_robots_txt:
            self._sel_sk.append(F.lit(None).cast("string").alias("__robots_kind"))
            self._x_pre_ok = self._x_pre_static
        else:
            # ...and the post-join projection that folds the robots verdict
            # + helper-column drop into one select
            self._sel_sk_robots = [
                *self._sk_carry,
                self.robots_kind_fn(
                    F.col("robots_body"), F.col("path_query"),
                    F.coalesce("fetch_failed", F.lit(False)), F.col("method"),
                ).alias("__robots_kind"),
            ]
            self._x_pre_ok = self._x_pre_static & F.col("__robots_kind").isNull()
        self._x_checkable = (
            F.lit(not cfg.allow_url_revisit)
            & ~F.coalesce(F.col("skip_seen_check"), F.lit(False))
            # quirk colly.go:794-796: non-GET with nil body skips the check
            & ((F.col("method") == GET) | F.col("__body_notnull"))
        )
        flag_a = self._x_pre_ok & ~self._x_checkable
        flag_b = self._x_pre_ok & self._x_checkable & ~F.col("__seen_prev")
        self._x_flags = flag_a | flag_b
        wprior = (
            Window.partitionBy("url_hash")
            .orderBy(*ORDER_COLS)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        self._x_prior = F.coalesce(
            F.sum(self._x_flags.cast("long")).over(wprior), F.lit(0)
        )
        self._x_dup = self._x_checkable & (F.col("__prior_marked") > 0)
        self._x_eligible = self._x_flags & ~self._x_dup
        self._x_tokens_map = sched_op.tokens_map_expr(cfg)

        # ---- fetch phase ----
        self._x_hdr_abort = _req_hdr_abort_match(cfg) if hdr_on else None
        self._disp_cols = [f.name for f in schemas.FRONTIER.fields] + ["fetch_seq"]
        if hdr_on:
            self._disp_cols.append("__hdr_abort")
        hfc = F.col("__hdr_abort")
        final0 = F.coalesce(F.col("final_url"), F.col("canon_url"))
        cyc0 = F.coalesce(F.col("is_cycle"), F.lit(False))
        if hdr_on:
            # header-aborted requests never reach Client.Do
            # (http_backend.go:215-222): no redirect hops followed or
            # seen-marked, no chain cookies, no response — only the
            # politeness slot + delay are spent
            self._sel_fetch1 = [
                *self._disp_cols,
                F.when(hfc, F.col("canon_url")).otherwise(final0).alias("final_url"),
                F.when(hfc, F.lit(None).cast("array<string>"))
                .otherwise(F.col("hops")).alias("hops"),
                F.when(hfc, F.lit(False)).otherwise(cyc0).alias("is_cycle"),
                F.when(hfc, F.lit(None).cast("string"))
                .otherwise(F.col("abort_kind")).alias("abort_kind"),
            ]
        else:
            self._sel_fetch1 = [
                *self._disp_cols,
                final0.alias("final_url"), F.col("hops"),
                cyc0.alias("is_cycle"), F.col("abort_kind"),
            ]
        self._after1 = self._disp_cols + ["final_url", "hops", "is_cycle", "abort_kind"]
        eff0 = F.when(
            F.col("abort_idx").isNotNull(),
            F.when(F.col("abort_idx") == 0, F.col("canon_url")).otherwise(
                F.element_at("hops", F.col("abort_idx").cast("int"))
            ),
        ).otherwise(F.col("final_url"))
        ak0 = F.when(
            F.col("abort_idx").isNotNull(), F.lit("AlreadyVisited")
        ).otherwise(F.col("abort_kind"))
        if hdr_on:
            # ErrAbortedBeforeRequest is the actual sentinel Do returns for
            # a header-stage abort (distinct from the OnRequest-stage
            # "AbortedBeforeRequest" kind, which never dispatches at all);
            # the null __effective_url keeps the page join from serving a
            # response that was never requested
            eff0 = F.when(hfc, F.lit(None).cast("string")).otherwise(eff0)
            ak0 = F.when(hfc, F.lit("ErrAbortedBeforeRequest")).otherwise(ak0)
        self._sel_fetch2 = [
            *self._after1, "abort_idx",
            eff0.alias("__effective_url"), ak0.alias("__abort_kind2"),
        ]
        self._after_rp = self._after1 + [
            "abort_idx", "__effective_url", "__abort_kind2", "fetch_partition",
        ]
        # hop-explode projection + the hop seen-partition key (same
        # partition-key formula as the candidate side — hop hashes must
        # land in the same seen bucket / Bloom partition as a later
        # resubmission of the hop URL, or dedup false-negatives)
        self._sel_hops = [
            "fetch_seq", "abort_kind", F.size("hops").alias("n_hops"),
            F.posexplode_outer("hops").alias("hop_idx", "hop_url"),
        ]
        self._x_hop_hash = F.xxhash64("hop_url", F.lit(b""))
        self._x_hop_dh = F.pmod(
            F.xxhash64(self.url_parts_udf("hop_url").getField("domain")),
            F.lit(cfg.seen_bloom_partitions),
        ).cast("int")

        # static page-side frame for the X1 content join
        page_extra = (
            [
                F.col("domain").alias("page_domain"),
                F.col("set_cookie").alias("page_set_cookie"),
                F.col("require_cookie").alias("page_require_cookie"),
            ]
            if self._n_cookie_pages
            else []
        )
        page_names = [
            "page_status", "page_content_type", "page_body", "page_base_href",
            "serve_delay_ms",
        ]
        if self._n_cookie_pages:
            page_names += ["page_domain", "page_set_cookie", "page_require_cookie"]
        if self._n_hdr_pages:
            page_extra = page_extra + [F.col("require_header").alias("page_require_hdr")]
            page_names.append("page_require_hdr")
        self._page_side = self.pages.select(
            F.col("url").alias("__pu"),
            F.col("status").alias("page_status"),
            F.col("content_type").alias("page_content_type"),
            F.col("body").alias("page_body"),
            F.col("base_href").alias("page_base_href"),
            F.col("serve_delay_ms").alias("serve_delay_ms"),
            *page_extra,
        )
        self._page_names = page_names

        # post-page-join projections: page_status rewrites (require_header /
        # require_cookie -> 403), the body cap, the fetch-time model and the
        # cookie fast-path expressions, folded into at most two selects
        status_x = F.col("page_status")
        self._x_hdr_fail = None
        if self._n_hdr_pages:
            # require_header gate ("Name=value", split at the FIRST '='):
            # the merged request headers must carry it or the page serves
            # 403 — evaluated on real responses only (never on aborted
            # chains, matching the simulator's page/abort guard)
            _hname = F.substring_index("page_require_hdr", "=", 1)
            _hwant = F.expr(
                "substring(page_require_hdr, instr(page_require_hdr, '=') + 1)"
            )
            self._x_hdr_fail = (
                F.col("page_require_hdr").isNotNull()
                & F.col("__abort_kind2").isNull()
                & ~F.coalesce(
                    F.element_at(_merged_headers_col(cfg), _hname) == _hwant,
                    F.lit(False),
                )
            )
            status_x = F.when(self._x_hdr_fail, F.lit(403)).otherwise(status_x)
        hops_c = F.coalesce("hops", F.array().cast("array<string>"))
        self._cookie_fast = self._n_cookie_pages and self._cookie_set_map is not None
        self._x_cookie_fail = None
        if self._cookie_fast:
            # U3 fast path (see __init__): setter pages as literal map
            # columns — src/chain cookie resolution is pure expressions
            # inside the existing fetch plan, zero extra joins per round.
            set_map = _lit_map(self._cookie_set_map)
            resp_len = F.greatest(
                F.lit(0),
                F.when(F.col("abort_idx").isNotNull(), F.col("abort_idx"))
                .when(F.col("abort_kind").isNotNull(), F.size(hops_c))
                .otherwise(F.size(hops_c) - 1),
            ).cast("int")
            # guard the literal-map lookup: only redirect sources can
            # contribute a chain cookie, and map-literal element_at is a
            # linear scan — unguarded it costs O(|setters|) per ROW
            src_possible = (F.size(hops_c) > 0) | F.col("abort_kind").isNotNull()
            self._x_src_ck = F.when(
                src_possible, F.element_at(set_map, F.col("canon_url"))
            )
            self._x_chain_hops = F.slice(hops_c, F.lit(1), resp_len)
            chain = F.filter(
                F.transform("__chain_hops", lambda h: F.element_at(set_map, h)),
                lambda x: x.isNotNull(),
            )
            req = F.col("page_require_cookie")
            has = (
                F.coalesce(F.array_contains("__jar", req), F.lit(False))
                | F.coalesce(F.array_contains(chain, req), F.lit(False))
                | ((F.size(hops_c) > 0)
                   & F.coalesce(F.col("__src_ck") == req, F.lit(False)))
            )
            self._x_cookie_fail = req.isNotNull() & ~has
            status_x = F.when(self._x_cookie_fail, F.lit(403)).otherwise(status_x)
        body_x = (
            # X1 body cap (http_backend.go:235-237 io.LimitReader): applied
            # at the fetch seam, before parse and before the cache
            # write-back, so every downstream consumer sees the capped body
            F.expr(f"substring(page_body, 1, {int(cfg.max_body_size)})")
            if cfg.max_body_size > 0
            else F.col("page_body")
        )
        self._x_status_final = status_x
        self._x_body_final = body_x
        self._x_fetch_ms = fetch_ms_col(cfg)

        # X5 proxy rotation: deterministic round-robin by dispatch order
        # (proxy/proxy.go:31-38's atomic counter restated as fetch_seq % n)
        if cfg.proxies:
            self._x_proxy = F.element_at(
                F.array(*[F.lit(p) for p in cfg.proxies]),
                (F.pmod(F.col("fetch_seq"), F.lit(len(cfg.proxies))) + 1).cast("int"),
            )
        else:
            self._x_proxy = F.lit(None).cast("string")
        self._x_aborted = F.col("__abort_kind2").isNotNull()
        self._x_status0 = F.coalesce("page_status", F.lit(0))

        # ---- parse phase ----
        self._sel_parsed = [
            "fetch_seq", "depth", "ctx", "__effective_url", "url_hash",
            F.explode("__m").alias("m"),
        ]
        self._sel_children = [
            F.col("m.value").alias("url_raw"),
            (F.col("depth") + 1).alias("depth"),
            F.lit(GET).alias("method"),
            F.lit(None).cast("binary").alias("body"),
            # Request.Visit passes hdr=nil (request.go:122-124): children
            # always fall back to collector defaults
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.col("ctx").alias("ctx"),
            F.col("__effective_url").alias("parent_url"),
            F.col("fetch_seq").alias("parent_seq"),
            F.col("m.sel_idx").alias("sel_idx"),
            F.col("m.elem_idx").alias("elem_idx"),
            F.col("m.elem_idx").alias("link_idx"),
            F.lit(None).cast("boolean").alias("skip_seen_check"),
            F.lit(0).alias("retries"),
        ]
        self._img_side = self.images.select(
            F.col("image_id").alias("__iid"), "bytes", "w", "h", "fmt",
            F.col("caption").alias("caption_ref"), "phash",
        )

        # fully-assembled post-page-join projection lists (the fused
        # replacements for the former per-round withColumn chains); the
        # legacy join-based cookie path (setter set > 10k) keeps the
        # original per-round construction — it is the rare configuration
        page_keep = [
            status_x.alias("page_status"), "page_content_type",
            body_x.alias("page_body"), "page_base_href", "serve_delay_ms",
        ]
        tail_cols = [
            self._x_fetch_ms.alias("fetch_ms"),
            F.lit(False).alias("__cache_hit"),
        ]
        if self._n_hdr_pages:
            tail_cols.insert(0, self._x_hdr_fail.alias("__hdr_fail"))
        after3: list[str] = list(self._after_rp) + [
            "page_status", "page_content_type", "page_body", "page_base_href",
            "serve_delay_ms",
        ]
        if self._cookie_fast:
            self._sel_fetch3a = [
                *self._after_rp, *self._page_names,
                self._x_src_ck.alias("__src_ck"),
                self._x_chain_hops.alias("__chain_hops"),
            ]
            self._sel_fetch3b = [
                *self._after_rp, *page_keep,
                "page_domain", "page_set_cookie", "page_require_cookie",
                *(["page_require_hdr"] if self._n_hdr_pages else []),
                "__src_ck", "__chain_hops",
                self._x_cookie_fail.alias("__cookie_fail"),
                *tail_cols,
            ]
            after3 += [
                "page_domain", "page_set_cookie", "page_require_cookie",
                *(["page_require_hdr"] if self._n_hdr_pages else []),
                "__src_ck", "__chain_hops", "__cookie_fail",
            ]
        elif not self._n_cookie_pages:
            self._sel_fetch3 = [
                *self._after_rp, *page_keep,
                *(["page_require_hdr"] if self._n_hdr_pages else []),
                *tail_cols,
            ]
            if self._n_hdr_pages:
                after3.append("page_require_hdr")
        if self._n_hdr_pages:
            after3.append("__hdr_fail")
        after3 += ["fetch_ms", "__cache_hit"]
        self._after3 = after3

        # extraction: runs INSIDE the one persisted fetch frame; bodies
        # stay out of the round cache unless the response cache needs the
        # write-back (they are the ~100 TB column at scale)
        parse_ok = (
            ~self._x_aborted
            & F.col("page_status").isNotNull()
            & ((self._x_status0 < 300) | F.lit(cfg.parse_http_error_response))
        )
        # X4 CheckHead (colly.go:537-544): a failing HEAD suppresses the GET
        # entirely; under ParseHTTPErrorResponse an error STATUS does not
        # fail the HEAD (colly.go:1320-1323)
        self._x_head_ok = (
            F.col("page_status").isNotNull()
            & ((self._x_status0 < 300) | F.lit(cfg.parse_http_error_response))
            & ~self._x_aborted
        )
        if cfg.check_head:
            parse_ok = parse_ok & self._x_head_ok
        self._x_m = self.extract_udf(
            F.when(parse_ok, F.col("page_body")),
            "page_content_type", "__effective_url", "page_base_href",
        )
        self._sel_fetch4 = [
            *(c for c in after3 if cfg.fetch_cache_enabled or c != "page_body"),
            self._x_m.alias("__m"),
        ]

        # ---- output projections (per-round F.lit(round) appended later) --
        self._sel_visits = [
            "fetch_seq", "enqueue_seq",
            F.col("canon_url").alias("url"), "url_hash", "domain", "depth",
            self._x_status0.alias("status"), "fetch_ms",
            self._x_proxy.alias("proxy"),
        ]
        self._x_fetch_err = (
            F.when(self._x_aborted, F.col("__abort_kind2"))
            .when(F.col("page_status").isNull(), "ErrFetch")
            .otherwise(F.concat(F.lit("HTTPError"), self._x_status0))
        )
        # U3 jar-update expressions (fast path): setter entries as per-row
        # array expressions — one explode inside the cached frame
        if self._cookie_fast:
            self._x_src_responded = (
                (F.size(hops_c) > 0) | F.col("abort_kind").isNotNull()
            )
            final_set_ok = (
                ~self._x_aborted
                & ~F.col("__cookie_fail")
                & F.col("page_set_cookie").isNotNull()
            )
            if self._n_hdr_pages:
                # a 403'd (header-gated) page does not set its cookie either
                final_set_ok = final_set_ok & ~F.col("__hdr_fail")
            _EMPTY = F.array().cast("array<struct<host:string,cookie:string>>")
            set_map = _lit_map(self._cookie_set_map)
            dom_map = _lit_map(self._cookie_dom_map)
            chain_setters = F.filter(
                F.transform(
                    "__chain_hops",
                    lambda h: F.struct(
                        F.element_at(dom_map, h).alias("host"),
                        F.element_at(set_map, h).alias("cookie"),
                    ),
                ),
                lambda s: s["cookie"].isNotNull(),
            )
            src_entry = F.when(
                self._x_src_responded & F.col("__src_ck").isNotNull(),
                F.array(F.struct(F.col("domain").alias("host"),
                                 F.col("__src_ck").alias("cookie"))),
            ).otherwise(_EMPTY)
            final_entry = F.when(
                final_set_ok,
                F.array(F.struct(F.col("page_domain").alias("host"),
                                 F.col("page_set_cookie").alias("cookie"))),
            ).otherwise(_EMPTY)
            self._x_cookie_entries = F.concat(chain_setters, src_entry, final_entry)

    # ------------------------------------------------------------------
    def run(self, seeds: list[dict] | DataFrame, max_rounds: int | None = None) -> dict:
        limit = max_rounds if max_rounds is not None else self.cfg.max_rounds
        start_round = self.store.completed_round + 1
        if start_round > 0 and self.cfg.seen_bloom_enabled:
            # filters are valid on resume iff the previous run maintained
            # them (bloom was armed); the geometry check below may also
            # rebuild them, which marks them ready either way
            self._bloom_ready = bool(self.store.counters.get("bloom_active", 0))
            self._check_bloom_geometry()
        if start_round == 0:
            seeds_df = self._seed_candidates(seeds)
            self.store.replace("candidates", seeds_df, -1)
            self.store.counters = {"built": 0, "fetched": 0}
        rnd = start_round
        first = True
        # per-round AQE policy (config.adaptive_min_round_rows): AQE's
        # per-exchange scheduling-barrier jobs dominate small rounds
        # (measured 2.1x whole-crawl wall on a 250k fixture, BENCH r4)
        # while its coalescing/skew value needs big ones — decide from the
        # round's frontier size, restore the session setting afterwards
        aqe_orig = self.spark.conf.get("spark.sql.adaptive.enabled", "true")
        try:
            while rnd < limit:
                new_cands = self.store.get("candidates")
                pending = self.store.get("pending")
                round_rows: int | None = None
                if first:
                    # one-time probe (fresh start / resume): the frontier
                    # row count, which doubles as the emptiness check;
                    # afterwards the previous round's own counts drive both
                    # — no extra actions per round
                    round_rows = _count(new_cands) + self.store.counters.get(
                        "pending", 0
                    )
                    if round_rows == 0 and _is_empty(pending):
                        break
                    first = False
                elif self.stats and self.stats[-1].children == 0 and self.stats[-1].deferred == 0:
                    break
                else:
                    s = self.stats[-1] if self.stats else None
                    if s is not None:
                        round_rows = s.children + s.deferred
                self._set_round_aqe(round_rows, aqe_orig)
                self._run_round(new_cands, pending, rnd)
                rnd += 1
        finally:
            self.spark.conf.set("spark.sql.adaptive.enabled", aqe_orig)
        self._flush_pins(final=True)
        return {
            "visits": self.store.get("visits"),
            "errors": self.store.get("errors"),
            "results": self.store.get("results"),
            "elements": self.store.get("elements"),
            "url_seen": self.store.get("url_seen"),
            "lineage": self.store.get("lineage"),
            "robots_cache": self.store.get("robots_cache"),
            "fetch_cache": self.store.get("fetch_cache"),
            "cookies": self.store.get("cookies"),
        }

    def _set_round_aqe(self, round_rows: int | None, session_default: str) -> None:
        """Set spark.sql.adaptive.enabled for the coming round.

        AQE materializes every exchange of every state query as its own
        job — a driver scheduling barrier plus py4j chatter (~35 jobs per
        round, tools/prof_jobs.py) whose cost is independent of data size.
        Its benefits (partition coalescing, skew-join splits, runtime
        broadcast) only matter once the round moves enough rows that
        partition-size decisions are real. Measured on the identical
        250k-page fixture back-to-back: 565.7 urls/s (AQE on) vs 1,183.8
        (off) — BENCH/BASELINE.md r4. Threshold 0 disables the policy;
        an unknown row count (no stats yet) keeps the session default,
        the scale-safe choice."""
        thr = self.cfg.adaptive_min_round_rows
        if not thr:
            return
        if round_rows is None:
            want = session_default
        else:
            want = "true" if round_rows >= thr else "false"
        if self.spark.conf.get("spark.sql.adaptive.enabled", "true") != want:
            self.spark.conf.set("spark.sql.adaptive.enabled", want)

    def _check_bloom_geometry(self) -> None:
        """Resume-time Bloom safety: the filters' (m, k, partitions) travel
        in the manifest. A changed m/k (or bloom newly enabled on an
        existing checkpoint) silently yields false negatives — missed dedup
        — so the filters are rebuilt from url_seen (idempotent). A changed
        partition count cannot be rebuilt (url_seen.domain_hash bakes in the
        old modulus) and fails fast."""
        c0 = self.store.counters
        p_old = c0.get("bloom_p")
        if p_old is not None and p_old != self.cfg.seen_bloom_partitions:
            raise ValueError(
                f"checkpoint was written with seen_bloom_partitions={p_old}, "
                f"config now says {self.cfg.seen_bloom_partitions}; url_seen's "
                "domain_hash keys use the old modulus — resume with the "
                "original partition count"
            )
        if (c0.get("bloom_m"), c0.get("bloom_k")) != (self.bloom_m, self.bloom_k):
            seen = self.store.get("url_seen").select("domain_hash", "url_hash")
            empty = self.spark.createDataFrame([], schema=bloomseen.SEEN_FILTERS)
            self.store.replace(
                "seen_filters",
                bloomseen.update_filters(empty, seen, self.bloom_m, self.bloom_k),
                self.store.completed_round,
            )
            self._bloom_ready = True

    def _seed_candidates(self, seeds) -> DataFrame:
        if isinstance(seeds, DataFrame):
            # SEEDS-schema DataFrame: stays distributed (10^10-frontier path —
            # a seed list must never funnel through the driver)
            return seeds.select(
                F.col("url").alias("url_raw"),
                F.lit(1).alias("depth"),
                F.coalesce("method", F.lit(GET)).alias("method"),
                F.col("body"),
                (
                    F.col("headers").cast("map<string,string>")
                    if "headers" in seeds.columns
                    else F.lit(None).cast("map<string,string>")
                ).alias("headers"),
                F.coalesce(
                    F.col("ctx").cast("map<string,string>"),
                    F.create_map().cast("map<string,string>"),
                ).alias("ctx"),
                F.lit(None).cast("string").alias("parent_url"),
                F.lit(-1).cast("long").alias("parent_seq"),
                F.lit(-1).alias("sel_idx"),
                F.col("seed_seq").cast("int").alias("elem_idx"),
                F.col("seed_seq").cast("int").alias("link_idx"),
                F.lit(None).cast("boolean").alias("skip_seen_check"),
                F.lit(0).alias("retries"),
            )
        rows = seeds
        data = [
            (
                s["url"], 1, s.get("method", GET), s.get("body"),
                s.get("headers"), s.get("ctx") or {},
                None, -1, -1, int(s.get("seed_seq", i)), int(s.get("seed_seq", i)),
                None, 0,
            )
            for i, s in enumerate(rows)
        ]
        return self.spark.createDataFrame(data, schema=CANDIDATES)

    # ------------------------------------------------------------------
    def _run_round(self, new_cands: DataFrame, pending: DataFrame, rnd: int) -> None:
        import time as _time

        _t0 = _time.time()
        cfg, spark = self.cfg, self.spark
        spark.sparkContext.setJobDescription(f"r{rnd}:submit")
        built = self.store.counters.get("built", 0)
        fetched = self.store.counters.get("fetched", 0)

        # ---------------- submission: F1..F5 as one plan ----------------
        # Split wide vs skinny: the requestCheck relational work (robots
        # join, seen anti-join/Bloom, first-wins window, global FIFO
        # sequencing) only needs ~10 small columns, so every shuffle / sort
        # / sample in this phase moves skinny rows; the wide payload
        # (url_raw, body, ctx, parent_url) sits in one cached frame and is
        # joined back exactly once. At the 10^10 design point this is the
        # difference between sorting ~50 B/row and sorting full requests.
        cwide = new_cands.select(
            "*", self.url_parts_udf("url_raw").alias("__p")
        ).select(*self._sel_cwide)
        # one materialization of the UDF chain: every downstream branch
        # (skinny flags, robots cache-fill, verdict join-back) reads this.
        # The count() is deliberate: AQE launches the submission plan's
        # independent stages concurrently, and letting 3-5 of them race to
        # materialize this cache serializes them on block locks (measured:
        # 26-37s each at 300k rows vs ~3s for the kernel). One cheap eager
        # pass fills the cache; every later scan is contention-free.
        cwide = cwide.persist()
        self._pins.append(cwide)
        cwide.count()

        sk = cwide.select(*self._sel_sk)
        depth_bad = self._x_depth_bad
        pre_ok = self._x_pre_ok

        # F6 robots: fill cache from hosts surviving the cheap filters
        if not cfg.ignore_robots_txt:
            new_cache = robots_op.fill_robots_cache(
                sk.where(self._x_pre_static).select("domain"),
                self.store.get("robots_cache"),
                self.robots_fixture,
                rnd,
            )
            self.store.stage_append("robots_cache", new_cache, rnd)
            cache = self.store.get("robots_cache")
            sk = sk.join(
                F.broadcast(cache.select("host", "robots_body", "fetch_failed")),
                sk.domain == F.col("host"),
                "left",
            ).select(*self._sel_sk_robots)

        # F5 seen: cross-round flag + intra-batch first-wins (window by hash).
        # url_seen appends are globally UNIQUE (first-mark invariant below),
        # so the probe is a plain flag join — no distinct, no fanout — and
        # the base side of the bucketed store joins without re-shuffling.
        seen_base, seen_tail = self.store.get_parts("url_seen")
        # adaptive Bloom arming: below seen_bloom_min_seen cumulative
        # requests the exact anti-join beats filter maintenance (measured
        # 2x crawl wall at a 1M-page fixture with a fresh-URL workload), so
        # the Bloom machinery stays fully dormant until the seen set is
        # large enough to pay for itself
        use_bloom = cfg.seen_bloom_enabled and built >= cfg.seen_bloom_min_seen
        if not use_bloom:
            # any dormant round grows url_seen without filter updates, so a
            # later activation (or a resume) must rebuild — without this
            # reset a stale _bloom_ready from an earlier activation/resume
            # would silently yield Bloom false negatives (missed dedup)
            self._bloom_ready = False
        if use_bloom and not self._bloom_ready:
            # activation round (or resume where bloom was previously
            # dormant): one-time full rebuild from url_seen — filters must
            # contain EVERY committed hash or dedup gets false negatives
            self.store.replace(
                "seen_filters",
                bloomseen.update_filters(
                    self.spark.createDataFrame([], schema=bloomseen.SEEN_FILTERS),
                    self.store.get("url_seen").select("domain_hash", "url_hash"),
                    self.bloom_m, self.bloom_k,
                ),
                rnd - 1,
            )
            self.store.compact(["seen_filters"])
            self._bloom_ready = True
        if use_bloom:
            # Bloom pre-filter (§4.3): only maybe-seen rows pay the exact
            # join; Bloom-negative rows are definitively new. False
            # positives just ride through the exact join — no semantic
            # change; false negatives are impossible because the filters
            # contain every hash marked in all committed rounds.
            if self._bloom_delivery == "cogroup":
                sk = bloomseen.cogroup_might_contain(
                    sk, self.store.get("seen_filters"), self.bloom_m, self.bloom_k
                )
            else:
                might, bc = bloomseen.make_might_contain_udf(
                    spark, self.store.get("seen_filters"), self.bloom_m, self.bloom_k
                )
                self._bloom_bcs.append((rnd, bc))
                sk = sk.withColumn("__maybe", might(F.col("url_hash"), F.col("__dh")))
            # the probed frame is read by BOTH the pos and neg branches —
            # uncached, each branch would recompute the probe and its whole
            # upstream (robots join + skinny projection)
            sk = sk.persist()
            self._pins.append(sk)
            pos = seen_probe(sk.where(F.col("__maybe")), seen_base, seen_tail)
            neg = sk.where(~F.col("__maybe")).withColumn("__seen_prev", F.lit(False))
            sk = pos.unionByName(neg).drop("__maybe")
        else:
            sk = seen_probe(sk, seen_base, seen_tail)
        checkable = self._x_checkable
        sk = sk.select("*", self._x_prior.alias("__prior_marked"))
        # global submission order -> dense enqueue_seq (colly Request.ID)
        sk = sk.select(
            "*",
            self._x_eligible.alias("__eligible"),
            (self._x_eligible & F.col("__abort")).alias("__abort_elig"),
        )
        sk, tot = with_ordered_counts(sk, ORDER_COLS, ["__eligible", "__abort_elig"],
                                      num_partitions=cfg.shuffle_partitions,
                                      return_totals=True, pins=self._pins)
        el_before = F.col("__eligible_before")
        # queue occupancy counts only rows that actually ENTER the queue:
        # OnRequest-aborted requests return before pending.append in colly's
        # scrape (and simulator.py submit), so they never occupy a slot —
        # raw el_before would wrongly ErrQueueFull later rows when aborts
        # and max_queue_size combine
        occ_before = el_before - F.col("__abort_elig_before")
        budget_full = (
            F.lit(cfg.max_requests > 0) & (F.lit(built) + el_before >= F.lit(cfg.max_requests or 0))
        )
        deferred_prev = self.store.counters.get("pending", 0)
        queue_full = (
            F.lit(cfg.max_queue_size > 0)
            & (F.lit(deferred_prev) + occ_before >= F.lit(cfg.max_queue_size or 0))
        )
        # "enqueued" = colly built the Request (ID assigned, budget spent,
        # seen already marked); an OnRequest abort (E2/E4) then stops it
        # BEFORE the fetch and before any politeness token is consumed.
        # Blocking with the RAW prefix counts is exact: both caps are
        # sticky within a batch (counts never decrease), so the first row
        # blocked under raw counts is the first blocked in reality and
        # everything after it is blocked either way.
        enqueued = F.col("__eligible") & ~budget_full & ~queue_full
        # ...but ATTRIBUTION is not: when the queue cap binds first, rows
        # blocked by it never spend budget, so the ErrMaxRequests check
        # must use the REAL built count min(el_before, R) where R = this
        # batch's enqueued total. R requires one extra tiny count job —
        # only when BOTH caps are configured (rare; single-cap configs are
        # exact in closed form).
        budget_attr = budget_full
        exact_enqueued: int | None = None
        if cfg.max_requests > 0 and cfg.max_queue_size > 0:
            exact_enqueued = sk.where(enqueued).count()
            budget_attr = F.lit(built) + F.least(
                el_before, F.lit(exact_enqueued)
            ) >= F.lit(cfg.max_requests)
        accepted = enqueued & ~F.col("__abort")
        # queue-full rows are NOT seen-marked: colly's ErrQueueFull fires in
        # AddRequest (queue/queue.go:234-236) before scrape's requestCheck
        # ever runs, so the URL never reaches the visited store — and for
        # the same reason ErrQueueFull outranks AlreadyVisited below.
        # FIRST-mark only: a hash is appended to url_seen iff it is not
        # already in the table (~__seen_prev) and no earlier row of this
        # batch marked it (__prior_marked == 0) — re-marks (retries with
        # skip_seen_check, allow_url_revisit revisits) are set-semantics
        # no-ops, so url_seen stays globally unique. That uniqueness is
        # what lets every seen probe be a plain flag join (no distinct, no
        # fanout) and keeps Bloom filter updates delta-only.
        marked = enqueued & ~F.col("__seen_prev") & (F.col("__prior_marked") == 0)
        # requestCheck attribution order (colly.go:774-818)
        error_kind = (
            F.when(F.col("__url_bad"), "ErrURLParse")
            .when(depth_bad, "ErrMaxDepth")
            .when(budget_attr, "ErrMaxRequests")
            .when(F.col("__static_kind").isNotNull(), F.col("__static_kind"))
            .when(F.col("__robots_kind").isNotNull(), F.col("__robots_kind"))
            .when(queue_full, "ErrQueueFull")
            .when(checkable & (F.col("__seen_prev") | (F.col("__prior_marked") > 0)),
                  "AlreadyVisited")
            .when(F.col("__abort"), "AbortedBeforeRequest")
            .otherwise(F.lit(None).cast("string"))
        )
        verdict = sk.select(
            *ORDER_COLS,
            F.when(enqueued, el_before + F.lit(built)).cast("long").alias("enqueue_seq"),
            error_kind.alias("error_kind"),
            accepted.alias("__accepted"),
            marked.alias("__marked"),
            "rule_idx", "domain",
        )
        # the only wide operation of the phase: join the skinny verdicts
        # back onto the cached payload by the unique submission key (AQE
        # broadcasts the verdict side while it fits; plain hash join beyond)
        c = cwide.join(
            verdict.drop("rule_idx", "domain"), on=ORDER_COLS, how="inner"
        ).persist()
        # all counts fall out of the sequencing collect — no extra jobs
        n_submitted = tot["__rows"]
        n_eligible = tot["__eligible"]
        k_budget = (cfg.max_requests - built) if cfg.max_requests else n_eligible
        k_queue = (cfg.max_queue_size - deferred_prev) if cfg.max_queue_size else n_eligible
        if exact_enqueued is not None:
            n_enqueued = exact_enqueued
        elif cfg.max_queue_size and cfg.abort_url_filters:
            # aborted rows don't occupy the queue, so the queue binds at an
            # eligible-rank the totals can't express in closed form — count
            # exactly (one extra job; only queue-cap + abort-filter configs)
            n_enqueued = sk.where(enqueued).count()
        else:
            n_enqueued = max(0, min(n_eligible, k_budget, k_queue))
        if not cfg.abort_url_filters:
            n_accepted = n_enqueued
        elif n_enqueued == n_eligible:
            n_accepted = n_enqueued - tot["__abort_elig"]
        else:  # budget truncation + aborts interact: count exactly (rare)
            n_accepted = verdict.where("__accepted").count()
        _t1 = _time.time()
        spark.sparkContext.setJobDescription(f"r{rnd}:dispatch")

        self.store.stage_append(
            "errors",
            c.where(F.col("error_kind").isNotNull()).select(
                F.lit(None).cast("long").alias("enqueue_seq"),
                F.coalesce("canon_url", "url_raw").alias("url"),
                "depth",
                "error_kind",
                F.lit(0).alias("status"),
                F.lit(rnd).alias("round"),
            ),
            rnd,
        )
        self.store.stage_append(
            "url_seen",
            c.where("__marked").select(
                "url_hash",
                F.col("__dh").alias("domain_hash"),
                F.lit(rnd).alias("round_added"),
            ),
            rnd,
        )

        # E5 per-stage lineage: the submit stage's per-partition rows fall
        # out of the sequencing collect (one row per range partition, zero
        # extra Spark jobs) — urls_in = submitted, urls_out = eligible
        self.store.stage_append(
            "lineage",
            spark.createDataFrame(
                [
                    (rnd, int(pid), "submit", int(v["__rows"]),
                     int(v["__eligible"]), 0)
                    for pid, v in tot.get("__per_pid", {}).items()
                ],
                schema=schemas.LINEAGE,
            ),
            rnd,
        )

        accepted_df = c.where("__accepted").select(
            "url_raw", "canon_url", "domain", "path_query", "url_hash", "depth",
            "method", "body", "headers", "ctx", "parent_url", "parent_seq", "sel_idx",
            "elem_idx", "link_idx",
            F.coalesce(F.col("skip_seen_check"), F.lit(False)).alias("skip_seen_check"),
            F.coalesce(F.col("retries"), F.lit(0)).alias("retries"),
            "rule_idx", "enqueue_seq", F.lit(rnd).alias("round"),
        )

        # ---------------- dispatch: S1 FIFO + S2 politeness ----------------
        # fast path: with no carried-over frontier and no (rule, domain)
        # group over its token budget, nothing defers — fetch_seq is then a
        # pure offset of enqueue_seq and the whole split + global
        # re-sequencing pass (a sort + sample + collect over the full
        # batch) is provably a no-op. One cheap agg over the SKINNY verdict
        # frame decides it (the wide payload join-back must never
        # materialize just to answer a yes/no scheduling question).
        # respect_crawl_delay (S2 extension, default off): per-domain token
        # ceilings from robots Crawl-delay, read from this round's robots
        # cache (host-sized, broadcast). Computed lazily here; joined inside
        # dispatch_seq_map's skinny projection.
        delay_caps = None
        if cfg.respect_crawl_delay and not cfg.ignore_robots_txt:
            delay_caps = self._robots_delay_caps()
        fast_fifo = deferred_prev == 0 and not cfg.abort_url_filters and (
            delay_caps is None
        ) and (
            not cfg.limit_rules
            or verdict.where("__accepted")
            .groupBy("rule_idx", "domain")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > self._x_tokens_map)
            .isEmpty()
        )
        if fast_fifo:
            dispatch = accepted_df.withColumn(
                "fetch_seq", F.col("enqueue_seq") - F.lit(built) + F.lit(fetched)
            ).persist()
            # pin at persist time: `dispatch` is reassigned below (header
            # -abort select, cache split) and unpersist() on a DERIVED
            # frame is a no-op — pinning the original is what releases the
            # cache entry at flush
            self._pins.append(dispatch)
            deferred = spark.createDataFrame([], schema=schemas.FRONTIER)
            n_dispatch = n_accepted
        else:
            # slow path, skinny: the politeness window + the global dense
            # fetch_seq rank both run over (enqueue_seq, domain, rule_idx)
            # projections — ~30 B/row — and the wide frontier is touched by
            # exactly one join on the unique enqueue_seq key. The sequencing
            # sort therefore scales with the frontier's *row count*, never
            # its payload width, and the sorted set is only the rows being
            # scheduled this round.
            frontier = pending.unionByName(accepted_df)
            seqmap, dtot = sched_op.dispatch_seq_map(
                frontier, cfg, fetched, num_partitions=cfg.shuffle_partitions,
                pins=self._pins, delay_caps=delay_caps,
            )
            joined = frontier.join(seqmap, on="enqueue_seq", how="left").persist()
            self._pins.append(joined)
            dispatch = joined.where(F.col("fetch_seq").isNotNull())
            deferred = joined.where(F.col("fetch_seq").isNull()).drop("fetch_seq")
            n_dispatch = dtot["__disp"]
        # E5 dispatch-stage lineage: slow path gets true per-partition rows
        # from the ranking collect; the fast path is a provable identity
        # mapping, recorded as one summary row
        disp_rows = (
            [(rnd, -1, "dispatch", int(n_accepted), int(n_accepted), 0)]
            if fast_fifo
            else [
                (rnd, int(pid), "dispatch", int(v["__rows"]), int(v["__disp"]), 0)
                for pid, v in dtot.get("__per_pid", {}).items()
            ]
        )
        self.store.stage_append(
            "lineage", spark.createDataFrame(disp_rows, schema=schemas.LINEAGE), rnd
        )
        _t2 = _time.time()
        spark.sparkContext.setJobDescription(f"r{rnd}:fetch")
        n_deferred = deferred_prev + n_accepted - n_dispatch
        if n_deferred or deferred_prev:
            self.store.replace("pending", deferred, rnd)
        # else: pending was empty and stays empty — rewriting an empty
        # snapshot would cost one durable-write job per round in disk mode

        # ---------------- fetch: X2 cache + X3 redirects + X1 content join -
        # X2 (http_backend.go:157-200): GET dispatch rows with a live cache
        # entry skip redirect resolution, hop seen-marking, the content join
        # and the politeness SERVICE TIME (colly's cache sits in
        # backend.Cache, BEFORE Do and its semaphore/sleep). Cached rows
        # rejoin the pipeline as already-fetched responses. Deliberate
        # divergence: cache hits still occupy this round's dispatch tokens
        # (the split happens after token accounting), so cached and uncached
        # runs dispatch in IDENTICAL order — the determinism contract
        # test_fetch_cache locks in. Colly would let a hit bypass the
        # LimitRule slot, letting uncached same-domain requests run earlier.
        # E2 request headers (colly.go:645-657 merge): the merged map is an
        # EXPRESSION (_merged_headers_col), never a materialized column —
        # the require-header compare sits behind a lazy AND on the page's
        # require column, so the map machinery evaluates only for the rare
        # rows that actually hit a header-gated page, and a crawl with no
        # abort filters pays zero per-row header cost. The abort flag is
        # computed before the cache split (cached rows keep the schema) but
        # takes effect only on MISS rows (colly's cache returns before Do
        # and its OnRequestHeaders hook).
        if cfg.abort_request_header_filters:
            dispatch = dispatch.select("*", self._x_hdr_abort.alias("__hdr_abort"))
        hit = None
        disp_cols = self._disp_cols
        if cfg.fetch_cache_enabled:
            wcache = Window.partitionBy("url_hash").orderBy(F.desc("fetched_round"))
            cache_tbl = self.store.get("fetch_cache")
            if cfg.cache_expiration_rounds:
                cache_tbl = cache_tbl.where(
                    F.col("fetched_round") > F.lit(rnd - 1 - cfg.cache_expiration_rounds)
                )
            cache_tbl = (
                cache_tbl.withColumn("__rn", F.row_number().over(wcache))
                .where(F.col("__rn") == 1)
                .select(
                    F.col("url_hash").alias("__ch"),
                    F.col("final_url").alias("__c_final"),
                    F.col("status").alias("__c_status"),
                    F.col("content_type").alias("__c_ct"),
                    F.col("body").alias("__c_body"),
                    F.col("base_href").alias("__c_bh"),
                )
            )
            dj = dispatch.join(cache_tbl, dispatch.url_hash == F.col("__ch"), "left")
            is_hit = (F.col("method") == GET) & F.col("__c_status").isNotNull()
            hit = dj.where(is_hit)
            dispatch = dj.where(~is_hit).drop(
                "__ch", "__c_final", "__c_status", "__c_ct", "__c_body", "__c_bh"
            )

        # X3: left-join the precomputed distributed redirect closure; rows
        # that are not redirect sources resolve to themselves. Broadcast
        # while the closure is small (it is edges-sized, not crawl-sized).
        rc = self.redirects
        if self._n_redirects < 1_000_000:
            rc = F.broadcast(rc)
        # one projection folds the identity defaults + the header-abort
        # overrides (header-aborted requests never reach Client.Do,
        # http_backend.go:215-222: no hops followed or seen-marked, no chain
        # cookies, no response — only the politeness slot + delay are spent)
        d = dispatch.join(rc, dispatch.canon_url == rc.src, "left").select(
            *self._sel_fetch1
        )
        # hop conflict probe reads the store INCLUDING this round's staged
        # candidate marks (get_parts sees the pending tail)
        seen_base_now, seen_tail_now = self.store.get_parts("url_seen")
        hops = (
            d.select(*self._sel_hops)
            .where(F.col("hop_url").isNotNull())
            .select(
                "*",
                self._x_hop_hash.alias("hop_hash"),
                self._x_hop_dh.alias("__hop_dh"),
            )
        )
        whop = (
            Window.partitionBy("hop_hash")
            .orderBy("fetch_seq", "hop_idx")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        hops = seen_probe(
            hops, seen_base_now, seen_tail_now,
            hash_col="hop_hash", dh_col="__hop_dh", out_col="__sp",
        )
        hops = hops.withColumn(
            # __first = not already in url_seen AND no earlier hop row of
            # this batch carries the hash — the first-ever occurrence,
            # which is both the seen-conflict signal (a chain aborts at a
            # NON-first hop) and the first-mark-only filter that keeps
            # url_seen globally unique
            "__first", ~F.col("__sp") & (F.count(F.lit(1)).over(whop) == 0)
        )
        mark_cols = [
            F.col("hop_hash").alias("url_hash"),
            F.col("__hop_dh").alias("domain_hash"),
            F.lit(rnd).alias("round_added"),
        ]
        if cfg.allow_url_revisit:
            # the hop-seen conflict is guarded by !AllowURLRevisit in colly
            # (colly.go:1486-1510) and the simulator (simulator.py): under
            # revisit, chains re-follow previously seen hops — no
            # truncation, no AlreadyVisited abort — while MARKING keeps
            # first-ever-wins set semantics. aborts stays an empty frame so
            # every downstream abort_idx read is null.
            aborts = (
                hops.where(F.lit(False))
                .groupBy("fetch_seq")
                .agg(F.min("hop_idx").alias("abort_idx"))
            )
            hops_marked = hops.where("__first").select(*mark_cols)
        else:
            aborts = (
                hops.where(~F.col("__first"))
                .groupBy("fetch_seq")
                .agg(F.min("hop_idx").alias("abort_idx"))
            )
            hops_marked = (
                hops.join(aborts, "fetch_seq", "left")
                .where(F.col("abort_idx").isNull() | (F.col("hop_idx") < F.col("abort_idx")))
                .select(*mark_cols)
            )
        self.store.stage_append("url_seen", hops_marked, rnd)
        if use_bloom:
            new_hashes = (
                c.where("__marked")
                .select(F.col("__dh").alias("domain_hash"), "url_hash")
                .unionByName(hops_marked.select("domain_hash", "url_hash"))
            )
            self.store.replace(
                "seen_filters",
                bloomseen.update_filters(
                    self.store.get("seen_filters"), new_hashes,
                    self.bloom_m, self.bloom_k,
                ),
                rnd,
            )
        # one projection folds __effective_url/__abort_kind2 (incl. the
        # header-abort sentinel overrides) onto the aborts join
        d = d.join(aborts, "fetch_seq", "left").select(*self._sel_fetch2)

        # S4: salt+repartition the NARROW dispatch batch (a real fetcher
        # would run right here as a mapInPandas: urls in, bodies out), stamp
        # the fetch-budget partition for lineage, THEN join the content —
        # page bodies are the ~100 TB side and must never ride an extra
        # shuffle just to get balanced fetch partitions
        target = max(64, n_dispatch // max(cfg.shuffle_partitions, 1) or 1)
        d = sched_op.salted_repartition(
            d, cfg.shuffle_partitions, target, stamp_partition_col="fetch_partition"
        )
        if self.fetcher is not None:
            # X1 real fetch: the fetcher appends the page columns by GETting
            # __effective_url over a socket (operators/httpfetch.py) — same
            # schema the synthetic join below produces, so everything
            # downstream (status rewrites, body cap, parse, cache
            # write-back) is byte-identical between the two modes
            d = self.fetcher(d)
        else:
            d = d.join(
                self._page_side, F.col("__effective_url") == F.col("__pu"), "left"
            )

        # U3 cookie availability for the final request = the committed jar
        # (previous rounds, host-keyed) + cookies set by this request's OWN
        # chain responders (src + hops before the final —
        # TestSetCookieRedirect's set-then-check flow). require_cookie /
        # require_header are evaluated on final pages only; a failing check
        # serves 403. All page_status rewrites, the body cap, the
        # fetch-time model and the cookie fast-path expressions are
        # prebuilt (_prebuild) and fold into at most two projections here.
        setters_chain = None
        if self._cookie_fast:
            d = d.select(*self._sel_fetch3a)
            jar = F.broadcast(
                self.store.get("cookies")
                .groupBy("host").agg(F.collect_set("cookie").alias("__jar"))
            )
            d = d.join(
                jar, F.col("page_domain") == F.col("host"), "left"
            ).select(*self._sel_fetch3b)
        elif not self._n_cookie_pages:
            d = d.select(*self._sel_fetch3)
        else:
            # legacy join path (cookie-page set too large to enumerate as
            # literal maps): the same semantics via broadcast joins + a
            # per-chain groupBy — kept as the original per-round op chain
            # (it is the rare configuration)
            d = d.drop("__pu")
            hops_c = F.coalesce("hops", F.array().cast("array<string>"))
            if self._n_hdr_pages:
                d = d.withColumn("__hdr_fail", self._x_hdr_fail)
                d = d.withColumn(
                    "page_status",
                    F.when(F.col("__hdr_fail"), F.lit(403)).otherwise(
                        F.col("page_status")
                    ),
                )
            cmap = F.broadcast(
                self.cookie_pages.where(F.col("set_cookie").isNotNull()).select(
                    F.col("url").alias("__cu"),
                    F.col("domain").alias("__cd"),
                    F.col("set_cookie").alias("__cck"),
                )
            )
            responded = (
                F.when(F.col("abort_idx").isNotNull(),
                       F.col("hop_idx") < F.col("abort_idx"))
                .when(F.col("abort_kind").isNotNull(), F.lit(True))
                .otherwise(F.col("hop_idx") < F.col("n_hops") - 1)
            )
            hop_ck = (
                hops.join(aborts, "fetch_seq", "left")
                .where(responded)
                .join(cmap, F.col("hop_url") == F.col("__cu"))
                .select("fetch_seq", "__cd", "__cck")
            )
            setters_chain = hop_ck.select(
                F.col("__cd").alias("host"), F.col("__cck").alias("cookie")
            )
            chain_agg = hop_ck.groupBy("fetch_seq").agg(
                F.collect_set("__cck").alias("__chain")
            )
            d = (
                d.join(cmap.drop("__cd"), F.col("canon_url") == F.col("__cu"), "left")
                .drop("__cu")
                .withColumnRenamed("__cck", "__src_ck")
                .join(chain_agg, "fetch_seq", "left")
            )
            jar = F.broadcast(
                self.store.get("cookies")
                .groupBy("host").agg(F.collect_set("cookie").alias("__jar"))
            )
            d = d.join(jar, d.page_domain == jar.host, "left").drop("host")
            req = F.col("page_require_cookie")
            has = (
                F.coalesce(F.array_contains("__jar", req), F.lit(False))
                | F.coalesce(F.array_contains("__chain", req), F.lit(False))
                | ((F.size(hops_c) > 0)
                   & F.coalesce(F.col("__src_ck") == req, F.lit(False)))
            )
            d = d.withColumn("__cookie_fail", req.isNotNull() & ~has)
            d = d.withColumn(
                "page_status",
                F.when(F.col("__cookie_fail"), F.lit(403)).otherwise(F.col("page_status")),
            ).drop("__jar", "__chain")
            if cfg.max_body_size > 0:
                d = d.withColumn(
                    "page_body",
                    F.expr(f"substring(page_body, 1, {int(cfg.max_body_size)})"),
                )
            d = d.withColumn("fetch_ms", self._x_fetch_ms)
            d = d.withColumn("__cache_hit", F.lit(False))
        if hit is not None:
            # cached responses rejoin as already-fetched rows: no redirect
            # hops, no service time (colly's cache path never reaches the
            # LimitRule semaphore), partition of wherever they sit
            cookie_extra = (
                [
                    F.lit(None).cast("string").alias("page_domain"),
                    F.lit(None).cast("string").alias("page_set_cookie"),
                    F.lit(None).cast("string").alias("page_require_cookie"),
                    F.lit(None).cast("string").alias("__src_ck"),
                    F.lit(False).alias("__cookie_fail"),
                ]
                if self._n_cookie_pages
                else []
            )
            if self._n_cookie_pages and self._cookie_set_map is not None:
                cookie_extra.append(
                    F.array().cast("array<string>").alias("__chain_hops")
                )
            if self._n_hdr_pages:
                cookie_extra += [
                    F.lit(None).cast("string").alias("page_require_hdr"),
                    F.lit(False).alias("__hdr_fail"),
                ]
            hit_shaped = hit.select(
                *disp_cols,
                *cookie_extra,
                F.col("__c_final").alias("final_url"),
                F.lit(None).cast("array<string>").alias("hops"),
                F.lit(False).alias("is_cycle"),
                F.lit(None).cast("string").alias("abort_kind"),
                F.lit(None).cast("int").alias("abort_idx"),
                F.col("__c_final").alias("__effective_url"),
                F.lit(None).cast("string").alias("__abort_kind2"),
                F.spark_partition_id().alias("fetch_partition"),
                F.col("__c_status").alias("page_status"),
                F.col("__c_ct").alias("page_content_type"),
                F.col("__c_body").alias("page_body"),
                F.col("__c_bh").alias("page_base_href"),
                F.lit(None).cast("int").alias("serve_delay_ms"),
                F.lit(0).cast("long").alias("fetch_ms"),
                F.lit(True).alias("__cache_hit"),
            )
            d = d.unionByName(hit_shaped)
        # E2 OnResponseHeaders abort (http_backend.go:228-232): a matching
        # Content-Type kills the response after the header read — before
        # parse and before the cache write-back. Cache hits never re-enter
        # Do, so header callbacks don't fire for them (backend.Cache returns
        # first, http_backend.go:157-165).
        if cfg.abort_response_header_filters:
            hdr = F.lit(False)
            for pat in cfg.abort_response_header_filters:
                hdr = hdr | F.coalesce(
                    F.col("page_content_type").rlike(pat), F.lit(False)
                )
            hdr = (
                hdr & ~F.col("__cache_hit") & F.col("__abort_kind2").isNull()
                & F.col("page_status").isNotNull()
            )
            d = d.withColumn(
                "__abort_kind2",
                F.when(hdr, F.lit("AbortedAfterHeaders")).otherwise(F.col("__abort_kind2")),
            )
        # run extraction INSIDE the one persisted fetch frame and drop the
        # body before caching: the parse UDF then provably runs exactly once
        # per page, and the round cache holds skinny match structs instead
        # of page bodies (the bodies are the ~100 TB column at scale);
        # the __m expression and the body-dropping projection are prebuilt
        aborted = self._x_aborted
        status = self._x_status0
        head_ok = self._x_head_ok
        if self._cookie_fast or not self._n_cookie_pages:
            d = d.select(*self._sel_fetch4).persist()
        else:
            d = d.withColumn("__m", self._x_m)
            d = (d if cfg.fetch_cache_enabled else d.drop("page_body")).persist()
        # pin at persist time: under check_head the withColumn chain below
        # reassigns `d`, and unpersist() on the derived frame would leave
        # the original (widest-in-the-engine) cache entry stranded
        self._pins.append(d)
        if cfg.check_head:
            # HEAD takes slot 2k, its GET 2k+1: downstream consumers
            # (children's parent_seq, results, elements, retry) read the
            # rewritten fetch_seq and stay internally consistent
            d = (
                d.withColumn("__fs0", F.col("fetch_seq"))
                .withColumn("__head_ok", head_ok)
                .withColumn("fetch_seq", F.lit(2) * F.col("__fs0") + F.lit(1))
            )

        def _visits_of(frame: DataFrame) -> DataFrame:
            return frame.select(*self._sel_visits, F.lit(rnd).alias("round"))

        if cfg.check_head:
            visits = _visits_of(
                d.withColumn("fetch_seq", F.lit(2) * F.col("__fs0"))
            ).unionByName(_visits_of(d.where("__head_ok")))
        else:
            visits = _visits_of(d)
        self.store.stage_append("visits", visits, rnd)
        self.store.stage_append(
            "lineage",
            d.groupBy(F.col("fetch_partition").alias("partition")).agg(
                F.count(F.lit(1)).alias("urls_in"),
                F.count(F.lit(1)).alias("urls_out"),
                F.sum("fetch_ms").alias("fetch_ms"),
            ).select(F.lit(rnd).alias("round"), "partition", F.lit("fetch").alias("stage"),
                     "urls_in", "urls_out", "fetch_ms"),
            rnd,
        )

        fetch_errors = d.where(
            aborted | F.col("page_status").isNull() | (status >= 300)
        ).select(
            "enqueue_seq",
            F.col("canon_url").alias("url"),
            "depth",
            self._x_fetch_err.alias("error_kind"),
            status.alias("status"),
            F.lit(rnd).alias("round"),
        )
        self.store.stage_append("errors", fetch_errors, rnd)
        if self._n_cookie_pages:
            # U3 jar update (MERGE-shaped): cookies set by responses this
            # round become visible to next round's requests. Final pages
            # register require-gated; src/chain responders always (their
            # responses were received mid-chain).
            src_responded = (
                (F.size(F.coalesce("hops", F.array().cast("array<string>"))) > 0)
                | F.col("abort_kind").isNotNull()
            )
            final_set_ok = (
                ~aborted & ~F.col("__cookie_fail") & F.col("page_set_cookie").isNotNull()
            )
            if self._n_hdr_pages:
                # a 403'd (header-gated) page does not set its cookie either
                final_set_ok = final_set_ok & ~F.col("__hdr_fail")
            if self._cookie_set_map is not None:
                # fast path: setter entries as per-row array expressions
                # (prebuilt) — one explode inside the cached frame, no
                # unions/joins
                new_ck = (
                    d.select(F.explode(self._x_cookie_entries).alias("s"))
                    .select("s.host", "s.cookie")
                    .distinct()
                    .join(self.store.get("cookies").select("host", "cookie"),
                          ["host", "cookie"], "left_anti")
                )
            else:
                setters_final = d.where(final_set_ok).select(
                    F.col("page_domain").alias("host"),
                    F.col("page_set_cookie").alias("cookie"),
                )
                setters_src = d.where(
                    src_responded & F.col("__src_ck").isNotNull()
                ).select(
                    F.col("domain").alias("host"), F.col("__src_ck").alias("cookie")
                )
                new_ck = (
                    setters_final.unionByName(setters_src).unionByName(setters_chain)
                    .distinct()
                    .join(self.store.get("cookies").select("host", "cookie"),
                          ["host", "cookie"], "left_anti")
                )
            self.store.stage_append(
                "cookies", new_ck.withColumn("round_added", F.lit(rnd)), rnd
            )
        if cfg.fetch_cache_enabled:
            # write-back: GET misses, final response after redirects, 5xx
            # never cached (http_backend.go:177-182)
            self.store.stage_append(
                "fetch_cache",
                d.where(
                    ~F.col("__cache_hit")
                    & (F.col("method") == GET)
                    & ~aborted
                    & F.col("page_status").isNotNull()
                    & (F.col("page_status") < 500)
                ).select(
                    "url_hash",
                    F.col("__effective_url").alias("final_url"),
                    F.col("page_status").alias("status"),
                    F.col("page_content_type").alias("content_type"),
                    F.col("page_body").alias("body"),
                    F.col("page_base_href").alias("base_href"),
                    "serve_delay_ms",
                    F.lit(rnd).alias("fetched_round"),
                ),
                rnd,
            )
        _t3 = _time.time()
        spark.sparkContext.setJobDescription(f"r{rnd}:parse")

        # ---------------- parse: P1-P11 ----------------
        # matches were already extracted into d's cached __m column (exactly
        # one parse per page); exploding the skinny structs is cheap enough
        # to do per consumer
        parsed = d.select(*self._sel_parsed)
        children = parsed.where(F.col("m.kind") == "link").select(
            *self._sel_children
        )
        if cfg.retry_on_status:
            # E4 Request.Retry (request.go:157-163): a failed fetch with a
            # matching status re-enters next round's frontier with
            # checkRevisit=false. sel_idx=-2 orders the retry before the
            # same parent's link children (OnError at colly.go:744 fires
            # before OnHTML at :759).
            retry_rows = d.where(
                ~aborted
                & (F.col("page_status").isNull() | (status >= 300))
                & status.isin(*[int(s) for s in cfg.retry_on_status])
                & (F.coalesce("retries", F.lit(0)) < F.lit(cfg.max_retries))
            ).select(
                F.col("canon_url").alias("url_raw"),
                # Retry keeps the request headers (request.go:157-163 only
                # deletes the Cookie header, modeled separately by the jar)
                "depth", "method", "body", "headers", "ctx", "parent_url",
                F.col("fetch_seq").alias("parent_seq"),
                F.lit(-2).alias("sel_idx"),
                F.lit(0).alias("elem_idx"),
                F.lit(0).alias("link_idx"),
                F.lit(True).alias("skip_seen_check"),
                (F.coalesce("retries", F.lit(0)) + 1).alias("retries"),
            )
            children = children.unionByName(retry_rows)
        self.store.replace("candidates", children, rnd)
        # checkpoint BEFORE counting: the count then reads the materialized
        # blocks instead of executing the parse plan once for the count and
        # a second time for the commit-time checkpoint (measured double-pass).
        # Lazy mark + count = ONE job: the count computes every partition,
        # which is exactly what materializes a lazy localCheckpoint.
        self.store.compact(["candidates"], eager=False)
        n_children = _count(self.store.get("candidates"))
        # E5 parse-stage lineage: pages in, extracted links out, per fetch
        # partition (an agg over the cached skinny match frame)
        self.store.stage_append(
            "lineage",
            d.groupBy(F.col("fetch_partition").alias("partition")).agg(
                F.count(F.lit(1)).alias("urls_in"),
                F.coalesce(
                    F.sum(F.size(F.filter("__m", lambda m: m["kind"] == "link"))),
                    F.lit(0),
                ).alias("urls_out"),
            ).select(
                F.lit(rnd).alias("round"), "partition",
                F.lit("parse").alias("stage"), "urls_in", "urls_out",
                F.lit(0).cast("long").alias("fetch_ms"),
            ),
            rnd,
        )

        if cfg.html_extractors:
            self.store.stage_append(
                "elements",
                parsed.where(F.col("m.kind") == "element").select(
                    "fetch_seq",
                    F.col("__effective_url").alias("url"),
                    F.col("m.extra").alias("selector"),
                    F.col("m.sel_idx").alias("sel_idx"),
                    F.col("m.elem_idx").alias("elem_idx"),
                    F.col("m.tag").alias("tag"),
                    F.col("m.text").alias("text"),
                    F.col("m.attrs").alias("attrs"),
                    F.col("m.fields").alias("fields"),
                    F.lit(rnd).alias("round"),
                ),
                rnd,
            )
        image_rows = parsed.where(F.col("m.kind") == "image").select(
            "fetch_seq", "depth", "__effective_url",
            F.col("m.value").alias("image_id"),
            F.col("m.extra").alias("caption_parsed"),
        )
        img = self._img_side
        # decode once per DISTINCT image_id (pages share logos/thumbnails —
        # per-reference decoding redoes identical pixel work hundreds of
        # times), then join the skinny verdicts back onto the refs. The
        # payload table is the ~100 TB side at scale — never broadcast it;
        # AQE broadcasts automatically when it IS small.
        verdicts = (
            image_rows.select("image_id").distinct()
            .join(img, F.col("image_id") == F.col("__iid"), "left")
            .withColumn(
                "__v",
                self.validate_udf("bytes", "image_id", "w", "h", "fmt", "phash"),
            )
            .select(
                "image_id",
                F.col("__v.img_ok").alias("__img_ok"),
                F.col("__v.psnr_db").alias("psnr_db"),
                "caption_ref",
            )
        )
        results = (
            image_rows.join(verdicts, "image_id", "left")
            .join(d.select("fetch_seq", F.coalesce("page_status", F.lit(0)).alias("status")),
                  "fetch_seq")
            .select(
                "fetch_seq", F.col("__effective_url").alias("url"), "depth", "status",
                "image_id", F.col("caption_parsed").alias("caption"),
                payload_op.payload_ok_col(
                    F.col("__img_ok"), F.col("caption_parsed"), F.col("caption_ref")
                ).alias("payload_ok"),
                F.coalesce("psnr_db", F.lit("0.0")).alias("psnr_db"),
                F.lit(rnd).alias("round"),
            )
        )
        self.store.stage_append("results", results, rnd)
        _t4 = _time.time()
        spark.sparkContext.setJobDescription(f"r{rnd}:commit")

        # ---------------- commit ----------------
        # iteratively-read state gets its Catalyst lineage truncated every
        # round — but only the tables this round actually changed (each
        # localCheckpoint is a full-table job; compacting a table nothing
        # wrote is pure fixed cost at small rounds); append-only output
        # tables only every few rounds (they are read at the end, not
        # inside the loop), with their upstream intermediates pinned in
        # cache until that flush
        to_compact = ["url_seen"]
        if self._n_cookie_pages:
            to_compact.append("cookies")
        if n_deferred or deferred_prev:
            to_compact.append("pending")
        if not cfg.ignore_robots_txt:
            to_compact.append("robots_cache")
        if use_bloom:
            to_compact.append("seen_filters")
        if cfg.fetch_cache_enabled:
            if cfg.fetch_cache_compact_every and (rnd + 1) % cfg.fetch_cache_compact_every == 0:
                # X2 maintenance (ADVICE): drop superseded + expired cache
                # entries — the table carries full page bodies and would
                # otherwise grow without bound; the reference deletes
                # expired cache files (http_backend.go:166-170)
                cache_tbl = self.store.get("fetch_cache")
                if cfg.cache_expiration_rounds:
                    cache_tbl = cache_tbl.where(
                        F.col("fetched_round") > F.lit(rnd - cfg.cache_expiration_rounds)
                    )
                wc = Window.partitionBy("url_hash").orderBy(F.desc("fetched_round"))
                self.store.compact_rewrite(
                    "fetch_cache",
                    cache_tbl.withColumn("__rn", F.row_number().over(wc))
                    .where(F.col("__rn") == 1).drop("__rn"),
                    rnd,
                )
            else:
                to_compact.append("fetch_cache")
        self.store.compact(to_compact)
        # dispatch (fast path) and d are pinned at their persist sites —
        # they get reassigned before reaching here; c never is
        self._pins.append(c)
        self.store.commit_round(
            rnd,
            {"built": built + n_enqueued, "fetched": fetched + n_dispatch,
             "pending": n_deferred,
             # Bloom geometry travels with the checkpoint: resuming under a
             # changed (m, k, partitions) would silently turn the filter's
             # FPP into false negatives — missed dedup (see run());
             # bloom_active records whether the filters were maintained, so
             # a resume knows whether a rebuild is pending at activation
             "bloom_m": self.bloom_m, "bloom_k": self.bloom_k,
             "bloom_p": cfg.seen_bloom_partitions,
             "bloom_active": int(use_bloom)},
        )
        # pin release AFTER the commit: disk mode durably writes the round's
        # staged deltas inside commit_round, and those write plans read the
        # pinned per-round caches — unpersisting first would force a full
        # recompute of the fetch/parse plan per output table
        if len(self._pins) >= 16:
            self._flush_pins()
        # previous rounds' filter broadcasts are no longer referenced by any
        # live plan (this round's state is checkpointed above); without the
        # destroy they accrue ~partitions x m/8 bytes per round
        while len(self._bloom_bcs) > 1 and self._bloom_bcs[0][0] < rnd:
            self._bloom_bcs.pop(0)[1].destroy()
        _t5 = _time.time()
        spark.sparkContext.setJobDescription(None)
        self.stats.append(
            RoundStats(
                rnd, n_submitted, n_accepted, n_dispatch, n_deferred, n_children,
                t_submit=round(_t1 - _t0, 2), t_dispatch=round(_t2 - _t1, 2),
                t_fetch=round(_t3 - _t2, 2), t_parse=round(_t4 - _t3, 2),
                t_commit=round(_t5 - _t4, 2),
            )
        )

    def _flush_pins(self, final: bool = False) -> None:
        """Checkpoint output tables, then release pinned per-round caches."""
        if not self._pins and not final:
            return
        self.store.compact(["visits", "errors", "results", "elements", "lineage"])
        for df in self._pins:
            df.unpersist()
        self._pins = []
        if final:
            # every table is checkpointed now, so no live plan references a
            # filter broadcast — destroy the last one too (the per-round
            # sweep in _run_round always keeps one alive)
            while self._bloom_bcs:
                self._bloom_bcs.pop(0)[1].destroy()


def seen_probe(
    df: DataFrame,
    base: DataFrame | None,
    tail: DataFrame | None,
    hash_col: str = "url_hash",
    dh_col: str = "__dh",
    out_col: str = "__seen_prev",
) -> DataFrame:
    """F5 cross-round membership flag against the bucketed url_seen store.

    ``base`` is the big hash-partitioned snapshot: the join keys (domain
    bucket, url_hash) match its preserved partitioning, so the plan
    re-shuffles only ``df`` — never the base (asserted by
    tests/test_statestore.py). ``tail`` is the recent-append delta, small
    enough that the optimizer broadcast-joins it. url_seen rows are unique
    (first-mark invariant in ``_run_round``), so these flag joins cannot
    fan out. Either part may be None (empty)."""
    cols = df.columns
    flags = []
    for part, flag in ((base, "__in_base"), (tail, "__in_tail")):
        if part is None:
            continue
        side = part.select(
            F.col("domain_hash").alias(dh_col),
            F.col("url_hash").alias(hash_col),
            F.lit(True).alias(flag),
        )
        df = df.join(side, on=[dh_col, hash_col], how="left")
        flags.append(flag)
    seen = F.lit(False)
    for flag in flags:
        seen = seen | F.coalesce(F.col(flag), F.lit(False))
    # single projection folds the flag coalesce AND the helper-column drop
    # (withColumn + drop would each re-analyze the join tree)
    return df.select(*cols, seen.alias(out_col))


def _merged_headers_col(cfg: CrawlConfig):
    """Effective request headers (colly.go:645-657) as one map column: the
    row's own ``headers`` map if present, else the collector defaults; the
    User-Agent is added on top unless the map already carries one."""
    pairs: list = []
    for k, v in cfg.default_headers:
        pairs += [F.lit(k), F.lit(v)]
    default = (
        F.create_map(*pairs) if pairs else F.create_map().cast("map<string,string>")
    )
    h = F.coalesce(F.col("headers"), default)
    return F.when(F.map_contains_key(h, "User-Agent"), h).otherwise(
        F.map_concat(h, F.create_map(F.lit("User-Agent"), F.lit(cfg.user_agent)))
    )


def _req_hdr_abort_match(cfg: CrawlConfig):
    """OnRequestHeaders abort predicate (E2, http_backend.go:215-217): any
    registered (header_name, value_regex) matching the merged headers."""
    merged = _merged_headers_col(cfg)
    out = F.lit(False)
    for name, pat in cfg.abort_request_header_filters:
        out = out | F.coalesce(
            F.element_at(merged, F.lit(name)).rlike(pat), F.lit(False)
        )
    return out


def _abort_match(cfg: CrawlConfig, canon_url):
    """OnRequest-abort predicate (E2): any abort regex matches the canonical
    URL. Plan-constant rlike fold — false when no filters are registered."""
    out = F.lit(False)
    for pat in cfg.abort_url_filters:
        out = out | canon_url.rlike(pat)
    return F.coalesce(out, F.lit(False))


def _lit_map(m: dict | None):
    """A dict as a literal MapType column (plan constant). ``element_at``
    on the null-literal empty form yields NULL, matching a missed lookup."""
    if not m:
        return F.lit(None).cast("map<string,string>")
    pairs: list = []
    for k, v in m.items():
        pairs += [F.lit(k), F.lit(v)]
    return F.create_map(*pairs)


def _count(df: DataFrame) -> int:
    return df.count()


def _is_empty(df: DataFrame) -> bool:
    return df.isEmpty()
