"""Explicit StructType schemas for every state table (no inference anywhere).

Each schema is the columnar restatement of a reference struct — see
SURVEY.md §1.1 for the field-by-field derivation:

- FRONTIER   <- colly Request (request.go:27-53) + serializableRequest
               (request.go:55-64) wire format
- URL_SEEN   <- storage.Storage visited map (storage/storage.go:30-51)
- ROBOTS     <- robotsMap cache (colly.go:125, 847-906)
- RESULTS    <- validated payload rows (BASELINE input_hint image+caption)
- ERRORS     <- colly sentinel errors (colly.go:220-253) + OnError dispatch
- LINEAGE    <- debug.Event stream (debug/debug.go:17-27) aggregated
               per (round, partition, stage)
- PAGES/IMAGES/SEEDS/LIMIT_RULES <- fixture tables (FIXTURES.md)
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _s(*fields: StructField) -> StructType:
    return StructType(list(fields))


# Candidate/frontier rows. enqueue_seq is colly's Request.ID equivalent
# (monotone submission order, colly.go:705); fetch_seq is queue dispatch
# order (queue/queue.go:160-205) — the visit-order equality target.
FRONTIER = _s(
    StructField("url_raw", StringType()),
    StructField("canon_url", StringType()),
    StructField("domain", StringType()),
    StructField("path_query", StringType()),
    StructField("url_hash", LongType()),
    StructField("depth", IntegerType()),
    StructField("method", StringType()),
    StructField("body", BinaryType()),
    # request headers as data (colly Request.Headers, request.go:30): NULL
    # means "collector defaults" (colly.go:645-657 merges defaults only
    # when the request carries none); link-extracted children are always
    # NULL (Request.Visit passes hdr=nil), seeds may carry custom maps
    StructField("headers", MapType(StringType(), StringType())),
    StructField("ctx", MapType(StringType(), StringType())),
    StructField("parent_url", StringType()),
    StructField("parent_seq", LongType()),
    StructField("sel_idx", IntegerType()),
    StructField("elem_idx", IntegerType()),
    StructField("link_idx", IntegerType()),
    StructField("skip_seen_check", BooleanType()),
    StructField("retries", IntegerType()),  # E4 Request.Retry count
    StructField("rule_idx", IntegerType()),
    StructField("enqueue_seq", LongType()),
    StructField("round", IntegerType()),
)

URL_SEEN = _s(
    StructField("url_hash", LongType()),
    StructField("domain_hash", IntegerType()),
    StructField("round_added", IntegerType()),
)

ROBOTS_CACHE = _s(
    StructField("host", StringType()),
    StructField("robots_body", StringType()),
    StructField("fetch_failed", BooleanType()),
    StructField("fetched_round", IntegerType()),
)

RESULTS = _s(
    StructField("fetch_seq", LongType()),
    StructField("url", StringType()),
    StructField("depth", IntegerType()),
    StructField("status", IntegerType()),
    StructField("image_id", StringType()),
    StructField("caption", StringType()),
    StructField("payload_ok", BooleanType()),
    StructField("psnr_db", StringType()),  # formatted; 'inf' for lossless
    StructField("round", IntegerType()),
)

ERRORS = _s(
    StructField("enqueue_seq", LongType()),
    StructField("url", StringType()),
    StructField("depth", IntegerType()),
    StructField("error_kind", StringType()),
    StructField("status", IntegerType()),
    StructField("round", IntegerType()),
)

# north rule: per-partition lineage rows (round, partition, urls_in/out, fetch_ms)
LINEAGE = _s(
    StructField("round", IntegerType()),
    StructField("partition", IntegerType()),
    StructField("stage", StringType()),
    StructField("urls_in", LongType()),
    StructField("urls_out", LongType()),
    StructField("fetch_ms", LongType()),
)

VISITS = _s(  # dispatch-order trace: the golden-equality surface
    StructField("fetch_seq", LongType()),
    StructField("enqueue_seq", LongType()),
    StructField("url", StringType()),
    StructField("url_hash", LongType()),
    StructField("domain", StringType()),
    StructField("depth", IntegerType()),
    StructField("status", IntegerType()),
    StructField("fetch_ms", LongType()),
    StructField("proxy", StringType()),  # X5 round-robin assignment
    StructField("round", IntegerType()),
)

# E2 general OnHTML/OnXML match rows: the HTMLElement surface
# (htmlelement.go:25-63: Name/Text/attrs + per-callback Index) plus the
# declarative Unmarshal fields map (unmarshal.go:51-223)
ELEMENTS = _s(
    StructField("fetch_seq", LongType()),
    StructField("url", StringType()),
    StructField("selector", StringType()),
    StructField("sel_idx", IntegerType()),
    StructField("elem_idx", IntegerType()),
    StructField("tag", StringType()),
    StructField("text", StringType()),
    StructField("attrs", MapType(StringType(), StringType())),
    StructField("fields", MapType(StringType(), StringType())),
    StructField("round", IntegerType()),
)

# X2 response cache (http_backend.go:157-200): GET-only, keyed by the
# request URL hash, 5xx never cached (:177-182), entries expire after
# cache_expiration_rounds (CacheExpiration :166-170). Stores the page-shaped
# response columns the fetch stage would otherwise re-resolve.
FETCH_CACHE = _s(
    StructField("url_hash", LongType()),
    StructField("final_url", StringType()),
    StructField("status", IntegerType()),
    StructField("content_type", StringType()),
    StructField("body", BinaryType()),
    StructField("base_href", StringType()),
    StructField("serve_delay_ms", IntegerType()),
    StructField("fetched_round", IntegerType()),
)

# ---------------- fixture tables (FIXTURES.md) ----------------

PAGES = _s(
    StructField("url", StringType()),
    StructField("domain", StringType()),
    StructField("status", IntegerType()),
    StructField("content_type", StringType()),
    StructField("body", BinaryType()),
    StructField("redirect_to", StringType()),
    StructField("links", ArrayType(StringType())),
    StructField("base_href", StringType()),
    StructField("image_refs", ArrayType(StringType())),
    StructField("gzip_body", BooleanType()),
    StructField("serve_delay_ms", IntegerType()),
    # U3 cookie scenarios (colly.go:1612-1650; colly_test.go /set_cookie):
    # a response may set a cookie; a page may demand one (else 403)
    StructField("set_cookie", StringType()),
    StructField("require_cookie", StringType()),
    # E2 request-header scenario: "Name=value" the request must carry
    # (merged per colly.go:645-657) or the page serves 403 — the synthetic
    # stand-in for auth-token / accept-language gated content
    StructField("require_header", StringType()),
)

# U3 cookie jar (storage/storage.go:100-128): host-keyed; committed per
# round, so a cookie becomes visible to requests from the NEXT round on
# (within a round, redirect chains carry their own hops' cookies live)
COOKIES = _s(
    StructField("host", StringType()),
    StructField("cookie", StringType()),
    StructField("round_added", IntegerType()),
)

IMAGES = _s(  # BASELINE.json input_hint, exact shape
    StructField("image_id", StringType()),
    StructField("bytes", BinaryType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("fmt", StringType()),
    StructField("caption", StringType()),
    StructField("phash", LongType()),
)

ROBOTS_FIXTURE = _s(
    StructField("host", StringType()),
    StructField("body", StringType()),
    StructField("fetch_fails", BooleanType()),
)

SEEDS = _s(
    StructField("seed_seq", LongType()),
    StructField("url", StringType()),
    StructField("method", StringType()),
    StructField("body", BinaryType()),
    StructField("headers", MapType(StringType(), StringType())),
    StructField("ctx", MapType(StringType(), StringType())),
)

LIMIT_RULES = _s(
    StructField("rule_idx", IntegerType()),
    StructField("domain_regexp", StringType()),
    StructField("domain_glob", StringType()),
    StructField("delay_ms", LongType()),
    StructField("random_delay_ms", LongType()),
    StructField("parallelism", IntegerType()),
)
