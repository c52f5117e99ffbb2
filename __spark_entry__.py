"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl end-to-end on a synthetic web
derived deterministically from the sf0.001 ``documents`` table.

``queries()`` exposes each SQL-expressible operator from SURVEY.md §2 (the
crawl pipeline's relational core: filters, anti-join dedup, FIFO windows,
politeness token windows, counters) plus the training-data pipeline ops
(exact dedup, text analysis, fingerprinting, ANN top-k), each with a DuckDB
oracle in ``oracle_sql()``. Crawl-semantics correctness beyond SQL (visit
order vs the golden simulator, robots, redirects, politeness) is covered by
``python -m pytest -x -q`` (tests/test_engine_parity.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

SF001 = "/root/testdata/sf0.001"

STOPWORDS_SQL = "['the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','for','on','as']"


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship: a real crawl over a synthetic web derived from sf0.001 documents
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    from colly_spark.config import CrawlConfig, LimitRule
    from colly_spark.engine import Crawler
    from colly_spark.fixtures import SiteSpec, build_site, make_seeds, site_to_spark

    n_docs = _read(spark, SF001, "documents").count()  # ties fixture size to sf0.001
    spec = SiteSpec(
        n_domains=3,
        pages_per_domain=max(10, min(60, n_docs // 40)),
        seed=42,
    )
    site = build_site(spec)
    tabs = site_to_spark(spark, site)
    cfg = CrawlConfig(
        max_depth=3,
        ignore_robots_txt=False,
        limit_rules=(LimitRule(domain_glob="*.test", delay_ms=50, parallelism=4),),
        shuffle_partitions=8,
    )
    crawler = Crawler(spark, cfg, tabs["pages"], tabs["images"], tabs["robots"])
    out = crawler.run(make_seeds([f"http://d0{d}.test/page/0" for d in range(3)]),
                      max_rounds=6)
    return out["visits"].orderBy("fetch_seq")


# The flagship fixture entry() resolves at sf0.001 (500 docs -> 12 pages per
# domain), pinned in colly_spark.fixtures as the SHARED constants both
# q_crawl_visits and its simulator-emitted golden (tools/make_golden.py)
# build from, so the two sides cannot silently desync.
from colly_spark.fixtures import (  # noqa: E402
    CRAWL_GOLDEN_CFG,
    CRAWL_GOLDEN_LIMITS,
    CRAWL_GOLDEN_MAX_ROUNDS,
    CRAWL_GOLDEN_SEEDS,
    CRAWL_GOLDEN_SPEC,
)

CRAWL_FIXTURE = CRAWL_GOLDEN_SPEC


def q_crawl_visits(spark: SparkSession, sf: str) -> DataFrame:
    """The flagship crawl itself as a driver-gate row: run the pinned
    fixture crawl through the distributed engine and return
    (fetch_seq, url, depth). Oracle: a GOLDEN PARQUET emitted by the serial
    golden simulator (colly_spark/simulator.py — engine-independent by
    construction), so the strongest correctness property — visit-order
    equality under robots + politeness + dedup — is checked by the driver
    gate, not only by pytest (tests/test_engine_parity.py)."""
    from colly_spark.config import CrawlConfig, LimitRule
    from colly_spark.engine import Crawler
    from colly_spark.fixtures import SiteSpec, build_site, make_seeds, site_to_spark

    site = build_site(SiteSpec(**CRAWL_GOLDEN_SPEC))
    tabs = site_to_spark(spark, site)
    cfg = CrawlConfig(
        limit_rules=tuple(LimitRule(**d) for d in CRAWL_GOLDEN_LIMITS),
        **CRAWL_GOLDEN_CFG,
    )
    crawler = Crawler(spark, cfg, tabs["pages"], tabs["images"], tabs["robots"])
    out = crawler.run(
        make_seeds(list(CRAWL_GOLDEN_SEEDS)), max_rounds=CRAWL_GOLDEN_MAX_ROUNDS
    )
    return out["visits"].select("fetch_seq", "url", "depth").orderBy("fetch_seq")


# ---------------------------------------------------------------------------
# oracle-checked queries (operator -> relational form over the test tables)
# ---------------------------------------------------------------------------

def q_counters(spark: SparkSession, sf: str) -> DataFrame:
    """Request/response counters (colly.go:134-135) == groupBy().count()."""
    return (
        _read(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .orderBy("event_type")
    )


def q_seen_antijoin(spark: SparkSession, sf: str) -> DataFrame:
    """F5 URL-seen dedup == left-anti join: frontier candidates (customers)
    not in the seen set (customers with a 1997+ order)."""
    c = _read(spark, sf, "customer")
    seen = (
        _read(spark, sf, "orders")
        .where(F.col("o_orderdate") >= F.lit("1997-01-01"))
        .select("o_custkey")
        .distinct()
    )
    return (
        c.join(seen, c.c_custkey == seen.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def q_first_wins_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """F5 intra-batch first-wins dedup (min submission order per key):
    first order per customer (colly serializes; first submit wins)."""
    o = _read(spark, sf, "orders")
    return o.groupBy("o_custkey").agg(
        F.min(F.struct("o_orderdate", "o_orderkey")).getField("o_orderkey").alias("first_order")
    )


def q_fifo_window(spark: SparkSession, sf: str) -> DataFrame:
    """S1 FIFO dispatch rank == row_number over (domain=user, order=ts)."""
    from pyspark.sql import Window

    e = _read(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    )


def q_token_budget(spark: SparkSession, sf: str) -> DataFrame:
    """S2 politeness token cap == per-group FIFO prefix of size k."""
    from pyspark.sql import Window

    o = _read(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("dispatched"))
    )


def q_url_filters(spark: SparkSession, sf: str) -> DataFrame:
    """F3a/b regex filters == rlike allow/deny over part names."""
    p = _read(spark, sf, "part")
    return (
        p.where(F.col("p_name").rlike("a") & ~F.col("p_name").rlike("^zz"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
    )


def q_domain_allowlist(spark: SparkSession, sf: str) -> DataFrame:
    """F3c exact-hostname membership == isin filter + agg."""
    n = _read(spark, sf, "nation")
    c = _read(spark, sf, "customer")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .where(F.col("n_name").isin("NATION_0", "NATION_3", "NATION_7"))
        .groupBy("n_name")
        .agg(F.count("*").alias("customers"), F.round(F.sum("c_acctbal"), 2).alias("balance"))
    )


def q_depth_gate(spark: SparkSession, sf: str) -> DataFrame:
    """F4a depth gate == bounded selection, deterministic FIFO prefix
    (orderBy + limit == colly MaxRequests on serial queue)."""
    o = _read(spark, sf, "orders")
    return o.orderBy("o_orderkey").limit(100).select("o_orderkey", "o_totalprice")


def q_lineage_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """E5 lineage aggregates == per-(stage,partition) counts/sums."""
    e = _read(spark, sf, "events")
    return (
        e.groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count("*").alias("urls_in"), F.round(F.sum("value"), 4).alias("work"))
        .orderBy("event_type", "day")
    )


def q_broadcast_dims(spark: SparkSession, sf: str) -> DataFrame:
    """Limit-rule matching == broadcast dim join (3-way star join)."""
    c = _read(spark, sf, "customer")
    n = _read(spark, sf, "nation")
    r = _read(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("customers"))
        .orderBy("r_name")
    )


def q_agg_pushdown(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1-style partial-agg pipeline (map-side combine shape)."""
    li = _read(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------- training-data pipeline ops ----------------

def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    from colly_spark.functions.dedup import exact_dedup

    return exact_dedup(_read(spark, sf, "documents")).orderBy("fp")


def q_text_stats(spark: SparkSession, sf: str) -> DataFrame:
    from colly_spark.functions.text import (bpe_token_count, fingerprint,
                                            token_count)

    d = _read(spark, sf, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_sql"),
        fingerprint(F.col("text")).alias("fp"),
    )


def q_quality_scoring(spark: SparkSession, sf: str) -> DataFrame:
    from colly_spark.functions.text import punct_ratio, stopword_ratio

    d = _read(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(stopword_ratio(F.col("text")), 6).alias("stopword_ratio"),
    )


def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID heuristic (stopword-hit ratio; reference analog: the
    text-pipeline ops the brief lists) rolled up per language. The ratio is
    an exact small-integer division in IEEE double in both engines, so the
    0.02 threshold compares identically."""
    from colly_spark.functions.text import lang_id

    d = _read(spark, sf, "documents")
    return (
        d.select(lang_id(F.col("text")).alias("lang"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang")
    )


def q_winnow_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling-hash document fingerprinting by winnowing (MOSS; the
    training-data-pipeline 'document fingerprinting (rolling hash)' op):
    k=8-char shingles under a base-1000003 mod-2^64 polynomial rolling
    hash, minimum per 4-hash window, distinct per doc — an Arrow-batched
    numpy kernel with zero shuffles (dedup happens inside the kernel).
    Oracle: DuckDB recomputes the modular rolling hash RELATIONALLY
    (list_transform/list_reduce lambdas over HUGEINT) — no golden file."""
    from colly_spark.functions.text import winnow_fingerprints

    docs = _read(spark, sf, "documents")
    return winnow_fingerprints(docs).orderBy("doc_id", "fp")


def q_corpus_report(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source corpus health rollup (docs/tokens/quality/lang-share/
    exact-dup count) in one stratum-key shuffle — the report a pipeline
    reads before setting mixture weights. Oracle recomposes every metric
    from the already-oracled T1/T2/T3/D1 formulas."""
    from colly_spark.functions.text import corpus_report

    d = _read(spark, sf, "documents")
    return corpus_report(d)


def q_bpe_pair_stats(spark: SparkSession, sf: str) -> DataFrame:
    """BPE tokenizer-training inner step: adjacent-character pair counts
    weighted by pre-token frequency — corpus aggregates to the vocab table
    first (one shuffle), pairs explode over the vocab only. Oracle
    recomputes the regex pre-tokens and both aggregations in DuckDB."""
    from colly_spark.functions.text import bpe_pair_stats

    d = _read(spark, sf, "documents")
    return bpe_pair_stats(d)


def q_winnow_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Passage-overlap pairs by shared winnow fingerprints — partial-copy
    detection whole-doc MinHash misses. Gate params are tighter than the
    operator defaults (fp-freq cap 64, >= 4 shared) because the synthetic
    corpus's ~50-word vocabulary makes 8-char passages ubiquitous
    (measured: defaults emit 1.6M pairs / 8.7 s at sf0.1 vs 20k / 2.3 s
    tightened — a real corpus is far sparser). Oracle reuses the
    relational winnow-fingerprint CTE and restates cap/join/threshold."""
    from colly_spark.functions.text import winnow_overlap_pairs

    docs = _read(spark, sf, "documents")
    return winnow_overlap_pairs(
        docs, max_fp_freq=64, min_shared=4
    ).orderBy("a", "b")


def q_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic md5-bucket train/valid/test split (leak-proof corpus
    partitioning; zero-shuffle narrow projection). Oracle recomputes the
    hex-prefix bucket with DuckDB's md5 — identical digests by spec."""
    from colly_spark.functions.text import hash_split

    d = _read(spark, sf, "documents")
    return hash_split(d).select("doc_id", "bucket", "split")


def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-2/T5 pretraining layout):
    per doc, its token interval in a deterministic per-shard stream and the
    first/last 2048-token training sequences it touches. One shuffle (the
    shard-key window); shard count scales with the cluster, order is
    content-free (md5) so the layout is stable under corpus growth. Oracle
    recomputes shard, order, and the running sum relationally in DuckDB."""
    from colly_spark.functions.text import pack_sequences

    d = _read(spark, sf, "documents")
    return pack_sequences(d, capacity=2048, num_shards=64)


def q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic per-language subsampling by salted md5 bucket — the
    leak-proof downsampling primitive (a doc's membership never changes as
    the corpus grows). Zero-shuffle narrow filter; the rate table is a
    folded CASE, so the filter reaches the scan. Oracle recomputes the
    salted bucket with DuckDB's md5."""
    from colly_spark.functions.text import stratified_sample

    d = _read(spark, sf, "documents")
    return stratified_sample(
        d, "lang", {"en": 5000, "de": 2500, "zh": 10000}, default_bp=1000
    ).select("doc_id", "lang", "sample_bucket")


def q_mixture_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Training-mixture construction: per-language rates derived by exact
    integer arithmetic from corpus counts and target proportions (scarcest
    stratum caps the total), then salted-hash threshold sampling. The
    corpus never shuffles — counts are stratum-sized and the rate table
    rides broadcast joins. Oracle reproduces the integer derivation and
    membership rule in DuckDB."""
    from colly_spark.functions.text import mixture_sample

    d = _read(spark, sf, "documents")
    return mixture_sample(
        d, "lang", {"en": 5000, "de": 2000, "es": 1500, "fr": 1000, "zh": 500}
    ).select("doc_id", "lang", "sample_bucket")


def q_chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding/RAG document splitter: word-token chunks of <= 64 tokens
    with 16 tokens of repeated context (stride 48). Zero-shuffle narrow
    explode (plan-asserted in pytest); oracle rebuilds starts/slices with
    DuckDB generate_series + list slicing."""
    from colly_spark.functions.text import chunk_documents

    d = _read(spark, sf, "documents")
    return chunk_documents(d, max_tokens=64, overlap=16)


def q_lm_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style LM quality signal: per-doc average log-probability of
    its word bigrams under the corpus's own MLE bigram model (self-trained,
    so no smoothing and fully deterministic). Two vocab-bounded count
    aggregations + one bigram-key scoring join; at 100 TB the model trains
    on a sample and broadcasts. Oracle rebuilds the model and the scores
    relationally in DuckDB."""
    from colly_spark.functions.text import lm_logprob

    d = _read(spark, sf, "documents")
    return lm_logprob(d)


def q_term_df(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary statistics (document frequency / term frequency /
    smoothed idf) — one token-key shuffle with partial aggregation; the
    corpus size rides a broadcast 1-row aggregate, never a collect."""
    from colly_spark.functions.text import term_doc_freq

    d = _read(spark, sf, "documents")
    return term_doc_freq(d)


# The documents fixture is single-line prose, so the line-shaped gates
# first reshape it DETERMINISTICALLY into 8-token lines (same expression
# relationally in the oracle); with a ~50-word vocabulary the reshaped
# corpus repeats lines across docs, so the dedup path is genuinely hit.
_LINE_WRAP_TOKENS = 8


def _wrap_lines(text):  # Spark Column -> Column
    w = F.split(F.trim(text), r"\s+")
    n_chunks = (F.ceil(F.size(w) / F.lit(float(_LINE_WRAP_TOKENS))) - 1).cast("int")
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_chunks),
            lambda i: F.array_join(
                F.slice(w, i * _LINE_WRAP_TOKENS + 1, _LINE_WRAP_TOKENS), " "
            ),
        ),
        "\n",
    )


def q_line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Line-level boilerplate removal (CCNet/RefinedWeb pre-dedup): lines
    repeated across >= 2 distinct docs are dropped everywhere, survivors
    reassembled in order. Oracle reproduces the whole pipeline
    relationally (lateral unnest + HAVING + ordered string_agg)."""
    from colly_spark.functions.text import line_dedup

    d = _read(spark, sf, "documents")
    reshaped = d.select("doc_id", _wrap_lines(F.col("text")).alias("text"))
    return line_dedup(reshaped, min_doc_freq=2)


def q_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrubbing (emails/phones/IPv4 -> typed placeholders + audit
    counts). The fixture corpus carries no PII, so the gate injects a
    deterministic email/phone/IP per doc_id in BOTH engines, making the
    oracle exercise every pattern on every row."""
    from colly_spark.functions.text import redact_pii

    d = _read(spark, sf, "documents")
    seeded = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-4567 at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1"),
        ).alias("text"),
    )
    return redact_pii(seeded)


def q_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-batch incremental exact dedup on the crawl's StateStore LSM
    machinery (functions/incremental.py): batch 1 = even doc_ids, batch 2
    = the whole corpus; each batch admits first-seen-ever fingerprints
    only, committed as atomic resumable rounds. Oracle recomputes both
    rounds relationally (batch 2 admits only fingerprints absent from
    batch 1's admissions)."""
    from colly_spark.functions.incremental import IncrementalDeduper

    d = _read(spark, sf, "documents")
    dd = IncrementalDeduper(spark, partitions=8, merge_every=1)
    b1 = dd.dedupe_batch(d.filter(F.col("doc_id") % 2 == 0))
    b2 = dd.dedupe_batch(d)
    return b1.select(F.lit(1).alias("batch"), "doc_id").unionByName(
        b2.select(F.lit(2).alias("batch"), "doc_id")
    )


def q_incremental_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-batch incremental NEAR-dup dedup (functions/incremental.py
    IncrementalNearDeduper): MinHash band keys, signatures, and bucket
    occupancy persist on the crawl's StateStore LSM so each batch probes
    O(batch) state — batch 1 = even doc_ids, batch 2 = the whole corpus
    (its even ids are exact re-crawls, its odd near-dups match admitted
    docs). Oracle: GOLDEN PARQUET — tools/make_golden.py replays the
    admission semantics in independent pure Python (own xxhash64 +
    minhash implementation, no dedup-code import)."""
    from colly_spark.functions.incremental import IncrementalNearDeduper

    d = _read(spark, sf, "documents")
    dd = IncrementalNearDeduper(spark, partitions=8, merge_every=1)
    b1 = dd.dedupe_batch(d.filter(F.col("doc_id") % 2 == 0))
    b2 = dd.dedupe_batch(d)
    return b1.select(F.lit(1).alias("batch"), "doc_id").unionByName(
        b2.select(F.lit(2).alias("batch"), "doc_id")
    )


def q_repetition_signals(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style within-document repetition/shape signals (duplicate
    3-gram fraction, mean word length, symbol ratio) — zero-shuffle JVM
    array arithmetic; oracle recomputes the same list pipeline with DuckDB
    lambdas."""
    from colly_spark.functions.text import repetition_signals

    d = _read(spark, sf, "documents")
    return repetition_signals(d)


def q_pipeline_clean(spark: SparkSession, sf: str) -> DataFrame:
    """The canonical training-data cleaning pipeline as ONE declarative
    plan — quality filter -> language filter -> exact first-wins dedup ->
    deterministic hash split -> per-split corpus stats — composing four
    SURVEY 2.1 operators so Catalyst fuses the filters into the scan and
    the whole chain costs two shuffles (dedup groupBy + final rollup).
    Oracle reproduces every stage relationally."""
    from colly_spark.functions.text import (fingerprint, hash_split, lang_id,
                                            quality_score, token_count)

    d = _read(spark, sf, "documents")
    scored = (
        d.withColumn("fp", fingerprint(F.col("text")))
        .withColumn("n_tok", token_count(F.col("text")))
        .filter(
            (quality_score(F.col("text")) >= 0.9)
            & (lang_id(F.col("text")) == "en")
        )
    )
    keep = scored.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    surv = scored.join(keep, ["fp", "doc_id"])
    return (
        hash_split(surv)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


# Deterministic 60-bit perceptual-hash stand-in for the phash near-dup
# gate: docs pair up as (2k, 2k+1); the odd member's hash differs from the
# even's md5-derived base by exactly k%6 flipped bits (bit positions
# (k + 7j) % 60, distinct for j < 6), so pairs span hamming 0..5 — below,
# at, and above the max_hamming=3 verify threshold — and the 16-bit bands
# get genuine cross-group birthday collisions that verify must reject.
# 15 hex chars (60 bits) keeps the value positive in a signed int64 so
# Spark's cast and DuckDB's '>>' behave identically.
_PHASH_BASE_SPARK = (
    "cast(conv(substring(md5(cast(div(doc_id, 2) as string)), 1, 15), 16, 10)"
    " as bigint)"
)
_PHASH_MASK_SPARK = " + ".join(
    f"if(doc_id % 2 = 1 and {j} < div(doc_id, 2) % 6,"
    f" shiftleft(cast(1 as bigint), cast((div(doc_id, 2) + {7 * j}) % 60 as int)),"
    f" cast(0 as bigint))"
    for j in range(6)
)
_PHASH_SPARK = f"({_PHASH_BASE_SPARK}) ^ ({_PHASH_MASK_SPARK})"

_PHASH_BASE_DUCK = (
    "CAST(('0x' || substr(md5(CAST((doc_id // 2) AS VARCHAR)), 1, 15))"
    " AS BIGINT)"
)
_PHASH_MASK_DUCK = " + ".join(
    f"CASE WHEN doc_id % 2 = 1 AND {j} < (doc_id // 2) % 6"
    f" THEN ((1::BIGINT) << CAST(((doc_id // 2) + {7 * j}) % 60 AS INT))"
    f" ELSE 0::BIGINT END"
    for j in range(6)
)
_PHASH_DUCK = f"xor({_PHASH_BASE_DUCK}, ({_PHASH_MASK_DUCK}))"


def q_phash_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Image near-dup pairs by perceptual hash (the BASELINE input_hint's
    ``phash:int64`` column): the generic 64-bit banding operator
    (functions/dedup.py hash64_neardup_pairs) over a deterministic
    synthetic phash whose planted pairs span hamming 0..5. Oracle
    recomputes the hash AND the band/bucket-cap/bit_count pipeline
    relationally — no golden file. Scale claim under test: the image
    ``bytes`` column is never read (columnar pruning), and candidates are
    band-bucketed, never all-pairs."""
    from colly_spark.functions.dedup import phash_neardup_pairs

    d = _read(spark, sf, "documents")
    imgs = d.select(
        F.col("doc_id").alias("image_id"), F.expr(_PHASH_SPARK).alias("phash")
    )
    return phash_neardup_pairs(imgs)


def q_image_curation(spark: SparkSession, sf: str) -> DataFrame:
    """The image+caption curation pipeline (the graft cell's payload) as
    ONE declarative plan over the Iceberg-shaped table (image_id, caption,
    phash): caption language + length gates -> exact caption dedup
    (first-wins on the normalized-caption fingerprint) -> visual near-dup
    drop (phash banding pairs; the higher id of each pair loses) ->
    deterministic split assignment. Emits per-image (image_id, split,
    n_tok) so membership — not just counts — is oracle-checked. The
    ``bytes`` column is never read; filters fold into the scan; the only
    shuffles are the two dedup keys (caption fingerprint, phash band).
    Reference scope: colly's OnResponse image handling feeds exactly this
    kind of downstream curation (README.md:21); the pipeline composition
    itself is the training-data family the brief adds."""
    from colly_spark.functions.dedup import phash_neardup_pairs
    from colly_spark.functions.text import (fingerprint, hash_split, lang_id,
                                            token_count)

    d = _read(spark, sf, "documents")
    imgs = d.select(
        F.col("doc_id").alias("image_id"),
        F.col("text").alias("caption"),
        F.expr(_PHASH_SPARK).alias("phash"),
    )
    gated = imgs.filter(
        (lang_id(F.col("caption")) == "en")
        & (token_count(F.col("caption")) >= 30)
    ).withColumn("cfp", fingerprint(F.col("caption")))
    keep = gated.groupBy("cfp").agg(F.min("image_id").alias("image_id"))
    surv = gated.join(keep, ["cfp", "image_id"]).drop("cfp")
    losers = (
        phash_neardup_pairs(surv)
        .select(F.col("b").alias("image_id"))
        .distinct()
    )
    final = surv.join(losers, "image_id", "left_anti")
    return hash_split(final, id_col="image_id").select(
        "image_id", "split", token_count(F.col("caption")).alias("n_tok")
    )


def q_warc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """WARC interchange as a driver-gate row: every document serializes to
    a canonical WARC/1.0 response record (sources/warc.warc_record_bytes,
    per-record gzip members) and parses back through the reader kernel —
    all inside executors, Arrow-batched. The oracle states round-trip
    identity relationally: URI, status, content type, and payload byte
    length must equal what the documents table implies."""
    import pandas as pd

    from colly_spark.sources.warc import iter_warc_records, warc_record_bytes

    d = _read(spark, sf, "documents")
    rows = d.select(
        F.concat(F.lit("http://corpus.test/doc/"), F.col("doc_id")).alias("url"),
        F.col("doc_id"),
        F.lit(200).alias("status"),
        F.lit("text/plain").alias("content_type"),
        F.encode(F.col("text"), "UTF-8").alias("body"),
    )
    recs = warc_record_bytes(rows, compress=True).select("doc_id", "warc_record")

    def reparse(batches):
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["warc_record"]):
                (rec,) = iter_warc_records(bytes(blob))
                out.append(
                    {
                        "doc_id": doc_id,
                        "target_uri": rec["target_uri"],
                        "http_status": rec["http_status"],
                        "content_type": rec["content_type"],
                        "payload_bytes": len(rec["payload"]),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "target_uri", "http_status", "content_type",
                    "payload_bytes",
                ],
            )

    return recs.mapInPandas(
        reparse,
        "doc_id long, target_uri string, http_status int, "
        "content_type string, payload_bytes long",
    )


def q_sitemap_entries(spark: SparkSession, sf: str) -> DataFrame:
    """Sitemap protocol surface as a gate row: per source, a urlset XML
    document is BUILT relationally from its documents (10 docs per
    sitemap, loc + lastmod), then parsed back by sources/sitemap.py in
    Arrow batches. The oracle states parse identity — every (sitemap_url,
    loc, lastmod) must match what the documents table implies."""
    from colly_spark.sources.sitemap import sitemap_entries

    d = _read(spark, sf, "documents")
    entry_xml = F.concat(
        F.lit("<url><loc>http://corpus.test/doc/"), F.col("doc_id"),
        F.lit("</loc><lastmod>2026-01-"),
        F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        F.lit("</lastmod></url>"),
    )
    sitemaps = (
        d.withColumn("__sm", F.floor(F.col("doc_id") / 10))
        .groupBy("__sm")
        .agg(F.concat_ws("", F.sort_array(F.collect_list(
            F.struct(F.col("doc_id"), entry_xml.alias("x"))
        )).getField("x")).alias("__inner"))
        .select(
            F.concat(F.lit("http://corpus.test/sitemap-"), F.col("__sm"),
                     F.lit(".xml")).alias("url"),
            F.encode(
                F.concat(
                    F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/'
                          'sitemap/0.9">'),
                    F.col("__inner"),
                    F.lit("</urlset>"),
                ),
                "UTF-8",
            ).alias("body"),
        )
    )
    return sitemap_entries(sitemaps).select(
        "sitemap_url", "is_index", "loc", "lastmod"
    )


_PR_ITER, _PR_DAMP = 6, 0.85
_PR_FANOUT = 3


def q_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Link-authority ranking for frontier prioritization: PageRank
    (functions/graph.py — per iteration one edges join + one dst-key agg,
    dangling mass redistributed) over a deterministic synthetic link graph
    (each doc links to 3 md5-derived targets mod N). Oracle: the SAME
    power iteration unrolled as 6 chained CTEs in DuckDB — a fully
    relational check of every iteration's join/agg, not a golden file."""
    from colly_spark.functions.graph import pagerank

    d = _read(spark, sf, "documents")
    n_row = d.agg(F.count(F.lit(1)).alias("__n"))
    hs = [
        f"cast(conv(substring(md5(cast(doc_id * {_PR_FANOUT} + {j} as string)),"
        f" 1, 8), 16, 10) as bigint)"
        for j in range(_PR_FANOUT)
    ]
    edges = (
        d.crossJoin(F.broadcast(n_row))
        .select(
            F.col("doc_id").alias("src"),
            F.explode(F.array(*[F.expr(h) for h in hs])).alias("__h"),
            "__n",
        )
        .select("src", (F.col("__h") % F.col("__n")).alias("dst"))
    )
    pr = pagerank(edges, iterations=_PR_ITER, damping=_PR_DAMP)
    return pr.select(
        F.col("node").alias("doc_id"), F.round("rank", 6).alias("rank")
    )


def _pagerank_oracle_sql() -> str:
    """Unrolled power-iteration CTE chain mirroring q_pagerank."""
    hs = ", ".join(
        f"CAST(('0x' || substr(md5(CAST(doc_id * {_PR_FANOUT} + {j} AS VARCHAR)),"
        f" 1, 8)) AS UBIGINT)"
        for j in range(_PR_FANOUT)
    )
    iters = []
    for i in range(1, _PR_ITER + 1):
        prev = f"r{i-1}"
        iters.append(f"""r{i} AS (
  SELECT nodes.node,
         (1 - {_PR_DAMP}) / nn.n
         + {_PR_DAMP} * (COALESCE(c.inn, 0) + dmi.dm / nn.n) AS rank
  FROM nodes CROSS JOIN nn
  LEFT JOIN (SELECT e.dst AS node, SUM(r.rank / deg.deg) AS inn
             FROM edges e JOIN {prev} r ON r.node = e.src
             JOIN deg ON deg.src = e.src
             GROUP BY e.dst) c USING (node)
  CROSS JOIN (SELECT COALESCE(SUM(rank), 0) AS dm FROM {prev}
              WHERE node NOT IN (SELECT src FROM deg)) dmi
)""")
    return f"""
        WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        edges AS (
          SELECT src, CAST(h % n AS BIGINT) AS dst
          FROM (SELECT doc_id AS src, unnest([{hs}]) AS h
                FROM documents), nn
        ),
        deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        nodes AS (SELECT DISTINCT src AS node FROM edges
                  UNION SELECT DISTINCT dst FROM edges),
        r0 AS (SELECT node, 1.0 / n AS rank FROM nodes, nn),
        {", ".join(iters)}
        SELECT node AS doc_id, ROUND(rank, 6) AS rank FROM r{_PR_ITER}
    """


def q_ann_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    from colly_spark.functions.similarity import brute_force_topk

    emb = _read(spark, sf, "embeddings")
    return brute_force_topk(emb, query_ids=[0, 1, 2, 3, 4], k=5).orderBy(
        "query_id", "rank"
    )


def q_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF/LSH-bucketed ANN (sign-bit coarse quantizer + 2-bit multi-probe).
    Fully deterministic, so the oracle recomputes the same bucket fold,
    probe expansion, and rank relationally in DuckDB — the scale path is
    checked value-for-value, not just the brute-force baseline."""
    from colly_spark.functions.similarity import ivf_topk

    emb = _read(spark, sf, "embeddings")
    return ivf_topk(emb, query_ids=[0, 1, 2, 3, 4], k=5).orderBy(
        "query_id", "rank"
    )


def q_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (sign-bit LSH bucket + 1-bit
    multi-probe + exact-cosine verify). Threshold 0.37 sits in a wide gap of
    the sf0.01 candidate cosine distribution (nearest values 0.3526 /
    0.4032) so float rounding cannot flip membership; output is the integer
    pair set only."""
    from colly_spark.functions.dedup import embedding_neardup_pairs

    emb = _read(spark, sf, "embeddings")
    return (
        embedding_neardup_pairs(emb, threshold=0.37)
        .select("a", "b")
        .orderBy("a", "b")
    )


def q_minhash_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash-LSH near-dup pairs. Oracle: golden parquet computed by an
    independent pure-Python implementation (tools/make_golden.py, hashing
    via colly_spark.xxh — validated against Spark in tests/test_xxh.py)."""
    from colly_spark.functions.dedup import minhash_lsh_pairs

    d = _read(spark, sf, "documents")
    return minhash_lsh_pairs(d, jaccard_threshold=0.8).orderBy("a", "b")


def q_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact 3-word-shingle Jaccard near-dup pairs (shared-shingle
    candidates, document-frequency cap 64, threshold 0.6) — the exact
    complement to q_minhash_neardup's estimated path. Oracle: DuckDB
    recomputes the identical shingling/cap/join relationally."""
    from colly_spark.functions.dedup import ngram_jaccard_pairs

    d = _read(spark, sf, "documents")
    return ngram_jaccard_pairs(d).orderBy("a", "b")


def q_neardup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Transitive near-dup cluster assignment over every document: exact
    n-gram Jaccard pairs (the fully relational generator) -> alternating
    large-star/small-star connected components (dedup.neardup_clusters) ->
    (doc_id, cluster_id = component-min doc_id, cluster_size); docs in no
    pair are singletons. This is the step after any pair generator that a
    "keep one per cluster" dedup policy needs, and it collapses a~b~c
    chains the generator never compared end-to-end. Oracle: DuckDB
    recomputes the identical pairs relationally and resolves components
    with a recursive min-label-reachability CTE."""
    from colly_spark.functions.dedup import neardup_clusters, ngram_jaccard_pairs

    d = _read(spark, sf, "documents")
    cl = neardup_clusters(ngram_jaccard_pairs(d), docs=d)
    sizes = cl.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cl.join(sizes, "cluster_id")
        .select("doc_id", "cluster_id", "cluster_size")
        .orderBy("doc_id")
    )


def q_ngram_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination sweep: every 50th document plays the
    benchmark/probe corpus; the remaining documents are the training
    corpus, and any of them sharing >=1 3-word shingle with a probe is
    flagged with its distinct-contaminated-shingle count
    (dedup.ngram_contamination — probe shingles broadcast, zero extra
    shuffle on the corpus side). Oracle: DuckDB recomputes the identical
    shingle sets relationally and counts the semi-join hits."""
    from colly_spark.functions.dedup import ngram_contamination

    d = _read(spark, sf, "documents")
    probes = d.where(F.col("doc_id") % 50 == 0)
    corpus = d.where(F.col("doc_id") % 50 != 0)
    return (
        ngram_contamination(corpus, probes)
        .select("doc_id", "contaminated_ngrams")
        .orderBy("doc_id")
    )


def q_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash signatures (pure-JVM bit kernel). Oracle: golden parquet from
    the independent pure-Python implementation (tools/make_golden.py)."""
    from colly_spark.functions.dedup import simhash64

    return simhash64(_read(spark, sf, "documents")).orderBy("doc_id")


def q_simhash_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash hamming-ball near-dup pairs (banded bucket join + bit_count
    verify). Oracle: derivable in SQL from the simhash golden parquet —
    DuckDB recomputes the band-bucket candidate generation relationally."""
    from colly_spark.functions.dedup import simhash_neardup_pairs

    d = _read(spark, sf, "documents")
    return simhash_neardup_pairs(d, max_hamming=3).orderBy("a", "b")


def q_video_features(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal video column end-to-end: deterministic Y4M payloads are
    synthesized per document (a pure function of doc_id) in one Arrow-batched
    mapInPandas pass, then decoded + feature-extracted by
    ``video_features`` (native planar-YUV decode, BT.601 to RGB) in a
    second. Binary codecs are not SQL-expressible, so the oracle is a
    GOLDEN PARQUET: the payloads are pure functions of doc_id, and
    tools/make_golden.py re-synthesizes the same Y4M streams and decodes
    them with independent numpy code (no colly_spark.functions import);
    value-level pinning also lives in
    tests/test_functions.py::test_video_features_mapinpandas."""
    import zlib

    import pandas as pd
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    from colly_spark.functions.multimodal import video_features

    docs = _read(spark, sf, "documents").select("doc_id").orderBy("doc_id").limit(64)
    schema = StructType([StructField("video_id", StringType()),
                         StructField("bytes", BinaryType())])

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                h = zlib.crc32(str(int(did)).encode())
                w, ht, n = 8, 6, 1 + h % 5
                frame = (b"FRAME\n" + bytes([h % 200]) * (w * ht)
                         + bytes([128]) * ((w // 2) * (ht // 2)) * 2)
                ids.append(f"vid-{int(did)}")
                payloads.append(f"YUV4MPEG2 W{w} H{ht} F25:1 C420\n".encode()
                                + frame * n)
            yield pd.DataFrame({"video_id": ids, "bytes": payloads})

    vids = docs.mapInPandas(gen, schema=schema)
    return video_features(vids, sample_every=2).orderBy("video_id")


def q_audio_features(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal audio column end-to-end: deterministic 16-bit PCM WAV
    payloads (sine of doc_id-derived frequency/amplitude) synthesized in one
    mapInPandas pass, decoded + feature-extracted by ``audio_features``
    (native stdlib-wave + numpy decode). Oracle: GOLDEN PARQUET from
    tools/make_golden.py — the payloads are pure functions of doc_id, so the
    golden re-synthesizes the same WAV streams and computes the features in
    independent numpy (identical float32 ops, so round(x, 6) matches
    bit-for-bit); value-level pinning in
    tests/test_functions.py::test_audio_features_mapinpandas."""
    import io
    import wave
    import zlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    from colly_spark.functions.multimodal import audio_features

    docs = _read(spark, sf, "documents").select("doc_id").orderBy("doc_id").limit(64)
    schema = StructType([StructField("audio_id", StringType()),
                         StructField("bytes", BinaryType())])

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                h = zlib.crc32(str(int(did)).encode())
                n, amp = 400 + h % 400, 0.1 + (h % 8) / 10.0
                t = np.arange(n)
                pcm = (amp * 32767 * np.sin(t / (3 + h % 7))).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wv:
                    wv.setnchannels(1)
                    wv.setsampwidth(2)
                    wv.setframerate(8000)
                    wv.writeframes(pcm.tobytes())
                ids.append(f"aud-{int(did)}")
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"audio_id": ids, "bytes": payloads})

    auds = docs.mapInPandas(gen, schema=schema)
    return audio_features(auds).orderBy("audio_id")


def q_image_validate(spark: SparkSession, sf: str) -> DataFrame:
    """The BASELINE input_hint invariant as a driver-gate row: an Iceberg-
    shaped image+caption table ``(image_id, bytes, w, h, fmt, caption,
    phash)`` is synthesized deterministically from doc_id (FPNG lossless /
    FJPG lossy per the colly_spark.imagecodec stand-in codec — real libjpeg
    is absent from this container), with a deterministic subset corrupted
    (truncated payload) and another subset caption-mismatched so BOTH
    outcomes of the gate are exercised. The operator under test is the real
    U5 pipeline: payload.make_validate_udf() (Arrow-batched decode + dims +
    PSNR>=40dB-for-lossy + phash recompute, colly_spark/operators/payload.py)
    plus payload_ok_col's JVM caption equality. Oracle: GOLDEN PARQUET —
    tools/make_golden.py re-synthesizes the same pixels and computes
    PSNR/quantization/hash outcomes in independent numpy (no colly_spark
    import). Reference parity target: colly's OnResponse image handling +
    caption extraction (reference README.md:21 'Automatic ... handling';
    invariant wording from BASELINE.json input_hint)."""
    import zlib

    import pandas as pd
    from pyspark.sql.types import (BinaryType, IntegerType, LongType,
                                   StringType, StructField, StructType)

    from colly_spark.operators.payload import make_validate_udf, payload_ok_col

    docs = _read(spark, sf, "documents").select("doc_id").orderBy("doc_id").limit(64)
    schema = StructType([
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
        StructField("caption_parsed", StringType()),
    ])

    def gen(batches):
        from colly_spark.imagecodec import average_hash, encode, reference_pixels

        for pdf in batches:
            rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt",
                                    "caption", "phash", "caption_parsed")}
            for did in pdf["doc_id"]:
                did = int(did)
                hh = zlib.crc32(str(did).encode())
                iid = f"img-{did}"
                w, ht = 16 + hh % 17, 16 + (hh >> 8) % 13
                fmt = "png" if hh % 2 == 0 else "jpeg"
                px = reference_pixels(iid, w, ht)
                data = encode(px, fmt)
                if hh % 11 == 0:  # corrupted payload -> img_ok must be False
                    data = data[: len(data) - 8]
                cap = f"figure {did}"
                parsed = cap if hh % 7 != 0 else cap + " (ocr noise)"
                for k, v in (("image_id", iid), ("bytes", data), ("w", w),
                             ("h", ht), ("fmt", fmt), ("caption", cap),
                             ("phash", average_hash(px)),
                             ("caption_parsed", parsed)):
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    imgs = docs.mapInPandas(gen, schema=schema)
    v = make_validate_udf()(
        F.col("bytes"), F.col("image_id"), F.col("w"), F.col("h"),
        F.col("fmt"), F.col("phash"),
    )
    out = imgs.select(
        "image_id", "fmt", "w", "h", "caption",
        v.getField("img_ok").alias("img_ok"),
        v.getField("psnr_db").alias("psnr_db"),
        F.coalesce(F.col("caption_parsed") == F.col("caption"), F.lit(False)).alias("caption_ok"),
        "caption_parsed",
    ).select(
        "image_id", "fmt", "w", "h", "img_ok", "psnr_db", "caption_ok",
        payload_ok_col(F.col("img_ok"), F.col("caption_parsed"), F.col("caption")).alias("payload_ok"),
    )
    return out.orderBy("image_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_counters": q_counters,
        "q_seen_antijoin": q_seen_antijoin,
        "q_first_wins_dedup": q_first_wins_dedup,
        "q_fifo_window": q_fifo_window,
        "q_token_budget": q_token_budget,
        "q_url_filters": q_url_filters,
        "q_domain_allowlist": q_domain_allowlist,
        "q_depth_gate": q_depth_gate,
        "q_lineage_rollup": q_lineage_rollup,
        "q_broadcast_dims": q_broadcast_dims,
        "q_agg_pushdown": q_agg_pushdown,
        "q_dedup_exact": q_dedup_exact,
        "q_text_stats": q_text_stats,
        "q_quality_scoring": q_quality_scoring,
        "q_lang_id": q_lang_id,
        "q_winnow_fingerprints": q_winnow_fingerprints,
        "q_winnow_overlap": q_winnow_overlap,
        "q_bpe_pair_stats": q_bpe_pair_stats,
        "q_corpus_report": q_corpus_report,
        "q_hash_split": q_hash_split,
        "q_pack_sequences": q_pack_sequences,
        "q_stratified_sample": q_stratified_sample,
        "q_mixture_sample": q_mixture_sample,
        "q_chunk_documents": q_chunk_documents,
        "q_lm_logprob": q_lm_logprob,
        "q_term_df": q_term_df,
        "q_line_dedup": q_line_dedup,
        "q_pii_redact": q_pii_redact,
        "q_incremental_dedup": q_incremental_dedup,
        "q_incremental_neardup": q_incremental_neardup,
        "q_repetition_signals": q_repetition_signals,
        "q_pipeline_clean": q_pipeline_clean,
        "q_phash_neardup": q_phash_neardup,
        "q_image_curation": q_image_curation,
        "q_pagerank": q_pagerank,
        "q_warc_roundtrip": q_warc_roundtrip,
        "q_sitemap_entries": q_sitemap_entries,
        "q_ann_bruteforce": q_ann_bruteforce,
        "q_ann_ivf": q_ann_ivf,
        "q_embedding_neardup": q_embedding_neardup,
        "q_ngram_jaccard": q_ngram_jaccard,
        "q_neardup_clusters": q_neardup_clusters,
        "q_ngram_contamination": q_ngram_contamination,
        "q_minhash_neardup": q_minhash_neardup,
        "q_simhash": q_simhash,
        "q_simhash_neardup": q_simhash_neardup,
        "q_video_features": q_video_features,
        "q_audio_features": q_audio_features,
        "q_image_validate": q_image_validate,
        "q_crawl_visits": q_crawl_visits,
    }


_WINNOW_FP_SQL = """
            WITH norm AS (
              SELECT doc_id,
                     regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
              FROM documents
            ),
            hashes AS (
              SELECT doc_id,
                list_transform(
                  range(1, length(s) - 8 + 2),
                  i -> list_reduce(
                         list_prepend(0::HUGEINT,
                           list_transform(range(0, 8),
                             j -> ord(substring(s, (i + j)::INT, 1))::HUGEINT)),
                         (acc, c) ->
                           (acc * 1000003 + c) % 18446744073709551616::HUGEINT
                       )
                ) AS hs
              FROM norm WHERE length(s) >= 8
            ),
            fps AS (
              SELECT doc_id,
                list_distinct(
                  CASE WHEN len(hs) <= 4 THEN [list_min(hs)]
                       ELSE list_transform(range(1, len(hs) - 4 + 2),
                                           w -> list_min(hs[w : w + 3]))
                  END
                ) AS fp_list
              FROM hashes
            )
            SELECT doc_id,
                   (CASE WHEN fp >= 9223372036854775808::HUGEINT
                         THEN fp - 18446744073709551616::HUGEINT
                         ELSE fp END)::BIGINT AS fp
            FROM fps, UNNEST(fp_list) AS u(fp)
            
        """


def oracle_sql() -> dict[str, str]:
    return {
        "q_counters": """
            SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "q_seen_antijoin": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate >= TIMESTAMP '1997-01-01')
        """,
        "q_first_wins_dedup": """
            SELECT o_custkey,
                   (ARRAY_AGG(o_orderkey ORDER BY o_orderdate, o_orderkey))[1] AS first_order
            FROM orders GROUP BY o_custkey
        """,
        "q_fifo_window": """
            SELECT user_id, event_id, rn FROM (
                SELECT user_id, event_id,
                       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM events) t
            WHERE rn <= 3
        """,
        "q_token_budget": """
            SELECT o_custkey, COUNT(*) AS dispatched FROM (
                SELECT o_custkey,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey) AS rn
                FROM orders) t
            WHERE rn <= 2 GROUP BY o_custkey
        """,
        "q_url_filters": """
            SELECT p_brand, COUNT(*) AS n FROM part
            WHERE regexp_matches(p_name, 'a') AND NOT regexp_matches(p_name, '^zz')
            GROUP BY p_brand
        """,
        "q_domain_allowlist": """
            SELECT n_name, COUNT(*) AS customers, ROUND(SUM(c_acctbal), 2) AS balance
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE n_name IN ('NATION_0','NATION_3','NATION_7')
            GROUP BY n_name
        """,
        "q_depth_gate": """
            SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 100
        """,
        "q_lineage_rollup": """
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS urls_in,
                   ROUND(SUM(value), 4) AS work
            FROM events GROUP BY event_type, day ORDER BY event_type, day
        """,
        "q_broadcast_dims": """
            SELECT r_name, COUNT(*) AS customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "q_agg_pushdown": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 4) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q_dedup_exact": """
            SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
                   MIN(doc_id) AS keep_doc_id, COUNT(*) AS group_size
            FROM documents GROUP BY fp ORDER BY fp
        """,
        "q_text_stats": f"""
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                   len(regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))
                       AS n_bpe_tokens,
                   length(text) AS n_chars_sql,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents
        """,
        "q_quality_scoring": f"""
            SELECT doc_id,
                   ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                         / GREATEST(length(text), 1)::DOUBLE, 6) AS punct_ratio,
                   ROUND(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                         w -> list_contains({STOPWORDS_SQL}, w)))
                         / GREATEST(len(regexp_split_to_array(trim(text), '\\s+')), 1)::DOUBLE,
                         6) AS stopword_ratio
            FROM documents
        """,
        "q_lang_id": f"""
            SELECT CASE WHEN len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                             w -> list_contains({STOPWORDS_SQL}, w)))
                             / GREATEST(len(regexp_split_to_array(trim(text), '\\s+')), 1)::DOUBLE
                             > 0.02
                        THEN 'en' ELSE 'und' END AS lang,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY 1 ORDER BY lang
        """,
        # winnowing recomputed RELATIONALLY: per doc, the k=8-char shingle
        # rolling hashes (list_reduce over HUGEINT, % 2^64 = the kernel's
        # uint64 wraparound), min per 4-hash window, distinct, two's
        # complement into BIGINT
        "q_winnow_fingerprints": _WINNOW_FP_SQL + " ORDER BY doc_id, fp",
        "q_corpus_report": """
            WITH d0 AS (
              SELECT source, COALESCE(text, '') AS text FROM documents
            ), per AS (
              SELECT source,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE length(regexp_split_to_array(trim(text), '\\s+'))
                     END AS n_tok,
                     len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         w -> list_contains(['the','a','an','and','or','of',
                             'to','in','is','are','was','were','be','been',
                             'it','this','that','for','on','as'], w)))
                       / GREATEST(len(regexp_split_to_array(trim(text),
                                      '\\s+')), 1)::DOUBLE AS sw,
                     (length(text)
                      - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                       / GREATEST(length(text), 1)::DOUBLE AS punct,
                     md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                       AS fp
              FROM d0
            ), scored AS (
              SELECT source, n_tok, fp,
                     ((CASE WHEN n_tok BETWEEN 10 AND 5000
                            THEN 1.0 ELSE 0.3 END)
                      + (CASE WHEN punct < 0.2 THEN 1.0 ELSE 0.5 END)
                      + (CASE WHEN sw > 0.05 THEN 1.0 ELSE 0.4 END)) / 3.0
                       AS q,
                     CASE WHEN sw > 0.02 THEN 1.0 ELSE 0.0 END AS is_en
              FROM per
            )
            SELECT source, COUNT(*) AS n_docs, SUM(n_tok) AS n_tokens,
                   ROUND(AVG(q), 4) AS mean_quality,
                   ROUND(AVG(is_en), 4) AS pct_en,
                   COUNT(*) - COUNT(DISTINCT fp) AS n_dup_docs
            FROM scored GROUP BY source
        """,
        "q_bpe_pair_stats": """
            WITH toks AS (
              SELECT unnest(regexp_extract_all(text,
                '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))
                AS tok
              FROM documents
            ), vocab AS (
              SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok
            ), pairs AS (
              SELECT freq,
                     substring(tok, i, 1) AS l,
                     substring(tok, i + 1, 1) AS r
              FROM vocab, UNNEST(range(1, length(tok))) AS t(i)
              WHERE length(tok) >= 2
            )
            SELECT l, r, SUM(freq) AS pair_count FROM pairs GROUP BY l, r
        """,
        "q_winnow_overlap": f"""
            WITH wf AS ({_WINNOW_FP_SQL}),
            capped AS (
              SELECT doc_id, fp FROM (
                SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS n
                FROM wf)
              WHERE n <= 64
            )
            SELECT l.doc_id AS a, r.doc_id AS b,
                   COUNT(*) AS n_shared
            FROM capped l JOIN capped r
              ON l.fp = r.fp AND l.doc_id < r.doc_id
            GROUP BY a, b HAVING COUNT(*) >= 4
        """,
        "q_hash_split": """
            SELECT doc_id, bucket,
                   CASE WHEN bucket < 98 THEN 'train'
                        WHEN bucket < 99 THEN 'valid'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                              AS UBIGINT) % 100 AS bucket
                  FROM documents)
        """,
        "q_pack_sequences": r"""
            WITH d AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                          AS UBIGINT) AS h,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE length(regexp_split_to_array(trim(text), '\s+'))
                     END AS n_tokens
              FROM documents
            ), f AS (
              SELECT doc_id, h % 64 AS shard, h AS sort_h, n_tokens
              FROM d WHERE n_tokens > 0
            ), c AS (
              SELECT doc_id, shard, n_tokens,
                     SUM(n_tokens) OVER (PARTITION BY shard
                                         ORDER BY sort_h, doc_id
                                         ROWS UNBOUNDED PRECEDING) AS cum
              FROM f
            )
            SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
                   CAST(cum - n_tokens AS BIGINT) AS start_token,
                   CAST((cum - n_tokens) // 2048 AS BIGINT) AS first_seq,
                   CAST((cum - 1) // 2048 AS BIGINT) AS last_seq,
                   CAST((cum - 1) // 2048 - (cum - n_tokens) // 2048 + 1
                        AS BIGINT) AS n_seqs
            FROM c
        """,
        "q_stratified_sample": """
            SELECT doc_id, lang, sample_bucket
            FROM (SELECT doc_id, lang,
                         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                  || ':sample'), 1, 8))
                              AS UBIGINT) % 10000 AS sample_bucket
                  FROM documents)
            WHERE sample_bucket < CASE lang WHEN 'en' THEN 5000
                                            WHEN 'de' THEN 2500
                                            WHEN 'zh' THEN 10000
                                            ELSE 1000 END
        """,
        "q_mixture_sample": """
            WITH tgt(lang, target_bp) AS (
              VALUES ('en', 5000), ('de', 2000), ('es', 1500),
                     ('fr', 1000), ('zh', 500)
            ), counts AS (
              SELECT d.lang, COUNT(*) AS n, t.target_bp
              FROM documents d JOIN tgt t ON d.lang = t.lang
              GROUP BY d.lang, t.target_bp
            ), tt AS (
              SELECT MIN(n * 10000 // target_bp) AS t_total FROM counts
            ), rates AS (
              SELECT lang,
                     (t_total * target_bp // 10000) * 10000 // n AS rate_bp
              FROM counts, tt
            )
            SELECT d.doc_id, d.lang,
                   CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)
                                            || ':mix'), 1, 8))
                        AS UBIGINT) % 10000 AS sample_bucket
            FROM documents d JOIN rates r ON d.lang = r.lang
            WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)
                                           || ':mix'), 1, 8))
                       AS UBIGINT) % 10000 < r.rate_bp
        """,
        "q_chunk_documents": r"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
              FROM documents
              WHERE length(trim(text)) > 0
            ), starts AS (
              SELECT doc_id, w,
                     unnest(generate_series(
                       0, GREATEST(0, CAST(ceil((len(w) - 64) / 48.0) AS INT))
                     )) AS chunk_id
              FROM toks
            )
            SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
                   len(w[chunk_id * 48 + 1 : chunk_id * 48 + 64])
                     AS n_chunk_tokens,
                   array_to_string(w[chunk_id * 48 + 1 : chunk_id * 48 + 64],
                                   ' ') AS chunk
            FROM starts
        """,
        "q_lm_logprob": r"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
              FROM documents
              WHERE length(trim(text)) > 0
            ), bg AS (
              SELECT doc_id,
                     unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS z
              FROM toks WHERE len(w) >= 2
            ), b AS (
              SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM bg
            ), c12 AS (
              SELECT w1, w2, COUNT(*) AS n12 FROM b GROUP BY w1, w2
            ), c1 AS (
              SELECT w1, COUNT(*) AS n1 FROM b GROUP BY w1
            ), per_doc AS (
              SELECT b.doc_id, COUNT(*) AS n_bigrams,
                     0 AS n_oov,
                     ROUND(AVG(ln(n12 / CAST(n1 AS DOUBLE))), 6) AS avg_logp
              FROM b JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
              GROUP BY b.doc_id
            )
            SELECT d.doc_id,
                   COALESCE(p.n_bigrams, 0) AS n_bigrams,
                   COALESCE(p.n_oov, 0) AS n_oov,
                   p.avg_logp
            FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        """,
        "q_term_df": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\s+')) AS token
              FROM documents WHERE length(trim(text)) > 0
            ),
            n AS (SELECT COUNT(*) AS corpus_n FROM documents)
            SELECT token, COUNT(DISTINCT doc_id) AS doc_freq,
                   COUNT(*) AS term_freq,
                   ROUND(ln((corpus_n + 1) / (COUNT(DISTINCT doc_id) + 1)) + 1, 6)
                       AS idf
            FROM toks, n GROUP BY token, corpus_n
        """,
        "q_line_dedup": r"""
            WITH reshaped AS (
              SELECT doc_id,
                     array_to_string(
                       list_transform(range(0, CAST(ceil(len(ws)/8.0) AS INT)),
                         i -> array_to_string(ws[i*8+1 : i*8+8], ' ')),
                       chr(10)) AS text
              FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                    FROM documents)
            ),
            lines AS (
              SELECT doc_id, j - 1 AS pos, ls[j] AS line,
                     md5(lower(trim(ls[j]))) AS lfp
              FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
                    FROM reshaped),
                   UNNEST(range(1, len(ls) + 1)) AS t(j)
            ),
            boiler AS (
              SELECT lfp FROM lines GROUP BY lfp
              HAVING COUNT(DISTINCT doc_id) >= 2
            ),
            kept AS (
              SELECT * FROM lines WHERE lfp NOT IN (SELECT lfp FROM boiler)
            ),
            agg AS (
              SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS kept_text,
                     COUNT(*) AS n_kept
              FROM kept GROUP BY doc_id
            ),
            base AS (
              SELECT doc_id, len(string_split(text, chr(10))) AS n_lines
              FROM reshaped
            )
            SELECT b.doc_id, coalesce(a.kept_text, '') AS text, b.n_lines,
                   b.n_lines - coalesce(a.n_kept, 0) AS n_removed
            FROM base b LEFT JOIN agg a USING (doc_id)
        """,
        "q_pii_redact": r"""
            WITH seeded AS (
              SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com or 555-123-4567 at 10.0.'
                          || CAST(doc_id % 256 AS VARCHAR) || '.1' AS text
              FROM documents
            )
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g'),
                       '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
                     '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS text,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                       AS n_emails,
                   len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
                       AS n_phones,
                   len(regexp_extract_all(text, '\b(\d{1,3}\.){3}\d{1,3}\b'))
                       AS n_ips
            FROM seeded
        """,
        "q_incremental_dedup": r"""
            WITH f AS (
              SELECT doc_id,
                     md5(regexp_replace(lower(trim(coalesce(text, ''))),
                                        '\s+', ' ', 'g')) AS fp
              FROM documents
            ),
            b1 AS (
              SELECT fp, MIN(doc_id) AS doc_id FROM f
              WHERE doc_id % 2 = 0 GROUP BY fp
            ),
            b2 AS (
              SELECT fp, MIN(doc_id) AS doc_id FROM f f2
              WHERE NOT EXISTS (SELECT 1 FROM b1 WHERE b1.fp = f2.fp)
              GROUP BY fp
            )
            SELECT 1 AS batch, doc_id FROM b1
            UNION ALL
            SELECT 2 AS batch, doc_id FROM b2
        """,
        "q_repetition_signals": r"""
            WITH w AS (
              SELECT doc_id, coalesce(text, '') AS text,
                     CASE WHEN length(trim(coalesce(text, ''))) = 0
                          THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\s+')
                          END AS ws
              FROM documents
            ),
            g AS (
              SELECT doc_id, text, ws,
                     CASE WHEN len(ws) >= 3
                          THEN list_transform(range(1, len(ws) - 1),
                                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                          ELSE []::VARCHAR[] END AS grams
              FROM w
            )
            SELECT doc_id,
                   ROUND(CASE WHEN len(grams) > 0
                              THEN 1.0 - len(list_distinct(grams))::DOUBLE
                                         / len(grams)
                              ELSE 0.0 END, 6) AS frac_dup_3grams,
                   ROUND(CASE WHEN len(ws) > 0
                              THEN list_sum(list_transform(ws, x -> length(x)))::DOUBLE
                                   / len(ws)
                              ELSE 0.0 END, 6) AS mean_word_len,
                   ROUND(len(regexp_extract_all(text, '#|\.\.\.'))::DOUBLE
                         / GREATEST(len(ws), 1), 6) AS symbol_word_ratio
            FROM g
        """,
        "q_pipeline_clean": f"""
            WITH feats AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                          END AS n_tok,
                     (length(text)
                        - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                        / GREATEST(length(text), 1)::DOUBLE AS punct,
                     len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           w -> list_contains({STOPWORDS_SQL}, w)))
                        / GREATEST(len(regexp_split_to_array(trim(text), '\\s+')),
                                   1)::DOUBLE AS sw,
                     md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                         AS fp
              FROM documents
            ),
            scored AS (
              SELECT * FROM feats
              WHERE ((CASE WHEN n_tok BETWEEN 10 AND 5000 THEN 1.0 ELSE 0.3 END
                    + CASE WHEN punct < 0.2 THEN 1.0 ELSE 0.5 END
                    + CASE WHEN sw > 0.05 THEN 1.0 ELSE 0.4 END) / 3.0) >= 0.9
                AND sw > 0.02
            ),
            keep AS (SELECT fp, MIN(doc_id) AS doc_id FROM scored GROUP BY fp),
            surv AS (
              SELECT s.doc_id, s.n_tok FROM scored s
              JOIN keep k ON s.fp = k.fp AND s.doc_id = k.doc_id
            ),
            labeled AS (
              SELECT CASE WHEN b < 98 THEN 'train'
                          WHEN b < 99 THEN 'valid'
                          ELSE 'test' END AS split, n_tok
              FROM (SELECT n_tok,
                           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                                AS UBIGINT) % 100 AS b
                    FROM surv) t
            )
            SELECT split, COUNT(*) AS n_docs, SUM(n_tok) AS n_tokens
            FROM labeled GROUP BY split
        """,
        "q_phash_neardup": f"""
            WITH imgs AS (
              SELECT doc_id AS image_id, {_PHASH_DUCK} AS phash FROM documents
            ),
            bands AS (
              SELECT image_id, b.band, (phash >> (b.band * 16)) & 65535 AS key
              FROM imgs, (SELECT UNNEST([0, 1, 2, 3]) AS band) b
            ),
            keep AS (
              SELECT band, key FROM bands GROUP BY band, key
              HAVING COUNT(*) <= 256
            ),
            cand AS (
              SELECT DISTINCT l.image_id AS a, r.image_id AS b
              FROM bands l
              JOIN keep USING (band, key)
              JOIN bands r USING (band, key)
              WHERE l.image_id < r.image_id
            )
            SELECT c.a, c.b, bit_count(xor(pa.phash, pb.phash)) AS hamming
            FROM cand c
            JOIN imgs pa ON pa.image_id = c.a
            JOIN imgs pb ON pb.image_id = c.b
            WHERE bit_count(xor(pa.phash, pb.phash)) <= 3
        """,
        "q_pagerank": _pagerank_oracle_sql(),
        "q_warc_roundtrip": """
            SELECT doc_id,
                   'http://corpus.test/doc/' || doc_id AS target_uri,
                   200 AS http_status,
                   'text/plain' AS content_type,
                   CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
            FROM documents
        """,
        "q_sitemap_entries": """
            SELECT 'http://corpus.test/sitemap-' || (doc_id // 10) || '.xml'
                     AS sitemap_url,
                   FALSE AS is_index,
                   'http://corpus.test/doc/' || doc_id AS loc,
                   '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                     AS lastmod
            FROM documents
        """,
        "q_image_curation": f"""
            WITH imgs AS (
              SELECT doc_id AS image_id, text AS caption,
                     {_PHASH_DUCK} AS phash
              FROM documents
            ), gated AS (
              SELECT image_id, caption, phash,
                     md5(regexp_replace(lower(trim(caption)), '\\s+', ' ', 'g'))
                       AS cfp,
                     CASE WHEN length(trim(caption)) = 0 THEN 0
                          ELSE length(regexp_split_to_array(trim(caption), '\\s+'))
                     END AS n_tok
              FROM imgs
              WHERE len(list_filter(regexp_split_to_array(trim(caption), '\\s+'),
                        w -> list_contains(['the','a','an','and','or','of','to',
                                            'in','is','are','was','were','be',
                                            'been','it','this','that','for',
                                            'on','as'], w)))
                      / GREATEST(len(regexp_split_to_array(trim(caption), '\\s+')),
                                 1)::DOUBLE > 0.02
                AND (CASE WHEN length(trim(caption)) = 0 THEN 0
                          ELSE length(regexp_split_to_array(trim(caption), '\\s+'))
                     END) >= 30
            ), keepcap AS (
              SELECT cfp, MIN(image_id) AS image_id FROM gated GROUP BY cfp
            ), surv AS (
              SELECT g.image_id, g.caption, g.phash, g.n_tok
              FROM gated g JOIN keepcap k
                ON g.cfp = k.cfp AND g.image_id = k.image_id
            ), bands AS (
              SELECT image_id, b.band, (phash >> (b.band * 16)) & 65535 AS key
              FROM surv, (SELECT UNNEST([0, 1, 2, 3]) AS band) b
            ), keepb AS (
              SELECT band, key FROM bands GROUP BY band, key
              HAVING COUNT(*) <= 256
            ), losers AS (
              SELECT DISTINCT r.image_id
              FROM bands l
              JOIN keepb USING (band, key)
              JOIN bands r USING (band, key)
              JOIN surv pa ON pa.image_id = l.image_id
              JOIN surv pb ON pb.image_id = r.image_id
              WHERE l.image_id < r.image_id
                AND bit_count(xor(pa.phash, pb.phash)) <= 3
            )
            SELECT image_id,
                   CASE WHEN bucket < 98 THEN 'train'
                        WHEN bucket < 99 THEN 'valid'
                        ELSE 'test' END AS split,
                   n_tok
            FROM (SELECT s.image_id, s.n_tok,
                         CAST(('0x' || substr(md5(CAST(s.image_id AS VARCHAR)),
                                              1, 8)) AS UBIGINT) % 100 AS bucket
                  FROM surv s
                  WHERE s.image_id NOT IN (SELECT image_id FROM losers))
        """,
        "q_incremental_neardup": """
            SELECT batch, doc_id
            FROM read_parquet('/root/repo/golden/q_incremental_neardup.sf0.01.parquet')
            ORDER BY batch, doc_id
        """,
        "q_ann_bruteforce": """
            SELECT query_id, neighbor_id, rank FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                                    c.vec_id ASC) AS rank
                FROM embeddings q, embeddings c
                WHERE q.vec_id IN (0,1,2,3,4) AND c.vec_id <> q.vec_id) t
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        # q_ann_ivf / q_embedding_neardup: the LSH bucket folds are plain
        # integer arithmetic over parquet float sign bits (no float math
        # until the final cosine), so DuckDB reproduces the approximate
        # candidate generation exactly; outputs are integer columns only.
        "q_ann_ivf": """
            WITH e AS (
                SELECT vec_id, embedding,
                       (CASE WHEN embedding[1] >= 0 THEN 32 ELSE 0 END)
                     + (CASE WHEN embedding[2] >= 0 THEN 16 ELSE 0 END)
                     + (CASE WHEN embedding[3] >= 0 THEN 8 ELSE 0 END)
                     + (CASE WHEN embedding[4] >= 0 THEN 4 ELSE 0 END)
                     + (CASE WHEN embedding[5] >= 0 THEN 2 ELSE 0 END)
                     + (CASE WHEN embedding[6] >= 0 THEN 1 ELSE 0 END)
                       AS bucket
                FROM embeddings),
            probes AS (
                SELECT DISTINCT q.vec_id AS query_id, q.embedding AS q_emb,
                       xor(q.bucket, f.flip) AS bucket
                FROM e q,
                     (SELECT UNNEST([0,1,2,3,4,5,6,8,9,10,12,16,17,18,20,
                                     24,32,33,34,36,40,48]) AS flip) f
                WHERE q.vec_id IN (0,1,2,3,4)),
            ranked AS (
                SELECT query_id, r.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY list_cosine_similarity(q_emb, r.embedding)
                                    DESC, r.vec_id ASC) AS rank
                FROM probes JOIN e r USING (bucket)
                WHERE r.vec_id <> query_id)
            SELECT query_id, neighbor_id, rank FROM ranked
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "q_embedding_neardup": """
            WITH e AS (
                SELECT vec_id, embedding,
                       (CASE WHEN embedding[1] >= 0 THEN 2048 ELSE 0 END)
                     + (CASE WHEN embedding[2] >= 0 THEN 1024 ELSE 0 END)
                     + (CASE WHEN embedding[3] >= 0 THEN 512 ELSE 0 END)
                     + (CASE WHEN embedding[4] >= 0 THEN 256 ELSE 0 END)
                     + (CASE WHEN embedding[5] >= 0 THEN 128 ELSE 0 END)
                     + (CASE WHEN embedding[6] >= 0 THEN 64 ELSE 0 END)
                     + (CASE WHEN embedding[7] >= 0 THEN 32 ELSE 0 END)
                     + (CASE WHEN embedding[8] >= 0 THEN 16 ELSE 0 END)
                     + (CASE WHEN embedding[9] >= 0 THEN 8 ELSE 0 END)
                     + (CASE WHEN embedding[10] >= 0 THEN 4 ELSE 0 END)
                     + (CASE WHEN embedding[11] >= 0 THEN 2 ELSE 0 END)
                     + (CASE WHEN embedding[12] >= 0 THEN 1 ELSE 0 END)
                       AS bucket
                FROM embeddings),
            lhs AS (
                SELECT vec_id AS a, embedding AS emb_a,
                       xor(bucket, f.flip) AS bucket
                FROM e, (SELECT UNNEST([0,1,2,4,8,16,32,64,128,256,512,
                                        1024,2048]) AS flip) f)
            SELECT DISTINCT a, r.vec_id AS b
            FROM lhs JOIN e r USING (bucket)
            WHERE a < r.vec_id
              AND list_cosine_similarity(emb_a, r.embedding) >= 0.37
            ORDER BY a, b
        """,
        # q_minhash_neardup / q_simhash: DuckDB cannot reproduce Spark's
        # seeded xxhash64, so the oracle is a GOLDEN PARQUET computed by an
        # independent pure-Python implementation (tools/make_golden.py;
        # hash kernel validated against Spark bit-for-bit in
        # tests/test_xxh.py). The driver compares at sf0.01 — these goldens
        # are generated from /root/testdata/sf0.01/documents.parquet.
        "q_minhash_neardup": """
            SELECT a, b, est_jaccard
            FROM read_parquet('/root/repo/golden/q_minhash_neardup.sf0.01.parquet')
            ORDER BY a, b
        """,
        "q_simhash": """
            SELECT doc_id, simhash
            FROM read_parquet('/root/repo/golden/q_simhash.sf0.01.parquet')
            ORDER BY doc_id
        """,
        # exact n-gram Jaccard: fully relational, so DuckDB recomputes the
        # same shingling (lowercase, whitespace-normalized, 3-word windows,
        # whole-text shingle when fewer than 3 words), the df<=64 shingle
        # cap, the shared-shingle candidate join, and |A∪B| = szA+szB−inter
        "q_ngram_jaccard": """
            WITH w AS (
                SELECT doc_id,
                       string_split(regexp_replace(lower(trim(text)),
                                                   '\\s+', ' ', 'g'), ' ') AS w
                FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
                            ELSE array_to_string(w[i+1:i+3], ' ') END AS shingle
                FROM w, UNNEST(range(0, greatest(len(w) - 3, 0) + 1)) AS t(i)
            ), keep AS (
                SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 64
            ), sh2 AS (
                SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)
            ), sizes AS (
                SELECT doc_id, count(*) AS sz FROM sh2 GROUP BY doc_id
            ), inter AS (
                SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
                FROM sh2 x JOIN sh2 y
                  ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                GROUP BY 1, 2
            )
            SELECT a, b,
                   round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.6
            ORDER BY a, b
        """,
        # near-dup clusters: the same relational pair derivation, then
        # connected components via a recursive min-label-reachability CTE
        # (cc enumerates every (node, smaller-reachable-id); min per node
        # is the component minimum — an independent algorithm from Spark's
        # large-star/small-star, same fixpoint)
        # decontamination: identical shingle derivation (no df cap here —
        # contamination counts every shared shingle), probe side = every
        # 50th doc, semi-join hit count per remaining doc
        "q_ngram_contamination": """
            WITH w AS (
                SELECT doc_id,
                       string_split(regexp_replace(lower(trim(text)),
                                                   '\\s+', ' ', 'g'), ' ') AS w
                FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
                            ELSE array_to_string(w[i+1:i+3], ' ') END AS shingle
                FROM w, UNNEST(range(0, greatest(len(w) - 3, 0) + 1)) AS t(i)
            ), probe AS (
                SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0
            )
            SELECT sh.doc_id, count(*) AS contaminated_ngrams
            FROM sh JOIN probe USING (shingle)
            WHERE sh.doc_id % 50 != 0
            GROUP BY sh.doc_id
            ORDER BY sh.doc_id
        """,
        "q_neardup_clusters": """
            WITH RECURSIVE w AS (
                SELECT doc_id,
                       string_split(regexp_replace(lower(trim(text)),
                                                   '\\s+', ' ', 'g'), ' ') AS w
                FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
                            ELSE array_to_string(w[i+1:i+3], ' ') END AS shingle
                FROM w, UNNEST(range(0, greatest(len(w) - 3, 0) + 1)) AS t(i)
            ), keep AS (
                SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 64
            ), sh2 AS (
                SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)
            ), sizes AS (
                SELECT doc_id, count(*) AS sz FROM sh2 GROUP BY doc_id
            ), inter AS (
                SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
                FROM sh2 x JOIN sh2 y
                  ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                GROUP BY 1, 2
            ), prs AS (
                SELECT a, b FROM inter
                JOIN sizes sa ON sa.doc_id = a
                JOIN sizes sb ON sb.doc_id = b
                WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.6
            ), edges AS (
                SELECT a AS u, b AS v FROM prs UNION SELECT b, a FROM prs
            ), cc(node, label) AS (
                SELECT u, u FROM edges
              UNION
                SELECT e.u, c.label FROM edges e JOIN cc c ON c.node = e.v
                WHERE c.label < e.u
            ), lab AS (
                SELECT node, min(label) AS label FROM cc GROUP BY node
            ), assign AS (
                SELECT d.doc_id, coalesce(l.label, d.doc_id) AS cluster_id
                FROM documents d LEFT JOIN lab l ON l.node = d.doc_id
            )
            SELECT a1.doc_id, a1.cluster_id, s.cluster_size
            FROM assign a1
            JOIN (SELECT cluster_id, count(*) AS cluster_size
                  FROM assign GROUP BY cluster_id) s USING (cluster_id)
            ORDER BY doc_id
        """,
        # q_video_features / q_audio_features: binary codecs, not
        # SQL-expressible — the oracle is a golden parquet whose rows are
        # computed by tools/make_golden.py re-synthesizing the same
        # deterministic payloads (pure functions of doc_id) and decoding
        # them with independent numpy code.
        "q_video_features": """
            SELECT video_id, decode_ok, w, h, fps, n_frames, duration_s,
                   n_sampled, mean_luma
            FROM read_parquet('/root/repo/golden/q_video_features.sf0.01.parquet')
            ORDER BY video_id
        """,
        "q_audio_features": """
            SELECT audio_id, decode_ok, sample_rate, channels, n_frames,
                   duration_s, rms, peak
            FROM read_parquet('/root/repo/golden/q_audio_features.sf0.01.parquet')
            ORDER BY audio_id
        """,
        "q_image_validate": """
            SELECT image_id, fmt, w, h, img_ok, psnr_db, caption_ok, payload_ok
            FROM read_parquet('/root/repo/golden/q_image_validate.sf0.01.parquet')
            ORDER BY image_id
        """,
        # q_crawl_visits: the flagship crawl's visit order — the golden is
        # emitted by the SERIAL simulator (tools/make_golden.py ->
        # colly_spark/simulator.py, engine-independent by construction) on
        # the pinned CRAWL_FIXTURE web, not by Spark and not by SQL.
        "q_crawl_visits": """
            SELECT fetch_seq, url, depth
            FROM read_parquet('/root/repo/golden/q_crawl_visits.parquet')
            ORDER BY fetch_seq
        """,
        # the pair finder IS SQL-expressible given the golden signatures:
        # DuckDB recomputes the 4x16-bit band buckets, the mega-bucket cap,
        # and the bit_count hamming verify relationally.
        "q_simhash_neardup": """
            WITH s AS (
                SELECT doc_id, simhash
                FROM read_parquet('/root/repo/golden/q_simhash.sf0.01.parquet')
            ),
            bands AS (
                SELECT doc_id, b.band, (simhash >> (b.band * 16)) & 65535 AS key
                FROM s, (SELECT UNNEST([0, 1, 2, 3]) AS band) b
            ),
            keep AS (
                SELECT band, key FROM bands GROUP BY band, key
                HAVING COUNT(*) <= 256
            ),
            cand AS (
                SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
                FROM bands l
                JOIN keep USING (band, key)
                JOIN bands r USING (band, key)
                WHERE l.doc_id < r.doc_id
            )
            SELECT c.a, c.b,
                   bit_count(xor(sa.simhash, sb.simhash)) AS hamming
            FROM cand c
            JOIN s sa ON sa.doc_id = c.a
            JOIN s sb ON sb.doc_id = c.b
            WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
            ORDER BY a, b
        """,
    }
