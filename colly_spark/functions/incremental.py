"""Incremental (cross-batch) corpus dedup on the crawl engine's StateStore.

A training-data pipeline ingests crawl output in batches; exact dedup must
therefore be INCREMENTAL: each new batch dedupes against every previously
accepted document without rescanning or re-shuffling the accumulated
corpus. That is the same problem the crawler's 10^10-row ``url_seen``
store solves, and this operator reuses that machinery unchanged (colly
analog: the pluggable visited-storage seam, reference
storage/storage.go:30-42): seen fingerprints live in a bucketed LSM table
— a hash-partitioned base whose partitioning survives its checkpoint, so
probe joins re-shuffle only the incoming batch (plan-asserted), plus a
small recent-append tail — with the crawl's round-commit / crash / resume
contract on either durable backend (parquet tree or sqlite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from colly_spark.functions.text import fingerprint
from colly_spark.statestore import make_state_store

SEEN_FPS = StructType([StructField("fp", StringType())])


class IncrementalDeduper:
    """Exact first-seen-EVER dedup across an unbounded sequence of
    batches. Construct with a ``checkpoint_dir`` to make the seen set
    durable: a later process pointed at the same directory resumes with
    the full fingerprint history (committed rounds only — a crash mid
    batch replays that batch, never double-admits or loses history).

    ``partitions`` sizes the base's hash-partitioning and DEFAULTS to the
    session's ``spark.sql.shuffle.partitions`` — the base is only
    co-partition-joinable (no base-side exchange) when the two agree,
    exactly as the engine aligns them for url_seen; override both
    together (the 10^10 design point uses 4096). ``merge_every``
    amortizes the full-base compaction shuffle to one per N batches."""

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str | None = None,
        partitions: int | None = None,
        merge_every: int = 4,
    ):
        self.spark = spark
        if partitions is None:
            partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
        self.store = make_state_store(
            spark,
            {"seen_fps": SEEN_FPS},
            checkpoint_dir,
            bucketed={
                "seen_fps": {
                    "keys": ("fp",),
                    "partitions": partitions,
                    "merge_every": merge_every,
                }
            },
        )
        self.round = self.store.completed_round + 1

    def dedupe_batch(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """Admit the first-seen-ever rows of ``docs`` and commit their
        fingerprints as one atomic round.

        Within the batch the lowest ``id_col`` wins per normalized-text
        fingerprint (same first-wins rule as ``exact_dedup``; exactly ONE
        row survives per fingerprint even if the batch carries literal
        duplicate (id, text) rows — a window rank, not a keys join-back,
        which would readmit every copy of the winning key). NULL text
        fingerprints as empty text, so NULL docs dedup like any other
        instead of slipping past the null-unsafe anti-join every batch.
        Across batches, anything whose fingerprint was admitted by ANY
        earlier committed batch is dropped. Plan shape: one window
        shuffle on the fingerprint (skinny), anti-joins against base
        (co-partitioned, no base-side exchange — plan-asserted via
        :meth:`admit_plan`) and tail (broadcast-sized); the admitted rows
        are checkpointed ONCE and that same frame is both the staged
        delta and the return value."""
        fresh = self.admit_plan(docs, text_col, id_col).localCheckpoint(
            eager=True
        )
        self.store.stage_append(
            "seen_fps", fresh.select(F.col("__fp").alias("fp")), self.round
        )
        self.store.compact(["seen_fps"])
        self.store.commit_round(self.round, {"batches": self.round + 1})
        self.round += 1
        return fresh.drop("__fp")

    def admit_plan(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """The lazy admission plan (everything :meth:`dedupe_batch` does
        before its checkpoint/commit) — exposed so tests can assert the
        EXECUTED plan of the real operator path (e.g. that the base side
        of the anti-join never re-shuffles), not a hand-rebuilt copy."""
        from pyspark.sql import Window

        batch = docs.withColumn(
            "__fp", fingerprint(F.coalesce(F.col(text_col), F.lit("")))
        )
        w = Window.partitionBy("__fp").orderBy(id_col)
        batch = (
            batch.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        base, tail = self.store.get_parts("seen_fps")
        for part in (base, tail):
            if part is not None:
                batch = batch.join(
                    part.select(F.col("fp").alias("__fp")), "__fp", "left_anti"
                )
        return batch

    def seen_count(self) -> int:
        """Fingerprints admitted across all committed batches."""
        return self.store.get("seen_fps").count()


SEEN_BANDS = StructType(
    [
        StructField("band", IntegerType()),
        StructField("bucket", LongType()),
        StructField("doc_id", LongType()),
    ]
)
SEEN_SIGS = StructType(
    [StructField("doc_id", LongType()), StructField("sig", ArrayType(LongType()))]
)
SEEN_BUCKET_N = StructType(
    [
        StructField("band", IntegerType()),
        StructField("bucket", LongType()),
        StructField("n", LongType()),
    ]
)


class IncrementalNearDeduper:
    """Cross-batch NEAR-duplicate dedup (MinHash-LSH) on the StateStore
    LSM. Where :class:`IncrementalDeduper` drops exact re-crawls, this
    drops documents whose estimated Jaccard against ANY previously
    admitted document reaches ``threshold`` — the continuously-ingesting
    form of ``minhash_lsh_pairs``, probing O(batch) state instead of
    re-pairing the accumulated corpus.

    Persisted state, all on the crawl's bucketed LSM (atomic round
    commits, resumable from ``checkpoint_dir`` on either backend):

    * ``seen_bands`` (band, bucket, doc_id), bucketed on (band, bucket):
      the LSH index of every admitted doc. A new batch's band keys join it
      co-partitioned — the base side never re-shuffles.
    * ``seen_sigs`` (doc_id, sig), bucketed on doc_id: admitted signatures,
      so cross-batch candidates verify by lane agreement WITHOUT re-reading
      any historical text (at 100 TB the old corpus may be cold storage).
    * ``seen_bucket_n`` (band, bucket, n), bucketed on (band, bucket):
      per-round occupancy deltas. Probes pre-join the batch's distinct
      buckets against it (sum over the handful of matched delta rows) and
      SKIP buckets whose pre-batch occupancy exceeds ``max_bucket_size``
      — the mega-bucket guard applied BEFORE the fan-out join, so a
      boilerplate bucket never explodes the candidate shuffle no matter
      how many batches fed it. ``on_drop`` hears the skipped-bucket count.

    Batch admission rule (mirrored exactly by the pure-python golden
    oracle in tools/make_golden.py):

    0. a doc_id admitted by ANY earlier round drops unconditionally (the
       id guard — exact re-crawls and crash-replayed micro-batches never
       duplicate LSM state, independent of the occupancy cap);
    1. within the batch, verified LSH pairs (a < b) drop every ``b``
       (greedy first-wins, same rule as the one-shot operator);
    2. any batch doc with a verified match against an admitted doc drops;
    3. survivors' band keys, signatures, and bucket-count deltas append as
       one atomic round.
    """

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str | None = None,
        partitions: int | None = None,
        num_hashes: int = 32,
        bands: int = 8,
        k: int = 3,
        threshold: float = 0.8,
        max_bucket_size: int = 256,
        merge_every: int = 4,
        on_drop=None,
    ):
        self.spark = spark
        self.num_hashes, self.bands, self.k = num_hashes, bands, k
        self.threshold, self.max_bucket_size = threshold, max_bucket_size
        self.on_drop = on_drop
        if partitions is None:
            partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
        bucket_spec = lambda keys: {  # noqa: E731
            "keys": keys, "partitions": partitions, "merge_every": merge_every,
        }
        self.store = make_state_store(
            spark,
            {
                "seen_bands": SEEN_BANDS,
                "seen_sigs": SEEN_SIGS,
                "seen_bucket_n": SEEN_BUCKET_N,
            },
            checkpoint_dir,
            bucketed={
                "seen_bands": bucket_spec(("band", "bucket")),
                "seen_sigs": bucket_spec(("doc_id",)),
                "seen_bucket_n": bucket_spec(("band", "bucket")),
            },
        )
        self.round = self.store.completed_round + 1

    def _parts(self, name: str):
        base, tail = self.store.get_parts(name)
        return [p for p in (base, tail) if p is not None]

    def _est(self, sig_a, sig_b):
        return F.size(
            F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda m: m)
        ) / F.lit(float(self.num_hashes))

    def dedupe_batch(
        self, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        """Admit the batch's near-dup survivors and commit their LSH state
        as one atomic round; returns the surviving input rows."""
        from pyspark.sql import Window

        from colly_spark.functions.dedup import band_keys, minhash_signature

        batch = docs.withColumnRenamed(id_col, "doc_id") if id_col != "doc_id" else docs
        # id guard FIRST: a doc_id admitted by any earlier round never
        # re-enters (exact re-crawls and crash-replayed micro-batches drop
        # here unconditionally — the occupancy cap below skips saturated
        # buckets, so without this guard a replayed doc in a saturated
        # bucket would re-admit and duplicate LSM state). seen_sigs is
        # bucketed on doc_id: the base side joins co-partitioned.
        for part in self._parts("seen_sigs"):
            batch = batch.join(part.select("doc_id"), "doc_id", "left_anti")
        sigs = minhash_signature(
            batch, text_col, self.num_hashes, self.k
        ).localCheckpoint(eager=True)
        bk = band_keys(sigs, self.num_hashes, self.bands)

        # ---- intra-batch pairs (capped buckets, same as the one-shot op)
        wb = Window.partitionBy("band", "bucket")
        sized = bk.withColumn("__n", F.count(F.lit(1)).over(wb))
        bk_in = sized.where(F.col("__n") <= self.max_bucket_size).drop("__n")
        cand_in = (
            bk_in.alias("l")
            .join(
                bk_in.alias("r"),
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l.doc_id") < F.col("r.doc_id")),
            )
            .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
            .dropDuplicates(["a", "b"])
        )
        sa = sigs.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a"))
        sb = sigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b"))
        losers_in = (
            cand_in.join(sa, "a").join(sb, "b")
            .where(self._est(F.col("sig_a"), F.col("sig_b")) >= self.threshold)
            .select(F.col("b").alias("doc_id"))
            .distinct()
        )

        # ---- cross-batch: occupancy gate BEFORE the fan-out join
        probe_keys = bk.select("band", "bucket").distinct()
        occ_parts = self._parts("seen_bucket_n")
        skipped = None
        if occ_parts:
            occ = occ_parts[0]
            for p in occ_parts[1:]:
                occ = occ.unionByName(p)
            occ = probe_keys.join(occ, ["band", "bucket"]).groupBy(
                "band", "bucket"
            ).agg(F.sum("n").alias("n"))
            over = occ.where(F.col("n") > self.max_bucket_size)
            if self.on_drop is not None:
                skipped = over.count()
            probe_keys = probe_keys.join(over, ["band", "bucket"], "left_anti")
        losers_x = None
        sig_parts = self._parts("seen_sigs")
        osig = None
        if sig_parts:
            osig = sig_parts[0]
            for p in sig_parts[1:]:
                osig = osig.unionByName(p)
            osig = osig.select(
                F.col("doc_id").alias("old_id"), F.col("sig").alias("sig_o")
            )
        for part in self._parts("seen_bands"):
            old = part.join(probe_keys, ["band", "bucket"]).select(
                "band", "bucket", F.col("doc_id").alias("old_id")
            )
            cand = (
                bk.join(old, ["band", "bucket"])
                .select("doc_id", "old_id")
                .dropDuplicates(["doc_id", "old_id"])
            )
            matched = (
                cand.join(sigs, "doc_id")
                .join(osig, "old_id")
                .where(self._est(F.col("sig"), F.col("sig_o")) >= self.threshold)
                .select("doc_id")
                .distinct()
            )
            losers_x = matched if losers_x is None else losers_x.unionByName(matched)
        if skipped is not None:
            self.on_drop(skipped)

        losers = losers_in if losers_x is None else losers_in.unionByName(
            losers_x
        ).distinct()
        fresh = batch.join(losers, "doc_id", "left_anti").localCheckpoint(eager=True)

        # ---- admit survivors as one atomic round
        keep_ids = fresh.select("doc_id")
        new_keys = bk.join(keep_ids, "doc_id")
        self.store.stage_append("seen_bands", new_keys, self.round)
        self.store.stage_append("seen_sigs", sigs.join(keep_ids, "doc_id"), self.round)
        self.store.stage_append(
            "seen_bucket_n",
            new_keys.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n")),
            self.round,
        )
        self.store.compact(["seen_bands", "seen_sigs", "seen_bucket_n"])
        self.store.commit_round(self.round, {"batches": self.round + 1})
        self.round += 1
        return fresh if id_col == "doc_id" else fresh.withColumnRenamed("doc_id", id_col)

    def seen_count(self) -> int:
        """Documents admitted across all committed batches."""
        return self.store.get("seen_sigs").count()
