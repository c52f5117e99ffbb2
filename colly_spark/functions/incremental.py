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
from pyspark.sql.types import StringType, StructField, StructType

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
