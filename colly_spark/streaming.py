"""Structured Streaming ingestion for the corpus-preparation operators.

The CRAWL is deliberately batch-iterative (SURVEY.md: the frontier is a
fixpoint loop whose rounds commit atomically — micro-batch triggers add
nothing and break the round-commit contract). What IS a stream is the
pipeline DOWNSTREAM of the crawl: results land on storage continuously,
and the training-data operators should consume them incrementally rather
than re-scanning the accumulated corpus. This module is that bridge:

* :func:`stream_documents` — a file-source stream over a directory of
  parquet drops (the shape a crawl's results sink produces). At cluster
  scale the same code reads a cloud-storage prefix; Spark's file source
  tracks processed files in its own checkpoint, so restarts resume
  exactly once.
* :func:`dedup_stream` — ``foreachBatch`` into
  :class:`~colly_spark.functions.incremental.IncrementalDeduper` /
  ``IncrementalNearDeduper``: every micro-batch admits only first-seen
  (or first-similar-seen) rows against the LSM state, which carries its
  OWN atomic round commits — the two checkpoint mechanisms compose, and
  a crash replays at most one micro-batch, and replay is idempotent on
  the LSM state: if the round had committed, every replayed row matches
  its own admitted fingerprint and is dropped — nothing double-admits;
  if it hadn't, the replay is the first admission.
* :func:`window_stats` — an event-time windowed rollup (docs + tokens
  per window) with a watermark, the standard late-data-tolerant
  monitoring aggregation for an ingest stream.

Everything here is driven end-to-end by tests/test_streaming.py with
``trigger(availableNow=True)`` — deterministic micro-batching, no sleeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from colly_spark.functions.text import token_count

DOCS_SCHEMA = "doc_id long, text string"


def stream_documents(
    spark: SparkSession, path: str, schema: str = DOCS_SCHEMA
) -> DataFrame:
    """File-source document stream over a directory of parquet drops.

    ``maxFilesPerTrigger`` is left to the caller via ``.option`` if
    needed; the default processes whatever is new per trigger. The
    schema must be supplied (streaming file sources cannot infer)."""
    return spark.readStream.schema(schema).parquet(path)


def dedup_stream(
    stream: DataFrame,
    deduper,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Wire a document stream through an incremental LSM deduper.

    Returns an un-started ``DataStreamWriter``; callers pick the trigger
    (tests use ``availableNow``) and call ``.start()``. Each micro-batch
    runs one ``dedupe_batch`` — one atomic LSM round per micro-batch, so
    the deduper's own resume contract (committed rounds only) lines up
    with the stream's replay unit."""

    def _admit(df: DataFrame, epoch_id: int) -> None:
        deduper.dedupe_batch(df, text_col=text_col, id_col=id_col)

    return (
        stream.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def window_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    text_col: str = "text",
) -> DataFrame:
    """Event-time windowed ingest rollup: documents and tokens per
    window, tolerant of ``watermark`` of late data. Append-mode safe —
    a window emits once its watermark passes, so a downstream parquet
    sink receives each window exactly once."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col(text_col))).alias("n_tokens"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_docs",
            "n_tokens",
        )
    )
