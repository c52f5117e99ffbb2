"""Structured Streaming bridge: file-source ingest -> LSM dedupers and
windowed rollups, driven deterministically with availableNow triggers."""

import os

from pyspark.sql import functions as F

from colly_spark import streaming
from colly_spark.functions.incremental import IncrementalDeduper


def _drop(spark, path, rows):
    spark.createDataFrame(rows, streaming.DOCS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_dedup_across_restarts(spark, tmp_path):
    """Two parquet drops consumed by two separate availableNow runs: the
    second run's stream checkpoint skips already-processed files, and the
    deduper's LSM state drops re-crawled text across micro-batches —
    the two resume mechanisms compose."""
    src = str(tmp_path / "drops")
    ckpt_stream = str(tmp_path / "stream_ckpt")
    ckpt_lsm = str(tmp_path / "lsm")
    os.makedirs(src, exist_ok=True)

    _drop(spark, src, [(1, "alpha beta"), (2, "gamma")])
    dd = IncrementalDeduper(spark, checkpoint_dir=ckpt_lsm)
    q = (
        streaming.dedup_stream(
            streaming.stream_documents(spark, src), dd, ckpt_stream
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert dd.seen_count() == 2

    # second drop: one dup of an admitted doc, one genuinely new
    _drop(spark, src, [(10, "ALPHA   beta"), (11, "delta")])
    dd2 = IncrementalDeduper(spark, checkpoint_dir=ckpt_lsm)
    assert dd2.round == dd.round  # resumed with committed history
    q2 = (
        streaming.dedup_stream(
            streaming.stream_documents(spark, src), dd2, ckpt_stream
        )
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert dd2.seen_count() == 3  # 10 deduped against batch-1's 1


def test_stream_window_stats(spark, tmp_path):
    """Windowed ingest rollup: deterministic event times (derived from
    doc_id) land in known 10 s windows; counts and token sums pinned."""
    src = str(tmp_path / "wdrops")
    out = str(tmp_path / "wout")
    ckpt = str(tmp_path / "wckpt")
    rows = [(i, "w " * (i + 1)) for i in range(6)]  # i+1 tokens each
    spark.createDataFrame(rows, streaming.DOCS_SCHEMA).withColumn(
        "ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(
            secs=F.col("doc_id") * 7
        )
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        streaming.DOCS_SCHEMA + ", ts timestamp"
    ).parquet(src)
    q = (
        streaming.window_stats(stream, watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["win_start"].second + r["win_start"].minute * 60: (
            r["n_docs"], r["n_tokens"]
        )
        for r in spark.read.parquet(out).collect()
    }
    # ts = 0,7,14,21,28,35 -> windows [0,10)={0,7}, [10,20)={14},
    # [20,30)={21,28}, [30,40)={35}; tokens are doc_id+1. The final
    # watermark is the max event time (35 s), so append mode flushes
    # only windows that END at or before it — [30,40) is correctly HELD
    # for late data and absent from the sink: the watermark contract.
    assert got == {0: (2, 3), 10: (1, 3), 20: (2, 9)}


def test_stream_neardup_dedup(spark, tmp_path):
    """The NEAR-dup LSM deduper behind the same foreachBatch bridge:
    micro-batch 2 drops a near-copy of a doc admitted by micro-batch 1."""
    from colly_spark.functions.incremental import IncrementalNearDeduper

    src = str(tmp_path / "nd_drops")
    ck = str(tmp_path / "nd_stream")
    lsm = str(tmp_path / "nd_lsm")
    os.makedirs(src, exist_ok=True)
    a = "the quick brown fox jumps over the lazy dog near the old barn"
    a2 = a.replace("dog", "cat")
    other = "completely different content about spark shuffles and partitions"

    _drop(spark, src, [(1, a), (2, other)])
    dd = IncrementalNearDeduper(spark, checkpoint_dir=lsm, bands=16,
                                threshold=0.5)
    q = (
        streaming.dedup_stream(streaming.stream_documents(spark, src), dd, ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert dd.seen_count() == 2

    _drop(spark, src, [(10, a2), (11, "an unrelated late arrival entirely")])
    dd2 = IncrementalNearDeduper(spark, checkpoint_dir=lsm, bands=16,
                                 threshold=0.5)
    q2 = (
        streaming.dedup_stream(streaming.stream_documents(spark, src), dd2, ck)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert dd2.seen_count() == 3  # 10 near-dups admitted 1; 11 admitted
