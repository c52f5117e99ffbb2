"""Incremental cross-batch dedup on the crawl StateStore machinery."""

import pytest
from pyspark.sql import functions as F

from colly_spark.functions.incremental import IncrementalDeduper


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_across_batches(spark):
    """Batch 1 dedupes internally (first-wins by id, normalization
    collapses case/whitespace); batch 2 drops everything batch 1 already
    admitted and admits only genuinely new text."""
    d = IncrementalDeduper(spark, partitions=4, merge_every=2)
    b1 = d.dedupe_batch(
        _docs(spark, [(3, "alpha beta"), (1, "alpha   BETA"), (2, "gamma")])
    )
    got1 = {r["doc_id"] for r in b1.collect()}
    assert got1 == {1, 2}  # 1 beats 3 on the shared fingerprint
    b2 = d.dedupe_batch(
        _docs(spark, [(10, "ALPHA beta"), (11, "gamma"), (12, "delta")])
    )
    got2 = {r["doc_id"] for r in b2.collect()}
    assert got2 == {12}
    assert d.seen_count() == 3


@pytest.mark.parametrize("backend", ["ckpt", "ckpt.db"])
def test_incremental_dedup_resume(spark, tmp_path, backend):
    """A new process pointed at the same checkpoint dir resumes with the
    full committed fingerprint history, on both durable backends."""
    path = str(tmp_path / backend)
    d1 = IncrementalDeduper(spark, checkpoint_dir=path, partitions=4)
    d1.dedupe_batch(_docs(spark, [(1, "alpha"), (2, "beta")]))
    del d1
    d2 = IncrementalDeduper(spark, checkpoint_dir=path, partitions=4)
    assert d2.round == 1
    out = {
        r["doc_id"]
        for r in d2.dedupe_batch(
            _docs(spark, [(5, "beta"), (6, "omega")])
        ).collect()
    }
    assert out == {6}
    assert d2.seen_count() == 3


def test_incremental_probe_never_reshuffles_base(spark):
    """After the tail folds into the base (merge_every=1), a new batch's
    anti-join must re-shuffle ONLY the batch side: with broadcast off, the
    final plan has exactly one Exchange — the url_seen scaling property,
    inherited."""
    d = IncrementalDeduper(spark, partitions=4, merge_every=1)
    d.dedupe_batch(_docs(spark, [(i, f"doc number {i}") for i in range(200)]))
    base, tail = d.store.get_parts("seen_fps")
    assert base is not None and tail is None
    batch = _docs(spark, [(1000 + i, f"new doc {i}") for i in range(50)])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = batch.withColumn(
            "__fp",
            F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")),
        ).join(base.select(F.col("fp").alias("__fp")), "__fp", "left_anti")
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1, f"base side re-shuffled:\n{final}"
