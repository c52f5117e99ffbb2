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
    d = IncrementalDeduper(spark, merge_every=2)
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
    d1 = IncrementalDeduper(spark, checkpoint_dir=path)
    d1.dedupe_batch(_docs(spark, [(1, "alpha"), (2, "beta")]))
    del d1
    d2 = IncrementalDeduper(spark, checkpoint_dir=path)
    assert d2.round == 1
    out = {
        r["doc_id"]
        for r in d2.dedupe_batch(
            _docs(spark, [(5, "beta"), (6, "omega")])
        ).collect()
    }
    assert out == {6}
    assert d2.seen_count() == 3


def test_incremental_first_wins_with_literal_duplicates(spark):
    """A batch carrying literal duplicate (id, text) rows still admits
    exactly ONE row per fingerprint (window rank, not a keys join-back
    that would readmit every copy of the winning key), and NULL text
    dedups like empty text instead of slipping past the anti-join."""
    d = IncrementalDeduper(spark)
    b1 = d.dedupe_batch(
        _docs(spark, [(1, "alpha"), (1, "alpha"), (2, "beta"), (3, None)])
    )
    rows = [(r["doc_id"], r["text"]) for r in b1.collect()]
    assert sorted(rows) == [(1, "alpha"), (2, "beta"), (3, None)]
    assert d.seen_count() == 3
    # NULL text fingerprints as empty: a later empty-text doc is a dup
    b2 = d.dedupe_batch(_docs(spark, [(9, ""), (10, "gamma")]))
    assert {r["doc_id"] for r in b2.collect()} == {10}


def test_incremental_probe_never_reshuffles_base(spark):
    """After the tail folds into the base (merge_every=1), the OPERATOR'S
    OWN admission plan (admit_plan — exactly what dedupe_batch
    checkpoints) must re-shuffle NEITHER side: the probe arrives already
    hash-partitioned on __fp from the first-wins window, the base's
    partitioning survives its checkpoint, and (with broadcast off) the
    anti-join adds ZERO Exchanges over the no-base plan — the whole
    admission costs exactly one shuffle (the window) regardless of
    accumulated corpus size."""
    d = IncrementalDeduper(spark, merge_every=1)
    d.dedupe_batch(_docs(spark, [(i, f"doc number {i}") for i in range(200)]))
    base, tail = d.store.get_parts("seen_fps")
    assert base is not None and tail is None
    batch = _docs(spark, [(1000 + i, f"new doc {i}") for i in range(50)])
    empty = IncrementalDeduper(spark)  # no base, no tail

    def final_plan(dd):
        out = dd.admit_plan(batch)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        return plan.split("== Initial Plan ==")[0]

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with_base = final_plan(d)
        without_base = final_plan(empty)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "LeftAnti" in with_base, with_base
    n_with, n_without = with_base.count("Exchange"), without_base.count("Exchange")
    assert n_with == n_without == 1, (
        f"extra shuffle appeared ({n_with} vs {n_without}):\n{with_base}"
    )


NEAR_A = "the quick brown fox jumps over the lazy dog near the old barn"
NEAR_A2 = "the quick brown fox jumps over the lazy cat near the old barn"
OTHER1 = "completely different content about spark shuffles and partitions here"
OTHER2 = "another unrelated document regarding bloom filters and politeness"


def test_incremental_neardup_across_batches(spark):
    """Batch 1 drops intra-batch near-dups (greedy first-wins: the higher
    id of each verified pair); batch 2 drops docs near-duplicating ANY
    admitted doc — including exact re-crawls — and admits the rest."""
    from colly_spark.functions.incremental import IncrementalNearDeduper

    d = IncrementalNearDeduper(spark, bands=16, threshold=0.5, merge_every=2)
    b1 = d.dedupe_batch(
        _docs(spark, [(0, NEAR_A), (1, NEAR_A2), (2, OTHER1)])
    )
    assert {r["doc_id"] for r in b1.collect()} == {0, 2}  # 1 near-dups 0
    b2 = d.dedupe_batch(
        _docs(spark, [(10, NEAR_A), (11, NEAR_A2), (12, OTHER2)])
    )
    # 10 = exact re-crawl of admitted 0; 11 near-dups admitted 0
    assert {r["doc_id"] for r in b2.collect()} == {12}
    assert d.seen_count() == 3


@pytest.mark.parametrize("backend", ["nd", "nd.db"])
def test_incremental_neardup_resume(spark, tmp_path, backend):
    """The LSH index (bands + signatures + occupancy) survives a process
    restart on both durable backends: a resumed deduper still recognizes
    near-dups of docs admitted before the restart."""
    from colly_spark.functions.incremental import IncrementalNearDeduper

    path = str(tmp_path / backend)
    d1 = IncrementalNearDeduper(spark, checkpoint_dir=path, bands=16, threshold=0.5)
    d1.dedupe_batch(_docs(spark, [(0, NEAR_A), (2, OTHER1)]))
    del d1
    d2 = IncrementalNearDeduper(spark, checkpoint_dir=path, bands=16, threshold=0.5)
    assert d2.round == 1
    out = {
        r["doc_id"]
        for r in d2.dedupe_batch(
            _docs(spark, [(10, NEAR_A2), (12, OTHER2)])
        ).collect()
    }
    assert out == {12}
    assert d2.seen_count() == 3


def test_incremental_neardup_occupancy_gate(spark):
    """Buckets whose PRE-batch occupancy exceeds max_bucket_size are
    skipped before the fan-out join (on_drop hears the count), so a
    boilerplate bucket fed by many batches never explodes a probe.
    threshold > 1 admits everything, growing one bucket past the cap."""
    from colly_spark.functions.incremental import IncrementalNearDeduper

    drops = []
    d = IncrementalNearDeduper(
        spark, threshold=1.01, max_bucket_size=2, on_drop=drops.append
    )
    d.dedupe_batch(_docs(spark, [(i, NEAR_A) for i in range(3)]))
    assert d.seen_count() == 3  # nothing verifies at threshold 1.01
    b2 = d.dedupe_batch(_docs(spark, [(10, NEAR_A)]))
    assert {r["doc_id"] for r in b2.collect()} == {10}
    assert drops and drops[-1] >= 1  # the saturated buckets were skipped
