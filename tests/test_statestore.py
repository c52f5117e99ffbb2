"""Bucketed (base/tail) url_seen store: correctness of the LSM-shaped
maintenance and the scale property it exists for — the per-round seen probe
must never re-shuffle or re-sort the big base side (VERDICT r2 item 2: the
per-round full-table distinct+shuffle was the one true 10^10 cliff left).

Round 4: the same properties hold in DISK (checkpoint) mode — round-delta
parquet dirs are the durable format, the partitioned base lives in memory
during the run, one repartition at resume (VERDICT r3 item 2) — so most
tests parameterize over both modes."""

import pytest
from pyspark.sql import functions as F

from colly_spark import schemas
from colly_spark.engine import seen_probe
from colly_spark.statestore import SqliteStateStore, StateStore, make_state_store

BUCKETED = {
    "url_seen": {"keys": ("domain_hash", "url_hash"), "partitions": 8, "merge_every": 2}
}


def _store(spark, merge_every=2, checkpoint_dir=None):
    spec = {k: dict(v, merge_every=merge_every) for k, v in BUCKETED.items()}
    return make_state_store(
        spark, {"url_seen": schemas.URL_SEEN}, checkpoint_dir=checkpoint_dir,
        bucketed=spec,
    )


@pytest.fixture(params=["memory", "disk", "sqlite"])
def mode_dir(request, tmp_path):
    if request.param == "memory":
        return None
    suffix = "ckpt" if request.param == "disk" else "ckpt.db"
    return str(tmp_path / suffix)


def test_factory_dispatch(spark, tmp_path):
    parquet = make_state_store(spark, {"url_seen": schemas.URL_SEEN},
                               str(tmp_path / "tree"))
    lite = make_state_store(spark, {"url_seen": schemas.URL_SEEN},
                            str(tmp_path / "state.db"))
    assert type(parquet) is StateStore
    assert type(lite) is SqliteStateStore


def _rows(spark, pairs, rnd=0):
    return spark.createDataFrame(
        [(h, d, rnd) for d, h in pairs], schema=schemas.URL_SEEN
    )


def test_base_tail_union_equals_appends(spark, mode_dir):
    # the engine's canonical per-round protocol: stage -> compact -> commit
    # (disk mode defers the durable delta write to the commit batch)
    st = _store(spark, merge_every=2, checkpoint_dir=mode_dir)
    seen = set()
    for rnd in range(5):
        pairs = [(rnd % 3, 100 * rnd + i) for i in range(4)]
        seen.update(pairs)
        st.stage_append("url_seen", _rows(spark, pairs, rnd), rnd)
        st.compact(["url_seen"])
        st.commit_round(rnd, {})
        got = {
            (r["domain_hash"], r["url_hash"]) for r in st.get("url_seen").collect()
        }
        assert got == seen, f"round {rnd}: union of base+tail drifted"
    # after 5 rounds with merge_every=2 the base exists and holds most rows
    base, tail = st.get_parts("url_seen")
    assert base is not None
    assert base.count() + (tail.count() if tail is not None else 0) == len(seen)


def test_pending_visible_before_compact(spark, mode_dir):
    # the hop-conflict probe reads marks staged earlier in the SAME round
    st = _store(spark, checkpoint_dir=mode_dir)
    st.stage_append("url_seen", _rows(spark, [(1, 11)], 0), 0)
    assert st.get("url_seen").count() == 1
    base, tail = st.get_parts("url_seen")
    assert base is None and tail is not None and tail.count() == 1


def test_base_join_has_no_base_exchange(spark, mode_dir):
    """The reason the base exists: a probe join re-shuffles ONLY the probe
    side. The base's hash-partitioning + sort survive its checkpoint, so the
    final plan contains exactly one Exchange (probe) and no Sort above the
    base scan."""
    st = _store(spark, merge_every=1, checkpoint_dir=mode_dir)
    st.stage_append(
        "url_seen",
        _rows(spark, [(d, 1000 * d + i) for d in range(8) for i in range(500)], 0),
        0,
    )
    st.compact(["url_seen"])  # memory: merge_every=1 folds straight into base
    st.commit_round(0, {})  # disk: the deferred delta becomes a durable tail
    st.compact(["url_seen"])  # disk: the committed tail folds into the base
    base, tail = st.get_parts("url_seen")
    assert base is not None and tail is None

    probe = spark.range(100).select(
        (F.col("id") % 8).cast("int").alias("__dh"),
        (F.col("id") * 37).alias("url_hash"),
    )
    # forbid broadcast so the plan must co-partition (the 10^10 shape)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = seen_probe(probe, base, None)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1, f"base side re-shuffled:\n{final}"
    # the base side arrives sorted; only the probe side needs a Sort
    assert final.count("Sort ") <= 1, f"base side re-sorted:\n{final}"


@pytest.mark.parametrize("backend", ["ckpt", "ckpt.db"])
def test_disk_resume_reestablishes_base_partitioning(spark, tmp_path, backend):
    """A resumed store pays ONE repartition at load, then probes join with
    no base-side exchange — the round-3 cliff (flat round=* union re-
    shuffled per round on the resumable path) stays gone across restarts,
    on BOTH durable backends. A second resume must also read each row
    exactly once (the durable base rewrite retires the segments it
    merged)."""
    ckpt = str(tmp_path / backend)
    rows = [(d, 1000 * d + i) for d in range(8) for i in range(200)]
    st = _store(spark, merge_every=1, checkpoint_dir=ckpt)
    st.stage_append("url_seen", _rows(spark, rows, 0), 0)
    st.compact(["url_seen"])
    st.commit_round(0, {})

    st2 = _store(spark, merge_every=1, checkpoint_dir=ckpt)
    base, tail = st2.get_parts("url_seen")
    assert base is not None and tail is None
    assert base.count() == len(rows)
    probe = spark.range(64).select(
        (F.col("id") % 8).cast("int").alias("__dh"),
        (F.col("id") * 37).alias("url_hash"),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = seen_probe(probe, base, None)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1, f"resumed base re-shuffled:\n{final}"

    # append + merge after resume, commit, resume again: exactly-once rows
    st2.stage_append("url_seen", _rows(spark, [(3, 77)], 1), 1)
    st2.compact(["url_seen"])  # delta still staged (write deferred)
    st2.commit_round(1, {})  # delta durable as a tail segment
    st2.compact(["url_seen"])  # merge_every=1 -> durable base rewrite staged
    st2.commit_round(2, {})  # manifest commit retires superseded segments
    st3 = _store(spark, merge_every=1, checkpoint_dir=ckpt)
    assert st3.get("url_seen").count() == len(rows) + 1


def test_disk_appends_deferred_to_commit(spark, tmp_path):
    """stage_append is lazy in disk mode: no durable segment exists until
    commit_round writes the round's deltas as one concurrent batch (the
    eager per-append parquet write was ~8-10 serial driver barriers per
    round). Reads within the round still see the staged rows; a crash
    before the commit loses only the uncommitted round, as before."""
    import os

    ckpt = str(tmp_path / "ckpt")
    st = make_state_store(
        spark,
        {"url_seen": schemas.URL_SEEN, "visits2": schemas.URL_SEEN},
        checkpoint_dir=ckpt,
        bucketed=BUCKETED,
    )
    st.stage_append("url_seen", _rows(spark, [(1, 11)], 0), 0)
    st.stage_append("visits2", _rows(spark, [(2, 22)], 0), 0)
    assert st.get("url_seen").count() == 1  # staged rows visible in-round
    assert not os.path.isdir(os.path.join(ckpt, "url_seen"))
    assert not os.path.isdir(os.path.join(ckpt, "visits2"))
    # crash before commit: a fresh store sees nothing
    st_crash = make_state_store(
        spark, {"url_seen": schemas.URL_SEEN}, checkpoint_dir=ckpt,
        bucketed=BUCKETED,
    )
    assert st_crash.get("url_seen").count() == 0
    st.commit_round(0, {})
    assert os.listdir(os.path.join(ckpt, "url_seen")) == ["round=0__s0"]
    assert os.listdir(os.path.join(ckpt, "visits2")) == ["round=0__s0"]
    st2 = make_state_store(
        spark,
        {"url_seen": schemas.URL_SEEN, "visits2": schemas.URL_SEEN},
        checkpoint_dir=ckpt,
        bucketed=BUCKETED,
    )
    assert st2.get("url_seen").count() == 1
    assert st2.get("visits2").count() == 1


def test_probe_flag_correct_across_base_and_tail(spark, mode_dir):
    st = _store(spark, merge_every=2, checkpoint_dir=mode_dir)
    st.stage_append("url_seen", _rows(spark, [(0, 1), (1, 2)], 0), 0)
    st.compact(["url_seen"])
    st.commit_round(0, {})  # disk: deferred delta becomes the durable tail
    st.compact(["url_seen"])  # second compact triggers the merge -> base
    st.stage_append("url_seen", _rows(spark, [(2, 3)], 1), 1)  # tail-pending
    base, tail = st.get_parts("url_seen")
    assert base is not None and tail is not None
    probe = spark.createDataFrame([(0, 1), (2, 3), (5, 99)], "a int, b long").select(
        F.col("a").alias("__dh"), F.col("b").alias("url_hash")
    )
    got = {
        (r["__dh"], r["url_hash"]): r["__seen_prev"]
        for r in seen_probe(probe, base, tail).collect()
    }
    assert got == {(0, 1): True, (2, 3): True, (5, 99): False}


def test_sqlite_segment_row_cap_guard(spark, tmp_path, monkeypatch):
    """The sqlite backend transits rows through the driver: a segment over
    the configured cap must fail LOUDLY at write time, not OOM
    (COLLY_SQLITE_MAX_SEGMENT_ROWS; VERDICT r4 item 8)."""
    monkeypatch.setenv("COLLY_SQLITE_MAX_SEGMENT_ROWS", "5")
    st = _store(spark, checkpoint_dir=str(tmp_path / "cap.db"))
    st.stage_append("url_seen", _rows(spark, [(i, i * 11) for i in range(9)]), 0)
    with pytest.raises(RuntimeError, match="exceeds 5 rows"):
        st.commit_round(0, {})
    # under the cap the same protocol commits and round-trips
    monkeypatch.setenv("COLLY_SQLITE_MAX_SEGMENT_ROWS", "100")
    st2 = _store(spark, checkpoint_dir=str(tmp_path / "ok.db"))
    st2.stage_append("url_seen", _rows(spark, [(i, i * 11) for i in range(9)]), 0)
    st2.commit_round(0, {})
    st3 = _store(spark, checkpoint_dir=str(tmp_path / "ok.db"))
    assert st3.get("url_seen").count() == 9


def test_compact_lazy_then_count_materializes(spark):
    """compact(eager=False) marks the checkpoint without a job; the
    caller's following count (full-scan) materializes it, contents equal
    to the eager path and lineage truncated (no source scan in the plan)."""
    st = make_state_store(spark, {"url_seen": schemas.URL_SEEN}, None)
    st.replace("url_seen", _rows(spark, [(7, 1), (9, 2)]), 0)
    st.compact(["url_seen"], eager=False)
    tbl = st.get("url_seen")
    assert tbl.count() == 2  # materializing action
    got = {(r["domain_hash"], r["url_hash"]) for r in tbl.collect()}
    assert got == {(7, 1), (9, 2)}
    # lineage truncated: the materialized checkpoint scans RDD blocks,
    # not the original LocalTableScan
    plan = tbl._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan or "LocalTableScan" not in plan
