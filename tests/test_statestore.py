"""Bucketed (base/tail) url_seen store: correctness of the LSM-shaped
maintenance and the scale property it exists for — the per-round seen probe
must never re-shuffle or re-sort the big base side (VERDICT r2 item 2: the
per-round full-table distinct+shuffle was the one true 10^10 cliff left)."""

import pytest
from pyspark.sql import functions as F

from colly_spark import schemas
from colly_spark.engine import seen_probe
from colly_spark.statestore import StateStore

BUCKETED = {
    "url_seen": {"keys": ("domain_hash", "url_hash"), "partitions": 8, "merge_every": 2}
}


def _store(spark, merge_every=2):
    spec = {k: dict(v, merge_every=merge_every) for k, v in BUCKETED.items()}
    return StateStore(spark, {"url_seen": schemas.URL_SEEN}, bucketed=spec)


def _rows(spark, pairs, rnd=0):
    return spark.createDataFrame(
        [(h, d, rnd) for d, h in pairs], schema=schemas.URL_SEEN
    )


def test_base_tail_union_equals_appends(spark):
    st = _store(spark, merge_every=2)
    seen = set()
    for rnd in range(5):
        pairs = [(rnd % 3, 100 * rnd + i) for i in range(4)]
        seen.update(pairs)
        st.stage_append("url_seen", _rows(spark, pairs, rnd), rnd)
        st.compact(["url_seen"])
        got = {
            (r["domain_hash"], r["url_hash"]) for r in st.get("url_seen").collect()
        }
        assert got == seen, f"round {rnd}: union of base+tail drifted"
    # after 5 rounds with merge_every=2 the base exists and holds most rows
    base, tail = st.get_parts("url_seen")
    assert base is not None
    assert base.count() + (tail.count() if tail is not None else 0) == len(seen)


def test_pending_visible_before_compact(spark):
    # the hop-conflict probe reads marks staged earlier in the SAME round
    st = _store(spark)
    st.stage_append("url_seen", _rows(spark, [(1, 11)], 0), 0)
    assert st.get("url_seen").count() == 1
    base, tail = st.get_parts("url_seen")
    assert base is None and tail is not None and tail.count() == 1


def test_base_join_has_no_base_exchange(spark):
    """The reason the base exists: a probe join re-shuffles ONLY the probe
    side. The base's hash-partitioning + sort survive its checkpoint, so the
    final plan contains exactly one Exchange (probe) and no Sort above the
    base scan."""
    st = _store(spark, merge_every=1)
    st.stage_append(
        "url_seen",
        _rows(spark, [(d, 1000 * d + i) for d in range(8) for i in range(500)], 0),
        0,
    )
    st.compact(["url_seen"])  # merge_every=1 -> folds straight into base
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


def test_probe_flag_correct_across_base_and_tail(spark):
    st = _store(spark, merge_every=2)
    st.stage_append("url_seen", _rows(spark, [(0, 1), (1, 2)], 0), 0)
    st.compact(["url_seen"])
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
