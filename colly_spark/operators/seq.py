"""Deterministic global dense sequencing (S1 / F9) — scalable row numbering.

Colly assigns ``Request.ID`` by a serial atomic counter (colly.go:705) and the
queue dispatches strict FIFO (queue/queue.go:160-205). The engine needs the
same *total order* over rows of a distributed DataFrame without funneling the
data through one partition (the classic ``Window.orderBy`` global-row_number
bottleneck) and without ``monotonically_increasing_id`` (partition-layout
dependent, therefore non-deterministic under repartition).

Two-pass scheme (standard scalable zipWithIndex):

1. range-repartition + sort by the (unique) order key — partitions are
   globally ordered,
2. one small job collects per-partition counts of each flag column to the
   driver (bytes per partition, never rows),
3. a ``mapInPandas`` pass assigns ``offset[pid] + local running count``.

The produced indexes depend only on the data's order key, never on partition
layout or task scheduling — identical at local[1] and on 1000 executors.
"""

from __future__ import annotations

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField


def with_ordered_counts(
    df: DataFrame,
    order_cols: list[str],
    flag_cols: list[str],
    num_partitions: int | None = None,
    return_totals: bool = False,
    pins: list | None = None,
):
    """For each flag column ``f`` add ``f + '_before'``: the number of rows
    with that flag set that come strictly before this row in the global
    ``order_cols`` order. ``order_cols`` must be a unique (total-order) key.

    One range shuffle + one tiny collect; no single-partition funnel.

    With ``return_totals`` returns ``(out_df, totals)`` where totals maps
    each flag (plus "__rows") to its global count — the collect pass already
    knows them, so callers never need a separate ``count()`` action.
    """
    if not flag_cols:
        return (df, {}) if return_totals else df
    n = num_partitions or max(df.sparkSession.sparkContext.defaultParallelism, 4)
    sorted_df = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    # the sorted frame is read by the counts pass and the assign pass; the
    # caller owns its release via ``pins`` (otherwise it stays cached until
    # the context GC gets around to it — a real leak in iterative jobs)
    sorted_df = sorted_df.persist()
    if pins is not None:
        pins.append(sorted_df)
    # pass 1: per-partition flag totals (tiny driver collect: one row/partition)
    counts = (
        sorted_df.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(
            F.count(F.lit(1)).alias("__rows"),
            *[F.sum(F.col(c).cast("long")).alias(c) for c in flag_cols],
        )
        .collect()
    )
    per_pid = {r["__pid"]: [r[c] or 0 for c in flag_cols] for r in counts}
    totals = {
        "__rows": sum(r["__rows"] for r in counts),
        **{c: sum(r[c] or 0 for r in counts) for c in flag_cols},
        # per-partition breakdown, free from the same collect — feeds the
        # north rule's per-partition lineage rows without extra jobs
        "__per_pid": {
            r["__pid"]: {"__rows": r["__rows"], **{c: r[c] or 0 for c in flag_cols}}
            for r in counts
        },
    }
    offsets: dict[int, list[int]] = {}
    running = [0] * len(flag_cols)
    for pid in sorted(per_pid):
        offsets[pid] = list(running)
        running = [a + b for a, b in zip(running, per_pid[pid])]

    from pyspark.sql.types import StructType

    out_schema = StructType(
        list(sorted_df.schema.fields)
        + [StructField(c + "_before", LongType()) for c in flag_cols]
    )

    def assign(batches):
        pid = TaskContext.get().partitionId()
        base = list(offsets.get(pid, [0] * len(flag_cols)))
        for pdf in batches:
            for i, c in enumerate(flag_cols):
                flags = pdf[c].fillna(False).astype("int64")
                cum = flags.cumsum() - flags  # exclusive prefix count
                pdf[c + "_before"] = cum + base[i]
                base[i] += int(flags.sum())
            yield pdf

    out = sorted_df.mapInPandas(assign, schema=out_schema)
    return (out, totals) if return_totals else out


def attach_dense_seq(
    df: DataFrame,
    order_cols: list[str],
    flag_col: str,
    seq_col: str,
    base: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``seq_col`` = ``base`` + dense 0-based rank among flagged rows in
    global ``order_cols`` order; NULL for unflagged rows."""
    out = with_ordered_counts(df, order_cols, [flag_col], num_partitions)
    before = F.col(flag_col + "_before")
    return out.withColumn(
        seq_col, F.when(F.col(flag_col), before + F.lit(base)).otherwise(F.lit(None).cast("long"))
    ).drop(flag_col + "_before")
