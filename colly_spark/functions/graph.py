"""Link-graph analytics over crawl output (PageRank).

A frontier scheduler at 10^10 URLs prioritizes by link authority; the
crawl engine already materializes the edge list (every frontier row
carries ``parent_url`` -> ``url``). :func:`pagerank` is the classic
power-iteration as pure DataFrame ops — per iteration one edges-to-ranks
join and one destination-key aggregation (two shuffles), with dangling
mass (nodes without out-links) redistributed uniformly, the standard
formulation:

    r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/deg(u) + dangling_mass/N)

Scale notes: the edge list persists hash-partitioned on ``src`` and every
iteration's join reuses that partitioning (ranks reshuffle, edges do
not); lineage truncates via localCheckpoint every few iterations so the
plan stays bounded; convergence for scheduling purposes needs ~10
iterations, not machine-epsilon fixpoints (fixed iteration count keeps
the result deterministic and oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 8,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 4,
) -> DataFrame:
    """(node, rank) after ``iterations`` power iterations over the edge
    list. Nodes are the distinct union of both endpoint columns; parallel
    edges count once per occurrence (a page linking twice passes twice
    the mass, matching out-degree by edge count). Ranks sum to 1."""
    # eager localCheckpoint, not persist: both frames are read every
    # iteration, but a persist() could never be unpersisted (the caller
    # only sees the final ranks frame) and would leak cached blocks across
    # calls in a long session; checkpoint blocks release when the frames
    # are garbage-collected (the minhash-signature treatment)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_row = nodes.agg(F.count(F.lit(1)).alias("__n"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    ranks = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for it in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select("dst", (F.col("rank") / F.col("__deg")).alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("__in"))
        )
        # dangling mass = total rank sitting on nodes with no out-edges
        dangling = (
            ranks.join(deg.select("src"), ranks.node == F.col("src"), "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .crossJoin(F.broadcast(n_row))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("__n")
                    + damping
                    * (F.coalesce(F.col("__in"), F.lit(0.0))
                       + F.col("__dm") / F.col("__n"))
                ).alias("rank"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
