"""Iterative graph analytics on edge DataFrames: fixed-iteration
PageRank.

Companion to the connected-components fixpoint in
``operators/dedup.py`` (neardup_clusters): where that converges a
labeling, this powers importance scoring over a relationship graph —
e.g. ranking suppliers by how central they are to high-degree
customers, or domains by inbound links in a crawl.

Scale shape per iteration: one shuffle to aggregate contributions by
destination (sum is a partial agg — map-side combined), one join of
ranks onto edges on the source key. Ranks are O(nodes) rows, edges
are the big side and are never mutated or re-partitioned; with edges
pre-bucketed by ``src`` every iteration's join is shuffle-free on the
big side. Iterations are FIXED (not run-to-convergence) so the result
is a closed-form composition both engines can reproduce — the DuckDB
oracle chains one CTE per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Requires every node to have out-degree ≥ 1 (undirected graphs:
    emit both directions — then the requirement holds by
    construction and no dangling-mass redistribution term is needed,
    keeping the recurrence exactly
    ``r' = (1-d)/n + d·Σ_in r/outdeg``). Returns ``(node,
    norm_rank)`` with ranks normalized to mean 1 (multiplied by n) so
    magnitudes are scale-free.

    Raises if a dangling node exists: silently wrong ranks are worse
    than a loud contract.
    """
    # materialize the edge list once (same pattern as the clustering
    # fixpoint in operators/dedup.py): it is referenced by the degree
    # count, the dangling check, and every iteration's join — without
    # this, a lazily derived edge list (e.g. a join+distinct) would be
    # recomputed per action and per iteration
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct().localCheckpoint(eager=True)  # reused every iteration
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty graph")
    dangling = nodes.join(
        e.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    ).limit(1).count()
    if dangling:
        raise ValueError(
            "pagerank: graph has nodes with out-degree 0; emit both edge "
            "directions (undirected) or add self-loops before calling"
        )

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            # O(nodes) rows; truncating per-iteration lineage keeps the
            # plan depth constant regardless of iters
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", (F.col("rank") * F.lit(float(n))).alias("norm_rank"))
