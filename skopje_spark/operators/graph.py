"""Distributed graph primitives: star-contraction connected components.

The near-dup clustering surface (`operators/dedup.py:neardup_clusters`)
uses min-label propagation, whose round count equals the graph
diameter. That is fine for shallow near-dup graphs, but a 100 TB corpus
can contain long duplication chains (A≈B≈C≈…), and diameter-many
shuffles is the wrong asymptotic. This module implements the
**large-star / small-star alternation** (Kiveris et al., *Connected
Components in MapReduce and Beyond*, SoCC'14), which converges in
O(log² n) rounds regardless of diameter, using only groupBy/join
primitives — every round is embarrassingly parallel and
shuffle-bounded by the current edge count, which shrinks monotonically
toward one star per component.

Reference parity note: the reference engine (Vostanis/skopje) has no
graph operator at all — it delegates relational SQL to Postgres
(src/etl.rs) and ships no recursive/iterative surface. This module is
part of the §2C LLM-data extension inventory (near-dup clustering at
scale), not a literal port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    """Cheap convergence check: (edge count, xor-ish hash sum).

    One action per round over a map-side-combinable aggregate — the
    driver never sees the edges themselves, only two longs.
    """
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor, not sum: xxhash64 spans the full long range and a
        # long-sum would overflow (an error under Spark 4's ANSI mode)
        F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
    ).first()
    return (row["n"], row["h"] if row["h"] is not None else 0)


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ⁺(u)).

    Operates on the bidirectional edge list; emits (v, m) for each
    neighbor v > u, where m = min over u's closed neighborhood. One
    groupBy (map-side min) + one re-join-free window-less pass: the
    min is attached via a groupBy + join on the grouping key, which
    Spark plans as a single shuffle reused by both sides under AQE.
    """
    nbr_min = edges.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        edges.join(nbr_min, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor ≤ u (and u itself) to min(Γ⁻(u) ∪ {u}).

    Input edges are first directed high→low; for each center u the
    strictly-smaller neighborhood plus u itself is re-pointed at its
    minimum, turning shallow trees into stars.
    """
    directed = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    nbr_min = directed.groupBy("src").agg(F.min("dst").alias("m"))
    re_pointed = directed.join(nbr_min, "src").select(
        F.col("dst").alias("src"), F.col("m").alias("dst")
    )
    center = nbr_min.select(F.col("src"), F.col("m").alias("dst"))
    return (
        re_pointed.unionByName(center)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components_star(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components via large-star/small-star alternation →
    (doc_id, cluster_id) with cluster_id = min node id in the component
    — same output contract as ``dedup.neardup_clusters``, different
    asymptotics (O(log² n) rounds vs O(diameter)).

    Each round: one large-star pass + one small-star pass (two
    shuffles), then a two-long fingerprint action to detect the
    fixpoint. ``localCheckpoint`` truncates the lineage every round so
    the plan stays O(1) deep — without it, iterative DataFrame
    algorithms compile ever-growing DAGs and stall the driver long
    before the executors are busy.

    At the fixpoint the edge set is exactly the star assignment
    (node → component minimum); isolated input nodes (present in
    ``pairs`` but never re-pointed) keep themselves as cluster id.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    # bidirectional for the first large-star pass
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)

    prev = _fingerprint(edges)
    for _ in range(max_iterations):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _fingerprint(edges)
        if cur == prev:
            break
        prev = cur
        # re-bidirect for the next large-star pass
        edges = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )

    # stars point node → min; strip any residual upward duplicates and
    # label isolated nodes with themselves
    stars = (
        edges.select(
            F.greatest("src", "dst").alias("id"), F.least("src", "dst").alias("m")
        )
        .groupBy("id")
        .agg(F.min("m").alias("cluster_id"))
    )
    return nodes.join(stars, "id", "left").select(
        F.col("id").alias("doc_id"),
        F.coalesce("cluster_id", "id").alias("cluster_id"),
    )
