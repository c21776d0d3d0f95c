"""Incremental sketch-state queries (operators/sketches.py): build
per-slice mergeable states, merge, and verify against exact answers.

Oracle pattern: sketch internals are engine-specific, so each query
emits the EXACT answer (both engines compute it) plus deterministic
deterministic in-band verdict flags (INTEGER 1 — safer to hash
cross-engine than booleans) the oracle asserts too — same recipe as
q_agg_approx_distinct / q_agg_approx_percentile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_state,
    kll_merge,
    kll_quantiles,
    kll_state,
)
from skopje_spark.queries import register
from skopje_spark.tables import load_table


@register(
    "q_sketch_incremental_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp_exact,
           CAST(1 AS INTEGER) AS hll_within_band
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("sketch", "hll", "incremental", "agg"),
)
def q_sketch_incremental_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental distinct maintenance: HLL states built independently
    on two ingestion slices (ship dates before/after a cut — as if
    persisted per load), union-merged, estimated, and verified in-band
    against the exact distinct over the whole table.

    Scale: the merge touches two kilobyte-sized states per key — the
    raw slices are never rescanned. This is how "distinct suppliers
    all-time" stays O(days × keys) instead of O(data) at 100 TB.
    """
    l = load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1996-01-01").cast("timestamp")
    prior = hll_state(l.filter(F.col("l_shipdate") < cut), ["l_returnflag"], "l_suppkey")
    delta = hll_state(l.filter(F.col("l_shipdate") >= cut), ["l_returnflag"], "l_suppkey")
    est = hll_estimate(hll_merge([prior, delta], ["l_returnflag"]))
    exact = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp_exact")
    )
    band = F.greatest(F.lit(3.0), F.lit(0.05) * F.col("n_supp_exact"))
    return exact.join(est, "l_returnflag").select(
        "l_returnflag",
        "n_supp_exact",
        (F.abs(F.col("approx_distinct") - F.col("n_supp_exact")) <= band)
        .cast("int")
        .alias("hll_within_band"),
    )


@register(
    "q_sketch_quantile_merge",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           MAX(CASE WHEN rn = CEIL(0.50 * n) THEN l_extendedprice END) AS p50_exact,
           MAX(CASE WHEN rn = CEIL(0.95 * n) THEN l_extendedprice END) AS p95_exact,
           CAST(1 AS INTEGER) AS p50_in_band,
           CAST(1 AS INTEGER) AS p95_in_band
    FROM ranked GROUP BY l_returnflag
    """,
    tags=("sketch", "kll", "incremental", "agg"),
)
def q_sketch_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental quantile maintenance: KLL states per (group, ship
    month), folded in pinned slice order, quantiles extracted and
    verified inside a ±7% RANK band around the exact order statistics.

    Band sizing: KLL k=200 guarantees ~1.65% rank error at 99%
    confidence, and the sketch is internally coin-flip randomized, so
    the realized error varies run-to-run with no code change. The band
    is ~4.2× the guaranteed bound — at that multiple the normal-tail
    residual failure probability is astronomically small (≪1e-9 per
    verdict; the guarantee itself is the 99%-confidence 1.65% point,
    and observed errors at the fixture scales stay under 1%), so the
    oracle hash cannot realistically flake.

    Scale: per-slice states are fixed-size and the merge is
    O(slices × keys) — the "p95 latency this quarter" query that never
    rescans the quarter. The exact-rank window below is the verifier,
    not the production path.
    """
    from pyspark.sql import Window

    eps = 0.07
    l = load_table(spark, sf_dir, "lineitem")
    st = kll_state(
        l,
        ["l_returnflag"],
        "l_extendedprice",
        slice_col=F.date_trunc("month", F.col("l_shipdate")),
        k=200,
    )
    q = kll_quantiles(kll_merge(st, ["l_returnflag"]), [0.5, 0.95])

    wg = Window.partitionBy("l_returnflag")
    w = wg.orderBy("l_extendedprice")
    ranked = l.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wg).alias("n"),
    )

    def elem(rank_expr):
        return F.max(
            F.when(F.col("rn") == rank_expr, F.col("l_extendedprice"))
        )

    def lo(p):
        return F.greatest(F.lit(1).cast("long"),
                          F.floor(F.lit(p - eps) * F.col("n")))

    def hi(p):
        return F.least(F.col("n"), F.ceil(F.lit(p + eps) * F.col("n")))

    brackets = ranked.groupBy("l_returnflag").agg(
        elem(F.ceil(F.lit(0.50) * F.col("n"))).alias("p50_exact"),
        elem(F.ceil(F.lit(0.95) * F.col("n"))).alias("p95_exact"),
        elem(lo(0.50)).alias("p50_lo"),
        elem(hi(0.50)).alias("p50_hi"),
        elem(lo(0.95)).alias("p95_lo"),
        elem(hi(0.95)).alias("p95_hi"),
    )
    return brackets.join(q, "l_returnflag").select(
        "l_returnflag",
        "p50_exact",
        "p95_exact",
        ((F.col("p50") >= F.col("p50_lo")) & (F.col("p50") <= F.col("p50_hi")))
        .cast("int")
        .alias("p50_in_band"),
        ((F.col("p95") >= F.col("p95_lo")) & (F.col("p95") <= F.col("p95_hi")))
        .cast("int")
        .alias("p95_in_band"),
    )


def sketch_quantile_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENCH-ONLY production path of q_sketch_quantile_merge: per-slice
    KLL state build → pinned-order merge → quantile extraction, WITHOUT
    the exact-rank verifier (a full per-group sort window that exists
    only to check the answer and would dominate — and misattribute —
    the timing). Not registered in the catalog: its raw quantile values
    are randomized by KLL compaction, so it cannot carry a value-hash
    oracle; correctness of the same path is covered by
    q_sketch_quantile_merge's banded verdict."""
    l = load_table(spark, sf_dir, "lineitem")
    st = kll_state(
        l,
        ["l_returnflag"],
        "l_extendedprice",
        slice_col=F.date_trunc("month", F.col("l_shipdate")),
        k=200,
    )
    return kll_quantiles(kll_merge(st, ["l_returnflag"]), [0.5, 0.95])
