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


@register(
    "q_sketch_kmv_overlap",
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate <  DATE '1995-07-01'),
         b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= DATE '1995-07-01')
    SELECT
      (SELECT COUNT(*) FROM a) AS exact_a,
      (SELECT COUNT(*) FROM b) AS exact_b,
      (SELECT COUNT(*) FROM (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)) AS exact_union,
      (SELECT COUNT(*) FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)) AS exact_inter,
      CAST(1 AS INTEGER) AS a_in_band,
      CAST(1 AS INTEGER) AS union_in_band,
      CAST(1 AS INTEGER) AS inter_in_band,
      CAST(1 AS INTEGER) AS jaccard_in_band
    """,
    tags=("sketch", "kmv", "setops", "agg"),
)
def q_sketch_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus overlap from two kilobyte synopses: KMV sketches
    (operators/sketches.py:kmv_state, k=256) of the distinct customer
    sets ordering before/after a date cut, combined into union /
    intersection / Jaccard estimates WITHOUT joining the raw sides —
    the "how much does snapshot B overlap corpus A" question HLL
    cannot answer except by inclusion-exclusion.

    Verdict bands vs the k=256 estimator noise (sigma ~ 1/sqrt(k-1)
    = 6.3% relative; rho sigma = sqrt(J(1-J)/256) <= 0.031 absolute):
    counts at ±20% relative (~3.2 sigma), Jaccard at ±0.10 absolute
    (>=3.2 sigma) — measured errors at sf0.001/0.01/0.1 stay under a
    third of each band (see tests/test_sketches.py). Exact values ride
    along so the driver hash still pins real numbers, not just flags.
    """
    from skopje_spark.operators.sketches import kmv_estimate, kmv_overlap, kmv_state

    k = 256
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1995-07-01").cast("date")
    a_side = o.filter(F.col("o_orderdate") < cut)
    b_side = o.filter(F.col("o_orderdate") >= cut)

    sa = kmv_state(a_side, "o_custkey", k=k)
    sb = kmv_state(b_side, "o_custkey", k=k)
    est_a = kmv_estimate(sa, k=k, out_col="a_est")
    ov = kmv_overlap(sa, sb, k=k)

    # the verdict needs four exact counts; derive them in one pass over
    # a (custkey, in_a, in_b) frame instead of four distinct scans
    flags = (
        o.select(
            "o_custkey",
            (F.col("o_orderdate") < cut).cast("int").alias("ia"),
            (F.col("o_orderdate") >= cut).cast("int").alias("ib"),
        )
        .groupBy("o_custkey")
        .agg(F.max("ia").alias("in_a"), F.max("ib").alias("in_b"))
        .agg(
            F.sum("in_a").alias("exact_a"),
            F.sum("in_b").alias("exact_b"),
            F.count(F.lit(1)).alias("exact_union"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("exact_inter"),
        )
    )
    rel = 0.20
    return (
        flags.crossJoin(F.broadcast(est_a))
        .crossJoin(F.broadcast(ov))
        .select(
            "exact_a",
            "exact_b",
            "exact_union",
            "exact_inter",
            (F.abs(F.col("a_est") - F.col("exact_a")) <= rel * F.col("exact_a"))
            .cast("int")
            .alias("a_in_band"),
            (F.abs(F.col("union_est") - F.col("exact_union")) <= rel * F.col("exact_union"))
            .cast("int")
            .alias("union_in_band"),
            (F.abs(F.col("intersect_est") - F.col("exact_inter")) <= rel * F.col("exact_inter"))
            .cast("int")
            .alias("inter_in_band"),
            (
                F.abs(
                    F.col("jaccard_est")
                    - F.col("exact_inter") / F.col("exact_union")
                )
                <= 0.10
            )
            .cast("int")
            .alias("jaccard_in_band"),
        )
    )
