"""Aggregation catalog: hash agg, distinct, approx, rollup/cube/
grouping sets, filtered agg, statistical aggregates.

All numeric aggregate outputs are ROUNDed identically on both sides
(engine summation order differs ⇒ raw doubles differ in last ulps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.queries import register
from skopje_spark.queries.rounding import davg, dround, dround_sql
from skopje_spark.tables import load_table


@register(
    "q_agg_basic",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*)                       AS n_orders,
           (CASE WHEN (SUM(o_totalprice)) < 0 THEN -(FLOOR((-(SUM(o_totalprice))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(o_totalprice)) * 100.0 + 0.5) / 100.0 END)    AS total_price,
           ((CASE WHEN (SUM(o_totalprice)) < 0 THEN -(FLOOR((-(SUM(o_totalprice))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(o_totalprice)) * 100.0 + 0.5) / 100.0 END) / COUNT(o_totalprice))    AS avg_price,
           (CASE WHEN (MIN(o_totalprice)) < 0 THEN -(FLOOR((-(MIN(o_totalprice))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((MIN(o_totalprice)) * 100.0 + 0.5) / 100.0 END)    AS min_price,
           (CASE WHEN (MAX(o_totalprice)) < 0 THEN -(FLOOR((-(MAX(o_totalprice))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((MAX(o_totalprice)) * 100.0 + 0.5) / 100.0 END)    AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count/sum/avg/min/max — partial (map-side) + final agg is
    automatic; shuffle carries only one row per group per mapper."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dround(F.sum("o_totalprice"), 2).alias("total_price"),
        davg(F.col("o_totalprice"), 2).alias("avg_price"),
        dround(F.min("o_totalprice"), 2).alias("min_price"),
        dround(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey)            AS n_supp,
           COUNT(DISTINCT l_partkey)            AS n_part,
           (CASE WHEN (SUM(DISTINCT l_quantity)) < 0 THEN -(FLOOR((-(SUM(DISTINCT l_quantity))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(DISTINCT l_quantity)) * 100.0 + 0.5) / 100.0 END)   AS sum_distinct_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates — Spark expands to a two-phase plan
    (dedup-then-agg) automatically."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        dround(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_distinct_qty"),
    )


@register(
    "q_agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_part_exact,
           COUNT(*) AS n_rows,
           CAST(1 AS INTEGER) AS hll_within_band
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct, oracle-checked via a
    deterministic verdict: the sketch estimate itself is
    engine-specific (DuckDB's approx_distinct uses a different
    sketch), so the query emits the EXACT distinct count (both
    engines agree) plus an INTEGER flag asserting the HLL estimate
    landed within 3×rsd of it. Spark's HLL++ is deterministic for
    fixed input, so the flag is stable — and the oracle asserts 1.
    (Integer, not boolean: no green query had ever shipped a boolean
    column through the driver's hash compare, so flags reuse the
    longest-verified type instead.)

    Scale: HLL sketches merge associatively — constant memory per
    group vs. the exact path's full dedup shuffle; the exact twin here
    exists to *verify* the sketch, not to replace it.
    """
    l = load_table(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
        F.countDistinct("l_partkey").alias("n_part_exact"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    band = F.greatest(F.lit(3.0), F.lit(0.06) * F.col("n_part_exact"))
    return agg.select(
        "l_returnflag",
        "n_part_exact",
        "n_rows",
        (F.abs(F.col("approx") - F.col("n_part_exact")) <= band)
        .cast("int")
        .alias("hll_within_band"),
    )


@register(
    "q_agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, (CASE WHEN (SUM(o_totalprice)) < 0 THEN -(FLOOR((-(SUM(o_totalprice))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(o_totalprice)) * 100.0 + 0.5) / 100.0 END) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup"),
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (status, priority) → (status) → ()."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "q_agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, ((CASE WHEN (SUM(o_totalprice)) < 0 THEN -(FLOOR((-(SUM(o_totalprice))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(o_totalprice)) * 100.0 + 0.5) / 100.0 END) / COUNT(o_totalprice)) AS avg_total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping-set combinations of two keys."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        davg(F.col("o_totalprice"), 2).alias("avg_total"),
    )


@register(
    "q_agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("agg", "grouping-sets"),
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via spark.sql (exercises the SQL parse →
    Catalyst path the reference delegates to Postgres)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "q_agg_filtered",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05)                    AS n_high_disc,
           (CASE WHEN (SUM(l_extendedprice) FILTER (WHERE l_quantity > 25)) < 0 THEN -(FLOOR((-(SUM(l_extendedprice) FILTER (WHERE l_quantity > 25))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(l_extendedprice) FILTER (WHERE l_quantity > 25)) * 100.0 + 0.5) / 100.0 END) AS rev_bulk,
           (CASE WHEN (SUM(CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0 END)) < 0 THEN -(FLOOR((-(SUM(CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0 END))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0 END)) * 100.0 + 0.5) / 100.0 END)
                                                                         AS rev_taxed
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "filtered"),
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation (FILTER clause ≅ sum(when))."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_high_disc"),
        dround(
            F.sum(F.when(F.col("l_quantity") > 25, F.col("l_extendedprice"))), 2
        ).alias("rev_bulk"),
        dround(
            F.sum(
                F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice")).otherwise(0.0)
            ),
            2,
        ).alias("rev_taxed"),
    )


@register(
    "q_agg_stats",
    oracle="""
    SELECT c_mktsegment,
           (CASE WHEN (STDDEV_SAMP(c_acctbal)) < 0 THEN -(FLOOR((-(STDDEV_SAMP(c_acctbal))) * 10000.0 + 0.5) / 10000.0) ELSE FLOOR((STDDEV_SAMP(c_acctbal)) * 10000.0 + 0.5) / 10000.0 END)      AS sd_bal,
           (CASE WHEN (VAR_SAMP(c_acctbal)) < 0 THEN -(FLOOR((-(VAR_SAMP(c_acctbal))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((VAR_SAMP(c_acctbal)) * 100.0 + 0.5) / 100.0 END)         AS var_bal,
           (CASE WHEN (CORR(c_acctbal, c_custkey)) < 0 THEN -(FLOOR((-(CORR(c_acctbal, c_custkey))) * 1000000.0 + 0.5) / 1000000.0) ELSE FLOOR((CORR(c_acctbal, c_custkey)) * 1000000.0 + 0.5) / 1000000.0 END)  AS corr_bal_key,
           (CASE WHEN (MEDIAN(c_acctbal)) < 0 THEN -(FLOOR((-(MEDIAN(c_acctbal))) * 10000.0 + 0.5) / 10000.0) ELSE FLOOR((MEDIAN(c_acctbal)) * 10000.0 + 0.5) / 10000.0 END)           AS median_bal
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("agg", "stats"),
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/corr/exact median.

    Scale: exact median requires a per-group sort — fine for bounded
    group counts; at 100 TB prefer approx_percentile (sketch-mergeable).
    """
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        dround(F.stddev_samp("c_acctbal"), 4).alias("sd_bal"),
        dround(F.var_samp("c_acctbal"), 2).alias("var_bal"),
        dround(F.corr("c_acctbal", "c_custkey"), 6).alias("corr_bal_key"),
        dround(F.median("c_acctbal"), 4).alias("median_bal"),
    )


@register(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS qty_p25,
           quantile_cont(l_quantity, 0.50) AS qty_p50,
           quantile_cont(l_quantity, 0.75) AS qty_p75,
           quantile_cont(l_extendedprice, 0.50) AS price_p50
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (JVM-side
    ``percentile``, not the pandas-UDAF median in q_udaf_grouped_median
    — this is the built-in path). Both engines use the standard
    h=(n-1)p linear interpolation; quantities are integer-valued and
    the p-fractions are exact binaries, so results match bit-for-bit."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.25).alias("qty_p25"),
            F.percentile("l_quantity", 0.50).alias("qty_p50"),
            F.percentile("l_quantity", 0.75).alias("qty_p75"),
            F.percentile("l_extendedprice", 0.50).alias("price_p50"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_rollup_incremental",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           (CASE WHEN (SUM(l_quantity)) < 0 THEN -(FLOOR((-(SUM(l_quantity))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(l_quantity)) * 100.0 + 0.5) / 100.0 END) AS l_quantity_sum,
           MIN(l_quantity) AS l_quantity_min,
           MAX(l_quantity) AS l_quantity_max,
           ((CASE WHEN (SUM(l_quantity)) < 0 THEN -(FLOOR((-(SUM(l_quantity))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(l_quantity)) * 100.0 + 0.5) / 100.0 END) / COUNT(*)) AS l_quantity_avg,
           (CASE WHEN (SUM(l_extendedprice)) < 0 THEN -(FLOOR((-(SUM(l_extendedprice))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(l_extendedprice)) * 100.0 + 0.5) / 100.0 END) AS l_extendedprice_sum,
           MIN(l_extendedprice) AS l_extendedprice_min,
           MAX(l_extendedprice) AS l_extendedprice_max,
           ((CASE WHEN (SUM(l_extendedprice)) < 0 THEN -(FLOOR((-(SUM(l_extendedprice))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(l_extendedprice)) * 100.0 + 0.5) / 100.0 END) / COUNT(*)) AS l_extendedprice_avg
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "incremental", "rollup-maintenance"),
)
def q_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance (operators/rollup.py): the fact
    table arrives as two batches (ship year < 1999 / ≥ 1999), each
    aggregated into mergeable partial state; the merged + finalized
    rollup must equal the oracle's single-pass aggregate over the full
    table. Merging touches only |keys| state rows — the batch-size-
    independent cost that makes daily 100 TB rollup loads feasible."""
    from skopje_spark.operators.rollup import (
        rollup_finalize,
        rollup_merge,
        rollup_state,
    )

    l = load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1999-01-01").cast("timestamp")
    keys, vals = ["l_returnflag"], ["l_quantity", "l_extendedprice"]
    prior = rollup_state(l.filter(F.col("l_shipdate") < cut), keys, vals)
    delta = rollup_state(l.filter(F.col("l_shipdate") >= cut), keys, vals)
    return rollup_finalize(rollup_merge([prior, delta], keys, vals), keys, vals)


@register(
    "q_agg_approx_percentile",
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
           MAX(CASE WHEN rn = CEIL(0.99 * n) THEN l_extendedprice END) AS p99_exact,
           CAST(1 AS INTEGER) AS pctl_within_band,
           CAST(1 AS INTEGER) AS orders_within_band
    FROM ranked GROUP BY l_returnflag
    """,
    tags=("agg", "approx", "sketch"),
)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via Spark's KLL-style quantile sketch
    (``approx_percentile``, accuracy 1/10000), oracle-checked via a
    deterministic verdict: sketches are engine-specific, so the query
    emits EXACT discrete percentiles (the element at rank ⌈p·n⌉ —
    pure data values, bit-identical across engines, no interpolation
    arithmetic to drift) plus booleans asserting the sketch landed
    within 2% of each, and the HLL order-count within its 3×rsd band.

    Scale: the sketch is fixed-size and mergeable — partial aggregates
    combine map-side, so the shuffle carries one sketch per group, not
    the data; this is THE way to do percentiles at 100 TB. The exact
    rank path below (full per-group sort window) is the *verifier*,
    not the production operator.
    """
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    wg = Window.partitionBy("l_returnflag")
    w = wg.orderBy("l_extendedprice")
    ranked = l.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wg).alias("n"),
    )

    def at_rank(p: float):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(p) * F.col("n")),
                F.col("l_extendedprice"),
            )
        )

    exact = ranked.groupBy("l_returnflag").agg(
        at_rank(0.50).alias("p50_exact"),
        at_rank(0.95).alias("p95_exact"),
        at_rank(0.99).alias("p99_exact"),
    )
    sk = l.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 10000)"
        ).alias("qs"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )

    def close(sketch, ex):
        return F.abs(sketch - F.col(ex)) <= F.lit(0.02) * F.col(ex)

    hll_band = F.greatest(F.lit(3.0), F.lit(0.06) * F.col("n_orders"))
    return exact.join(sk, "l_returnflag").select(
        "l_returnflag",
        "p50_exact",
        "p95_exact",
        "p99_exact",
        (
            close(F.col("qs")[0], "p50_exact")
            & close(F.col("qs")[1], "p95_exact")
            & close(F.col("qs")[2], "p99_exact")
        )
        .cast("int")
        .alias("pctl_within_band"),
        (F.abs(F.col("approx_orders") - F.col("n_orders")) <= hll_band)
        .cast("int")
        .alias("orders_within_band"),
    )


@register(
    "q_agg_corr",
    oracle=f"""
    SELECT l_returnflag,
           {dround_sql('corr(l_quantity, l_extendedprice)', 6)} AS qty_price_corr,
           {dround_sql('covar_samp(l_quantity, l_extendedprice)', 4)} AS qty_price_covar,
           {dround_sql('covar_pop(l_quantity, l_discount)', 6)} AS qty_disc_covar_pop
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "corr", "covar", "stats"),
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate aggregate surface: Pearson correlation and
    sample/population covariance per group — the quick feature-pair
    diagnostics every profiling pass runs. Single-shuffle partial
    aggregation (corr/covar decompose into sum/sum-of-products
    moments); last-ulp moment-accumulation differences between
    engines are dround-absorbed."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        dround(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        dround(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        dround(F.covar_pop("l_quantity", "l_discount"), 6).alias(
            "qty_disc_covar_pop"
        ),
    )
