"""Window-function catalog: ranking, analytic, frames, per-group top-k.

Determinism rule: any window whose function is order-sensitive
(row_number, ntile, lag/lead, running frames) gets a total order —
explicit tiebreak keys — so Spark and the DuckDB oracle agree row-wise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from skopje_spark.queries import register
from skopje_spark.queries.rounding import dround
from skopje_spark.tables import load_table


@register(
    "q_window_ranking",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
      ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
      RANK()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk,
      DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS drnk,
      NTILE(4)     OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
    tags=("window", "ranking"),
)
def q_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per nation.

    Scale: one shuffle on the partition key; sort is per-partition.
    Skew note: partition keys here are bounded (25 nations) — at
    100 TB a heavy-hitter partition key would need pre-aggregation or
    a two-level window."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "q_window_analytic",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
      LAG(o_totalprice)  OVER w AS prev_price,
      LEAD(o_totalprice) OVER w AS next_price,
      FIRST_VALUE(o_totalprice) OVER w AS first_price,
      LAST_VALUE(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "analytic"),
)
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first_value / last_value per customer order
    history (last_value over the full-frame window, the classic
    gotcha: default frame stops at CURRENT ROW)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
    )


@register(
    "q_window_frames",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
      (CASE WHEN (SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) < 0 THEN -(FLOOR((-(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100.0 + 0.5) / 100.0 END)  AS running_total,
      (CASE WHEN (AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) < 0 THEN -(FLOOR((-(AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))) * 10000.0 + 0.5) / 10000.0) ELSE FLOOR((AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) * 10000.0 + 0.5) / 10000.0 END)          AS moving_avg4,
      COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)      AS n_so_far
    FROM orders
    """,
    tags=("window", "frames"),
)
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row frames: running total, 4-row moving average, running count."""
    o = load_table(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = base.rowsBetween(-3, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        dround(F.sum("o_totalprice").over(running), 2).alias("running_total"),
        dround(F.avg("o_totalprice").over(moving), 4).alias("moving_avg4"),
        F.count(F.lit(1)).over(running).alias("n_so_far"),
    )


@register(
    "q_window_range_frame",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal,
      COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
        RANGE BETWEEN 100.0 PRECEDING AND 100.0 FOLLOWING) AS n_within_100
    FROM customer
    """,
    tags=("window", "frames", "range"),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering: peers within ±100 balance.

    Expressed via spark.sql — the Python Window API only takes integer
    frame boundaries, while Spark SQL accepts fractional RANGE offsets.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_nationkey, c_custkey, c_acctbal,
          COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
            RANGE BETWEEN 100.0 PRECEDING AND 100.0 FOLLOWING) AS n_within_100
        FROM customer
        """
    )


@register(
    "q_topk_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (top 3 balances per nation) via row_number.

    Scale: Spark pushes a per-partition rank limit before the shuffle
    when the pattern is recognized (WindowGroupLimit in 3.5+) — avoids
    materializing full partitions."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


@register(
    "q_orderby_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
    LIMIT 50
    """,
    tags=("sort", "limit"),
)
def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort + limit → TakeOrderedAndProject (per-
    partition top-50 then driver merge; no full global sort)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc())
        .limit(50)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )
