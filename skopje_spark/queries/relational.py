"""Core relational queries: scan → filter → join → aggregate → sort.

These are the §2B "delegated SQL surface" headliners (the reference
delegates them to Postgres via ``fetch_stmt`` strings,
``/root/reference/src/extract/pg.rs:12-31``; here Spark SQL *is* the
engine).

Scale notes (verified via ``.explain("formatted")``):
- filters/projections push down to the parquet scan (PushedFilters);
- dimension joins (region/nation/supplier) broadcast — no shuffle;
- the customer⋈orders⋈lineitem joins shuffle on their keys, which is
  the correct 100 TB plan (AQE coalesces partitions and splits skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.queries import register
from skopje_spark.queries.rounding import davg, dround
from skopje_spark.tables import load_table


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      (CASE WHEN (SUM(l_quantity)) < 0 THEN -(FLOOR((-(SUM(l_quantity))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(l_quantity)) * 100.0 + 0.5) / 100.0 END)                                     AS sum_qty,
      (CASE WHEN (SUM(l_extendedprice)) < 0 THEN -(FLOOR((-(SUM(l_extendedprice))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(l_extendedprice)) * 100.0 + 0.5) / 100.0 END)                                AS sum_base_price,
      (CASE WHEN (SUM(l_extendedprice * (1 - l_discount))) < 0 THEN -(FLOOR((-(SUM(l_extendedprice * (1 - l_discount)))) * 10000.0 + 0.5) / 10000.0) ELSE FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0 END)             AS sum_disc_price,
      (CASE WHEN (SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))) < 0 THEN -(FLOOR((-(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)))) * 1000000.0 + 0.5) / 1000000.0) ELSE FLOOR((SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 1000000.0 + 0.5) / 1000000.0 END) AS sum_charge,
      ((CASE WHEN (SUM(l_quantity)) < 0 THEN -(FLOOR((-(SUM(l_quantity))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(l_quantity)) * 100.0 + 0.5) / 100.0 END) / COUNT(l_quantity))                                     AS avg_qty,
      ((CASE WHEN (SUM(l_extendedprice)) < 0 THEN -(FLOOR((-(SUM(l_extendedprice))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(l_extendedprice)) * 100.0 + 0.5) / 100.0 END) / COUNT(l_extendedprice))                                AS avg_price,
      ((CASE WHEN (SUM(l_discount)) < 0 THEN -(FLOOR((-(SUM(l_discount))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(l_discount)) * 100.0 + 0.5) / 100.0 END) / COUNT(l_discount))                                     AS avg_disc,
      COUNT(*)                                                      AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "scan", "filter"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: filtered scan → hash aggregate.

    Scale: partial aggregation happens map-side (low-cardinality group
    keys → tiny shuffle); the shipdate filter is pushed to parquet.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dround(F.sum("l_quantity"), 2).alias("sum_qty"),
            dround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            dround(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                6,
            ).alias("sum_charge"),
            davg(F.col("l_quantity"), 2).alias("avg_qty"),
            davg(F.col("l_extendedprice"), 2).alias("avg_price"),
            davg(F.col("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT
      o_orderkey,
      (CASE WHEN (SUM(l_extendedprice * (1 - l_discount))) < 0 THEN -(FLOOR((-(SUM(l_extendedprice * (1 - l_discount)))) * 10000.0 + 0.5) / 10000.0) ELSE FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0 END) AS revenue,
      o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (TPC-H-Q3-style): 3-way join → agg → global top-k.

    Scale: customer is filtered before the join (segment predicate
    pushed down); orders⋈lineitem shuffles on orderkey — co-located if
    both sides are bucketed by orderkey in a real deployment. Top-k
    uses TakeOrderedAndProject (no full sort/global shuffle).
    Determinism: tiebreak on o_orderkey makes LIMIT stable.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate")
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT
      n_name,
      (CASE WHEN (SUM(l_extendedprice * (1 - l_discount))) < 0 THEN -(FLOOR((-(SUM(l_extendedprice * (1 - l_discount)))) * 10000.0 + 0.5) / 10000.0) ELSE FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0 END) AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey   = c_custkey
    JOIN lineitem ON l_orderkey  = o_orderkey
    JOIN supplier ON s_suppkey   = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "agg", "broadcast"),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style star join: 6 tables, dims broadcast.

    Scale: region/nation/supplier are broadcast (explicit hint) — the
    only shuffles are customer⋈orders and orders⋈lineitem on their
    natural keys. The n_name aggregation is low-cardinality →
    map-side partial agg, tiny final shuffle.
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q_filter_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
    FROM part
    WHERE p_size IN (1, 5, 10, 15, 20)
      AND (p_brand LIKE 'Brand#1%' OR p_type = 'PROMO')
      AND p_retailprice BETWEEN 901.0 AND 915.0
      AND p_name IS NOT NULL
      AND NOT (p_size = 20 AND p_type = 'ECONOMY')
    """,
    tags=("filter",),
)
def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate zoo: IN / LIKE / BETWEEN / IS NULL / AND-OR-NOT.

    Scale: the whole conjunction is pushed to the parquet scan
    (PushedFilters in the formatted plan); no shuffle at all.
    """
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_size").isin(1, 5, 10, 15, 20)
        & (F.col("p_brand").like("Brand#1%") | (F.col("p_type") == "PROMO"))
        & F.col("p_retailprice").between(901.0, 915.0)
        & F.col("p_name").isNotNull()
        & ~((F.col("p_size") == 20) & (F.col("p_type") == "ECONOMY"))
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")


@register(
    "q_projection_compute",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      (CASE WHEN (l_extendedprice * (1 - l_discount)) < 0 THEN -(FLOOR((-(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0 END)               AS disc_price,
      (CASE WHEN (l_extendedprice * (1 - l_discount) * (1 + l_tax)) < 0 THEN -(FLOOR((-(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100.0 + 0.5) / 100.0 END) AS charge,
      CASE WHEN l_discount > 0.05 THEN 'HIGH' ELSE 'LOW' END     AS disc_band
    FROM lineitem
    """,
    tags=("project",),
)
def q_projection_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with computed columns and aliasing (the reference's
    `fetch_collection` closure-mapping analog, kept JVM-side —
    ``/root/reference/src/extract/pg.rs:101-125``).

    Scale: narrow transformation, zero shuffle; column pruning means
    only 6 of 11 lineitem columns are read (ReadSchema).
    """
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        dround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
            "disc_price"
        ),
        dround(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
            2,
        ).alias("charge"),
        F.when(F.col("l_discount") > 0.05, F.lit("HIGH"))
        .otherwise(F.lit("LOW"))
        .alias("disc_band"),
    )
