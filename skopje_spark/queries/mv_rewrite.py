"""Aggregate-navigator (MV query rewrite) under the driver gate."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.operators.mvnav import AggView, mv_answer
from skopje_spark.queries import register
from skopje_spark.queries.rounding import dround, dround_sql
from skopje_spark.tables import load_table


@register(
    "q_mv_rollup_answer",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS orders,
           {dround_sql("SUM(o_totalprice)", 2)} AS total,
           {dround_sql("AVG(o_totalprice)", 4)} AS mean_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("mv", "query-rewrite", "aggregate-navigator"),
)
def q_mv_rollup_answer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query rewrite through the aggregate navigator: a materialized
    rollup at (priority, status) grain answers a priority-grain
    request — sum/count re-summed, avg derived from sum + per-measure
    count — while the oracle computes the same answer from the BASE
    table. The routing decision is asserted in-query (a silent
    fallback to the base would defeat the point), so the gate proves
    both the rewrite fired and that it is value-exact. At 100 TB the
    navigator reads thousands of rollup rows instead of the fact
    table."""
    o = load_table(spark, sf_dir, "orders")
    mv_path = tempfile.mkdtemp(prefix="skopje_mv_") + "/orders_by_ps"
    (
        o.groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("price_sum"),
            F.count("o_totalprice").alias("price_cnt"),
        )
        .write.mode("overwrite").parquet(mv_path)
    )
    view = AggView(
        "orders_by_priority_status",
        ("o_orderpriority", "o_orderstatus"),
        {"n": ("count", "*"), "price_sum": ("sum", "o_totalprice"),
         "price_cnt": ("count", "o_totalprice")},
        load=lambda s: s.read.parquet(mv_path),
    )
    out, src = mv_answer(
        spark, [view], o, ["o_orderpriority"],
        {"orders": ("count", "*"),
         "total": ("sum", "o_totalprice"),
         "mean_price": ("avg", "o_totalprice")},
    )
    if src != view.name:
        raise AssertionError(f"navigator fell back to {src!r}")
    return out.select(
        "o_orderpriority",
        F.col("orders").cast("long").alias("orders"),
        dround(F.col("total"), 2).alias("total"),
        dround(F.col("mean_price"), 4).alias("mean_price"),
    )
