"""Subquery catalog: scalar subqueries, IN / EXISTS, correlated
subqueries, CTEs — the reference's `fetch_if_exists` / `fetch_or_insert`
lookup patterns (``/root/reference/src/extract/pg.rs:43-99``) expressed
through the spark.sql parse → Catalyst decorrelation path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from skopje_spark.queries import register
from skopje_spark.tables import load_table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, (CASE WHEN (o_totalprice) < 0 THEN -(FLOOR((-(o_totalprice)) * 100.0 + 0.5) / 100.0) ELSE FLOOR((o_totalprice) * 100.0 + 0.5) / 100.0 END) AS price
    FROM orders
    WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
    ORDER BY o_orderkey
    """,
    tags=("subquery", "scalar"),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (planned as a broadcast of one
    value; the subquery executes once)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, (CASE WHEN (o_totalprice) < 0 THEN -(FLOOR((-(o_totalprice)) * 100.0 + 0.5) / 100.0) ELSE FLOOR((o_totalprice) * 100.0 + 0.5) / 100.0 END) AS price
        FROM orders
        WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
        ORDER BY o_orderkey
        """
    )


@register(
    "q_in_subquery",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
    """,
    tags=("subquery", "in"),
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → planned as a left semi join."""
    _views(spark, sf_dir, "customer", "nation")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
        """
    )


@register(
    "q_correlated_exists",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_suppkey = s_suppkey AND l_quantity > 45
    )
    """,
    tags=("subquery", "exists", "correlated"),
)
def q_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — Catalyst decorrelates to a semi join (no
    per-row re-execution, unlike the reference's row-at-a-time
    `fetch_if_exists` round-trips)."""
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_suppkey = s_suppkey AND l_quantity > 45
        )
        """
    )


@register(
    "q_correlated_scalar",
    oracle="""
    SELECT c_custkey,
           (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("subquery", "correlated", "scalar"),
)
def q_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery in the select list — decorrelated to
    an aggregate + left outer join."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        FROM customer
        ORDER BY c_custkey
        """
    )


@register(
    "q_cte",
    oracle="""
    WITH big_orders AS (
      SELECT o_custkey, COUNT(*) AS n_big
      FROM orders WHERE o_totalprice > 3000
      GROUP BY o_custkey
    )
    SELECT c_mktsegment, CAST(SUM(n_big) AS BIGINT) AS total_big_orders
    FROM customer JOIN big_orders ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("subquery", "cte"),
)
def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common table expression feeding a join + second aggregate."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        WITH big_orders AS (
          SELECT o_custkey, COUNT(*) AS n_big
          FROM orders WHERE o_totalprice > 3000
          GROUP BY o_custkey
        )
        SELECT c_mktsegment, CAST(SUM(n_big) AS BIGINT) AS total_big_orders
        FROM customer JOIN big_orders ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )


_LATERAL_SQL = """
    SELECT n.n_name, l.o_orderkey, l.o_totalprice
    FROM nation n, LATERAL (
      SELECT o.o_orderkey, o.o_totalprice
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY o.o_totalprice DESC, o.o_orderkey
      LIMIT 2
    ) l
"""


@register(
    "q_lateral_topk",
    oracle=_LATERAL_SQL,
    tags=("subquery", "lateral"),
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: the two
    highest-value orders per nation. Catalyst decorrelates this into a
    ranked join (no per-nation re-execution); the deterministic
    tie-break (o_orderkey) pins the LIMIT boundary for the oracle.

    Scale: decorrelation is what makes LATERAL usable at 100 TB — a
    naive nested-loop would rescan orders once per outer row."""
    _views(spark, sf_dir, "nation", "orders", "customer")
    return spark.sql(_LATERAL_SQL)
