"""Recursive CTE queries (Spark 4 ``WITH RECURSIVE``) under the gate.

Two classic shapes the rest of the catalog couldn't express before
Spark grew recursion:

- bounded-depth reachability over an edge relation (the BFS every
  lineage/graph question starts from);
- a date spine — recursively generated calendar rows left-joined to
  facts to surface the *absent* periods (you cannot GROUP BY a week
  that has no rows).

Scale note: Spark executes each recursion step as its own distributed
join over the previous step's result, so depth is the serial dimension
and each level is fully parallel. Both queries bound the recursion
(depth cap / date range) — unbounded recursion on a cyclic graph never
terminates under UNION ALL semantics on either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.queries import register
from skopje_spark.tables import load_table


@register(
    "q_recursive_reachability",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT n_nationkey AS src, (n_nationkey * 2 + 1) % 25 AS dst FROM nation
      UNION ALL
      SELECT n_nationkey AS src, (n_nationkey * 3 + 7) % 25 AS dst FROM nation
    ),
    hop(node, depth) AS (
      SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
      UNION ALL
      SELECT CAST(e.dst AS BIGINT) AS node, h.depth + 1 AS depth
      FROM hop h JOIN edges e ON e.src = h.node
      WHERE h.depth < 8
    )
    SELECT depth, COUNT(*) AS paths,
           COUNT(DISTINCT node) AS distinct_nodes,
           MIN(node) AS min_node, MAX(node) AS max_node
    FROM hop GROUP BY depth
    """,
    tags=("recursive-cte", "graph", "bfs"),
)
def q_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth BFS via WITH RECURSIVE: each nation node gets two
    derived out-edges, and the recursion walks every path from node 0
    to depth 8 (2^d paths per level — the per-depth path/node counts
    pin both the join fan-out and the dedup-free UNION ALL
    semantics)."""
    n = load_table(spark, sf_dir, "nation")
    n.createOrReplaceTempView("__rec_nation")
    return spark.sql("""
      WITH RECURSIVE edges AS (
        SELECT n_nationkey AS src, (n_nationkey * 2 + 1) % 25 AS dst
        FROM __rec_nation
        UNION ALL
        SELECT n_nationkey AS src, (n_nationkey * 3 + 7) % 25 AS dst
        FROM __rec_nation
      ),
      hop(node, depth) AS (
        SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
        UNION ALL
        SELECT CAST(e.dst AS BIGINT) AS node, h.depth + 1 AS depth
        FROM hop h JOIN edges e ON e.src = h.node
        WHERE h.depth < 8
      )
      SELECT depth, COUNT(*) AS paths,
             COUNT(DISTINCT node) AS distinct_nodes,
             MIN(node) AS min_node, MAX(node) AS max_node
      FROM hop GROUP BY depth
    """)


@register(
    "q_recursive_date_spine",
    oracle="""
    WITH RECURSIVE spine(wk) AS (
      SELECT (SELECT MIN(o_orderdate) FROM orders) AS wk
      UNION ALL
      SELECT wk + INTERVAL 7 DAY FROM spine
      WHERE wk + INTERVAL 7 DAY <= (SELECT MAX(o_orderdate) FROM orders)
    ),
    bucketed AS (
      SELECT o_orderdate
             - (date_diff('day', (SELECT MIN(o_orderdate) FROM orders),
                          o_orderdate) % 7) * INTERVAL 1 DAY AS wk,
             o_orderkey
      FROM orders
    ),
    weekly AS (
      SELECT s.wk, COUNT(o.o_orderkey) AS orders_in_week
      FROM spine s LEFT JOIN bucketed o ON o.wk = s.wk
      GROUP BY s.wk
    )
    SELECT COUNT(*) AS weeks,
           COUNT(*) FILTER (WHERE orders_in_week = 0) AS empty_weeks,
           MIN(orders_in_week) AS min_orders,
           MAX(orders_in_week) AS max_orders
    FROM weekly
    """,
    tags=("recursive-cte", "date-spine", "gap-detection"),
)
def q_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar fill: a recursively generated weekly spine left-joined
    to orders, reporting the weeks NO fact row could ever produce. The
    spine bounds come from a bounded min/max metadata read (inlined
    into the SQL text — the recursion stays data-independent and
    terminates by construction), and each fact maps to its containing
    week ARITHMETICALLY so the spine join is a hash equi-join — never
    the nested-loop range join the naive BETWEEN spelling plans."""
    o = load_table(spark, sf_dir, "orders")
    mn, mx = o.agg(F.min("o_orderdate"), F.max("o_orderdate")).first()
    o.createOrReplaceTempView("__rec_orders")
    # ~7 years of weekly steps exceeds Spark's default 100-level cap;
    # the MAX RECURSION LEVEL clause is Spark-only (DuckDB has no such
    # low default, so the oracle stays plain)
    return spark.sql(f"""
      WITH RECURSIVE spine(wk) MAX RECURSION LEVEL 600 AS (
        SELECT DATE '{mn}' AS wk
        UNION ALL
        SELECT date_add(wk, 7) AS wk FROM spine
        WHERE date_add(wk, 7) <= DATE '{mx}'
      ),
      bucketed AS (
        SELECT date_sub(o_orderdate,
                        pmod(datediff(o_orderdate, DATE '{mn}'), 7)) AS wk,
               o_orderkey
        FROM __rec_orders
      ),
      weekly AS (
        SELECT s.wk, COUNT(o.o_orderkey) AS orders_in_week
        FROM spine s LEFT JOIN bucketed o ON o.wk = s.wk
        GROUP BY s.wk
      )
      SELECT COUNT(*) AS weeks,
             SUM(CASE WHEN orders_in_week = 0 THEN 1 ELSE 0 END) AS empty_weeks,
             MIN(orders_in_week) AS min_orders,
             MAX(orders_in_week) AS max_orders
      FROM weekly
    """)
