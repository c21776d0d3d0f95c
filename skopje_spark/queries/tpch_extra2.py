"""The remaining TPC-H query shapes, adapted to the fixture schema.

Completes the TPC-H-style sweep of the §2B "delegated SQL surface"
(`/root/reference/src/extract/pg.rs:12-31` — arbitrary SQL handed to
Postgres): correlated aggregates, EXISTS / NOT-EXISTS decorrelation,
scalar-subquery HAVING, NOT-IN anti joins, histogram-of-aggregates.

The fixture star schema has no ``partsupp`` table and no
``l_commitdate / l_receiptdate / l_shipmode`` columns, so each query
keeps the *shape* (the plan-relevant structure) of its TPC-H namesake
while substituting available columns:

- supply cost       → ``MIN(l_extendedprice / l_quantity)`` per (part, supplier)
- late delivery     → ``l_shipdate > o_orderdate + INTERVAL 150 DAYS``
- ship mode         → ``l_linestatus``
- customer country  → ``nation`` dim (no phone column)

Scale notes (100 TB): every dimension join broadcasts; fact-grain
aggregates reduce BEFORE joining back (q15, q17, q21); correlated
EXISTS/NOT-EXISTS are decorrelated into one pass over the fact table
plus a window/aggregate (no per-row subquery execution, which is what
Catalyst would otherwise turn into a join anyway — we write the join
form explicitly so the shuffle structure is visible and testable).

Float determinism follows the repo rules (queries/rounding.py): MIN /
integer-valued SUMs are exact; order-dependent money sums are
``dround``-ed at their decimal granularity on both engines before any
comparison or division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from skopje_spark.queries import register
from skopje_spark.queries.rounding import dround, dround_sql
from skopje_spark.tables import load_table

_REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey, MIN(unit_cost) AS best_cost
      FROM cost GROUP BY l_partkey
    )
    SELECT {dround_sql("s.s_acctbal", 2)} AS acctbal,
           s.s_name, n.n_name, p.p_partkey, p.p_brand,
           {dround_sql("c.unit_cost", 4)} AS unit_cost
    FROM cost c
    JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.best_cost
    JOIN part p     ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size <= 25 AND r.r_name = 'ASIA'
    ORDER BY acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    tags=("join", "subquery", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-style min-cost supplier: correlated MIN subquery
    (cheapest unit price per part) rewritten as aggregate + self-join —
    the decorrelation Catalyst itself applies to correlated scalar
    subqueries. No partsupp fixture, so unit cost is derived from
    lineitem. MIN over doubles is exact, so the equality join on
    unit_cost is engine-stable; all dims broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    best = cost.groupBy("l_partkey").agg(F.min("unit_cost").alias("best_cost"))
    return (
        cost.join(
            best.withColumnRenamed("l_partkey", "b_partkey"),
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .join(F.broadcast(p.filter(F.col("p_size") <= 25)),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
              F.col("r_regionkey") == F.col("n_regionkey"))
        .select(
            dround(F.col("s_acctbal"), 2).alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            dround(F.col("unit_cost"), 4).alias("unit_cost"),
        )
        .orderBy(F.desc("acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 150 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tags=("semi", "exists", "agg", "tpch"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style order-priority check: correlated EXISTS with a
    non-equi term (late shipment) → left-semi join carrying the extra
    condition. The date filter prunes orders before the semi join, so
    the probe side is small; lineitem is only scanned, never widened."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 150 DAYS")
    )
    return (
        o.join(l, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH j AS (
      SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
             {_REV} AS volume, sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
      JOIN part p     ON p.p_partkey = l.l_partkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           {dround_sql(
               dround_sql("SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)", 4)
               + " / " + dround_sql("SUM(volume)", 4), 6)} AS mkt_share
    FROM j GROUP BY o_year ORDER BY o_year
    """,
    tags=("join", "agg", "conditional", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-style national market share: 7-table join (all dims
    broadcast, one fact-fact shuffle) then a conditional-aggregate
    ratio per year. Numerator and denominator are dround-ed at money
    granularity before the division so the ratio is engine-stable."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    cn = n.select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    j = (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(cn), F.col("cn_key") == c.c_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
              F.col("r_regionkey") == F.col("cn_region"))
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
        .join(F.broadcast(p.filter(F.col("p_type") == "PROMO")),
              F.col("p_partkey") == l.l_partkey)
        .select(F.year("o_orderdate").alias("o_year"),
                _rev().alias("volume"), "supp_nation")
    )
    num = dround(
        F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(0.0)),
        4,
    )
    den = dround(F.sum("volume"), 4)
    return (
        j.groupBy("o_year")
        .agg(dround(num / den, 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
           {dround_sql(
               "SUM(l.l_extendedprice * (1 - l.l_discount)"
               " - l.l_extendedprice * l.l_tax)", 4)} AS sum_profit
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("join", "agg", "like", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-style product-type profit: LIKE-filtered part dim
    (broadcast), profit = revenue minus tax (the fixture has no
    ps_supplycost), grouped by supplier nation × order year. Both
    profit terms are 4-decimal-exact, so the dround-ed sum matches
    bit-exactly."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part")
    profit = _rev() - F.col("l_extendedprice") * F.col("l_tax")
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(p.filter(F.col("p_name").like("%red%"))),
              F.col("p_partkey") == l.l_partkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(dround(F.sum(profit), 4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q11_important_value",
    oracle=f"""
    WITH pv AS (
      SELECT l.l_partkey, SUM(l.l_quantity * p.p_retailprice) AS value
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_1', 'NATION_2')
      GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey, {dround_sql("value", 2)} AS part_value
    FROM pv
    WHERE {dround_sql("value", 2)} >
          (SELECT {dround_sql("SUM(value)", 2)} * 0.005 FROM pv)
    ORDER BY part_value DESC, p_partkey
    """,
    tags=("agg", "having", "scalar-subquery", "tpch"),
)
def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-style important stock: per-part value filtered
    against a fraction of the GLOBAL value — a scalar subquery over
    the same aggregate. The per-part aggregate is computed once and
    reused for both sides (Spark: cross-join the 1-row global against
    the per-part rows; the 1-row side broadcasts)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pv = (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n.filter(F.col("n_name").isin("NATION_1", "NATION_2"))),
              F.col("n_nationkey") == s.s_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity") * F.col("p_retailprice")).alias("value"))
    )
    total = pv.agg((dround(F.sum("value"), 2) * 0.005).alias("threshold"))
    return (
        pv.join(F.broadcast(total))
        .filter(dround(F.col("value"), 2) > F.col("threshold"))
        .select(F.col("l_partkey").alias("p_partkey"),
                dround(F.col("value"), 2).alias("part_value"))
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@register(
    "q12_late_lines_by_status",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 150 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    tags=("join", "conditional", "tpch"),
)
def q12_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-style shipping-mode audit (l_linestatus stands in for
    the absent l_shipmode): late lines counted into priority buckets
    with conditional aggregation — one join, one pass, no second scan
    for the second bucket."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 150 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                         AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("outer-join", "agg", "histogram", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-style customer order-count distribution: left outer
    join with an extra join-side predicate (NOT pushed below the join —
    it must not drop customers), then a histogram of the per-customer
    counts. Two aggregations; the second is over ~|customers| rows and
    is cheap. COUNT of a nullable column counts only matches — the
    outer-join-aware aggregate."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, {dround_sql(f"SUM({_REV})", 4)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
    tags=("agg", "scalar-subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-style top supplier: the revenue "view" is computed
    once; the max-revenue scalar compares against the SAME dround-ed
    values, so the double equality is exact by construction. The 1-row
    max broadcasts; supplier dim broadcasts."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(dround(F.sum(_rev()), 4).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#23' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tags=("anti", "distinct-agg", "tpch"),
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-style supplier variety: NOT IN over a non-null key →
    left-anti join (broadcast, the excluded set is tiny), then
    COUNT(DISTINCT) per part attribute triple. The distinct-aggregate
    expands to a two-phase plan (distinct shuffle then count) —
    exactly what Postgres would do for the reference's SQL."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pf = p.filter(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(pf), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_qty_revenue",
    oracle=f"""
    SELECT {dround_sql(dround_sql("SUM(l.l_extendedprice)", 2) + " / 7.0", 4)}
           AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < 0.2 * (SELECT AVG(l2.l_quantity)
                                FROM lineitem l2
                                WHERE l2.l_partkey = l.l_partkey)
    """,
    tags=("correlated", "agg", "tpch"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-style small-quantity revenue: correlated AVG per part
    decorrelated into a per-part aggregate joined back to the fact.
    Quantities are integer-valued, so AVG is bit-exact on both
    engines and the strict `<` comparison is stable. The per-part agg
    shrinks lineitem to |part| rows before the join back."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    lp = l.join(F.broadcast(p.filter(F.col("p_brand") == "Brand#23")),
                F.col("p_partkey") == F.col("l_partkey"))
    avg_qty = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        lp.join(F.broadcast(avg_qty), F.col("a_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(dround(dround(F.sum("l_extendedprice"), 2) / 7.0, 4).alias("avg_yearly"))
    )


@register(
    "q20_promo_suppliers",
    oracle="""
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'PROMO'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING SUM(l.l_quantity) > 40
    )
    ORDER BY s.s_name
    """,
    tags=("semi", "having", "tpch"),
)
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-style part promotion: IN over a HAVING-filtered
    aggregate → aggregate first (map-side partial sums of integer
    quantities), then a left-semi join into the supplier dim. The
    aggregate output (≤ |supplier|×|part| rows) is the broadcast
    side."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    qualifying = (
        l.join(F.broadcast(p.filter(F.col("p_type") == "PROMO")),
               F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 40)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(qualifying), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("n_nationkey") == s.s_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "q21_sole_late_supplier",
    oracle="""
    WITH flags AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 150 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey, l.l_suppkey
    ), per_order AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
      FROM flags GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM flags f
    JOIN per_order po ON po.l_orderkey = f.l_orderkey
    JOIN supplier s   ON s.s_suppkey = f.l_suppkey
    WHERE f.late = 1 AND po.n_supp > 1 AND po.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    tags=("exists", "not-exists", "window", "tpch"),
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-style waiting suppliers: the classic EXISTS (another
    supplier on the order) + NOT EXISTS (no OTHER late supplier)
    pair, decorrelated into ONE pass: per-(order, supplier) late
    flags, then order-level counts via a window over the same rows —
    sole-late-supplier ⇔ late=1 ∧ n_supp>1 ∧ n_late=1. No repeated
    correlated probes of lineitem; one shuffle for the flag aggregate,
    one for the window repartition."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    flags = (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 150 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    return (
        flags.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .filter((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), s.s_suppkey == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@register(
    "q22_dormant_customers",
    oracle=f"""
    SELECT n.n_name AS nation, COUNT(*) AS numcust,
           {dround_sql("SUM(c.c_acctbal)", 2)} AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT {dround_sql("SUM(c2.c_acctbal)", 2)} / COUNT(*)
                         FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY n.n_name
    ORDER BY nation
    """,
    tags=("anti", "scalar-subquery", "agg", "tpch"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-style sales opportunity: above-average-balance
    customers with no urgent orders (every fixture customer HAS
    orders, so the NOT EXISTS is against the urgent subset). NOT
    EXISTS → left-anti join; the average threshold uses the davg
    pattern (dround the 2-decimal-exact sum, then divide) so the
    strict `>` is engine-stable. Grouped by nation (the fixture has
    no phone/country-code column)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    threshold = c.filter(F.col("c_acctbal") > 0).agg(
        (dround(F.sum("c_acctbal"), 2) / F.count(F.lit(1))).alias("__avg_bal")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        c.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(urgent, urgent.o_custkey == c.c_custkey, "left_anti")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dround(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("nation")
    )
