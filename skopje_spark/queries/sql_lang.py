"""Spark 4 SQL-language surfaces under the gate: SQL UDFs, SQL
scripting (BEGIN..END control flow), and session variables.

These are the SQL-dialect conveniences a user migrating from a
database-backed system (the reference delegates everything to
Postgres, which has all three as functions/DO blocks/psql variables)
reaches for first. The scale-relevant property: a SQL UDF is
macro-expanded by Catalyst into the calling plan — it stays inside
whole-stage codegen, unlike a Python UDF which forces a serialization
boundary. Scripting control flow runs driver-side; every statement in
the script is still a full distributed query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling modules)

from skopje_spark.queries import register
from skopje_spark.queries.rounding import dround_sql, dsum_sql  # noqa: F401
from skopje_spark.tables import load_table


@register(
    "q_sql_udf_revenue",
    oracle=f"""
    SELECT l_returnflag,
           {dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6, 2)}
             AS taxed_revenue
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag
    """,
    tags=("sql-udf", "codegen"),
)
def q_sql_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A SQL UDF (CREATE FUNCTION .. RETURN expr) used inside an
    aggregate. Catalyst inlines the body into the plan — the hot path
    stays in whole-stage codegen, which is exactly why this is the
    preferred extension point over a Python UDF for scalar math.

    The aggregate uses :func:`dsum_sql` (exact integer-micro-unit
    summation), not ``dround_sql(SUM(...))``: the summand — a product
    of three 2-dp values — is an exact 6-dp number, so rounding its
    double-precision SUM at 2 dp genuinely lands on .xx5000 boundaries
    where partition-order summation noise flips the last cent between
    engines (the round-14 driver failure). Micro-unit summation is
    associative and partition-layout-independent on both engines."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__sqlu_li")
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION taxed_net(
        price DOUBLE, disc DOUBLE, tax DOUBLE)
      RETURNS DOUBLE
      RETURN price * (1 - disc) * (1 + tax)
    """)
    return spark.sql(f"""
      SELECT l_returnflag,
             {dsum_sql("taxed_net(l_extendedprice, l_discount, l_tax)", 6, 2)}
               AS taxed_revenue
      FROM __sqlu_li
      WHERE l_shipdate <= DATE '1998-09-02'
      GROUP BY l_returnflag
    """)


@register(
    "q_sql_script_threshold",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS above_half_max,
           CAST(32 AS BIGINT) AS loop_acc
    FROM customer
    WHERE c_acctbal > (SELECT MAX(c_acctbal) * 0.5 FROM customer)
    GROUP BY c_mktsegment
    """,
    tags=("sql-scripting", "control-flow"),
)
def q_sql_script_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting: DECLARE + SET from a scalar subquery + a WHILE
    loop, with the final SELECT as the script's result. The threshold
    derives from MAX (exact in both engines, unlike AVG whose
    summation order could flip boundary rows), and the loop
    accumulator pins that control flow actually executed 5 turns."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("__scr_cust")
    return spark.sql("""
      BEGIN
        DECLARE thr DOUBLE;
        DECLARE i INT DEFAULT 0;
        DECLARE acc BIGINT DEFAULT 1;
        SET thr = (SELECT MAX(c_acctbal) FROM __scr_cust) * 0.5;
        WHILE i < 5 DO
          SET acc = acc * 2;
          SET i = i + 1;
        END WHILE;
        SELECT c_mktsegment,
               COUNT(*) AS above_half_max,
               acc AS loop_acc
        FROM __scr_cust
        WHERE c_acctbal > thr
        GROUP BY c_mktsegment;
      END
    """)


@register(
    "q_sql_session_variable",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_totalprice > 100000.0
    GROUP BY o_orderpriority
    """,
    tags=("session-variables",),
)
def q_sql_session_variable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session variables (DECLARE VARIABLE / SET VAR): the
    parameterize-without-string-splicing mechanism. The predicate
    reads the variable at plan time; the oracle pins the same literal
    value."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__var_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE __price_floor DOUBLE")
    spark.sql("SET VAR __price_floor = 100000.0")
    return spark.sql("""
      SELECT o_orderpriority, COUNT(*) AS n
      FROM __var_orders
      WHERE o_totalprice > __price_floor
      GROUP BY o_orderpriority
    """)


@register(
    "q_sql_named_params",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n
    FROM lineitem
    WHERE l_quantity >= 45.0 AND l_returnflag IN ('R', 'A')
    GROUP BY l_returnflag
    """,
    tags=("parameterized-sql",),
)
def q_sql_named_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named parameter markers (``:name`` + args dict): values bind as
    literals at plan time without string splicing — the
    injection-proof way to templatize a query. The oracle pins the
    same bound values."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__par_li")
    return spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n
        FROM __par_li
        WHERE l_quantity >= :min_qty AND l_returnflag IN (:m1, :m2)
        GROUP BY l_returnflag
        """,
        args={"min_qty": 45.0, "m1": "R", "m2": "A"},
    )
