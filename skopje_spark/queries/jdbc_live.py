"""Live-JDBC driver queries: the reference's database surface proven
under the oracle gate.

The reference extracts from and loads into a real SQL database
(``/root/reference/src/extract/pg.rs:54,114``,
``/root/reference/src/load/pg.rs:67,96``). These queries run that loop
for real against embedded Derby (bundled with Spark): parquet → JDBC
sink → live JDBC scan (partitioned / pushed-down) → aggregate, with
the DuckDB oracle computing the same answer straight from parquet —
so a value mismatch anywhere in the write→store→read cycle fails the
gate.

Each run uses a fresh throwaway database under ``tempfile.mkdtemp``;
the JDBC scan stays lazy, and the database directory outlives the
query call so the driver's later ``collect()`` re-opens it.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.queries import register
from skopje_spark.queries.rounding import dround, dround_sql
from skopje_spark.sinks.jdbc import jdbc_sink, jdbc_sink_atomic
from skopje_spark.sources.derby import derby_config
from skopje_spark.sources.jdbc import jdbc_table
from skopje_spark.tables import load_table


def _fresh_db():
    return derby_config(tempfile.mkdtemp(prefix="skopje_q_derby_") + "/db")


@register(
    "q_jdbc_roundtrip",
    oracle="""
    SELECT r_name AS region_name,
           COUNT(*) AS nations,
           MIN(n_name) AS first_nation
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("jdbc", "live", "sink", "scan"),
)
def q_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension load + live re-read: nation⨝region goes out through
    the JDBC sink into a real database and comes back through a JDBC
    scan; the oracle never sees the database, so the gate proves the
    write→store→read cycle is value-exact."""
    db = _fresh_db()
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dim = n.join(r, n.n_regionkey == r.r_regionkey).select(
        "n_name", "r_name"
    )
    jdbc_sink(dim, db, "nation_dim", mode="overwrite",
              column_types="n_name VARCHAR(32), r_name VARCHAR(32)")
    back = jdbc_table(spark, db, "nation_dim")
    return back.groupBy(F.col("r_name").alias("region_name")).agg(
        F.count(F.lit(1)).alias("nations"),
        F.min("n_name").alias("first_nation"),
    )


@register(
    "q_jdbc_partitioned_agg",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS customers,
           {dround_sql("SUM(c_acctbal)", 2)} AS total_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("jdbc", "live", "partitioned-scan"),
)
def q_jdbc_partitioned_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-table path: customer loads into the database, then a
    range-partitioned JDBC scan (4 concurrent range-disjoint queries —
    the splittable-scan shape a 1000-executor cluster needs) feeds a
    Spark aggregation. Bounds come from a bounded min/max metadata
    read, exactly how a production partitioned extract sizes itself."""
    db = _fresh_db()
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    jdbc_sink(c, db, "customer_fact", mode="overwrite",
              column_types="c_mktsegment VARCHAR(16)")
    mn, mx = c.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    back = jdbc_table(
        spark, db, "customer_fact", partition_column="c_custkey",
        lower_bound=int(mn), upper_bound=int(mx) + 1, num_partitions=4,
    )
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("customers"),
        dround(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@register(
    "q_jdbc_atomic_publish",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n
    FROM nation WHERE n_nationkey >= 5
    GROUP BY n_regionkey
    """,
    tags=("jdbc", "live", "atomic-swap"),
)
def q_jdbc_atomic_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staging-table swap under the gate: version 1 of the table is
    published, then version 2 replaces it through the staged-write +
    single-transaction rename (reference single-commit semantics,
    ``src/load/pg.rs:81``). The result must reflect ONLY version 2 —
    a leaked stage or half-swap changes the counts and fails."""
    db = _fresh_db()
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    jdbc_sink(n.filter("n_nationkey < 5"), db, "nation_pub",
              mode="overwrite")
    jdbc_sink_atomic(n.filter("n_nationkey >= 5"), db, "nation_pub")
    back = jdbc_table(spark, db, "nation_pub")
    return back.groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_jdbc_upsert",
    oracle=f"""
    WITH final AS (
      SELECT c_custkey, c_nationkey,
             CASE WHEN c_custkey % 2 = 0 THEN c_acctbal + 1000.0
                  ELSE c_acctbal END AS bal
      FROM customer
      WHERE c_custkey % 3 <> 0 OR c_custkey % 2 = 0
    )
    SELECT c_nationkey,
           COUNT(*) AS customers,
           {dround_sql("SUM(bal)", 2)} AS total_bal
    FROM final
    GROUP BY c_nationkey
    """,
    tags=("jdbc", "live", "upsert", "merge"),
)
def q_jdbc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-based MERGE upsert under the gate: a base table takes a
    delta that UPDATEs overlapping keys (+1000 balance) and INSERTs
    novel ones, in one database transaction (reference
    `fetch_or_insert` / ON CONFLICT write path,
    ``src/extract/pg.rs:67-99``). The oracle computes the final state
    straight from parquet, so a missed update, doubled insert, or
    leaked stage row all fail the hash."""
    from skopje_spark.sinks.jdbc import jdbc_upsert

    db = _fresh_db()
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", F.col("c_acctbal").alias("bal")
    )
    base = c.filter("c_custkey % 3 <> 0")
    jdbc_sink(base, db, "cust_up", mode="overwrite")
    delta = c.filter("c_custkey % 2 = 0").withColumn(
        "bal", F.col("bal") + F.lit(1000.0)
    )
    jdbc_upsert(delta, db, "cust_up", ["c_custkey"])
    back = jdbc_table(spark, db, "cust_up")
    return back.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("customers"),
        dround(F.sum("bal"), 2).alias("total_bal"),
    )
