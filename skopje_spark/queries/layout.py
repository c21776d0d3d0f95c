"""Storage-layout queries: z-order (Morton) clustering cells.

The reference's load side writes tables as-is
(`/root/reference/src/load/pg.rs:1-40`); at 100 TB the write LAYOUT is
a first-class operator — which file a row lands in decides which files
a later query must open. ``q_zorder_cells`` verifies the z-value
arithmetic (normalize → bit-interleave) against DuckDB bit-for-bit;
the file-writing path and its skipping effectiveness are covered in
tests (tests/test_zorder.py) since the driver compare is query-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.queries import register
from skopje_spark.tables import load_table

_BITS = 8
_SCALE = (1 << _BITS) - 1
# 16-bit z >> 10 → 64 coarse cells ("files")
_CELL_SHIFT = 10

_INTERLEAVE = " + ".join(
    f"(((c{i} >> {j}) & 1) << {2 * j + i})" for j in range(_BITS) for i in range(2)
)

_ZORDER_ORACLE = f"""
WITH b AS (
  SELECT MIN(l_partkey) AS lo0, MAX(l_partkey) AS hi0,
         MIN(l_suppkey) AS lo1, MAX(l_suppkey) AS hi1
  FROM lineitem
),
c AS (
  SELECT l_partkey, l_suppkey,
         LEAST(GREATEST(CAST(FLOOR(((l_partkey - lo0) * {_SCALE}) / GREATEST(hi0 - lo0, 1)) AS BIGINT), 0), {_SCALE}) AS c0,
         LEAST(GREATEST(CAST(FLOOR(((l_suppkey - lo1) * {_SCALE}) / GREATEST(hi1 - lo1, 1)) AS BIGINT), 0), {_SCALE}) AS c1
  FROM lineitem, b
),
z AS (SELECT l_partkey, l_suppkey, ({_INTERLEAVE}) AS zval FROM c)
SELECT zval >> {_CELL_SHIFT} AS zcell,
       COUNT(*) AS n_rows,
       MIN(l_partkey) AS min_partkey, MAX(l_partkey) AS max_partkey,
       MIN(l_suppkey) AS min_suppkey, MAX(l_suppkey) AS max_suppkey
FROM z GROUP BY 1 ORDER BY 1
"""


@register(
    "q_zorder_cells",
    oracle=_ZORDER_ORACLE,
    tags=("layout", "zorder", "lakeops"),
)
def q_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order lineitem on (l_partkey, l_suppkey) and report the
    per-cell min/max box of BOTH dimensions
    (sources/skipping.py:zorder_col). Each coarse z-cell maps to one
    output file under write_zordered; narrow boxes on every clustered
    column are exactly what makes min/max skipping fire for queries on
    either key. The z-value is pure codegen (floor-div + shift/AND);
    ranges are one 4-number aggregate collected to the driver, which
    the oracle recomputes from the same data."""
    from skopje_spark.sources.skipping import column_ranges, zorder_col

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    ranges = column_ranges(li, ["l_partkey", "l_suppkey"])
    z = zorder_col(
        [F.col("l_partkey"), F.col("l_suppkey")], ranges, bits=_BITS
    )
    return (
        li.withColumn("zcell", F.shiftright(z, _CELL_SHIFT))
        .groupBy("zcell")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("min_partkey"),
            F.max("l_partkey").alias("max_partkey"),
            F.min("l_suppkey").alias("min_suppkey"),
            F.max("l_suppkey").alias("max_suppkey"),
        )
        .orderBy("zcell")
    )


@register(
    "q_join_bucketed",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           SUM(l_quantity) AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("layout", "bucketing", "join"),
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact join through BUCKETED storage
    (sinks/bucketed.py): orders and lineitem are first written
    hash-bucketed on orderkey, then joined bucket-to-bucket with zero
    exchanges (the write-side shuffle is paid once; every later join
    on the key is shuffle-free — the plan shape is pinned in
    tests/test_bucketed.py). Result identical to the plain join, which
    is exactly what the oracle checks."""
    from skopje_spark.sinks.bucketed import bucketed_join, write_bucketed

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(o, "q_bkt_orders", "o_orderkey", n_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "q_bkt_lineitem",
        "o_orderkey",
        n_buckets=8,
    )
    return (
        bucketed_join(spark, "q_bkt_orders", "q_bkt_lineitem", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("l_quantity").cast("double").alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )
