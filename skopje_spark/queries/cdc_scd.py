"""Change-data-capture and SCD2 queries (operators/cdc.py).

Two deterministic "snapshots" are derived from the orders fixture by
modular key filters, so the diff/apply/historize results are exactly
reproducible in the DuckDB oracle — no external state needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.operators.cdc import apply_changes, scd2_apply, snapshot_diff
from skopje_spark.queries import register
from skopje_spark.tables import load_table

# old snapshot: keys not divisible by 7; new snapshot: keys not divisible
# by 5, with price bumped on %3 keys and status flipped on %11 keys.
_OLD_SQL = """
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 7 <> 0
"""
_NEW_SQL = """
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10.0
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 11 = 0 THEN 'X'
              ELSE o_orderstatus END AS o_orderstatus
  FROM orders WHERE o_orderkey % 5 <> 0
"""


def _old_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )


def _new_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 10.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )


@register(
    "q_cdc_snapshot_diff",
    oracle=f"""
    WITH old AS ({_OLD_SQL}), new AS ({_NEW_SQL})
    SELECT * FROM (
      SELECT COALESCE(n.o_orderkey, o.o_orderkey)       AS o_orderkey,
             COALESCE(n.o_totalprice, o.o_totalprice)   AS o_totalprice,
             COALESCE(n.o_orderstatus, o.o_orderstatus) AS o_orderstatus,
             CASE WHEN o.o_orderkey IS NULL THEN 'I'
                  WHEN n.o_orderkey IS NULL THEN 'D'
                  WHEN n.o_totalprice <> o.o_totalprice
                    OR n.o_orderstatus <> o.o_orderstatus THEN 'U'
             END AS op
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    ) WHERE op IS NOT NULL
    """,
    tags=("cdc", "diff", "outer-join"),
)
def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I/U/D changelog between two snapshot versions of orders
    (operators/cdc.snapshot_diff): one full-outer join on the business
    key; new values win, deletes keep old values. The change columns
    are arithmetic on exact inputs, so the diff is engine-exact."""
    d = snapshot_diff(
        _old_df(spark, sf_dir),
        _new_df(spark, sf_dir),
        keys=["o_orderkey"],
        compare_cols=["o_totalprice", "o_orderstatus"],
    )
    return d.withColumnRenamed("__op", "op")


@register(
    "q_cdc_roundtrip",
    oracle=f"SELECT o_orderkey, o_totalprice, o_orderstatus FROM ({_NEW_SQL})",
    tags=("cdc", "apply", "property"),
)
def q_cdc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog replay (operators/cdc.apply_changes): applying
    ``snapshot_diff(old, new)`` onto ``old`` must reproduce ``new``
    bit-for-bit — the oracle IS the new snapshot, computed directly.
    The engine side does diff + anti-join + union; the oracle does
    neither, so any drift in either operator breaks the hash."""
    old = _old_df(spark, sf_dir)
    new = _new_df(spark, sf_dir)
    diff = snapshot_diff(
        old, new, keys=["o_orderkey"], compare_cols=["o_totalprice", "o_orderstatus"]
    )
    return apply_changes(old, diff, keys=["o_orderkey"])


@register(
    "q_scd2_apply",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment AS segment
      FROM customer WHERE c_custkey % 2 = 0
    ), upd AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 6 = 0 THEN 'SEG_NEW'
                  ELSE c_mktsegment END AS segment
      FROM customer WHERE c_custkey % 3 = 0
    )
    SELECT d.c_custkey, d.segment,
           '2020-01-01' AS valid_from,
           CAST(NULL AS VARCHAR) AS valid_to,
           1 AS is_current
    FROM dim d LEFT JOIN upd u ON d.c_custkey = u.c_custkey
    WHERE u.c_custkey IS NULL OR u.segment = d.segment
    UNION ALL
    SELECT d.c_custkey, d.segment, '2020-01-01', '2021-01-01', 0
    FROM dim d JOIN upd u ON d.c_custkey = u.c_custkey
    WHERE u.segment <> d.segment
    UNION ALL
    SELECT u.c_custkey, u.segment, '2021-01-01', NULL, 1
    FROM upd u LEFT JOIN dim d ON d.c_custkey = u.c_custkey
    WHERE d.c_custkey IS NULL OR u.segment <> d.segment
    """,
    tags=("cdc", "scd2", "dimension"),
)
def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 historization (operators/cdc.scd2_apply): an update batch
    hits a current-only dimension — unchanged keys keep their row,
    changed keys get the old version closed at the load date plus a
    new open version, unseen keys insert. The oracle spells out the
    three slices as explicit joins. Validity bounds are strings (repo
    date-canonicalization rule)."""
    c = load_table(spark, sf_dir, "customer")
    dim = c.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("2020-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(1).alias("is_current"),
    )
    upd = c.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 6 == 0, F.lit("SEG_NEW"))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
    )
    return scd2_apply(
        dim,
        upd,
        keys=["c_custkey"],
        track_cols=["segment"],
        load_ts="2021-01-01",
    )
