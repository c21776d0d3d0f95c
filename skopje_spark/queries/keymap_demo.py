"""KeyMap operator demo queries (K1-K4 in SURVEY.md §2A), driven from
fixture tables so the DuckDB oracle can reproduce them exactly.

Scenario: the first 20 nations already have surrogate keys (= their
nationkey); all 25 nation names arrive as incoming values. The 5 novel
values must be assigned new keys — densely (max+dense_rank) or by
exact gap-filling (reference `calc_lowest_key` semantics,
``/root/reference/src/keymap.rs:129-147``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.operators.keymap import keymap_assign
from skopje_spark.queries import register
from skopje_spark.tables import load_table


def _dim_and_incoming(spark, sf_dir, predicate):
    n = load_table(spark, sf_dir, "nation")
    dim = n.filter(predicate).select(
        F.col("n_nationkey").cast("bigint").alias("key"),
        F.col("n_name").alias("value"),
    )
    incoming = n.select(F.col("n_name").alias("value"))
    return dim, incoming


@register(
    "q_keymap_dense_assign",
    oracle="""
    WITH dim AS (
      SELECT CAST(n_nationkey AS BIGINT) AS key, n_name AS value
      FROM nation WHERE n_nationkey < 20
    ),
    new_vals AS (
      SELECT DISTINCT n_name AS value FROM nation
      WHERE n_name NOT IN (SELECT value FROM dim)
    ),
    mx AS (SELECT MAX(key) AS mk FROM dim)
    SELECT key, value FROM dim
    UNION ALL
    SELECT CAST(mk + DENSE_RANK() OVER (ORDER BY value) AS BIGINT) AS key, value
    FROM new_vals, mx
    """,
    tags=("keymap", "dimension"),
)
def q_keymap_dense_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Get-or-assign surrogate keys, dense policy (scale path)."""
    dim, incoming = _dim_and_incoming(
        spark, sf_dir, F.col("n_nationkey") < 20
    )
    return keymap_assign(dim, incoming, policy="dense")


@register(
    "q_keymap_gapfill_assign",
    oracle="""
    WITH dim AS (
      SELECT CAST(n_nationkey AS BIGINT) AS key, n_name AS value
      FROM nation WHERE n_nationkey % 4 <> 2
    ),
    new_vals AS (
      SELECT DISTINCT n_name AS value FROM nation
      WHERE n_name NOT IN (SELECT value FROM dim)
    ),
    free_keys AS (
      SELECT k AS key, ROW_NUMBER() OVER (ORDER BY k) AS rn
      FROM (
        SELECT unnest(generate_series(
          0,
          (SELECT MAX(key) FROM dim) + (SELECT COUNT(*) FROM new_vals)
        )) AS k
      )
      WHERE k NOT IN (SELECT key FROM dim)
    ),
    new_ranked AS (
      SELECT value, ROW_NUMBER() OVER (ORDER BY value) AS rn FROM new_vals
    )
    SELECT key, value FROM dim
    UNION ALL
    SELECT CAST(f.key AS BIGINT) AS key, n.value
    FROM new_ranked n JOIN free_keys f USING (rn)
    """,
    tags=("keymap", "dimension", "gapfill"),
)
def q_keymap_gapfill_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Get-or-assign with exact reference gap-filling parity: nations
    whose key ≡ 2 (mod 4) are missing from the dim, so their names are
    re-assigned the smallest free keys — exactly the {0,1,3}→2
    doc-test semantics at table scale."""
    dim, incoming = _dim_and_incoming(
        spark, sf_dir, F.col("n_nationkey") % 4 != 2
    )
    return keymap_assign(dim, incoming, policy="gapfill")


@register(
    "q_keymap_lookup",
    oracle="""
    SELECT o_orderkey, n.n_nationkey AS nation_key
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    LEFT JOIN nation n ON n.n_name = 'NATION_' || CAST(c_nationkey AS VARCHAR)
    """,
    tags=("keymap", "lookup", "broadcast"),
)
def q_keymap_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side key lookup through a broadcast dimension (KeyMap read
    path, `pg_fetch` ``/root/reference/src/keymap.rs:52-75``): orders →
    customer → nation-name → surrogate key."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nation_key"), F.col("n_name").alias("value")
    )
    facts = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        F.concat(F.lit("NATION_"), F.col("c_nationkey").cast("string")).alias("value"),
    )
    from skopje_spark.operators.keymap import keymap_lookup

    return keymap_lookup(n, facts, key_col="nation_key", value_col="value")
