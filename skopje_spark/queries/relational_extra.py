"""Reshaping + sampling queries: pivot, unpivot, deterministic sample.

Pivot/unpivot round out the §2B relational surface (PostgreSQL users
express these as crosstab / UNION ALL — both SQL shapes a skopje
``fetch_stmt`` could carry). The hash sample is the training-data
holdout split primitive: deterministic, key-stable, engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.queries import register
from skopje_spark.queries.rounding import dround, dround_sql
from skopje_spark.tables import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "q_pivot_events",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      {", ".join(
          dround_sql(
              f"COALESCE(SUM(value) FILTER (WHERE event_type = '{t}'), 0.0)", 4
          ) + f" AS {t}"
          for t in EVENT_TYPES
      )}
    FROM events
    GROUP BY day
    """,
    tags=("pivot", "agg"),
)
def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily event-type value matrix. Explicit pivot values so
    the plan is a single pass (no distinct-values pre-query) — the
    100 TB form; dynamic pivot would scan twice."""
    e = load_table(spark, sf_dir, "events")
    pivoted = (
        e.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.sum("value"))
    )
    return pivoted.select(
        "day",
        *[dround(F.coalesce(F.col(t), F.lit(0.0)), 4).alias(t) for t in EVENT_TYPES],
    )


@register(
    "q_unpivot_lineitem",
    oracle=f"""
    WITH base AS (
      SELECT l_returnflag,
             SUM(l_extendedprice) AS extendedprice,
             SUM(l_discount) AS discount,
             SUM(l_tax) AS tax
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, {dround_sql("amount", 4)} AS amount
    FROM base
    UNPIVOT (amount FOR measure IN (extendedprice, discount, tax))
    ORDER BY l_returnflag, measure
    """,
    tags=("unpivot", "reshape"),
)
def q_unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) via the built-in unpivot operator — a
    narrow per-row expansion, no shuffle beyond the base aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    base = l.groupBy("l_returnflag").agg(
        F.sum("l_extendedprice").alias("extendedprice"),
        F.sum("l_discount").alias("discount"),
        F.sum("l_tax").alias("tax"),
    )
    return (
        base.unpivot(
            ["l_returnflag"],
            ["extendedprice", "discount", "tax"],
            "measure",
            "amount",
        )
        .select("l_returnflag", "measure", dround("amount", 4).alias("amount"))
        .orderBy("l_returnflag", "measure")
    )


# Knuth multiplicative hash — exact in BIGINT arithmetic on both
# engines, so the sample membership is bit-identical cross-engine and
# stable under re-partitioning (unlike rand()-based sampling).
_KNUTH = 2654435761
_MOD = 4294967296


@register(
    "q_sample_hash",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    WHERE (doc_id * {_KNUTH}) % {_MOD} < {_MOD} // 10
    ORDER BY doc_id
    """,
    tags=("sample", "filter"),
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% key-hash sample (train/holdout splitting).

    Scale: a pure narrow filter — no shuffle, no state, and the same
    doc is in the same split on every engine/run/partitioning, which
    rand()/TABLESAMPLE cannot guarantee."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_MOD)
    return (
        d.filter(bucket < _MOD // 10)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@register(
    "q_sample_stratified",
    oracle=f"""
    SELECT source, COUNT(*) AS n_sampled
    FROM documents
    WHERE (doc_id * {_KNUTH}) % {_MOD} < {_MOD} // 5
    GROUP BY source
    ORDER BY source
    """,
    tags=("sample", "agg"),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum counts of a deterministic 20% sample — the
    monitoring query behind stratified split QA."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_MOD)
    return (
        d.filter(bucket < _MOD // 5)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("source")
    )



@register(
    "q_dq_checks",
    oracle="""
    SELECT 'not_null:o_custkey' AS check_name, CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations FROM orders
    UNION ALL
    SELECT 'unique:o_orderkey', CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'range:l_discount', CAST(SUM(CASE WHEN l_discount IS NOT NULL AND (l_discount < 0 OR l_discount > 0.5) THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'fk:o_custkey', CAST(COUNT(*) AS BIGINT)
    FROM (SELECT o_custkey FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
    ORDER BY check_name
    """,
    tags=("quality", "validation", "etl"),
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality report over the star schema: null check, key
    uniqueness, value-range check, and FK referential integrity (the
    constraints Postgres enforced for the reference, run as explicit
    pre-sink operators here)."""
    from skopje_spark.operators.quality import (
        check_foreign_key,
        check_in_range,
        check_not_null,
        check_unique,
        run_checks,
    )

    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    return run_checks(
        check_not_null(o, "o_custkey"),
        check_unique(o, ["o_orderkey"]),
        check_in_range(l, "l_discount", 0.0, 0.5),
        check_foreign_key(o, "o_custkey", c, "c_custkey"),
    ).orderBy("check_name")


@register(
    "q_merge_upsert",
    oracle=f"""
    WITH target AS (
      SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    source AS (
      SELECT o_custkey, SUM(o_totalprice) AS total
      FROM orders WHERE o_orderdate >= DATE '1995-01-01'
      GROUP BY o_custkey
    )
    SELECT COALESCE(t.c_custkey, s.o_custkey) AS custkey,
           CASE WHEN t.c_custkey IS NOT NULL AND s.o_custkey IS NOT NULL THEN 'updated'
                WHEN t.c_custkey IS NULL THEN 'inserted'
                ELSE 'kept' END AS merge_action,
           {dround_sql('CASE WHEN t.c_custkey IS NOT NULL AND s.o_custkey IS NOT NULL '
                       'THEN t.c_acctbal + s.total '
                       'WHEN t.c_custkey IS NULL THEN s.total '
                       'ELSE t.c_acctbal END', 2)} AS merged_val
    FROM target t FULL OUTER JOIN source s ON t.c_custkey = s.o_custkey
    """,
    tags=("merge", "upsert", "join", "relational"),
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as a pure relational plan — the way an
    engine without a transactional table format executes an upsert
    (and the shape behind sinks/files.py:parquet_upsert): full outer
    join of target and source on the key, then per-row action
    classification (matched → update, source-only → insert,
    target-only → keep). One shuffle join at any scale; the oracle is
    an independent FULL OUTER derivation of the same contract."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    target = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_acctbal"
    )
    source = (
        o.filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("total"))
    )
    j = target.join(source, target["c_custkey"] == source["o_custkey"], "full_outer")
    matched = target["c_custkey"].isNotNull() & source["o_custkey"].isNotNull()
    return j.select(
        F.coalesce(target["c_custkey"], source["o_custkey"]).alias("custkey"),
        F.when(matched, F.lit("updated"))
        .when(target["c_custkey"].isNull(), F.lit("inserted"))
        .otherwise(F.lit("kept"))
        .alias("merge_action"),
        dround(
            F.when(matched, target["c_acctbal"] + source["total"])
            .when(target["c_custkey"].isNull(), source["total"])
            .otherwise(target["c_acctbal"]),
            2,
        ).alias("merged_val"),
    )


@register(
    "q_null_semantics",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           NULLIF(l_linenumber % 3, 0) AS trio,
           COALESCE(NULLIF(l_linenumber % 3, 0), -1) AS trio_filled,
           CAST(NULLIF(l_linenumber % 3, 0) IS NOT DISTINCT FROM
                NULLIF(l_partkey % 3, 0) AS INTEGER) AS nullsafe_eq,
           CAST(NULLIF(l_linenumber % 3, 0) IS NULL AS INTEGER) AS is_null_flag
    FROM lineitem
    """,
    tags=("null", "semantics", "relational", "scalar"),
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic surface: NULLIF / COALESCE / null-safe
    equality (Spark's <=> vs SQL's IS NOT DISTINCT FROM) / IS NULL —
    the semantics every Postgres fetch_stmt leans on and the classic
    cross-engine divergence trap (NULL = NULL is NULL, but
    NULL <=> NULL is TRUE; the oracle checks every row agrees)."""
    l = load_table(spark, sf_dir, "lineitem")
    trio = F.nullif(F.col("l_linenumber") % 3, F.lit(0))
    trio_p = F.nullif(F.col("l_partkey") % 3, F.lit(0))
    return l.select(
        "l_orderkey",
        "l_linenumber",
        trio.alias("trio"),
        F.coalesce(trio, F.lit(-1)).alias("trio_filled"),
        trio.eqNullSafe(trio_p).cast("int").alias("nullsafe_eq"),
        trio.isNull().cast("int").alias("is_null_flag"),
    )


@register(
    "q_agg_misc",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
           CAST(bool_and(l_quantity > 0) AS INTEGER) AS all_positive,
           CAST(bool_or(l_discount > 0.05) AS INTEGER) AS any_discounted,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',')
             AS statuses
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "misc", "count_if", "bool"),
)
def q_agg_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The long tail of the aggregate surface: conditional counting
    (count_if / FILTER clause), universal and existential boolean
    aggregates, and a deterministic set digest (sort_array over
    collect_set — collection order is scheduling-dependent, the
    sorted join is not)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
        F.bool_and(F.col("l_quantity") > 0).cast("int").alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.05).cast("int").alias("any_discounted"),
        F.array_join(
            F.sort_array(F.collect_set("l_linestatus")), ","
        ).alias("statuses"),
    )
