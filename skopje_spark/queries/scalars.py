"""Scalar-function catalog: string, date, math, conditional, array,
JSON, explode (SURVEY.md §2B scalar rows; the reference's date utils
``/root/reference/src/util.rs:2-15`` map to to_date/from_unixtime).

Dialect care: every expression is written so Spark and DuckDB produce
bit-identical results (e.g. natural log spelled ``ln`` in DuckDB,
``pmod`` emulated as ``((a % b) + b) % b``, libm-dependent outputs
rounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from skopje_spark.queries import register
from skopje_spark.queries.rounding import dround
from skopje_spark.tables import load_table


@register(
    "q_string_funcs",
    oracle="""
    SELECT
      c_custkey,
      CONCAT(c_name, ':', c_mktsegment)           AS tagged,
      SUBSTRING(c_name, 1, 8)                     AS prefix,
      UPPER(c_mktsegment)                         AS seg_upper,
      LOWER(c_name)                               AS name_lower,
      TRIM('  ' || c_mktsegment || ' ')           AS trimmed,
      LENGTH(c_name)                              AS name_len,
      len(string_split(c_name, '0'))              AS n_zero_splits,
      regexp_extract(c_name, '([0-9]+)', 1)       AS digits,
      CASE WHEN c_name LIKE 'Customer#00000000%' THEN 1 ELSE 0 END AS is_low_key,
      REPLACE(c_name, 'Customer', 'Cust')         AS renamed
    FROM customer
    """,
    tags=("scalar", "string"),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat / substring / case / trim / length / split / regexp /
    LIKE / replace — all JVM-side built-ins (no UDF)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("tagged"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "trimmed"
        ),
        F.length("c_name").alias("name_len"),
        F.size(F.split("c_name", "0")).alias("n_zero_splits"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.when(F.col("c_name").like("Customer#00000000%"), 1).otherwise(0).alias(
            "is_low_key"
        ),
        F.regexp_replace("c_name", "Customer", "Cust").alias("renamed"),
    )


@register(
    "q_date_funcs",
    oracle="""
    SELECT
      o_orderkey,
      CAST(year(o_orderdate) AS INT)    AS yr,
      CAST(month(o_orderdate) AS INT)   AS mon,
      CAST(day(o_orderdate) AS INT)     AS dom,
      date_trunc('month', o_orderdate)                  AS month_start,
      strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')         AS due_date,
      datediff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
      CAST(epoch(o_orderdate) AS BIGINT)                AS epoch_s,
      strftime(to_timestamp(epoch(o_orderdate)), '%Y-%m-%d')      AS date_roundtrip,
      strftime(o_orderdate, '%Y-%m-%d')                 AS iso
    FROM orders
    """,
    tags=("scalar", "date"),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date kitchen-sink, incl. both reference util fns: epoch→date
    (`convert_timestamp`, ``/root/reference/src/util.rs:2-6``) via
    from_unixtime, and string→date (`convert_date_type`,
    ``/root/reference/src/util.rs:9-15``) via date_format/to_date."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(
            F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_y2k"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format(
            F.from_unixtime(F.unix_timestamp("o_orderdate")), "yyyy-MM-dd"
        ).alias("date_roundtrip"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso"),
    )


@register(
    "q_math_funcs",
    oracle="""
    SELECT
      l_orderkey, l_linenumber,
      (CASE WHEN (l_extendedprice) < 0 THEN -(FLOOR((-(l_extendedprice)) * 10.0 + 0.5) / 10.0) ELSE FLOOR((l_extendedprice) * 10.0 + 0.5) / 10.0 END)                       AS price_r1,
      ABS(l_discount - 0.05)                          AS disc_dev,
      CAST(CEIL(l_quantity) AS BIGINT)                AS qty_ceil,
      CAST(FLOOR(l_quantity) AS BIGINT)               AS qty_floor,
      (CASE WHEN (POW(1.0 + l_tax, 2)) < 0 THEN -(FLOOR((-(POW(1.0 + l_tax, 2))) * 1000000.0 + 0.5) / 1000000.0) ELSE FLOOR((POW(1.0 + l_tax, 2)) * 1000000.0 + 0.5) / 1000000.0 END)                   AS tax_sq,
      (CASE WHEN (LN(l_extendedprice)) < 0 THEN -(FLOOR((-(LN(l_extendedprice))) * 1000000.0 + 0.5) / 1000000.0) ELSE FLOOR((LN(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 END)                   AS price_ln,
      (CASE WHEN (LOG10(l_extendedprice)) < 0 THEN -(FLOOR((-(LOG10(l_extendedprice))) * 1000000.0 + 0.5) / 1000000.0) ELSE FLOOR((LOG10(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 END)                AS price_log10,
      (CASE WHEN (SQRT(l_quantity)) < 0 THEN -(FLOOR((-(SQRT(l_quantity))) * 1000000.0 + 0.5) / 1000000.0) ELSE FLOOR((SQRT(l_quantity)) * 1000000.0 + 0.5) / 1000000.0 END)                      AS qty_sqrt,
      ((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7      AS key_pmod7,
      CAST(SIGN(l_discount - 0.05) AS INT)              AS disc_sign
    FROM lineitem
    """,
    tags=("scalar", "math"),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/pow/ln/log10/sqrt/pmod/sign. libm-touching
    outputs rounded to 6 dp (JVM vs C math libs differ in last ulp)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        dround("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        dround(F.pow(F.lit(1.0) + F.col("l_tax"), 2), 6).alias("tax_sq"),
        dround(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        dround(F.log10("l_extendedprice"), 6).alias("price_log10"),
        dround(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("key_pmod7"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@register(
    "q_conditional_funcs",
    oracle="""
    SELECT
      c_custkey,
      CASE WHEN c_acctbal < 0 THEN 'DEBT'
           WHEN c_acctbal < 5000 THEN 'MID'
           ELSE 'RICH' END                                  AS tier,
      COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_or_default,
      GREATEST(c_acctbal, 0.0)                              AS bal_floor0,
      LEAST(c_acctbal, 1000.0)                              AS bal_cap1000,
      IF(c_nationkey % 2 = 0, 'even', 'odd')                AS key_parity
    FROM customer
    """,
    tags=("scalar", "conditional"),
)
def q_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """case/when, coalesce, nullif, greatest/least, if."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "DEBT")
        .when(F.col("c_acctbal") < 5000, "MID")
        .otherwise("RICH")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULT"))
        .alias("seg_or_default"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_cap1000"),
        F.when(F.col("c_nationkey") % 2 == 0, "even").otherwise("odd").alias(
            "key_parity"
        ),
    )


@register(
    "q_json_funcs",
    oracle="""
    SELECT
      event_id,
      CAST(json_extract(props, '$.k') AS BIGINT)        AS k_val,
      json_extract_string(props, '$.k')                 AS k_str,
      CASE WHEN json_valid(props) THEN 1 ELSE 0 END     AS is_valid
    FROM events
    """,
    tags=("scalar", "json"),
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (the reference's serde-JSON
    boundary, ``/root/reference/src/extract/fs.rs:11``): get_json_object
    + schema-full from_json."""
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json(
        F.col("props"), T.StructType([T.StructField("k", T.LongType())])
    )
    return e.select(
        "event_id",
        parsed.getField("k").alias("k_val"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.when(parsed.isNotNull(), 1).otherwise(0).alias("is_valid"),
    )


@register(
    "q_array_funcs",
    oracle="""
    SELECT
      vec_id,
      len(embedding)                                   AS dim,
      (CASE WHEN (CAST(embedding[1] AS DOUBLE)) < 0 THEN -(FLOOR((-(CAST(embedding[1] AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0) ELSE FLOOR((CAST(embedding[1] AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 END)           AS first_val,
      (CASE WHEN (CAST(list_aggregate(embedding, 'max') AS DOUBLE)) < 0 THEN -(FLOOR((-(CAST(list_aggregate(embedding, 'max') AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0) ELSE FLOOR((CAST(list_aggregate(embedding, 'max') AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 END) AS max_val,
      (CASE WHEN (CAST(list_aggregate(embedding, 'min') AS DOUBLE)) < 0 THEN -(FLOOR((-(CAST(list_aggregate(embedding, 'min') AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0) ELSE FLOOR((CAST(list_aggregate(embedding, 'min') AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 END) AS min_val,
      (CASE WHEN (list_sum(CAST(embedding AS DOUBLE[]))) < 0 THEN -(FLOOR((-(list_sum(CAST(embedding AS DOUBLE[])))) * 10000.0 + 0.5) / 10000.0) ELSE FLOOR((list_sum(CAST(embedding AS DOUBLE[]))) * 10000.0 + 0.5) / 10000.0 END)  AS vec_sum,
      len(list_filter(embedding, x -> x > 0))          AS n_positive
    FROM embeddings
    """,
    tags=("scalar", "array", "hof"),
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over the embedding column: size,
    element_at, array_max/min, aggregate (sum), filter. These are the
    building blocks of the similarity operators — all JVM-side."""
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        dround(F.element_at(F.col("embedding"), 1).cast("double"), 6).alias(
            "first_val"
        ),
        dround(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        dround(F.array_min("embedding").cast("double"), 6).alias("min_val"),
        dround(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vec_sum"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "q_explode_wordcount",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (
      SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
      FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
    tags=("explode", "udtf"),
)
def q_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (lateral/UDTF surface): tokenize → explode → count →
    top-20. Scale: explode is a narrow op; the count is a classic
    map-side-combine wordcount — shuffle carries one row per distinct
    word per partition."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@register(
    "q_map_funcs",
    oracle="""
    SELECT
      event_type,
      n,
      CAST(map_from_entries ->> 'type' AS VARCHAR) AS type_echo
    FROM (
      SELECT event_type, COUNT(*) AS n,
             json_object('type', event_type) AS map_from_entries
      FROM events GROUP BY event_type
    )
    """,
    tags=("scalar", "map"),
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element access (map_from/element_at); the
    DuckDB oracle round-trips through a JSON object since DuckDB maps
    serialize differently — values compared are the extracted scalars."""
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    m = F.create_map(F.lit("type"), F.col("event_type"))
    return agg.select(
        "event_type", "n", F.element_at(m, F.lit("type")).alias("type_echo")
    )


@register(
    "q_events_variant",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
    FROM events
    GROUP BY 1
    """,
    tags=("scalar", "json", "variant"),
)
def q_events_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads through Spark 4's VARIANT type:
    ``parse_json`` once into a binary variant, then typed path
    extraction with ``try_variant_get`` — the modern engine-native
    answer to the reference's serde-deserialize step
    (``/root/reference/src/extract/http.rs:139``), and strictly faster
    than re-parsing JSON text per field at 100 TB (the variant is
    parsed once and stored columnar-shredded).

    Histogram of the payload's `k` field in buckets of 10."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return (
        e.select(k.alias("k"), "event_type")
        .groupBy(F.floor(F.col("k") / 10).cast("bigint").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )
