"""Format-roundtrip, skew-mitigation, and provenance queries under the
driver gate.

Three production surfaces that existed as operators/unit tests but had
no oracle-gated entry:

- ORC write→read (the second columnar format besides parquet) proven
  value-exact through a full roundtrip;
- :func:`skopje_spark.operators.skew.salted_join` proven
  row-equivalent to the plain join it replaces (the oracle IS the
  plain join) — the explicit tool for hot keys AQE's runtime skew
  splitting can't save;
- per-row source-file provenance (``input_file_name``) — the lineage
  column every training-data pipeline carries so a bad shard can be
  traced and excised after the fact.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.queries import register
from skopje_spark.queries.rounding import dround, dround_sql
from skopje_spark.tables import load_table


@register(
    "q_format_orc_roundtrip",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS line_count,
           {dround_sql("SUM(l_quantity)", 2)} AS sum_qty
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("formats", "orc", "roundtrip"),
)
def q_format_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → ORC → aggregate: the oracle reads the original
    parquet, so any value drift through the ORC writer/reader
    (type mapping, date handling, nulls) fails the hash. Written
    partitioned by return flag to exercise the partitioned-sink path
    in the second format too."""
    from skopje_spark.sinks.files import orc_sink
    from skopje_spark.sources.files import orc_source

    out = tempfile.mkdtemp(prefix="skopje_orc_") + "/lineitem"
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_shipdate"
    ).filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
    orc_sink(li, out, mode="overwrite", partition_by=["l_returnflag"])
    back = orc_source(spark, out)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("line_count"),
        dround(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "q_join_skew_salted",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS line_count,
           {dround_sql("SUM(l_extendedprice)", 2)} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("join", "skew", "salting"),
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⨝dim join: the large side's keys spread across 8
    salt values, the small side replicates once per salt, and the
    oracle is the PLAIN join — proving salting is a pure physical
    rewrite with identical row-level results. This is the manual
    fallback for a hot key so large that even AQE's split shuffle
    partitions overwhelm a single task."""
    from skopje_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(li, o, "o_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("line_count"),
        dround(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


@register(
    "q_provenance_source_files",
    oracle="""
    SELECT 'documents.parquet' AS source_file,
           COUNT(*) AS rows_from_file,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM documents
    """,
    tags=("provenance", "lineage"),
)
def q_provenance_source_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level provenance: every row carries the basename of the
    file it was scanned from (``input_file_name``), aggregated into a
    per-file manifest. On a single-file fixture the oracle pins the
    literal name + per-file extrema; at 100 TB the same column is what
    lets a poisoned shard be traced and excised without re-deriving
    the corpus."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn(
            "source_file",
            F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1),
        )
        .groupBy("source_file")
        .agg(
            F.count(F.lit(1)).alias("rows_from_file"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@register(
    "q_format_csv_roundtrip",
    oracle="""
    SELECT n_regionkey,
           COUNT(*) AS nations,
           MIN(n_name) AS first_name
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("formats", "csv", "roundtrip"),
)
def q_format_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → CSV (header) → explicit-schema read-back → aggregate.
    CSV is schemaless, so the read declares types instead of inferring
    them (inference is a full extra pass AND nondeterministic on
    partial data — never acceptable at scale); the oracle proves the
    declared schema reproduces the original values."""
    from skopje_spark.sinks.files import csv_sink
    from skopje_spark.sources.files import csv_source

    out = tempfile.mkdtemp(prefix="skopje_csv_") + "/nation"
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    csv_sink(n, out, mode="overwrite")
    back = csv_source(
        spark, out,
        schema="n_nationkey bigint, n_name string, n_regionkey bigint",
    )
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("nations"),
        F.min("n_name").alias("first_name"),
    )


@register(
    "q_format_xml_roundtrip",
    oracle="""
    SELECT r_regionkey, r_name
    FROM region
    """,
    tags=("formats", "xml", "roundtrip"),
)
def q_format_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → XML (rowTag records) → read-back with declared schema.
    XML is the interchange format regulators and legacy feeds still
    speak; Spark 4 ships the reader natively. The oracle reads the
    original parquet — any escaping/type loss through the XML cycle
    fails the hash."""
    from skopje_spark.sinks.files import xml_sink
    from skopje_spark.sources.files import xml_source

    out = tempfile.mkdtemp(prefix="skopje_xml_") + "/region"
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    xml_sink(r, out, row_tag="region", mode="overwrite")
    back = xml_source(
        spark, out, row_tag="region",
        schema="r_regionkey bigint, r_name string",
    )
    return back.select("r_regionkey", "r_name")
