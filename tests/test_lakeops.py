"""Unit tests: ORC source/sink roundtrip, small-file compaction,
incremental rollup state merging."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from skopje_spark.operators.rollup import rollup_finalize, rollup_merge, rollup_state
from skopje_spark.sinks.files import compact_parquet, orc_sink
from skopje_spark.sources.files import orc_source


def test_orc_roundtrip(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 7).alias("g"), (F.col("id") * 1.5).alias("v")
    )
    path = str(tmp_path / "t_orc")
    orc_sink(df, path, mode="overwrite")
    back = orc_source(spark, path)
    assert back.count() == 100
    assert back.exceptAll(df).count() == 0
    # column pruning arg
    assert orc_source(spark, path, columns=["id", "v"]).columns == ["id", "v"]


def test_compact_parquet_reduces_files(spark, tmp_path):
    path = str(tmp_path / "t_small")
    # 64 tiny files
    spark.range(0, 10000).repartition(64).write.parquet(path)
    before = len(glob.glob(os.path.join(path, "*.parquet")))
    assert before >= 32
    n = compact_parquet(spark, path, target_file_bytes=10 * 1024 * 1024)
    after = len(glob.glob(os.path.join(path, "*.parquet")))
    assert after == n == 1
    assert spark.read.parquet(path).count() == 10000
    assert not os.path.exists(path + "__stage") and not os.path.exists(path + "__old")


def test_rollup_merge_associative(spark):
    df = spark.range(0, 3000).select(
        (F.col("id") % 5).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    keys, vals = ["k"], ["v"]
    # three batches merged in different groupings must agree with the
    # single-batch state
    b = [
        rollup_state(df.filter(F.col("id") % 3 == i), keys, vals) for i in range(3)
    ]
    full = rollup_finalize(rollup_state(df, keys, vals), keys, vals)
    merged_once = rollup_finalize(rollup_merge(b, keys, vals), keys, vals)
    merged_nested = rollup_finalize(
        rollup_merge([rollup_merge(b[:2], keys, vals), b[2]], keys, vals), keys, vals
    )
    assert full.exceptAll(merged_once).count() == 0
    assert merged_once.exceptAll(merged_nested).count() == 0
    assert merged_nested.exceptAll(full).count() == 0


def test_xml_roundtrip(spark, tmp_path):
    from skopje_spark.sinks.files import xml_sink
    from skopje_spark.sources.files import xml_source

    df = spark.range(0, 50).select(
        F.col("id"), (F.col("id") % 3).alias("g"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
    )
    path = str(tmp_path / "t_xml")
    xml_sink(df, path, row_tag="item", root_tag="items", mode="overwrite")
    back = xml_source(spark, path, row_tag="item",
                      schema="id long, g long, name string")
    assert back.count() == 50
    assert back.exceptAll(df).count() == 0
    # inferred-schema read + column pruning
    cols = xml_source(spark, path, row_tag="item", columns=["id", "name"]).columns
    assert cols == ["id", "name"]
