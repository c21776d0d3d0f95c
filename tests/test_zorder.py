"""Z-order layout tests: Morton-code correctness and the property the
layout exists for — per-file min/max boxes narrow on EVERY clustered
dimension, which single-column range clustering cannot provide."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from skopje_spark.sources.skipping import (
    column_ranges,
    write_clustered,
    write_manifest,
    write_zordered,
    zorder_col,
)


def test_zorder_bit_interleave_known_values(spark):
    # 2 columns already spanning [0, 255]: cell == value, so the
    # z-value is the textbook Morton interleave
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "x long, y long"
    )
    z = zorder_col([F.col("x"), F.col("y")], [(0, 255), (0, 255)], bits=8)
    got = {(r["x"], r["y"]): r["z"] for r in df.withColumn("z", z).collect()}

    def morton(x, y):
        out = 0
        for j in range(8):
            out |= ((x >> j) & 1) << (2 * j)
            out |= ((y >> j) & 1) << (2 * j + 1)
        return out

    for (x, y), v in got.items():
        assert v == morton(x, y), (x, y, v)


def test_zorder_layout_bounds_both_dims(spark, tmp_path):
    """Against the same 64k-point grid, z-ordered files have small
    min/max boxes on BOTH x and y; x-range-clustered files cover the
    full y domain (skip-nothing for y predicates)."""
    n, files = 256, 16
    df = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        )
    )
    zpath = os.path.join(str(tmp_path), "zorder")
    rpath = os.path.join(str(tmp_path), "range_x")
    write_zordered(df, zpath, ["x", "y"], n_files=files)
    write_clustered(df, rpath, "x", n_files=files)
    write_manifest(spark, zpath, ["x", "y"])
    write_manifest(spark, rpath, ["x", "y"])

    def avg_span(path, col):
        man = spark.read.parquet(os.path.join(path, "_skip_manifest"))
        spans = [
            r[f"max_{col}"] - r[f"min_{col}"] for r in man.collect()
        ]
        return sum(spans) / len(spans)

    # z-order: both dims bounded well below the full domain (255)
    assert avg_span(zpath, "x") < 110
    assert avg_span(zpath, "y") < 110
    # x-clustering: x tight but y spans essentially everything
    assert avg_span(rpath, "x") < 40
    assert avg_span(rpath, "y") > 220


def test_column_ranges_exact(spark):
    df = spark.createDataFrame([(3, 10), (7, -2), (5, 4)], "a long, b long")
    assert column_ranges(df, ["a", "b"]) == [(3, 7), (-2, 10)]


def test_zorder_all_null_column_defaults_to_cell_zero(spark):
    """An all-null clustered column yields (None, None) ranges; the
    z-value must treat it as constant cell 0 instead of int(None)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,), (5,), (9,)], "a long").withColumn(
        "b", F.lit(None).cast("long")
    )
    ranges = column_ranges(df, ["a", "b"])
    assert ranges[1] == (None, None)
    z = df.select(zorder_col([F.col("a"), F.col("b")], ranges, bits=4).alias("z"))
    vals = sorted(r["z"] for r in z.collect())
    assert vals[0] >= 0 and len(vals) == 3
