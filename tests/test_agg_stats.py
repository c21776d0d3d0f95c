"""Unit tests: metadata-only aggregates
(sinks/versioned.py:versioned_agg_stats) — COUNT(*)/MIN/MAX/COUNT(col)
folded from manifest footer stats with zero data-file opens on the
pristine path, and an exact partial-scan fallback for entries whose
stats cannot answer (deletion vectors, all-null files, stats-unsafe
types, suspiciously long string bounds)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from skopje_spark.sinks.versioned import (
    versioned_agg_stats,
    versioned_delete,
    versioned_read,
    versioned_rename_column,
    versioned_tag,
    versioned_write,
)


def _true_aggs(spark, path, cols, **kw):
    df = versioned_read(spark, path, **kw)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            a
            for c in cols
            for a in (
                F.min(c).alias(f"mn_{c}"),
                F.max(c).alias(f"mx_{c}"),
                F.count(c).alias(f"ct_{c}"),
            )
        ],
    ).collect()[0]
    return row


def _check_exact(spark, path, res, cols, **kw):
    truth = _true_aggs(spark, path, cols, **kw)
    assert res["count_rows"] == truth["n"]
    for c in cols:
        slot = res["columns"][c]
        t_mn, t_mx = truth[f"mn_{c}"], truth[f"mx_{c}"]
        if isinstance(t_mn, dt.date):
            t_mn, t_mx = t_mn.isoformat(), t_mx.isoformat()
        assert slot["min"] == t_mn, (c, slot, t_mn)
        assert slot["max"] == t_mx, (c, slot, t_mx)
        assert slot["count"] == truth[f"ct_{c}"], c


def test_pristine_table_answers_with_zero_opens(spark, tmp_path):
    path = str(tmp_path / "ag1")
    rows = [
        (i, f"s{i:03d}", float(i) / 2, dt.date(2024, 1, 1 + i % 28),
         None if i % 5 == 0 else i * 10)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["k", "s", "f", "d", "n"])
    versioned_write(df.repartition(4), path)
    cols = ["k", "s", "f", "d", "n"]
    res = versioned_agg_stats(spark, path, cols)
    assert res["files_opened"] == 0
    assert res["files_total"] >= 2
    _check_exact(spark, path, res, cols)


def test_dv_deleted_extremum_forces_partial_scan_and_stays_exact(
    spark, tmp_path
):
    path = str(tmp_path / "ag2")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(100)], ["k", "x"]
    )
    # cluster by k so the max row sits in one known file
    versioned_write(
        df.repartitionByRange(4, "k").sortWithinPartitions("k"), path
    )
    versioned_delete(spark, path, "k = 99")  # DV, no rewrite
    res = versioned_agg_stats(spark, path, ["k", "x"])
    # only the DV'd file needed opening
    assert 1 <= res["files_opened"] < res["files_total"]
    assert res["columns"]["k"]["max"] == 98
    assert res["columns"]["x"]["max"] == 980
    assert res["count_rows"] == 99
    _check_exact(spark, path, res, ["k", "x"])


def test_all_null_file_falls_back_and_stays_exact(spark, tmp_path):
    from pyspark.sql.types import (
        IntegerType, StructField, StructType, StringType,
    )

    path = str(tmp_path / "ag3")
    sch = StructType(
        [StructField("k", IntegerType()), StructField("s", StringType())]
    )
    a = spark.createDataFrame([(1, "x"), (2, "y")], sch)
    b = spark.createDataFrame([(3, None), (4, None)], sch)
    versioned_write(a.coalesce(1).unionByName(b.coalesce(1)).repartitionByRange(2, "k"), path)
    res = versioned_agg_stats(spark, path, ["s"])
    # the all-null file has no usable min/max stats → it is opened
    _check_exact(spark, path, res, ["s"])
    assert res["columns"]["s"]["count"] == 2


def test_renamed_column_answers_under_logical_name(spark, tmp_path):
    path = str(tmp_path / "ag4")
    versioned_write(
        spark.createDataFrame([(1, 5), (2, 9)], ["k", "old"]), path
    )
    versioned_rename_column(path, "old", "new")
    res = versioned_agg_stats(spark, path, ["new"])
    assert res["files_opened"] == 0
    assert res["columns"]["new"] == {"min": 5, "max": 9, "count": 2}
    with pytest.raises(KeyError, match="old"):
        versioned_agg_stats(spark, path, ["old"])


def test_time_travel_and_ref_pin_the_snapshot(spark, tmp_path):
    path = str(tmp_path / "ag5")
    versioned_write(spark.createDataFrame([(1,), (5,)], ["k"]), path)
    versioned_tag(path, "rel")
    versioned_write(spark.createDataFrame([(10,), (50,)], ["k"]), path)
    assert versioned_agg_stats(spark, path, ["k"])["columns"]["k"] == {
        "min": 10, "max": 50, "count": 2,
    }
    for kw in ({"version": 0}, {"ref": "rel"}):
        res = versioned_agg_stats(spark, path, ["k"], **kw)
        assert res["columns"]["k"] == {"min": 1, "max": 5, "count": 2}
        assert res["files_opened"] == 0


def test_long_string_bounds_are_distrusted_but_exact(spark, tmp_path):
    path = str(tmp_path / "ag6")
    big = "z" * 5000
    versioned_write(
        spark.createDataFrame([(1, "a"), (2, big)], ["k", "s"]), path
    )
    res = versioned_agg_stats(spark, path, ["s"], max_stat_strlen=64)
    assert res["files_opened"] >= 1  # suspicious bounds → verify by scan
    assert res["columns"]["s"] == {"min": "a", "max": big, "count": 2}
    # the int column still answers stats-only on the same table
    res_k = versioned_agg_stats(spark, path, ["k"])
    assert res_k["files_opened"] == 0


def test_timestamp_column_scans_but_is_exact(spark, tmp_path):
    path = str(tmp_path / "ag7")
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 3)), (2, dt.datetime(2024, 6, 1, 9))],
        ["k", "ts"],
    )
    versioned_write(df, path)
    res = versioned_agg_stats(spark, path, ["ts"])
    # timestamps are outside the manifest's stats-safe domain —
    # answered by the fallback scan, still exact
    assert res["files_opened"] >= 1
    assert res["columns"]["ts"]["min"] == dt.datetime(2024, 1, 1, 3)
    assert res["columns"]["ts"]["max"] == dt.datetime(2024, 6, 1, 9)
    assert res["columns"]["ts"]["count"] == 2


def test_unknown_column_raises(spark, tmp_path):
    path = str(tmp_path / "ag8")
    versioned_write(spark.createDataFrame([(1,)], ["k"]), path)
    with pytest.raises(KeyError, match="nope"):
        versioned_agg_stats(spark, path, ["nope"])
