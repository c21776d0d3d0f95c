"""Salted-join equivalence and bucketed-join zero-exchange tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skopje_spark.operators.skew import salted_join, write_bucketed
from skopje_spark.plans import num_shuffles


def test_salted_join_matches_plain_join(spark):
    # one hot key (90% of rows) + a long tail
    left = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, F.lit(7)).otherwise(F.col("id") % 50)
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(50)], "k bigint, name string"
    )
    plain = left.join(right, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(left, right, "k", n_salts=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], "k bigint, v string")
    right = spark.createDataFrame([(1, "dim1")], "k bigint, name string")
    out = salted_join(left, right, "k", n_salts=4, how="left").collect()
    got = {r["k"]: r["name"] for r in out}
    assert got == {1: "dim1", 99: None}


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import shutil

    # drop catalog entries AND any orphaned managed-table location left
    # by an interrupted earlier run (saveAsTable refuses to reuse it)
    for t in ("bt_orders", "bt_lines"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    o = spark.range(0, 1000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 5).alias("status")
    )
    l = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("o_orderkey"), F.col("id").alias("amount")
    )
    write_bucketed(o, "bt_orders", ["o_orderkey"], n_buckets=8,
                   sort_cols=["o_orderkey"])
    write_bucketed(l, "bt_lines", ["o_orderkey"], n_buckets=8,
                   sort_cols=["o_orderkey"])

    bo, bl = spark.table("bt_orders"), spark.table("bt_lines")
    # force sort-merge (broadcast would trivially have no shuffle and
    # prove nothing about the bucketing layout)
    joined = bo.hint("merge").join(bl, "o_orderkey")
    # co-located: the join itself requires no shuffle of either side
    assert num_shuffles(joined) == 0
    assert joined.count() == 5000


def test_bucketed_qualified_name_orphan_path(spark, tmp_path):
    """ADVICE r3: a db-qualified table's orphan lives at
    warehouse/<db>.db/<tbl>; deriving warehouse/<tbl> could rmtree an
    unrelated default-database table. The cleanup must target the
    right directory and reject >2-part names."""
    import pytest as _pytest

    from skopje_spark.sinks.bucketed import _drop_table_and_orphan

    # bare names and db-qualified names resolve without touching
    # unrelated paths; 3-part names are rejected up front
    _drop_table_and_orphan(spark, "nonexistent_tbl")
    _drop_table_and_orphan(spark, "somedb.nonexistent_tbl")
    with _pytest.raises(ValueError):
        _drop_table_and_orphan(spark, "cat.db.tbl")
