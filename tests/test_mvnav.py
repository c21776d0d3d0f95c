"""Aggregate-navigator routing and exactness (operators/mvnav.py)."""

from __future__ import annotations

import pytest

from skopje_spark.operators.mvnav import (
    AggView,
    answerable,
    mv_answer,
)


@pytest.fixture()
def base(spark):
    rows = [
        ("a", "x", 10.0), ("a", "x", 20.0), ("a", "y", 30.0),
        ("b", "x", 5.0), ("b", "y", None), ("b", "y", 15.0),
    ]
    return spark.createDataFrame(rows, "k1 string, k2 string, v double")


def _views(spark, base):
    from pyspark.sql import functions as F

    fine = base.groupBy("k1", "k2").agg(
        F.sum("v").alias("v_sum"),
        F.count("v").alias("v_cnt"),
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("v_min"),
        F.max("v").alias("v_max"),
    )
    coarse = base.groupBy("k1").agg(
        F.sum("v").alias("v_sum"),
        F.count("v").alias("v_cnt"),
    )
    fine_df, coarse_df = fine.cache(), coarse.cache()
    return [
        AggView("fine", ("k1", "k2"),
                {"v_sum": ("sum", "v"), "v_cnt": ("count", "v"),
                 "n": ("count", "*"), "v_min": ("min", "v"),
                 "v_max": ("max", "v")},
                load=lambda s, d=fine_df: d),
        AggView("coarse", ("k1",),
                {"v_sum": ("sum", "v"), "v_cnt": ("count", "v")},
                load=lambda s, d=coarse_df: d),
    ]


def test_routes_to_smallest_compatible_view(spark, base):
    views = _views(spark, base)
    out, src = mv_answer(spark, views, base, ["k1"],
                         {"total": ("sum", "v")})
    assert src == "coarse"
    got = {r.k1: r.total for r in out.collect()}
    assert got == {"a": 60.0, "b": 20.0}


def test_finer_request_uses_fine_view(spark, base):
    views = _views(spark, base)
    out, src = mv_answer(spark, views, base, ["k1", "k2"],
                         {"hi": ("max", "v")})
    assert src == "fine"
    got = {(r.k1, r.k2): r.hi for r in out.collect()}
    assert got[("a", "x")] == 20.0 and got[("b", "y")] == 15.0


def test_avg_needs_per_measure_count_and_is_null_exact(spark, base):
    views = _views(spark, base)
    # coarse has sum+count(v): avg derivable and must ignore the null
    out, src = mv_answer(spark, views, base, ["k1"],
                         {"mean": ("avg", "v")})
    assert src == "coarse"
    got = {r.k1: r.mean for r in out.collect()}
    assert got["b"] == pytest.approx(10.0)  # (5+15)/2, null excluded
    # a view carrying ONLY count(*) cannot answer avg
    v = AggView("starred", ("k1",), {"v_sum": ("sum", "v"),
                                     "n": ("count", "*")},
                load=lambda s: None)
    assert not answerable(v, ["k1"], {"mean": ("avg", "v")})


def test_fallback_when_no_view_qualifies(spark, base):
    views = _views(spark, base)
    out, src = mv_answer(spark, views, base, ["k2"],
                         {"total": ("sum", "v")})
    # k2 alone: fine view has it... k2 ⊆ (k1,k2) so fine qualifies
    assert src == "fine"
    # but an unknown key falls back to base
    out, src = mv_answer(spark, views, base.withColumnRenamed("k2", "k3"),
                         ["k3"], {"total": ("sum", "v")})
    assert src == "__base__"
    got = {r.k3: r.total for r in out.collect()}
    assert got == {"x": 35.0, "y": 45.0}


def test_key_filters_apply_pre_rollup(spark, base):
    views = _views(spark, base)
    out, src = mv_answer(spark, views, base, ["k1"],
                         {"total": ("sum", "v")},
                         filters={"k2": ["x"]})
    assert src == "fine"  # the filter column forces the finer view
    got = {r.k1: r.total for r in out.collect()}
    assert got == {"a": 30.0, "b": 5.0}
    # filter on a non-key column: no view qualifies
    _, src = mv_answer(spark, views, base, ["k1"],
                       {"total": ("sum", "v")}, filters={"v": [5.0]})
    assert src == "__base__"


def test_sql_rewrite_routes_and_matches_plain_sql(spark, base):
    from skopje_spark.operators.mvnav import rewrite_sql

    views = _views(spark, base)
    sql = ("SELECT k1, SUM(v) AS total, AVG(v) AS mean "
           "FROM facts WHERE k2 IN ('x') GROUP BY k1")
    out, src = rewrite_sql(spark, views, {"facts": base}, sql)
    assert src == "fine"
    rewritten = {(r.k1): (r.total, r.mean) for r in out.collect()}
    base.createOrReplaceTempView("facts")
    plain = {(r.k1): (r.total, r.mean) for r in spark.sql(sql).collect()}
    assert rewritten == plain


def test_sql_rewrite_declines_unknown_shapes(spark, base):
    from skopje_spark.operators.mvnav import rewrite_sql

    views = _views(spark, base)
    # HAVING is outside the grammar: must run as plain SQL, not rewrite
    sql = ("SELECT k1, SUM(v) AS total FROM facts "
           "GROUP BY k1 HAVING SUM(v) > 10")
    out, src = rewrite_sql(spark, views, {"facts": base}, sql)
    assert src == "__sql__"
    assert {r.k1: r.total for r in out.collect()} == {"a": 60.0, "b": 20.0}
    # range predicate (not IN) likewise declines
    sql2 = "SELECT k1, SUM(v) AS total FROM facts WHERE v > 1 GROUP BY k1"
    _, src2 = rewrite_sql(spark, views, {"facts": base}, sql2)
    assert src2 == "__sql__"


def test_ivm_maintained_view_answers_queries(spark):
    """Composition: a view built by ivm_build, folded forward by
    ivm_apply after the base changes, must answer navigator requests
    with the POST-change truth — maintenance and rewrite are the same
    table."""
    from skopje_spark.operators.ivm import ivm_build, ivm_apply
    from skopje_spark.operators.cdc import snapshot_diff
    from skopje_spark.operators.mvnav import agg_view_of_ivm, mv_answer

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
        "id bigint, seg string, v bigint")
    new = spark.createDataFrame(
        [(1, "a", 15), (3, "b", 30), (4, "b", 40)],
        "id bigint, seg string, v bigint")
    view0 = ivm_build(old, ["seg"], sum_cols=["v"])
    diff = snapshot_diff(old, new, keys=["id"])
    view1 = ivm_apply(view0, diff, old, ["id"], ["seg"],
                      sum_cols=["v"]).cache()
    av = agg_view_of_ivm("seg_rollup", ["seg"], sum_cols=["v"],
                         load=lambda s: view1)
    out, src = mv_answer(
        spark, [av], new, ["seg"],
        {"n": ("count", "*"), "total": ("sum", "v"), "mean": ("avg", "v")})
    assert src == "seg_rollup"
    got = {r.seg: (r.n, r.total, float(r.mean)) for r in out.collect()}
    assert got == {"a": (1, 15, 15.0), "b": (2, 70, 35.0)}


def test_sql_rewrite_declines_duplicate_aliases(spark, base):
    from skopje_spark.operators.mvnav import parse_agg_select

    assert parse_agg_select(
        "SELECT k1, SUM(v) AS x, COUNT(v) AS x FROM facts GROUP BY k1"
    ) is None
    assert parse_agg_select(
        "SELECT k1, SUM(v) AS k1 FROM facts GROUP BY k1"
    ) is None


def test_sql_fallback_restores_preexisting_temp_view(spark, base):
    from skopje_spark.operators.mvnav import rewrite_sql

    mine = spark.createDataFrame([(99,)], "z bigint")
    mine.createOrReplaceTempView("facts")
    views = _views(spark, base)
    sql = ("SELECT k1, SUM(v) AS total FROM facts "
           "GROUP BY k1 HAVING SUM(v) > 10")
    out, src = rewrite_sql(spark, views, {"facts": base}, sql)
    assert src == "__sql__"
    assert {r.k1: r.total for r in out.collect()} == {"a": 60.0, "b": 20.0}
    # the session's own 'facts' view is back afterwards
    assert [r.z for r in spark.table("facts").collect()] == [99]
    spark.catalog.dropTempView("facts")


def test_aggview_is_hashable(spark, base):
    views = _views(spark, base)
    assert len({*views}) == 2
