"""Units for IVM fold-forward, sampled join-size estimation, and PSI
drift (operators/ivm.py, operators/estimate.py, quality.psi_drift)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skopje_spark.operators.cdc import snapshot_diff
from skopje_spark.operators.estimate import key_sample, sampled_join_size
from skopje_spark.operators.ivm import ivm_apply, ivm_build, ivm_read
from skopje_spark.operators.quality import psi_drift


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def _view_rows(view):
    cols = sorted(view.columns)
    return sorted(tuple(r) for r in view.select(*cols).collect())


@pytest.fixture(scope="module")
def snaps(spark):
    """Old/new snapshot pair exercising I, U (incl. group moves), D,
    and a group that empties entirely. Integer measures → exact SUM."""
    old = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "a", 20),
            (3, "b", 30),
            (4, "b", 40),
            (5, "gone", 50),  # D: group empties
            (6, "a", 60),     # U: moves a -> b with a new value
        ],
        "id int, grp string, v int",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),     # unchanged
            (2, "a", 25),     # U in place
            (3, "b", 30),
            (4, "b", 40),
            (6, "b", 61),     # U moved groups
            (7, "c", 70),     # I into a brand-new group
        ],
        "id int, grp string, v int",
    )
    return old, new


def test_ivm_fold_equals_rebuild(snaps):
    old, new = snaps
    view0 = ivm_build(old, ["grp"], sum_cols=["v"])
    cl = snapshot_diff(old, new, ["id"])
    folded = ivm_apply(
        view0, cl, old, table_keys=["id"], group_keys=["grp"], sum_cols=["v"]
    )
    assert _view_rows(folded) == _view_rows(ivm_build(new, ["grp"], sum_cols=["v"]))


def test_ivm_minmax_refresh_equals_rebuild(snaps):
    old, new = snaps
    view0 = ivm_build(
        old, ["grp"], sum_cols=["v"], min_cols=["v"], max_cols=["v"]
    )
    cl = snapshot_diff(old, new, ["id"])
    folded = ivm_apply(
        view0, cl, old,
        table_keys=["id"], group_keys=["grp"], sum_cols=["v"],
        min_cols=["v"], max_cols=["v"], new=new,
    )
    rebuilt = ivm_build(
        new, ["grp"], sum_cols=["v"], min_cols=["v"], max_cols=["v"]
    )
    assert _view_rows(folded) == _view_rows(rebuilt)


def test_ivm_empty_changelog_is_identity(snaps):
    old, _ = snaps
    view0 = ivm_build(old, ["grp"], sum_cols=["v"])
    cl = snapshot_diff(old, old, ["id"])
    assert cl.count() == 0
    folded = ivm_apply(
        view0, cl, old, table_keys=["id"], group_keys=["grp"], sum_cols=["v"]
    )
    assert _view_rows(folded) == _view_rows(view0)


def test_ivm_minmax_requires_new_snapshot(snaps):
    old, new = snaps
    view0 = ivm_build(old, ["grp"], sum_cols=["v"], min_cols=["v"])
    cl = snapshot_diff(old, new, ["id"])
    with pytest.raises(ValueError, match="new snapshot"):
        ivm_apply(
            view0, cl, old,
            table_keys=["id"], group_keys=["grp"],
            sum_cols=["v"], min_cols=["v"],
        )


def test_ivm_read_derives_avg(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20)], "id int, grp string, v int"
    )
    view = ivm_build(df, ["grp"], sum_cols=["v"])
    out = ivm_read(view, ["grp"], sum_cols=["v"], avg_cols=["v"]).collect()[0]
    assert out["n_rows"] == 2 and out["sum_v"] == 30 and out["avg_v"] == 15.0


def test_key_sample_is_all_or_nothing_per_key(spark, sf_dir):
    """Every sampled key keeps ALL its rows — the property that makes
    the sampled sub-join an unbiased miniature of the real one."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = key_sample(l, "l_orderkey", rate=0.2)
    per_key = (
        l.groupBy("l_orderkey").count()
        .join(s.groupBy("l_orderkey").count().withColumnRenamed("count", "sc"),
              "l_orderkey")
    )
    assert per_key.filter(F.col("count") != F.col("sc")).count() == 0


def test_sampled_join_size_in_band(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    est = sampled_join_size(o, l, "o_orderkey", "l_orderkey", rate=0.2).collect()[0]
    exact = o.join(l, o.o_orderkey == l.l_orderkey).count()
    assert abs(est["est_join_size"] - exact) <= 0.15 * exact
    assert 0 < est["sampled_keys"] < exact


def test_sampled_join_size_deterministic(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = sampled_join_size(o, l, "o_orderkey", "l_orderkey", rate=0.1).collect()[0]
    b = sampled_join_size(o, l, "o_orderkey", "l_orderkey", rate=0.1).collect()[0]
    assert a["est_join_size"] == b["est_join_size"]
    c = sampled_join_size(o, l, "o_orderkey", "l_orderkey", rate=0.1, seed=99)
    assert c.collect()[0]["est_join_size"] != a["est_join_size"]


def test_psi_zero_for_identical_distributions(spark):
    df = spark.createDataFrame(
        [(i, "x" if i % 3 else "y") for i in range(300)], "id int, cat string"
    )
    out = psi_drift(df, df, "cat").collect()
    assert all(r["psi_contrib"] == 0.0 for r in out)
    assert all(r["share_a"] == r["share_b"] for r in out)


def test_psi_detects_shift(spark):
    a = spark.createDataFrame(
        [(i, "x" if i % 2 else "y") for i in range(400)], "id int, cat string"
    )
    b = spark.createDataFrame(
        [(i, "x" if i % 10 else "y") for i in range(400)], "id int, cat string"
    )
    total = sum(r["psi_contrib"] for r in psi_drift(a, b, "cat").collect())
    assert total > 0.25  # "action" threshold on a 50/50 -> 90/10 shift
    assert all(r["psi_contrib"] >= 0 for r in psi_drift(a, b, "cat").collect())


def test_psi_one_sided_category_is_finite(spark):
    a = spark.createDataFrame([(1, "only_a")] * 10, "id int, cat string")
    b = spark.createDataFrame([(1, "only_b")] * 10, "id int, cat string")
    rows = psi_drift(a, b, "cat").collect()
    assert len(rows) == 2
    for r in rows:
        assert r["psi_contrib"] is not None and r["psi_contrib"] > 0


def test_psi_null_category_lines_up_across_sides(spark):
    """NULL is a legitimate category: identical distributions with
    NULLs must report zero drift (a non-null-safe join would split the
    NULL group into two one-sided rows and alarm falsely)."""
    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else "x") for i in range(90)],
        "id int, cat string",
    )
    out = psi_drift(df, df, "cat").collect()
    assert len(out) == 2  # {NULL, 'x'} — one row each, not three
    assert all(r["psi_contrib"] == 0.0 for r in out)


def test_key_sample_works_on_string_keys(spark, sf_dir):
    """String/UUID-shaped keys must neither crash (ANSI cast) nor
    collapse to one NULL key; and int vs string physical types of the
    same values must select the same keys (cross-type join sides)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    as_str = o.selectExpr("cast(o_orderkey as string) as k")
    sampled_str = key_sample(as_str, "k", rate=0.2)
    sampled_int = key_sample(o, "o_orderkey", rate=0.2)
    got_str = {int(r["k"]) for r in sampled_str.select("k").distinct().collect()}
    got_int = {r["o_orderkey"] for r in
               sampled_int.select("o_orderkey").distinct().collect()}
    assert got_str == got_int and 0 < len(got_int) < o.count()


def test_microrows_missing_before_image_fails_loudly(spark):
    """A changelog whose U row has no before-image in the old snapshot
    must raise, not silently drop the debit."""
    from pyspark.sql.utils import AnalysisException

    from skopje_spark.operators.ivm import changelog_microrows

    old = spark.createDataFrame([(1, "a", 10)], "id int, grp string, v int")
    bad_changelog = spark.createDataFrame(
        [(99, "a", 11, "U")], "id int, grp string, v int, __op string"
    )
    delta = changelog_microrows(bad_changelog, old, ["id"], ["grp"], ["v"])
    with pytest.raises(Exception) as ei:
        delta.collect()
    assert "before-image" in str(ei.value)


def test_join_advice_recommends_broadcast_for_tiny_side(spark, sf_dir):
    from skopje_spark.operators.estimate import join_advice

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    # nation is 25 rows: any sane row_bytes keeps it under the threshold
    card = join_advice(
        n, o, "n_nationkey", "o_custkey", rate=0.5
    ).collect()[0]
    assert card["recommendation"] == "broadcast_a"


def test_join_advice_detects_skew(spark):
    from skopje_spark.operators.estimate import join_advice

    # one key carries ~90% of the joined mass on both sides
    a = spark.createDataFrame(
        [(0,)] * 300 + [(i,) for i in range(1, 40)], "k int"
    )
    b = spark.createDataFrame(
        [(0,)] * 300 + [(i,) for i in range(1, 40)], "k int"
    )
    card = join_advice(
        a, b, "k", "k", rate=0.9, broadcast_bytes=0
    ).collect()[0]
    assert card["recommendation"] == "salt"
    assert card["top_key_share"] > 0.5


def test_join_advice_plain_shuffle_case(spark, sf_dir):
    from skopje_spark.operators.estimate import join_advice

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    card = join_advice(
        o, l, "o_orderkey", "l_orderkey", rate=0.3, broadcast_bytes=0
    ).collect()[0]
    # fan-out <= 7 per order key: no key dominates, no broadcast allowed
    assert card["recommendation"] == "shuffle"
    assert card["top_key_share"] < 0.05
    assert card["est_join_size"] > 0


def test_psi_binned_identical_and_shifted(spark):
    """psi_drift_binned: identical numeric distributions give PSI ≈ 0
    on every bin; a location shift concentrates mass in disjoint bins
    and produces a large PSI; NULLs form their own category; a
    constant column degenerates to one bin with zero drift."""
    from skopje_spark.operators.quality import psi_drift_binned

    a = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    same = psi_drift_binned(a, a, "x", n_bins=10).collect()
    assert sum(r["psi_contrib"] for r in same) == 0.0
    assert len(same) == 10

    b = spark.createDataFrame([(float(i) + 80,) for i in range(100)], "x double")
    shifted = psi_drift_binned(a, b, "x", n_bins=10).collect()
    psi = sum(r["psi_contrib"] for r in shifted)
    assert psi > 0.25  # "action" territory on a hard shift
    # one-sided bins exist on both ends
    assert any(r["n_b"] == 0 and r["n_a"] > 0 for r in shifted)
    assert any(r["n_a"] == 0 and r["n_b"] > 0 for r in shifted)

    withnull = spark.createDataFrame(
        [(1.0,), (None,), (None,)], "x double"
    )
    rep = psi_drift_binned(withnull, withnull, "x", n_bins=4).collect()
    assert any(r["bin_id"] is None and r["n_a"] == 2 for r in rep)

    const = spark.createDataFrame([(5.0,)] * 8, "x double")
    one = psi_drift_binned(const, const, "x", n_bins=4).collect()
    assert len(one) == 1 and one[0]["bin_id"] == 0
    assert one[0]["psi_contrib"] == 0.0


def test_psi_binned_explicit_bounds_clamp(spark):
    """bounds=(lo, hi) skips the union min/max pass and clamps
    out-of-range values into the edge bins (fixed monitoring
    histogram); inverted bounds are rejected."""
    import pytest

    from skopje_spark.operators.quality import psi_drift_binned

    a = spark.createDataFrame([(-5.0,), (2.0,), (50.0,)], "x double")
    b = spark.createDataFrame([(2.0,), (2.0,), (2.0,)], "x double")
    rep = {r["bin_id"]: r for r in
           psi_drift_binned(a, b, "x", n_bins=4, bounds=(0.0, 8.0)).collect()}
    assert rep[0]["n_a"] == 1   # -5 clamped into bin 0
    assert rep[3]["n_a"] == 1   # 50 clamped into last bin
    assert rep[1]["n_a"] == 1 and rep[1]["n_b"] == 3  # 2.0 in [2,4)
    with pytest.raises(ValueError, match="inverted"):
        psi_drift_binned(a, b, "x", bounds=(8.0, 0.0))


def test_ivm_changelog_caches_are_bounded(spark, snaps):
    """Repeated refreshes must not accumulate persisted changelogs: the
    generation registry retires superseded caches, so a long-lived
    session holds at most _CHANGELOG_CACHE_KEEP of them (round-14
    hygiene item: the fold's persist() was never unpersisted)."""
    from skopje_spark.operators import ivm as ivm_mod

    old, new = snaps
    view0 = ivm_build(old, ["grp"], sum_cols=["v"])

    def cached_count():
        sc = spark.sparkContext
        return sum(1 for _ in sc._jsc.sc().getRDDStorageInfo())

    base = cached_count()
    for _ in range(5):
        cl = snapshot_diff(old, new, ["id"])
        folded = ivm_apply(
            view0, cl, old, table_keys=["id"], group_keys=["grp"],
            sum_cols=["v"],
        )
        folded.count()  # materialize -> populates the persist
    # at most the kept generations remain beyond whatever storage
    # pre-existed (other tests' checkpoints share the session)
    assert cached_count() <= base + ivm_mod._CHANGELOG_CACHE_KEEP
