"""Mergeable sketch state (operators/sketches.py): slice-merge
equivalence, error bounds, and merge-order determinism contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from skopje_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_state,
    kll_merge,
    kll_quantiles,
    kll_state,
)


def _fixture(spark, n=20_000):
    return spark.range(n).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 4567).alias("v"),
        F.col("id").cast("double").alias("d"),
        (F.col("id") % 5).alias("day"),
    )


def test_hll_slice_merge_matches_single_pass(spark):
    """Union of per-slice states estimates the same set as one global
    pass — the property that makes per-day persistence sound. The
    union sketch is a different representation than the single-pass
    one (the Datasketches union targets HLL_8), so estimates are
    band-equal, not byte-equal; but the union itself is deterministic
    (per-bucket max, no randomness) — merging twice is identical."""
    df = _fixture(spark)
    whole = hll_estimate(hll_state(df, ["g"], "v"))
    parts = [
        hll_state(df.filter(F.col("day") == d), ["g"], "v") for d in range(5)
    ]
    merged = hll_estimate(hll_merge(parts, ["g"]))
    again = hll_estimate(hll_merge(parts, ["g"]))
    w = {r["g"]: r["approx_distinct"] for r in whole.collect()}
    m = {r["g"]: r["approx_distinct"] for r in merged.collect()}
    m2 = {r["g"]: r["approx_distinct"] for r in again.collect()}
    assert m == m2  # HLL union is deterministic
    for g in w:
        assert abs(w[g] - m[g]) <= max(3, 0.02 * w[g])  # same set, band-equal


def test_hll_estimate_within_band_of_exact(spark):
    df = _fixture(spark)
    est = hll_estimate(hll_state(df, ["g"], "v"))
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    for r in est.collect():
        assert abs(r["approx_distinct"] - exact[r["g"]]) <= max(3, 0.05 * exact[r["g"]])


def test_kll_merged_quantiles_within_rank_band(spark):
    """Merged per-slice KLL quantiles land within the ±4% rank band of
    the exact order statistics (k=200 guarantees ~1.65% at 99%)."""
    df = _fixture(spark)
    st = kll_state(df, ["g"], "d", slice_col="day", k=200)
    q = kll_quantiles(kll_merge(st, ["g"]), [0.5, 0.95])
    vals = {
        g: sorted(
            r["d"] for r in df.filter(F.col("g") == g).select("d").collect()
        )
        for g in range(3)
    }
    for r in q.collect():
        v = vals[r["g"]]
        n = len(v)
        for p, got in ((0.5, r["p50"]), (0.95, r["p95"])):
            lo = v[max(0, int((p - 0.04) * n) - 1)]
            hi = v[min(n - 1, int((p + 0.04) * n) + 1)]
            assert lo <= got <= hi, (r["g"], p, got, lo, hi)


def test_kll_merge_band_holds_under_reordering(spark):
    """KLL compaction is coin-flip randomized, so merged sketches are
    never byte-comparable — the testable contract is that the rank
    band holds however the states are presented (and on repeated
    merges of the same states)."""
    df = _fixture(spark, n=5_000)
    st = kll_state(df, ["g"], "d", slice_col="day", k=200).cache()
    try:
        vals = {
            g: sorted(
                r["d"] for r in df.filter(F.col("g") == g).select("d").collect()
            )
            for g in range(3)
        }
        for order in (F.asc("kll_slice"), F.desc("kll_slice")):
            q = kll_quantiles(kll_merge(st.orderBy(order), ["g"]), [0.5])
            for r in q.collect():
                v = vals[r["g"]]
                n = len(v)
                lo = v[max(0, int(0.46 * n) - 1)]
                hi = v[min(n - 1, int(0.54 * n) + 1)]
                assert lo <= r["p50"] <= hi, (r["g"], r["p50"], lo, hi)
    finally:
        st.unpersist()


def test_hll_state_survives_parquet_roundtrip(spark, tmp_path):
    """The binary sketch column is persistable: write per-slice states
    to parquet, read them back in a later 'session', merge with fresh
    states, estimate — the incremental pattern the module exists for."""
    df = _fixture(spark)
    old = hll_state(df.filter(F.col("day") < 3), ["g"], "v")
    path = str(tmp_path / "hll_states")
    old.write.mode("overwrite").parquet(path)

    reloaded = spark.read.parquet(path)
    fresh = hll_state(df.filter(F.col("day") >= 3), ["g"], "v")
    merged = hll_estimate(hll_merge([reloaded, fresh], ["g"]))
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    got = {r["g"]: r["approx_distinct"] for r in merged.collect()}
    assert set(got) == set(exact)
    for g, n in exact.items():
        assert abs(got[g] - n) <= max(3, 0.05 * n)


# --- KMV ---------------------------------------------------------------


def test_kmv_exact_mode_and_invariance(spark):
    """Below k distinct the sketch IS the distinct set (estimate
    exact); the synopsis is a pure function of the value set —
    independent of partitioning; merge is idempotent."""
    from skopje_spark.operators.sketches import kmv_estimate, kmv_merge, kmv_state

    small = spark.range(0, 100).select(F.col("id").alias("v"))
    k = 256
    sk = kmv_state(small, "v", k=k)
    assert kmv_estimate(sk, k=k).collect()[0][0] == 100.0

    big = spark.range(0, 40000).select(F.col("id").alias("v"))
    s1 = sorted(r["h"] for r in kmv_state(big.repartition(1), "v", k=k).collect())
    s17 = sorted(r["h"] for r in kmv_state(big.repartition(17), "v", k=k).collect())
    assert s1 == s17 and len(s1) == k

    sa = kmv_state(big, "v", k=k)
    assert sorted(r["h"] for r in kmv_merge(sa, sa, k=k).collect()) == s1


def test_kmv_overlap_estimates_set_ops(spark):
    """A=[0,40k), B=[20k,60k): union 60k, intersection 20k, J=1/3.
    k=512 gives sigma ~4.4% relative — assert inside 15% (>3 sigma;
    measured errors ~3%)."""
    from skopje_spark.operators.sketches import kmv_estimate, kmv_overlap, kmv_state

    k = 512
    a = spark.range(0, 40000).select(F.col("id").alias("v"))
    b = spark.range(20000, 60000).select(F.col("id").alias("v"))
    sa, sb = kmv_state(a, "v", k=k), kmv_state(b, "v", k=k)
    est_a = kmv_estimate(sa, k=k).collect()[0][0]
    assert abs(est_a - 40000) <= 0.15 * 40000
    ov = kmv_overlap(sa, sb, k=k).collect()[0]
    assert abs(ov["union_est"] - 60000) <= 0.15 * 60000
    assert abs(ov["intersect_est"] - 20000) <= 0.20 * 20000
    assert abs(ov["jaccard_est"] - 1 / 3) <= 0.10
