"""Unit tests for operators/cdc.py: snapshot diff, changelog apply,
SCD2 historization."""

from __future__ import annotations

from pyspark.sql import functions as F

from skopje_spark.operators.cdc import apply_changes, scd2_apply, snapshot_diff


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_snapshot_diff_classifies_iud(spark):
    old = _df(spark, [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"])
    new = _df(spark, [(2, "b", 20.0), (3, "c", 99.0), (4, "d", 40.0)], ["k", "s", "v"])
    got = {
        r["k"]: r["__op"]
        for r in snapshot_diff(old, new, keys=["k"]).collect()
    }
    # 1 deleted, 2 unchanged (absent), 3 updated, 4 inserted
    assert got == {1: "D", 3: "U", 4: "I"}


def test_snapshot_diff_null_safe_compare(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "k int, s string")
    new = spark.createDataFrame([(1, None), (2, None)], "k int, s string")
    got = {r["k"]: r["__op"] for r in snapshot_diff(old, new, keys=["k"]).collect()}
    # NULL == NULL is "unchanged"; x -> NULL is an update
    assert got == {2: "U"}


def test_snapshot_diff_null_new_image_preserved(spark):
    # an update that sets a value to NULL must report NULL as the NEW
    # image (a coalesce(new, old) projection would leak the old value);
    # deletes still carry their OLD values
    old = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
    new = spark.createDataFrame([(1, None)], "k int, v double")
    rows = {r["k"]: r for r in snapshot_diff(old, new, keys=["k"]).collect()}
    assert rows[1]["__op"] == "U" and rows[1]["v"] is None
    assert rows[2]["__op"] == "D" and rows[2]["v"] == 20.0
    # and replaying the changelog still reproduces new exactly
    diff = snapshot_diff(old, new, keys=["k"])
    replayed = apply_changes(old, diff, keys=["k"]).collect()
    assert [(r["k"], r["v"]) for r in replayed] == [(1, None)]


def test_apply_changes_roundtrip_randomized(spark):
    # property: apply(old, diff(old, new)) == new, on hash-derived data
    base = spark.range(0, 500).select(
        F.col("id").alias("k"),
        (F.col("id") * 2654435761 % 97).alias("v"),
    )
    old = base.filter(F.col("k") % 7 != 0)
    new = base.filter(F.col("k") % 5 != 0).withColumn(
        "v", F.when(F.col("k") % 3 == 0, F.col("v") + 1).otherwise(F.col("v"))
    )
    diff = snapshot_diff(old, new, keys=["k"])
    applied = apply_changes(old, diff, keys=["k"])
    assert applied.exceptAll(new).count() == 0
    assert new.exceptAll(applied).count() == 0


def test_scd2_apply_slices(spark):
    dim = _df(
        spark,
        [
            (1, "a", "2020-01-01", None, 1),   # unchanged (update equal)
            (2, "b", "2020-01-01", None, 1),   # changed -> close + new
            (3, "c", "2020-01-01", None, 1),   # untouched (no update)
            (9, "z", "2019-01-01", "2020-01-01", 0),  # history passthrough
        ],
        ["k", "attr", "valid_from", "valid_to", "is_current"],
    )
    upd = _df(spark, [(1, "a"), (2, "B"), (5, "e")], ["k", "attr"])
    out = scd2_apply(dim, upd, keys=["k"], track_cols=["attr"], load_ts="2021-06-01")
    rows = {(r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in out.collect()}
    assert rows == {
        (1, "a", "2020-01-01", None, 1),
        (2, "b", "2020-01-01", "2021-06-01", 0),
        (2, "B", "2021-06-01", None, 1),
        (3, "c", "2020-01-01", None, 1),
        (5, "e", "2021-06-01", None, 1),
        (9, "z", "2019-01-01", "2020-01-01", 0),
    }


def test_scd2_invariants(spark):
    # after any apply: exactly one current row per live key, and closed
    # rows have valid_to set
    dim = spark.createDataFrame(
        [(i, f"v{i}", "2020-01-01", None, 1) for i in range(50)],
        "k int, attr string, valid_from string, valid_to string, is_current int",
    )
    upd = _df(spark, [(i, f"w{i}" if i % 2 else f"v{i}") for i in range(30, 70)],
              ["k", "attr"])
    out = scd2_apply(dim, upd, keys=["k"], track_cols=["attr"], load_ts="2021-01-01")
    per_key = out.filter(F.col("is_current") == 1).groupBy("k").count()
    assert per_key.filter(F.col("count") != 1).count() == 0
    assert out.filter((F.col("is_current") == 0) & F.col("valid_to").isNull()).count() == 0


def test_digest_update_tracks_snapshot_diff(spark):
    """Incremental view maintenance of the bounded digest: folding a
    CDC changelog (with before-images for U/D, as real changelogs
    carry) into digest(old) must equal digest(new) computed from
    scratch — exactly, including counts, sums, and xors."""
    from pyspark.sql import functions as F

    from skopje_spark.operators.cdc import snapshot_diff
    from skopje_spark.operators.quality import table_digest, table_digest_update

    old = spark.createDataFrame(
        [(i, f"v{i % 13}", i % 7) for i in range(300)],
        "k bigint, a string, b int",
    )
    # new: 10 deletes, 10 updates, 15 inserts
    new = (
        old.filter(F.col("k") >= 10)
        .withColumn(
            "a",
            F.when(F.col("k") < 20, F.concat(F.col("a"), F.lit("_upd"))).otherwise(
                F.col("a")
            ),
        )
        .unionByName(
            spark.createDataFrame(
                [(1000 + i, f"new{i}", i) for i in range(15)],
                "k bigint, a string, b int",
            )
        )
    )
    keys, cols, nb = ["k"], ["k", "a", "b"], 8
    diff = snapshot_diff(old, new, keys)
    ins = diff.filter(F.col("__op").isin("I", "U")).select("k", "a", "b")
    # before-images for the delete side of U and for D
    del_keys = diff.filter(F.col("__op").isin("D", "U")).select("k")
    dels = old.join(del_keys, "k", "semi")

    updated = table_digest_update(
        table_digest(old, keys, cols, n_buckets=nb, exact=False),
        ins,
        dels,
        keys,
        cols,
        n_buckets=nb,
    )
    fresh = table_digest(new, keys, cols, n_buckets=nb, exact=False)

    def snap(frame):
        return {
            r["bucket"]: (r["n_rows"], r["digest_sum"], r["digest_xor"])
            for r in frame.collect()
        }

    assert snap(updated) == snap(fresh)


def test_versioned_digest_frames_fold_exactly(spark, tmp_path):
    """versioned_digest_frames closes the time-travel → digest-IVM
    loop: folding its (inserts, deletes) into the v0 digest equals
    the fresh digest of the latest snapshot in every bucket —
    INCLUDING updates that change digest columns, the case where
    feeding the raw changelog (U rows carry new values only) silently
    diverges (also pinned here)."""
    from skopje_spark.operators.quality import table_digest, table_digest_update
    from skopje_spark.sinks.versioned import (
        versioned_digest_frames,
        versioned_read,
        versioned_write,
    )

    path = str(tmp_path / "digivm")
    rows0 = [(i, f"v{i % 7}", f"p{i % 3}") for i in range(200)]
    df0 = spark.createDataFrame(rows0, "k bigint, a string, b string")
    versioned_write(df0, path)

    # v1: delete k<20, update a for 20<=k<40 (changes a digest col),
    # insert 200..230
    rows1 = (
        [(i, "CHANGED", f"p{i % 3}") for i in range(20, 40)]
        + [(i, f"v{i % 7}", f"p{i % 3}") for i in range(40, 200)]
        + [(i, f"v{i % 7}", f"p{i % 3}") for i in range(200, 230)]
    )
    versioned_write(spark.createDataFrame(rows1, "k bigint, a string, b string"), path)

    keys, cols, nb = ["k"], ["k", "a", "b"], 16
    d0 = table_digest(df0, keys, cols, n_buckets=nb, exact=False)
    ins, dels = versioned_digest_frames(spark, path, keys, from_version=0)
    ivm = table_digest_update(d0, ins, dels, keys, cols, n_buckets=nb)
    fresh = table_digest(
        versioned_read(spark, path), keys, cols, n_buckets=nb, exact=False
    )

    def snap(frame):
        return {
            r["bucket"]: (r["n_rows"], r["digest_sum"], r["digest_xor"])
            for r in frame.collect()
        }

    assert snap(ivm) == snap(fresh)

    # the naive wiring — raw changelog rows as both sides — diverges
    # for the updated keys (it subtracts NEW images, not before-images)
    from pyspark.sql import functions as F

    from skopje_spark.operators.cdc import snapshot_diff

    ch = snapshot_diff(df0, versioned_read(spark, path), keys)
    naive_ins = ch.filter(F.col("__op").isin("I", "U")).select("k", "a", "b")
    naive_del = ch.filter(F.col("__op").isin("U", "D")).select("k", "a", "b")
    naive = table_digest_update(d0, naive_ins, naive_del, keys, cols, n_buckets=nb)
    assert snap(naive) != snap(fresh)
