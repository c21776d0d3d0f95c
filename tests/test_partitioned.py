"""First-class partition columns in the versioned store
(sinks/versioned.py): partition_by layout invariant, exact pruning
through the existing stats machinery, partition-preserving writes,
SHOW PARTITIONS, and the connector surface."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from skopje_spark.sinks.versioned import (
    _read_manifest,
    latest_version,
    snapshot_meta,
    table_partitioning,
    versioned_append,
    versioned_compact,
    versioned_partitions,
    versioned_pruned_read,
    versioned_read,
    versioned_rename_column,
    versioned_restore,
    versioned_upsert,
    versioned_write,
)


def _events(spark, n=60):
    """n rows over 3 string sources × 5 dates."""
    rows = [
        (
            i,
            f"src{i % 3}",
            dt.date(2024, 1, 1 + (i % 5)),
            f"payload-{i}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "id long, source string, day date, payload string"
    )


def test_partitioned_write_matches_unpartitioned_twin(spark, tmp_path):
    """Content is identical to the unpartitioned twin; the layout
    invariant holds (every file carries exactly one partition tuple);
    the spec is a carried, versioned table property."""
    df = _events(spark)
    p1 = str(tmp_path / "part")
    p2 = str(tmp_path / "flat")
    versioned_write(df, p1, partition_by=["source", "day"])
    versioned_write(df, p2)
    a = sorted(map(tuple, versioned_read(spark, p1).collect()))
    b = sorted(map(tuple, versioned_read(spark, p2).collect()))
    assert a == b and len(a) == 60
    assert table_partitioning(p1) == ["source", "day"]
    assert table_partitioning(p2) == []
    # invariant: one partition tuple per file, recorded on the entry,
    # with EXACT min==max injected stats under the physical name
    for e in _read_manifest(p1, 0)["files"]:
        part = e["partition"]
        assert set(part) == {"source", "day"}
        assert e["stats"]["source"]["min"] == e["stats"]["source"]["max"] == part["source"]
        assert e["stats"]["day"]["min"] == e["stats"]["day"]["max"] == part["day"]
        assert isinstance(part["day"], str)  # canonical ISO string
    # 3 sources × 5 days = 15 single-tuple files
    assert len(_read_manifest(p1, 0)["files"]) == 15


def test_partition_pruned_read_opens_only_matching_files(spark, tmp_path):
    """A one-partition read elects exactly that partition's files —
    exact pruning, not footer heuristics — and string + DATE
    partitions both prune. Rows are oracle-identical to a filter."""
    from skopje_spark.sinks.versioned import _interval_split, _stat_encode

    df = _events(spark)
    path = str(tmp_path / "t")
    versioned_write(df, path, partition_by=["source", "day"])
    entries = _read_manifest(path, 0)["files"]
    cand, skipped = _interval_split(entries, "source", "src1", "src1")
    assert len(cand) == 5 and len(skipped) == 10  # exactly src1's files
    d = dt.date(2024, 1, 3)
    cand_d, skipped_d = _interval_split(
        entries, "day", _stat_encode(d), _stat_encode(d)
    )
    assert len(cand_d) == 3 and len(skipped_d) == 12
    got = sorted(
        r["id"]
        for r in versioned_pruned_read(spark, path, "day", d, d).collect()
    )
    assert got == sorted(i for i in range(60) if i % 5 == 2)
    got2 = sorted(
        r["id"]
        for r in versioned_pruned_read(
            spark, path, "source", "src1", "src1"
        ).collect()
    )
    assert got2 == sorted(i for i in range(60) if i % 3 == 1)


def test_cross_partition_merge_rewrites_only_matched_partitions(
    spark, tmp_path
):
    """An upsert whose keys live in ONE partition rewrites only that
    partition's files; every other partition rides by reference."""
    df = _events(spark)
    path = str(tmp_path / "t")
    versioned_write(df, path, partition_by=["source"])
    before = {e["path"]: e for e in _read_manifest(path, 0)["files"]}
    upd = spark.createDataFrame(
        [(1, "src1", dt.date(2024, 1, 2), "NEW")],
        "id long, source string, day date, payload string",
    )
    # id is NOT clustered, but partitioning on source still bounds the
    # rewrite: merge on (source, id) prunes on source first
    versioned_upsert(spark, path, upd, ["source", "id"])
    assert int(snapshot_meta(path, "n_files_rewritten", version=1)) == 1
    after = {e["path"]: e for e in _read_manifest(path, 1)["files"]}
    carried = set(before) & set(after)
    # src0 and src2 files carried by reference, byte-identical entries
    assert len(carried) == 2
    for p in carried:
        assert before[p] == after[p]
        assert after[p]["partition"]["source"] != "src1"
    rows = {r["id"]: r["payload"] for r in versioned_read(spark, path).collect()}
    assert rows[1] == "NEW" and len(rows) == 60
    # the rewritten partition kept the layout invariant
    assert all("partition" in e for e in after.values())


def test_append_and_compact_preserve_partition_layout(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned_write(_events(spark, 30), path, partition_by=["source"])
    versioned_append(
        spark, path,
        spark.createDataFrame(
            [(100, "src9", dt.date(2024, 2, 1), "x"),
             (101, "src9", dt.date(2024, 2, 2), "y")],
            "id long, source string, day date, payload string",
        ),
    )
    parts = {p["source"]: p for p in versioned_partitions(path)}
    assert set(parts) == {"src0", "src1", "src2", "src9"}
    assert parts["src9"]["n_rows"] == 2 and parts["src9"]["n_files"] == 1
    # compaction rewrites but keeps one-tuple-per-file and the spec
    versioned_compact(spark, path, target_files=1)
    assert table_partitioning(path) == ["source"]
    for e in _read_manifest(path, latest_version(path))["files"]:
        assert set(e["partition"]) == {"source"}
    assert versioned_read(spark, path).count() == 32


def test_partition_null_and_spec_guards(spark, tmp_path):
    """NULL partition values round-trip (no min/max claim, exact null
    count); float partition columns are refused; renaming a partition
    column is refused; restore re-publishes the CONTENT's spec."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, None, "y"), (3, "a", "z")],
        "id long, grp string, payload string",
    )
    versioned_write(df, path, partition_by=["grp"])
    ent = _read_manifest(path, 0)["files"]
    nulls = [e for e in ent if e["partition"]["grp"] is None]
    assert len(nulls) == 1 and "grp" not in nulls[0]["stats"]
    got = sorted(
        (r["id"], r["grp"]) for r in versioned_read(spark, path).collect()
    )
    assert got == [(1, "a"), (2, None), (3, "a")]

    with pytest.raises(TypeError, match="partition column"):
        versioned_write(
            spark.createDataFrame([(1.5, "a")], "score double, v string"),
            str(tmp_path / "bad"),
            partition_by=["score"],
        )
    with pytest.raises(ValueError, match="partition column"):
        versioned_rename_column(path, "grp", "grp2")

    # restore: the layout claim follows the restored content
    versioned_write(  # unpartitioned full rewrite drops the spec
        df.select("id", "grp", "payload"), path
    )
    assert table_partitioning(path) == []
    versioned_restore(path, 0, spark=spark)
    assert table_partitioning(path) == ["grp"]
    assert versioned_partitions(path)  # listable again


def test_connector_prunes_on_partition_and_fanout_writes(spark, tmp_path):
    """pushFilters equality on a partition column (string AND date)
    plans exactly that partition's files; the Arrow writer APPENDS to
    a partitioned table through the fanout path — one-value-per-file
    preserved, exact injected stats, pruning still exact."""
    from pyspark.sql.datasource import EqualTo

    from skopje_spark.sources.lakesource import VersionedTableReader
    from skopje_spark.sources.pysource import register_all

    register_all(spark)
    path = str(tmp_path / "t")
    versioned_write(_events(spark), path, partition_by=["source", "day"])

    rd = VersionedTableReader({"path": path})
    list(rd.pushFilters([EqualTo(("source",), "src2")]))
    assert len(rd.partitions()) == 5
    rd2 = VersionedTableReader({"path": path})
    list(rd2.pushFilters([EqualTo(("day",), dt.date(2024, 1, 4))]))
    assert len(rd2.partitions()) == 3

    got = (
        spark.read.format("skopje_versioned").option("path", path).load()
        .filter("source = 'src2' and day = DATE'2024-01-04'")
    )
    assert sorted(r["id"] for r in got.collect()) == sorted(
        i for i in range(60) if i % 3 == 2 and i % 5 == 3
    )
    # connector append preserves the layout invariant + exact stats
    batch = spark.createDataFrame(
        [(200, "src0", dt.date(2024, 1, 2), "w-a"),
         (201, "src1", dt.date(2024, 1, 2), "w-b")],
        "id long, source string, day date, payload string",
    ).coalesce(1)
    (batch.write.format("skopje_versioned")
     .option("path", path).mode("append").save())
    v = latest_version(path)
    ent = _read_manifest(path, v)["files"]
    new = [e for e in ent if e["path"].endswith("-w.parquet")]
    assert len(new) == 2  # one file per partition tuple, same task
    for e in new:
        part = e["partition"]
        assert set(part) == {"source", "day"}
        s = part["source"]
        assert e["stats"]["source"] == {"min": s, "max": s, "nulls": 0}
        assert e["stats"]["day"] == {
            "min": "2024-01-02", "max": "2024-01-02", "nulls": 0
        }
    rows = {
        r["id"]: r["payload"]
        for r in versioned_read(spark, path).collect()
    }
    assert rows[200] == "w-a" and rows[201] == "w-b" and len(rows) == 62
    # pruning after the connector write stays exact
    rd3 = VersionedTableReader({"path": path})
    list(rd3.pushFilters([EqualTo(("day",), dt.date(2024, 1, 2))]))
    assert len(rd3.partitions()) == 5  # 3 original + 2 appended


def test_partition_disjoint_rebase_lands_metadata_only(spark, tmp_path):
    """The rebase disjointness proof rides the injected partition
    stats: two writers merging into DIFFERENT partitions resolve a
    lost CAS race metadata-only, even though their surrogate ids
    interleave (footer stats alone could not prove disjointness)."""
    path = str(tmp_path / "t")
    versioned_write(_events(spark), path, partition_by=["source"])
    mk = lambda i, s: spark.createDataFrame(  # noqa: E731
        [(i, s, dt.date(2024, 3, 1), f"w-{s}")],
        "id long, source string, day date, payload string",
    )
    # writer A lands on src0 → v1
    versioned_upsert(spark, path, mk(300, "src0"), ["source", "id"])
    # writer B still pinned to v0, targeting src2: key bounds on
    # 'source' are disjoint from A's added file → rebase, no re-derive
    v = versioned_upsert(
        spark, path, mk(301, "src2"), ["source", "id"],
        expected_version=0, rebase_on_conflict=True,
    )
    assert v == 2
    assert snapshot_meta(path, "rebased_onto", version=2) == "1"
    rows = {r["id"]: r["source"] for r in versioned_read(spark, path).collect()}
    assert rows[300] == "src0" and rows[301] == "src2" and len(rows) == 62


def test_files_per_partition_spreads_hot_partitions(spark, tmp_path):
    """A hot partition must not funnel into one writer task / one
    giant file: files_per_partition splits each partition value across
    N single-value files via a deterministic content-hash spread, and
    content stays exact."""
    path = str(tmp_path / "t")
    df = _events(spark, 120)
    versioned_write(df, path, partition_by=["source"], files_per_partition=4)
    ent = _read_manifest(path, 0)["files"]
    per = {}
    for e in ent:
        per.setdefault(e["partition"]["source"], []).append(e)
    assert set(per) == {"src0", "src1", "src2"}
    for src, files in per.items():
        assert 2 <= len(files) <= 4  # spread (hash may leave a residue empty)
        for e in files:  # invariant survives the spread
            assert e["stats"]["source"]["min"] == src
            assert e["stats"]["source"]["max"] == src
    got = sorted(map(tuple, versioned_read(spark, path).collect()))
    assert got == sorted(map(tuple, df.collect()))
    # compaction spreads its file budget across partitions too
    versioned_compact(spark, path, target_files=6)
    ent2 = _read_manifest(path, 1)["files"]
    per2 = {}
    for e in ent2:
        per2.setdefault(e["partition"]["source"], []).append(e)
    assert set(per2) == {"src0", "src1", "src2"}
    assert all(1 <= len(v) <= 2 for v in per2.values())
    assert versioned_read(spark, path).count() == 120


def test_read_where_multi_column_exact_prune(spark, tmp_path):
    """versioned_read_where: AND of point/interval bounds prunes per
    column — a (day, source) lookup on a day x source-partitioned table
    elects exactly ONE partition's files — and rows are identical to
    the filtered full read."""
    from skopje_spark.sinks.versioned import (
        _interval_split,
        _stat_encode,
        versioned_read_where,
    )

    df = _events(spark)
    path = str(tmp_path / "t")
    versioned_write(df, path, partition_by=["source", "day"])
    d = dt.date(2024, 1, 3)
    got = versioned_read_where(
        spark, path, {"source": "src1", "day": d}
    )
    exp = versioned_read(spark, path).filter(
        (F.col("source") == "src1") & (F.col("day") == F.lit(d))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, exp.collect())
    )
    # exactly one of the 15 single-tuple files survives both prunes
    entries = _read_manifest(path, 0)["files"]
    e1, _ = _interval_split(entries, "source", "src1", "src1")
    e2, _ = _interval_split(e1, "day", _stat_encode(d), _stat_encode(d))
    assert len(e2) == 1
    # interval bound flavor: two days of one source
    got2 = versioned_read_where(
        spark, path,
        {"source": "src0", "day": (dt.date(2024, 1, 1), dt.date(2024, 1, 2))},
    )
    assert sorted(r["id"] for r in got2.collect()) == sorted(
        i for i in range(60) if i % 3 == 0 and i % 5 in (0, 1)
    )


def test_maintenance_report_surfaces_partition_skew(spark, tmp_path):
    """The health card reports partition count and row skew for
    partitioned tables — the straggler-partition early warning — and
    recommends repartitioning past 10x mean."""
    from skopje_spark.sinks.versioned import maintenance_report

    path = str(tmp_path / "t")
    rows = [(i, "hot" if i < 110 else f"cold{i % 5}", "p") for i in range(120)]
    versioned_write(
        spark.createDataFrame(rows, "id long, src string, payload string"),
        path, partition_by=["src"],
    )
    rep = maintenance_report(path)
    assert rep["partition_by"] == ["src"]
    assert rep["n_partitions"] == 6
    # hot: 110 rows vs mean 20 → skew 5.5; under threshold, no rec
    assert 5.0 < rep["partition_skew"] < 6.0
    assert "repartition" not in rep["recommendations"]
    # unpartitioned: fields are None and no spurious recs
    p2 = str(tmp_path / "flat")
    versioned_write(spark.createDataFrame(rows[:5], "id long, src string, payload string"), p2)
    rep2 = maintenance_report(p2)
    assert rep2["partition_by"] is None and rep2["n_partitions"] is None

    # genuinely skewed: one partition carries ~55x the mean
    p3 = str(tmp_path / "skew")
    rows3 = [(i, "hot" if i < 550 else f"c{i % 10}", "p") for i in range(560)]
    versioned_write(
        spark.createDataFrame(rows3, "id long, src string, payload string"),
        p3, partition_by=["src"],
    )
    rep3 = maintenance_report(p3)
    assert rep3["partition_skew"] > 10
    assert "repartition" in rep3["recommendations"]


def test_bounds_delete_drops_whole_partitions_metadata_only(spark, tmp_path):
    """DELETE with a bounds dict on a partitioned table: the covered
    partition's files drop from the manifest with ZERO data IO (no DV
    files, no scan), disjoint partitions are carried by identical
    entries, and content equals the predicate delete."""
    import os as _os

    from skopje_spark.sinks.versioned import _DATA_DIR, versioned_delete

    path = str(tmp_path / "t")
    df = _events(spark)  # 3 sources x 5 days
    versioned_write(df, path, partition_by=["source"])
    before = {e["path"]: e for e in _read_manifest(path, 0)["files"]}
    pool_before = set(_os.listdir(_os.path.join(path, _DATA_DIR)))
    v = versioned_delete(spark, path, {"source": "src1"})
    assert v == 1
    # metadata-only: zero DV files staged, zero files scanned
    assert snapshot_meta(path, "n_dv_files", version=1) == "0"
    assert snapshot_meta(path, "n_files_scanned", version=1) == "0"
    assert snapshot_meta(path, "n_files_dropped", version=1) == "1"
    assert int(snapshot_meta(path, "n_rows_deleted", version=1)) == 20
    # not a single new pool file (manifest segments aside)
    new_files = {
        f for f in _os.listdir(_os.path.join(path, _DATA_DIR))
        if f.endswith(".parquet")
    } - {f for f in pool_before if f.endswith(".parquet")}
    assert new_files == set()
    after = {e["path"]: e for e in _read_manifest(path, 1)["files"]}
    assert set(after) == {
        p for p, e in before.items() if e["partition"]["source"] != "src1"
    }
    assert all(before[p] == after[p] for p in after)  # carried verbatim
    got = {r["source"] for r in versioned_read(spark, path).collect()}
    assert got == {"src0", "src2"}
    # time travel still serves the dropped partition
    assert versioned_read(spark, path, version=0).count() == 60


def test_bounds_delete_mixes_drop_and_dv_on_boundary_files(spark, tmp_path):
    """An interval bound over a clustered UNPARTITIONED table: fully
    covered files drop outright, boundary files get DVs, result is
    row-identical to the predicate delete; with change_feed=True the
    dropped files' rows appear in the feed too."""
    from skopje_spark.sinks.versioned import (
        versioned_change_feed,
        versioned_delete,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(80)], "k long, v string"
    )
    versioned_write(
        df.repartitionByRange(8, "k").sortWithinPartitions("k"), path
    )  # 8 files of 10 contiguous keys each
    v = versioned_delete(spark, path, {"k": (15, 44)}, change_feed=True)
    assert v == 1
    dropped = int(snapshot_meta(path, "n_files_dropped", version=1))
    scanned = int(snapshot_meta(path, "n_files_scanned", version=1))
    assert dropped == 2  # files [20-29], [30-39] fully covered
    assert scanned <= 2  # only the boundary files [10-19], [40-49]
    assert int(snapshot_meta(path, "n_rows_deleted", version=1)) == 30
    got = sorted(r["k"] for r in versioned_read(spark, path).collect())
    assert got == [k for k in range(80) if not (15 <= k <= 44)]
    feed = versioned_change_feed(spark, path, from_version=1, to_version=1)
    assert sorted(r["k"] for r in feed.collect()) == list(range(15, 45))
    assert {r["_change_type"] for r in feed.collect()} == {"delete"}


def test_bounds_delete_null_rows_survive(spark, tmp_path):
    """Range predicates are null-rejecting: a bounds delete never
    removes NULL-keyed rows, including in a NULL partition, and a
    None bound is refused loudly."""
    from skopje_spark.sinks.versioned import versioned_delete

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], "id long, grp string"
    )
    versioned_write(df, path, partition_by=["grp"])
    versioned_delete(spark, path, {"grp": "a"})
    got = sorted(
        (r["id"], r["grp"]) for r in versioned_read(spark, path).collect()
    )
    assert got == [(2, None), (4, "b")]
    with pytest.raises(ValueError, match="null-rejecting"):
        versioned_delete(spark, path, {"grp": None})


def test_replace_where_is_idempotent_partition_backfill(spark, tmp_path):
    """versioned_replace_where: one commit drops the covered
    partition and lands the new batch; re-running gives the same
    state (idempotent backfill); out-of-bounds batch rows are refused
    before anything stages; the feed records deletes + inserts."""
    from skopje_spark.sinks.versioned import (
        versioned_change_feed,
        versioned_replace_where,
    )

    path = str(tmp_path / "t")
    versioned_write(_events(spark, 30), path, partition_by=["source"])
    newday = spark.createDataFrame(
        [(900, "src1", dt.date(2024, 3, 1), "rebuilt-a"),
         (901, "src1", dt.date(2024, 3, 1), "rebuilt-b")],
        "id long, source string, day date, payload string",
    )
    v1 = versioned_replace_where(
        spark, path, {"source": "src1"}, newday, change_feed=True
    )
    assert snapshot_meta(path, "op", version=v1) == "replace_where"
    assert int(snapshot_meta(path, "n_files_dropped", version=v1)) == 1
    assert snapshot_meta(path, "n_files_rewritten", version=v1) == "0"
    rows = {r["id"] for r in versioned_read(spark, path).collect()}
    assert {900, 901} <= rows and not any(
        r["source"] == "src1" and r["id"] < 900
        for r in versioned_read(spark, path).collect()
    )
    n1 = versioned_read(spark, path).count()
    # idempotent: the re-run replaces its own output
    versioned_replace_where(spark, path, {"source": "src1"}, newday)
    assert versioned_read(spark, path).count() == n1
    got = sorted(map(tuple, versioned_read(spark, path).collect()))
    # layout invariant held through the replace
    for e in _read_manifest(path, latest_version(path))["files"]:
        assert "partition" in e
    # feed: 10 old src1 rows deleted, 2 inserted
    feed = versioned_change_feed(spark, path, from_version=v1, to_version=v1)
    kinds = {}
    for r in feed.collect():
        kinds[r["_change_type"]] = kinds.get(r["_change_type"], 0) + 1
    assert kinds == {"delete": 10, "insert": 2}

    with pytest.raises(ValueError, match="outside the replaced region"):
        versioned_replace_where(
            spark, path, {"source": "src1"},
            spark.createDataFrame(
                [(999, "src2", dt.date(2024, 3, 1), "stray")],
                "id long, source string, day date, payload string",
            ),
        )


def test_replace_where_rewrites_boundary_files_exactly(spark, tmp_path):
    """Interval replace on a clustered unpartitioned table: covered
    files drop, boundary files rewrite keeping their non-matching
    rows, content equals delete-then-insert."""
    from skopje_spark.sinks.versioned import versioned_replace_where

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(80)], "k long, v string"
    )
    versioned_write(
        df.repartitionByRange(8, "k").sortWithinPartitions("k"), path
    )
    batch = spark.createDataFrame(
        [(k, f"NEW{k}") for k in range(20, 40)], "k long, v string"
    )
    v = versioned_replace_where(spark, path, {"k": (15, 44)}, batch)
    assert int(snapshot_meta(path, "n_files_dropped", version=v)) == 2
    assert int(snapshot_meta(path, "n_files_rewritten", version=v)) == 2
    got = {r["k"]: r["v"] for r in versioned_read(spark, path).collect()}
    exp = {k: f"r{k}" for k in range(80) if not (15 <= k <= 44)}
    exp.update({k: f"NEW{k}" for k in range(20, 40)})
    assert got == exp


def _ts_events(spark, n=60):
    """n rows over 5 days of timestamps × 2 sources."""
    rows = [
        (
            i,
            dt.datetime(2024, 5, 1 + (i % 5), 6 + (i % 12), i % 60),
            f"s{i % 2}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, ts timestamp, src string")


def test_hidden_partitioning_day_of_timestamp(spark, tmp_path):
    """Iceberg-style hidden partitioning: partition_by 'day=date(ts)'
    lays files out by the DERIVED day without adding a column to the
    schema; raw-timestamp bounds prune day partitions (monotone
    transform); bounding the virtual target filters exactly through
    to_date(ts); SHOW PARTITIONS lists the virtual days."""
    from skopje_spark.sinks.versioned import versioned_read_where

    path = str(tmp_path / "t")
    df = _ts_events(spark)
    versioned_write(df, path, partition_by=["day=date(ts)"])
    # schema untouched — the day column is metadata, not data
    assert versioned_read(spark, path).columns == ["id", "ts", "src"]
    parts = versioned_partitions(path)
    assert [p["day"] for p in parts] == [
        f"2024-05-0{d}" for d in range(1, 6)
    ]
    assert all(p["n_rows"] == 12 for p in parts)
    ent = _read_manifest(path, 0)["files"]
    assert len(ent) == 5
    for e in ent:
        d = e["partition"]["day"]
        assert e["stats"]["day"] == {"min": d, "max": d, "nulls": 0}
        assert "day" not in versioned_read(spark, path).columns
    # raw timestamp bound: derived day interval prunes to 2 files
    lo = dt.datetime(2024, 5, 2, 0, 0)
    hi = dt.datetime(2024, 5, 3, 23, 59)
    got = versioned_read_where(spark, path, {"ts": (lo, hi)})
    exp = sorted(i for i in range(60) if i % 5 in (1, 2))
    assert sorted(r["id"] for r in got.collect()) == exp
    from skopje_spark.sinks.versioned import (
        _interval_split,
        _resolve_bounds,
        _schema_mapping,
        _stat_encode,
        table_partitioning,
    )

    schema = versioned_read(spark, path).schema
    resolved = _resolve_bounds(
        {"ts": (lo, hi)}, schema, _schema_mapping(schema),
        table_partitioning(path),
    )
    derived = [u for u in resolved if u["key"] == "day"]
    assert len(derived) == 1 and not derived[0]["coverage"]
    cand, _ = _interval_split(
        ent, "day", _stat_encode(derived[0]["lo"]),
        _stat_encode(derived[0]["hi"]),
    )
    assert len(cand) == 2  # exactly the two covered days
    # virtual-target bound: exact via to_date(ts) residual
    got2 = versioned_read_where(spark, path, {"day": dt.date(2024, 5, 4)})
    assert sorted(r["id"] for r in got2.collect()) == sorted(
        i for i in range(60) if i % 5 == 3
    )


def test_hidden_partition_day_drop_is_metadata_only(spark, tmp_path):
    """DELETE {'day': D} on a day=date(ts) table: the virtual bound's
    exact per-file stats prove coverage — whole-day purge with zero
    scan, zero DVs; a raw-ts interval spanning part of a day falls
    back to boundary DVs."""
    from skopje_spark.sinks.versioned import versioned_delete

    path = str(tmp_path / "t")
    versioned_write(_ts_events(spark), path, partition_by=["day=date(ts)"])
    v = versioned_delete(spark, path, {"day": dt.date(2024, 5, 2)})
    assert snapshot_meta(path, "n_files_scanned", version=v) == "0"
    assert snapshot_meta(path, "n_dv_files", version=v) == "0"
    assert int(snapshot_meta(path, "n_files_dropped", version=v)) == 1
    assert sorted(
        {r["ts"].day for r in versioned_read(spark, path).collect()}
    ) == [1, 3, 4, 5]
    # partial-day ts interval: boundary DV, not a drop
    v2 = versioned_delete(
        spark, path,
        {"ts": (dt.datetime(2024, 5, 3, 0, 0),
                dt.datetime(2024, 5, 3, 12, 0))},
    )
    assert int(snapshot_meta(path, "n_files_dropped", version=v2)) == 0
    assert int(snapshot_meta(path, "n_files_scanned", version=v2)) == 1
    left = [
        r["ts"] for r in versioned_read(spark, path).collect()
        if r["ts"].day == 3
    ]
    assert left and all(t > dt.datetime(2024, 5, 3, 12, 0) for t in left)


def test_hidden_partitioning_through_connector(spark, tmp_path):
    """Pushed raw-timestamp filters prune hidden day partitions in
    the connector plan; rows stay exact."""
    from skopje_spark.sources.lakesource import VersionedTableReader
    from skopje_spark.sources.pysource import register_all

    register_all(spark)
    path = str(tmp_path / "t")
    versioned_write(_ts_events(spark), path, partition_by=["day=date(ts)"])
    r = (
        spark.read.format("skopje_versioned").option("path", path).load()
        .filter(
            "ts >= TIMESTAMP'2024-05-02 00:00:00' "
            "AND ts <= TIMESTAMP'2024-05-02 23:59:59'"
        )
    )
    assert sorted(x["id"] for x in r.collect()) == sorted(
        i for i in range(60) if i % 5 == 1
    )
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    rd = VersionedTableReader({"path": path})
    list(rd.pushFilters([
        GreaterThanOrEqual(("ts",), dt.datetime(2024, 5, 2, 0, 0)),
        LessThanOrEqual(("ts",), dt.datetime(2024, 5, 2, 23, 59)),
    ]))
    assert len(rd.partitions()) == 1  # one day's file planned


def test_scoped_compact_rewrites_one_partition_only(spark, tmp_path):
    """versioned_compact(where=): the hot partition's small files
    merge (DVs materialized away), every other partition's entries
    ride verbatim, content is untouched — nightly OPTIMIZE of one day
    without re-copying the table."""
    from skopje_spark.sinks.versioned import (
        versioned_compact,
        versioned_delete,
    )

    path = str(tmp_path / "t")
    versioned_write(_events(spark, 30), path, partition_by=["source"])
    # fragment src1 with appends; other partitions untouched
    for i in range(3):
        versioned_append(
            spark, path,
            spark.createDataFrame(
                [(200 + i, "src1", dt.date(2024, 4, 1), f"x{i}")],
                "id long, source string, day date, payload string",
            ),
        )
    versioned_delete(spark, path, "id = 1")  # leaves a DV on base src1
    v = latest_version(path)
    before = {e["path"]: e for e in _read_manifest(path, v)["files"]}
    src1_before = [
        p for p, e in before.items() if e["partition"]["source"] == "src1"
    ]
    assert len(src1_before) == 4
    v2 = versioned_compact(spark, path, where={"source": "src1"},
                           target_files=1)
    assert snapshot_meta(path, "op", version=v2) == "compact"
    assert int(snapshot_meta(path, "n_files_compacted", version=v2)) == 4
    after = {e["path"]: e for e in _read_manifest(path, v2)["files"]}
    src1_after = [
        p for p, e in after.items() if e["partition"]["source"] == "src1"
    ]
    assert len(src1_after) == 1 and not set(src1_after) & set(src1_before)
    assert not any(e.get("dv_files") for e in after.values())  # DV shed
    # every other partition's entry carried byte-identical
    others_before = {p: e for p, e in before.items() if p not in src1_before}
    assert all(after[p] == e for p, e in others_before.items())
    rows = {r["id"] for r in versioned_read(spark, path).collect()}
    assert rows == (set(range(30)) - {1}) | {200, 201, 202}
    # a scope nothing provably covers is a no-op, not an empty commit
    assert versioned_compact(spark, path, where={"id": (0, 1)}) == v2


def test_in_list_bounds_prune_exactly(spark, tmp_path):
    """IN-list bounds: a two-day read on a five-day table opens the
    LISTED days' files (set membership on single-valued stats), not
    the span between them; delete with a list drops exactly those
    partitions; the connector prunes In filters by value span."""
    from pyspark.sql.datasource import In

    from skopje_spark.sinks.versioned import (
        versioned_delete,
        versioned_read_where,
    )
    from skopje_spark.sources.lakesource import VersionedTableReader
    from skopje_spark.sources.pysource import register_all

    register_all(spark)
    path = str(tmp_path / "t")
    df = _events(spark)  # 3 sources x 5 days, 15 files
    versioned_write(df, path, partition_by=["source", "day"])
    d1, d4 = dt.date(2024, 1, 1), dt.date(2024, 1, 4)
    got = versioned_read_where(spark, path, {"day": [d1, d4]})
    assert sorted(r["id"] for r in got.collect()) == sorted(
        i for i in range(60) if i % 5 in (0, 3)
    )
    # exact set pruning: 6 files (2 days x 3 sources), NOT the 12 the
    # [d1, d4] interval spans
    from skopje_spark.sinks.versioned import (
        _interval_split,
        _read_manifest,
        _stat_encode,
    )

    ent = _read_manifest(path, 0)["files"]
    span, _ = _interval_split(
        ent, "day", _stat_encode(d1), _stat_encode(d4)
    )
    assert len(span) == 12  # the naive interval would open these
    listed = {
        e["path"] for e in ent
        if e["partition"]["day"] in ("2024-01-01", "2024-01-04")
    }
    assert len(listed) == 6

    # list delete: drops exactly the two days, metadata-only
    v = versioned_delete(spark, path, {"day": [d1, d4]})
    assert int(snapshot_meta(path, "n_files_dropped", version=v)) == 6
    assert snapshot_meta(path, "n_dv_files", version=v) == "0"
    assert {r["day"].day for r in versioned_read(spark, path).collect()} == {
        2, 3, 5,
    }

    # connector: In filter prunes by the listed span
    rd = VersionedTableReader({"path": path})
    list(rd.pushFilters([In(("source",), ("src0",))]))
    parts = rd.partitions()
    assert len(parts) == 3  # src0's three remaining day files


def test_composite_key_merge_prunes_on_every_key_column(spark, tmp_path):
    """A merge keyed (id, source) — partition column SECOND — still
    rewrites only the matched partition: every key column contributes
    a disjointness proof, not just keys[0]."""
    path = str(tmp_path / "t")
    versioned_write(_events(spark), path, partition_by=["source"])
    before = {e["path"] for e in _read_manifest(path, 0)["files"]}
    upd = spark.createDataFrame(
        [(7, "src1", dt.date(2024, 1, 3), "NEW")],
        "id long, source string, day date, payload string",
    )
    versioned_upsert(spark, path, upd, ["id", "source"])  # id FIRST
    assert int(snapshot_meta(path, "n_files_rewritten", version=1)) == 1
    after = {e["path"]: e for e in _read_manifest(path, 1)["files"]}
    carried = before & set(after)
    assert len(carried) == 2  # src0 + src2 rode by reference
    assert all(after[p]["partition"]["source"] != "src1" for p in carried)
    rows = {r["id"]: r["payload"] for r in versioned_read(spark, path).collect()}
    assert rows[7] == "NEW" and len(rows) == 60

    # the clause-MERGE path prunes identically
    from skopje_spark.sinks.versioned import versioned_merge

    src = spark.createDataFrame(
        [(8, "src2", dt.date(2024, 1, 4), "UPD")],
        "id long, source string, day date, payload string",
    )
    versioned_merge(spark, path, src, ["id", "source"])
    assert int(snapshot_meta(path, "n_files_rewritten", version=2)) == 1
    rows2 = {r["id"]: r["payload"] for r in versioned_read(spark, path).collect()}
    assert rows2[8] == "UPD" and len(rows2) == 60


def test_read_where_prunes_segments_on_every_bound(spark, tmp_path, monkeypatch):
    """The segment tier applies EVERY resolved bound, not just the
    first: a read whose first bound spans everything but whose second
    bound is clustered opens only the matching segments (pre-fix:
    resolved[0] alone decided, so every segment was parsed)."""
    import skopje_spark.sinks.versioned as V
    from skopje_spark.sinks.versioned import versioned_read_where

    monkeypatch.setattr(V, "_SEG_TARGET", 4)
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 7, f"r{i}") for i in range(800)],
        "k long, u long, v string",
    )
    # clustered by k → tight per-segment k aggregates; u is uniform in
    # every file, so a u bound alone can close nothing
    versioned_write(
        df.repartitionByRange(80, "k").sortWithinPartitions("k"), path
    )
    m: dict = {}
    got = versioned_read_where(
        spark, path, {"u": (0, 6), "k": (300, 303)}, metrics=m
    )
    assert sorted(r["k"] for r in got.collect()) == [300, 301, 302, 303]
    assert m["segments_total"] >= 6
    assert m["segments_opened"] < m["segments_total"]

    # bounds-dict DELETE rides the same multi-bound segment split
    from skopje_spark.sinks.versioned import versioned_delete

    v = versioned_delete(spark, path, {"u": (0, 6), "k": (300, 301)})
    total = int(snapshot_meta(path, "n_segments_total", version=v))
    opened = int(snapshot_meta(path, "n_segments_opened", version=v))
    assert opened < total
    left = {r["k"] for r in versioned_read(spark, path).collect()}
    assert 300 not in left and 301 not in left and len(left) == 798


def test_connector_in_list_prunes_exact_set(spark, tmp_path):
    """A pushed .isin over a partition column plans EXACTLY the listed
    values' files, not the whole span between them (pre-fix: a
    {day1, day4} IN-list planned day2/day3's files too)."""
    from pyspark.sql.datasource import In
    from skopje_spark.sources.lakesource import VersionedTableReader

    path = str(tmp_path / "t")
    versioned_write(_events(spark), path, partition_by=["day"])
    assert len(_read_manifest(path, 0)["files"]) == 5
    rd = VersionedTableReader({"path": path})
    d1, d4 = dt.date(2024, 1, 1), dt.date(2024, 1, 4)
    list(rd.pushFilters([In(("day",), (d1, d4))]))
    parts = rd.partitions()
    assert len(parts) == 2  # exactly the two listed days
    days = set()
    for e in _read_manifest(path, 0)["files"]:
        if e["path"] in {p.rel_path for p in parts}:
            days.add(e["partition"]["day"])
    assert days == {"2024-01-01", "2024-01-04"}


def _spec_table(spark, path):
    """v0: identity-partitioned by source, 3 sources × 4 days of ts."""
    from skopje_spark.sinks.versioned import versioned_write

    rows = [
        (i, dt.datetime(2024, 6, 1 + (i % 4), 8, i % 60), f"s{i % 3}")
        for i in range(48)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, src string")
    versioned_write(df, path, partition_by=["src"])
    return df


def test_partition_spec_evolution_is_metadata_only(spark, tmp_path):
    """versioned_set_partition_spec commits a NEW layout without
    touching a byte: old files keep their entries verbatim, later
    appends follow the new spec, and cross-epoch reads prune each
    epoch by its own layout (new exactly, old conservatively with the
    exact residual)."""
    from skopje_spark.sinks.versioned import (
        table_partition_specs,
        table_partitioning,
        versioned_append,
        versioned_read_where,
        versioned_set_partition_spec,
    )

    path = str(tmp_path / "t")
    _spec_table(spark, path)
    before = {
        e["path"]: os.path.getmtime(os.path.join(path, e["path"]))
        for e in _read_manifest(path, 0)["files"]
    }
    assert len(before) == 3  # one file per source
    v1 = versioned_set_partition_spec(path, ["day=date(ts)"])
    assert table_partitioning(path) == ["day=date(ts)"]
    assert table_partition_specs(path) == ["day=date(ts)", "src"]
    # metadata-only: the same entries, the same bytes on disk
    after = {
        e["path"]: os.path.getmtime(os.path.join(path, e["path"]))
        for e in _read_manifest(path, v1)["files"]
    }
    assert after == before
    # appends follow the NEW spec: one file per day
    rows2 = [
        (100 + i, dt.datetime(2024, 6, 1 + (i % 4), 20, 0), f"s{i % 3}")
        for i in range(8)
    ]
    df2 = spark.createDataFrame(rows2, "id long, ts timestamp, src string")
    v2 = versioned_append(spark, path, df2)
    ent = _read_manifest(path, v2)["files"]
    new_ent = [e for e in ent if e["path"] not in before]
    assert len(new_ent) == 4
    assert {e["partition"]["day"] for e in new_ent} == {
        f"2024-06-0{d}" for d in range(1, 5)
    }
    old_ent = [e for e in ent if e["path"] in before]
    assert all(e["partition"] == {"src": e["partition"]["src"]}
               for e in old_ent)
    # a day bound: new-epoch files elected EXACTLY, old conservatively
    m: dict = {}
    got = versioned_read_where(
        spark, path, {"day": dt.date(2024, 6, 2)}, metrics=m
    )
    assert sorted(r["id"] for r in got.collect()) == sorted(
        [i for i in range(48) if i % 4 == 1] + [101, 105]
    )
    from skopje_spark.sinks.versioned import _interval_split

    cand, _ = _interval_split(ent, "day", "2024-06-02", "2024-06-02")
    assert {e["path"] for e in cand} == (
        set(before) | {e["path"] for e in new_ent
                       if e["partition"]["day"] == "2024-06-02"}
    )
    # an src bound: OLD-epoch files elected exactly via injected stats
    got2 = versioned_read_where(spark, path, {"src": "s1"})
    assert sorted(r["id"] for r in got2.collect()) == sorted(
        [i for i in range(48) if i % 3 == 1]
        + [100 + i for i in range(8) if i % 3 == 1]
    )


def test_partition_spec_evolution_away_keeps_old_epoch_pruning(
    spark, tmp_path
):
    """Evolving AWAY from day=date(ts): old-epoch files still prune
    from raw-timestamp bounds through the spec HISTORY (native read
    and connector both), and a whole-day DELETE stays correct across
    epochs."""
    from pyspark.sql.datasource import (
        GreaterThanOrEqual,
        LessThanOrEqual,
    )

    from skopje_spark.sinks.versioned import (
        versioned_append,
        versioned_delete,
        versioned_set_partition_spec,
        versioned_write,
    )
    from skopje_spark.sources.lakesource import VersionedTableReader

    path = str(tmp_path / "t")
    rows = [
        (i, dt.datetime(2024, 6, 1 + (i % 4), 8, i % 60), f"s{i % 3}")
        for i in range(48)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, src string")
    versioned_write(df, path, partition_by=["day=date(ts)"])  # 4 day files
    versioned_set_partition_spec(path, ["src"])
    rows2 = [
        (100 + i, dt.datetime(2024, 6, 3, 21, 0), f"s{i % 3}")
        for i in range(6)
    ]
    versioned_append(
        spark, path,
        spark.createDataFrame(rows2, "id long, ts timestamp, src string"),
    )
    # connector: pushed raw-ts filter prunes old-epoch day files via
    # the historical transform
    rd = VersionedTableReader({"path": path})
    list(rd.pushFilters([
        GreaterThanOrEqual(("ts",), dt.datetime(2024, 6, 2, 0, 0)),
        LessThanOrEqual(("ts",), dt.datetime(2024, 6, 2, 23, 59)),
    ]))
    parts = rd.partitions()
    # old-epoch files prune to the ONE matching day; the 3 new-epoch
    # src files (no day stats) stay conservative candidates
    old_paths = {
        e["path"] for e in _read_manifest(path, 0)["files"]
    }
    planned_old = [p for p in parts if p.rel_path in old_paths]
    assert len(planned_old) == 1 and len(parts) == 4
    # native whole-day delete across epochs: exact rows survive
    v = versioned_delete(
        spark, path, {"day": dt.date(2024, 6, 3)}
    )
    got = sorted(
        r["id"]
        for r in __import__(
            "skopje_spark.sinks.versioned", fromlist=["versioned_read"]
        ).versioned_read(spark, path).collect()
    )
    assert got == sorted(i for i in range(48) if i % 4 != 2)
    # old-epoch day file dropped with zero IO; new-epoch src files
    # were scanned (no day stats) — conservative, never wrong
    assert int(snapshot_meta(path, "n_files_dropped", version=v)) == 1


def test_partition_spec_evolution_validations(spark, tmp_path):
    """Refusals: unchanged spec, unknown/ill-typed columns, target
    colliding with a schema column, same target re-derived from a
    different source across epochs."""
    from skopje_spark.sinks.versioned import versioned_set_partition_spec

    path = str(tmp_path / "t")
    _spec_table(spark, path)
    with pytest.raises(ValueError, match="already has partition spec"):
        versioned_set_partition_spec(path, ["src"])
    with pytest.raises(KeyError, match="nope"):
        versioned_set_partition_spec(path, ["nope"])
    with pytest.raises(TypeError, match="date/timestamp"):
        versioned_set_partition_spec(path, ["d=date(src)"])
    with pytest.raises(ValueError, match="collides"):
        versioned_set_partition_spec(path, ["src=date(ts)"])
    versioned_set_partition_spec(path, ["day=date(ts)"])
    # same virtual target from a DIFFERENT source is ambiguous
    path2 = str(tmp_path / "t2")
    from skopje_spark.sinks.versioned import versioned_write

    df2 = spark.createDataFrame(
        [(1, dt.datetime(2024, 6, 1), dt.datetime(2024, 7, 1))],
        "id long, ts timestamp, ts2 timestamp",
    )
    versioned_write(df2, path2, partition_by=["day=date(ts)"])
    with pytest.raises(ValueError, match="ambiguous"):
        versioned_set_partition_spec(path2, ["day=date(ts2)"])


def test_bucket_partitioning_write_merge_read(spark, tmp_path):
    """bucket(N, key) transform: layout lands one bucket per file with
    exact injected stats; an m-key MERGE rewrites at most m buckets
    (hash-scattered keys span every interval, so only the bucket set
    can close files); point reads elect one bucket natively and
    through the connector."""
    from pyspark.sql.datasource import EqualTo, In
    from skopje_spark.sinks.versioned import (
        _bucket_of,
        versioned_read_where,
        versioned_write,
    )
    from skopje_spark.sources.lakesource import VersionedTableReader

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(800)], "id long, v string"
    )
    versioned_write(df, path, partition_by=["b=bucket(8,id)"])
    ent = _read_manifest(path, 0)["files"]
    assert len(ent) == 8
    for e in ent:
        b = e["partition"]["b"]
        assert e["stats"]["b"] == {"min": b, "max": b, "nulls": 0}
    assert "b" not in versioned_read(spark, path).columns
    # content identical to the unbucketed twin
    assert sorted(
        (r["id"], r["v"]) for r in versioned_read(spark, path).collect()
    ) == [(i, f"r{i}") for i in range(800)]
    # m=2 keys -> at most 2 buckets rewritten
    upd = spark.createDataFrame(
        [(17, "NEW17"), (530, "NEW530")], "id long, v string"
    )
    versioned_upsert(spark, path, upd, ["id"])
    rewrote = int(snapshot_meta(path, "n_files_rewritten", version=1))
    assert rewrote == len({_bucket_of(17, 8), _bucket_of(530, 8)}) <= 2
    got = {r["id"]: r["v"] for r in versioned_read(spark, path).collect()}
    assert got[17] == "NEW17" and got[530] == "NEW530" and len(got) == 800
    # native point read elects exactly one bucket file
    m: dict = {}
    r = versioned_read_where(spark, path, {"id": 42}, metrics=m)
    assert [x["v"] for x in r.collect()] == ["r42"]
    from skopje_spark.sinks.versioned import (
        _interval_split,
        _resolve_bounds,
        _schema_mapping,
    )

    schema = versioned_read(spark, path).schema
    resolved = _resolve_bounds(
        {"id": 42}, schema, _schema_mapping(schema), ["b=bucket(8,id)"]
    )
    derived = [u for u in resolved if u["key"] == "b"]
    assert len(derived) == 1 and derived[0]["lo"] == _bucket_of(42, 8)
    ent1 = _read_manifest(path, 1)["files"]
    cand, _ = _interval_split(ent1, "b", derived[0]["lo"], derived[0]["hi"])
    assert len(cand) == 1
    # connector: point + IN filters derive buckets driver-side
    rd = VersionedTableReader({"path": path})
    list(rd.pushFilters([EqualTo(("id",), 42)]))
    assert len(rd.partitions()) == 1
    rd2 = VersionedTableReader({"path": path})
    list(rd2.pushFilters([In(("id",), (17, 530))]))
    assert len(rd2.partitions()) == len({_bucket_of(17, 8), _bucket_of(530, 8)})


def test_bucket_spec_validation_and_evolution(spark, tmp_path):
    """Bucket sources are int/string keys; bucket(1) is refused; a
    table can EVOLVE to a bucketed layout metadata-only and the merge
    pruning applies to post-evolution files."""
    from skopje_spark.sinks.versioned import (
        versioned_set_partition_spec,
        versioned_write,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, float(i), f"r{i}") for i in range(40)],
        "id long, score double, v string",
    )
    versioned_write(df, path)
    with pytest.raises(TypeError, match="bucket"):
        versioned_set_partition_spec(path, ["b=bucket(4,score)"])
    with pytest.raises(ValueError, match=">= 2"):
        versioned_set_partition_spec(path, ["b=bucket(1,id)"])
    versioned_set_partition_spec(path, ["b=bucket(4,id)"])
    upd = spark.createDataFrame(
        [(3, 3.0, "NEW")], "id long, score double, v string"
    )
    versioned_upsert(spark, path, upd, ["id"])
    # the rewrite landed bucketed: every new file single-valued on b
    ent = _read_manifest(path, latest_version(path))["files"]
    bucketed = [e for e in ent if "b" in (e.get("partition") or {})]
    assert bucketed and all(
        e["stats"]["b"]["min"] == e["stats"]["b"]["max"] for e in bucketed
    )
    got = {r["id"]: r["v"] for r in versioned_read(spark, path).collect()}
    assert got[3] == "NEW" and len(got) == 40


def test_connector_create_with_hidden_spec_fanout(spark, tmp_path):
    """The connector writer CREATES a table with a declared layout —
    .option('partitionBy', 'day=date(ts),b=bucket(4,id)') — and the
    fanout path stamps hidden-transform partition values (UTC epoch
    day, crc32 bucket) identical to the native write path's."""
    from skopje_spark.sinks.versioned import (
        _bucket_of,
        table_partitioning,
        versioned_read_where,
    )
    from skopje_spark.sources.pysource import register_all

    register_all(spark)
    path = str(tmp_path / "t")
    rows = [
        (i, dt.datetime(2024, 7, 1 + (i % 3), 5, i % 60), f"p{i}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, v string")
    (df.coalesce(2).write.format("skopje_versioned")
     .option("path", path)
     .option("partitionBy", "day=date(ts),b=bucket(4,id)")
     .mode("append").save())
    assert table_partitioning(path) == ["day=date(ts)", "b=bucket(4,id)"]
    ent = _read_manifest(path, 0)["files"]
    native_twin = str(tmp_path / "twin")
    versioned_write(
        df, native_twin, partition_by=["day=date(ts)", "b=bucket(4,id)"]
    )
    twin_tuples = {
        (e["partition"]["day"], e["partition"]["b"])
        for e in _read_manifest(native_twin, 0)["files"]
    }
    conn_tuples = {
        (e["partition"]["day"], e["partition"]["b"]) for e in ent
    }
    assert conn_tuples == twin_tuples  # identical derived labels
    for e in ent:
        assert e["stats"]["day"]["min"] == e["partition"]["day"]
        assert e["stats"]["b"]["min"] == e["partition"]["b"]
    # reads prune the connector-written layout exactly
    got = versioned_read_where(
        spark, path, {"id": 7, "day": dt.date(2024, 7, 2)}
    )
    assert [r["v"] for r in got.collect()] == ["p7"]
    assert versioned_read(spark, path).count() == 60


def test_show_partitions_reads_refs_not_segments(spark, tmp_path, monkeypatch):
    """SHOW PARTITIONS on a segmented table answers from the kilobyte
    segment refs (per-tuple aggregates folded at write) — zero
    segment files opened — and the counts equal the full entry walk,
    DV-adjusted."""
    import skopje_spark.sinks.versioned as V
    from skopje_spark.sinks.versioned import versioned_delete

    monkeypatch.setattr(V, "_SEG_TARGET", 4)
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(800)], "id long, v string"
    )
    versioned_write(df, path, partition_by=["b=bucket(64,id)"])
    versioned_delete(spark, path, "id = 7")  # DV adjusts one tuple
    m: dict = {}
    parts = versioned_partitions(path, metrics=m)
    assert m["segments_total"] >= 6 and m["segments_opened"] == 0
    assert sum(p["n_rows"] for p in parts) == 799
    assert sum(p["n_files"] for p in parts) == 64
    # identical to the O(files) walk
    ent = _read_manifest(path, latest_version(path))["files"]
    walk: dict = {}
    for e in ent:
        k = e["partition"]["b"]
        walk[k] = walk.get(k, 0) + int(e["rows"]) - int(e.get("dv_rows", 0))
    assert {p["b"]: p["n_rows"] for p in parts} == walk


def test_month_hour_transforms_write_and_prune(spark, tmp_path):
    """month(ts)/hour(ts) hidden transforms: zone-free labels, derived
    prune-only bounds from raw-timestamp ranges (monotone), exact
    residuals on direct target bounds."""
    from skopje_spark.sinks.versioned import (
        _interval_split,
        versioned_read_where,
        versioned_write,
    )

    path = str(tmp_path / "m")
    rows = [
        (i, dt.datetime(2024, 4 + (i % 3), 10, 6 + (i % 4), 30), f"p{i}")
        for i in range(48)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, v string")
    versioned_write(df, path, partition_by=["m=month(ts)"])
    ent = _read_manifest(path, 0)["files"]
    assert {e["partition"]["m"] for e in ent} == {
        "2024-04", "2024-05", "2024-06"
    }
    for e in ent:
        assert e["stats"]["m"]["min"] == e["stats"]["m"]["max"]
    # raw-ts range derives a prune-only month interval
    got = versioned_read_where(
        spark, path,
        {"ts": (dt.datetime(2024, 5, 1), dt.datetime(2024, 5, 31))},
    )
    assert sorted(r["id"] for r in got.collect()) == [
        i for i in range(48) if i % 3 == 1
    ]
    cand, _ = _interval_split(ent, "m", "2024-05", "2024-05")
    assert len(cand) == 1
    # direct month-target bound: exact residual
    got2 = versioned_read_where(spark, path, {"m": "2024-06"})
    assert sorted(r["id"] for r in got2.collect()) == [
        i for i in range(48) if i % 3 == 2
    ]

    path2 = str(tmp_path / "h")
    versioned_write(df, path2, partition_by=["h=hour(ts)"])
    ent2 = _read_manifest(path2, 0)["files"]
    hrs = {e["partition"]["h"] for e in ent2}
    assert "2024-04-10-06" in hrs and len(hrs) == 12  # 3 months × 4 hours
    got3 = versioned_read_where(
        spark, path2,
        {"ts": (dt.datetime(2024, 5, 10, 7, 0),
                dt.datetime(2024, 5, 10, 8, 59))},
    )
    assert sorted(r["id"] for r in got3.collect()) == [
        i for i in range(48) if i % 3 == 1 and i % 4 in (1, 2)
    ]
    cand3, _ = _interval_split(ent2, "h", "2024-05-10-07", "2024-05-10-08")
    assert len(cand3) == 2  # exactly the two covered hours


def test_truncate_transform_string_and_int(spark, tmp_path):
    """truncate(W, source): string prefixes and integer flooring, both
    monotone — a range bound on the source derives a prune-only range
    on the target; point bounds elect one partition."""
    from skopje_spark.sinks.versioned import (
        _interval_split,
        versioned_read_where,
        versioned_write,
    )

    path = str(tmp_path / "s")
    df = spark.createDataFrame(
        [(i, f"{'abcde'[i % 5]}x-{i}", f"p{i}") for i in range(50)],
        "id long, code string, v string",
    )
    versioned_write(df, path, partition_by=["pre=truncate(1,code)"])
    ent = _read_manifest(path, 0)["files"]
    assert {e["partition"]["pre"] for e in ent} == set("abcde")
    got = versioned_read_where(spark, path, {"code": ("b", "c~")})
    assert sorted(r["id"] for r in got.collect()) == [
        i for i in range(50) if i % 5 in (1, 2)
    ]
    cand, _ = _interval_split(ent, "pre", "b", "c")
    assert len(cand) == 2

    path2 = str(tmp_path / "i")
    df2 = spark.createDataFrame(
        [(i, f"p{i}") for i in range(-50, 50)], "id long, v string"
    )
    versioned_write(df2, path2, partition_by=["blk=truncate(25,id)"])
    ent2 = _read_manifest(path2, 0)["files"]
    assert {e["partition"]["blk"] for e in ent2} == {-50, -25, 0, 25}
    got2 = versioned_read_where(spark, path2, {"id": (-30, -20)})
    assert sorted(r["id"] for r in got2.collect()) == list(range(-30, -19))
    cand2, _ = _interval_split(ent2, "blk", -50, -25)
    assert len(cand2) == 2  # floor(-30/25)*25=-50, floor(-20/25)*25=-25


def test_keyframe_delete_prunes_by_bucket_set(spark, tmp_path):
    """A key-frame DELETE on a bucketed table scans only the keys'
    bucket files — hash-scattered key intervals span every file, so
    only the exact bucket set can close candidates."""
    from skopje_spark.sinks.versioned import _bucket_of, versioned_delete

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(800)], "id long, v string"
    )
    versioned_write(df, path, partition_by=["b=bucket(8,id)"])
    kf = spark.createDataFrame([(3,), (500,)], "id long")
    v = versioned_delete(spark, path, kf)
    scanned = int(snapshot_meta(path, "n_files_scanned", version=v))
    assert scanned == len({_bucket_of(3, 8), _bucket_of(500, 8)}) <= 2
    got = {r["id"] for r in versioned_read(spark, path).collect()}
    assert 3 not in got and 500 not in got and len(got) == 798


def test_stream_writer_fanout_partitioned_append(spark, tmp_path):
    """The streaming connector sink appends to a partitioned table
    through the same fanout path: each micro-batch's files keep the
    one-value-per-file invariant with exact injected stats."""
    path = str(tmp_path / "t")
    versioned_write(_events(spark, 30), path, partition_by=["source"])
    src_rows = [
        (100 + i, f"src{i % 2}", dt.date(2024, 2, 1), f"s{i}")
        for i in range(6)
    ]
    src_df = spark.createDataFrame(
        src_rows, "id long, source string, day date, payload string"
    )
    # drive the stream writer directly (deterministic, no timing):
    from skopje_spark.sources.lakesource import VersionedStreamWriter

    w = VersionedStreamWriter(
        src_df.schema, {"path": path, "streamid": "s1"}
    )
    import pyarrow as pa

    batch = pa.Table.from_pylist(
        [dict(zip(("id", "source", "day", "payload"), r)) for r in src_rows]
    ).to_batches()
    msg = w.write(iter(batch))
    w.commit([msg], batchId=0)
    ent = _read_manifest(path, latest_version(path))["files"]
    new = [e for e in ent if e["path"].endswith("-w.parquet")]
    assert len(new) == 2  # one per source value in the task
    for e in new:
        s = e["partition"]["source"]
        assert e["stats"]["source"] == {"min": s, "max": s, "nulls": 0}
    # replay of the same batch id is dropped (ledger), files unchanged
    msg2 = w.write(iter(pa.Table.from_pylist(
        [dict(zip(("id", "source", "day", "payload"), r)) for r in src_rows]
    ).to_batches()))
    w.commit([msg2], batchId=0)
    assert len(_read_manifest(path, latest_version(path))["files"]) == len(ent)
    got = {r["id"] for r in versioned_read(spark, path).collect()}
    assert set(range(100, 106)) <= got and len(got) == 36


def test_open_sided_bounds_read_and_delete(spark, tmp_path):
    """(lo, None) / (None, hi) bounds: one-sided pruning and residuals
    in reads and DELETEs, including derived hidden-partition bounds
    from an open raw-ts side."""
    from skopje_spark.sinks.versioned import (
        _interval_split,
        versioned_delete,
        versioned_read_where,
        versioned_write,
    )

    path = str(tmp_path / "t")
    rows = [
        (i, dt.datetime(2024, 5, 1 + (i % 5), 6, i % 60), f"s{i % 2}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, src string")
    versioned_write(df, path, partition_by=["day=date(ts)"])
    # everything since May 4, open upper side
    got = versioned_read_where(
        spark, path, {"ts": (dt.datetime(2024, 5, 4, 0, 0), None)}
    )
    assert sorted(r["id"] for r in got.collect()) == [
        i for i in range(60) if i % 5 in (3, 4)
    ]
    ent = _read_manifest(path, 0)["files"]
    cand, _ = _interval_split(ent, "day", "2024-05-04", None)
    assert len(cand) == 2  # derived open bound elects the tail days
    # open-sided day-target bound
    got2 = versioned_read_where(
        spark, path, {"day": (None, dt.date(2024, 5, 2))}
    )
    assert sorted(r["id"] for r in got2.collect()) == [
        i for i in range(60) if i % 5 in (0, 1)
    ]
    # open-sided DELETE: whole tail dropped metadata-only
    v = versioned_delete(
        spark, path, {"day": (dt.date(2024, 5, 4), None)}
    )
    assert int(snapshot_meta(path, "n_files_dropped", version=v)) == 2
    assert int(snapshot_meta(path, "n_files_scanned", version=v)) == 0
    left = {r["id"] for r in versioned_read(spark, path).collect()}
    assert left == {i for i in range(60) if i % 5 in (0, 1, 2)}
    # (None, None) still refused
    with pytest.raises(ValueError, match="None"):
        versioned_read_where(spark, path, {"id": (None, None)})


def test_bucket_bound_cross_type_derives_nothing(spark, tmp_path):
    """A pushed bound whose Python type differs from the bucket
    SOURCE column's type must not derive a bucket: '05' = 5 coerces
    true in Spark while crc32('05') != crc32('5'), so an int-typed
    bound against a string bucket source would prune the file holding
    the coercing match as "provably match-free" — silent row loss.
    The read stays conservative and the exact residual (with Spark's
    own coercion) finds the row."""
    from skopje_spark.sinks.versioned import (
        _bucket_bound_ok,
        _resolve_bounds,
        _schema_mapping,
        versioned_read_where,
        versioned_write,
    )
    from pyspark.sql.types import LongType, StringType

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("05", "leading-zero"), ("5", "plain"), ("7", "other")],
        "k string, v string",
    )
    versioned_write(df, path, partition_by=["b=bucket(8,k)"])
    schema = versioned_read(spark, path).schema
    # int bound on a string source: no derived bucket unit
    resolved = _resolve_bounds(
        {"k": 5}, schema, _schema_mapping(schema), ["b=bucket(8,k)"]
    )
    assert [u for u in resolved if u["key"] == "b"] == []
    # matching str bound still derives
    resolved2 = _resolve_bounds(
        {"k": "5"}, schema, _schema_mapping(schema), ["b=bucket(8,k)"]
    )
    assert len([u for u in resolved2 if u["key"] == "b"]) == 1
    # end-to-end: the coercing read returns BOTH '05' and '5'
    got = versioned_read_where(spark, path, {"k": 5})
    assert sorted(r["v"] for r in got.collect()) == [
        "leading-zero", "plain"
    ]
    # the guard itself
    assert _bucket_bound_ok("x", StringType())
    assert not _bucket_bound_ok(5, StringType())
    assert _bucket_bound_ok(5, LongType())
    assert not _bucket_bound_ok("5", LongType())
    assert not _bucket_bound_ok(True, LongType())


def test_keyframe_delete_casts_to_table_types(spark, tmp_path):
    """versioned_delete casts the key frame to the TABLE's types
    before stats/bucket pruning (the upsert/merge `aligned`
    discipline): a castable-but-different key type must neither
    under-delete via a wrong-canonical-form bucket derivation nor
    diverge from what MERGE/upsert would match for the same keys."""
    from skopje_spark.sinks.versioned import (
        versioned_delete,
        versioned_write,
    )

    # int-keyed bucketed table, STRING key frame: '05' casts to 5 —
    # pre-fix the bucket of the raw string '05' (crc32('05')) carried
    # the file holding key 5 as match-free and the delete missed it
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(40)], "id long, v string"
    )
    versioned_write(df, path, partition_by=["b=bucket(8,id)"])
    keys = spark.createDataFrame([("05",), ("17",)], "id string")
    versioned_delete(spark, path, keys)
    left = {r["id"] for r in versioned_read(spark, path).collect()}
    assert left == set(range(40)) - {5, 17}
    # string-keyed table, INT key frame: interpreted in the table's
    # type domain (5 -> '5'), consistent with upsert/merge semantics
    path2 = str(tmp_path / "t2")
    df2 = spark.createDataFrame(
        [("05", "a"), ("5", "b"), ("7", "c")], "k string, v string"
    )
    versioned_write(df2, path2, partition_by=["b=bucket(8,k)"])
    versioned_delete(spark, path2, spark.createDataFrame([(5,)], "k long"))
    left2 = sorted(r["k"] for r in versioned_read(spark, path2).collect())
    assert left2 == ["05", "7"]


def test_cross_epoch_bucket_merge_candidacy(spark, tmp_path):
    """A table evolved b=bucket(8,id) -> b2=bucket(16,id) (fresh
    target; same-target re-derivation is refused) prunes MERGE
    candidacy PER EPOCH: old-epoch files carry single-valued 'b'
    stats and close by the b bucket set, new-epoch files close by
    b2 — an m-key MERGE rewrites at most m files from each epoch,
    never the conservative whole."""
    from skopje_spark.sinks.versioned import (
        _bucket_of,
        _bucket_prune_candidates,
        versioned_set_partition_spec,
        versioned_write,
    )

    path = str(tmp_path / "t")
    df1 = spark.createDataFrame(
        [(i, f"old{i}") for i in range(400)], "id long, v string"
    )
    versioned_write(df1, path, partition_by=["b=bucket(8,id)"])
    versioned_set_partition_spec(path, ["b2=bucket(16,id)"])
    df2 = spark.createDataFrame(
        [(i, f"new{i}") for i in range(400, 800)], "id long, v string"
    )
    versioned_append(spark, path, df2)
    base_v = latest_version(path)
    ent = _read_manifest(path, base_v)["files"]
    old_epoch = [e for e in ent if "b" in (e.get("partition") or {})]
    new_epoch = [e for e in ent if "b2" in (e.get("partition") or {})]
    assert len(old_epoch) == 8 and len(new_epoch) >= 8
    # one key from each epoch
    keys = spark.createDataFrame([(17,), (555,)], "id long")
    cand, carried = _bucket_prune_candidates(
        path, base_v, ["id"], keys, list(ent), []
    )
    cand_paths = {e["path"] for e in cand}
    # exactly one old-epoch file (bucket of 17 under b) and one
    # new-epoch file (bucket of 555 under b2) stay candidates
    exp_old = {
        e["path"] for e in old_epoch
        if e["partition"]["b"] == _bucket_of(17, 8)
    }
    exp_new = {
        e["path"] for e in new_epoch
        if e["partition"]["b2"] == _bucket_of(555, 16)
    }
    # the OTHER epoch's bucket of each key also stays (key 17 could
    # live in a new-epoch file and vice versa): candidacy is the
    # union of each epoch's matching buckets
    exp_old |= {
        e["path"] for e in old_epoch
        if e["partition"]["b"] == _bucket_of(555, 8)
    }
    exp_new |= {
        e["path"] for e in new_epoch
        if e["partition"]["b2"] == _bucket_of(17, 16)
    }
    assert cand_paths == exp_old | exp_new
    assert len(cand_paths) <= 4
    # end to end: the MERGE rewrites only those files and lands right
    upd = spark.createDataFrame(
        [(17, "U17"), (555, "U555")], "id long, v string"
    )
    versioned_upsert(spark, path, upd, ["id"])
    got = {r["id"]: r["v"] for r in versioned_read(spark, path).collect()}
    assert got[17] == "U17" and got[555] == "U555" and len(got) == 800
    rewrote = int(
        snapshot_meta(path, "n_files_rewritten", version=base_v + 1)
    )
    assert rewrote <= 4
