"""Unit tests: queryable metadata tables (sinks/versioned.py:
versioned_meta — Iceberg's t$files idea) and their SQL spellings:
attach_versioned(with_meta=True) views and versioned_sql's
DESCRIBE HISTORY / SHOW PARTITIONS / SHOW FILES / SHOW REFS."""

from __future__ import annotations

import json

import pytest

from skopje_spark.sinks.versioned import (
    latest_version,
    versioned_branch,
    versioned_count,
    versioned_delete,
    versioned_meta,
    versioned_tag,
    versioned_write,
)
from skopje_spark.sqlfront import versioned_sql


def _frame(spark, n=20):
    return spark.range(n).selectExpr(
        "CAST(id AS INT) AS k",
        "CAST(id % 4 AS INT) AS g",
        "CAST(id * 1.5 AS DOUBLE) AS x",
    )


def test_meta_files_matches_manifest(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned_write(_frame(spark).repartition(3), path)
    versioned_delete(spark, path, "k < 5")
    files = versioned_meta(spark, path, "files").collect()
    assert len(files) >= 2
    # live_rows fold equals the store's own metadata-only count
    assert sum(r["live_rows"] for r in files) == versioned_count(path)
    assert sum(r["rows"] for r in files) == 20
    assert sum(r["dv_rows"] for r in files) == 5
    # DV'd files report their vector sidecars
    assert any(r["n_dv_files"] >= 1 for r in files)
    # stats JSON carries per-column footer min/max
    st = json.loads(files[0]["stats"])
    assert "k" in st and "min" in st["k"]


def test_meta_partitions_and_files_partition_column(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned_write(_frame(spark), path, partition_by=["g"])
    parts = versioned_meta(spark, path, "partitions").collect()
    assert {r["g"] for r in parts} == {"0", "1", "2", "3"}
    assert all(r["n_rows"] == 5 for r in parts)
    files = versioned_meta(spark, path, "files").collect()
    assert {json.loads(r["partition"])["g"] for r in files} == {0, 1, 2, 3}
    # unpartitioned table refuses (same as SHOW PARTITIONS)
    path2 = str(tmp_path / "t2")
    versioned_write(_frame(spark), path2)
    with pytest.raises(ValueError, match="not partitioned"):
        versioned_meta(spark, path2, "partitions")


def test_meta_refs_and_history(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned_write(_frame(spark), path)
    versioned_tag(path, "rel")
    versioned_branch(path, "b1")
    refs = {r["name"]: r for r in versioned_meta(spark, path, "refs").collect()}
    assert refs["rel"]["type"] == "tag" and refs["rel"]["version"] == 0
    assert refs["b1"]["type"] == "branch" and refs["b1"]["fork_version"] == 1
    hist = versioned_meta(spark, path, "history").collect()
    assert [r["version"] for r in hist] == [0, 1, 2]
    assert hist[0]["n_rows"] == 20
    # version pin sees the refs as of that commit
    refs0 = versioned_meta(spark, path, "refs", version=0).collect()
    assert refs0 == []
    with pytest.raises(ValueError, match="unknown metadata table"):
        versioned_meta(spark, path, "nope")


def test_attach_with_meta_views(spark, tmp_path):
    from skopje_spark.sources.lakesource import attach_versioned

    path = str(tmp_path / "t")
    versioned_write(_frame(spark), path, partition_by=["g"])
    versioned_tag(path, "rel")
    attach_versioned(spark, "mt", path, with_meta=True)
    assert spark.sql("SELECT COUNT(*) AS n FROM mt").first()["n"] == 20
    assert (
        spark.sql("SELECT SUM(live_rows) AS n FROM mt__files").first()["n"]
        == 20
    )
    assert spark.sql("SELECT COUNT(*) AS n FROM mt__partitions").first()["n"] == 4
    assert (
        spark.sql("SELECT name FROM mt__refs").first()["name"] == "rel"
    )
    assert spark.sql(
        "SELECT MAX(version) AS v FROM mt__history"
    ).first()["v"] == latest_version(path)
    # unpartitioned attach: no __partitions view, others present
    path2 = str(tmp_path / "t2")
    versioned_write(_frame(spark), path2)
    attach_versioned(spark, "mt2", path2, with_meta=True)
    assert spark.sql("SELECT COUNT(*) AS n FROM mt2__files").first()["n"] >= 1
    assert not spark.catalog.tableExists("mt2__partitions")


def test_sqlfront_metadata_statements(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned_write(_frame(spark), path, partition_by=["g"])
    versioned_tag(path, "rel")
    hist = versioned_sql(spark, f"DESCRIBE HISTORY '{path}'")
    assert hist.count() == 2  # write + tag commits
    parts = versioned_sql(
        spark, "SHOW PARTITIONS t", tables={"t": path}
    )
    assert parts.count() == 4
    files = versioned_sql(spark, "SHOW FILES t", tables={"t": path})
    assert files.select("path").count() >= 1
    refs = versioned_sql(spark, "SHOW REFS t", tables={"t": path})
    assert refs.first()["name"] == "rel"


def test_sqlfront_merge_branch(spark, tmp_path):
    from skopje_spark.sinks.versioned import (
        versioned_append,
        versioned_read,
    )

    path = str(tmp_path / "t")
    versioned_write(_frame(spark, 4), path)
    versioned_sql(spark, "ALTER TABLE t CREATE BRANCH b1", tables={"t": path})
    from skopje_spark.sinks.versioned import branch_path

    versioned_append(spark, branch_path(path, "b1"), _frame(spark, 6).filter("k >= 4"))
    versioned_append(spark, path, _frame(spark, 8).filter("k >= 6"))
    n = versioned_sql(
        spark, "ALTER TABLE t MERGE BRANCH b1 AND DROP", tables={"t": path}
    )
    assert n == latest_version(path)
    assert versioned_read(spark, path).count() == 8
    from skopje_spark.sinks.versioned import table_refs

    assert "b1" not in table_refs(path)


def test_sqlfront_select_time_travel(spark, tmp_path):
    """versioned_sql SELECT: plain reads, VERSION AS OF, @ref, and a
    join between two pinned snapshots — the SQL spelling of the
    function API's time travel."""
    from skopje_spark.sqlfront import versioned_sql

    path = str(tmp_path / "t")
    versioned_write(_frame(spark, 10), path)              # v0
    versioned_tag(path, "rel")                            # v1
    versioned_delete(spark, path, "k >= 5")               # v2
    t = {"t": path}
    assert versioned_sql(
        spark, "SELECT COUNT(*) AS n FROM t", tables=t
    ).first()["n"] == 5
    assert versioned_sql(
        spark, "SELECT COUNT(*) AS n FROM t VERSION AS OF 0", tables=t
    ).first()["n"] == 10
    assert versioned_sql(
        spark, "SELECT COUNT(*) AS n FROM t@rel", tables=t
    ).first()["n"] == 10
    # diff two snapshots in ONE statement
    gone = versioned_sql(
        spark,
        "SELECT a.k FROM t VERSION AS OF 0 a "
        "LEFT ANTI JOIN t b ON a.k = b.k",
        tables=t,
    )
    assert {r["k"] for r in gone.collect()} == {5, 6, 7, 8, 9}
    with pytest.raises(ValueError, match="referenced none"):
        versioned_sql(spark, "SELECT 1 AS x", tables=t)
