"""Unit tests: snapshot export as an external-engine file list
(sinks/versioned.py:versioned_export_manifest — the symlink-format-
manifest idea). The cross-engine proof is REAL here: DuckDB reads the
exported manifest and must see exactly the snapshot's content."""

from __future__ import annotations

import os

import duckdb
import pytest

from skopje_spark.sinks.versioned import (
    versioned_compact,
    versioned_count,
    versioned_delete,
    versioned_export_manifest,
    versioned_rename_column,
    versioned_tag,
    versioned_write,
)


def _frame(spark, n=30):
    return spark.range(n).selectExpr(
        "CAST(id AS INT) AS k", "CAST(id % 3 AS INT) AS g"
    )


def _duck_files(manifest_path):
    with open(manifest_path) as f:
        return [ln for ln in f.read().splitlines() if ln]


def test_export_read_back_by_duckdb(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned_write(_frame(spark).repartition(3), path)
    res = versioned_export_manifest(path)
    assert res["version"] == 0 and res["n_files"] >= 1
    files = _duck_files(res["manifest_path"])
    con = duckdb.connect()
    n, ksum = con.execute(
        "SELECT COUNT(*), SUM(k) FROM read_parquet($f)", {"f": files}
    ).fetchone()
    assert n == 30 and ksum == sum(range(30))
    assert n == versioned_count(path)


def test_export_partitioned_writes_per_tuple_manifests(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned_write(_frame(spark), path, partition_by=["g"])
    res = versioned_export_manifest(path, str(tmp_path / "out"))
    root = os.path.dirname(res["manifest_path"])
    con = duckdb.connect()
    for g in (0, 1, 2):
        sub = os.path.join(root, f"g={g}", "manifest")
        assert os.path.isfile(sub)
        n = con.execute(
            "SELECT COUNT(*) FROM read_parquet($f)",
            {"f": _duck_files(sub)},
        ).fetchone()[0]
        assert n == 10
    # flat manifest is the union
    assert sorted(
        p for g in (0, 1, 2)
        for p in _duck_files(os.path.join(root, f"g={g}", "manifest"))
    ) == _duck_files(res["manifest_path"])


def test_export_refuses_dvs_then_exports_after_purge(spark, tmp_path):
    from skopje_spark.sinks.versioned import versioned_purge

    path = str(tmp_path / "t")
    versioned_write(_frame(spark).coalesce(1), path)
    versioned_delete(spark, path, "k IN (1, 2)")
    with pytest.raises(ValueError, match="deletion vectors"):
        versioned_export_manifest(path)
    v = versioned_purge(spark, path, min_dv_ratio=1e-9)
    res = versioned_export_manifest(path, version=v)
    con = duckdb.connect()
    n = con.execute(
        "SELECT COUNT(*) FROM read_parquet($f)",
        {"f": _duck_files(res["manifest_path"])},
    ).fetchone()[0]
    assert n == 28


def test_export_refuses_renamed_until_rewrite(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned_write(_frame(spark), path)
    versioned_rename_column(path, "k", "key")
    with pytest.raises(ValueError, match="renamed"):
        versioned_export_manifest(path)
    versioned_compact(spark, path, target_files=1)
    res = versioned_export_manifest(path)
    con = duckdb.connect()
    cols = [
        d[0] for d in con.execute(
            "SELECT * FROM read_parquet($f) LIMIT 0",
            {"f": _duck_files(res["manifest_path"])},
        ).description
    ]
    assert "key" in cols and "k" not in cols


def test_export_version_pin_and_ref(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned_write(_frame(spark, 10), path)          # v0
    versioned_tag(path, "rel")                        # v1
    res0 = versioned_export_manifest(path, str(tmp_path / "o0"), version=0)
    resr = versioned_export_manifest(path, str(tmp_path / "or"), ref="rel")
    assert _duck_files(res0["manifest_path"]) == _duck_files(
        resr["manifest_path"]
    )
    with pytest.raises(ValueError, match="not both"):
        versioned_export_manifest(path, version=0, ref="rel")
