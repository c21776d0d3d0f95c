"""Unit tests: per-table parquet compression codec
(versioned_write(codec=) → carried ``parquet_codec`` property). One
creation-time knob governs every later staging write — append, upsert,
compact — plus clones and connector writes."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from skopje_spark.sinks.versioned import (
    _read_manifest,
    latest_version,
    snapshot_meta,
    versioned_append,
    versioned_clone,
    versioned_compact,
    versioned_upsert,
    versioned_write,
)


def _codecs(path, version):
    out = set()
    for e in _read_manifest(path, version)["files"]:
        md = pq.read_metadata(os.path.join(path, e["path"]))
        out.add(md.row_group(0).column(0).compression)
    return out


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, ["k", "v"])


def test_codec_set_at_create_and_inherited(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a"), (2, "b")]).coalesce(1), path,
                    codec="zstd")
    assert snapshot_meta(path, "parquet_codec", version=0) == "zstd"
    assert _codecs(path, 0) == {"ZSTD"}
    # append inherits via the carried property — no codec arg
    versioned_append(spark, path, _kv(spark, [(3, "c")]).coalesce(1))
    assert _codecs(path, 1) == {"ZSTD"}
    # upsert's rewritten + new files inherit too
    versioned_upsert(spark, path, _kv(spark, [(1, "A"), (9, "z")]), ["k"])
    assert _codecs(path, latest_version(path)) == {"ZSTD"}
    # compaction keeps the codec (the property carries forward)
    versioned_compact(spark, path, target_files=1)
    v = latest_version(path)
    assert _codecs(path, v) == {"ZSTD"}
    assert snapshot_meta(path, "parquet_codec", version=v) == "zstd"


def test_codec_default_is_engine_default(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a")]).coalesce(1), path)
    assert snapshot_meta(path, "parquet_codec", version=0) is None
    assert _codecs(path, 0) == {"SNAPPY"}


def test_codec_clone_and_connector_write(spark, tmp_path):
    from skopje_spark.sources.pysource import register_all

    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a")]).coalesce(1), path, codec="zstd")
    clone = str(tmp_path / "c")
    versioned_clone(path, clone)
    versioned_append(spark, clone, _kv(spark, [(2, "b")]).coalesce(1))
    assert _codecs(clone, latest_version(clone)) == {"ZSTD"}
    # connector append honors the table property
    register_all(spark)
    (
        _kv(spark, [(5, "e")])
        .coalesce(1)
        .write.format("skopje_versioned")
        .option("path", path)
        .mode("append")
        .save()
    )
    assert _codecs(path, latest_version(path)) == {"ZSTD"}
