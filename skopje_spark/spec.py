"""Declarative pipeline specs: a dict/JSON document → Pipeline graph.

This is the end-state API the reference sketched but never shipped —
the commented-out ``#[skopje::extract(method = HTTP_GET, url = ...)]``
attribute macro pairing a source binding with a sink binding
(``/root/reference/skopje-macros/src/lib.rs:12-75``). A spec document
plays that role here, with one upgrade the reference could not offer:
**transforms are plain SQL strings**, executed by Spark SQL — the same
delegated-SQL contract skopje users already write into ``fetch_stmt``
(``/root/reference/src/extract/pg.rs:12-31``), now running on the
engine itself.

Spec shape::

    {"name": "demo", "nodes": [
      {"name": "orders", "kind": "source", "format": "parquet",
       "path": ".../orders.parquet"},
      {"name": "big", "kind": "transform", "deps": ["orders"],
       "sql": "SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1"},
      {"name": "out", "kind": "sink", "format": "parquet", "dep": "big",
       "path": ".../out", "mode": "overwrite",
       "partition_by": ["day"], "dedup_keys": ["k"]}
    ]}

Each transform's dependencies are registered as temp views under their
node names before the SQL runs, so the SQL references them like
tables. ``${key}`` placeholders in ``path``/``url``/``sql`` interpolate
from ``Pipeline.run(conf=...)`` at execution time.
"""

from __future__ import annotations

import json
from string import Template
from typing import Any

from pyspark.sql import DataFrame

from skopje_spark.pipeline import Pipeline, PipelineContext

_SOURCE_FORMATS = ("parquet", "json", "csv", "binary", "http")
_SINK_FORMATS = ("parquet", "json", "csv")


def _interp(value: str, conf: dict[str, Any]) -> str:
    return Template(value).safe_substitute(conf)


def _make_source(node: dict):
    fmt = node["format"]
    if fmt not in _SOURCE_FORMATS:
        raise ValueError(f"unknown source format {fmt!r}")

    def fn(ctx: PipelineContext) -> DataFrame:
        from skopje_spark.sources import (
            binary_source,
            csv_source,
            fetch_json,
            json_source,
            parquet_source,
        )

        if fmt == "http":
            return fetch_json(
                ctx.spark, _interp(node["url"], ctx.conf),
                schema=node.get("schema"),
            )
        path = _interp(node["path"], ctx.conf)
        if fmt == "parquet":
            return parquet_source(ctx.spark, path, columns=node.get("columns"))
        if fmt == "json":
            return json_source(
                ctx.spark, path, schema=node.get("schema"),
                multi_line=node.get("multi_line", False),
            )
        if fmt == "csv":
            return csv_source(
                ctx.spark, path, schema=node.get("schema"),
                header=node.get("header", True),
            )
        return binary_source(ctx.spark, path, glob=node.get("glob"))

    return fn


def _make_transform(node: dict):
    deps = list(node["deps"])
    sql = node["sql"]

    def fn(ctx: PipelineContext, *dfs: DataFrame) -> DataFrame:
        for name, df in zip(deps, dfs):
            df.createOrReplaceTempView(name)
        return ctx.spark.sql(_interp(sql, ctx.conf))

    return fn


def _make_sink(node: dict):
    fmt = node["format"]
    if fmt not in _SINK_FORMATS:
        raise ValueError(f"unknown sink format {fmt!r}")

    def fn(ctx: PipelineContext, df: DataFrame):
        from skopje_spark.sinks import csv_sink, json_sink, parquet_sink

        path = _interp(node["path"], ctx.conf)
        mode = node.get("mode", "append")
        dedup = node.get("dedup_keys")
        if fmt == "parquet":
            return parquet_sink(
                df, path, mode=mode, dedup_keys=dedup,
                partition_by=node.get("partition_by"),
            )
        if fmt == "json":
            return json_sink(df, path, mode=mode, dedup_keys=dedup)
        return csv_sink(df, path, mode=mode, dedup_keys=dedup)

    return fn


def pipeline_from_spec(spec: dict | str) -> Pipeline:
    """Build a :class:`Pipeline` from a spec dict (or JSON string)."""
    if isinstance(spec, str):
        spec = json.loads(spec)
    p = Pipeline(spec.get("name", "pipeline"))
    for node in spec["nodes"]:
        kind = node["kind"]
        if kind == "source":
            p.source(node["name"], _make_source(node),
                     cache=node.get("cache", False))
        elif kind == "transform":
            p.transform(node["name"], _make_transform(node),
                        deps=list(node["deps"]), cache=node.get("cache", False))
        elif kind == "sink":
            p.sink(node["name"], _make_sink(node), dep=node["dep"])
        else:
            raise ValueError(f"unknown node kind {kind!r}")
    return p
