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

Transforms may instead name a built-in OPERATOR (``"op"`` nodes) —
the engine's curation operators exposed declaratively::

    {"name": "trimmed", "kind": "transform", "deps": ["docs"],
     "op": "dup_span_trim",
     "args": {"id_col": "doc_id", "text_col": "text", "n": 8}}

so a whole quality → dedup → span-trim → split pass is a spec
document, no Python required (see ``_op_registry`` for the names).

Streaming pipelines are specs too: ``stream_file`` sources, SQL/op
transforms over the unbounded frame, and ``stream_parquet`` /
``stream_versioned`` sinks (the exactly-once merge into a versioned
table). Streaming sink nodes return the StreamingQuery in
``Pipeline.run``'s result dict — await it to drain.
"""

from __future__ import annotations

import json
from string import Template
from typing import Any

from pyspark.sql import DataFrame

from skopje_spark.pipeline import Pipeline, PipelineContext

_SOURCE_FORMATS = (
    "parquet", "json", "csv", "binary", "http", "stream_file",
    "versioned", "stream_versioned_changes",
)
_SINK_FORMATS = ("parquet", "json", "csv", "versioned", "stream_parquet", "stream_versioned", "stream_changes", "tar_shards")


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
        if fmt == "versioned":
            # snapshot read through the lake connector: manifest-planned
            # splits, stats pruning via pushFilters, DV/rename-aware
            from skopje_spark.sources.pysource import register_all

            register_all(ctx.spark)
            r = ctx.spark.read.format("skopje_versioned").option("path", path)
            if node.get("version") is not None:
                r = r.option("versionAsOf", str(node["version"]))
            if node.get("timestamp") is not None:
                r = r.option("timestampAsOf", str(node["timestamp"]))
            return r.load()
        if fmt == "stream_versioned_changes":
            # streaming CDF source: offsets = commit versions
            from skopje_spark.sources.pysource import register_all

            register_all(ctx.spark)
            r = (
                ctx.spark.readStream.format("skopje_versioned_changes")
                .option("path", path)
            )
            for opt, key in (
                ("starting_version", "startingVersion"),
                ("initial_snapshot", "initialSnapshot"),
                ("allow_unrecorded", "allowUnrecorded"),
            ):
                if node.get(opt) is not None:
                    r = r.option(key, str(node[opt]).lower())
            return r.load()
        if fmt == "stream_file":
            from skopje_spark.streaming.streams import file_stream

            return file_stream(
                ctx.spark, path, schema=node["schema"],
                max_files_per_trigger=node.get("max_files_per_trigger"),
            )
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


def _op_registry() -> dict:
    """Named operator transforms for ``op`` nodes — the curation
    operators exposed declaratively (lazy imports keep spec loading
    light and cycle-free). Each value is ``(n_deps, callable)`` where
    the callable takes that many DataFrames then keyword args."""
    from skopje_spark.operators.bloom import bloom_anti_join
    from skopje_spark.operators.dedup import (
        contamination_report,
        dedup_canonical,
        dedup_exact,
        dup_span_trim,
        semantic_dedup,
    )
    from skopje_spark.operators.sampling import (
        cap_per_group,
        leakage_safe_split,
        mixture_sample,
        split_assign,
    )
    from skopje_spark.operators.text import bm25_scores, quality_features

    def _with_bpe(op):
        # tokenizer ops take a model OBJECT; declaratively the model is
        # its persisted parquet artifact (bpe_model_write), loaded here
        def fn(df, *, model_path, text_col="text", **kw):
            from skopje_spark.operators.tokenizer import bpe_model_read

            model = bpe_model_read(df.sparkSession, model_path)
            return op(df, text_col, model, **kw)

        return fn

    from skopje_spark.operators.tokenizer import bpe_encode, token_count_bpe
    from skopje_spark.operators.quality import psi_drift_binned

    def _lsh_probe_op(df, *, path, **kw):
        from skopje_spark.operators.dedup import lsh_index_probe

        return lsh_index_probe(df, path, **kw)

    # column-expression extractors exposed as withColumn ops
    from pyspark.sql import functions as _F

    from skopje_spark.operators.webtext import (
        boilerplate_strip,
        c4_line_filter,
        canonical_url,
        gopher_quality_flags,
        html_to_text,
        url_host,
    )

    def _html_extract(df, *, src_col, out_col="text"):
        return df.withColumn(out_col, html_to_text(_F.col(src_col)))

    def _quality_score(df, *, model_path, **kw):
        from skopje_spark.operators.classifier import quality_score

        return quality_score(df, model_path, **kw)

    def _url_canon(df, *, src_col, out_col="url_canon", host_col=None):
        out = df.withColumn(out_col, canonical_url(_F.col(src_col)))
        if host_col:
            out = out.withColumn(host_col, url_host(_F.col(src_col)))
        return out

    return {
        "token_count_bpe": (1, _with_bpe(token_count_bpe)),
        "bpe_encode": (1, _with_bpe(bpe_encode)),
        "dedup_exact": (1, dedup_exact),
        "dedup_canonical": (1, dedup_canonical),
        "dup_span_trim": (1, dup_span_trim),
        "semantic_dedup": (1, semantic_dedup),
        "quality_features": (1, quality_features),
        "bm25_scores": (1, bm25_scores),
        "split_assign": (1, split_assign),
        "leakage_safe_split": (1, leakage_safe_split),
        "cap_per_group": (1, cap_per_group),
        "mixture_sample": (1, mixture_sample),
        "contamination_report": (2, contamination_report),
        "bloom_anti_join": (2, bloom_anti_join),
        # persisted-index probe: the index is its on-disk artifact
        # (lsh_index_write), addressed by path like the BPE model
        "lsh_index_probe": (1, _lsh_probe_op),
        "psi_drift_binned": (2, psi_drift_binned),
        # crawl text extraction (operators/webtext.py)
        "html_extract": (1, _html_extract),
        "url_canonicalize": (1, _url_canon),
        "gopher_quality_flags": (1, gopher_quality_flags),
        "c4_line_filter": (1, c4_line_filter),
        "boilerplate_strip": (1, boilerplate_strip),
        # persisted-model quality scoring (classifier.logreg_model_write)
        "quality_score": (1, _quality_score),
    }


def _make_transform(node: dict):
    deps = list(node["deps"])
    if ("sql" in node) == ("op" in node):
        raise ValueError(
            f"transform {node.get('name')!r} needs exactly one of 'sql' or 'op'"
        )

    if "op" in node:
        op_name, kwargs = node["op"], dict(node.get("args", {}))

        def fn(ctx: PipelineContext, *dfs: DataFrame) -> DataFrame:
            reg = _op_registry()
            if op_name not in reg:
                raise ValueError(
                    f"unknown op {op_name!r}; available: {sorted(reg)}"
                )
            n_deps, op = reg[op_name]
            if len(dfs) != n_deps:
                raise ValueError(
                    f"op {op_name!r} takes {n_deps} dep(s), node has {len(dfs)}"
                )
            return op(*dfs, **kwargs)

        return fn

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
        if fmt == "versioned":
            from skopje_spark.sinks.versioned import (
                versioned_upsert,
                versioned_write,
            )

            keys = node.get("keys")
            # declarative partition spec: applied on table creation;
            # later MERGEs inherit it from the carried table property
            pby = node.get("partition_by")
            # declarative value index: installed once right after the
            # table exists; the carried property then self-maintains
            # on every later write (_maintain_value_index)
            vi = node.get("value_index")

            def _ensure_value_index(version: int) -> int:
                if not vi:
                    return version
                from skopje_spark.sinks.versioned import (
                    snapshot_meta,
                    versioned_value_index,
                )

                if snapshot_meta(
                    path, "value_index", version=version
                ) is None:
                    return versioned_value_index(
                        ctx.spark, path, list(vi["cols"]),
                        max_distinct=int(vi.get("max_distinct", 64)),
                    )
                return version

            if keys:  # MERGE by key into the committed table
                from skopje_spark.sinks.versioned import latest_version

                if latest_version(path) is None:
                    return _ensure_value_index(versioned_write(
                        df, path, partition_by=list(pby) if pby else None
                    ))
                return _ensure_value_index(
                    versioned_upsert(ctx.spark, path, df, list(keys))
                )
            return _ensure_value_index(versioned_write(
                df, path, partition_by=list(pby) if pby else None
            ))
        if fmt == "stream_parquet":
            from skopje_spark.streaming.streams import parquet_stream_sink

            return parquet_stream_sink(
                df, path, _interp(node["checkpoint"], ctx.conf),
                available_now=node.get("available_now", True),
            )
        if fmt == "stream_versioned":
            from skopje_spark.sinks.versioned import versioned_stream_upsert

            return versioned_stream_upsert(
                df, path, list(node["keys"]),
                _interp(node["checkpoint"], ctx.conf),
                available_now=node.get("available_now", True),
            )
        if fmt == "stream_changes":
            # exactly-once I/U/D changelog ingestion (one commit/batch)
            from skopje_spark.sinks.versioned import (
                versioned_stream_apply_changes,
            )

            return versioned_stream_apply_changes(
                df, path, list(node["keys"]),
                _interp(node["checkpoint"], ctx.conf),
                op_col=node.get("op_col", "__op"),
                available_now=node.get("available_now", True),
                change_feed=node.get("change_feed", False),
            )
        if fmt == "tar_shards":
            # training-delivery shards (sinks/shards.py)
            from skopje_spark.sinks.shards import write_tar_shards

            return write_tar_shards(
                df, path, id_col=node["id_col"],
                members=dict(node["members"]),
                n_shards=node.get("n_shards", 8),
            )
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
