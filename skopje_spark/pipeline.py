"""Extract → Transform → Load pipeline graph.

Re-expression of the reference's pipeline-node abstraction: the
`Extract` trait ("how is data extracted", ``/root/reference/src/etl.rs:14-19``)
and the `Load` trait ("how is data loaded", ``/root/reference/src/etl.rs:22-28``),
plus the declarative source/sink binding sketched (but never shipped) in
the reference's attribute macro (``/root/reference/skopje-macros/src/lib.rs:12-75``).

Spark-first translation:

- A **source** node is ``(ctx) -> DataFrame`` — it *declares* a scan
  (``spark.read...``); nothing is fetched until an action runs.
- A **transform** node is ``(ctx, *parent_dfs) -> DataFrame`` — pure
  plan composition; Catalyst sees the whole graph and optimizes across
  node boundaries (filter pushdown through transforms into scans).
- A **sink** node is ``(ctx, df) -> Any`` — the only place actions
  happen (``df.write...``), mirroring how the reference's `Load::load`
  is the only effectful stage.

Because nodes compose *lazy plans* rather than materialized batches,
a pipeline of N transforms costs one optimized Spark job per sink —
not N materializations. That is the property that lets the same graph
run on 60k rows locally and 100 TB on a cluster: the engine never
inserts a collect/cache between stages unless the user opts in via
``cache=True`` (useful when one source feeds many sinks).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


@dataclass
class PipelineContext:
    """Carried into every node: the session plus free-form config
    (connection strings, paths, retry policies — the analog of the
    typed `Client` parameter threaded through the reference's traits,
    ``/root/reference/src/etl.rs:15,24``)."""

    spark: SparkSession
    conf: dict[str, Any] = field(default_factory=dict)


@dataclass
class _Node:
    name: str
    kind: str  # 'source' | 'transform' | 'sink'
    fn: Callable
    deps: tuple[str, ...] = ()
    cache: bool = False


class Pipeline:
    """A named DAG of source/transform/sink nodes.

    >>> p = Pipeline("demo")
    >>> p.source("orders", lambda ctx: ctx.spark.read.parquet(...))
    >>> p.transform("big", lambda ctx, o: o.filter("o_totalprice > 100"),
    ...             deps=["orders"])
    >>> p.sink("out", lambda ctx, df: df.write.mode("overwrite").parquet(...),
    ...        dep="big")
    >>> results = p.run(spark)
    """

    def __init__(self, name: str = "pipeline"):
        self.name = name
        self._nodes: dict[str, _Node] = {}

    # -- graph construction -------------------------------------------------
    def _add(self, node: _Node) -> str:
        if node.name in self._nodes:
            raise ValueError(f"duplicate node {node.name!r}")
        for d in node.deps:
            if d not in self._nodes:
                raise ValueError(f"node {node.name!r} depends on unknown {d!r}")
        self._nodes[node.name] = node
        return node.name

    def source(self, name: str, fn: Callable[[PipelineContext], DataFrame],
               *, cache: bool = False) -> str:
        """Register an extract node (`Extract` analog)."""
        return self._add(_Node(name, "source", fn, (), cache))

    def transform(self, name: str, fn: Callable, *, deps: list[str],
                  cache: bool = False) -> str:
        """Register a transform node; ``fn(ctx, *parent_dfs)``."""
        return self._add(_Node(name, "transform", fn, tuple(deps), cache))

    def sink(self, name: str, fn: Callable[[PipelineContext, DataFrame], Any],
             *, dep: str) -> str:
        """Register a load node (`Load` analog); the only effectful kind."""
        return self._add(_Node(name, "sink", fn, (dep,)))

    # -- execution ----------------------------------------------------------
    def _topo_order(self) -> list[_Node]:
        order: list[_Node] = []
        seen: dict[str, int] = {}  # 0=visiting, 1=done

        def visit(name: str) -> None:
            state = seen.get(name)
            if state == 1:
                return
            if state == 0:
                raise ValueError(f"cycle through node {name!r}")
            seen[name] = 0
            for d in self._nodes[name].deps:
                visit(d)
            seen[name] = 1
            order.append(self._nodes[name])

        for name in self._nodes:
            visit(name)
        return order

    def run(self, spark: SparkSession,
            conf: dict[str, Any] | None = None) -> dict[str, Any]:
        """Execute the graph: compose all plans, then run each sink.

        Returns ``{node_name: DataFrame | sink_result}`` so callers can
        inspect intermediate plans (still lazy) after the run.
        """
        ctx = PipelineContext(spark=spark, conf=dict(conf or {}))
        out: dict[str, Any] = {}
        for node in self._topo_order():
            if node.kind == "source":
                df = node.fn(ctx)
            elif node.kind == "transform":
                df = node.fn(ctx, *[out[d] for d in node.deps])
            else:  # sink — the action boundary
                out[node.name] = node.fn(ctx, out[node.deps[0]])
                continue
            if node.cache:
                df = df.cache()
            out[node.name] = df
        return out
