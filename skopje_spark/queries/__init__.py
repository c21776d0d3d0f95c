"""Query registry — the driver-facing operator catalog.

Every operator the engine claims (SURVEY.md §2) is declared here as a
named query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus,
where SQL-expressible, an equivalent DuckDB oracle SQL string. The
driver hash-compares the two at sf0.01 (row count + schema +
order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- floating-point aggregates are ``ROUND``-ed on both sides (summation
  order differs between engines, so raw double sums differ in the last
  ulps);
- every LIMIT / top-k is made deterministic with a total order
  (explicit tiebreak keys).

Import side effects populate the registry; ``__spark_entry__.py`` just
re-exports it.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the catalog.

    ``oracle`` is DuckDB-dialect SQL over the pre-registered views
    (region nation customer supplier part orders lineitem events
    documents embeddings). ``None`` marks a genuinely
    non-SQL-expressible op (driver records a weaker rows-only check).
    """

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import every query module (side-effect registration) and return
    the full registry."""
    from skopje_spark.queries import (  # noqa: F401
        aggregates,
        analytics,
        cdc_scd,
        crawl_text,
        formats_scale,
        joins,
        keymap_demo,
        layout,
        incremental,
        jdbc_live,
        linkage,
        llm_dedup,
        llm_multimodal,
        llm_packing,
        llm_pipeline,
        llm_similarity,
        llm_text,
        mv_rewrite,
        profiling,
        recursive,
        relational,
        relational_extra,
        scalars,
        scale_ops,
        setops,
        sketch_state,
        sql_lang,
        streaming_windows,
        subqueries,
        tpch_extra,
        tpch_extra2,
        udfs,
        window_funcs,
    )

    return REGISTRY
