"""Aggregate navigator: answer aggregation queries FROM a registered
materialized rollup instead of the base table when compatibility
allows — the query-rewrite half of the MV story (the maintenance half
lives in ``queries/incremental.py`` / ``sinks/versioned.py``).

The rewrite rule is the standard aggregate-table criterion
(Mondrian-style navigators, Oracle query rewrite, BigQuery BI Engine):
a request (keys K, aggregates A, key-filters F) is answerable from a
view with grouping keys V when

- K ⊆ V (the view is at least as fine-grained as the request),
- every filter column ∈ V (filtering pre-rollup is exact),
- every requested aggregate is derivable from the view's columns:
  SUM from SUM (re-summed), COUNT from COUNT (re-summed), MIN/MAX
  from MIN/MAX (re-min/maxed), AVG from SUM+COUNT (never from AVG —
  averaging averages is the classic wrong answer).

At 100 TB this is the difference between scanning the fact table and
scanning a few thousand rollup rows: the navigator picks the SMALLEST
compatible view (fewest grouping keys ⇒ fewest rows) and only falls
back to the base relation when nothing qualifies. Answering from the
view is exact, not approximate — the gate proves view-answered ==
base-computed.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# requested aggregate: out_col -> (fn, base_col); fn in the table below
_DERIVABLE = {"sum", "count", "min", "max", "avg"}


@dataclass(frozen=True, eq=False)
class AggView:
    """A registered materialized rollup.

    ``aggs`` maps each view column to what it holds over the base:
    ``{"qty_sum": ("sum", "l_quantity"), "n": ("count", "*")}``.
    ``load`` returns the view's current contents (parquet dir,
    versioned table, anything that yields a DataFrame). ``eq=False``
    keeps the (dict-carrying) dataclass hashable — views compare and
    hash by identity, which is what a registration catalog wants.
    """

    name: str
    keys: tuple[str, ...]
    aggs: dict[str, tuple[str, str]]
    load: Callable[[SparkSession], DataFrame]

    def _source_for(self, fn: str, col: str) -> str | None:
        for view_col, (vfn, vcol) in self.aggs.items():
            if vfn == fn and vcol == col:
                return view_col
        return None


def _derivation(view: AggView, fn: str, col: str):
    """Column expression computing the requested aggregate from the
    view's columns, or None if not derivable."""
    if fn == "sum":
        src = view._source_for("sum", col)
        return F.sum(src) if src else None
    if fn == "count":
        src = view._source_for("count", col)
        return F.sum(src) if src else None
    if fn == "min":
        src = view._source_for("min", col)
        return F.min(src) if src else None
    if fn == "max":
        src = view._source_for("max", col)
        return F.max(src) if src else None
    if fn == "avg":
        # AVG ignores nulls, so the divisor must be the PER-MEASURE
        # count — deriving from count(*) silently undercounts the mean
        # whenever the measure has nulls. This is why real aggregate
        # tables record count(col) alongside sum(col).
        s = view._source_for("sum", col)
        c = view._source_for("count", col)
        if s and c:
            return F.sum(s) / F.sum(c)
        return None
    return None


def answerable(view: AggView, keys: Sequence[str],
               aggs: dict[str, tuple[str, str]],
               filters: dict[str, Sequence] | None = None) -> bool:
    if not set(keys) <= set(view.keys):
        return False
    if filters and not set(filters) <= set(view.keys):
        return False
    return all(
        fn in _DERIVABLE and _derivation(view, fn, col) is not None
        for fn, col in aggs.values()
    )


def answer_from_view(spark: SparkSession, view: AggView,
                     keys: Sequence[str],
                     aggs: dict[str, tuple[str, str]],
                     filters: dict[str, Sequence] | None = None
                     ) -> DataFrame:
    df = view.load(spark)
    for col, values in (filters or {}).items():
        df = df.filter(F.col(col).isin(list(values)))
    exprs = [
        _derivation(view, fn, col).alias(out)
        for out, (fn, col) in aggs.items()
    ]
    return df.groupBy(*keys).agg(*exprs) if keys else df.agg(*exprs)


def _base_answer(base_df: DataFrame, keys: Sequence[str],
                 aggs: dict[str, tuple[str, str]],
                 filters: dict[str, Sequence] | None) -> DataFrame:
    df = base_df
    for col, values in (filters or {}).items():
        df = df.filter(F.col(col).isin(list(values)))
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max,
           "avg": F.avg}
    exprs = [
        fns[fn](F.lit(1) if col == "*" else col).alias(out)
        for out, (fn, col) in aggs.items()
    ]
    return df.groupBy(*keys).agg(*exprs) if keys else df.agg(*exprs)


def mv_answer(spark: SparkSession, catalog: Sequence[AggView],
              base_df: DataFrame, keys: Sequence[str],
              aggs: dict[str, tuple[str, str]],
              filters: dict[str, Sequence] | None = None
              ) -> tuple[DataFrame, str]:
    """Route a (keys, aggs, filters) aggregation request: the smallest
    compatible view wins; the base relation is the fallback. Returns
    (result, source_name) where source_name is the chosen view's name
    or ``"__base__"`` — callers/tests assert the routing decision
    explicitly instead of inferring it from timings."""
    candidates = [v for v in catalog if answerable(v, keys, aggs, filters)]
    if candidates:
        best = min(candidates, key=lambda v: len(v.keys))
        return answer_from_view(spark, best, keys, aggs, filters), best.name
    return _base_answer(base_df, keys, aggs, filters), "__base__"

# -- transparent SQL rewrite -------------------------------------------------

_AGG_ITEM = r"(?:(SUM|COUNT|MIN|MAX|AVG)\s*\(\s*(\*|\w+)\s*\)\s+AS\s+(\w+)|(\w+))"
_SQL_SHAPE = (
    r"^\s*SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<base>\w+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"\s+GROUP\s+BY\s+(?P<keys>[\w\s,]+?)\s*;?\s*$"
)
_IN_PRED = r"^\s*(\w+)\s+IN\s*\(\s*([^)]+?)\s*\)\s*$"


def parse_agg_select(sql: str):
    """Parse the navigator-eligible SQL shape:

        SELECT k1, k2, FN(col) AS alias, ... FROM base
        [WHERE k IN (v, ...) [AND k2 IN (...)]]
        GROUP BY k1, k2

    Returns (base, keys, aggs, filters) or None when the statement
    doesn't fit — callers treat None as "run it as plain SQL". The
    grammar is deliberately narrow: a rewrite layer that half-parses
    general SQL produces wrong answers silently; this one either
    recognizes the whole statement or declines loudly.
    """
    import re

    m = re.match(_SQL_SHAPE, sql, re.IGNORECASE | re.DOTALL)
    if not m:
        return None
    keys = [k.strip() for k in m.group("keys").split(",") if k.strip()]
    aggs: dict[str, tuple[str, str]] = {}
    sel_keys: list[str] = []
    for part in _split_top_level(m.group("items")):
        im = re.match(rf"{_AGG_ITEM}$", part.strip(), re.IGNORECASE)
        if not im:
            return None
        if im.group(4):
            sel_keys.append(im.group(4))
        else:
            alias = im.group(3)
            if alias in aggs or alias in keys:
                return None  # duplicate alias: decline, never collapse
            aggs[alias] = (im.group(1).lower(), im.group(2))
    if sorted(sel_keys) != sorted(keys) or not aggs:
        return None
    filters: dict[str, list] = {}
    if m.group("where"):
        import ast

        for pred in re.split(r"\s+AND\s+", m.group("where"),
                             flags=re.IGNORECASE):
            pm = re.match(_IN_PRED, pred.strip(), re.IGNORECASE)
            if not pm:
                return None
            vals = []
            for tok in pm.group(2).split(","):
                tok = tok.strip()
                try:
                    vals.append(ast.literal_eval(tok))
                except (ValueError, SyntaxError):
                    return None
            filters[pm.group(1)] = vals
    return m.group("base"), keys, aggs, filters


def _split_top_level(items: str) -> list[str]:
    """Split a select list on commas that are not inside parens."""
    out, depth, cur = [], 0, []
    for ch in items:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def rewrite_sql(spark: SparkSession, catalog: Sequence[AggView],
                bases: dict[str, DataFrame], sql: str
                ) -> tuple[DataFrame, str]:
    """Transparent MV rewrite for SQL text: recognize the aggregate
    shape, route through :func:`mv_answer`; any statement outside the
    grammar (or over an unknown base) runs as plain ``spark.sql`` with
    the bases registered as temp views — same answer, no rewrite.
    Returns (result, source): a view name, ``"__base__"`` (navigator
    fallback), or ``"__sql__"`` (not navigator-eligible)."""
    parsed = parse_agg_select(sql)
    if parsed and parsed[0] in bases:
        base, keys, aggs, filters = parsed
        return mv_answer(spark, catalog, bases[base], keys, aggs,
                         filters or None)
    # plain-SQL fallback must be side-effect-free: capture any temp
    # view we are about to clobber and put it back after the plan is
    # analyzed (spark.sql resolves eagerly, so restoring immediately
    # does not change the returned DataFrame)
    saved: dict[str, DataFrame | None] = {}
    for name, df in bases.items():
        try:
            saved[name] = spark.table(name) if spark.catalog.tableExists(name) else None
        except Exception:
            saved[name] = None
        df.createOrReplaceTempView(name)
    try:
        out = spark.sql(sql)
    finally:
        for name, old in saved.items():
            if old is not None:
                old.createOrReplaceTempView(name)
            else:
                spark.catalog.dropTempView(name)
    return out, "__sql__"


def agg_view_of_ivm(name: str, group_keys: Sequence[str],
                    sum_cols: Sequence[str] = (),
                    min_cols: Sequence[str] = (),
                    max_cols: Sequence[str] = (),
                    *, load: Callable[[SparkSession], DataFrame]
                    ) -> AggView:
    """Bridge an :func:`skopje_spark.operators.ivm.ivm_build` view into
    the navigator. IVM views already carry exactly the derivable
    layout — ``__n`` (count*), ``__sum_<c>`` + ``__nn_<c>`` (the
    per-measure count AVG needs), ``__min_<c>``/``__max_<c>`` — so a
    view that is MAINTAINED incrementally (ivm_apply folds each
    changelog in O(|view|+|changes|)) doubles as a REWRITE target with
    no extra bookkeeping: refresh and answer are the same table."""
    aggs: dict[str, tuple[str, str]] = {"__n": ("count", "*")}
    for c in sum_cols:
        aggs[f"__sum_{c}"] = ("sum", c)
        aggs[f"__nn_{c}"] = ("count", c)
    for c in min_cols:
        aggs[f"__min_{c}"] = ("min", c)
    for c in max_cols:
        aggs[f"__max_{c}"] = ("max", c)
    return AggView(name, tuple(group_keys), aggs, load=load)
