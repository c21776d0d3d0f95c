"""Physical-plan inspection: the engine's scale-contract enforcement.

At 100 TB the difference between a correct plan and a catastrophic one
is invisible in row-level tests — a missing parquet filter pushdown or
an accidental cartesian product produces the same rows, 1000× slower.
These helpers turn `.explain("formatted")` output into assertable
strings so the test suite pins the plan *shape* of every headline
query (tests/test_plans.py):

- filters reach the scan (``PushedFilters``);
- the read schema is pruned to referenced columns (``ReadSchema``);
- dimension joins broadcast (``BroadcastHashJoin``);
- nothing degenerates to ``CartesianProduct``;
- hot paths stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (what ``df.explain(mode)`` prints)."""
    jqe = df._jdf.queryExecution()  # noqa: SLF001 — no public accessor
    jvm = df.sparkSession._jvm
    return jqe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty PushedFilters clause in the scan nodes."""
    out = []
    for line in plan_text(df).splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:") and "[]" not in s:
            out.append(s.removeprefix("PushedFilters:").strip())
    return out


def scan_schemas(df: DataFrame) -> list[str]:
    """ReadSchema clause of each file scan (column-pruning evidence)."""
    return [
        line.strip().removeprefix("ReadSchema:").strip()
        for line in plan_text(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names appearing in the plan, in plan order."""
    names = (
        "BroadcastHashJoin",
        "ShuffledHashJoin",
        "SortMergeJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    )
    found = []
    for line in plan_text(df).splitlines():
        for n in names:
            if n in line:
                found.append(n)
                break
    return found


def num_shuffles(df: DataFrame) -> int:
    """Count of SHUFFLE Exchange operators in the (pre-AQE) physical
    plan — simple mode, where each node prints exactly once.
    BroadcastExchange (no shuffle) and ReusedExchange (already counted
    at its definition) are excluded."""
    return sum(
        1
        for line in plan_text(df, "simple").splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and "ReusedExchange" not in line
    )


def has_codegen(df: DataFrame) -> bool:
    """Whether the EXECUTED plan contains whole-stage-codegen spans.

    Under AQE the pre-execution plan (`isFinalPlan=false`) carries no
    codegen annotations, so this runs the query (use a small sf_dir)
    and inspects the final adaptive plan."""
    df.collect()  # count() would build a DIFFERENT query execution
    final = plan_text(df, "formatted") + plan_text(df, "simple")
    return "codegen id" in final or "*(" in final
