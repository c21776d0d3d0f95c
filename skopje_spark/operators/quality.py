"""Data-quality checks — the validation stage of an ETL pipeline.

The reference's load contract pushes validation onto Postgres
constraints (PKs/FKs enforced at INSERT/COPY time,
``/root/reference/src/load/pg.rs:50-117``); a lake engine has no
enforcing store, so constraints become explicit *check operators* run
before the sink. Each check compiles to one aggregate or anti-join —
no collect, results are one summary row per check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_not_null(df: DataFrame, col: str) -> DataFrame:
    """Violations = rows where ``col`` is NULL."""
    return df.select(
        F.lit(f"not_null:{col}").alias("check_name"),
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
        .cast("bigint").alias("n_violations"),
    )


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Violations = rows beyond the first per duplicate key (count -
    distinct count). Map-side partial agg; one shuffle on the key."""
    return df.agg(
        F.lit("unique:" + ",".join(cols)).alias("check_name"),
        (F.count(F.lit(1)) - F.countDistinct(*[F.col(c) for c in cols]))
        .cast("bigint").alias("n_violations"),
    ).select("check_name", "n_violations")


def check_in_range(df: DataFrame, col: str, lo, hi) -> DataFrame:
    """Violations = non-null values outside [lo, hi]."""
    bad = F.col(col).isNotNull() & ~F.col(col).between(lo, hi)
    return df.select(
        F.lit(f"range:{col}").alias("check_name"),
        F.sum(F.when(bad, 1).otherwise(0)).cast("bigint").alias("n_violations"),
    )


def check_foreign_key(
    facts: DataFrame, fk: str, dim: DataFrame, pk: str
) -> DataFrame:
    """Violations = fact rows whose FK has no match in the dimension —
    a left anti join (broadcast when the dim is small; the same plan
    shape as the KeyMap miss-detection, SURVEY §2A P2)."""
    orphans = facts.select(F.col(fk)).join(
        dim.select(F.col(pk).alias(fk)), fk, "left_anti"
    )
    return orphans.agg(
        F.lit(f"fk:{fk}").alias("check_name"),
        F.count(F.lit(1)).cast("bigint").alias("n_violations"),
    ).select("check_name", "n_violations")


def run_checks(*checks: DataFrame) -> DataFrame:
    """Union the one-row check results into a report DataFrame."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
