"""Corpus statistics operators: exact equi-depth histograms.

An equi-depth (equal-frequency) histogram over e.g. document token
counts is the standard way to pick length buckets for curriculum /
packing decisions. ``NTILE(n) OVER (ORDER BY col)`` computes it — on
ONE task. Here the global rank comes from
:func:`skopje_spark.operators.packing.global_prefix_sum` (range
buckets + per-bucket cumsum + broadcast base offsets), so the same
exact result costs one range shuffle at any scale.

Determinism: ranks are taken over the composite order (value, id) —
total order, no tie ambiguity — so bucket membership is reproducible
and the DuckDB ROW_NUMBER oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skopje_spark.operators.packing import global_prefix_sum


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    id_col: str,
    *,
    n_buckets: int = 10,
) -> DataFrame:
    """Exact equal-frequency histogram: bucket i holds ranks
    [i·N/n, (i+1)·N/n) of the (value, id) order. Output one row per
    bucket: (bucket, n_rows, min_value, max_value). Bucket sizes differ
    by at most 1; identical to NTILE semantics with deterministic
    tie-breaking by id."""
    total = df.count()
    ranked = global_prefix_sum(
        df.select(value_col, id_col).withColumn("__one", F.lit(1).cast("long")),
        order_col=[value_col, id_col],
        weight_col="__one",
        out_col="__rank",
    )
    # NTILE bucket boundaries in exact integer arithmetic:
    # rank r -> bucket b iff r >= b*total/n (floor) boundaries; the
    # closed form floor((r*n + offset)/total) reproduces NTILE's
    # "first (total % n) buckets get the extra row" rule.
    base = total // n_buckets
    rem = total % n_buckets
    b = F.when(
        F.col("__rank") < (base + 1) * rem,
        F.floor(F.col("__rank") / (base + 1)),
    ).otherwise(
        rem + F.floor((F.col("__rank") - (base + 1) * rem) / F.greatest(F.lit(base), F.lit(1)))
    )
    return (
        ranked.withColumn("bucket", b.cast("int"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(value_col).alias(f"min_{value_col}"),
            F.max(value_col).alias(f"max_{value_col}"),
        )
        .orderBy("bucket")
    )
