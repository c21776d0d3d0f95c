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


def ewma(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    *,
    alpha: float = 0.2,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially weighted moving average of ``value_col``
    along ``order_cols``: y₀ = x₀, yᵢ = α·xᵢ + (1−α)·yᵢ₋₁ (pandas
    ``ewm(adjust=False)`` semantics — the standard smoothing signal
    for per-entity time series).

    The recurrence is inherently sequential per key, so it runs as an
    Arrow ``applyInPandas`` group kernel (pandas' C ewm loop): ONE
    shuffle on the key, per-group state O(group). This is the same
    execution contract as the grouped-median UDAF — a group must fit a
    worker, which per-entity time series do; an unbounded single key
    needs time-sliced keys plus carry-in state instead (the streaming
    twin: running_totals in streaming/streams.py).
    """
    import pandas as pd  # noqa: F401

    out_fields = ", ".join(
        f"{c} {t}" for c, t in df.select(*keys, *order_cols, value_col).dtypes
    )
    schema = f"{out_fields}, {out_col} double"

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols))
        pdf[out_col] = (
            pdf[value_col].astype("float64").ewm(alpha=alpha, adjust=False).mean()
        )
        return pdf

    return (
        df.select(*keys, *order_cols, value_col)
        .groupBy(*keys)
        .applyInPandas(smooth, schema)
    )
