"""Incremental rollup maintenance: mergeable partial-aggregate state.

A 100 TB pipeline never recomputes a rollup table from scratch per
load; it keeps per-key partial state (count / sum / min / max) and
merges each new batch into it — the distributed form of the
reference's incremental load loop (fetch batch → upsert,
``/root/reference/src/extract/pg.rs:67-99`` + ``src/load/pg.rs:50-86``).

All state metrics are decomposable aggregates, so merging is just
re-aggregating the union of state rows: sum-of-sums, min-of-mins,
max-of-maxes, sum-of-counts. AVG is *derived* at finalize time
(sum/count) — never stored, because averages don't merge.

Merge cost is one shuffle over |keys| state rows (thousands), not the
fact table (billions) — that's the point.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skopje_spark.queries.rounding import dround


def rollup_state(
    df: DataFrame, keys: Sequence[str], value_cols: Sequence[str]
) -> DataFrame:
    """Aggregate a batch into mergeable per-key state:
    ``n`` plus ``{col}_sum / {col}_min / {col}_max`` per value column."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in value_cols:
        aggs += [
            F.sum(c).alias(f"{c}_sum"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def rollup_merge(
    states: Sequence[DataFrame], keys: Sequence[str], value_cols: Sequence[str]
) -> DataFrame:
    """Merge state tables produced by :func:`rollup_state` (any number
    of batches, any grouping of arrivals — merging is associative and
    commutative)."""
    u = reduce(lambda a, b: a.unionByName(b), states)
    aggs = [F.sum("n").alias("n")]
    for c in value_cols:
        aggs += [
            F.sum(f"{c}_sum").alias(f"{c}_sum"),
            F.min(f"{c}_min").alias(f"{c}_min"),
            F.max(f"{c}_max").alias(f"{c}_max"),
        ]
    return u.groupBy(*keys).agg(*aggs)


def rollup_finalize(
    state: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    *,
    decimals: int = 2,
) -> DataFrame:
    """Derive the user-facing rollup from state: count, dround-ed sum
    (recovers the exact decimal total per the repo float rules), min,
    max, and avg = rounded-sum / count."""
    cols = [F.col(k) for k in keys] + [F.col("n")]
    for c in value_cols:
        s = dround(F.col(f"{c}_sum"), decimals)
        cols += [
            s.alias(f"{c}_sum"),
            F.col(f"{c}_min").alias(f"{c}_min"),
            F.col(f"{c}_max").alias(f"{c}_max"),
            (s / F.col("n")).alias(f"{c}_avg"),
        ]
    return state.select(*cols)
