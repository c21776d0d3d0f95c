"""Frequent-items (heavy hitters) with bounded state: distributed
Misra–Gries summaries.

The 100 TB problem this solves: "which items dominate this column"
over a cardinality too large to groupBy-count (the exact plan's
shuffle and state are O(distinct); a web-scale token/URL/user column
can have billions of distinct values). Misra–Gries keeps at most
``m`` counters per partition, the partials merge by summation, and
the classic guarantee survives the merge (Agarwal et al., "Mergeable
Summaries", PODS'12):

    f(x) - n/(m+1)  <=  est(x)  <=  f(x)

for every item x (missing => est 0), where n is the TOTAL row count.
Hence any item with true frequency above n/(m+1) is guaranteed
present, and every estimate is exact up to an additive n/(m+1) —
order- and partitioning-INDEPENDENT bounds, which is what lets a
catalog query assert them as a deterministic verdict.

Execution shape: one pass, mapInPandas partials (vectorized
value_counts per Arrow batch + an O(m log m) compress), then one
shuffle of at most (m+1) rows per partition — state and network are
O(partitions × m), never O(distinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters"]


def _mg_compress(counters: dict, m: int) -> dict:
    """Keep at most m counters: subtract the (m+1)-th largest count
    from all and drop the non-positive — the Misra–Gries decrement,
    batched. Total undercount introduced across a partition is at
    most n_p/(m+1)."""
    if len(counters) <= m:
        return counters
    sub = sorted(counters.values(), reverse=True)[m]
    return {k: c - sub for k, c in counters.items() if c > sub}


def heavy_hitters(
    df: DataFrame,
    col: str,
    *,
    m: int = 64,
) -> DataFrame:
    """Items whose estimated frequency survives an m-counter
    Misra–Gries sweep, with the merged estimate and the global error
    bound.

    Returns ``(item, est, err_bound)`` where ``est`` ∈
    [f(item) − err_bound, f(item)] and ``err_bound = n/(m+1)``;
    every item with f > err_bound is guaranteed to appear. ``item``
    keeps the input column's type.
    """
    import pandas as pd

    item_t = dict(df.dtypes)[col]

    def part(batches):
        counters: dict = {}
        n_p = 0
        for pdf in batches:
            n_p += len(pdf)
            vc = pdf[col].value_counts(dropna=True)
            add = vc.to_dict()
            for k, v in add.items():
                counters[k] = counters.get(k, 0) + int(v)
            counters = _mg_compress(counters, m)
        out = pd.DataFrame(
            {"item": list(counters), "cnt": list(counters.values())}
        )
        # sentinel row carries the partition's row count so the error
        # bound needs no second pass over the data
        sent = pd.DataFrame({"item": [None], "cnt": [n_p]})
        yield pd.concat([out, sent], ignore_index=True)

    partials = df.select(col).mapInPandas(part, schema=f"item {item_t}, cnt long")
    total = partials.filter(F.col("item").isNull()).agg(
        F.sum("cnt").alias("__n")
    )
    est = (
        partials.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").alias("est"))
    )
    return est.crossJoin(F.broadcast(total)).select(
        "item",
        "est",
        (F.col("__n") / F.lit(float(m + 1))).alias("err_bound"),
    )
