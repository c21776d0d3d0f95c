"""Banded range join — the equi-join formulation of |L.v − R.v| ≤ r.

A naive range join plans as a nested-loop (BroadcastNestedLoopJoin
when one side is small, CartesianProduct when neither is) — O(n·m)
comparisons. Banding turns it into a hash join: bucket both sides by
``floor(v / r)``; a match within radius r can only live in the
neighboring bucket, so replicating one side into its 3 adjacent bands
and equi-joining on the band key visits every true match exactly once
with O(n + m + matches) work and ONE co-partitioned shuffle per side.

This is the generic scale pattern for interval/tolerance joins
(SURVEY §2B "range/interval join"); the same banding underlies the
blocked similarity join and IVF probing in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    radius: float,
    *,
    how: str = "inner",
) -> DataFrame:
    """Join rows with ``|left.left_val - right.right_val| <= radius``.

    Exactly-once match proof: the right row's band is a single value
    ``floor(rv/r)``; the left row replicates to bands {b-1, b, b+1} of
    its own value, which contain every band a within-radius partner
    can occupy — the equi-join therefore finds each qualifying pair on
    exactly one band key, and the residual predicate removes
    neighboring-band pairs just outside the radius.

    ``how='left'`` restores unmatched left rows with nulls (the banded
    analog of a left range join).
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    band_l = F.floor(F.col(left_val) / radius).cast("long")
    band_r = F.floor(F.col(right_val) / radius).cast("long")
    l_rep = left.withColumn(
        "__band", F.explode(F.array(band_l - 1, band_l, band_l + 1))
    )
    r_banded = right.withColumn("__band", band_r)
    matched = (
        l_rep.join(r_banded, "__band")
        .filter(
            (F.col(right_val) >= F.col(left_val) - radius)
            & (F.col(right_val) <= F.col(left_val) + radius)
        )
        .drop("__band")
    )
    if how == "inner":
        return matched
    unmatched = left.join(
        matched.select(*left.columns).distinct(), list(left.columns), "left_anti"
    )
    for c in right.columns:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(right.dtypes)[c])
        )
    return matched.unionByName(unmatched)
