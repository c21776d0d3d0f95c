"""As-of (point-in-time) join — an operator Spark lacks as a builtin.

The composition strategy (SURVEY.md §2B "as-of join"): equi-join on the
key columns, keep only right rows at-or-before (backward) / at-or-after
(forward) the left timestamp, then keep the nearest via ``row_number``
over a window partitioned by the left row identity.

Scale notes:
- The equi-join shuffles on the key columns — identical to any big
  join; AQE handles skewed keys.
- The window partitions by the *left row id*, which is high-cardinality
  → well-distributed, no single-partition sort.
- For dense right sides (many candidates per key), a production
  deployment would range-bucket the right side by time and join only
  adjacent buckets; with the candidate-filter expressed declaratively
  Catalyst already prunes via the timestamp predicate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    direction: str = "backward",
    tolerance: Column | None = None,
    left_id: Sequence[str] | None = None,
    tiebreak: Sequence[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Join each left row to the nearest right row by timestamp.

    Parameters
    ----------
    on : equality key columns (same names both sides).
    left_ts / right_ts : timestamp column names.
    direction : 'backward' (right_ts <= left_ts, nearest below) or
        'forward' (right_ts >= left_ts, nearest above).
    tolerance : optional max distance (e.g. ``F.expr("INTERVAL 1 DAY")``).
    left_id : columns uniquely identifying a left row (defaults to
        ``on + [left_ts]`` — pass the real PK when available).
    tiebreak : right-side columns ordering equal-timestamp candidates
        (descending) so the pick is deterministic.
    how : 'left' keeps unmatched left rows (asof-left), 'inner' drops.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    left_id = list(left_id or (list(on) + [left_ts]))
    tiebreak = list(tiebreak or [])

    lcol, rcol = F.col(f"__l.{left_ts}"), F.col(f"__r.{right_ts}")
    cond = rcol <= lcol if direction == "backward" else rcol >= lcol
    if tolerance is not None:
        if direction == "backward":
            cond = cond & (rcol >= lcol - tolerance)
        else:
            cond = cond & (rcol <= lcol + tolerance)

    l, r = left.alias("__l"), right.alias("__r")
    keys = [F.col(f"__l.{k}") == F.col(f"__r.{k}") for k in on]
    joined = l.join(r, keys + [cond] if keys else [cond], "inner")

    dist_order = (
        [rcol.desc()] if direction == "backward" else [rcol.asc()]
    ) + [F.col(f"__r.{c}").desc() for c in tiebreak]
    w = Window.partitionBy(*[F.col(f"__l.{c}") for c in left_id]).orderBy(*dist_order)
    right_cols = [c for c in right.columns if c not in on]
    nearest = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *[F.col(f"__l.{c}") for c in left.columns],
            *[F.col(f"__r.{c}").alias(c) for c in right_cols],
        )
    )
    if how == "inner":
        return nearest
    # asof-left: restore left rows that had no candidate at all
    return left.join(nearest.select(*left_id).distinct(), left_id, "left_anti").select(
        *left.columns,
        *[F.lit(None).cast(dict(nearest.dtypes)[c]).alias(c) for c in right_cols],
    ).unionByName(nearest)
