"""As-of (point-in-time) join — an operator Spark lacks as a builtin.

Strategy (SURVEY.md §2B "as-of join"): **union-tag-sort**, the
scale-correct composition. Tag left and right rows, union them on the
shared (key, timestamp) axis, and for each left row take the running
``last`` right payload (``ignorenulls``) over a window partitioned by
the equality keys and ordered by timestamp. This does:

- exactly ONE shuffle (on the equality keys) — no join at all;
- NO candidate fan-out: a join-then-rank formulation materializes
  every (left row x earlier right row) candidate pair before pruning
  to rank 1, which explodes on dense right sides (a user with 10k
  orders contributes 10k candidate rows per event). Here each input
  row is carried once.
- an O(n) running-frame window per key partition (incremental
  ``last``, no per-row re-sort).

Skew note: a single hot key (one user with millions of rows) lands in
one partition — same exposure as any keyed window; at 100 TB,
range-bucket the timeline per key and run the window per bucket with
boundary carry-over.
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
        Applied as a post-filter: the nearest candidate is the only one
        that can be within tolerance, so filter-after-pick ==
        filter-before-pick.
    left_id : kept for API compatibility (the union strategy does not
        need a left row identity).
    tiebreak : right-side columns ordering equal-timestamp candidates —
        the max-by-tiebreak candidate wins (matches ranking DESC).
    how : 'left' keeps unmatched left rows (asof-left), 'inner' drops.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    on = list(on)
    tiebreak = list(tiebreak or [])
    right_cols = [c for c in right.columns if c not in on]

    # common timestamp axis: Spark promotes date to timestamp-at-
    # midnight when the two sides differ, mirroring a direct
    # right_ts <= left_ts comparison
    l_ts_t = dict(left.dtypes)[left_ts]
    r_ts_t = dict(right.dtypes)[right_ts]
    ts_type = l_ts_t if l_ts_t == r_ts_t else "timestamp"

    lrow_t = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("s")
    ).schema["s"].dataType.simpleString()
    rrow_t = right.select(
        F.struct(*[F.col(c) for c in right_cols]).alias("s")
    ).schema["s"].dataType.simpleString()

    l_tagged = left.select(
        *on,
        F.col(left_ts).cast(ts_type).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(rrow_t).alias("__rrow"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__tb{i}")
          for i, c in enumerate(tiebreak)],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).cast(ts_type).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lrow_t).alias("__lrow"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__rrow"),
        *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(tiebreak)],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # ordering: at equal __ts the right row must precede the left row
    # (inclusive <=/>= semantics), and among equal-__ts right rows the
    # max-tiebreak one must come LAST so the running `last` picks it
    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__is_left").asc()] + [
            F.col(f"__tb{i}").asc_nulls_first() for i in range(len(tiebreak))
        ]
    else:
        order = [F.col("__ts").desc(), F.col("__is_left").asc()] + [
            F.col(f"__tb{i}").asc_nulls_first() for i in range(len(tiebreak))
        ]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("__m", F.last("__rrow", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )

    if tolerance is not None:
        m_ts = F.col("__m").getField(right_ts).cast(ts_type)
        in_tol = (
            m_ts >= F.col("__ts") - tolerance
            if direction == "backward"
            else m_ts <= F.col("__ts") + tolerance
        )
        matched = matched.withColumn(
            "__m", F.when(in_tol, F.col("__m")).otherwise(F.lit(None))
        )
    if how == "inner":
        matched = matched.filter(F.col("__m").isNotNull())

    return matched.select(
        *[F.col("__lrow").getField(c).alias(c) for c in left.columns],
        *[F.col("__m").getField(c).alias(c) for c in right_cols],
    )
