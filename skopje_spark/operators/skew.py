"""Skew-mitigation utilities: salted joins and bucketed co-location.

AQE's skew-join splitting (on by default in this engine's sessions)
handles most skew at runtime; these are the *explicit* tools for the
two cases AQE can't fix:

- a hot key so large that even split shuffle partitions overwhelm a
  task → :func:`salted_join` spreads one key across ``n_salts``
  partitions by replicating the (small) build side;
- a fact-fact join repeated every run on the same key →
  :func:`write_bucketed` persists both sides pre-shuffled so the join
  plans with ZERO exchanges.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting: the (large, skewed) left side gets a
    random salt in [0, n_salts); the (smaller) right side is replicated
    once per salt value, so a hot key's rows spread across ``n_salts``
    shuffle partitions instead of hammering one task.

    Cost model: right side is shuffled ``n_salts``× — use only when
    right ≪ left (else broadcast the right side and skip salting, or
    rely on AQE). Row-level results are identical to a plain join.
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    l_salted = left.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    r_salted = right.withColumn("__salt", salts)
    out = l_salted.join(r_salted, [on, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    *,
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) on the join
    key. Two tables bucketed identically join with no Exchange — the
    shuffle is paid once at write time, amortized over every
    subsequent join. The physical layout survives restarts via the
    session catalog (saveAsTable; Spark's bucketing metadata does not
    exist for plain ``.parquet(path)`` writes).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
