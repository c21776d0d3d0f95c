"""Bucketed tables: pre-shuffled storage for shuffle-free joins.

The reference's Postgres load side relies on the database's own
indexes for join locality (`/root/reference/src/load/pg.rs:1-40`); the
lakehouse equivalent is HASH BUCKETING: write each table pre-hashed on
its join key into N buckets, and every later equi-join or aggregation
on that key reads co-located buckets with NO exchange at all. At
100 TB this turns the recurring fact⋈fact join from the pipeline's
dominant shuffle (both sides, every run) into a zero-shuffle local
merge — the write-side shuffle is paid ONCE.

Spark only honors bucket metadata through the catalog
(``saveAsTable``), not path-based ``parquet(path)`` writes; tables
land in ``spark.sql.warehouse.dir``. Keep ``n_buckets`` aligned
between tables meant to join (matching bucket counts join
bucket-to-bucket; mismatched counts fall back to a shuffle on one
side).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def _drop_table_and_orphan(spark: SparkSession, table: str) -> None:
    """Make ``saveAsTable(mode="overwrite")`` idempotent across driver
    sessions.  A fresh session has an empty in-memory metastore, so
    ``overwrite`` can't see — and refuses to replace — a managed-table
    directory left in ``spark.sql.warehouse.dir`` by a previous session
    (LOCATION_ALREADY_EXISTS).  Drop the catalog entry if present, then
    remove any orphaned location on disk."""
    parts = table.lower().split(".")
    if len(parts) > 2:
        raise ValueError(
            f"write_bucketed supports bare or db-qualified names, got {table!r}"
        )
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    except AnalysisException as e:
        # SCHEMA_NOT_FOUND: IF EXISTS does not cover a missing database,
        # which is the normal state of a fresh in-memory metastore while
        # the on-disk orphan (cleaned below) still exists. Anything else
        # (live table that won't drop, metastore fault) must surface —
        # proceeding would rmtree data the catalog still points at.
        if "SCHEMA_NOT_FOUND" not in str(e):
            raise
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for prefix in ("file://", "file:"):
        if warehouse.startswith(prefix):
            warehouse = warehouse[len(prefix):]
            break
    if len(parts) == 1:
        loc = Path(warehouse) / parts[0]
    else:
        # a qualified db.tbl managed table lives at warehouse/<db>.db/<tbl>;
        # deriving warehouse/<tbl> would miss the real orphan AND could
        # rmtree an unrelated default-database table with the same name
        loc = Path(warehouse) / f"{parts[0]}.db" / parts[1]
    if loc.exists():
        shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    key_col: str,
    *,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a catalog table hash-bucketed (and by default
    sorted) on ``key_col``. Sorting within buckets lets a later
    sort-merge join skip its sort when each bucket holds one file —
    the join becomes a pure streaming merge of pre-sorted runs."""
    _drop_table_and_orphan(df.sparkSession, table)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key_col)
    if sort:
        w = w.sortBy(key_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key_col: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two co-bucketed catalog tables on their bucket key.

    The ``merge`` hint pins sort-merge (a broadcast would hide the
    bucketing evidence); with both sides bucketed to the same count on
    ``key_col`` the physical plan contains ZERO Exchange operators —
    asserted in tests/test_bucketed.py via plans.num_shuffles."""
    lt = spark.table(left_table).hint("merge")
    rt = spark.table(right_table)
    return lt.join(rt, on=key_col, how=how)
