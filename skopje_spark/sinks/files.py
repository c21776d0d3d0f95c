"""File sinks: parquet / csv / json, with the reference's
dedup-before-bulk-load contract made explicit.

Parity targets:

- `PgLoadExt::copy` documents that **duplicates must be removed before
  copy** (``/root/reference/src/load/pg.rs:19-20``); its binary-COPY
  bulk path (``:88-117``) maps to columnar parquet writes here.
  :func:`parquet_sink` takes ``dedup_keys`` to encode that contract in
  the sink instead of trusting every caller to remember it.
- The reference's copy path logs-and-continues on row errors
  (``/root/reference/src/load/pg.rs:105``) — deliberately NOT
  replicated; Spark writes fail fast (SURVEY §7 divergence note).

Scale notes baked in:

- ``partition_by`` → directory-partitioned layout, the thing that makes
  downstream partition pruning possible at 100 TB.
- ``target_file_rows`` guards against the classic small-files problem:
  a shuffle-heavy plan ending in 200 tiny tasks writes 200 tiny files;
  a bounded repartition before the write produces healthy file sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _prep(df: DataFrame, dedup_keys: list[str] | None,
          repartition: int | None) -> DataFrame:
    if dedup_keys:
        df = df.dropDuplicates(dedup_keys)
    if repartition:
        df = df.repartition(repartition)
    return df


def parquet_sink(df: DataFrame, path: str, *, mode: str = "append",
                 partition_by: list[str] | None = None,
                 dedup_keys: list[str] | None = None,
                 repartition: int | None = None) -> None:
    """Bulk columnar load (`copy` analog). ``dedup_keys`` enforces the
    reference's remove-duplicates-before-copy contract."""
    df = _prep(df, dedup_keys, repartition)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def csv_sink(df: DataFrame, path: str, *, mode: str = "append",
             header: bool = True, dedup_keys: list[str] | None = None,
             repartition: int | None = None) -> None:
    _prep(df, dedup_keys, repartition).write.mode(mode).option(
        "header", str(header).lower()
    ).csv(path)


def json_sink(df: DataFrame, path: str, *, mode: str = "append",
              dedup_keys: list[str] | None = None,
              repartition: int | None = None) -> None:
    _prep(df, dedup_keys, repartition).write.mode(mode).json(path)


def parquet_upsert(spark, path: str, updates: DataFrame,
                   keys: list[str]) -> None:
    """Merge-upsert into a parquet dataset: rows matching ``keys`` are
    replaced by the update, others kept — the table-level form of the
    reference's `fetch_or_insert` get-or-create
    (``/root/reference/src/extract/pg.rs:67-99``).

    Plan: anti-join existing against update keys → union updates →
    write to a staging directory → directory swap. The swap is a
    single rename (crash before it leaves the old data intact; crash
    between the two renames loses only the old copy, never both) —
    the plain-filesystem analog of the JDBC staging-table pattern
    (sinks/jdbc.py); a table format with a transaction log (e.g.
    Delta/Iceberg) is the production-grade replacement.

    Scale: the anti-join shuffles on ``keys`` like any keyed join;
    updates are usually ≪ existing → AQE broadcasts the key set.
    """
    import os
    import shutil

    staging = path.rstrip("/") + "__stage"
    retired = path.rstrip("/") + "__old"
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        keep = existing.join(updates.select(*keys).distinct(), keys, "left_anti")
        merged = keep.unionByName(updates.select(*existing.columns))
    else:
        merged = updates
    merged.write.mode("overwrite").parquet(staging)

    shutil.rmtree(retired, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, retired)
    os.rename(staging, path)
    shutil.rmtree(retired, ignore_errors=True)


def orc_sink(df: DataFrame, path: str, *, mode: str = "append",
             partition_by: list[str] | None = None,
             dedup_keys: list[str] | None = None,
             repartition: int | None = None) -> None:
    """Columnar ORC sink — same contract surface as :func:`parquet_sink`."""
    df = _prep(df, dedup_keys, repartition)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def compact_parquet(spark, path: str, *,
                    target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ⌈total_bytes / target⌉ files and swap it in atomically (same
    staged-rename as :func:`parquet_upsert`).

    The classic lake-maintenance job: streaming/incremental appends
    leave thousands of KB-sized files whose per-file open/footer cost
    dominates scans at 100 TB; compaction restores ~`target` file
    sizes (default 128 MB, matching
    ``spark.sql.files.maxPartitionBytes`` so one file ≈ one scan
    partition). Returns the file count written. Coalesce (not
    repartition) — compaction must not pay a shuffle.
    """
    import math
    import os
    import shutil

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path) for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    staging = path.rstrip("/") + "__stage"
    retired = path.rstrip("/") + "__old"
    spark.read.parquet(path).coalesce(n_files).write.mode("overwrite").parquet(staging)
    shutil.rmtree(retired, ignore_errors=True)
    os.rename(path, retired)
    os.rename(staging, path)
    shutil.rmtree(retired, ignore_errors=True)
    return n_files


def xml_sink(df: DataFrame, path: str, *, row_tag: str = "row",
             root_tag: str = "rows", mode: str = "append",
             dedup_keys: list[str] | None = None,
             repartition: int | None = None) -> None:
    """XML sink (built into Spark since 4.0) — for feeds consumed by
    XML-only downstream systems; same contract surface as
    :func:`parquet_sink`."""
    df = _prep(df, dedup_keys, repartition)
    (df.write.mode(mode).format("xml")
       .option("rowTag", row_tag).option("rootTag", root_tag).save(path))
