"""File-level data skipping: per-file min/max manifests + pruned scans.

Parquet row-group statistics only help after a file is opened; at
100 TB the cost that matters is *which files get opened at all*.
Delta/Iceberg solve this with a stats manifest consulted before the
scan — this module is that idea over plain parquet directories:

- :func:`write_manifest` computes per-file min/max for chosen columns
  in one distributed pass (grouped on ``input_file_name``) and stores
  the result inside the table directory under an underscore-prefixed
  subdir (Spark's parquet reader treats ``_``-prefixed paths as
  hidden, so the manifest never pollutes normal scans of the table).
- :func:`pruned_scan` reads the manifest (O(#files) metadata, not
  data), keeps files whose [min, max] interval intersects the
  predicate range, and scans only those — then re-applies the
  predicate exactly, so pruning is a pure optimization, never a
  semantics change.

Skipping power comes from layout: cluster data so each file covers a
narrow key range (``repartitionByRange`` + ``sortWithinPartitions``
before the write — see :func:`write_clustered`). Random layout ⇒ every
file spans the whole domain ⇒ nothing prunes; range-clustered layout ⇒
a point/range query touches O(matching) files.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_skip_manifest"


def write_clustered(
    df: DataFrame, path: str, cluster_col: str, *, n_files: int = 16
) -> None:
    """Range-cluster ``df`` on ``cluster_col`` into ``n_files`` files —
    the write layout that makes min/max skipping effective. One range
    shuffle (sampled boundaries), sort within each output file."""
    (
        df.repartitionByRange(n_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_manifest(
    spark: SparkSession, path: str, cols: list[str]
) -> int:
    """Build the per-file min/max manifest for ``cols``; returns the
    number of data files covered. One distributed aggregation over the
    table — rerun after each batch of appends (cheap relative to the
    write itself)."""
    df = spark.read.parquet(path).withColumn("__file", F.input_file_name())
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    man = df.groupBy("__file").agg(*aggs)
    man.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, MANIFEST_DIR)
    )
    return man.count()


def pruned_scan(
    spark: SparkSession,
    path: str,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Scan only files whose [min_col, max_col] intersects [lo, hi],
    then re-apply the exact predicate.

    The manifest collect is O(#files) driver-side metadata — the same
    contract as a Delta log read. Returns an empty-but-typed DataFrame
    when nothing survives pruning."""
    man = spark.read.parquet(os.path.join(path, MANIFEST_DIR))
    hits = [
        r["__file"]
        for r in man.filter(
            (F.col(f"min_{col}") <= F.lit(hi)) & (F.col(f"max_{col}") >= F.lit(lo))
        ).collect()
    ]
    pred: Column = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    if not hits:
        return spark.read.parquet(path).filter(pred).limit(0)
    return spark.read.parquet(*hits).filter(pred)
