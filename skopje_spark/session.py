"""SparkSession construction with scale-appropriate defaults.

Local testing runs ``local[N]`` in one JVM; the configs below are chosen
so the *same* logical plans ship unchanged to a 1000-executor cluster:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic
  join-strategy demotion to broadcast) — the single most important knob
  for 100 TB joins with skewed keys.
- ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; AQE
  coalesces to match actual bytes. On a real cluster this would be set
  to ~2-3x total cores.
- Arrow enabled for any pandas interchange (vectorized UDF path).
- Session timezone pinned to UTC so timestamp semantics are
  deterministic and match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "skopje-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing is bytes-based (parallelism-first: post-
        # shuffle partition count ~ bytes/minPartitionSize, capped at
        # the parallelism); CPU-dense stages over few shuffled bytes
        # (verification joins, window chains over narrow rows)
        # collapse to 2-3 tasks under the 1m default floor and strand
        # the other cores (measured: q_dedup_jaccard_prefix 4.0 s at
        # the 1m default vs 1.9-2.0 s at 64k-256k). 256k beat 64k on
        # the full-entry sweep: wide enough for the multi-MB CPU-dense
        # stages, while sub-MB bookkeeping stages keep few tasks
        # (task-launch overhead dominates them; measured q_graph_
        # pagerank 2.25 s at 256k vs 2.85 s at 64k). The floor only
        # binds when a stage's bytes are below cores × floor (8 MB at
        # 32 cores) — at production scale every real stage clears
        # that, so this is a small-input parallelism guard, not a
        # cluster tunable (override via SPARK_GRAFT_MIN_PARTITION_SIZE).
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "256k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # let Python DataSources (sources/pysource.py) receive pushed filters
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_for_engine(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-provided
    session (the correctness driver hands us its own SparkSession)."""
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": os.environ.get(
            "SPARK_GRAFT_MIN_PARTITION_SIZE", "256k"
        ),
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this session; defaults are acceptable
    return spark
