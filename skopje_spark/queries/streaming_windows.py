"""Event-time window queries over the events fixture (§2B streaming
rows), executed in batch mode — ``window()`` / ``session_window()``
semantics are identical under Structured Streaming (the streaming/
module wires the same expressions behind readStream + watermark; see
tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.queries import register
from skopje_spark.queries.rounding import dround
from skopje_spark.tables import load_table


@register(
    "q_window_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           (CASE WHEN (SUM(value)) < 0 THEN -(FLOOR((-(SUM(value))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(value)) * 100.0 + 0.5) / 100.0 END) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "window", "tumbling"),
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type.

    Streaming form: identical expression after
    ``readStream…withWatermark('ts', '10 minutes')`` — state is one
    aggregate row per (window, type), evicted at watermark."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q_window_sliding",
    oracle="""
    WITH starts AS (
      SELECT *,
             CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP) AS s0
      FROM events
    ),
    assigned AS (
      SELECT event_id, value, s0 AS window_start FROM starts
      UNION ALL
      SELECT event_id, value, s0 - INTERVAL 30 MINUTE AS window_start FROM starts
    )
    SELECT window_start,
           COUNT(*) AS n_events,
           (CASE WHEN (SUM(value)) < 0 THEN -(FLOOR((-(SUM(value))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(value)) * 100.0 + 0.5) / 100.0 END) AS total_value
    FROM assigned
    GROUP BY window_start
    """,
    tags=("streaming", "window", "sliding"),
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h size, 30 min slide): every event lands in
    exactly 2 windows. The oracle materializes the same assignment via
    explicit window-start arithmetic."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@register(
    "q_window_session",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT *,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered
    )
    SELECT user_id,
           MIN(ts)                       AS session_start,
           MAX(ts) + INTERVAL 10 MINUTE  AS session_end,
           COUNT(*)                      AS n_events,
           (CASE WHEN (SUM(value)) < 0 THEN -(FLOOR((-(SUM(value))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(value)) * 100.0 + 0.5) / 100.0 END)          AS total_value
    FROM sess
    GROUP BY user_id, sid
    """,
    tags=("streaming", "window", "session"),
)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-minute gap) per user: Spark's
    ``session_window`` vs. the classic lag/flag/cumsum sessionization
    in the oracle. ``session_window.end = max(ts) + gap`` by Spark's
    definition, mirrored in the oracle.

    Streaming form: ``applyInPandasWithState``-free — session_window
    is natively mergeable state in Structured Streaming."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q_events_json_enrich",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
           (CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(json_extract(props, '$.k'))) AS k_avg
    FROM events
    GROUP BY event_type
    """,
    tags=("streaming", "json"),
)
def q_events_json_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload extraction + aggregation — the reference's
    serde-deserialize step (``/root/reference/src/extract/http.rs:139``)
    as a streaming-safe columnar expression."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("bigint").alias("k_total"),
        (F.sum(k) / F.count(k)).alias("k_avg"),
    )


@register(
    "q_stream_exec_tumbling",
    oracle="""
    SELECT CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP)
             AS window_start,
           event_type,
           COUNT(*) AS n_events,
           (CASE WHEN (SUM(value)) < 0
                 THEN -(FLOOR((-(SUM(value))) * 100.0 + 0.5) / 100.0)
                 ELSE FLOOR((SUM(value)) * 100.0 + 0.5) / 100.0 END)
             AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming", "window", "tumbling", "executed-stream"),
)
def q_stream_exec_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE Structured Streaming execution inside the correctness
    loop — unlike the batch-mode window queries above, this one runs
    ``readStream`` over the events parquet (tables.stream_events),
    drains it with an availableNow trigger into a memory sink
    (complete-mode 30-minute tumbling aggregation), and returns the
    sink table. The oracle is plain batch SQL, so the driver's hash
    compare proves the micro-batched streaming execution path itself
    produces batch-identical answers — the exactly-once/unified-API
    claim, checked, not asserted."""
    import uuid

    from skopje_spark.tables import stream_events

    sink = f"q_stream_exec_{uuid.uuid4().hex[:12]}"
    stream = stream_events(spark, sf_dir)
    agg = (
        stream.groupBy(
            F.window("ts", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 2).alias("total_value"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # complete-mode output is bounded by aggregate cardinality
    # (windows × event types), so materializing it locally is safe —
    # and lets us DROP the memory-sink temp view immediately instead
    # of leaking one uuid-named in-memory table per invocation
    result = spark.table(sink).select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )
    rows = result.collect()
    spark.catalog.dropTempView(sink)
    return spark.createDataFrame(rows, result.schema)


@register(
    "q_bus_batch_read",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS c FROM documents),
    recs AS (
      SELECT CAST(t.i AS BIGINT) AS i,
             CAST(t.i % 4 AS INT) AS p,
             CAST(t.i // 4 AS BIGINT) AS off
      FROM n, UNNEST(range(0, c)) AS t(i)
    )
    SELECT p AS partition,
           COUNT(*) AS n_records,
           CAST(SUM(i * i) AS BIGINT) AS val_sum,
           MIN(off) AS min_offset,
           MAX(off) AS max_offset
    FROM recs
    WHERE off >= 10
    GROUP BY p
    ORDER BY p
    """,
    tags=("source", "bus", "kafka-contract", "offsets"),
)
def q_bus_batch_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The message-bus source (sources/bus.py — the Kafka offset
    contract on the file-backed broker) under the driver gate: a
    4-partition topic is produced with one record per document row
    (record i → partition i % 4, value i², dense per-partition
    offsets), then batch-read through
    ``spark.read.format("skopje_bus")`` with ``startingOffsets``
    skipping the first 10 records of EVERY partition — the bounded
    replay mode. The oracle recomputes the partition/offset
    arithmetic closed-form from the documents row count, so a wrong
    offset assignment, a segment-pruning bug, or an off-by-one in the
    half-open range flips counts, sums, or the offset extrema.

    Scale note: the fixture topic is produced driver-side from the
    row COUNT (metadata — no table rows are collected); reads plan
    one InputPartition per bus partition, the executor-parallel
    layout the streaming reader shares."""
    import atexit
    import shutil
    import tempfile

    from skopje_spark.sources.bus import bus_append
    from skopje_spark.sources.pysource import register_all

    register_all(spark)
    n = load_table(spark, sf_dir, "documents").count()
    topic = tempfile.mkdtemp(prefix="skopje_bus_")
    atexit.register(shutil.rmtree, topic, ignore_errors=True)
    per_part: dict[int, list] = {0: [], 1: [], 2: [], 3: []}
    for i in range(n):
        per_part[i % 4].append((f"k{i}", str(i * i)))
    for p, recs in per_part.items():
        bus_append(topic, recs, partition=p, max_segment_records=64)
    import json as _json

    df = (
        spark.read.format("skopje_bus")
        .option("path", topic)
        .option("startingOffsets",
                _json.dumps({str(p): 10 for p in range(4)}))
        .load()
    )
    return (
        df.groupBy("partition")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum(F.col("value").cast("long")).alias("val_sum"),
            F.min("offset").alias("min_offset"),
            F.max("offset").alias("max_offset"),
        )
        .orderBy("partition")
    )
