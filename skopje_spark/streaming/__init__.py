"""Structured Streaming surface (mandated extension; the reference has
no stream abstraction — SURVEY §1.1)."""

from skopje_spark.streaming.streams import (
    dedup_within_watermark,
    file_stream,
    foreach_batch_sink,
    parquet_stream_sink,
    rate_stream,
    run_available_now,
    run_available_now_with_progress,
    running_totals,
    session_agg,
    sessionize_stateful,
    sliding_agg,
    stream_static_join,
    stream_stream_join,
    tumbling_agg,
    tumbling_distinct_agg,
    with_watermark,
)

__all__ = [
    "dedup_within_watermark",
    "file_stream",
    "foreach_batch_sink",
    "parquet_stream_sink",
    "rate_stream",
    "run_available_now",
    "run_available_now_with_progress",
    "running_totals",
    "session_agg",
    "sessionize_stateful",
    "sliding_agg",
    "stream_static_join",
    "stream_stream_join",
    "tumbling_agg",
    "tumbling_distinct_agg",
    "with_watermark",
]
