"""Sink connectors: parquet / csv / json / jdbc (staging-swap)."""

from skopje_spark.sinks.files import csv_sink, json_sink, parquet_sink
from skopje_spark.sinks.jdbc import (
    jdbc_sink,
    jdbc_sink_atomic,
    staging_swap_statements,
    writer_options,
)

__all__ = [
    "csv_sink",
    "jdbc_sink",
    "jdbc_sink_atomic",
    "json_sink",
    "parquet_sink",
    "staging_swap_statements",
    "writer_options",
]
