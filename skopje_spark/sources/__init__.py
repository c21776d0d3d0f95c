"""Source connectors: parquet / json / csv / binary / http / jdbc."""

from skopje_spark.sources.files import (
    binary_source,
    csv_source,
    json_source,
    parquet_source,
    unzip,
)
from skopje_spark.sources.http import (
    CHUNK_SIZE,
    RetryPolicy,
    download_chunk,
    download_file,
    fetch_json,
    fetch_many,
)
from skopje_spark.sources.jdbc import JdbcConfig, jdbc_query, jdbc_table

__all__ = [
    "CHUNK_SIZE",
    "JdbcConfig",
    "RetryPolicy",
    "binary_source",
    "csv_source",
    "download_chunk",
    "download_file",
    "fetch_json",
    "fetch_many",
    "json_source",
    "jdbc_query",
    "jdbc_table",
    "parquet_source",
    "unzip",
]
