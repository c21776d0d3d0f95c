"""File-based sources: parquet / json / csv / binary, plus unzip staging.

Parity targets in the reference:

- `read_json` — whole-file JSON into a typed value
  (``/root/reference/src/extract/fs.rs:6-13``) → ``json_source`` with
  ``multiLine=True`` for single-document files, schema optional.
- `unzip` — archive extraction with parent-dir creation, parallel
  across entries (``/root/reference/src/extract/fs.rs:19-60``) →
  :func:`unzip` using a thread pool (zip inflate releases the GIL in
  CPython's zlib), then any file source over the extracted dir.
- binary blobs (downloads, media) → ``binary_source`` over Spark's
  ``binaryFile`` format — the scan behind the multimodal column
  operators (:mod:`skopje_spark.operators.multimodal`).

All sources return *lazy* DataFrames; schema-on-read is explicit
wherever the format can't self-describe (json/csv), because schema
inference triggers an extra full pass over 100 TB of input.
"""

from __future__ import annotations

import os
import zipfile
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def parquet_source(spark: SparkSession, path: str, *,
                   columns: list[str] | None = None) -> DataFrame:
    """Parquet scan; pass ``columns`` to make the pruned read-schema
    explicit at the source (Catalyst also prunes automatically)."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def json_source(spark: SparkSession, path: str, *,
                schema: StructType | str | None = None,
                multi_line: bool = False,
                mode: str = "PERMISSIVE",
                corrupt_col: str | None = None) -> DataFrame:
    """JSON scan (`read_json` analog). ``multi_line=True`` reads one
    JSON document per file — the reference's whole-file semantics;
    default is JSON-lines, the splittable scale-path layout.

    Malformed-record policy (the reference logs-and-errors per file,
    ``/root/reference/src/extract/fs.rs:11``; at 100 TB one bad record
    must not kill a 10-hour job):

    - ``mode='PERMISSIVE'`` (default): bad records become nulls; pass
      ``corrupt_col`` to additionally capture the raw text in a
      dead-letter column for quarantine-and-continue pipelines.
    - ``mode='DROPMALFORMED'``: silently skip bad records.
    - ``mode='FAILFAST'``: abort on first bad record (CI/strict loads).
    """
    reader = spark.read.option("mode", mode)
    if corrupt_col is not None:
        if schema is None:
            raise ValueError("corrupt_col capture requires an explicit schema")
        if isinstance(schema, str):
            schema = f"{schema}, {corrupt_col} string"
        else:
            from pyspark.sql.types import StringType, StructField

            schema = StructType(
                list(schema.fields) + [StructField(corrupt_col, StringType())]
            )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("multiLine", str(multi_line).lower()).json(path)


def csv_source(spark: SparkSession, path: str, *,
               schema: StructType | str | None = None,
               header: bool = True, sep: str = ",") -> DataFrame:
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def binary_source(spark: SparkSession, path: str, *,
                  glob: str | None = None) -> DataFrame:
    """Opaque-blob scan: ``(path, modificationTime, length, content)``.
    The multimodal ingestion entry point."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def unzip(zip_file: str, out_dir: str, *, max_workers: int = 8) -> list[str]:
    """Extract an archive, creating parent dirs; parallel across
    entries (`unzip` analog, ``/root/reference/src/extract/fs.rs:19-60``
    — rayon there, thread pool here; zlib inflate drops the GIL).

    A *staging* utility: runs driver-side before a distributed read,
    exactly like the reference runs it before `read_json`. Returns the
    list of extracted paths.
    """
    os.makedirs(out_dir, exist_ok=True)
    with zipfile.ZipFile(zip_file) as zf:
        names = [n for n in zf.namelist() if not n.endswith("/")]
        # Pre-create entry dirs serially: zipfile's extract() calls
        # makedirs without exist_ok, which races across threads.
        for name in names:
            parent = os.path.dirname(name)
            if parent:
                os.makedirs(os.path.join(out_dir, parent), exist_ok=True)

        def _extract(name: str) -> str:
            return zf.extract(name, out_dir)

        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            return list(pool.map(_extract, names))


def orc_source(spark: SparkSession, path: str, *,
               columns: list[str] | None = None) -> DataFrame:
    """ORC scan — the other columnar lake format Spark reads natively
    (predicate pushdown and column pruning work as for parquet)."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def xml_source(spark: SparkSession, path: str, *, row_tag: str,
               schema: StructType | str | None = None,
               columns: list[str] | None = None) -> DataFrame:
    """XML scan (built into Spark since 4.0): one row per ``row_tag``
    element, attributes surfaced as ``_attr`` columns. The
    semi-structured cousin of the reference's serde-JSON extract
    (`read_json`, ``/root/reference/src/extract/fs.rs:6-13``) for
    feed/sitemap/export payloads. Schema inference scans the files
    once — declare a schema in production to skip that pass."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(path)
    return df.select(*columns) if columns else df
