"""Utility functions: date conversion and schema declaration.

Parity targets:

- `convert_timestamp` — u32 epoch seconds → date, panics on invalid
  (``/root/reference/src/util.rs:2-6``) → :func:`convert_timestamp`
  (invalid input yields NULL: Spark's non-panicking equivalent).
- `convert_date_type` — ``"%Y-%m-%d"`` string → date, logged error on
  mismatch (``/root/reference/src/util.rs:9-15``) →
  :func:`convert_date` (mismatch yields NULL).
- `#[derive(SqlMap)]` / `SqlTypes` — struct fields → ordered column
  params / declared column types
  (``/root/reference/skopje-macros/src/lib.rs:105-136``,
  ``/root/reference/src/load/pg.rs:44-46``) → :func:`schema_of`: a
  Python dataclass or annotated dict becomes a ``StructType`` in field
  declaration order, the same order-is-schema principle.
"""

from __future__ import annotations

import dataclasses
import datetime as dt
import typing
from typing import get_args, get_origin

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_PY_TO_SPARK: dict[type, DataType] = {
    int: LongType(),
    float: DoubleType(),
    str: StringType(),
    bool: BooleanType(),
    bytes: BinaryType(),
    dt.date: DateType(),
    dt.datetime: TimestampType(),
}


def convert_timestamp(col: Column | str) -> Column:
    """Epoch seconds → date (`convert_timestamp` analog,
    ``/root/reference/src/util.rs:2-6``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(F.from_unixtime(c))


def convert_date(col: Column | str, fmt: str = "yyyy-MM-dd") -> Column:
    """Formatted string → date (`convert_date_type` analog,
    ``/root/reference/src/util.rs:9-15``). Non-matching input → NULL
    (the engine-idiomatic version of the reference's logged error)."""
    c = F.col(col) if isinstance(col, str) else col
    # try_to_date: ANSI mode (Spark 4 default) makes to_date THROW on
    # malformed input; the reference's contract is log-and-continue
    return F.try_to_date(c, fmt)


def _to_spark_type(py_type) -> DataType:
    origin = get_origin(py_type)
    if origin is list:
        (elem,) = get_args(py_type)
        return ArrayType(_to_spark_type(elem))
    # Optional[X] == Union[X, None]: nullability is the field's default
    args = [a for a in get_args(py_type) if a is not type(None)]
    if args:
        return _to_spark_type(args[0])
    if py_type in _PY_TO_SPARK:
        return _PY_TO_SPARK[py_type]
    if dataclasses.is_dataclass(py_type):
        return schema_of(py_type)
    raise TypeError(f"no Spark mapping for {py_type!r}")


def schema_of(record_type) -> StructType:
    """Dataclass (or ``{name: type}`` dict) → ``StructType`` in field
    declaration order — the `SqlMap`/`SqlTypes` analog: declaration
    order *is* the schema."""
    if dataclasses.is_dataclass(record_type):
        # resolve string annotations (PEP 563 modules) to real types
        hints = typing.get_type_hints(record_type)
        items = [(f.name, hints[f.name]) for f in dataclasses.fields(record_type)]
    elif isinstance(record_type, dict):
        items = list(record_type.items())
    else:
        raise TypeError("expected a dataclass or {name: type} dict")
    return StructType(
        [StructField(name, _to_spark_type(t), True) for name, t in items]
    )


__all__ = ["convert_date", "convert_timestamp", "schema_of"]
