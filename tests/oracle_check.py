"""Local replica of the driver's DuckDB-oracle comparison so parity
breaks surface in `pytest` long before the round gate.

Compare contract (mirrors the driver): row count, sorted column-name
schema, and order-insensitive value equality. Values are canonicalized
(floats via repr-of-rounded, timestamps via isoformat) and compared as
sorted row multisets.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from skopje_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonicalization: collapse last-ulp noise
        return f"{v:.9g}"
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if type(v).__module__ == "numpy" and hasattr(v, "tolist"):
        c = v.tolist()  # ndarray -> nested lists; numpy scalar -> python scalar
        return _canon(c) if isinstance(c, list) else _canon(c)
    return v


def compare(spark_df, con, oracle: str, name: str = "query") -> None:
    sdf = spark_df.toPandas()
    ddf = con.execute(oracle).df()

    s_cols = sorted(sdf.columns)
    d_cols = sorted(ddf.columns)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"

    assert len(sdf) == len(ddf), f"{name}: row count {len(sdf)} vs {len(ddf)}"

    s_rows = sorted(
        tuple(_canon(v) for v in row)
        for row in sdf[s_cols].itertuples(index=False, name=None)
    )
    d_rows = sorted(
        tuple(_canon(v) for v in row)
        for row in ddf[d_cols].itertuples(index=False, name=None)
    )
    n_bad = sum(1 for a, b in zip(s_rows, d_rows) if a != b)
    if n_bad:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:5]
        raise AssertionError(
            f"{name}: {n_bad}/{len(s_rows)} canonicalized rows differ; first: {diffs}"
        )
