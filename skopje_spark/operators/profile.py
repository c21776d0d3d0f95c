"""Dataset profiling: one-pass per-column statistics (dataset cards).

Extends the reference's schema-centric surface (`SqlMap` row encoding,
/root/reference/src/util.rs:1-40 exposes types but no statistics) with
the corpus-profiling pass every data card / intake checklist needs:
null rates, distinct counts, value ranges, and average value width for
every column, in ONE aggregation over the data.

Scale: all per-column aggregates are computed in a single ``agg`` —
one scan, map-side partial aggregation, and a one-row result; the
long-format reshape happens on that single row (``inline`` of a
literal-built struct array), so nothing the size of the data is ever
reshaped. The exact ``countDistinct`` per column makes Catalyst expand
the input ×n_cols inside that one shuffle (the Expand operator); at
100 TB swap ``exact_distinct=False`` to ``approx_count_distinct``
(HLL, mergeable, no Expand) — the switch is the only change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skopje_spark.queries.rounding import dround, dround_sql


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    exact_distinct: bool = True,
) -> DataFrame:
    """Long-format profile: one row per column with
    ``(col_name, n_rows, n_null, n_distinct, min_value, max_value,
    avg_len)``. ``min/max_value`` are the native min/max cast to
    string (cast AFTER the aggregate, so ordering is native-typed);
    ``avg_len`` is the mean string width of non-null values, rounded
    deterministically to 4 decimals."""
    cols = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        nd = (
            F.countDistinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(F.col(c))
        )
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            nd.alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
            dround(F.avg(F.length(F.col(c).cast("string"))), 4).alias(f"__al_{c}"),
        ]
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_value"),
            F.col(f"__mx_{c}").alias("max_value"),
            F.col(f"__al_{c}").alias("avg_len"),
        )
        for c in cols
    ]
    return one.select(F.inline(F.array(*structs))).orderBy("col_name")


def profile_columns_sql(table: str, cols: list[str]) -> str:
    """DuckDB oracle for :func:`profile_columns` — generated from the
    same column list so the two sides agree by construction."""
    parts = []
    for c in cols:
        parts.append(
            f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows, "
            f"COUNT(*) - COUNT({c}) AS n_null, "
            f"COUNT(DISTINCT {c}) AS n_distinct, "
            f"CAST(MIN({c}) AS VARCHAR) AS min_value, "
            f"CAST(MAX({c}) AS VARCHAR) AS max_value, "
            f"{dround_sql(f'AVG(LENGTH(CAST({c} AS VARCHAR)))', 4)} AS avg_len "
            f"FROM {table}"
        )
    return " UNION ALL ".join(parts)
