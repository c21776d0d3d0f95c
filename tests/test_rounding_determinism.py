"""Order-independence of the dsum_sql aggregate (queries/rounding.py).

The round-14 driver found q_sql_udf_revenue flipping its last cent
against the DuckDB oracle: a 6-dp summand rounded at 2 dp genuinely
lands on .xx5000 boundaries, where double summation order (Spark's
partition-parallel partial sums vs DuckDB's sequential fold) decides
the cent. dsum_sql sums exact integer micro-units instead, so the
result is identical under ANY partition layout and engine. These
tests pin that: the same aggregate at several partition counts must
produce bit-identical doubles, and must equal DuckDB exactly (no
canonicalization slack).
"""

from __future__ import annotations

import duckdb

from skopje_spark.queries.rounding import dround_scalar, dsum_sql
from skopje_spark.tables import load_table

_EXPR = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"


def _spark_rows(spark, sf_dir, n_partitions: int):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount", "l_tax", "l_shipdate"
    )
    li.repartition(n_partitions).createOrReplaceTempView("__dsum_li")
    rows = spark.sql(
        f"""
        SELECT l_returnflag, {dsum_sql(_EXPR, 6, 2)} AS taxed_revenue
        FROM __dsum_li
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    ).collect()
    return [(r["l_returnflag"], r["taxed_revenue"]) for r in rows]


def test_dsum_partition_invariant_and_oracle_exact(spark, sf_dir):
    # bit-exact across partition layouts (1 task, 13 tasks, 32 tasks):
    # the aggregate is integer arithmetic, so no layout may move it
    one = _spark_rows(spark, sf_dir, 1)
    thirteen = _spark_rows(spark, sf_dir, 13)
    thirty_two = _spark_rows(spark, sf_dir, 32)
    assert one == thirteen == thirty_two

    # bit-exact against DuckDB — deliberately NO float canonicalization
    # (the driver's hash is stricter than tests/oracle_check's %.9g,
    # which is what let the round-14 flake through the local gate)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS "
        f"SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    duck = con.execute(
        f"""
        SELECT l_returnflag, {dsum_sql(_EXPR, 6, 2)} AS taxed_revenue
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    ).fetchall()
    con.close()
    assert one == [(f, float(v)) for f, v in duck]


def test_dsum_matches_exact_decimal_reference(spark, sf_dir):
    """dsum_sql's value IS the half-away-from-zero 2-dp rounding of the
    exact decimal sum — computed here independently in Python over the
    exact 6-dp per-row products."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount", "l_tax", "l_shipdate"
    )
    rows = li.filter("l_shipdate <= DATE '1998-09-02'").collect()
    sums: dict[str, int] = {}
    for r in rows:
        # exact 6-dp product in integer micro-units via Decimal
        p = (
            Decimal(repr(r["l_extendedprice"]))
            * (1 - Decimal(repr(r["l_discount"])))
            * (1 + Decimal(repr(r["l_tax"])))
        )
        micro = int(
            (p * 1_000_000).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )
        sums[r["l_returnflag"]] = sums.get(r["l_returnflag"], 0) + micro
    expect = {
        f: math.floor((m + 5000) / 10000.0) / 100.0 for f, m in sums.items()
    }
    got = dict(_spark_rows(spark, sf_dir, 8))
    assert got == expect
    # sanity: dround_scalar agrees with the integer rounding on the sums
    for f, m in sums.items():
        assert dround_scalar(m / 1e6, 2) == expect[f]
