"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in the ``skopje_spark`` package; this module is
a thin adapter over its query registry (skopje_spark/queries).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from skopje_spark.queries import load_all
    from skopje_spark.session import tune_for_engine

    tune_for_engine(spark)
    return load_all()["q3_shipping_priority"].fn(spark, "/root/testdata/sf0.001")


# The catalog is larger than a bounded correctness sweep may sample.
# Rather than a hand-curated priority list (which biases verification
# toward author-picked queries), the iteration order is DERIVED from
# verification history: queries are sorted least-recently-driver-checked
# first, computed from the CORRECTNESS_r*.json files the driver itself
# writes.  Never-checked queries lead (in neutral registry order), then
# queries whose last green/row is oldest.  A bounded sweep therefore
# always exercises the least-battle-tested code first, and the order
# auto-rotates every round with no author input.
def _last_checked_round() -> dict[str, int]:
    """Map query name -> highest round number with a CORRECTNESS row."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name in rows:
            last[name] = max(last.get(name, 0), rnd)
    return last


def _ordered():
    from skopje_spark.queries import load_all

    reg = load_all()
    last = _last_checked_round()
    idx = {n: i for i, n in enumerate(reg)}
    names = sorted(reg, key=lambda n: (last.get(n, 0), idx[n]))
    return {n: reg[n] for n in names}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every SQL-expressible query."""
    return {
        name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None
    }
