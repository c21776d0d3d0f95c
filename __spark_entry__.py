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
def _check_history(here: str | None = None) -> dict[str, tuple[int, bool]]:
    """Map query name -> (highest round with a CORRECTNESS row, latest green?).

    A row is green when it has no error and its value-hash matched the
    oracle; ``no_oracle`` / exception rows count as red so they are
    re-verified with priority.
    """
    import glob
    import json
    import os
    import re

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    hist: dict[str, tuple[int, bool]] = {}
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
        for name, row in rows.items():
            green = row.get("err") is None and bool(row.get("hash_match"))
            prev = hist.get(name)
            if prev is None or rnd > prev[0]:
                hist[name] = (rnd, green)
    return hist


def _ordered():
    # Latest-red queries lead the sweep (so a bounded 50-slot check always
    # re-verifies anything whose last driver word was a failure), then
    # least-recently-checked, then neutral registry order.
    from skopje_spark.queries import load_all

    reg = load_all()
    hist = _check_history()
    idx = {n: i for i, n in enumerate(reg)}

    def key(n):
        rnd, green = hist.get(n, (0, False))
        # never-checked queries (rnd=0, green=False) sort with the reds
        # but after them (higher rnd first within red? no: ascending rnd
        # puts never-checked at the very front of the red block, which is
        # right -- no evidence at all beats stale-red for urgency).
        return (green, rnd, idx[n])

    names = sorted(reg, key=key)
    return {n: reg[n] for n in names}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every SQL-expressible query."""
    return {
        name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None
    }
