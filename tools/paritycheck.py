#!/usr/bin/env python
"""Spot-parity a subset of declared queries against the DuckDB oracle
(same compare contract as tests/oracle_check.py), without the full
pytest session — the optimization round's fast equivalence gate.

Usage: python tools/paritycheck.py [--sf DIR] q_name [q_name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from tests.oracle_check import compare, duck_connection

    from skopje_spark.queries import load_all
    from skopje_spark.session import get_spark

    spark = get_spark(app_name="skopje-parity")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    con = duck_connection(args.sf)
    failed = []
    for name in args.queries:
        q = registry[name]
        if q.oracle is None:
            print(f"{name}: SKIP (no oracle)")
            continue
        t0 = time.time()
        try:
            compare(q.fn(spark, args.sf), con, q.oracle, name)
            print(f"{name}: OK ({time.time()-t0:.1f}s)")
        except Exception as e:
            failed.append(name)
            print(f"{name}: FAIL — {e}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
