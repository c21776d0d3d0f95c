#!/usr/bin/env python
"""Capture .explain("formatted") output and optional per-query timings
for headline bench entries — the optimization round's measurement
harness (guide §1: measure first; §7.2: read the plan).

Usage:
  python tools/plancap.py --out plans/r14 --suffix before [query ...]
  python tools/plancap.py --time 3 [query ...]   # min-of-N count() timing

Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and
$SPARK_GRAFT_CPUS like bench.py, and reuses bench.py's registry +
bench-only callables so the measured plan is exactly the benched plan.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="default: all HEADLINE entries")
    ap.add_argument("--out", default=None, help="directory for <q>_<suffix>.txt")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--time", type=int, default=0, help="time min-of-N count() runs")
    ap.add_argument("--warm", action="store_true", help="one untimed warmup pass")
    args = ap.parse_args()

    import bench
    from skopje_spark.queries import load_all
    from skopje_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="skopje-plancap", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    extra = bench._bench_only()
    names = args.queries or bench.HEADLINE

    def fn_of(name):
        return registry[name].fn if name in registry else extra[name]

    if args.out:
        os.makedirs(args.out, exist_ok=True)
    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        df = fn_of(name)(spark, sf_dir)
        if args.out:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}", file=sys.stderr)
        if args.warm or args.time:
            fn_of(name)(spark, sf_dir).count()
        if args.time:
            best = float("inf")
            for _ in range(args.time):
                t0 = time.perf_counter()
                fn_of(name)(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            results[name] = round(best, 3)
            print(f"{name}\t{results[name]}")
        spark.sparkContext.setJobDescription(None)
    if results:
        import json

        print(json.dumps(results))


if __name__ == "__main__":
    main()
