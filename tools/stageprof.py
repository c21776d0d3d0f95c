#!/usr/bin/env python
"""Per-stage profile of a bench entry — the guide §1/§7.1 empirical
loop without a UI: runs a query once (after a warmup) under a
SparkListener that records every stage's wall-clock, task count, and
shuffle/input byte totals, then prints stages sorted by wall-clock.

Usage: python tools/stageprof.py q_name [--runs N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    import bench
    from skopje_spark.queries import load_all
    from skopje_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="skopje-stageprof", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    extra = bench._bench_only()
    fn = registry[args.query].fn if args.query in registry else extra[args.query]

    if not args.no_warm:
        fn(spark, sf_dir).count()

    sc = spark.sparkContext
    jvm = sc._jvm
    # AppStatusStore gives completed-stage summaries post-run — no
    # custom listener class needed from Python.
    status = sc._jsc.sc().statusStore()

    import time

    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    wall = time.perf_counter() - t0

    rows = []
    it = status.stageList(None).iterator()
    while it.hasNext():
        s = it.next()
        sub = s.submissionTime()
        comp = s.completionTime()
        if not (sub.isDefined() and comp.isDefined()):
            continue
        start = sub.get().getTime()
        end = comp.get().getTime()
        rows.append(
            {
                "stage": s.stageId(),
                "name": s.name().split("\n")[0][:70],
                "desc": (s.description().get() if s.description().isDefined() else "")[:40],
                "start": start,
                "ms": end - start,
                "tasks": s.numCompleteTasks(),
                "in_mb": round(s.inputBytes() / 1e6, 1),
                "sh_r_mb": round(s.shuffleReadBytes() / 1e6, 1),
                "sh_w_mb": round(s.shuffleWriteBytes() / 1e6, 1),
                "cpu_s": round(s.executorCpuTime() / 1e9, 2),
                "run_s": round(s.executorRunTime() / 1e3, 2),
            }
        )
    # keep only stages from the timed run: the latest contiguous burst
    rows.sort(key=lambda r: r["start"])
    if rows:
        t_last = rows[-1]["start"]
        cut = t_last - int(wall * 1000) - 1500
        rows = [r for r in rows if r["start"] >= cut]
    rows.sort(key=lambda r: -r["ms"])
    print(f"wall {wall:.3f}s  stages {len(rows)}")
    print(f"{'stage':>5} {'ms':>7} {'tasks':>5} {'in_mb':>8} {'sh_r':>7} {'sh_w':>7} {'cpu_s':>7} {'run_s':>7}  name")
    for r in rows:
        print(
            f"{r['stage']:>5} {r['ms']:>7} {r['tasks']:>5} {r['in_mb']:>8} "
            f"{r['sh_r_mb']:>7} {r['sh_w_mb']:>7} {r['cpu_s']:>7} {r['run_s']:>7}  {r['name']}"
        )


if __name__ == "__main__":
    main()
