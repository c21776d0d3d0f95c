#!/usr/bin/env python
"""Per-stage profile of a bench entry — the guide §1/§7.1 empirical
loop without an interactive UI: runs a query once (after a warmup)
with the status REST API enabled, then prints the timed run's stages
(wall-clock, task count, input/shuffle byte totals) sorted by
wall-clock.

Usage: python tools/stageprof.py q_name [--no-warm]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_PORT = 4049


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
    spark = get_spark(
        app_name="skopje-stageprof",
        cpus=cpus,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(_PORT)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    extra = bench._bench_only()
    fn = registry[args.query].fn if args.query in registry else extra[args.query]

    if not args.no_warm:
        fn(spark, sf_dir).count()

    app_id = spark.sparkContext.applicationId

    def stages_json():
        url = (
            f"http://localhost:{_PORT}/api/v1/applications/{app_id}"
            "/stages?status=complete"
        )
        with urllib.request.urlopen(url) as r:
            return json.loads(r.read())

    def ts(x: str) -> float:
        return datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    before_ids = {s["stageId"] for s in stages_json()}
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    wall = time.perf_counter() - t0
    time.sleep(0.5)

    rows = []
    for s in stages_json():
        if s["stageId"] in before_ids:
            continue
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        comp = s.get("completionTime")
        if not (sub and comp):
            continue
        rows.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:70],
                "ms": int((ts(comp) - ts(sub)) * 1000),
                "tasks": s["numCompleteTasks"],
                "in_mb": round(s["inputBytes"] / 1e6, 1),
                "sh_r_mb": round(s["shuffleReadBytes"] / 1e6, 1),
                "sh_w_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
                "cpu_s": round(s["executorCpuTime"] / 1e9, 2),
                "run_s": round(s["executorRunTime"] / 1e3, 2),
            }
        )
    rows.sort(key=lambda r: -r["ms"])
    print(f"wall {wall:.3f}s  stages {len(rows)}  stage-ms-sum {sum(r['ms'] for r in rows)}")
    hdr = f"{'stage':>5} {'ms':>7} {'tasks':>5} {'in_mb':>8} {'sh_r':>7} {'sh_w':>7} {'cpu_s':>7} {'run_s':>7}  name"
    print(hdr)
    for r in rows:
        print(
            f"{r['stage']:>5} {r['ms']:>7} {r['tasks']:>5} {r['in_mb']:>8} "
            f"{r['sh_r_mb']:>7} {r['sh_w_mb']:>7} {r['cpu_s']:>7} {r['run_s']:>7}  {r['name']}"
        )


if __name__ == "__main__":
    main()
