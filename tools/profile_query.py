#!/usr/bin/env python
"""Per-query stage profile: run one (or more) declared queries twice
(steady state), then dump the second run's per-stage wall time, task
time, shuffle read/write and input bytes from the UI REST API.

Usage:
  python tools/profile_query.py q_dedup_agreement [q_other ...] [--sf DIR]

The guide's §1 empirical loop as a CLI: find WHICH stage the time goes
to before touching code.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stages_detail(spark) -> dict[int, dict]:
    sc = spark.sparkContext
    base = sc.uiWebUrl
    url = f"{base}/api/v1/applications/{sc.applicationId}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as resp:
        return {s["stageId"]: s for s in json.load(resp)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from dipper_spark.plans import QUERIES
    from dipper_spark.session import get_spark

    spark = get_spark("profile-query")
    # warm JVM + python workers like bench.py
    QUERIES[args.queries[0]](spark, args.sf).count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()
    for name in args.queries:
        spark.sparkContext.setJobDescription(f"{name} warm")
        QUERIES[name](spark, args.sf).count()
        pre = stages_detail(spark)
        spark.sparkContext.setJobDescription(f"{name} steady")
        t0 = time.time()
        QUERIES[name](spark, args.sf).count()
        wall = time.time() - t0
        post = stages_detail(spark)
        new = [s for sid, s in post.items() if sid not in pre]
        new.sort(key=lambda s: -(s.get("executorRunTime", 0)))
        print(f"\n=== {name}: steady wall {wall:.2f}s, {len(new)} stages ===")
        tot_run = sum(s.get("executorRunTime", 0) for s in new)
        print(f"  total executorRunTime {tot_run/1e3:.2f}s "
              f"(x{tot_run/1e3/max(wall,1e-9):.1f} parallelism)")
        for s in new[:14]:
            dur = None
            if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                # REST gives ISO strings; skip parsing, report task metrics
                pass
            print(
                f"  stage {s['stageId']:>5} tasks={s.get('numCompleteTasks', '?'):>3} "
                f"run={s.get('executorRunTime', 0)/1e3:7.2f}s "
                f"cpu={s.get('executorCpuTime', 0)/1e9:7.2f}s "
                f"in={s.get('inputBytes', 0)/1e6:8.1f}MB "
                f"sw={s.get('shuffleWriteBytes', 0)/1e6:7.1f}MB "
                f"sr={s.get('shuffleReadBytes', 0)/1e6:7.1f}MB "
                f"gc={s.get('jvmGcTime', 0)/1e3:5.2f}s  "
                f"{(s.get('description') or s.get('name', ''))[:70]}"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
