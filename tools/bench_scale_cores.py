#!/usr/bin/env python
"""Parallel-scaling evidence at a compute-bound SF (round-13 verdict item
#2): every core-scaling ratio at sf0.1 is ~1 because fixed per-job driver
latency dominates, so a genuine parallelism regression (an accidental
single-partition stage, a serial collect) would be invisible there.  This
tool runs the slow families at sf1.0 (10x data) under 8 and 32 cores —
fresh subprocess per (cores, sample) via bench.py's child protocol, so
the methodology (min-of-2 steady state, $SPARK_GRAFT_CPUS master) is
exactly the driver's — and reports the 8c/32c wall ratio per query.

A ratio >> 1 means the query's work actually spreads across cores; a
ratio ~1 at THIS scale would be a real finding to root-cause.  Writes
BENCH_SCALE_CORES.json (committed at round close).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/root/repo/.scale/sf1.0")

#: the slow families from the round-13/14 bench top tables
QUERIES = [
    "q_classifier_train",
    "q_pagerank",
    "q_dedup_agreement",
    "q_jaccard_pruned",
    "q_containment",
    "q_ann_ivf_refined",
    "q_ann_index_append",
    "q_triangle_count",
    "q_dup_components",
]


def run_child(cpus: int) -> dict[str, float]:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as fh:
        out = fh.name
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_CHILD=out,
        SPARK_GRAFT_SF_DIR=SF10,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_QUERIES=",".join(QUERIES),
    )
    rc = subprocess.call([sys.executable, os.path.join(here, "bench.py")], env=env)
    if rc != 0:
        raise SystemExit(f"child cpus={cpus} failed rc={rc}")
    with open(out) as f:
        timings = json.load(f)["queries"]
    os.unlink(out)
    return timings


def main() -> int:
    loadavg = [round(x, 2) for x in os.getloadavg()]
    t32 = run_child(32)
    print(f"# 32c: {t32}", file=sys.stderr)
    t8 = run_child(8)
    print(f"# 8c: {t8}", file=sys.stderr)
    ratios = {
        q: round(t8[q] / max(t32[q], 1e-9), 2) for q in t32 if q in t8
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    report = {
        "sf_dir": SF10,
        "loadavg_at_start": loadavg,
        "cores_32": t32,
        "cores_8": t8,
        "ratio_8c_over_32c": ratios,
    }
    with open(os.path.join(here, "BENCH_SCALE_CORES.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"ratio_8c_over_32c": ratios}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
