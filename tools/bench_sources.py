#!/usr/bin/env python
"""Per-source ETL sweep timing (round-6 task #8).

Runs every registered source pipeline end-to-end (fixture write -> etl.run
transform -> ttl sink) once, on the same tiny fixtures the pytest sweep
pins counts against, and reports wall seconds per source.  The absolute
numbers are fixture-scale (plan build + small execution), but they are
STABLE round over round, so a source-transform regression (e.g. a rebuilt
pipeline whose plan blew up) shows as a step change in its number.

Standalone:  python tools/bench_sources.py  -> one JSON line
From bench.py: ``bench_sources(spark)`` -> {source: sec} merged into
BENCH_DETAIL.json under "sources".
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_sources(spark) -> dict[str, dict[str, float]]:
    from dipper_spark.etl import run
    from tests.test_etl_all_sources import FIXTURE_WRITERS

    out: dict[str, dict[str, float]] = {}
    for name in sorted(FIXTURE_WRITERS):
        with tempfile.TemporaryDirectory() as td:
            raw = Path(td) / "raw"
            raw.mkdir()
            FIXTURE_WRITERS[name](raw)
            t0 = time.time()
            report = run(
                ["--sources", name, "--raw-dir", str(raw),
                 "--out-dir", f"{td}/out", "--dest-fmt", "ttl"],
                spark=spark,
            )
            phases = report["sources"][name]
            out[name] = {
                "total": round(time.time() - t0, 3),
                "transform": phases.get("transform", 0.0),
                "write": phases.get("write", 0.0),
            }
            print(f"# source {name}: {out[name]['total']}s", file=sys.stderr)
    return out


def write_sources_artifact(timings: dict[str, dict[str, float]]) -> str:
    """Persist the sweep to BENCH_SOURCES.json at the repo root (committed
    at round close so per-source transform cost is diffable round over
    round)."""
    total = round(sum(v["total"] for v in timings.values()), 3)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SOURCES.json",
    )
    with open(path, "w") as fh:
        json.dump(
            {"metric": "source_sweep_total", "value": total, "unit": "sec",
             "n_sources": len(timings), "sources": timings},
            fh, indent=1,
        )
    return path


def main() -> int:
    from dipper_spark.session import get_spark

    spark = get_spark("bench-sources")
    timings = bench_sources(spark)
    total = round(sum(v["total"] for v in timings.values()), 3)
    write_sources_artifact(timings)
    print(json.dumps({"metric": "source_sweep_total", "value": total,
                      "unit": "sec", "n_sources": len(timings),
                      "detail": "BENCH_SOURCES.json"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
