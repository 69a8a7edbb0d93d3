#!/usr/bin/env python
"""Regenerate tests/etl_sweep_counts.json — the pinned per-source triple
counts for the all-41-source ETL integration sweep
(tests/test_etl_all_sources.py).

Run this DELIBERATELY when a pipeline's semantics change (never to silence a
diff), with no other Spark JVMs running on the machine:

    python tools/regen_sweep_counts.py

Each source gets a fresh raw dir built from the same fixture writers the
sweep test uses, runs through etl.run with --dest-fmt ttl, and the turtle
output is re-parsed through the golden harness; the count is what the sweep
asserts.
"""

import json
import pathlib
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> int:
    from dipper_spark.etl import run
    from dipper_spark.io.turtle_parse import parse_turtle
    from dipper_spark.session import get_spark
    from dipper_spark.sources import REGISTRY

    import tests.test_etl_all_sources as sweep

    spark = get_spark("regen-sweep-counts", shuffle_partitions=8)
    counts: dict[str, int] = {}
    for name in sorted(REGISTRY):
        d = pathlib.Path(tempfile.mkdtemp(prefix=f"sweep_{name}_"))
        raw, out = d / "raw", d / "out"
        raw.mkdir()
        sweep.FIXTURE_WRITERS[name](raw)
        run(
            ["--sources", name, "--raw-dir", str(raw), "--out-dir", str(out),
             "--dest-fmt", "ttl"],
            spark=spark,
        )
        counts[name] = len(parse_turtle((out / f"{name}.ttl").read_text()))
        print(name, counts[name], flush=True)
    target = REPO / "tests" / "etl_sweep_counts.json"
    target.write_text(json.dumps(counts, indent=0, sort_keys=True) + "\n")
    print(f"wrote {len(counts)} counts to {target}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
