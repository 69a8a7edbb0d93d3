#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()`` on
DuckDB over the same parquet tables, comparing:
  - row count
  - sorted column-name list
  - order-insensitive value hash (columns sorted by name, rows sorted,
    floats canonicalized)

Usage:
  python tools/check_correctness.py                 # sf0.01, all queries
  python tools/check_correctness.py --sf /root/testdata/sf0.001
  python tools/check_correctness.py -q q_pricing_summary -q q_range_join
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def value_hash(columns: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon_rows = sorted("\x01".join(canon_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for r in canon_rows:
        h.update(r.encode("utf-8", "surrogatepass"))
        h.update(b"\x02")
    return h.hexdigest()


def compare_results(
    scols: list[str], srows: list[tuple], ocols: list[str], orows: list[tuple]
) -> list[str]:
    """THE gate comparison: rowcount, sorted column names, then the
    order-insensitive value hash.  Returns the problem list (empty =
    green).  Exposed as a function so tests/test_gate_sensitivity.py can
    seed deliberate faults and prove the gate goes red — the detection
    power is tested, not asserted."""
    problems = []
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
    if not problems:
        sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
        if sh != oh:
            problems.append("value-hash mismatch")
            sset = {tuple(map(canon_cell, r)) for r in srows}
            oset = {tuple(map(canon_cell, r)) for r in orows}
            only_s = list(sset - oset)[:3]
            only_o = list(oset - sset)[:3]
            problems.append(f"spark-only={only_s} oracle-only={only_o}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("-q", "--query", action="append", default=None)
    ap.add_argument("--out", default=None,
                    help="write the full per-query result map to this JSON file")
    args = ap.parse_args()

    import __spark_entry__ as e
    from dipper_spark.session import get_spark

    # the scale gates (sf1.0) value-hash multi-million-row results; the
    # default driver.maxResultSize kills the gate's own collect (seen:
    # q_fuzzy_join at sf1.0, 1.3 GiB of result rows) — a harness limit,
    # not an engine one, so the harness raises it before session build
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    os.environ.setdefault("SPARK_GRAFT_MAX_RESULT", "8g")
    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        # partial-SF dirs (the sf1.0 scale set has only documents/
        # embeddings) register what exists; queries touching an absent
        # table fail loudly at execution, which is the right behavior
        if os.path.exists(f"{args.sf}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
            )

    qs = e.queries()
    oracles = e.oracle_sql()
    names = args.query or list(qs)
    results, n_pass = {}, 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                results[name] = {"status": "ROWS_ONLY", "rows": len(srows)}
                n_pass += 1
                print(f"{name:28s} ROWS_ONLY rows={len(srows)} ({time.time()-t0:.1f}s)")
                continue
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            problems = compare_results(scols, srows, ocols, orows)
            status = "PASS" if not problems else "FAIL"
            if status == "PASS":
                n_pass += 1
            results[name] = {"status": status, "rows": len(srows), "problems": problems}
            print(f"{name:28s} {status} rows={len(srows)} ({time.time()-t0:.1f}s)"
                  + (f"  {problems}" if problems else ""))
        except Exception as ex:  # noqa: BLE001
            results[name] = {"status": "ERROR", "error": str(ex)[:500]}
            print(f"{name:28s} ERROR {str(ex)[:200]}")
    print(json.dumps({"pass": n_pass, "total": len(names)}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(
                {"sf": args.sf, "pass": n_pass, "total": len(names),
                 "queries": results},
                fh, indent=1,
            )
    spark.stop()
    return 0 if n_pass == len(names) else 1


if __name__ == "__main__":
    sys.exit(main())
