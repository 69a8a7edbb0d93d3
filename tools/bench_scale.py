#!/usr/bin/env python
"""Scale evidence for the heavy dedup/ANN family (round-8 verdict item #2):
run the six target queries at sf0.1 (5k docs / 2k vectors) and sf1.0
(50k docs / 20k vectors — tools/gen_scale_data.py), recording wall time
and shuffle-write bytes, and report the growth ratio against the 10x
data ratio.

Near-linear means time and shuffle ratios stay O(10x): the workload is
constructed to be exactly 10x (vocabulary-disjoint replicas — see
gen_scale_data.py), so any super-linear growth is ENGINE overhead, which
is precisely what the 100 TB claims need evidence against.

q_semdedup is run in BOTH configurations at sf1.0: the catalog's fixed
k=16 (transparently quadratic-in-bucket-size — the documented blocking
economics) and the production k ∝ N form (k=160, constant bucket size —
the configuration the SemDeDup paper and the operator docstring
prescribe at scale).

Writes BENCH_SCALE.json; single fresh session per SF (fresh JVM between
SFs would be ideal but the within-session warm-up protocol matches
bench.py's steady-state discipline).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/root/repo/.scale/sf1.0")

DOC_QUERIES = [
    "q_jaccard_pruned",
    "q_minhash_lsh",
    "q_dup_components",
    "q_substring_spans",
    "q_media_patch_dedup",
    # round-9 additions: sketch, LM, localization, keyness, collocation,
    # and the PQ-ADC search — the new members of the heavy family
    "q_hll_distinct",
    "q_worst_window",
    "q_kneser_ney",
    "q_keyness",
    "q_pmi_collocations",
    "q_ann_pq",
    # round-10 additions: the salted skew-mitigation join, the unigram
    # tokenizer trainer (vocab-bounded EM: should be near-flat), the
    # shift-invariant spectral hash (map-side mapInPandas: linear), and
    # the IVFPQ exact-refine search (shortlist-bounded)
    "q_skew_join",
    "q_unigram_tokenizer",
    "q_media_spectrum",
    "q_ann_ivfpq_refine",
]


def _stages(spark):
    """All completed stages from the driver REST API: (stageId, shuffle
    write bytes)."""
    base = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages?status=complete")
    )
    return {s["stageId"]: s.get("shuffleWriteBytes", 0) for s in stages}


def _measure(spark, fn, runs: int = 2):
    """Steady-state wall time (min of ``runs``) + shuffle-write bytes of
    the LAST run (REST stage diff)."""
    times = []
    shuffle = 0
    n = 0
    for _ in range(runs):
        before = _stages(spark)
        t0 = time.time()
        n = fn().count()
        times.append(round(time.time() - t0, 3))
        after = _stages(spark)
        shuffle = sum(v for k, v in after.items() if k not in before)
    return {"sec": min(times), "rows": n, "shuffle_mb": round(shuffle / 1e6, 2)}


def run_sf(sf_dir: str, semdedup_k: list[int]):
    from pyspark.sql import functions as F

    from dipper_spark.operators.similarity import semdedup
    from dipper_spark.plans import QUERIES
    from dipper_spark.session import get_spark, load_table

    spark = get_spark("bench-scale")
    # warm JVM + arrow worker pool (same discipline as bench.py)
    QUERIES["q_pricing_summary"](spark, "/root/testdata/sf0.01").count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()
    out = {}
    for name in DOC_QUERIES:
        out[name] = _measure(spark, lambda: QUERIES[name](spark, sf_dir))
        print(f"# {sf_dir} {name}: {out[name]}", file=sys.stderr)
    emb = load_table(spark, sf_dir, "embeddings")
    for k in semdedup_k:
        key = f"q_semdedup(k={k})"
        out[key] = _measure(
            spark,
            lambda: semdedup(emb, emb.filter(F.col("vec_id") < k), threshold=0.35),
        )
        print(f"# {sf_dir} {key}: {out[key]}", file=sys.stderr)
    spark.stop()
    return out


def main() -> int:
    loadavg = [round(x, 2) for x in os.getloadavg()]
    r01 = run_sf(SF01, semdedup_k=[16])
    r10 = run_sf(SF10, semdedup_k=[16, 160])
    report = {"sf0.1": r01, "sf1.0": r10, "loadavg_at_start": loadavg, "ratios": {}}
    for name, m01 in r01.items():
        m10 = r10.get(name) or r10.get(name.replace("k=16", "k=160"))
        if m10:
            report["ratios"][name] = {
                "time": round(m10["sec"] / max(m01["sec"], 1e-9), 2),
                "shuffle": round(m10["shuffle_mb"] / max(m01["shuffle_mb"], 1e-9), 2),
                "rows": round(m10["rows"] / max(m01["rows"], 1), 2),
            }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_SCALE.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"ratios": report["ratios"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
