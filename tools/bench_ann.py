#!/usr/bin/env python
"""ANN operating curve (round-9 verdict item #7): recall@5 and wall time
at nprobe ∈ {1, 2, 4, 8} for IVF (2 Lloyd iterations) and IVF+PQ, so the
catalog's production nprobe=2 choice is MEASURED, not asserted.

Ground truth is the exact brute-force cosine top-5 (cosine_topk) for the
same query set; recall@5 = |approx ∩ exact| / 5 averaged over queries.
Wall time is min-of-2 per configuration after a warm-up search (the
bench.py steady-state discipline), measured on the full search pipeline
(index build + probe + top-k), since that is what a batch ANN job pays.

Fixtures (``--fixture``):
- ``sf`` (default): the driver's embeddings table — UNIFORM random unit
  vectors.  This is the ADVERSARIAL floor for any partition-based index:
  with no cluster structure, a query's true neighbors scatter across
  Voronoi cells almost independently, so recall ~ nprobe/n_centroids.
- ``clustered``: a deterministic Gaussian-mixture on the sphere
  (32 topic centers, within-cluster sigma 0.35) — the geometry real text
  embeddings actually have (documents cluster by topic; neighbors share
  the query's cluster).  Same sizes as the sf fixture, so the two runs
  differ ONLY in geometry (round-10 verdict nit c: catalog defaults were
  tuned on the worst-case fixture alone).

Writes BENCH_ANN_r10.json (sf) / BENCH_ANN_CLUSTERED_r11.json
(clustered); the analysis lives in docs/ANN_TRADEOFF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERIES = 50
K = 5
NPROBES = [1, 2, 4, 8]


def clustered_embeddings(spark, n: int = 20_000, dim: int = 64,
                         n_clusters: int = 32, sigma: float = 0.35):
    """Deterministic Gaussian-mixture embedding table (vec_id, embedding,
    label): unit-norm topic centers, within-cluster isotropic noise,
    re-normalized to the sphere.  Cluster sizes are equal (round-robin
    assignment) so no single cell dominates the inverted lists."""
    import numpy as np

    rng = np.random.default_rng(1107)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = np.arange(n) % n_clusters
    x = centers[assign] + sigma * rng.standard_normal((n, dim))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    rows = [
        (int(i), [float(v) for v in x[i]], int(assign[i])) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )


def main() -> None:
    from pyspark.sql import functions as F

    from dipper_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        ivfpq_index,
        ivfpq_refine_topk,
        ivfpq_search,
        ivfpq_topk,
    )
    from dipper_spark.session import get_spark, load_table

    args = sys.argv[1:]
    fixture = "sf"
    if "--fixture=clustered" in args:
        fixture = "clustered"
    elif "--fixture" in args and args.index("--fixture") + 1 < len(args):
        fixture = args[args.index("--fixture") + 1]
    spark = get_spark("bench-ann")
    if fixture == "clustered":
        emb = clustered_embeddings(spark).localCheckpoint(eager=True)
    else:
        emb = load_table(spark, SF_DIR, "embeddings").localCheckpoint(eager=True)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).localCheckpoint(eager=True)
    n_corpus = emb.count()

    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(queries, emb, k=K).select("query_id", "neighbor_id").collect()
    }

    def recall_of(rows) -> float:
        hit = sum(1 for r in rows if (r.query_id, r.neighbor_id) in exact)
        return round(hit / len(exact), 4)

    out: dict = {"fixture": fixture,
                 "sf_dir": SF_DIR if fixture == "sf" else None,
                 "n_corpus": n_corpus, "n_queries": N_QUERIES,
                 "k": K, "configs": {}}
    # residual IVFADC production config (round-12): 16 subspaces x 64
    # Lloyd-trained residual codes — capacity AND training are what the
    # r11 raw 4x16 sampled codes lacked (ADC ~0.07 on clustered geometry)
    RES = dict(n_sub=16, n_codes=64, pq_iters=2, residual=True)
    engines = ("ivf", "ivfpq", "ivfpq_refine", "ivfpq_refine_scaled",
               "ivfpq_residual", "ivfpq_residual_refine")
    for engine in engines:
        for nprobe in NPROBES:
            def build():
                if engine == "ivf":
                    return ivf_topk(
                        queries, emb, n_centroids=16, k=K,
                        refine_iters=2, nprobe=nprobe,
                    )
                if engine == "ivfpq":
                    # legacy raw-vector 4x16 sampled codes (the r11 config)
                    return ivfpq_topk(
                        queries, emb, n_centroids=16, k=K, nprobe=nprobe,
                        residual=False,
                    )
                if engine == "ivfpq_residual":
                    return ivfpq_topk(
                        queries, emb, n_centroids=16, k=K, nprobe=nprobe,
                        **RES,
                    )
                if engine == "ivfpq_residual_refine":
                    return ivfpq_refine_topk(
                        queries, emb, n_centroids=16, k=K, nprobe=nprobe,
                        shortlist=50 * nprobe, **RES,
                    )
                # fixed vs probe-proportional shortlist: the ADC codes are
                # too coarse to pick 50 winners out of nprobe x bucket
                # candidates, so the shortlist must grow with the probe
                # volume for refine to keep its capture rate
                short = 50 if engine == "ivfpq_refine" else 50 * nprobe
                return ivfpq_refine_topk(
                    queries, emb, n_centroids=16, k=K,
                    nprobe=nprobe, shortlist=short, residual=False,
                )

            build().count()  # warm-up
            times, rows = [], None
            for _ in range(2):
                t0 = time.time()
                rows = build().select("query_id", "neighbor_id").collect()
                times.append(time.time() - t0)
            cfg = f"{engine}@nprobe={nprobe}"
            out["configs"][cfg] = {
                "recall_at_5": recall_of(rows),
                "sec": round(min(times), 3),
                "n_result_rows": len(rows),
            }
            print(cfg, out["configs"][cfg], flush=True)

    # ---- search-only operating curve (round-12 verdict item #5) ----------
    # The residual rows above pay index training INSIDE every timed search
    # (~11s of each ~15s config at 20k vectors, finding #4) — a deployment
    # pays that once per corpus snapshot.  Train via ivfpq_index ONCE,
    # persist the four state tables to parquet (the model-store shape), and
    # time ivfpq_search alone per nprobe: recall x QUERY-TIME seconds, the
    # curve a deployment actually reads.
    import shutil
    import tempfile

    cents = emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding")
    store = tempfile.mkdtemp(prefix="bench_ann_idx_")
    t0 = time.time()
    idx_live = ivfpq_index(
        emb, cents, n_sub=RES["n_sub"], n_codes=RES["n_codes"],
        pq_iters=RES["pq_iters"], n_centroids=16,
    )
    for name, df in idx_live.items():
        df.write.mode("overwrite").parquet(os.path.join(store, name))
    out["index_train_sec"] = round(time.time() - t0, 3)
    print(f"index trained+persisted in {out['index_train_sec']}s", flush=True)
    idx = {name: spark.read.parquet(os.path.join(store, name)) for name in idx_live}
    for engine in ("ivfpq_stored_search", "ivfpq_stored_refine"):
        for nprobe in NPROBES:
            def build_stored():
                if engine == "ivfpq_stored_search":
                    return ivfpq_search(queries, idx, n_sub=RES["n_sub"], k=K, nprobe=nprobe)
                return ivfpq_refine_topk(
                    queries, emb, k=K, nprobe=nprobe,
                    shortlist=50 * nprobe, n_sub=RES["n_sub"], index=idx,
                )

            build_stored().count()  # warm-up
            times, rows = [], None
            for _ in range(2):
                t0 = time.time()
                rows = build_stored().select("query_id", "neighbor_id").collect()
                times.append(time.time() - t0)
            cfg = f"{engine}@nprobe={nprobe}"
            out["configs"][cfg] = {
                "recall_at_5": recall_of(rows),
                "sec": round(min(times), 3),
                "n_result_rows": len(rows),
            }
            print(cfg, out["configs"][cfg], flush=True)

    # ---- incremental append cost (round-13): shard-append vs retrain ------
    # A deployment absorbing a daily shard pays assign+encode of the NEW
    # rows only (ivfpq_index_append, frozen quantizer) — compare that to
    # the full retrain above (index_train_sec).  Delta = last 25% of the
    # corpus; the appended index must answer search bit-identically to an
    # index whose codes covered the full corpus from the start, so recall
    # at nprobe=2 is recorded as the sanity check.
    from dipper_spark.operators.similarity import ivfpq_index_append

    n_total = emb.count()
    cut = int(n_total * 3 / 4)
    delta = emb.filter(F.col("vec_id") >= cut)
    base_idx = {
        "centroids": idx["centroids"],
        "codebooks": idx["codebooks"],
        "codes": idx["codes"].join(delta.select("vec_id"), "vec_id", "left_anti"),
        "buckets": idx["buckets"].join(delta.select("vec_id"), "vec_id", "left_anti"),
    }
    times = []
    appended = None
    for _ in range(2):
        t0 = time.time()
        appended = ivfpq_index_append(delta, base_idx, n_sub=RES["n_sub"])
        appended["codes"].count()
        appended["buckets"].count()
        times.append(time.time() - t0)
    rows = (
        ivfpq_search(queries, appended, n_sub=RES["n_sub"], k=K, nprobe=2)
        .select("query_id", "neighbor_id")
        .collect()
    )
    out["append"] = {
        "n_delta": n_total - cut,
        "append_sec": round(min(times), 3),
        "retrain_sec": out["index_train_sec"],
        "recall_at_5_after_append@nprobe=2": recall_of(rows),
    }
    print("append", out["append"], flush=True)
    shutil.rmtree(store, ignore_errors=True)

    fname = "BENCH_ANN_r13.json" if fixture == "sf" else "BENCH_ANN_CLUSTERED_r13.json"
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           fname), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"done": True}))


if __name__ == "__main__":
    main()
