#!/usr/bin/env python
"""Clustered-geometry near-dup audit (round-12 verdict item #6): measure
precision/recall of the embedding-dedup family — blocked pair finding
(`blocked_neardup`) and SemDeDup's keep/drop verdict — against EXACT
all-pairs ground truth on the Gaussian-mixture fixture with PLANTED
near-duplicate twins.

The ANN stack got its realistic-geometry stress in rounds 10-11
(tools/bench_ann.py, docs/ANN_TRADEOFF.md); the dedup operators' recall
had only been exercised on uniform vectors, where blocking quality is
not at stake.  Here:

- fixture: 4,000 mixture vectors (32 topics, sigma 0.35 — the
  bench_ann clustered fixture) + 400 planted twins (vector + 0.03-sigma per-component
  noise — norm ~0.24 in 64-d, renormalized → cosine ~0.97 to its source), ids 4000+i.
- ground truth: exact all-pairs cosine >= tau (numpy, driver-side —
  4,400^2 dots; the audit's ORACLE, not a production path).
- measured: pair recall of `blocked_neardup` under (a) oracle blocking
  (the true topic label — the ceiling) and (b) production blocking
  (16 Lloyd-refined kmeans buckets, the q_semdedup shape); precision is
  structurally 1.0 (blocking only restricts candidates; every reported
  pair is exact-cosine-verified).  For SemDeDup: twin-dedup recall (the
  fraction of planted twin pairs where at least one side is dropped)
  and the collateral-drop rate (dropped vectors in no exact pair).

Writes BENCH_NEARDUP_CLUSTERED_r12.json; analysis in
docs/ANN_TRADEOFF.md §near-dup audit.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = 4_000
N_TWINS = 400
TAU = 0.9
DIM = 64


def fixture_matrix():
    import numpy as np

    from tools.bench_ann import clustered_embeddings  # noqa: F401 (sig ref)

    # rebuild the bench_ann mixture deterministically, then plant twins
    rng = np.random.default_rng(1107)
    centers = rng.standard_normal((32, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = np.arange(N_BASE) % 32
    x = centers[assign] + 0.35 * rng.standard_normal((N_BASE, DIM))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    twin_rng = np.random.default_rng(2203)
    twins = x[:N_TWINS] + 0.03 * twin_rng.standard_normal((N_TWINS, DIM))
    twins /= np.linalg.norm(twins, axis=1, keepdims=True)
    mat = np.vstack([x, twins])
    labels = np.concatenate([assign, assign[:N_TWINS]])
    return mat, labels


def main() -> int:
    import numpy as np

    from pyspark.sql import functions as F

    from dipper_spark.operators.similarity import (
        assign_buckets,
        blocked_neardup,
        centroid_neardup,
        kmeans_centroids,
        semdedup,
    )
    from dipper_spark.session import get_spark

    mat, labels = fixture_matrix()
    n = len(mat)
    # exact ground truth: all-pairs cosine >= TAU (driver-side oracle)
    sims = mat @ mat.T
    iu = np.triu_indices(n, k=1)
    hit = sims[iu] >= TAU
    exact_pairs = {
        (int(a), int(b)) for a, b in zip(iu[0][hit], iu[1][hit])
    }
    twin_pairs = {(i, N_BASE + i) for i in range(N_TWINS)}
    print(f"exact pairs@{TAU}: {len(exact_pairs)} "
          f"(planted twins among them: {len(exact_pairs & twin_pairs)})",
          flush=True)

    spark = get_spark("bench-neardup")
    emb = spark.createDataFrame(
        [(i, [float(v) for v in mat[i]], int(labels[i])) for i in range(n)],
        "vec_id LONG, embedding ARRAY<FLOAT>, label INT",
    ).localCheckpoint(eager=True)

    out: dict = {
        "fixture": "clustered+twins", "n_base": N_BASE, "n_twins": N_TWINS,
        "tau": TAU, "n_exact_pairs": len(exact_pairs), "configs": {},
    }

    def pair_metrics(df) -> dict:
        found = {
            (min(r.id_1, r.id_2), max(r.id_1, r.id_2))
            for r in df.select("id_1", "id_2").collect()
        }
        tp = len(found & exact_pairs)
        return {
            "n_found": len(found),
            "precision": round(tp / len(found), 4) if found else 1.0,
            "recall": round(tp / len(exact_pairs), 4),
            "twin_recall": round(
                len(found & twin_pairs) / len(twin_pairs), 4
            ),
        }

    # (a) oracle blocking: the true topic label
    out["configs"]["blocked_label"] = pair_metrics(
        blocked_neardup(emb, "label", threshold=TAU)
    )
    print("blocked_label", out["configs"]["blocked_label"], flush=True)

    # (b) production blocking: 16 Lloyd-refined kmeans buckets
    cents = kmeans_centroids(emb, n_centroids=16, n_iter=2)
    bucketed = assign_buckets(emb, cents).withColumnRenamed(
        "bucket", "kblock"
    ).localCheckpoint(eager=True)
    out["configs"]["blocked_kmeans16"] = pair_metrics(
        blocked_neardup(bucketed, "kblock", threshold=TAU)
    )
    print("blocked_kmeans16", out["configs"]["blocked_kmeans16"], flush=True)

    # (b2) multi-assign blocking through the SHIPPED operator (round-12
    # verdict item #4): each vector indexed under its TOP-2 cells — boundary
    # pairs split by the single-assignment Voronoi edge meet in the
    # second-choice cell; cost = 2x index rows, pairs deduped by id
    out["configs"]["centroid_neardup_multi2"] = pair_metrics(
        centroid_neardup(emb, cents, threshold=TAU, n_assign=2)
    )
    print("centroid_neardup_multi2",
          out["configs"]["centroid_neardup_multi2"], flush=True)

    # (c) SemDeDup verdict at the same tau over the same kmeans clustering
    sd = semdedup(emb, cents.withColumnRenamed("bucket", "vec_id")
                  if "bucket" in cents.columns else cents, threshold=TAU)
    dropped = {r.vec_id for r in sd.filter(~F.col("keep")).collect()}
    twin_deduped = sum(
        1 for a, b in twin_pairs if a in dropped or b in dropped
    )
    in_some_pair = {i for p in exact_pairs for i in p}
    collateral = len(dropped - in_some_pair)
    out["configs"]["semdedup_kmeans16"] = {
        "n_dropped": len(dropped),
        "twin_dedup_recall": round(twin_deduped / len(twin_pairs), 4),
        "collateral_drops": collateral,
        "collateral_rate": round(collateral / max(len(dropped), 1), 4),
    }
    print("semdedup_kmeans16", out["configs"]["semdedup_kmeans16"], flush=True)

    # (c2) SemDeDup with the shipped top-2 candidate search: the boundary
    # twins single assignment leaves in the corpus get deduped
    sd2 = semdedup(emb, cents, threshold=TAU, n_assign=2)
    dropped2 = {r.vec_id for r in sd2.filter(~F.col("keep")).collect()}
    twin_deduped2 = sum(
        1 for a, b in twin_pairs if a in dropped2 or b in dropped2
    )
    collateral2 = len(dropped2 - in_some_pair)
    out["configs"]["semdedup_kmeans16_multi2"] = {
        "n_dropped": len(dropped2),
        "twin_dedup_recall": round(twin_deduped2 / len(twin_pairs), 4),
        "collateral_drops": collateral2,
        "collateral_rate": round(collateral2 / max(len(dropped2), 1), 4),
    }
    print("semdedup_kmeans16_multi2",
          out["configs"]["semdedup_kmeans16_multi2"], flush=True)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_NEARDUP_CLUSTERED_r13.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"done": True}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
