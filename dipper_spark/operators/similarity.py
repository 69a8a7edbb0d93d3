"""Similarity search over embedding columns: brute-force cosine top-k and an
IVF-style bucketed approximate variant.

Beyond-reference operators (BASELINE.json north star).  The correctness-path
expressions use functions.vectors (double-accumulated, oracle-bit-exact); the
scale path swaps the inner product for an Arrow pandas-UDF (numpy matmul over
batches) without changing the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dipper_spark.functions.vectors import cosine, dot, dot_unrolled, l2_norm
from dipper_spark.operators.windows import topk_per_group
from dipper_spark.operators.util import ensure_parallelism, tiny_df


def _cos_pre(e1, n1: str, e2, n2: str):
    """``cosine(e1, e2)`` with both L2 norms precomputed as columns — the
    centroid_neardup discipline applied as a helper: the expression tree
    is ``dot / (n1 * n2)`` in cosine()'s exact evaluation order, so the
    double is bit-identical, while each PAIR pays one array fold instead
    of three (each norm is computed once per ROW before the pair-join;
    dot() allocates a zip_with array per call, guide §1.2 per-task work)."""
    return dot(e1, e2) / (F.col(n1) * F.col(n2))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Brute-force cosine top-k: every query scored against every corpus row.

    Both inputs: (vec_id, embedding).  The query side is broadcast — the scan
    over the corpus is a single pass, embarrassingly parallel, no shuffle
    until the final per-query top-k (tiny).  At 100 TB this is the exact-recall
    baseline; cost is linear in corpus x queries.
    """
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            l2_norm("embedding").alias("_qn"),
        )
    )
    c = ensure_parallelism(corpus).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        l2_norm("embedding").alias("_cn"),
    )
    scored = q.join(c, F.lit(True))
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select(
        "query_id", "neighbor_id", _cos_pre("q_emb", "_qn", "c_emb", "_cn").alias("cos_sim")
    )
    return topk_per_group(
        scored,
        "query_id",
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    ).select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"),
             F.col("rank").cast("long").alias("rank"))


def cosine_topk_arrow(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """The 100 TB brute-force path: Arrow-batched numpy matmul.

    Same contract and results as :func:`cosine_topk`, different physics: the
    per-pair higher-order-function dot product becomes one BLAS
    ``Q_norm @ C_norm.T`` per Arrow batch, and each batch keeps only its own
    top-k per query (partial top-k) — so the shuffle into the global top-k
    carries O(batches x queries x k) rows instead of |corpus| x |queries|.
    The query matrix rides the task closure (the broadcast side).
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select("vec_id", "embedding").collect()
    q_ids = np.array([r.vec_id for r in q_rows])
    qm = np.asarray([r.embedding for r in q_rows], dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def score_batches(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            cm = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
            cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            sims = qm @ cm.T  # (n_queries, n_batch)
            n_ids = pdf["vec_id"].to_numpy()
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(q_ids):
                row = sims[qi]
                mask = n_ids != qid if exclude_self else np.ones(len(row), bool)
                idx = np.nonzero(mask)[0]
                if len(idx) == 0:
                    continue
                # partial top-k within the batch; ties sorted by neighbor_id
                # so truncation keeps the same rows the global tie-break
                # (cos desc, neighbor_id asc) would select
                order = np.lexsort((n_ids[idx], -row[idx]))
                top = idx[order[: k + 1]]
                out_q.extend([qid] * len(top))
                out_n.extend(n_ids[top])
                out_s.extend(row[top])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s})

    scored = ensure_parallelism(corpus).select("vec_id", "embedding").mapInPandas(
        score_batches, "query_id long, neighbor_id long, cos_sim double"
    )
    return topk_per_group(
        scored,
        "query_id",
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    ).select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"),
             F.col("rank").cast("long").alias("rank"))


def assign_buckets(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """IVF assignment: each vector goes to its max-cosine centroid
    (deterministic ties: lowest centroid id).  Centroids are broadcast; the
    assignment is one scan over the vectors.

    The argmax is an ARRAY FOLD, not a join+aggregation: the centroid set
    collapses to a single broadcast row carrying a (cent_id-sorted) array
    of (id, embedding, norm) structs, and each vector takes
    ``array_max(transform(cents, ...))`` over per-centroid
    struct(cos, -cent_id, cent_id) — the exact comparison order of the
    former ``max(struct(cos, -cent_id))`` hash aggregation, so the winning
    bucket is identical.  What it removes, per vector: n_centroids joined
    rows each materializing two embedding arrays, and a corpus-sized
    aggregation exchange — the assign becomes one WholeStageCodegen map
    pass (guide §1.2/§2.4; cos values bit-identical via per-row
    precomputed norms)."""
    cents_arr = F.broadcast(
        centroids.select(
            F.struct(
                F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cent_emb"),
                l2_norm("embedding").alias("_cn"),
            ).alias("_c")
        ).agg(F.sort_array(F.collect_list("_c")).alias("_cents"))
    )
    score = lambda c: F.struct(  # noqa: E731
        (
            dot(F.col("embedding"), c["cent_emb"])
            / (F.col("_vn") * c["_cn"])
        ).alias("c"),
        (-c["cent_id"]).alias("nc"),
        c["cent_id"].alias("cent_id"),
    )
    return (
        ensure_parallelism(vectors)
        .select("vec_id", "embedding", l2_norm("embedding").alias("_vn"))
        .crossJoin(cents_arr)
        .select(
            "vec_id", "embedding",
            F.array_max(F.transform("_cents", score)).alias("_t"),
        )
        .filter(F.col("_t").isNotNull())
        .select("vec_id", "embedding", F.col("_t.cent_id").alias("bucket"))
    )


def seeded_centroid_init(
    vectors: DataFrame, n_centroids: int, seed: int = 42, oversample: int = 8
) -> DataFrame:
    """Deterministic k-means++-style centroid seeding.

    Two stages, both deterministic:

    1. **Candidate sample** — order by the md5 of the (seed, vec_id) pair
       and take ``oversample * n_centroids`` rows: a uniform deterministic
       shuffle, so candidates spread across the corpus even when the input
       is sorted by cluster (the degenerate case for first-N init).  One
       narrow distributed sort; the candidate set is broadcast-sized.
    2. **Farthest-point refinement** — greedy k-center over the candidates
       (start from the first, repeatedly add the candidate least similar to
       the chosen set).  This is the k-means++ spreading step without its k
       sequential cluster passes; it runs driver-side on the tiny candidate
       matrix (numpy, O(oversample·n² ) flops) — the same legitimately-
       driver-side class as the broadcast query matrix in
       :func:`cosine_topk_arrow`.
    """
    import numpy as np

    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("vec_id").cast("string")))
    cand = (
        vectors.select("vec_id", "embedding", key.alias("_k"))
        .orderBy("_k", "vec_id")
        .limit(oversample * n_centroids)
        .drop("_k")
        .collect()
    )
    if len(cand) <= n_centroids:
        chosen = cand
    else:
        ids = [r.vec_id for r in cand]
        mat = np.asarray([r.embedding for r in cand], dtype=np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T  # candidate x candidate cosine
        picked = [0]
        # per-candidate max cosine to the chosen set
        closest = sims[0].copy()
        for _ in range(n_centroids - 1):
            closest[picked] = np.inf  # never re-pick
            nxt = int(np.argmin(closest))  # least similar to any chosen
            picked.append(nxt)
            closest = np.maximum(closest, sims[nxt])
        chosen = [cand[i] for i in sorted(picked, key=lambda i: ids[i])]
    spark = vectors.sparkSession
    return tiny_df(
        spark, [(r.vec_id, r.embedding) for r in chosen],
        "vec_id long, embedding array<float>",
    )


def kmeans_centroids(
    vectors: DataFrame, n_centroids: int = 16, n_iter: int = 5,
    init: str = "first", seed: int = 42,
) -> DataFrame:
    """Lloyd-refined IVF centroids, fully relational.

    ``init='first'`` takes the first ``n_centroids`` vectors (deterministic
    and SQL-oracle-mirrorable — the q_ann_ivf_refined oracle unrolls exactly
    this); ``init='seeded'`` uses :func:`seeded_centroid_init` for
    production robustness against cluster-sorted inputs.  Each iteration is
    one distributed assign pass (broadcast max-cosine,
    :func:`assign_buckets`) followed by an element-wise mean per bucket.

    The mean is ONE aggregation, not two: per-dim ``avg(embedding[i])``
    columns under a single ``groupBy(bucket)`` (the embedding width is
    peeked once before the loop).  Map-side partials reduce each task to
    n_buckets x dim doubles, so the per-iteration exchange carries
    dictionary-sized partial rows and the former second shuffle (the
    collect_list re-assembly of the posexplode → groupBy(bucket, dim)
    form) disappears — the array is re-assembled in a projection.  Each
    per-dim avg accumulates the same doubles as the exploded form
    (float32-cast result, the oracle's CAST(m AS REAL) contract).  The
    driver only orchestrates the loop; centroid count stays
    broadcast-sized by construction.
    """
    if init == "seeded":
        centroids = seeded_centroid_init(vectors, n_centroids, seed)
    else:
        centroids = vectors.filter(F.col("vec_id") < n_centroids).select(
            "vec_id", "embedding"
        )
    first = vectors.select("embedding").head()
    if first is None:  # empty corpus: nothing to refine
        return centroids.localCheckpoint(eager=True)
    dim = len(first[0])
    for _ in range(n_iter):
        assigned = assign_buckets(vectors, centroids)
        means = (
            assigned.groupBy("bucket")
            .agg(*[F.avg(F.col("embedding")[i]).alias(f"_m{i}") for i in range(dim)])
            .select(
                "bucket",
                F.array(
                    *[F.col(f"_m{i}").cast("float") for i in range(dim)]
                ).alias("embedding"),
            )
        )
        centroids = means.select(F.col("bucket").alias("vec_id"), "embedding")
        # Truncate lineage each iteration: the centroid frame is tiny
        # (n_centroids rows) but its lazy plan embeds every previous
        # assignment pass — without this, iteration k re-executes iterations
        # 1..k-1 and the plan grows superlinearly.  The standard iterative-
        # algorithm pattern (MLlib checkpoints the same way).
        centroids = centroids.localCheckpoint(eager=False)
    # the RETURNED frame has several concurrent consumers in ivf_topk (the
    # corpus-assign broadcast, the query-scoring broadcast) and a lazy
    # checkpoint does NOT dedupe computation across concurrent stages of
    # one action — each broadcast build would re-run every Lloyd pass.
    # One eager materialization of the n_centroids-row table fixes that
    # (guide §1.2); the in-loop checkpoints above stay lazy because each
    # iteration has exactly one consumer (the next assign pass).
    return centroids.localCheckpoint(eager=True)


def label_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Mean-pool embeddings per label — the centroid/prototype aggregation
    (cluster summaries, class prototypes, dataset-cartography anchors).

    Long relational form: posexplode → groupBy(label, dim) → avg — one
    shuffle on (label, dim) with map-side partial sums, so a label with a
    billion members costs the same shuffle rows as one with ten.  Returns
    (label, dim, mean_v) with ``dim`` 0-based; callers wanting arrays
    re-assemble with sort_array(collect_list(struct(dim, mean_v))) (see
    kmeans_centroids, the consumer of the same pattern)."""
    return (
        df.select(F.col(label_col).alias("label"), F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg(F.col("v").cast("double")).alias("mean_v"))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_centroids: int = 16,
    k: int = 5,
    refine_iters: int = 0,
    nprobe: int = 1,
    init: str = "first",
    seed: int = 42,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus bucketed by nearest centroid; each
    query searches its ``nprobe`` closest buckets.

    ``refine_iters=0`` keeps the deterministic first-N-vectors centroids
    (engine-portable — the SQL oracle mirrors them); ``refine_iters>0`` runs
    that many Lloyd iterations (:func:`kmeans_centroids`) for production
    recall.  ``nprobe`` is the standard recall/throughput knob: each query
    touches ~nprobe/n_centroids of the corpus (nprobe=n_centroids degrades
    gracefully to exact brute force).  Recall at small nprobe depends on the
    corpus actually clustering — on a near-uniform sphere every partitioning
    index must probe most buckets for high recall; that is a data property,
    not a plan property.

    ``centroids`` short-circuits training entirely: pass a stored
    (vec_id, embedding) centroid table (the model-store artifact,
    io/model_store.py) and query time is assignment + probe only — the
    steady-state a 100 TB deployment runs, where the index trains once
    and every later query batch loads it.

    Scale path: bucket assignment is a broadcast pass; the probe join
    shuffles on the bucket id, so cost scales with the probed fraction.
    """
    if centroids is not None:
        pass
    elif refine_iters > 0:
        centroids = kmeans_centroids(corpus, n_centroids, refine_iters, init=init, seed=seed)
    elif init == "seeded":
        centroids = seeded_centroid_init(corpus, n_centroids, seed)
    else:
        centroids = corpus.filter(F.col("vec_id") < n_centroids)
    bucketed = assign_buckets(corpus, centroids).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        "bucket",
        l2_norm("embedding").alias("_cn"),
    )
    if nprobe <= 1:
        q_bucketed = assign_buckets(queries, centroids).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"),
            "bucket", l2_norm("embedding").alias("_qn"),
        )
    else:
        c = F.broadcast(
            centroids.select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_emb"))
        )
        q_scored = ensure_parallelism(queries).join(c, F.lit(True)).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("cent_id").alias("bucket"),
            cosine("embedding", "cent_emb").alias("cent_cos"),
        )
        q_bucketed = topk_per_group(
            q_scored, "query_id", [F.col("cent_cos").desc(), F.col("bucket").asc()],
            k=nprobe,
        ).select("query_id", "q_emb", "bucket", l2_norm("q_emb").alias("_qn"))
    # the probe join's exact cosine is the per-pair hot path (query x
    # bucket-members rows): both norms precomputed per ROW above
    scored = (
        q_bucketed.join(bucketed, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            _cos_pre("q_emb", "_qn", "c_emb", "_cn").alias("cos_sim"),
        )
    )
    return topk_per_group(
        scored,
        "query_id",
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    ).select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"),
             F.col("rank").cast("long").alias("rank"))


def blocked_neardup(
    emb: DataFrame, block_col: str = "label", threshold: float = 0.3,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs within blocking buckets: self-equi-join on the
    block key (cluster/label/LSH bucket), cosine >= threshold.

    Blocking turns all-pairs O(n²) into sum of per-bucket quadratics — the
    standard scale move; bucket skew is handled by AQE skew-join splitting.

    ``dim``: when the embedding dimension is known (a dataset property),
    the per-pair dot unrolls to a codegen'd chain instead of the
    interpreted fold — bit-identical doubles, ~10x the pair-scoring
    stage (functions.vectors.dot_unrolled; round-14 sf1.0 profile).
    """
    emb = ensure_parallelism(emb)
    a = emb.select(
        F.col("vec_id").alias("id_1"), F.col("embedding").alias("e1"),
        F.col(block_col).alias("b"), l2_norm("embedding").alias("_n1"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_2"), F.col("embedding").alias("e2"),
        F.col(block_col).alias("b"), l2_norm("embedding").alias("_n2"),
    )
    _dot = (lambda x, y: dot_unrolled(x, y, dim)) if dim else dot
    return (
        a.join(b, "b")
        .filter(F.col("id_1") < F.col("id_2"))
        .withColumn(
            "cos_sim", _dot("e1", "e2") / (F.col("_n1") * F.col("_n2"))
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(F.col("b").alias(block_col), "id_1", "id_2", F.round("cos_sim", 6).alias("cos_sim"))
    )


def assign_buckets_multi(
    vectors: DataFrame, centroids: DataFrame, n_assign: int = 2
) -> DataFrame:
    """Multi-assignment IVF blocking: each vector is indexed under its
    top-``n_assign`` max-cosine centroids (deterministic ties: lowest
    centroid id — the same ranking the ANN multi-probe uses on the query
    side, applied to the INDEX side).

    Why it exists, measured (BENCH_NEARDUP_CLUSTERED_r12.json): single
    assignment splits near-dup pairs that straddle a Voronoi edge —
    kmeans-16 blocking caught 86.8% of exact pairs on the clustered-twins
    fixture, and top-2 assignment closed the gap to 100% at the cost of
    ``n_assign``x index rows.  The recommended decontamination posture
    (docs/ANN_TRADEOFF.md §near-dup audit).

    Returns (vec_id, embedding, bucket) with up to ``n_assign`` rows per
    vector."""
    c = F.broadcast(
        centroids.select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cent_emb"),
            l2_norm("embedding").alias("_cn"),
        )
    )
    scored = (
        ensure_parallelism(vectors)
        .select("vec_id", "embedding", l2_norm("embedding").alias("_vn"))
        .join(c, F.lit(True))
        .select(
            "vec_id", "embedding", "cent_id",
            _cos_pre("embedding", "_vn", "cent_emb", "_cn").alias("cent_cos"),
        )
    )
    return topk_per_group(
        scored,
        "vec_id",
        [F.col("cent_cos").desc(), F.col("cent_id").asc()],
        k=n_assign,
    ).select("vec_id", "embedding", F.col("cent_id").alias("bucket"))


# b-side fan-out for salted within-bucket self-joins: the join key gains
# _SALT_K deterministic sub-keys so a handful of centroid cells spreads
# over n_buckets x _SALT_K partitions instead of one task per cell
# (guide §2.5 salting).  A fan-out multiplier, not a partition count —
# valid unchanged at any scale; raising it trades b-side duplication
# (rows x _SALT_K through one exchange) for narrower hot cells.
_SALT_K = 8


def centroid_neardup(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.9,
    n_assign: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Centroid-blocked embedding near-dup pairs with optional
    multi-assignment (round-12 verdict item #4): assign each vector to its
    top-``n_assign`` centroid cells, self-join within cells, keep exact
    cosine >= ``threshold``.  Precision is structurally 1.0 (blocking only
    restricts candidates; every reported pair is exact-cosine-verified);
    ``n_assign=2`` recovers the Voronoi-boundary pairs single assignment
    misses (measured recall 0.868 -> 1.000 on the clustered-twins audit)
    for 2x index rows.  A pair sharing several cells is deduped by id.

    Plan shape: the assignment (broadcast product + window) feeds both
    sides of the self-join, so the blocks frame is eagerly
    localCheckpoint-ed — without it the O(n*k) scan re-executes per side
    (the semdedup discipline).  Pairs are scored INSIDE the salted
    bucket self-join with per-row precomputed L2 norms (the exact
    ``cosine`` expression tree, so values are bit-identical), then the
    few surviving (id_1, id_2, cos_sim) rows are distinct-ed — a pair
    sharing several cells re-scores to the identical double, so the
    distinct collapses it.  A round-13 re-measure replaced the earlier
    fetch-back form (dedup candidate ids, re-join vectors): the
    checkpointed vector frame carries no size stats, so the attach
    joins planned as sort-merge and AQE coalesced the compute-dense
    scoring to ~3 tasks (pair-id bytes massively understate per-pair
    dot cost); in-join scoring moves zero embedding bytes after the
    join and inherits the salted join's width.

    Returns distinct (id_1, id_2, cos_sim)."""
    from dipper_spark.functions.vectors import dot, dot_unrolled, l2_norm

    # known-dim datasets get the codegen'd unrolled dot for the per-pair
    # scoring (bit-identical; see functions.vectors.dot_unrolled)
    _dot = (lambda x, y: dot_unrolled(x, y, dim)) if dim else dot
    blocks = (
        assign_buckets_multi(vectors, centroids, n_assign)
        .select("vec_id", "bucket", "embedding", l2_norm("embedding").alias("_n"))
        .localCheckpoint(eager=True)
    )
    # Score INSIDE the salted bucket self-join (the oracle's own shape).
    # The former fetch-back form deduped candidate ids first and re-joined
    # the vectors — but the checkpointed vector frame has no size stats
    # (ExistingRDD), so both attach joins planned as SORT-MERGE and AQE
    # coalesced the compute-dense scoring to ~3 tasks at sf0.1 (pair ids
    # are 16 B/row; AQE sizes by bytes, not by the dim-length dot each
    # pair pays).  Scoring in-join costs at most n_assign dots per pair
    # (a pair sharing cells is re-scored per cell — identical doubles, so
    # the post-filter distinct collapses them) and moves ZERO embedding
    # bytes after the join: only surviving (id, id, cos) rows reach the
    # distinct.  The b-side salt explodes each row ``_SALT_K`` ways so the
    # few-distinct-bucket key (guide §2.5 hot keys) spreads to
    # n_buckets x _SALT_K join partitions; a-side salt is derived
    # deterministically from id_1, so every pair still meets exactly once.
    a = blocks.select(
        F.col("vec_id").alias("id_1"), F.col("embedding").alias("e1"),
        "bucket", F.col("_n").alias("_n1"),
        F.pmod(F.xxhash64("vec_id"), F.lit(_SALT_K)).alias("_salt"),
    )
    # explicit partition count pins the scoring width: AQE coalesces the
    # join's exchanges by BYTES (a few MB of pairs → ~6 tasks) while the
    # stage is compute-dense (one dim-length dot per pair).  A
    # REPARTITION_BY_NUM exchange is never coalesced, the b side must
    # match it, and the count derives from the cluster's parallelism —
    # scale-adaptive, not a local constant (guide §2.5 / §1.2).
    a = a.repartition(
        a.sparkSession.sparkContext.defaultParallelism, "bucket", "_salt"
    )
    b = blocks.select(
        F.col("vec_id").alias("id_2"), F.col("embedding").alias("e2"),
        "bucket", F.col("_n").alias("_n2"),
    ).withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT_K - 1))))
    b = b.repartition(
        b.sparkSession.sparkContext.defaultParallelism, "bucket", "_salt"
    )
    return (
        a.join(b, ["bucket", "_salt"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select(
            "id_1", "id_2",
            (_dot("e1", "e2") / (F.col("_n1") * F.col("_n2"))).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_1", "id_2", F.round("cos_sim", 6).alias("cos_sim"))
        .distinct()
    )


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x|/127, q_i =
    floor(x_i/scale + 0.5) — the memory-bandwidth lever for 100 TB vector
    search (4x smaller scans; reconstruction error bounded by scale/2 per
    component).

    Rounding is written as floor(x + 0.5) explicitly, NOT round(): SQL
    engines disagree on round-half semantics (HALF_UP vs banker's), while
    floor is floor everywhere — the oracle must reproduce every code
    bit-for-bit.  All math in double before the int cast.  Zero vectors
    quantize to zeros with scale 0.  Pure map pass, no shuffle.

    Returns (id, scale, qvec array<int>).
    """
    out = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v"))
        .withColumn(
            "scale",
            F.expr("array_max(transform(_v, x -> abs(CAST(x AS DOUBLE)))) / 127.0"),
        )
        .withColumn(
            "qvec",
            F.expr(
                "transform(_v, x -> CAST(CASE WHEN scale = 0 THEN 0"
                " ELSE floor(CAST(x AS DOUBLE) / scale + 0.5) END AS INT))"
            ),
        )
    )
    return out.select("id", "scale", "qvec")


def embedding_outliers(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    z_thresh: float = 2.0,
) -> DataFrame:
    """Per-cluster embedding outlier detection: distance to the own-label
    centroid, z-scored within the label, rows with \\|z\\| > ``z_thresh``
    returned — the embedding-QC sweep (mislabeled vectors, collapsed
    encodings, garbage inputs sit in a cluster's distance tail).

    Long relational form end-to-end: the centroid reuses
    :func:`label_centroids` (one (label, dim) shuffle, map-side partials);
    squared distance re-aggregates the same long table joined to the
    broadcast-sized centroid frame; the per-label mean/stddev window is
    over #labels groups.  No UDFs, no arrays cross the shuffle — at 100 TB
    the widest shuffle carries (id, label, dim, v) longs/doubles with
    partial aggregation, and every join's small side is labels×dims.

    Returns (id, label, dist, z) rounded to 6, outliers only.
    """
    lf = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("dim", "v"),
    ).withColumn("v", F.col("v").cast("double"))
    cent = label_centroids(df, label_col, vec_col)
    d = (
        lf.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("id", "label")
        .agg(
            F.sqrt(F.sum((F.col("v") - F.col("mean_v")) * (F.col("v") - F.col("mean_v"))))
            .alias("dist")
        )
    )
    st = d.groupBy("label").agg(
        F.avg("dist").alias("_md"), F.stddev_pop("dist").alias("_sd")
    )
    # a zero-variance label (all members equidistant — e.g. duplicates of one
    # vector) has no outliers; the division must sit under F.when (which DOES
    # guarantee conditional evaluation, unlike `&` in a filter, where ANSI
    # mode can still evaluate the divide and kill the job on DIVIDE_BY_ZERO)
    z = F.when(
        F.col("_sd") > 0, (F.col("dist") - F.col("_md")) / F.col("_sd")
    )
    return (
        d.join(F.broadcast(st), "label")
        .filter(F.abs(z) > z_thresh)
        .select(
            "id",
            "label",
            F.round("dist", 6).alias("dist"),
            F.round(z, 6).alias("z"),
        )
    )


def label_pca_spectrum(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    k: int = 2,
) -> DataFrame:
    """Top-``k`` PCA eigenvalues + variance-explained per label — the
    embedding-collapse diagnostic (a healthy cluster spreads variance
    across components; a collapsed/duplicated one concentrates ~100% in
    the first).

    This is the engine's grouped ``applyInPandas`` surface: an
    eigendecomposition is genuinely inexpressible in relational ops, so
    each label's member matrix is handed to numpy as one Arrow batch.
    Rows are sorted by id before the covariance accumulation so the float
    reduction order — and therefore the spectrum — is identical on any
    partitioning.

    Scale posture: per-group cost is O(rows·d²) and per-group memory is
    the member matrix.  For labels with billions of members, compute the
    d×d Gramian relationally instead (explode to (id, dim, v), self-join
    on id, sum v_i·v_j by (dim_i, dim_j) — one keyed shuffle of d² rows
    per vector) and eigensolve the broadcast-sized Gramian on the driver;
    d is small (embedding width), so only the member-matrix collection
    needs replacing.  Returns (label, component, eigval, var_frac).
    """
    import numpy as np
    import pandas as pd

    def spectrum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        xc = x - x.mean(axis=0, keepdims=True)
        cov = (xc.T @ xc) / max(len(x), 1)
        eig = np.linalg.eigvalsh(cov)[::-1]  # descending
        total = float(eig.sum())
        top = eig[:k]
        return pd.DataFrame(
            {
                "label": pdf[label_col].iloc[0],
                "component": np.arange(len(top), dtype=np.int32),
                "eigval": np.round(top, 6),
                "var_frac": np.round(top / total, 6) if total > 0 else 0.0,
            }
        )

    return df.groupBy(label_col).applyInPandas(
        spectrum, "label int, component int, eigval double, var_frac double"
    )


def label_pca_invariants(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Value-level PCA certificate per label: the FULL eigensolve of each
    label's covariance, reduced to three invariants a relational oracle
    can verify independently — (1) the eigenvalue sum, which must equal
    the covariance trace = Σ_dim var_pop(x_dim) (an eigensolve-free
    identity), (2) the count of non-negative eigenvalues, which must be d
    (covariance is PSD), and (3) the number of descending-order
    violations, which must be 0.  A wrong eigensolve — scaling bug, bad
    centering, truncated spectrum — breaks (1); returning garbage breaks
    (2)/(3).  Same grouped-applyInPandas shape and determinism discipline
    as ``label_pca_spectrum`` (rows sorted by id before the fold).

    Returns (label, eigval_sum UNROUNDED, n_nonneg, n_desc_violations);
    callers round eigval_sum engine-side for cross-engine compare.
    """
    import numpy as np
    import pandas as pd

    def invariants(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        xc = x - x.mean(axis=0, keepdims=True)
        cov = (xc.T @ xc) / max(len(x), 1)
        eig = np.linalg.eigvalsh(cov)[::-1]  # descending
        return pd.DataFrame(
            {
                "label": [pdf[label_col].iloc[0]],
                "eigval_sum": [float(eig.sum())],
                "n_nonneg": [int((eig >= -1e-9).sum())],
                "n_desc_violations": [int((np.diff(eig) > 1e-12).sum())],
            }
        )

    return df.groupBy(label_col).applyInPandas(
        invariants,
        "label int, eigval_sum double, n_nonneg long, n_desc_violations long",
    )


def semdedup(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    n_assign: int = 1,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    clustering embeddings, then within each cluster dropping every item
    whose cosine to ANY earlier-ranked cluster member reaches
    ``threshold``.  The paper's pseudo-code computes, per item, the max
    similarity to all earlier-sorted cluster members and drops when it
    crosses the threshold — exactly the relational rule "drop iff an
    earlier neighbor within tau exists"; no iteration, no greedy loop.
    Keep order is ascending similarity-to-centroid (the paper's reported
    best variant: among semantic duplicates keep the example FARTHEST from
    the centroid), ties by vec_id.

    Beyond-reference operator.  Scale shape: centroid assignment is one
    broadcast-product scan over the vectors (k centroids, k small); the
    pair search is the blocked self-equi-join on the bucket key (sum of
    per-bucket quadratics, AQE skew-split applies — the same blocking
    economics that make SemDeDup tractable at corpus scale in the paper);
    the verdict is a distinct + a broadcast-able anti-flag join on pair
    volume.  The assigned frame feeds three consumers, so it is eagerly
    localCheckpoint-ed — without it the O(n*k) assignment scan re-executes
    per consumer.

    ``n_assign > 1`` widens the CANDIDATE search to each vector's top-n
    centroid cells (:func:`assign_buckets_multi`) while the keep-order,
    reported bucket, and cent_cos stay the PRIMARY assignment — semantic
    duplicates split by a Voronoi edge now meet in the second-choice cell
    (measured: single-assign blocking misses 13% of planted twin pairs on
    clustered geometry; top-2 closes it, BENCH_NEARDUP_CLUSTERED_r12.json)
    at ``n_assign``x candidate-index rows.

    Returns (vec_id, bucket, cent_cos, keep).
    """
    c = F.broadcast(
        centroids.select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cent_emb"),
            l2_norm("embedding").alias("_cn"),
        )
    )
    scored = (
        ensure_parallelism(vectors)
        .select("vec_id", "embedding", l2_norm("embedding").alias("_vn"))
        .join(c, F.lit(True))
        .select(
            "vec_id", "embedding", "cent_id",
            _cos_pre("embedding", "_vn", "cent_emb", "_cn").alias("cent_cos"),
        )
    )
    assigned = (
        topk_per_group(
            scored,
            "vec_id",
            [F.col("cent_cos").desc(), F.col("cent_id").asc()],
            k=1,
        )
        .select("vec_id", "embedding", F.col("cent_id").alias("bucket"), "cent_cos")
        .localCheckpoint(eager=True)
    )
    if n_assign > 1:
        # candidate blocks = top-n cells per vector; ranks (cc) remain the
        # primary assignment's similarity-to-centroid, joined back from the
        # checkpointed frame so the expensive scan is not re-run
        prim = assigned.select("vec_id", F.col("cent_cos").alias("_cc"))
        blocks = (
            assign_buckets_multi(vectors, centroids, n_assign)
            .join(prim, "vec_id")
            .localCheckpoint(eager=True)
        )
    else:
        blocks = assigned.select(
            "vec_id", "embedding", "bucket", F.col("cent_cos").alias("_cc")
        )
    a = blocks.select(
        F.col("vec_id").alias("id_1"), F.col("embedding").alias("e1"),
        "bucket", F.col("_cc").alias("cc1"), l2_norm("embedding").alias("_n1"),
    )
    b = blocks.select(
        F.col("vec_id").alias("id_2"), F.col("embedding").alias("e2"),
        "bucket", F.col("_cc").alias("cc2"), l2_norm("embedding").alias("_n2"),
    )
    dropped = (
        a.join(b, "bucket")
        .filter(
            (F.col("cc1") < F.col("cc2"))
            | ((F.col("cc1") == F.col("cc2")) & (F.col("id_1") < F.col("id_2")))
        )
        .filter(_cos_pre("e1", "_n1", "e2", "_n2") >= threshold)
        .select(F.col("id_2").alias("vec_id"))
        .distinct()
        .withColumn("keep", F.lit(False))
    )
    return assigned.join(dropped, "vec_id", "left").select(
        "vec_id",
        "bucket",
        F.round("cent_cos", 6).alias("cent_cos"),
        F.coalesce("keep", F.lit(True)).alias("keep"),
    )


# ---- product quantization (Jegou et al. 2011) --------------------------------


def _l2_normalize(vec: Column | str) -> Column:
    from dipper_spark.functions.vectors import l2_norm

    v = F.col(vec) if isinstance(vec, str) else vec
    n = l2_norm(v)
    return F.transform(v, lambda e: e.cast("double") / n)


def pq_codebooks(
    vectors: DataFrame,
    n_sub: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    normalize: bool = True,
    code_offset: int = 0,
) -> DataFrame:
    """Deterministic product-quantization codebooks: codeword ``j`` of
    subspace ``s`` is the (offset+j)-th corpus vector's L2-normalized
    slice — the per-subspace analog of the IVF 'first-k' centroid
    convention (SQL-oracle-mirrorable; a production build would
    Lloyd-refine each subspace independently with ``kmeans_centroids``
    on the slices).

    ``vec_col``/``normalize=False`` train on an arbitrary vector column
    as-is — the RESIDUAL mode (:func:`ivf_residuals`): residual vectors
    are small and not unit-norm, so normalizing their sampled codewords
    would inflate every codeword to the sphere and destroy the magnitude
    information the residual codes exist to carry.  ``code_offset`` must
    then skip the coarse-centroid sample rows: a 'first-k' centroid's
    own residual is exactly ZERO (it assigns to itself), so sampling
    codewords from vec_id < n_codes would yield an all-zero codebook
    that decodes every vector to its centroid (measured: recall 0.0).

    Returns (s, code, sub: array<double>) — n_sub x n_codes rows, always
    broadcast-sized regardless of corpus size."""
    sub_dim = dim // n_sub
    x = _l2_normalize(vec_col) if normalize else F.transform(
        F.col(vec_col), lambda e: e.cast("double")
    )
    base = vectors.filter(
        (F.col("vec_id") >= code_offset)
        & (F.col("vec_id") < code_offset + n_codes)
    ).select((F.col("vec_id") - F.lit(code_offset)).alias("code"), x.alias("_x"))
    return base.select(
        "code", F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("s"), "_x"
    ).select(
        "s", "code", F.slice("_x", F.col("s") * sub_dim + 1, sub_dim).alias("sub")
    )


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    n_sub: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    normalize: bool = True,
    objective: str = "ip",
) -> DataFrame:
    """Encode each vector as ``n_sub`` one-byte codes.  Per subspace:

    - ``objective='ip'`` — the codeword maximizing the (exact-double)
      inner product with the vector's slice: maximum-inner-product
      quantization, matching the ADC scoring objective for unit vectors.
    - ``objective='l2'`` — the codeword minimizing squared L2 distance to
      the slice, ranked as ``dot(x,c) - 0.5*dot(c,c)`` DESC (the argmin
      of ||x-c||^2 with the per-vector constant ||x||^2 dropped): the
      correct reconstruction objective for RESIDUAL vectors, whose norms
      vary — max-IP would always pick the largest-norm codeword.

    Ties break to the lowest code id.  Shape at 100 TB: the codebook
    (n_sub x n_codes rows) broadcasts; the argmax is a map-side max_by
    per (vec_id, s) — the corpus shuffles only (vec_id, s, code) integer
    triples, a ~dim/n_sub compression of the embedding column.
    Returns (vec_id, s, code)."""
    from dipper_spark.functions.vectors import dot

    sub_dim = dim // n_sub
    x = _l2_normalize(vec_col) if normalize else F.transform(
        F.col(vec_col), lambda e: e.cast("double")
    )
    sliced = ensure_parallelism(vectors).select(
        "vec_id", x.alias("_x")
    ).select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("s"),
        "_x",
    ).select(
        "vec_id", "s", F.slice("_x", F.col("s") * sub_dim + 1, sub_dim).alias("xs")
    )
    if objective == "l2":
        # the 0.5*||c||^2 term depends only on the CODEBOOK row: computed
        # once per codeword on the dictionary-sized frame (bit-identical —
        # same double, same subtraction) instead of per (slice, code) pair
        codebooks = codebooks.withColumn(
            "_c2", F.lit(0.5) * dot("sub", "sub")
        )
        score = lambda c: dot(F.col("xs"), c["sub"]) - c["_c2"]  # noqa: E731
        entry = F.struct(
            F.col("code").alias("code"), F.col("sub").alias("sub"),
            F.col("_c2").alias("_c2"),
        )
    elif objective == "ip":
        score = lambda c: dot(F.col("xs"), c["sub"])  # noqa: E731
        entry = F.struct(F.col("code").alias("code"), F.col("sub").alias("sub"))
    else:
        raise ValueError(f"unknown pq_encode objective: {objective!r}")
    # argmax as an ARRAY FOLD over the per-subspace codeword array (the
    # assign_buckets discipline): the codebook collapses to n_sub broadcast
    # rows each carrying a code-sorted struct array, and the winning code is
    # array_max over struct(ip, -code, code) — the exact comparison order
    # of the former max(struct) hash aggregation, so codes are identical,
    # while the corpus x n_codes joined rows and the corpus-sized
    # aggregation exchange disappear (this is the encode hot path:
    # profiled 31.8s -> 17.2s task time from the _c2 hoist alone, the
    # remaining cost was row materialization + the agg)
    cb_arr = F.broadcast(
        codebooks.select("s", entry.alias("_e"))
        .groupBy("s")
        .agg(F.sort_array(F.collect_list("_e")).alias("_cbs"))
    )
    best = lambda c: F.struct(  # noqa: E731
        score(c).alias("ip"), (-c["code"]).alias("nc"), c["code"].alias("code")
    )
    return (
        sliced.join(cb_arr, "s")
        .select(
            "vec_id", "s",
            F.array_max(F.transform("_cbs", best)).alias("_t"),
        )
        .select("vec_id", "s", F.col("_t.code").alias("code"))
    )


def pq_codebooks_refined(
    vectors: DataFrame,
    n_sub: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    normalize: bool = True,
    n_iter: int = 1,
    code_offset: int = 0,
    grid: int = 1 << 20,
) -> DataFrame:
    """Lloyd-refined product-quantization codebooks — the FAISS PQ training
    step (k-means per subspace, Jegou et al. 2011 §II.C), fully relational.

    Starts from the deterministic sampled codebook (:func:`pq_codebooks`)
    and runs ``n_iter`` Lloyd iterations per subspace: assign every slice
    to its min-L2 codeword (the ``objective='l2'`` ranking), then recompute
    each codeword as the member mean.  Measured necessity (numpy prototype
    + BENCH_ANN_CLUSTERED): sampled codebooks leave ADC recall@5 below
    0.1 on clustered geometry at any capacity; Lloyd training is what
    makes the codes resolve within-cell ranking.

    Each iteration costs one broadcast-join window (the encode) plus one
    (s, code, dim) hash-agg — both map-side-combining, corpus-scan-shaped;
    the codebook never exceeds n_sub x n_codes rows.  Codes that lose all
    members drop out of the GROUP BY on both engines (the kmeans empty-
    bucket convention).

    Oracle-determinism: the member mean quantizes each component to the
    ``grid`` (2^20) and divides an exact BIGINT sum — ``(sum(q)/n)/grid``
    with that exact parenthesization on both engines — so codewords are
    partition-layout-invariant and a SQL oracle reproduces them bit-for-bit
    (docs/ORACLE_DETERMINISM.md discipline; a raw avg() over doubles would
    drift with shuffle order and flip argmin code assignments)."""
    from dipper_spark.functions.vectors import dot

    sub_dim = dim // n_sub
    g = float(grid)
    cb = pq_codebooks(
        vectors, n_sub, n_codes, dim, vec_col, normalize, code_offset
    )
    x = _l2_normalize(vec_col) if normalize else F.transform(
        F.col(vec_col), lambda e: e.cast("double")
    )
    sliced = ensure_parallelism(vectors).select(
        "vec_id", x.alias("_x")
    ).select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("s"),
        "_x",
    ).select(
        "vec_id", "s", F.slice("_x", F.col("s") * sub_dim + 1, sub_dim).alias("xs")
    )
    # the slice frame feeds every iteration: materialize once (eager —
    # lazy localCheckpoint would re-derive it per consumer stage)
    sliced = sliced.localCheckpoint(eager=True)
    for _ in range(n_iter):
        # argmax as an array fold over the code-sorted per-subspace
        # codeword array (the pq_encode/assign_buckets discipline):
        # struct(ip, -code, code) under array_max reproduces the former
        # max(struct) hash aggregation's comparison order exactly, with
        # 0.5*||c||^2 precomputed per codeword — bit-identical codes, no
        # per-pair row materialization, no aggregation exchange
        cb_arr = F.broadcast(
            cb.withColumn("_c2", F.lit(0.5) * dot("sub", "sub"))
            .select(
                "s",
                F.struct(
                    F.col("code").alias("code"), F.col("sub").alias("sub"),
                    F.col("_c2").alias("_c2"),
                ).alias("_e"),
            )
            .groupBy("s")
            .agg(F.sort_array(F.collect_list("_e")).alias("_cbs"))
        )
        _best = lambda c: F.struct(  # noqa: E731
            (dot(F.col("xs"), c["sub"]) - c["_c2"]).alias("ip"),
            (-c["code"]).alias("nc"),
            c["code"].alias("code"),
        )
        enc = (
            sliced.join(cb_arr, "s")
            .select(
                "vec_id", "s",
                F.array_max(F.transform("_cbs", _best)).alias("_t"),
            )
            .select("vec_id", "s", F.col("_t.code").alias("code"))
        )
        # codeword re-estimation as ONE aggregation (the kmeans_centroids
        # fold): per-dim grid-snapped sums under a single groupBy(s, code)
        # instead of posexplode → groupBy(s, code, dim) → collect_list
        # re-assembly — one exchange of dictionary-sized partial rows per
        # iteration instead of two, no sub_dim x row blowup.  Each dim's
        # value is (sum(_q)/count)/g with _q an exact LONG sum, so the
        # result is bit-identical to the exploded form regardless of
        # accumulation order.
        _qi = lambda i: F.floor(  # noqa: E731
            F.col("xs")[i] * F.lit(g) + F.lit(0.5)
        ).cast("long")
        cb = (
            sliced.join(enc, ["vec_id", "s"])
            .groupBy("s", "code")
            .agg(
                *[
                    (
                        (F.sum(_qi(i)).cast("double") / F.count(F.lit(1)))
                        / F.lit(g)
                    ).alias(f"_m{i}")
                    for i in range(sub_dim)
                ]
            )
            .select(
                "s", "code",
                F.array(*[F.col(f"_m{i}") for i in range(sub_dim)]).alias("sub"),
            )
        )
        # codebook is n_sub x n_codes rows but its lazy plan embeds every
        # previous iteration — truncate like kmeans_centroids
        cb = cb.localCheckpoint(eager=False)
    # returned codebook has several concurrent consumers (encode pass,
    # query distance-table build); a lazy checkpoint does not dedupe across
    # concurrent stages, so each would re-run the Lloyd passes — one eager
    # materialization of the dictionary-sized table (kmeans_centroids
    # discipline)
    return cb.localCheckpoint(eager=True)


def ivf_residuals(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Coarse-assign each vector and return its RESIDUAL — the FAISS IVFADC
    discipline (Jegou et al. 2011 §IV.A): ``r = x_hat - c_hat(bucket)``
    where both the vector and its assigned centroid are L2-normalized.
    PQ codes trained/encoded on residuals resolve WITHIN-cluster
    differences — the information raw-vector codes collapse on clustered
    geometry (measured: ADC recall@5 ~0.07 flat on the 32-topic mixture,
    BENCH_ANN_CLUSTERED_r11.json).

    Centroids broadcast twice (assignment max-cosine, then the normalized
    centroid lookup); the subtraction is one zip_with map pass.  Returns
    (vec_id, bucket, cn: array<double> normalized centroid,
    rx: array<double> residual)."""
    assigned = assign_buckets(vectors, centroids)
    cn = F.broadcast(
        centroids.select(
            F.col("vec_id").alias("bucket"), _l2_normalize("embedding").alias("cn")
        )
    )
    return assigned.join(cn, "bucket").select(
        "vec_id",
        "bucket",
        "cn",
        F.zip_with(
            _l2_normalize("embedding"), F.col("cn"), lambda a, b: a - b
        ).alias("rx"),
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_sub: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    k: int = 5,
) -> DataFrame:
    """PQ-ADC approximate top-k by inner product: full-precision queries
    against the quantized corpus (asymmetric distance computation).

    The corpus is reconstructed from its codes (ordered concat of codeword
    slices) and scored with ONE sequential array fold dot(q, decode(x)) —
    mathematically identical to the classic per-subspace lookup-table sum
    (dot distributes over the concatenation) but ORDER-DETERMINISTIC in
    IEEE double, so a SQL oracle reproduces every score bit-for-bit; a
    throughput build would use the n_sub x n_codes LUT + code-indexed adds
    (and the Arrow batch path) instead of materializing the decoded array.

    Scale shape: codebooks and the query set broadcast; the quantized
    corpus is the only big frame — n_sub small ints per vector (a 16x
    compression of a 64-dim float32 column, the point of PQ at 100 TB) —
    and the final top-k is a per-query TakeOrdered.  true_cos is joined
    back for the k result rows only (the audit column never touches the
    full corpus).  Returns (query_id, neighbor_id, approx_ip, true_cos,
    rank)."""
    from dipper_spark.functions.vectors import dot

    cb = pq_codebooks(corpus, n_sub, n_codes, dim)
    codes = pq_encode(corpus, cb, n_sub, dim)
    recon = (
        codes.join(F.broadcast(cb), ["s", "code"])
        .groupBy("vec_id")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("s", "sub"))),
                    lambda t: t["sub"],
                )
            ).alias("ax")
        )
    )
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"), _l2_normalize("embedding").alias("qx")
        )
    )
    scored = q.join(recon, F.col("query_id") != F.col("vec_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        dot("qx", "ax").alias("ip"),
        "qx",
    )
    top = topk_per_group(
        scored,
        "query_id",
        [F.col("ip").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    )
    nb = corpus.select(
        F.col("vec_id").alias("neighbor_id"), _l2_normalize("embedding").alias("nx")
    )
    return nb.join(F.broadcast(top), "neighbor_id").select(
        "query_id",
        "neighbor_id",
        F.round("ip", 6).alias("approx_ip"),
        F.round(dot("qx", "nx"), 6).alias("true_cos"),
        F.col("rank").cast("long").alias("rank"),
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_centroids: int = 16,
    n_sub: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    k: int = 5,
    nprobe: int = 1,
    residual: bool = True,
    pq_iters: int = 1,
) -> DataFrame:
    """The composed production ANN stack (FAISS's IVF+PQ architecture,
    Jegou et al. 2011 §IV): a coarse quantizer restricts the search to
    the query's IVF bucket, a product quantizer compresses what gets
    scanned inside it — scan cost drops ~n_centroids-fold AND each
    scanned vector is 4 bytes of codes, which is how a 100 TB embedding
    store becomes searchable on a RAM-scale cluster.

    Deterministic throughout (first-k centroids + first-k per-subspace
    codebooks, exact-double cosine assignment, order-deterministic ADC
    via decode-dot), so a SQL oracle reproduces bucket membership, codes,
    and every score.

    ``residual=True`` (default) is the full IVFADC discipline: codes
    quantize ``x_hat - c_hat(bucket)`` (:func:`ivf_residuals`), codebooks
    are sampled residual slices, encoding minimizes reconstruction L2,
    and ADC scores ``q · (c_hat + decode(codes))`` — the centroid carries
    the cluster-level signal exactly while the codes spend their 8 bits
    on WITHIN-cluster differences.  Measured necessity
    (BENCH_ANN_CLUSTERED_r11.json / docs/ANN_TRADEOFF.md): raw-vector
    codes collapse to ~0.07 recall@5 on clustered geometry because every
    candidate in a probed cell decodes to ~the cluster direction.
    ``residual=False`` keeps the raw-vector variant for comparison.
    Note the codebook stays SHARED across buckets (one broadcast table,
    not per-bucket codebooks) — sampled residuals are cluster-agnostic
    noise directions, so sharing loses little and keeps the broadcast
    economics.

    Returns (query_id, neighbor_id, bucket, approx_ip, rank).
    """
    cents = corpus.filter(F.col("vec_id") < n_centroids).select(
        "vec_id", "embedding"
    )
    if residual:
        index = ivfpq_index(
            corpus, cents, n_sub=n_sub, n_codes=n_codes, dim=dim,
            pq_iters=pq_iters, n_centroids=n_centroids,
        )
        return ivfpq_search(queries, index, n_sub=n_sub, dim=dim, k=k, nprobe=nprobe)
    # legacy raw-vector variant: quantize the vectors themselves with
    # max-IP sampled codebooks (the r11 configuration, kept for the
    # measured baseline comparisons in tools/bench_ann.py)
    assigned = assign_buckets(corpus, cents).select("vec_id", "bucket")
    cb = pq_codebooks(corpus, n_sub, n_codes, dim)
    codes = pq_encode(corpus, cb, n_sub, dim)
    recon = (
        codes.join(F.broadcast(cb), ["s", "code"])
        .groupBy("vec_id")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("s", "sub"))),
                    lambda t: t["sub"],
                )
            ).alias("ax")
        )
    )
    quantized = assigned.join(recon, "vec_id")
    return _ivfpq_score(queries, cents, quantized, k=k, nprobe=nprobe)


def ivfpq_index(
    corpus: DataFrame,
    centroids: DataFrame,
    n_sub: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    pq_iters: int = 1,
    n_centroids: int | None = None,
) -> dict[str, DataFrame]:
    """TRAIN the residual IVFADC index — the expensive, train-once half of
    the stack, returning the four parquet-ready state tables a deployment
    persists (the model-store artifact shape, io/model_store.py):

    - ``centroids`` (vec_id, embedding) — the coarse quantizer,
    - ``codebooks`` (s, code, sub) — Lloyd-refined residual codewords,
    - ``codes`` (vec_id, s, code) — the quantized corpus, n_sub small
      ints per vector: THE index payload, ~16x smaller than float32,
    - ``buckets`` (vec_id, bucket) — the coarse assignment.

    Everything is deterministic (offset-sampled init, exact-integer Lloyd
    means, min-L2 encoding), so an index rebuilt from the same corpus —
    or re-derived by the SQL oracle — is bit-identical."""
    res = ivf_residuals(corpus, centroids)
    if n_centroids is None:  # codebook sample offset must skip centroid rows
        n_centroids = centroids.count()
    if pq_iters > 0:
        cb = pq_codebooks_refined(
            res, n_sub, n_codes, dim, vec_col="rx", normalize=False,
            n_iter=pq_iters, code_offset=n_centroids,
        )
    else:
        cb = pq_codebooks(
            res, n_sub, n_codes, dim, vec_col="rx", normalize=False,
            code_offset=n_centroids,
        )
    codes = pq_encode(
        res, cb, n_sub, dim, vec_col="rx", normalize=False, objective="l2"
    )
    return {
        "centroids": centroids,
        "codebooks": cb,
        "codes": codes,
        "buckets": res.select("vec_id", "bucket"),
    }


def ivfpq_search(
    queries: DataFrame,
    index: dict[str, DataFrame],
    n_sub: int = 4,
    dim: int = 64,
    k: int = 5,
    nprobe: int = 1,
) -> DataFrame:
    """SEARCH a (possibly stored) residual IVFADC index — the cheap,
    apply-many half: reconstruct ``ax = c_hat(bucket) + decode(codes)``
    from the state tables (codebooks/centroids broadcast; the codes table
    is the only corpus-sized frame) and score probed buckets with the
    asymmetric distance.  Feeding :func:`ivfpq_index`'s live output
    reproduces ``ivfpq_topk(residual=True)`` exactly; feeding the
    model-store round-trip of those tables is the steady-state query path
    (q_ann_ivfpq_stored)."""
    cents = index["centroids"]
    cn = F.broadcast(
        cents.select(
            F.col("vec_id").alias("bucket"), _l2_normalize("embedding").alias("cn")
        )
    )
    recon = (
        index["codes"].join(F.broadcast(index["codebooks"]), ["s", "code"])
        .groupBy("vec_id")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("s", "sub"))),
                    lambda t: t["sub"],
                )
            ).alias("dr")
        )
    )
    quantized = (
        index["buckets"]
        .join(recon, "vec_id")
        .join(cn, "bucket")
        .select(
            "vec_id",
            "bucket",
            F.zip_with("cn", "dr", lambda a, b: a + b).alias("ax"),
        )
    )
    return _ivfpq_score(queries, cents, quantized, k=k, nprobe=nprobe)


def ivfpq_index_append(
    new_vectors: DataFrame,
    index: dict[str, DataFrame],
    n_sub: int = 4,
    dim: int = 64,
) -> dict[str, DataFrame]:
    """APPEND new vectors to a trained residual IVFADC index WITHOUT
    retraining — the FAISS ``add()`` discipline: the coarse quantizer and
    the residual codebooks are FROZEN, so appending is pure apply work
    (coarse-assign against the stored centroids, min-L2 encode the
    residuals against the stored codebooks) and every existing code stays
    valid.  This is how a 100 TB deployment absorbs daily embedding
    shards: train once on the first snapshot, append every later shard at
    scan speed, retrain only when drift audits say the quantizer has
    staled.

    Because PQ encoding is row-wise, ``append(delta, index_on(base))``
    produces exactly the codes that encoding ``base ∪ delta`` against the
    same frozen codebooks would — the property the q_ann_index_append
    oracle pins (train CTEs restricted to the base shard, encode over the
    full corpus).

    Returns the same four-table index dict with ``codes`` and ``buckets``
    extended; ``centroids``/``codebooks`` pass through untouched."""
    # the delta residual frame feeds both the encode and the buckets
    # union, so its assignment runs once per consumer (2x) — deliberately
    # NOT checkpointed: the apply-only plan lock
    # (test_ann_index_append_is_apply_only) asserts zero ExistingRDD scans
    # so training residue can never hide in this plan, and the duplicate
    # delta-assign costs ~0.2 s wall at sf0.1 vs losing that lock's
    # discrimination (OPTIMIZATION_r13.md)
    res = ivf_residuals(new_vectors, index["centroids"])
    new_codes = pq_encode(
        res, index["codebooks"], n_sub, dim, vec_col="rx", normalize=False,
        objective="l2",
    )
    return {
        "centroids": index["centroids"],
        "codebooks": index["codebooks"],
        "codes": index["codes"].select("vec_id", "s", "code").unionByName(
            new_codes.select("vec_id", "s", "code")
        ),
        "buckets": index["buckets"].select("vec_id", "bucket").unionByName(
            res.select("vec_id", "bucket")
        ),
    }


def _ivfpq_score(
    queries: DataFrame,
    cents: DataFrame,
    quantized: DataFrame,
    k: int = 5,
    nprobe: int = 1,
) -> DataFrame:
    """Shared ADC scoring tail: probe-assign the queries (single or
    multi-probe), broadcast them onto the quantized corpus restricted to
    the probed buckets, rank by the exact-double decode-dot."""
    if nprobe <= 1:
        qa = (
            assign_buckets(queries, cents)
            .select(F.col("vec_id").alias("query_id"), "embedding", "bucket")
            .select(
                "query_id", _l2_normalize("embedding").alias("qx"), "bucket"
            )
        )
    else:
        # multi-probe: each query fans out to its nprobe closest coarse
        # buckets — same recall/throughput knob as ivf_topk, same
        # (cos desc, bucket asc) deterministic centroid ranking
        c = F.broadcast(
            cents.select(
                F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cent_emb"),
            )
        )
        q_scored = queries.join(c, F.lit(True)).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("cent_id").alias("bucket"),
            cosine("embedding", "cent_emb").alias("cent_cos"),
        )
        qa = topk_per_group(
            q_scored,
            "query_id",
            [F.col("cent_cos").desc(), F.col("bucket").asc()],
            k=nprobe,
        ).select("query_id", _l2_normalize("q_emb").alias("qx"), "bucket")
    from dipper_spark.functions.vectors import dot

    scored = (
        F.broadcast(qa)
        .join(quantized, "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "bucket",
            dot("qx", "ax").alias("ip"),
        )
    )
    return topk_per_group(
        scored,
        "query_id",
        [F.col("ip").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    ).select(
        "query_id",
        "neighbor_id",
        F.col("bucket").cast("long").alias("bucket"),
        F.round("ip", 6).alias("approx_ip"),
        F.col("rank").cast("long").alias("rank"),
    )


def ivfpq_refine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_centroids: int = 16,
    n_sub: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    k: int = 5,
    nprobe: int = 1,
    shortlist: int | None = None,
    residual: bool = True,
    pq_iters: int = 1,
    index: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """IVF+PQ with an EXACT re-rank stage — FAISS's refine discipline
    (IndexRefineFlat over IVFADC): the ADC scan produces a ``shortlist``
    of candidates per query, then the ORIGINAL vectors of just those
    candidates are fetched and scored exactly, and the true top-k is
    taken from the refined scores.

    ``shortlist=None`` (default) scales it as ``50 * nprobe`` — the
    configuration the measured operating curve prescribes
    (docs/ANN_TRADEOFF.md finding #4: a FIXED shortlist stays flat as
    nprobe grows because picking 50 of nprobe·bucket candidates with
    4-bit scores loses what the extra probes bought; at 50·nprobe the
    refined stack tracks the exact-in-bucket IVF curve at ~85-88%
    capture).  Pass an int to pin it.

    Why it exists, measured (BENCH_ANN_r10.json / docs/ANN_TRADEOFF.md):
    on unstructured unit vectors the 4x4-bit ADC scores are quantization-
    limited — recall@5 sits at ~0.12 REGARDLESS of nprobe, because extra
    probed buckets only add candidates the coarse codes cannot rank.  The
    refine stage converts that noisy shortlist into exact ranks at the
    cost of ``shortlist`` full-precision dot products per query — the
    candidate-generation/verify split every other 100 TB family in this
    repo uses (LSH banding -> exact Jaccard; pigeonhole -> exact
    Hamming).

    The shortlist join touches ``queries x shortlist`` rows of the
    corpus — at 100 TB that is the point: full vectors are read for a
    few dozen ids per query instead of the whole probed bucket.

    Returns (query_id, neighbor_id, cos_sim, rank) — same contract as
    :func:`cosine_topk`, so recall audits swap in directly.
    """
    if shortlist is None:
        shortlist = 50 * nprobe
    # a shortlist narrower than k would silently under-return: the refine
    # can only rank what the ADC stage surfaces
    shortlist = max(shortlist, k)
    if index is not None:
        # pre-trained state tables (ivfpq_index live output, a model-store
        # round-trip, or the in-session shared cache): the shortlist comes
        # from ivfpq_search — no training stages in this call's plan
        cand = ivfpq_search(
            queries, index, n_sub=n_sub, dim=dim, k=shortlist, nprobe=nprobe
        ).select("query_id", "neighbor_id")
    else:
        cand = ivfpq_topk(
            queries, corpus, n_centroids=n_centroids, n_sub=n_sub,
            n_codes=n_codes, dim=dim, k=shortlist, nprobe=nprobe,
            residual=residual, pq_iters=pq_iters,
        ).select("query_id", "neighbor_id")
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    refined = (
        cand.join(c, "neighbor_id")
        .join(q, "query_id")
        .select(
            "query_id", "neighbor_id", cosine("q_emb", "c_emb").alias("cos_sim")
        )
    )
    return topk_per_group(
        refined,
        "query_id",
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    ).select(
        "query_id",
        "neighbor_id",
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("long").alias("rank"),
    )
