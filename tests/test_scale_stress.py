"""Skew stress: the hot-key prunes must keep candidate volume linear when
EVERY document shares boilerplate — the exact pathology that makes unpruned
inverted-index self-joins quadratic at corpus scale.

60k documents, all opening with the same 12-token boilerplate; 1000 planted
identical-body pairs.  Unpruned, the boilerplate shingles alone would mint
~1.8e9 candidate rows (60k choose 2) — the job that never finishes at
100 TB.  With the doc-frequency prune the candidate set is EXACTLY the
planted pairs."""

import pytest
from pyspark.sql import functions as F


N_DOCS = 60_000
N_PAIRS = 1_000
BOILER = " ".join(f"boiler{i}" for i in range(12))


@pytest.fixture(scope="module")
def skewed_docs(spark):
    # pair p occupies ids 2p and 2p+1 with identical bodies; the rest unique
    def body(i):
        key = i // 2 if i < 2 * N_PAIRS else i + 10**6
        return " ".join(f"tok{key}w{j}" for j in range(10))

    rows = [(i, BOILER + " " + body(i)) for i in range(N_DOCS)]
    return spark.createDataFrame(rows, ["doc_id", "text"]).repartition(32).cache()


def test_pruned_candidate_volume_is_linear(spark, skewed_docs):
    from dipper_spark.functions.text import tokens, word_shingles

    sh = skewed_docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(word_shingles(tokens("text"), 3))).alias("shingle"),
    )
    hot = (
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("d"))
        .filter(F.col("d") > 50).select("shingle")
    )
    kept = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a, b = kept.alias("a"), kept.alias("b")
    n_cand = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .select("a.id", "b.id").distinct().count()
    )
    # candidates = exactly the planted pairs; the 1.8e9-row boilerplate
    # cross-product never exists
    assert n_cand == N_PAIRS


def test_jaccard_pruned_finds_planted_pairs_at_60k(spark, skewed_docs):
    from dipper_spark.operators.dedup import jaccard_pairs

    out = jaccard_pairs(
        skewed_docs, "doc_id", "text", n=3, threshold=0.9, max_doc_freq=50
    ).collect()
    pairs = {(r.id_1, r.id_2) for r in out}
    assert pairs == {(2 * p, 2 * p + 1) for p in range(N_PAIRS)}
    # identical docs: boilerplate is pruned from the INDEX but the verify
    # runs on FULL sets, so the surfaced value is the true 1.0
    assert all(r.jaccard == 1.0 for r in out)


def test_strip_boilerplate_at_60k(spark, skewed_docs):
    from dipper_spark.operators.cleaning import strip_boilerplate_chunks

    out = strip_boilerplate_chunks(
        skewed_docs, "doc_id", "text", chunk_tokens=10, max_doc_freq=50
    )
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_dropped").alias("dropped"),
        F.sum(F.when(F.col("clean_text").contains("boiler0"), 1).otherwise(0)).alias("leaks"),
    ).collect()[0]
    assert agg.n == N_DOCS
    # the 10-token boilerplate-prefix chunk is hot in every doc -> dropped
    # exactly once per doc; no clean text retains it
    assert agg.dropped == N_DOCS
    assert agg.leaks == 0


def test_source_quota_mega_source_salted_equivalence(spark):
    # one mega-source (59k docs) + two tiny ones: the salted two-phase
    # selection must pick EXACTLY the rows the naive single-window form
    # picks (quota-smallest md5 hashes per source), while fanning the
    # mega-source's sort over n_salts parallel cells instead of one task.
    from pyspark.sql import Window

    from dipper_spark.operators.sampling import source_quota

    rows = [(i, "mega" if i < 59_000 else ("s1" if i % 2 else "s2"), f"d{i}")
            for i in range(60_000)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"]).repartition(32)

    got = {(r.source, r.doc_id) for r in source_quota(df, "doc_id", "source", 40).collect()}

    k = F.col("doc_id")
    naive = df.withColumn(
        "_r",
        F.row_number().over(
            Window.partitionBy("source").orderBy(F.md5(k.cast("string")), k)
        ),
    ).filter(F.col("_r") <= 40)
    want = {(r.source, r.doc_id) for r in naive.collect()}
    assert got == want
    assert len(got) == 40 + 40 + 40


def test_salted_topk_mega_group_equivalence(spark):
    # the generic helper: heavy-hitter counts with one dominant group and
    # adversarial ties — salted two-phase output must be row-for-row the
    # single-window answer under the same total order.
    from pyspark.sql import Window

    from dipper_spark.operators.windows import salted_topk_per_group

    # group "hot" has 50k distinct items with counts folding to many ties
    rows = [("hot", f"item{i}", (i % 97) + 1) for i in range(50_000)]
    rows += [("cold", f"c{i}", i + 1) for i in range(20)]
    df = spark.createDataFrame(rows, ["grp", "item", "n"]).repartition(32)

    order = [F.desc("n"), F.col("item")]
    got = [
        (r.grp, r.item, r.n, r.rank)
        for r in salted_topk_per_group(df, "grp", order, 5, salt_on=F.col("item"),
                                       keep_rank=True)
        .orderBy("grp", "rank").collect()
    ]
    naive = (
        df.withColumn("rank", F.row_number().over(
            Window.partitionBy("grp").orderBy(*order)))
        .filter(F.col("rank") <= 5).orderBy("grp", "rank")
    )
    want = [(r.grp, r.item, r.n, r.rank) for r in naive.collect()]
    assert got == want


def test_semdedup_planted_clusters_at_20k(spark):
    """SemDeDup at 20k vectors over 16 buckets: every document direction
    belongs to one of 16x16 planted duplicate groups (identical members),
    adjacent groups are separated far enough to stay below tau — so the
    verdict must keep EXACTLY one survivor per group (min vec_id on the
    cent_cos tie), dropping the other ~78 members of each.  The pair
    search stays the per-bucket equi-join — no global pair explosion."""
    import math

    from dipper_spark.operators.similarity import semdedup

    n, k, n_dirs = 20_000, 16, 16

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    cents = [(i, unit(i * (2 * math.pi / k))) for i in range(k)]
    rows = []
    for i in range(n):
        b, d = i % k, (i // k) % n_dirs
        # 16 directions fanned +-0.15 rad around centroid b: within-group
        # cos = 1 (identical), adjacent-group cos = cos(0.02) ~ 0.9998 < tau
        theta = b * (2 * math.pi / k) + (d - (n_dirs - 1) / 2) * 0.02
        rows.append((100 + i, unit(theta)))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cent_df = spark.createDataFrame(cents, ["vec_id", "embedding"])

    out = semdedup(emb, cent_df, threshold=0.9999).collect()
    assert len(out) == n
    kept = {r.vec_id for r in out if r.keep}
    # one survivor per (bucket, direction) group: the min vec_id,
    # i.e. ids 100..355 (i = b + 16*d for all b, d)
    assert kept == {100 + r for r in range(k * n_dirs)}


def test_dsir_weights_scale_and_invariance(spark):
    """DSIR at 30k raw docs: one row per doc out (the scan is linear, no
    pair joins), weights partition-invariant, and the planted target-like
    stratum outranks the disjoint-vocab stratum."""
    from dipper_spark.operators.sampling import dsir_logratio

    target = spark.createDataFrame(
        [(10**6 + i, "alpha beta gamma delta " + f"t{i % 5}") for i in range(200)],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(
        [
            (i, "alpha beta gamma delta" if i % 3 == 0
             else f"omega{i % 20} psi{i % 20} chi{i % 20} phi{i % 20}")
            for i in range(30_000)
        ],
        ["doc_id", "text"],
    ).repartition(32)
    out = dsir_logratio(raw, target, "doc_id", "text")
    got = {r.id: r.logratio for r in out.collect()}
    assert len(got) == 30_000
    like = [v for k, v in got.items() if k % 3 == 0]
    unlike = [v for k, v in got.items() if k % 3 != 0]
    assert min(like) > max(unlike)
    got13 = {r.id: r.logratio for r in dsir_logratio(
        raw.repartition(13), target, "doc_id", "text").collect()}
    assert got == got13


def test_phash_banded_pairs_at_20k_media_assets(spark):
    """Perceptual-hash pair search at 20k media assets: 500 planted
    noisy-re-encode pairs (ids 2p / 2p+1 share content; odd ids carry
    quantization noise) must be found by the banded search, and the
    candidate join must stay on band collisions — never all-pairs (20k
    choose 2 ≈ 2e8 would be the non-banded cost).  Content words are
    drawn from a 200-word pool so unrelated docs share vocabulary (the
    adversarial case for a coarse spectrum hash: collisions are possible,
    quadratic blowup is not)."""
    from dipper_spark.multimodal import attach_media, phash_media, phash_pairs

    import random

    n_docs, n_pairs = 20_000, 500

    def text(i):
        key = i // 2 if i < 2 * n_pairs else i + 10**6
        words = [f"w{w}" for w in random.Random(key).choices(range(200), k=40)]
        base = " ".join(words)
        if i < 2 * n_pairs and i % 2 == 1:
            # quantization-noise "re-encode": bump every 3rd byte
            return "".join(
                chr(ord(c) + 1) if j % 3 == 0 and " " < c < "~" else c
                for j, c in enumerate(base)
            )
        return base

    docs = spark.createDataFrame(
        [(i, text(i)) for i in range(n_docs)], ["doc_id", "text"]
    ).repartition(32)
    media = attach_media(docs)
    pairs = phash_pairs(phash_media(media), max_hamming=3)
    got = {(r.id_1, r.id_2) for r in pairs.collect()}
    planted = {(2 * p, 2 * p + 1) for p in range(n_pairs)}
    found = len(got & planted)
    # identical-content planted pairs hash identically up to the noise;
    # require >= 95% recall of the planted pairs (the coarse 1-D spectrum
    # may drop a few whose noise pattern crosses the median threshold)
    assert found >= int(0.95 * n_pairs), f"only {found}/{n_pairs} planted pairs found"
    # precision guard: band collisions on a shared-vocab corpus must not
    # explode into a quadratic pair set
    assert len(got) < 20 * n_pairs, f"pair set blew up: {len(got)}"


def test_pq_adc_at_20k_vectors(spark):
    """PQ at 20k x 64-dim gaussian vectors: the quantized corpus carries 4
    one-byte codes per vector, and for each query its planted EXACT
    duplicate must come back rank 1 — provable, not probabilistic: encode
    maximizes per-subspace inner products, so decode(q) attains the
    maximum achievable ADC score Σ_s max_c dot(q_s, c); any tie shares
    the identical decode and loses the id tie-break to the low-id
    duplicate."""
    import numpy as np

    from dipper_spark.operators.similarity import pq_encode, pq_codebooks, pq_topk

    rng = np.random.RandomState(11)
    n = 20_000
    mat = rng.randn(n, 64).astype(np.float32)
    query_ids = [17, 18, 19, 20, 21]
    dup_ids = [30, 31, 32, 33, 34]
    for q, d in zip(query_ids, dup_ids):
        mat[d] = mat[q]  # exact duplicate at a low id
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cb = pq_codebooks(corpus)
    codes = pq_encode(corpus, cb)
    assert codes.count() == n * 4
    assert codes.filter((F.col("code") < 0) | (F.col("code") >= 16)).count() == 0
    # identical vectors quantize identically
    got_codes = {
        (r.vec_id, r.s): r.code
        for r in codes.filter(F.col("vec_id").isin(query_ids + dup_ids)).collect()
    }
    for q, d in zip(query_ids, dup_ids):
        for s in range(4):
            assert got_codes[(q, s)] == got_codes[(d, s)]

    queries = corpus.filter(F.col("vec_id").isin(query_ids))
    out = pq_topk(queries, corpus, k=5).collect()
    assert len(out) == 25
    top1 = {r.query_id: r.neighbor_id for r in out if r.rank == 1}
    assert top1 == dict(zip(query_ids, dup_ids))


def test_salted_agg_and_skew_join_under_mega_hot_key(spark):
    """Skew mitigation at volume: 500k rows where ONE key owns 80% of the
    mass (straggler factor ~8x over 10 keys).  The salted two-phase
    aggregate and the hot-key replicate join must stay row-identical to
    the plain forms, and the salt must actually spread the hot key's rows
    across cells (no cell > ~2/n_salts of the hot mass)."""
    from dipper_spark.operators.skew import (
        detect_hot_keys,
        salted_aggregate,
        skew_join,
        _salt_col,
    )

    n = 500_000
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("row_id"),
            F.when(F.col("id") % 10 < 8, F.lit("mega"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 100).cast("string")))
            .alias("key"),
            (F.col("id") % 97).cast("double").alias("val"),
        )
        .repartition(32)
    )
    hot = detect_hot_keys(df, "key", straggler_threshold=3.0)
    assert hot == ["mega"]

    got = {
        r.key: (r.n_rows, round(r.total, 2))
        for r in salted_aggregate(
            df, "key", {"n_rows": ("count", None), "total": ("sum", "val")},
            salt_on="row_id", n_salts=32,
        ).collect()
    }
    want = {
        r.key: (r.n_rows, round(r.total, 2))
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"), F.sum("val").alias("total"))
        .collect()
    }
    assert got == want

    # the hot key's 400k rows spread: every cell well under the unsalted 400k
    cells = (
        df.filter(F.col("key") == "mega")
        .withColumn("_salt", _salt_col("row_id", 32))
        .groupBy("_salt").agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    assert len(cells) == 32
    assert max(r.c for r in cells) < 2 * (n * 8 // 10) // 32

    dim = spark.createDataFrame(
        [("mega", "M")]
        + [(f"k{i}", f"D{i}") for i in range(100) if i % 10 >= 8],
        ["dkey", "label"],
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = skew_join(
            df, dim, "key", "dkey", salt_on="row_id", hot_keys=hot, n_salts=32
        )
        agg = {
            r.label: r.c
            for r in joined.groupBy("label").agg(F.count(F.lit(1)).alias("c")).collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert agg["M"] == n * 8 // 10
    assert sum(agg.values()) == n
