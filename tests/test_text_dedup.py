"""Text-analysis and dedup operator unit tests (edge cases the oracle gate
doesn't reach: short docs, empty shingles, signature shapes)."""

import pyspark.sql.functions as F
import pytest

from dipper_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
    tokens,
    word_shingles,
)
from dipper_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash,
    simhash_pairs,
)
from dipper_spark.operators.similarity import cosine_topk, ivf_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "completely different content here entirely"),
        (4, "tiny"),  # fewer tokens than shingle width
        (5, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tokens_and_shingles_edges(spark, docs):
    out = docs.select(
        "doc_id",
        token_count("text").alias("n"),
        F.size(word_shingles(tokens("text"), 3)).alias("n_sh"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n == 9 and by_id[1].n_sh == 7
    assert by_id[4].n == 1 and by_id[4].n_sh == 0  # < n tokens -> empty, not null


def test_exact_dedup_elects_min_id(spark, docs):
    groups = exact_dedup(docs, "doc_id", F.md5(F.col("text")), min_group=2).collect()
    assert len(groups) == 1
    assert groups[0].canonical_id == 1 and groups[0].n_dups == 2


def test_jaccard_and_minhash_agree_on_planted_dups(spark, docs):
    exact = {
        (r.id_1, r.id_2): r.jaccard
        for r in jaccard_pairs(docs, "doc_id", "text", 3, threshold=0.5).collect()
    }
    assert (1, 5) in exact and exact[(1, 5)] == 1.0
    assert (1, 2) in exact and 0.5 < exact[(1, 2)] < 1.0

    lsh = {
        (r.id_1, r.id_2): r.jaccard
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", 3, num_perm=8, rows_per_band=2, threshold=0.5
        ).collect()
    }
    # identical docs always collide in every band; LSH finds them with j match
    assert lsh[(1, 5)] == 1.0
    # every LSH-verified pair must carry the exact jaccard value
    for pair, j in lsh.items():
        assert exact.get(pair) == j


def test_jaccard_hot_shingle_pruning(spark):
    # 6 docs all share one boilerplate opening; only 1/2 are real near-dups.
    boiler = "subscribe to our newsletter for updates"
    rows = [
        (1, boiler + " alpha beta gamma delta epsilon"),
        (2, boiler + " alpha beta gamma delta zeta"),
        (3, boiler + " one two three four five"),
        (4, boiler + " six seven eight nine ten"),
        (5, boiler + " red orange yellow green blue"),
        (6, boiler + " cold warm hot cool mild"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {
        (r.id_1, r.id_2): r.jaccard
        for r in jaccard_pairs(docs, "doc_id", "text", 3, threshold=0.5).collect()
    }
    # pruning shingles shared by >3 docs removes the boilerplate from the
    # index; the surviving near-dup pair keeps its EXACT jaccard value
    pruned = {
        (r.id_1, r.id_2): r.jaccard
        for r in jaccard_pairs(
            docs, "doc_id", "text", 3, threshold=0.5, max_doc_freq=3
        ).collect()
    }
    assert (1, 2) in pruned and pruned[(1, 2)] == exact[(1, 2)]
    # boilerplate-only pairs (e.g. 3-4) are below threshold either way
    assert (3, 4) not in pruned

    # the candidate-generation stage itself must shrink: with the boilerplate
    # pruned, docs sharing ONLY hot shingles never meet in the self-join
    from dipper_spark.operators.dedup import shingle_table

    sh = shingle_table(docs, "doc_id", "text", 3)
    hot = (
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).filter("df > 3")
    )
    kept = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    a, b = kept.alias("a"), kept.alias("b")
    n_cand = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .select("a.id", "b.id").distinct().count()
    )
    assert n_cand == 1  # only the true near-dup pair survives candidate gen


def test_containment_detects_quotes_and_prunes_hot_shingles(spark):
    from dipper_spark.operators.dedup import containment_pairs

    # doc 2 is a verbatim quote of doc 1's middle; doc 3 shares nothing but
    # a hot boilerplate footer that every doc carries
    footer = "all rights reserved contact us for details"
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta " + footer),
        (2, "beta gamma delta epsilon " + footer),
        (3, "one two three four five six seven eight " + footer),
        (4, "nine ten eleven twelve thirteen fourteen " + footer),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {
        (r.id_1, r.id_2): r.containment
        for r in containment_pairs(docs, "doc_id", "text", 3, threshold=0.5).collect()
    }
    # asymmetric: the short quote (2) is highly contained in (1), not vice versa
    assert exact[(2, 1)] > exact.get((1, 2), 0.0)
    # pruning the hot footer shingles keeps the quote pair with the EXACT
    # full-set containment value (denominator is the full set, not the
    # pruned index), and boilerplate-only pairs like (3,4) stay absent
    pruned = {
        (r.id_1, r.id_2): r.containment
        for r in containment_pairs(
            docs, "doc_id", "text", 3, threshold=0.5, max_doc_freq=3
        ).collect()
    }
    assert pruned[(2, 1)] == exact[(2, 1)]
    assert (3, 4) not in pruned and (4, 3) not in pruned


def test_minhash_signature_shape(spark, docs):
    sig = minhash_signatures(docs.filter("doc_id < 4"), "doc_id", "text", 3, num_perm=8)
    assert sig.columns == ["id"] + [f"mh{k}" for k in range(8)]
    rows = {r.id: r for r in sig.collect()}
    assert len(rows) == 3
    # identical input -> identical signature (determinism)
    sig2 = {r.id: r for r in minhash_signatures(docs.filter("doc_id < 4"), "doc_id", "text", 3, 8).collect()}
    assert rows[1].mh0 == sig2[1].mh0
    cands = lsh_candidate_pairs(
        minhash_signatures(docs, "doc_id", "text", 3, 8), 8, 2
    ).collect()
    assert (1, 5) in {(r.id_1, r.id_2) for r in cands}


def test_simhash_dup_distance_zero(spark, docs):
    sim = simhash(docs, "doc_id", "text", bits=16)
    vals = {r.id: r.simhash for r in sim.collect()}
    assert vals[1] == vals[5]  # identical docs -> identical fingerprint
    assert 0 <= vals[1] < (1 << 16)
    pairs = {(r.id_1, r.id_2): r.hamming for r in simhash_pairs(sim, max_hamming=16).collect()}
    assert pairs[(1, 5)] == 0
    # near-dup differs in few bits; disjoint docs in many
    assert pairs[(1, 2)] <= pairs[(1, 3)]


def test_simhash_banded_matches_all_pairs(spark, docs):
    # banded blocking (max_hamming < bits) must return EXACTLY the pairs the
    # all-pairs form finds — pigeonhole guarantees no candidate is missed
    sim = simhash(docs, "doc_id", "text", bits=16)
    for k in (0, 1, 3, 7):
        banded = {
            (r.id_1, r.id_2, r.hamming)
            for r in simhash_pairs(sim, max_hamming=k, bits=16).collect()
        }
        a, b = sim.alias("a"), sim.alias("b")
        brute = {
            (r.id_1, r.id_2, r.hamming)
            for r in a.join(b, F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_1"),
                F.col("b.id").alias("id_2"),
                F.expr("CAST(bit_count(a.simhash ^ b.simhash) AS LONG)").alias("hamming"),
            )
            .filter(F.col("hamming") <= k)
            .collect()
        }
        assert banded == brute, f"max_hamming={k}"


def test_quality_lang_fingerprint(spark, docs):
    out = {
        r.doc_id: r
        for r in docs.select(
            "doc_id",
            quality_score("text").alias("q"),
            lang_id("text").alias("lang"),
            doc_fingerprint("text").alias("fp"),
        ).collect()
    }
    assert 0.0 <= out[1].q <= 1.0
    assert out[1].lang == "en"  # contains 'the' + 'over'... marker 'the'
    assert out[4].lang == "und"
    assert out[1].fp == out[5].fp and out[1].fp != out[3].fp


def test_cosine_and_ivf_topk(spark):
    # three tight clusters around orthogonal axes, interleaved so the first
    # 3 ids (the deterministic IVF centroids) cover all three clusters
    rows = []
    for i in range(30):
        axis = i % 3
        v = [0.01 * (i % 10), 0.02 * (i % 7), 0.015 * (i % 5)]
        v[axis] += 1.0
        rows.append((i, v))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    bf = cosine_topk(emb.filter("vec_id < 2"), emb, k=3)
    got = bf.collect()
    assert len(got) == 6
    top = [r for r in got if r.query_id == 0 and r.rank == 1][0]
    assert top.neighbor_id % 3 == 0  # nearest neighbor stays in the x cluster
    assert all(r.neighbor_id != r.query_id for r in got)
    ivf = ivf_topk(emb.filter("vec_id < 2"), emb, n_centroids=3, k=3).collect()
    assert {r.query_id for r in ivf} == {0, 1}
    # IVF searches only the query's own bucket -> neighbors share the cluster
    assert all(r.neighbor_id % 3 == r.query_id % 3 for r in ivf)
    assert all(r.cos_sim <= 1.000001 for r in ivf)


class TestIvfRecall:
    def test_kmeans_recall_on_clustered_corpus(self, spark):
        """Lloyd-refined IVF at nprobe=1 recovers >= 0.9 of the brute-force
        top-k when the corpus actually clusters (VERDICT r1 #9).  The
        synthetic testdata embeddings are near-uniform on the sphere
        (same-label mean cosine ~0.02), where NO partitioning index can
        reach 0.9 at nprobe=1 — so the recall guarantee is proven on a
        genuinely clustered corpus and the nprobe curve is characterized on
        the real table below."""
        import random

        rng = random.Random(7)
        rows = []
        for i in range(400):
            center = i % 8
            v = [rng.gauss(0, 0.05) for _ in range(16)]
            v[center * 2] += 1.0
            rows.append((i, v))
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        queries = emb.filter(F.col("vec_id") % 20 == 0)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk(queries, emb, k=5).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(
                queries, emb, n_centroids=8, k=5, refine_iters=3, nprobe=1
            ).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.9, f"recall@5 = {recall:.3f}"

    def test_seeded_init_beats_first_n_on_cluster_sorted_corpus(self, spark):
        """VERDICT r2 #8: on a corpus SORTED by cluster (the degenerate case
        for first-N init — the first N vectors all land in one cluster),
        md5-seeded init reaches recall@5 >= 0.9 with a single Lloyd
        iteration, and is at least as good as first-N init."""
        import random

        rng = random.Random(11)
        rows = []
        for i in range(400):
            center = i // 50  # cluster-sorted: first 50 rows are cluster 0...
            v = [rng.gauss(0, 0.05) for _ in range(16)]
            v[center * 2] += 1.0
            rows.append((i, v))
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        queries = emb.filter(F.col("vec_id") % 25 == 0)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk(queries, emb, k=5).collect()
        }

        def recall(init):
            approx = {
                (r.query_id, r.neighbor_id)
                for r in ivf_topk(
                    queries, emb, n_centroids=8, k=5,
                    refine_iters=1, nprobe=1, init=init,
                ).collect()
            }
            return len(exact & approx) / len(exact)

        r_seeded, r_first = recall("seeded"), recall("first")
        assert r_seeded >= 0.9, f"seeded recall@5 = {r_seeded:.3f}"
        assert r_seeded >= r_first, (r_seeded, r_first)

    def test_nprobe_curve_on_real_embeddings(self, spark, sf_dir):
        """On the (unclustered) real table, recall must rise monotonically
        with nprobe and reach 1.0 at nprobe=n_centroids (graceful
        degradation to exact search)."""
        from dipper_spark.session import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") % 100 == 0)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk(queries, emb, k=5).collect()
        }
        recalls = []
        for nprobe in (1, 5, 10):
            approx = {
                (r.query_id, r.neighbor_id)
                for r in ivf_topk(
                    queries, emb, n_centroids=10, k=5, refine_iters=2, nprobe=nprobe
                ).collect()
            }
            recalls.append(len(exact & approx) / len(exact))
        assert recalls[0] <= recalls[1] <= recalls[2], recalls
        assert recalls[2] == 1.0, recalls  # all buckets probed == brute force

    def test_kmeans_centroids_shape_and_determinism(self, spark):
        from dipper_spark.operators.similarity import kmeans_centroids

        rows = []
        for i in range(30):
            v = [0.0] * 4
            v[i % 3] = 1.0 + 0.01 * i
            rows.append((i, v))
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        c1 = {r.vec_id: r.embedding for r in kmeans_centroids(emb, 3, 2).collect()}
        c2 = {r.vec_id: r.embedding for r in kmeans_centroids(emb, 3, 2).collect()}
        assert c1.keys() == c2.keys() and len(c1) == 3
        assert all(len(v) == 4 for v in c1.values())
        assert c1 == c2  # deterministic across runs


class TestArrowCosine:
    def test_arrow_matches_expr_topk(self, spark, sf_dir):
        """cosine_topk_arrow must agree with the expression-based baseline."""
        from dipper_spark.operators.similarity import cosine_topk, cosine_topk_arrow
        from dipper_spark.session import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.limit(5)
        a = {(r.query_id, r.neighbor_id, r.rank) for r in cosine_topk(q, emb, k=3).collect()}
        b = {(r.query_id, r.neighbor_id, r.rank) for r in cosine_topk_arrow(q, emb, k=3).collect()}
        assert a == b


class TestDecontaminate:
    def test_benchmark_overlap_flags_and_fractions(self, spark):
        from dipper_spark.operators.dedup import decontaminate

        docs = spark.createDataFrame(
            [
                # 4 distinct 3-gram shingles; shares 'c d e'+'d e f' with bench
                (1, "a b c d e f"),
                # no overlap
                (2, "x y z w v"),
                # exact benchmark copy → every shingle hits
                (3, "c d e f g"),
            ],
            ["doc_id", "text"],
        )
        bench = spark.createDataFrame([(100, "c d e f g")], ["doc_id", "text"])
        got = {
            r.id: (r.n_hits, r.n_shingles, r.hit_frac)
            for r in decontaminate(docs, bench, "doc_id", "text", n=3).collect()
        }
        # doc 1: shingles {a b c, b c d, c d e, d e f}; bench has
        # {c d e, d e f, e f g} → 2 hits of 4
        assert got[1] == (2, 4, 0.5)
        # doc 3 is a verbatim benchmark copy: all 3 shingles hit
        assert got[3] == (3, 3, 1.0)
        # doc 2 clean → absent
        assert 2 not in got

    def test_plan_is_broadcast_semi_side(self, spark):
        """The benchmark side must broadcast — the corpus never shuffles its
        text for the overlap test."""
        from dipper_spark.operators.dedup import decontaminate

        docs = spark.range(100).selectExpr("id AS doc_id", "'a b c d' AS text")
        bench = spark.range(2).selectExpr("id AS doc_id", "'a b c d' AS text")
        plan = decontaminate(docs, bench, "doc_id", "text", n=3)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        # n_shingles is computed map-side (F.size on the un-exploded array)
        # and carried through the explode: exactly ONE corpus-side shuffle
        # (the hit-count groupBy) and no totals join
        assert plan.count("SortMergeJoin") == 0
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges <= 1, f"expected a single corpus shuffle, plan:\n{plan}"


class TestLabelPcaGolden:
    """The full PCA spectrum (top-k eigenvalues + variance fractions) has
    no DuckDB oracle — the eigensolve is non-relational — but its output
    is fully deterministic: member rows are sorted by id before the
    covariance fold and numpy's symmetric eigensolver is stable, so the
    sf0.01 spectrum is pinned by value hash here.  (The registered
    q_label_pca catalog entry now carries a VALUE-LEVEL invariant oracle —
    eigenvalue sum = trace, PSD, descending — so the driver gate checks
    the eigensolve too; this pin still guards the per-component split.)
    Regenerating the constant is a DELIBERATE act on a semantic change."""

    HASH = "32716a863827abad757c3294d9ed4c25"

    def test_sf001_spectrum_pinned(self, spark):
        import hashlib

        from dipper_spark.operators.similarity import label_pca_spectrum
        from dipper_spark.plans.catalog import load_table

        emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
        df = label_pca_spectrum(emb, "vec_id", "label", "embedding", k=2)
        assert df.columns == ["label", "component", "eigval", "var_frac"]
        rows = sorted(tuple(r) for r in df.collect())
        assert len(rows) == 20  # 10 labels x top-2 components
        canon = ";".join(
            ",".join(f"{v:.6f}" if isinstance(v, float) else str(v) for v in r)
            for r in rows
        )
        assert hashlib.md5(canon.encode()).hexdigest() == self.HASH

    def test_invariants_certify_spectrum(self, spark):
        """The invariant frame's eigval_sum equals the spectrum's total
        variance (trace) computed independently by numpy on the collected
        vectors — the same identity the DuckDB oracle checks via
        var_pop."""
        import numpy as np

        from dipper_spark.operators.similarity import label_pca_invariants
        from dipper_spark.plans.catalog import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        inv = {r.label: r for r in label_pca_invariants(emb).collect()}
        pdf = emb.select("label", "embedding").toPandas()
        for label, grp in pdf.groupby("label"):
            x = np.asarray(grp["embedding"].tolist(), dtype=np.float64)
            trace = float(x.var(axis=0, ddof=0).sum())
            assert abs(inv[label].eigval_sum - trace) < 1e-8
            assert inv[label].n_nonneg == x.shape[1]
            assert inv[label].n_desc_violations == 0


class TestSeededAnnGolden:
    """Frozen goldens for the production ANN configuration
    (init='seeded', refine_iters=2, nprobe=2) at sf0.01 —
    seeded_centroid_init is fully deterministic given the seed
    (operators/similarity.py:137: md5-ordered candidate sample + greedy
    k-center), so the exact output is pinnable even though the greedy
    k-center is not reasonably SQL-oracle-mirrorable.  Regenerating these
    constants is a DELIBERATE act on a semantic change."""

    SF001 = "/root/testdata/sf0.01"
    CENTROID_IDS = [47, 110, 153, 217, 271, 293, 320, 326, 343, 352,
                    362, 404, 425, 452, 475, 484]
    CENTROID_HASH = "9441bc5085d5bce54eab57b8941f5ee5"
    RESULT_HASH = "92f0b105d09187b8e52bdccf932f0c48"

    def test_seeded_init_pinned(self, spark):
        import hashlib

        from dipper_spark.operators.similarity import seeded_centroid_init
        from dipper_spark.session import load_table

        emb = load_table(spark, self.SF001, "embeddings")
        cent = seeded_centroid_init(emb, 16, seed=42).collect()
        assert sorted(r.vec_id for r in cent) == self.CENTROID_IDS
        canon = ";".join(
            f"{r.vec_id}:" + ",".join(f"{v:.5f}" for v in r.embedding)
            for r in sorted(cent, key=lambda r: r.vec_id)
        )
        assert hashlib.md5(canon.encode()).hexdigest() == self.CENTROID_HASH

    def test_seeded_refined_ivf_pinned(self, spark):
        import hashlib

        from dipper_spark.operators.similarity import ivf_topk
        from dipper_spark.session import load_table

        emb = load_table(spark, self.SF001, "embeddings")
        q = emb.filter(emb.vec_id < 5)
        res = ivf_topk(
            q, emb, n_centroids=16, k=3, refine_iters=2, nprobe=2,
            init="seeded", seed=42,
        ).collect()
        rows = sorted((r.query_id, r.rank, r.neighbor_id, round(r.cos_sim, 5)) for r in res)
        assert len(rows) == 15
        # spot anchors, then the full frozen hash
        assert rows[0] == (0, 1, 365, 0.36999)
        canon = ";".join(f"{a}:{b}:{c}:{d:.5f}" for a, b, c, d in rows)
        assert hashlib.md5(canon.encode()).hexdigest() == self.RESULT_HASH


class TestRepetitionAndSampling:
    def test_repetition_ratio_edges(self, spark):
        from dipper_spark.functions.text import repetition_ratio

        df = spark.createDataFrame(
            [
                (1, "a b c a b c a b c"),    # 7 shingles, 3 distinct
                (2, "all unique words here never repeat at all okay"),
                (3, "xy"),                   # < n tokens → 0.0
            ],
            ["doc_id", "text"],
        )
        got = {
            r.doc_id: r.rep
            for r in df.select("doc_id", repetition_ratio("text", 3).alias("rep")).collect()
        }
        assert got[1] == round(1 - 3 / 7, 6)
        assert got[2] == 0.0  # 'all' repeats as a token but no 3-gram repeats
        assert got[3] == 0.0

    def test_stratified_sample_deterministic_and_rated(self, spark):
        from dipper_spark.operators.sampling import stratified_sample

        rows = [(i, "en" if i % 2 == 0 else "de") for i in range(4000)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        out1 = {r.doc_id for r in stratified_sample(df, "doc_id", "lang", {"en": 0.5, "de": 0.1}).collect()}
        # identical selection under a different partitioning (the property
        # df.sample() lacks)
        out2 = {
            r.doc_id
            for r in stratified_sample(
                df.repartition(7), "doc_id", "lang", {"en": 0.5, "de": 0.1}
            ).collect()
        }
        assert out1 == out2
        en = sum(1 for i in out1 if i % 2 == 0) / 2000
        de = sum(1 for i in out1 if i % 2 == 1) / 2000
        assert abs(en - 0.5) < 0.05 and abs(de - 0.1) < 0.03

    def test_stratified_sample_is_map_side(self, spark):
        from dipper_spark.operators.sampling import stratified_sample

        df = spark.range(100).selectExpr("id AS doc_id", "'en' AS lang")
        plan = (
            stratified_sample(df, "doc_id", "lang", {"en": 0.5})
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan  # pure filter: no shuffle, no join


class TestConnectedComponents:
    def test_components_min_label(self, spark):
        from dipper_spark.operators.dedup import connected_components

        edges = spark.createDataFrame(
            [(2, 3), (3, 4), (10, 11), (5, 4)], ["id_1", "id_2"]
        )
        got = {
            r.id: r.component for r in connected_components(edges).collect()
        }
        # chain 2-3-4-5 collapses to min id 2; isolated pair keeps min 10
        assert got == {2: 2, 3: 2, 4: 2, 5: 2, 10: 10, 11: 10}

    def test_components_deep_chain_converges(self, spark):
        from dipper_spark.operators.dedup import connected_components

        # a 30-node path: fixpoint needs ~diameter iterations
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(30)], ["id_1", "id_2"]
        )
        got = {r.id: r.component for r in connected_components(edges).collect()}
        assert set(got.values()) == {0} and len(got) == 31

    def test_edge_derivation_runs_once(self, spark):
        """The symmetric edge table must be built in ONE pass over the
        caller's (possibly expensive, lazy) pair derivation — the former
        union-of-flip form re-ran the whole upstream pipeline once per
        branch when materializing the sym checkpoint (profiled as two
        identical MinHash-verify stages under q_dup_components).  An
        accumulator-counting UDF stands in for the expensive derivation:
        it must fire once per edge row, not twice."""
        from pyspark.sql import functions as F

        from dipper_spark.operators.dedup import connected_components

        acc = spark.sparkContext.accumulator(0)

        def _counted(x):
            acc.add(1)
            return x

        cudf = F.udf(_counted, "long").asNondeterministic()
        edges = spark.createDataFrame(
            [(2, 3), (3, 4), (10, 11), (5, 4)], ["raw_1", "id_2"]
        ).select(cudf("raw_1").alias("id_1"), "id_2")
        got = {r.id: r.component for r in connected_components(edges).collect()}
        assert got == {2: 2, 3: 2, 4: 2, 5: 2, 10: 10, 11: 10}
        assert acc.value == 4, f"edge derivation evaluated {acc.value}x for 4 rows"


def test_source_quota_deterministic(spark):
    from dipper_spark.operators.sampling import source_quota

    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out1 = {r.doc_id for r in source_quota(df, "doc_id", "source", 10).collect()}
    out2 = {
        r.doc_id
        for r in source_quota(df.repartition(11), "doc_id", "source", 10).collect()
    }
    assert out1 == out2 and len(out1) == 30
    # quota larger than a group keeps the whole group
    assert source_quota(df, "doc_id", "source", 200).count() == 300


def test_substring_spans_merge_gap_and_within_doc_repeats(spark):
    """Planted geometry for duplicated_substring_spans (W=3, min_occ=2):
    overlapping duplicated windows merge to one maximal span; a gap wider
    than W splits islands; within-doc repeats count toward the corpus
    occurrence total; docs shorter than W are excluded."""
    from dipper_spark.operators.dedup import duplicated_substring_spans

    rows = [
        (1, "a b c d e f g h"),            # shares "a b c d e" with doc 2
        (2, "x x a b c d e y z"),
        (3, "p q r s p q r s t"),          # within-doc repeat of "p q r s"
        (4, "a b c m n o p q x y z w a b c"),  # two far-apart "a b c" hits
        (5, "ti ny"),                      # < W tokens -> excluded
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id, r.span_start): (r.span_end, r.span_tokens)
        for r in duplicated_substring_spans(
            docs, "doc_id", "text", window_tokens=3, min_occurrences=2
        ).collect()
    }
    assert got == {
        (1, 0): (5, 5),    # starts {0,1,2} merged
        (2, 2): (7, 5),    # same substring, shifted coordinates
        (3, 0): (8, 8),    # starts {0,1,4,5}: gap 3 == W -> still one island
        (4, 0): (3, 3),    # isolated hit
        (4, 12): (15, 3),  # gap 12 > W -> second island
    }


def test_semdedup_keeps_farthest_from_centroid(spark):
    """Two clusters; within one, three near-identical vectors — SemDeDup
    keeps only the lowest-cent_cos member (paper's keep-farthest variant)
    and the isolated vector; the other cluster is untouched."""
    from dipper_spark.operators.similarity import semdedup

    rows = [
        (0, [1.0, 0.0]),        # centroid A
        (1, [0.0, 1.0]),        # centroid B
        (10, [0.9, 0.1]),       # cluster A dup group
        (11, [0.89, 0.11]),
        (12, [0.88, 0.12]),     # farthest from centroid A of the three
        (13, [0.5, 0.5]),       # cluster A (ties to A by cid), not a dup of the group? cos is high with dups...
        (20, [0.1, 0.9]),       # cluster B, alone
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = emb.filter(F.col("vec_id") < 2)
    out = {r.vec_id: r.keep for r in semdedup(emb, cents, threshold=0.99).collect()}
    group = {k: v for k, v in out.items() if k in (10, 11, 12)}
    # exactly one of the near-identical trio survives: the one with the
    # LOWEST similarity to its centroid (12)
    assert group == {10: False, 11: False, 12: True}
    assert out[20] is True


def test_dsir_logratio_separates_target_like_docs(spark):
    """Docs sharing the target's vocabulary score higher than disjoint-
    vocab docs; n_feats counts unigrams + bigrams."""
    from dipper_spark.operators.sampling import dsir_logratio

    target = spark.createDataFrame(
        [(100, "alpha beta gamma alpha beta")], ["doc_id", "text"]
    )
    raw = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),       # target-like
            (2, "delta epsilon zeta"),     # disjoint
        ],
        ["doc_id", "text"],
    )
    got = {r.id: r for r in dsir_logratio(raw, target, "doc_id", "text").collect()}
    assert got[1].n_feats == 5 and got[2].n_feats == 5  # 3 unigrams + 2 bigrams
    assert got[1].logratio > got[2].logratio


def test_gumbel_topk_deterministic_and_partition_invariant(spark):
    from dipper_spark.operators.sampling import gumbel_topk

    df = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(500)], ["doc_id", "w"]
    )
    sel = lambda d: {
        r.doc_id for r in gumbel_topk(d, "doc_id", F.log("w"), k=50).collect()
    }
    s1, s2 = sel(df), sel(df.repartition(13))
    assert s1 == s2 and len(s1) == 50
    # weight-proportionality sanity: the heavy weights dominate the draw
    heavy = {r.doc_id for r in df.filter(F.col("w") >= 6).collect()}
    assert len(s1 & heavy) > 50 * len(heavy) / 500


class TestProductQuantization:
    def _toy(self, spark):
        # 8-dim corpus; first 2 vectors are the per-subspace codebook donors
        import numpy as np

        rng = np.random.RandomState(7)
        rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(20)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_codebook_member_reconstructs_exactly(self, spark):
        from dipper_spark.operators.similarity import (
            pq_codebooks,
            pq_encode,
        )

        df = self._toy(spark)
        cb = pq_codebooks(df, n_sub=2, n_codes=2, dim=8)
        assert cb.count() == 4  # 2 subspaces x 2 codes, broadcast-sized
        codes = {
            (r.vec_id, r.s): r.code
            for r in pq_encode(df, cb, n_sub=2, dim=8).collect()
        }
        # a codebook donor's best codeword in each subspace is itself:
        # its normalized slice has unit-maximal self inner product
        for donor in (0, 1):
            for s in (0, 1):
                assert codes[(donor, s)] == donor

    def test_adc_scores_match_numpy_replication(self, spark):
        import numpy as np

        from dipper_spark.operators.similarity import pq_topk

        df = self._toy(spark)
        n_sub, n_codes, dim, k = 4, 8, 8, 3
        out = pq_topk(
            df.filter(F.col("vec_id") < 3), df, n_sub=n_sub, n_codes=n_codes,
            dim=dim, k=k,
        ).collect()
        assert len(out) == 9
        # independent numpy replication of encode (argmax ip, ties lowest
        # code) + decode + ADC scoring
        rows = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
                for r in df.collect()}
        x = {i: v / np.linalg.norm(v) for i, v in rows.items()}
        sd = dim // n_sub
        cw = {(s, j): x[j][s * sd:(s + 1) * sd]
              for s in range(n_sub) for j in range(n_codes)}
        def decode(i):
            parts = []
            for s in range(n_sub):
                ips = [float(x[i][s * sd:(s + 1) * sd] @ cw[(s, j)])
                       for j in range(n_codes)]
                parts.append(cw[(s, int(np.argmax(ips)))])
            return np.concatenate(parts)
        for r in out:
            assert r.query_id != r.neighbor_id
            exp_ip = float(x[r.query_id] @ decode(r.neighbor_id))
            exp_cos = float(x[r.query_id] @ x[r.neighbor_id])
            assert abs(r.approx_ip - round(exp_ip, 6)) < 1e-6, r
            assert abs(r.true_cos - round(exp_cos, 6)) < 1e-6, r
        ranks = sorted((r.query_id, r.rank) for r in out)
        assert ranks == [(q, j) for q in range(3) for j in (1, 2, 3)]


def test_ivfpq_searches_only_query_bucket(spark):
    """IVF+PQ composition: in BOTH modes (residual IVFADC and the legacy
    raw-vector variant) results only ever come from the query's coarse
    bucket.  The raw/max-IP mode additionally guarantees an exact
    duplicate attains the maximal ADC score and wins rank 1 (see
    test_pq_adc_at_20k_vectors); residual/min-L2 codes do NOT carry that
    property (two vectors' reconstructions both approximate, either may
    dot higher with the query) — recovering exact duplicates at rank 1
    is the refine stage's job there (test_ivfpq_multiprobe_and_refine,
    which runs residual mode)."""
    import numpy as np

    from dipper_spark.operators.similarity import assign_buckets, ivfpq_topk

    rng = np.random.RandomState(3)
    mat = rng.randn(400, 8).astype(np.float32)
    mat[50] = mat[17]  # duplicate of query 17 at id 50
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(400)],
        "vec_id long, embedding array<float>",
    )
    cents = corpus.filter(F.col("vec_id") < 8)
    buckets = {
        r.vec_id: r.bucket for r in assign_buckets(corpus, cents).collect()
    }
    for residual in (True, False):
        out = ivfpq_topk(
            corpus.filter(F.col("vec_id") == 17), corpus,
            n_centroids=8, n_sub=2, n_codes=8, dim=8, k=3, residual=residual,
        ).collect()
        assert len(out) == 3
        for r in out:
            assert r.query_id == 17
            assert buckets[r.neighbor_id] == buckets[17] == r.bucket
        if not residual:
            # raw max-IP mode: the exact duplicate wins rank 1
            assert out[0].rank == 1 and out[0].neighbor_id == 50


def test_ivfpq_multiprobe_and_refine(spark):
    """nprobe fans a query out to its n closest coarse buckets (candidate
    set grows monotonically), and the refine stage re-ranks the ADC
    shortlist with EXACT cosine — an exact duplicate that ADC's coarse
    codes might misrank is always rank 1 with cos_sim 1.0 after refine
    (the FAISS IndexRefineFlat discipline; measured recall curve in
    docs/ANN_TRADEOFF.md)."""
    import numpy as np

    from dipper_spark.operators.similarity import (
        ivfpq_refine_topk,
        ivfpq_topk,
    )

    rng = np.random.RandomState(7)
    mat = rng.randn(400, 8).astype(np.float32)
    mat[60] = mat[23]  # exact duplicate of query 23
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(400)],
        "vec_id long, embedding array<float>",
    )
    q = corpus.filter(F.col("vec_id") == 23)

    b1 = {r.bucket for r in ivfpq_topk(q, corpus, n_centroids=8, n_sub=2,
                                       n_codes=8, dim=8, k=20, nprobe=1).collect()}
    b3 = {r.bucket for r in ivfpq_topk(q, corpus, n_centroids=8, n_sub=2,
                                       n_codes=8, dim=8, k=20, nprobe=3).collect()}
    assert b1 <= b3 and len(b3) >= 2  # multi-probe actually probes more

    out = ivfpq_refine_topk(
        q, corpus, n_centroids=8, n_sub=2, n_codes=8, dim=8,
        k=3, nprobe=2, shortlist=30,
    ).collect()
    assert out[0].rank == 1 and out[0].neighbor_id == 60
    assert out[0].cos_sim == 1.0  # exact score, not an ADC approximation
    # refined ranks are by EXACT cosine: strictly non-increasing
    sims = [r.cos_sim for r in sorted(out, key=lambda r: r.rank)]
    assert sims == sorted(sims, reverse=True)


def test_ivfpq_refine_default_shortlist_scales_with_nprobe(spark):
    """shortlist=None implements the measured operating curve's finding #4
    (docs/ANN_TRADEOFF.md): the default is 50·nprobe, bit-identical to
    passing it explicitly — a fixed shortlist stays flat as nprobe grows."""
    import numpy as np

    from dipper_spark.operators.similarity import ivfpq_refine_topk

    rng = np.random.RandomState(11)
    mat = rng.randn(300, 8).astype(np.float32)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(300)],
        "vec_id long, embedding array<float>",
    )
    q = corpus.filter(F.col("vec_id") < 3)
    kw = dict(n_centroids=8, n_sub=2, n_codes=8, dim=8, k=5, nprobe=3)
    default = ivfpq_refine_topk(q, corpus, **kw).collect()
    explicit = ivfpq_refine_topk(q, corpus, shortlist=150, **kw).collect()
    narrower = ivfpq_refine_topk(q, corpus, shortlist=50, **kw).collect()
    assert sorted(map(tuple, default)) == sorted(map(tuple, explicit))
    assert sorted(map(tuple, default)) != sorted(map(tuple, narrower)) or len(
        default
    ) == len(narrower)  # 150-candidate pool differs unless corpus saturates


def test_ivf_residuals_centroid_rows_are_zero_and_reconstruct(spark):
    """The FAISS IVFADC residual contract: a first-k centroid's own
    residual is exactly the zero vector (it assigns to itself at cosine
    1), every residual satisfies x_hat = c_hat(bucket) + rx exactly in
    double, and pq_codebooks(code_offset=...) skips the centroid rows —
    sampling codewords from them would yield the all-zero codebook that
    decoded every vector to its centroid (the round-12 recall-0.0 bug)."""
    import numpy as np

    from dipper_spark.operators.similarity import (
        ivf_residuals,
        pq_codebooks,
    )

    rng = np.random.RandomState(5)
    mat = rng.randn(60, 8).astype(np.float32)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    cents = corpus.filter(F.col("vec_id") < 4)
    res = ivf_residuals(corpus, cents).collect()
    by_id = {r.vec_id: r for r in res}
    for cid in range(4):
        assert by_id[cid].bucket == cid
        assert all(v == 0.0 for v in by_id[cid].rx)
    for r in res:
        xh = mat[r.vec_id].astype(np.float64)
        xh = xh / np.linalg.norm(xh)
        np.testing.assert_allclose(
            xh, np.asarray(r.cn) + np.asarray(r.rx), atol=1e-12
        )
    res_df = ivf_residuals(corpus, cents)
    cb = pq_codebooks(
        res_df, n_sub=2, n_codes=4, dim=8, vec_col="rx", normalize=False,
        code_offset=4,
    ).collect()
    assert len(cb) == 8  # 2 subspaces x 4 codes
    # codewords come from vec_ids 4..7 (offset past the centroids): none zero
    assert all(any(v != 0.0 for v in r.sub) for r in cb)
    assert {r.code for r in cb} == {0, 1, 2, 3}


def test_pq_codebooks_refined_reduces_reconstruction_error(spark):
    """Lloyd refinement must not worsen the codebook: total squared
    reconstruction error of min-L2 encoding against the refined codebook
    is <= the sampled codebook's (k-means monotonicity, up to the 2^-20
    mean quantization).  Measured motivation: sampled codebooks leave ADC
    recall below 0.1 on clustered geometry (docs/ANN_TRADEOFF.md)."""
    import numpy as np

    from dipper_spark.operators.similarity import (
        pq_codebooks,
        pq_codebooks_refined,
        pq_encode,
    )

    rng = np.random.RandomState(9)
    mat = rng.randn(200, 8).astype(np.float32)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )

    def recon_err(cb_df):
        cb = {(r.s, r.code): np.asarray(r.sub) for r in cb_df.collect()}
        codes = pq_encode(
            corpus, spark.createDataFrame(
                [(s, c, [float(v) for v in w]) for (s, c), w in cb.items()],
                "s int, code long, sub array<double>",
            ), n_sub=2, dim=8, objective="l2",
        ).collect()
        err = 0.0
        for r in codes:
            x = mat[r.vec_id].astype(np.float64)
            x = x / np.linalg.norm(x)
            xs = x[r.s * 4:(r.s + 1) * 4]
            err += float(((xs - cb[(r.s, r.code)]) ** 2).sum())
        return err

    sampled = pq_codebooks(corpus, n_sub=2, n_codes=8, dim=8)
    refined = pq_codebooks_refined(corpus, n_sub=2, n_codes=8, dim=8, n_iter=2)
    e0, e1 = recon_err(sampled), recon_err(refined)
    assert e1 <= e0 + 1e-6, (e0, e1)
    assert e1 < 0.9 * e0, f"Lloyd should improve materially: {e0} -> {e1}"


def test_multiassign_blocking_recovers_voronoi_boundary_pair(spark):
    """Round-12 verdict item #4: two near-identical vectors straddling the
    centroid Voronoi edge land in DIFFERENT primary cells, so single-assign
    blocking misses their pair; top-2 assignment indexes each under both
    cells and recovers it (the measured 0.868 -> 1.000 recall fix)."""
    from dipper_spark.operators.similarity import centroid_neardup

    rows = [
        (0, [1.0, 0.0]),     # centroid A
        (1, [0.0, 1.0]),     # centroid B
        (10, [0.72, 0.69]),  # primary cell A
        (11, [0.69, 0.72]),  # primary cell B — near-identical to 10
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = emb.filter(F.col("vec_id") < 2)
    single = {(r.id_1, r.id_2)
              for r in centroid_neardup(emb, cents, 0.95, n_assign=1).collect()}
    multi = {(r.id_1, r.id_2)
             for r in centroid_neardup(emb, cents, 0.95, n_assign=2).collect()}
    assert (10, 11) not in single
    assert (10, 11) in multi
    # multi only ADDS boundary pairs: every single-assign pair survives
    assert single <= multi


def test_semdedup_multiassign_drops_boundary_twin(spark):
    """semdedup(n_assign=2): the same boundary twins are invisible to the
    single-assign candidate search (both kept), while top-2 assignment
    surfaces the pair and exactly one twin survives; ranks and the
    reported bucket stay the primary assignment's."""
    from dipper_spark.operators.similarity import semdedup

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (10, [0.72, 0.69]),
        (11, [0.69, 0.72]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = emb.filter(F.col("vec_id") < 2)
    sd1 = {r.vec_id: r.keep for r in semdedup(emb, cents, threshold=0.95).collect()}
    assert sd1[10] is True and sd1[11] is True  # blocking miss: both kept
    out2 = semdedup(emb, cents, threshold=0.95, n_assign=2).collect()
    sd2 = {r.vec_id: r.keep for r in out2}
    # identical cent_cos (symmetric twins) -> tie-break keeps the lower id
    assert sd2[10] is True and sd2[11] is False
    # primary buckets unchanged by the widened candidate search
    buckets = {r.vec_id: r.bucket for r in out2}
    assert buckets[10] == 0 and buckets[11] == 1


def test_dot_unrolled_is_bit_identical_to_fold(spark):
    """The known-dim unrolled dot (round 14) must reproduce the
    aggregate/zip_with fold bit-for-bit: same left-associated double
    chain on equal-dim rows, and the FOLD ITSELF (pad-with-null
    semantics) on rows whose arrays are shorter/longer/NULL."""
    from pyspark.sql import functions as F

    from dipper_spark.functions.vectors import dot, dot_unrolled

    rows = [
        (1, [0.1, 0.2, 0.3, 0.4], [1.5, -2.5, 3.25, 0.125]),   # exact dim
        (2, [1e30, 1.0, -1e30, 3.0], [1.0, 1.0, 1.0, 1.0]),    # order-sensitive
        (3, [0.1, 0.2], [1.0, 2.0]),                            # short arrays
        (4, [0.1, 0.2, 0.3, 0.4, 0.5], [1.0] * 5),              # long arrays
        (5, None, [1.0, 2.0, 3.0, 4.0]),                        # null side
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<float>, b array<float>"
    )
    got = df.select(
        "id",
        dot("a", "b").alias("fold"),
        dot_unrolled("a", "b", 4).alias("unrolled"),
    ).collect()
    for r in got:
        if r.fold is None:
            assert r.unrolled is None, r
        else:
            # bit-level comparison, not approx
            import struct

            assert struct.pack("d", r.fold) == struct.pack("d", r.unrolled), r
