"""Unit tests for the round-5 corpus-curation operators: chunk-level dedup,
BM25 retrieval, TF-IDF keywords, Gopher-style quality rules, and weighted
importance sampling (edge cases the oracle gate doesn't reach)."""

import math

import pyspark.sql.functions as F

from dipper_spark.functions.text import quality_rules, token_chunks, tokens
from dipper_spark.operators.dedup import chunk_dedup
from dipper_spark.operators.sampling import weighted_sample
from dipper_spark.operators.search import bm25_topk, tfidf_keywords


class TestTokenChunks:
    def test_full_chunks_only(self, spark):
        df = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(25))), (2, "a b c")],
            ["doc_id", "text"],
        )
        got = {
            r.doc_id: r.ch
            for r in df.select(
                "doc_id", token_chunks(tokens("text"), 10).alias("ch")
            ).collect()
        }
        assert len(got[1]) == 2  # 25 tokens → 2 full chunks, 5-token tail dropped
        assert got[1][0] == " ".join(f"t{i}" for i in range(10))
        assert got[2] == []  # below one chunk → empty, not null


class TestChunkDedup:
    def test_planted_duplicate_chunk(self, spark):
        shared = " ".join(f"c{i}" for i in range(10))
        docs = spark.createDataFrame(
            [
                (1, shared + " " + " ".join(f"x{i}" for i in range(10))),
                (2, shared + " " + " ".join(f"y{i}" for i in range(10))),
                (3, " ".join(f"z{i}" for i in range(20))),
                (4, "too short"),
            ],
            ["doc_id", "text"],
        )
        got = {r.id: r for r in chunk_dedup(docs, "doc_id", "text", 10).collect()}
        assert set(got) == {1, 2}  # doc 3 has no dup chunk, doc 4 no chunk at all
        for i in (1, 2):
            assert got[i].n_chunks == 2 and got[i].n_dup == 1
            assert got[i].dup_frac == 0.5

    def test_within_doc_repeat_not_cross_doc(self, spark):
        # the same chunk twice INSIDE one doc is not a cross-doc duplicate
        chunk = " ".join(f"c{i}" for i in range(10))
        docs = spark.createDataFrame([(1, chunk + " " + chunk)], ["doc_id", "text"])
        assert chunk_dedup(docs, "doc_id", "text", 10).count() == 0


class TestBM25:
    def test_hand_computed_scores(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "spark join window spark"),
                (2, "spark table scan merge"),
                (3, "other words only here"),
            ],
            ["doc_id", "text"],
        )
        got = {
            r.id: (r.score, r.rank)
            for r in bm25_topk(docs, "doc_id", "text", ["spark", "join", "window"]).collect()
        }
        assert set(got) == {1, 2}  # doc 3 matches nothing

        def contrib(tf, dfreq, n=3, dl=4.0, avgdl=4.0, k1=1.2, b=0.75):
            idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
            return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

        exp1 = contrib(2, 2) + contrib(1, 1) + contrib(1, 1)
        exp2 = contrib(1, 2)
        assert got[1] == (round(exp1, 6), 1)
        assert got[2] == (round(exp2, 6), 2)

    def test_topk_plan_is_take_ordered(self, spark):
        docs = spark.createDataFrame([(i, "spark x") for i in range(50)], ["doc_id", "text"])
        plan = (
            bm25_topk(docs, "doc_id", "text", ["spark"], k=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # global top-k must be partial-top-k-per-partition, never a full sort
        assert "TakeOrderedAndProject" in plan


class TestTfidfKeywords:
    def test_rare_term_wins(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "common common common rareword"),
                (2, "common filler filler"),
                (3, "common stuff things"),
            ],
            ["doc_id", "text"],
        )
        got = {
            (r.id, r.rank): (r.term, r.tfidf)
            for r in tfidf_keywords(docs, "doc_id", "text", top_n=2).collect()
        }
        # 'common' has df=3 → idf=0; doc 1's top keyword is the rare term
        assert got[(1, 1)][0] == "rareword"
        assert got[(1, 1)][1] == round(math.log(3 / 1), 6)
        # all-idf-zero rows tie at 0.0 and break lexically
        assert got[(2, 1)][0] == "filler"

    def test_lexical_tiebreak(self, spark):
        docs = spark.createDataFrame([(1, "beta alpha"), (2, "unrelated")], ["doc_id", "text"])
        rows = [
            r.term
            for r in tfidf_keywords(docs, "doc_id", "text", top_n=2)
            .filter(F.col("id") == 1)
            .orderBy("rank")
            .collect()
        ]
        assert rows == ["alpha", "beta"]  # equal tfidf → term order


class TestQualityRules:
    def test_each_rule_fails_independently(self, spark):
        filler = [f"word{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(60)]
        docs = spark.createDataFrame(
            [
                (1, " ".join(["the", "of", "and"] + filler)),     # passes all
                (2, "the of short doc"),                          # fails r_len
                (3, " ".join(["the of"] + ["a"] * 70)),           # fails r_word_len (mean < 3)
                (4, " ".join(filler)),                            # fails r_stop
                (5, " ".join(["the of and to a"] + ["12345"] * 60)),  # fails r_alpha
                (6, "the of and " + "loop the same gram " * 30),  # fails r_rep
            ],
            ["doc_id", "text"],
        )
        rules = quality_rules("text")
        got = {
            r.doc_id: r.asDict()
            for r in docs.select("doc_id", *[c.alias(n) for n, c in rules.items()]).collect()
        }
        assert got[1]["passed"] == 1
        for doc, failed in [(2, "r_len"), (3, "r_word_len"), (4, "r_stop"),
                            (5, "r_alpha"), (6, "r_rep")]:
            assert got[doc][failed] == 0, (doc, failed, got[doc])
            assert got[doc]["passed"] == 0

    def test_rules_are_map_side(self, spark):
        docs = spark.createDataFrame([(1, "the of and x")], ["doc_id", "text"])
        rules = quality_rules("text")
        plan = (
            docs.select("doc_id", *[c.alias(n) for n, c in rules.items()])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "Python" not in plan


class TestBpeIshAndRollingHash:
    def test_bpe_tokens_split_runs_and_marks(self, spark):
        from dipper_spark.functions.text import bpe_ish_tokens

        df = spark.createDataFrame([(1, "Ab12 x-y!")], ["doc_id", "text"])
        got = df.select(bpe_ish_tokens("text").alias("t")).first().t
        assert got == ["ab", "12", "x", "-", "y", "!"]

    def test_rolling_fingerprint_is_order_sensitive(self, spark):
        from dipper_spark.functions.text import doc_fingerprint, rolling_fingerprint

        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "gamma beta alpha")], ["doc_id", "text"]
        )
        rows = df.select(
            "doc_id",
            rolling_fingerprint("text").alias("rfp"),
            doc_fingerprint("text").alias("bag"),
        ).collect()
        by_id = {r.doc_id: r for r in rows}
        # transposition: bag fingerprint identical, rolling hash differs
        assert by_id[1].bag == by_id[2].bag
        assert by_id[1].rfp != by_id[2].rfp
        assert 0 <= by_id[1].rfp < 1_000_000_007

    def test_rolling_fingerprint_matches_python_fold(self, spark):
        import hashlib

        from dipper_spark.functions.text import rolling_fingerprint

        text, mod, base = "the quick fox", 1_000_000_007, 131
        acc = 0
        for t in text.split():
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % mod
            acc = (acc * base + h) % mod
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        assert df.select(rolling_fingerprint("text").alias("f")).first().f == acc


class TestUnigramLogprob:
    def test_hand_computed(self, spark):
        from dipper_spark.operators.search import unigram_logprob

        docs = spark.createDataFrame([(1, "a a b"), (2, "b c")], ["doc_id", "text"])
        got = {r.id: (r.n_tokens, r.avg_logprob)
               for r in unigram_logprob(docs, "doc_id", "text").collect()}
        # freq: a=2, b=2, c=1; T=5
        assert got[1] == (3, round(math.log(2 / 5), 6))
        assert got[2] == (2, round((math.log(2 / 5) + math.log(1 / 5)) / 2, 6))
        # in-distribution text scores strictly higher than the rare-token doc
        assert got[1][1] > got[2][1]


class TestGroupPercentiles:
    def test_interpolation_matches_quantile_cont(self, spark):
        from dipper_spark.operators.aggregates import group_percentiles

        rows = [("a", i) for i in range(1, 11)] + [("b", 7)]
        df = spark.createDataFrame(rows, ["g", "v"])
        got = {r.g: r for r in group_percentiles(df, "g", "v", [0.5, 0.9, 0.99]).collect()}
        # rank-(n-1)p linear interpolation (same values DuckDB quantile_cont gives)
        assert (got["a"].p50, got["a"].p90, got["a"].p99) == (5.5, 9.1, 9.91)
        assert (got["b"].p50, got["b"].p90, got["b"].p99) == (7.0, 7.0, 7.0)


class TestLabelCentroids:
    def test_mean_pool(self, spark):
        from dipper_spark.operators.similarity import label_centroids

        df = spark.createDataFrame(
            [(0, [1.0, 2.0]), (0, [3.0, 6.0]), (1, [5.0, 5.0])],
            ["label", "embedding"],
        )
        got = {(r.label, r.dim): r.mean_v for r in label_centroids(df).collect()}
        assert got == {(0, 0): 2.0, (0, 1): 4.0, (1, 0): 5.0, (1, 1): 5.0}


class TestGovernance:
    def test_pseudonym_stable_and_salted(self, spark):
        from dipper_spark.operators.governance import pseudonym

        df = spark.createDataFrame([("alice",), ("alice",), ("bob",)], ["name"])
        out = df.select(
            pseudonym("name", "s1").alias("p1"), pseudonym("name", "s2").alias("p2")
        ).collect()
        assert out[0].p1 == out[1].p1          # stable per value
        assert out[0].p1 != out[2].p1          # distinct values differ
        assert out[0].p1 != out[0].p2          # salt changes the mapping

    def test_generalize_negative_band(self, spark):
        from dipper_spark.operators.governance import generalize_numeric

        df = spark.createDataFrame([(1, -123.4), (2, 123.4), (3, 999.9)], ["id", "v"])
        got = {r.id: r.b for r in df.select("id", generalize_numeric("v", 500.0).alias("b")).collect()}
        assert got == {1: -500, 2: 0, 3: 500}  # floor semantics, negatives band down

    def test_k_anonymity_flags_small_groups(self, spark):
        from dipper_spark.operators.governance import k_anonymity_annotate

        rows = [(i, "x", "u") for i in range(6)] + [(10, "y", "u"), (11, "y", "v")]
        df = spark.createDataFrame(rows, ["id", "qa", "qb"])
        got = {r.id: (r.group_n, r.suppressed)
               for r in k_anonymity_annotate(df, ["qa", "qb"], k=3).collect()}
        assert got[0] == (6, 0)
        assert got[10] == (1, 1) and got[11] == (1, 1)


class TestPagerank:
    def test_star_hub_dominates_and_mass_conserved(self, spark):
        from dipper_spark.operators.graph import pagerank

        # undirected star: hub 0 <-> spokes 1..5 (fed as both directions)
        und = [(0, i) for i in range(1, 6)]
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], ["src", "dst"]
        )
        got = {r.node: r.rank for r in pagerank(edges, iters=20).collect()}
        assert abs(sum(got.values()) - 1.0) < 1e-9  # stochastic: mass conserved
        assert got[0] > got[1] > 0
        spokes = [got[i] for i in range(1, 6)]
        assert max(spokes) - min(spokes) < 1e-12  # symmetry
        # fixed-iteration contract: must match a plain power iteration run
        # the same number of steps (a star is bipartite, so the FIXPOINT is
        # only approached at rate d^2 — the per-iteration value is the spec)
        d, n = 0.85, 6
        r = {v: 1 / n for v in range(n)}
        outdeg = {0: 5, **{i: 1 for i in range(1, 6)}}
        adj_in = {0: list(range(1, 6)), **{i: [0] for i in range(1, 6)}}
        for _ in range(20):
            r = {
                v: (1 - d) / n + d * sum(r[u] / outdeg[u] for u in adj_in[v])
                for v in range(n)
            }
        for v in range(n):
            assert abs(got[v] - r[v]) < 1e-12, v


class TestLinearCounting:
    def test_estimates_near_exact_at_low_load(self, spark):
        from dipper_spark.operators.sketches import linear_counting

        rows = [(f"g{i % 2}", f"item{i}") for i in range(400)] * 3  # dups
        df = spark.createDataFrame(rows, ["g", "t"])
        got = {r.g: r for r in linear_counting(df, "t", ["g"], m=4096).collect()}
        for g in ("g0", "g1"):
            assert got[g].occupied <= 200
            assert abs(got[g].est_distinct - 200) <= 10  # ~2.5% at 5% load

    def test_saturated_group_returns_null(self, spark):
        from dipper_spark.operators.sketches import linear_counting

        df = spark.createDataFrame([("g", f"i{i}") for i in range(64)], ["g", "t"])
        out = linear_counting(df, "t", ["g"], m=4).first()
        assert out.occupied == 4 and out.est_distinct is None


class TestCountMinSketch:
    def test_overestimate_property_under_collisions(self, spark):
        from dipper_spark.operators.sketches import count_min_build, count_min_estimate

        rows = [(f"t{i % 7}",) for i in range(200)] + [("rare",)]
        df = spark.createDataFrame(rows, ["t"])
        exact = df.groupBy("t").agg(F.count(F.lit(1)).alias("exact_n"))
        # width 4 forces collisions: estimates must still never undercount
        cms = count_min_build(df, "t", depth=3, width=4)
        est = {r.t: (r.exact_n, r.est_n)
               for r in count_min_estimate(cms, exact, "t", 3, 4).collect()}
        assert len(est) == 8
        for t, (ex, es) in est.items():
            assert es >= ex, (t, ex, es)

    def test_sketch_is_mergeable_by_addition(self, spark):
        from dipper_spark.operators.sketches import count_min_build

        rows = [(f"w{i % 5}",) for i in range(100)]
        half1 = spark.createDataFrame(rows[:50], ["t"])
        half2 = spark.createDataFrame(rows[50:], ["t"])
        whole = {
            (r.d, r.bucket): r.c
            for r in count_min_build(half1.unionAll(half2), "t", 2, 8).collect()
        }
        merged: dict = {}
        for part in (half1, half2):
            for r in count_min_build(part, "t", 2, 8).collect():
                merged[(r.d, r.bucket)] = merged.get((r.d, r.bucket), 0) + r.c
        assert merged == whole

    def test_unseen_item_estimates_zero_when_bucket_empty(self, spark):
        from dipper_spark.operators.sketches import count_min_build, count_min_estimate

        df = spark.createDataFrame([("only",)], ["t"])
        cms = count_min_build(df, "t", depth=4, width=4096)
        probe = spark.createDataFrame([("never-seen",)], ["t"])
        est = count_min_estimate(cms, probe, "t", 4, 4096).first()
        assert est.est_n == 0  # wide sketch, 1 item: some counter is empty


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(100, 1, 10), (101, 1, 20), (102, 2, 7)], ["event_id", "user_id", "ts"]
        )
        right = spark.createDataFrame(
            [(9000, 1, 5), (9001, 1, 15), (9002, 1, 25), (9003, 3, 1)],
            ["click_id", "user_id", "cts"],
        )
        return left, right

    def test_backward_match_and_unmatched_null(self, spark):
        from dipper_spark.operators.joins import asof_join

        left, right = self._frames(spark)
        out = asof_join(left, right, "user_id", "ts", "cts", tiebreak="click_id")
        got = {r.event_id: (r.asof.click_id if r.asof else None) for r in out.collect()}
        assert got == {100: 9000, 101: 9001, 102: None}

    def test_equal_timestamp_is_eligible_and_tiebreak_wins(self, spark):
        from dipper_spark.operators.joins import asof_join

        left = spark.createDataFrame([(1, 1, 10)], ["event_id", "user_id", "ts"])
        right = spark.createDataFrame(
            [(50, 1, 10), (51, 1, 10), (40, 1, 3)], ["click_id", "user_id", "cts"]
        )
        out = asof_join(left, right, "user_id", "ts", "cts", tiebreak="click_id")
        # right row at the same instant IS visible (>=); among equal
        # (key, ts) rows the greatest tiebreak wins deterministically
        assert out.first().asof.click_id == 51

    def test_single_shuffle_plan(self, spark):
        from dipper_spark.operators.joins import asof_join

        left, right = self._frames(spark)
        plan = (
            asof_join(left, right, "user_id", "ts", "cts")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the sort-merge-asof form: one keyed window shuffle, no join node
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan


class TestQuantizeInt8:
    def test_known_values_and_bounds(self, spark):
        from dipper_spark.operators.similarity import quantize_int8

        df = spark.createDataFrame(
            [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0])], ["vec_id", "embedding"]
        )
        got = {r.id: r for r in quantize_int8(df).collect()}
        assert got[1].qvec == [127, -63, 32, 0]  # floor(x/scale + 0.5)
        assert abs(got[1].scale - 1.0 / 127) < 1e-15
        assert got[2].scale == 0.0 and got[2].qvec == [0, 0]

    def test_reconstruction_error_bounded(self, spark):
        from dipper_spark.operators.similarity import quantize_int8
        from dipper_spark.session import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
        rows = quantize_int8(emb).join(
            emb.select(F.col("vec_id").alias("id"), "embedding"), "id"
        ).collect()
        for r in rows:
            for x, q in zip(r.embedding, r.qvec):
                assert abs(x - q * r.scale) <= r.scale / 2 + 1e-12
            assert max(abs(v) for v in r.qvec) <= 127


class TestTemperatureResample:
    def test_flattens_mixture_and_reproduces(self, spark):
        from dipper_spark.operators.sampling import temperature_resample

        # 9:1 source imbalance; alpha=0.5 must up-weight the rare source
        rows = [(i, "big" if i < 3600 else "small") for i in range(4000)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        out = temperature_resample(df, "doc_id", "source", alpha=0.5, target_frac=0.3)
        rates = {r.source: r.keep_rate for r in out.select("source", "keep_rate").distinct().collect()}
        assert rates["small"] > rates["big"]
        # q_s/p_s = sqrt-flattening: small source rate = 0.3*(sqrt(.1)/wsum)/.1
        import math

        wsum = math.sqrt(0.9) + math.sqrt(0.1)
        assert abs(rates["small"] - min(1.0, 0.3 * (math.sqrt(0.1) / wsum) / 0.1)) < 1e-12
        # deterministic across partitionings
        ids1 = {r.doc_id for r in out.collect()}
        ids2 = {
            r.doc_id
            for r in temperature_resample(
                df.repartition(11), "doc_id", "source", 0.5, 0.3
            ).collect()
        }
        assert ids1 == ids2

    def test_rate_capped_at_one(self, spark):
        from dipper_spark.operators.sampling import temperature_resample

        # extreme imbalance: the rare source's boosted rate must clamp to 1
        rows = [(i, "big" if i < 999 else "tiny") for i in range(1000)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        out = temperature_resample(df, "doc_id", "source", alpha=0.5, target_frac=0.9)
        kept_tiny = out.filter(F.col("source") == "tiny")
        assert kept_tiny.count() == 1  # rate 1.0 keeps the single row


class TestWeightedSample:
    def test_boundary_weights(self, spark):
        df = spark.range(500).withColumnRenamed("id", "doc_id")
        assert weighted_sample(df, "doc_id", F.lit(1.0)).count() == 500
        assert weighted_sample(df, "doc_id", F.lit(0.0)).count() == 0

    def test_deterministic_and_rate_correct(self, spark):
        df = spark.range(4000).withColumnRenamed("id", "doc_id")
        out1 = {r.doc_id for r in weighted_sample(df, "doc_id", F.lit(0.3)).collect()}
        out2 = {
            r.doc_id
            for r in weighted_sample(df.repartition(7), "doc_id", F.lit(0.3)).collect()
        }
        assert out1 == out2
        assert abs(len(out1) / 4000 - 0.3) < 0.03

    def test_per_row_weight_and_map_side(self, spark):
        # even ids weight 1.0, odd ids 0.0 → exactly the evens survive
        df = spark.range(200).withColumnRenamed("id", "doc_id")
        w = F.when(F.col("doc_id") % 2 == 0, F.lit(1.0)).otherwise(F.lit(0.0))
        out = weighted_sample(df, "doc_id", w)
        assert {r.doc_id % 2 for r in out.collect()} == {0}
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure filter


class TestEpochShuffle:
    def test_deterministic_and_seed_sensitive(self, spark):
        from dipper_spark.operators.sampling import epoch_shuffle

        df = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
        a = {r.doc_id: (r.shard, r.pos) for r in epoch_shuffle(df, "doc_id").collect()}
        # re-run on a different partitioning → identical assignment
        b = {
            r.doc_id: (r.shard, r.pos)
            for r in epoch_shuffle(df.repartition(7), "doc_id").collect()
        }
        assert a == b
        # a new seed is a new epoch: order must change somewhere
        c = {
            r.doc_id: (r.shard, r.pos)
            for r in epoch_shuffle(df, "doc_id", seed="ep2").collect()
        }
        assert a != c

    def test_positions_dense_per_shard(self, spark):
        from collections import Counter

        from dipper_spark.operators.sampling import epoch_shuffle

        df = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
        rows = epoch_shuffle(df, "doc_id", n_shards=4).collect()
        by_shard = Counter(r.shard for r in rows)
        assert set(by_shard) <= {0, 1, 2, 3}
        for s, n in by_shard.items():
            pos = sorted(r.pos for r in rows if r.shard == s)
            assert pos == list(range(1, n + 1))  # dense rank, no gaps


class TestHashedLinearScore:
    def test_score_is_mean_of_token_weights(self, spark):
        import hashlib

        from dipper_spark.operators.search import hashed_linear_score

        def w(tok: str, buckets: int = 4096) -> float:
            b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % buckets
            f = int(hashlib.md5(f"w:{b}".encode()).hexdigest()[:8], 16)
            return (f / 4294967296.0) * 2.0 - 1.0

        df = spark.createDataFrame([(1, "alpha beta gamma")], ["doc_id", "text"])
        row = hashed_linear_score(df, "doc_id", "text").collect()[0]
        expect = sum(w(t) for t in ["alpha", "beta", "gamma"]) / 3.0
        assert row.n_tokens == 3
        assert abs(row.clf_score - round(expect, 6)) < 1e-9
        assert row.label == int(expect > 0)

    def test_map_side_no_shuffle(self, spark):
        from dipper_spark.operators.search import hashed_linear_score

        df = spark.createDataFrame([(1, "a b"), (2, "c d")], ["doc_id", "text"])
        plan = hashed_linear_score(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestSlidingTokenChunks:
    def test_window_stride_overlap(self, spark):
        from dipper_spark.functions.text import sliding_token_chunks, tokens

        df = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b c")],
            ["doc_id", "text"],
        )
        got = {
            r.doc_id: r.ch
            for r in df.select(
                "doc_id", sliding_token_chunks(tokens("text"), 8, 4).alias("ch")
            ).collect()
        }
        # 10 tokens, w=8 s=4 → only start 0 has a full window
        assert got[1] == [" ".join(f"t{i}" for i in range(8))]
        assert got[2] == []

    def test_consecutive_chunks_share_context(self, spark):
        from dipper_spark.functions.text import sliding_token_chunks, tokens

        df = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(16)))], ["doc_id", "text"]
        )
        [row] = df.select(sliding_token_chunks(tokens("text"), 8, 4).alias("ch")).collect()
        assert len(row.ch) == 3  # starts 0, 4, 8
        # overlap: tail 4 tokens of chunk k == head 4 tokens of chunk k+1
        for a, b in zip(row.ch, row.ch[1:]):
            assert a.split()[4:] == b.split()[:4]


class TestBigramLogprob:
    def test_hand_computed(self, spark):
        from dipper_spark.operators.search import bigram_logprob

        # corpus: "a b a b" and "a b". bigrams: d1 [a b, b a, a b], d2 [a b]
        # counts: c2(a b)=3, c2(b a)=1; prefixes: c1(a)=3, c1(b)=1
        df = spark.createDataFrame([(1, "a b a b"), (2, "a b")], ["doc_id", "text"])
        got = {r.id: r for r in bigram_logprob(df, "doc_id", "text").collect()}
        assert got[1].n_bigrams == 3
        assert got[2].n_bigrams == 1
        # p(b|a)=3/3=1 → lp 0; p(a|b)=1/1=1 → lp 0
        assert got[1].avg_logprob == 0.0
        assert got[2].avg_logprob == 0.0

    def test_improbable_order_scores_lower(self, spark):
        from dipper_spark.operators.search import bigram_logprob

        # prefix "x" continues to "y" 9× and to "z" once — the rare
        # continuation scores ln(1/10), the common one ln(9/10)
        import math

        rows = [(i, "x y") for i in range(9)] + [(99, "x z")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {r.id: r.avg_logprob for r in bigram_logprob(df, "doc_id", "text").collect()}
        assert got[99] < got[0]
        assert abs(got[0] - round(math.log(9 / 10), 6)) < 1e-9
        assert abs(got[99] - round(math.log(1 / 10), 6)) < 1e-9


class TestIncrementalDedup:
    def test_exact_and_overlap_flags(self, spark):
        from dipper_spark.operators.dedup import incremental_dedup
        from dipper_spark.operators.sampling import hash_fraction
        import pyspark.sql.functions as F

        text_a = "alpha beta gamma delta epsilon zeta"
        rows = [(i, text_a if i % 3 == 0 else f"unique{i} filler{i} pad{i} x{i} y{i}")
                for i in range(60)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        split = {r.doc_id: r.f for r in df.select(
            "doc_id", (hash_fraction(F.col("doc_id")) < 0.8).alias("f")).collect()}
        out = {r.id: r for r in incremental_dedup(df, "doc_id", "text").collect()}
        # every output id is from the new batch
        assert all(not split[i] for i in out)
        existing_has_a = any(split[i] and i % 3 == 0 for i in range(60))
        for i, r in out.items():
            if i % 3 == 0 and existing_has_a:
                assert r.exact_dup == 1
                assert r.max_overlap == 4  # all 4 distinct 3-shingles shared
            else:
                assert r.exact_dup == 0

    def test_no_self_match_within_batch(self, spark):
        from dipper_spark.operators.dedup import incremental_dedup
        from dipper_spark.operators.sampling import hash_fraction
        import pyspark.sql.functions as F

        # two identical docs that BOTH land in the new batch must not flag
        # each other (dedup is against the corpus only)
        df = spark.createDataFrame(
            [(i, "only in batch one two three") for i in range(200)],
            ["doc_id", "text"],
        )
        batch_ids = [r.doc_id for r in df.select(
            "doc_id", hash_fraction(F.col("doc_id")).alias("f")
        ).collect() if r.f >= 0.8]
        only_batch = df.filter(F.col("doc_id").isin(batch_ids[:2]) | (F.col("doc_id") < -1))
        # build a frame where the 2 batch docs exist but no existing doc shares text
        mixed = only_batch.union(
            spark.createDataFrame([(batch_ids[2] if len(batch_ids) > 2 else -5, "totally different words here now")], ["doc_id", "text"])
        )
        out = {r.id: r for r in incremental_dedup(mixed, "doc_id", "text").collect()}
        for i in batch_ids[:2]:
            if i in out:
                assert out[i].exact_dup == 0


class TestEmbeddingOutliers:
    def test_planted_outlier_found(self, spark):
        from dipper_spark.operators.similarity import embedding_outliers

        rows = [(i, [1.0, 0.0, 0.0], 0) for i in range(20)]
        rows += [(100, [50.0, 50.0, 0.0], 0)]          # far outlier in label 0
        rows += [(200 + i, [0.0, 1.0, 0.0], 1) for i in range(10)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        out = embedding_outliers(df, "vec_id", "label", "embedding").collect()
        ids = {r.id for r in out}
        assert 100 in ids
        [r] = [r for r in out if r.id == 100]
        assert r.z > 2
        # the tight label-1 cluster has zero variance → no outliers (sd=0 → null z)
        assert all(r.label == 0 for r in out)


class TestTriangles:
    def test_hand_graph(self, spark):
        from dipper_spark.operators.graph import triangles

        # K3 on {1,2,3} plus pendant 4-1; one triangle
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (4, 1), (2, 1)],  # includes dup reversed edge
            ["a", "b"],
        )
        got = {r.node: r for r in triangles(edges).collect()}
        assert got[1].n_tri == got[2].n_tri == got[3].n_tri == 1
        assert got[4].n_tri == 0
        assert got[1].degree == 3 and got[4].degree == 1
        # cc(1) = 2*1/(3*2) = 1/3; leaf node guarded to 0.0, no ANSI divide
        assert abs(got[1].clustering - round(1 / 3, 6)) < 1e-9
        assert got[2].clustering == 1.0
        assert got[4].clustering == 0.0

    def test_self_loop_dropped(self, spark):
        from dipper_spark.operators.graph import triangles

        edges = spark.createDataFrame([(1, 1), (1, 2)], ["a", "b"])
        got = {r.node: r for r in triangles(edges).collect()}
        assert 1 in got and got[1].degree == 1  # self-loop removed

    def test_degree_order_equivalent_to_id_order(self, spark):
        # the arboricity-bounded orientation changes ONLY the enumeration
        # order: results must be row-identical on a graph mixing triangles,
        # a hub, pendants, and overlapping cliques
        from dipper_spark.operators.graph import triangles

        edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (5, 6),
                 (6, 7), (5, 7), (7, 1), (2, 7), (1, 6)]
        hub = [(50, i) for i in range(20, 40)]  # hub sees 20 leaves, 0 triangles
        df = spark.createDataFrame(edges + hub, ["a", "b"])
        by_id = sorted(map(tuple, triangles(df, order="id").collect()))
        by_deg = sorted(map(tuple, triangles(df, order="degree").collect()))
        assert by_id == by_deg

    def test_degree_order_bounds_hub_wedge_fanout(self, spark):
        # star with the hub at a MIDDLE id: id-ordered canonicalization puts
        # the hub in the wedge-center position for every (smaller, hub,
        # larger) pair → quadratic candidates; degree-ordering orients every
        # edge leaf→hub, so the hub has out-degree 0 and the wedge join
        # produces ZERO candidates
        from pyspark.sql import functions as F

        from dipper_spark.operators.graph import oriented_edges

        n = 60
        hub = n // 2
        df = spark.createDataFrame(
            [(min(i, hub), max(i, hub)) for i in range(n + 1) if i != hub],
            ["a", "b"],
        )
        deg = (
            df.select(F.explode(F.array("a", "b")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        )

        def wedges(e):
            e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
            e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
            return e1.join(e2, "y").count()

        assert wedges(df) == hub * (n - hub)  # quadratic in the hub degree
        assert wedges(oriented_edges(df, deg)) == 0


class TestConversionFunnel:
    def test_order_matters(self, spark):
        from dipper_spark.plans import QUERIES
        import datetime as dt

        # build a tiny parquet dir with an events table: user 1 completes
        # the funnel in order; user 2 purchases BEFORE viewing (no credit)
        import tempfile, os
        d = tempfile.mkdtemp()
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0, 1, "signup", 0.0, "{}"),
            (2, t0 + dt.timedelta(minutes=1), 1, "view", 0.0, "{}"),
            (3, t0 + dt.timedelta(minutes=2), 1, "purchase", 0.0, "{}"),
            (4, t0, 2, "signup", 0.0, "{}"),
            (5, t0 + dt.timedelta(minutes=1), 2, "purchase", 0.0, "{}"),
            (6, t0 + dt.timedelta(minutes=2), 2, "view", 0.0, "{}"),
        ]
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        got = {r.user_id: r for r in QUERIES["q_conversion_funnel"](spark, d).collect()}
        assert (got[1].did_signup, got[1].did_view, got[1].did_purchase) == (1, 1, 1)
        assert (got[2].did_signup, got[2].did_view, got[2].did_purchase) == (1, 1, 0)


class TestLabelPcaSpectrum:
    def test_anisotropic_cluster_spectrum(self, spark):
        from dipper_spark.operators.similarity import label_pca_spectrum

        # label 0: variance only along x → first component carries ~100%
        rows = [(i, [float(i - 5), 0.0, 0.0], 0) for i in range(11)]
        # label 1: isotropic square in (x, y) → two equal components
        rows += [
            (100 + 4 * j + k, [float(j % 2), float(k % 2), 0.0], 1)
            for j in range(2)
            for k in range(2)
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        out = label_pca_spectrum(df, "vec_id", "label", "embedding", k=2).collect()
        by = {(r.label, r.component): r for r in out}
        assert by[(0, 0)].var_frac == 1.0
        assert by[(0, 1)].eigval == 0.0
        assert abs(by[(1, 0)].var_frac - 0.5) < 1e-6
        assert abs(by[(1, 1)].var_frac - 0.5) < 1e-6

    def test_partitioning_invariant(self, spark):
        from dipper_spark.operators.similarity import label_pca_spectrum

        import random
        rnd = random.Random(7)
        rows = [
            (i, [rnd.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(90)
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        a = sorted(map(tuple, label_pca_spectrum(df, k=3).collect()))
        b = sorted(map(tuple, label_pca_spectrum(df.repartition(13), k=3).collect()))
        assert a == b


class TestSnapshotDiff:
    def test_all_statuses_present_and_consistent(self, spark):
        from dipper_spark.plans import QUERIES

        out = QUERIES["q_snapshot_diff"](spark, "/root/testdata/sf0.001").collect()
        by = {}
        for r in out:
            by.setdefault(r.status, set()).add(r.id)
        # v1 covers frac<0.9, v2 covers frac>=0.1 → every doc appears once
        assert sum(len(v) for v in by.values()) == 500
        assert set(by) == {"added", "removed", "changed", "unchanged"}
        # statuses partition the id space
        ids = [i for v in by.values() for i in v]
        assert len(ids) == len(set(ids))


class TestBpeTrain:
    @staticmethod
    def _python_bpe(texts, n_merges):
        """Independent reference: Sennrich-style BPE on word frequencies."""
        from collections import Counter

        words = Counter()
        for t in texts:
            words.update(t.lower().split())
        vocab = {w: list(w) for w in words}
        merges = []
        for _ in range(n_merges):
            pairs = Counter()
            for w, syms in vocab.items():
                for a, b in zip(syms, syms[1:]):
                    pairs[(a, b)] += words[w]
            if not pairs:
                break
            # tie-break: freq desc, then (left, right) asc
            (l, r), freq = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((l, r, l + r, freq))
            for w, syms in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                vocab[w] = out
        return merges, vocab, words

    def test_matches_python_reference(self, spark):
        from dipper_spark.operators.bpe import bpe_train

        texts = [
            "low lower lowest low low",
            "new newer newest new newer",
            "wider wide wide widest",
        ]
        df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
        merges, vocab = bpe_train(df, "text", n_merges=4)
        got = [(r.left, r.right, r.merged, r.pair_freq) for r in merges.orderBy("step").collect()]
        want, pvocab, pwords = self._python_bpe(texts, 4)
        assert got == want
        gvocab = {r.word: list(r.syms) for r in vocab.collect()}
        assert gvocab == pvocab

    def test_overlapping_run_is_greedy_left_to_right(self, spark):
        from dipper_spark.operators.bpe import bpe_train

        # 'aaa': pair (a,a) appears twice but merges once, leaving [aa, a]
        df = spark.createDataFrame([(0, "aaa aaa bb")], ["doc_id", "text"])
        merges, vocab = bpe_train(df, "text", n_merges=1)
        [m] = merges.collect()
        assert (m.left, m.right, m.merged) == ("a", "a", "aa")
        assert m.pair_freq == 4  # 2 occurrences x freq 2 of 'aaa'
        got = {r.word: list(r.syms) for r in vocab.collect()}
        assert got["aaa"] == ["aa", "a"]
        assert got["bb"] == ["b", "b"]


class TestBpeEncode:
    def test_encode_matches_python_greedy(self, spark):
        """Encoding = the vocab's final per-word segmentation, in document
        order; n_tokens is the encoded length; fingerprint is order-
        sensitive (a word-order permutation changes it)."""
        from dipper_spark.operators.bpe import bpe_encode, bpe_train

        df = spark.createDataFrame(
            [(0, "low lower low"), (1, "lower low")], ["doc_id", "text"]
        )
        _, vocab = bpe_train(df, "text", n_merges=2)
        seg = {r.word: list(r.syms) for r in vocab.collect()}
        got = {r.doc_id: r for r in bpe_encode(df, "doc_id", "text", vocab).collect()}
        assert got[0].n_words == 3 and got[1].n_words == 2
        assert got[0].n_tokens == 2 * len(seg["low"]) + len(seg["lower"])
        assert got[1].n_tokens == len(seg["low"]) + len(seg["lower"])
        # doc 0 = "low lower low", doc 1 = "lower low": different streams
        assert got[0].enc_fingerprint != got[1].enc_fingerprint

    def test_oov_word_falls_back_to_char_split(self, spark):
        from pyspark.sql import functions as F

        from dipper_spark.operators.bpe import bpe_encode, bpe_train

        train = spark.createDataFrame([(0, "aa aa aa")], ["doc_id", "text"])
        _, vocab = bpe_train(train, "text", n_merges=1)
        apply_df = spark.createDataFrame([(7, "aa xyz")], ["doc_id", "text"])
        [row] = bpe_encode(apply_df, "doc_id", "text", vocab).collect()
        # 'aa' -> 1 merged token; OOV 'xyz' -> 3 chars
        assert row.n_words == 2 and row.n_tokens == 1 + 3
        # pin the fallback's fingerprint: in-vocab segmentation for 'aa',
        # char split for the held-out 'xyz', space-joined in doc order
        import hashlib

        seg = {r.word: list(r.syms) for r in vocab.collect()}
        stream = " ".join(seg["aa"] + ["x", "y", "z"])
        assert row.enc_fingerprint == hashlib.md5(stream.encode()).hexdigest()

    def test_vocab_side_is_broadcast(self, spark):
        from dipper_spark.operators.bpe import bpe_encode, bpe_train

        df = spark.createDataFrame([(0, "a b a")], ["doc_id", "text"])
        _, vocab = bpe_train(df, "text", n_merges=1)
        plan = bpe_encode(df, "doc_id", "text", vocab)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestHistogramQuantiles:
    def test_matches_numpy_on_binned_semantics(self, spark):
        """Estimate = upper edge of the first bin whose cumulative count
        reaches p*total; exact by construction when values sit on bin
        edges is NOT required — assert the bin-arithmetic contract."""
        from pyspark.sql import functions as F

        from dipper_spark.operators.sketches import histogram_quantiles

        # group g: values 0..99 -> bins 0..99 with width 1 over [0, 128)
        rows = [("g", float(i)) for i in range(100)]
        df = spark.createDataFrame(rows, ["grp", "v"])
        [r] = histogram_quantiles(
            df, "v", ["grp"], {"p50": 0.5, "p90": 0.9}, lo=0.0, hi=128.0, n_bins=128
        ).collect()
        assert r.n_total == 100
        # p50: first bin with cum >= 50 is bin 49 -> upper edge 50.0
        assert r.p50 == 50.0
        assert r.p90 == 90.0

    def test_out_of_range_values_clamp_to_edge_bins(self, spark):
        from dipper_spark.operators.sketches import histogram_quantiles

        df = spark.createDataFrame(
            [("g", -5.0), ("g", 3.0), ("g", 999.0)], ["grp", "v"]
        )
        [r] = histogram_quantiles(
            df, "v", ["grp"], {"p99": 0.99}, lo=0.0, hi=8.0, n_bins=8
        ).collect()
        # 999 clamps into the last bin [7, 8) -> estimate 8.0, never NULL
        assert r.n_total == 3 and r.p99 == 8.0

    def test_state_is_bounded_by_bins(self, spark):
        """10k distinct values collapse to <= n_bins counter rows before
        the quantile pick — the sketch property."""
        from pyspark.sql import functions as F

        from dipper_spark.operators.sketches import histogram_quantiles

        df = spark.range(10000).select(
            F.lit("g").alias("grp"), (F.col("id") % 7919).cast("double").alias("v")
        )
        out = histogram_quantiles(
            df, "v", ["grp"], {"p50": 0.5}, lo=0.0, hi=8192.0, n_bins=64
        )
        [r] = out.collect()
        assert r.n_total == 10000 and r.p50 is not None
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in plan  # map-side combine to sketch size


class TestRrfFuse:
    def test_fusion_math_and_absence_handling(self, spark):
        from pyspark.sql import functions as F

        from dipper_spark.operators.search import rrf_fuse

        lex = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["id", "rank"])
        sem = spark.createDataFrame([(3, 1), (4, 2)], ["id", "rank"])
        out = {r.id: r for r in rrf_fuse({"lex": lex, "sem": sem}, k_const=60, k=10).collect()}
        # doc 3 is in both arms -> 1/63 + 1/61
        assert abs(out[3].rrf_score - (1 / 63 + 1 / 61)) < 1e-6
        # doc 4 only semantic -> 1/62, lex_rank NULL
        assert out[4].lex_rank is None
        assert abs(out[4].rrf_score - 1 / 62) < 1e-6
        # overall order: 3 (two arms) first
        assert min(out.values(), key=lambda r: r.rank).id == 3

    def test_topk_truncation_and_tie_break(self, spark):
        from dipper_spark.operators.search import rrf_fuse

        lex = spark.createDataFrame([(i, i) for i in range(1, 9)], ["id", "rank"])
        sem = spark.createDataFrame([(i, i) for i in range(1, 9)], ["id", "rank"])
        out = rrf_fuse({"lex": lex, "sem": sem}, k=3).collect()
        assert [r.id for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]


class TestHyperLogLog:
    def test_estimate_within_rated_error(self, spark):
        from dipper_spark.operators.sketches import hll_estimate, hll_registers

        # 5000 distinct >> 2.5*m=2560 -> raw alpha-m branch; rated rse
        # for m=1024 is 1.04/sqrt(m) ~ 3.25%
        df = spark.createDataFrame(
            [("g", f"item-{i}") for i in range(5000)] * 2, ["g", "t"]
        )
        reg = hll_registers(df, "t", ["g"], p=10)
        out = hll_estimate(reg, ["g"], p=10).first()
        assert abs(out.estimate - 5000) / 5000 < 0.10  # 3 sigma

    def test_small_range_correction_branch(self, spark):
        from dipper_spark.operators.sketches import hll_estimate, hll_registers

        # 300 distinct << 2.5*m -> linear-counting correction branch,
        # which is much tighter than the raw estimator down here
        df = spark.createDataFrame([("g", f"x{i}") for i in range(300)], ["g", "t"])
        out = hll_estimate(hll_registers(df, "t", ["g"], p=10), ["g"], p=10).first()
        assert abs(out.estimate - 300) / 300 < 0.05

    def test_registers_merge_by_group_max(self, spark):
        from dipper_spark.operators.sketches import hll_registers

        rows = [("g", f"k{i}") for i in range(600)]
        half1 = spark.createDataFrame(rows[:300], ["g", "t"])
        half2 = spark.createDataFrame(rows[300:], ["g", "t"])
        whole = {
            (r.bucket): r.rho
            for r in hll_registers(half1.unionAll(half2), "t", ["g"], p=8).collect()
        }
        # merge = per-bucket MAX across shard sketches
        merged: dict = {}
        for part in (half1, half2):
            for r in hll_registers(part, "t", ["g"], p=8).collect():
                merged[r.bucket] = max(merged.get(r.bucket, 0), r.rho)
        assert merged == whole

    def test_insert_order_and_duplication_invariant(self, spark):
        from dipper_spark.operators.sketches import hll_estimate, hll_registers

        items = [f"v{i}" for i in range(1000)]
        a = spark.createDataFrame([("g", t) for t in items], ["g", "t"])
        b = spark.createDataFrame(
            [("g", t) for t in reversed(items * 3)], ["g", "t"]
        )
        fp = lambda df: hll_estimate(
            hll_registers(df, "t", ["g"], p=10), ["g"], p=10
        ).first().registers_fp
        assert fp(a) == fp(b)

    def test_null_items_do_not_forge_a_register(self, spark):
        """NULL never counts toward COUNT(DISTINCT x); unfiltered it would
        hash to a NULL bucket with the maximal rho (md5(NULL) -> NULL ->
        _bit_length CASE falls to ELSE 0) and inflate the estimate."""
        from pyspark.sql import functions as F

        from dipper_spark.operators.sketches import hll_registers

        clean = spark.createDataFrame(
            [("g", f"v{i}") for i in range(50)], ["g", "t"]
        )
        dirty = clean.unionAll(
            clean.limit(5).select("g", F.lit(None).cast("string").alias("t"))
        )
        reg_c = {(r.bucket, r.rho) for r in hll_registers(clean, "t", ["g"]).collect()}
        reg_d = {(r.bucket, r.rho) for r in hll_registers(dirty, "t", ["g"]).collect()}
        assert reg_c == reg_d
        assert not any(b is None for b, _ in reg_d)


class TestPmiCollocations:
    def test_planted_collocation_outranks_common_pair(self, spark):
        from dipper_spark.operators.search import pmi_collocations

        # "new york" only ever occur together; filler words pair freely
        filler = "the of and to in for on at by it"
        docs = [(i, f"new york {filler}") for i in range(6)] + [
            (i + 10, " ".join(filler.split()[::-1])) for i in range(6)
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = pmi_collocations(df, "text", min_count=3, k=5).collect()
        assert out[0].bigram == "new york"
        # perfectly-bound pair: c(ab)=c(a.)=c(.b)=6 -> lift = N/6
        r = out[0]
        assert (r.n_ab, r.n_a, r.n_b) == (6, 6, 6)
        import math

        n_total = 6 * 11 + 6 * 9  # bigrams per doc: len-1
        assert abs(r.pmi - round(math.log(n_total / 6), 6)) < 1e-9

    def test_min_count_prunes_rare_pairs(self, spark):
        from dipper_spark.operators.search import pmi_collocations

        df = spark.createDataFrame(
            [(1, "rare pair"), (2, "a b a b a b a b")], ["doc_id", "text"]
        )
        got = {r.bigram for r in pmi_collocations(df, "text", min_count=2, k=10).collect()}
        assert "rare pair" not in got and "a b" in got


class TestKeySkew:
    def test_hand_computed_concentration(self, spark):
        from dipper_spark.operators.aggregates import key_skew_stats

        # group 'a': key k0 owns 8 of 12 rows; 4 singleton keys
        rows = [("a", "k0")] * 8 + [("a", f"k{i}") for i in range(1, 5)]
        # group 'b': perfectly uniform, 3 keys x 2 rows
        rows += [("b", f"u{i % 3}") for i in range(6)]
        df = spark.createDataFrame(rows, ["g", "k"])
        got = {r.g: r for r in key_skew_stats(df, "g", "k", top_n=2).collect()}
        a = got["a"]
        assert (a.n_rows, a.n_keys, a.max_key_rows) == (12, 5, 8)
        assert a.top1_share == round(8 / 12, 6)
        assert a.topn_share == round(9 / 12, 6)  # top-2 keys: 8 + 1
        assert a.skew_ratio == round(8 * 5 / 12, 6)  # max / mean
        b = got["b"]
        assert b.skew_ratio == 1.0 and b.top1_share == round(2 / 6, 6)

    def test_runs_on_count_table_not_rows(self, spark):
        from dipper_spark.operators.aggregates import key_skew_stats

        df = spark.createDataFrame([("g", f"k{i % 7}") for i in range(100)], ["g", "k"])
        plan = (
            key_skew_stats(df, "g", "k")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the raw-row frame is reduced by ONE keyed hash-agg; the window
        # (top-n phase) must sit above aggregated data, and nothing
        # python-side touches the path
        assert "Python" not in plan and "CartesianProduct" not in plan


class TestKneserNey:
    def test_hand_computed_all_three_branches(self, spark):
        from dipper_spark.operators.search import kneser_ney_logprob

        train = spark.createDataFrame([(1, "a b a b a c")], ["doc_id", "text"])
        # doc 10: seen bigram + unseen-bigram-with-seen-context (OOV w2)
        # doc 20: unseen context -> pure continuation backoff
        heldout = spark.createDataFrame(
            [(10, "a b z"), (20, "z a")], ["doc_id", "text"]
        )
        got = {
            r.id: r
            for r in kneser_ney_logprob(train, heldout, "doc_id", "text").collect()
        }
        # model: c(ab)=2 c(ba)=2 c(ac)=1; c1(a)=3,N1+(a,.)=2; c1(b)=2,N1+(b,.)=1
        # T=3 bigram types; V=|{a,b,c}|+1=4; pc(w)=(N1+(.,w)+1)/(T+V)
        pc_b, pc_z, pc_a = 2 / 7, 1 / 7, 2 / 7
        p_ab = (2 - 0.75) / 3 + 0.75 * 2 / 3 * pc_b
        p_bz = 0.0 + 0.75 * 1 / 2 * pc_z
        assert got[10].n_bigrams == 2
        assert got[10].avg_logprob == round(
            (math.log(p_ab) + math.log(p_bz)) / 2, 6
        )
        assert got[20].n_bigrams == 1
        assert got[20].avg_logprob == round(math.log(pc_a), 6)

    def test_seen_mass_plus_backoff_sums_to_one_per_context(self, spark):
        from dipper_spark.operators.search import kneser_ney_logprob

        # KN is a proper distribution: summing p(w|ctx) over the full vocab
        # (+OOV escape leftovers) stays <= 1 for every seen context
        train = spark.createDataFrame(
            [(1, "x y x z y x w z x y")], ["doc_id", "text"]
        )
        vocab = ["x", "y", "z", "w"]
        probes = spark.createDataFrame(
            [(100 + i * 10 + j, f"{a} {b}") for i, a in enumerate(vocab)
             for j, b in enumerate(vocab)],
            ["doc_id", "text"],
        )
        rows = kneser_ney_logprob(train, probes, "doc_id", "text").collect()
        by_ctx: dict = {}
        for r in rows:
            ctx = (r.id - 100) // 10
            by_ctx.setdefault(ctx, 0.0)
            by_ctx[ctx] += math.exp(r.avg_logprob)  # n_bigrams == 1 each
        for ctx, total in by_ctx.items():
            assert total <= 1.0 + 1e-9, (ctx, total)


class TestCalibrationBins:
    def test_hand_computed_bins_and_clamping(self, spark):
        from dipper_spark.operators.aggregates import calibration_bins

        rows = [
            (-1.5, 1),   # below lo -> clamped into bin 0
            (-0.95, 0),  # bin 0
            (0.05, 1),   # bin 5
            (0.05, 1),
            (0.05, 0),
            (0.999, 1),  # bin 9
            (1.5, 0),    # above hi -> clamped into bin 9
        ]
        df = spark.createDataFrame(rows, ["s", "y"])
        got = {r.bin: r for r in calibration_bins(df, "s", "y").collect()}
        assert set(got) == {0, 5, 9}
        assert (got[0].n_rows, got[0].n_positive) == (2, 1)
        assert got[0].frac_positive == 0.5
        assert (got[5].n_rows, got[5].n_positive) == (3, 2)
        assert got[5].frac_positive == round(2 / 3, 6)
        assert (got[9].n_rows, got[9].n_positive) == (2, 1)
        assert got[5].bin_lo == 0.0 and got[0].bin_lo == -1.0


class TestSpearmanRho:
    def test_perfect_reverse_and_tied(self, spark):
        from dipper_spark.operators.aggregates import spearman_rho

        rows = (
            # group p: b = a (monotone) -> rho = 1
            [("p", float(i), float(i * 10)) for i in range(5)]
            # group q: b reversed -> rho = -1
            + [("q", float(i), float(-i)) for i in range(5)]
            # group t: a has a 2-way tie; hand-computed tie-aware rho
            + [("t", 1.0, 1.0), ("t", 1.0, 2.0), ("t", 2.0, 3.0)]
            # group s: singleton -> NULL
            + [("s", 1.0, 1.0)]
            # group c: constant a (variance 0) -> NULL, not a fake 0.5
            + [("c", 1.0, 1.0), ("c", 1.0, 2.0), ("c", 1.0, 3.0)]
        )
        df = spark.createDataFrame(rows, ["g", "a", "b"])
        got = {r.g: r for r in spearman_rho(df, "g", "a", "b").collect()}
        assert got["p"].rho == 1.0
        assert got["q"].rho == -1.0
        assert got["s"].rho is None
        assert got["c"].rho is None
        # t: ranks_a = [1.5, 1.5, 3], ranks_b = [1, 2, 3]; TRUE Spearman is
        # Pearson on the ranks: cov = 1.5, var_a = 1.5, var_b = 2
        # -> rho = 1.5 / sqrt(3) = 0.866025 (the d2 shortcut said 0.875)
        import math

        assert got["t"].rho == round(1.5 / math.sqrt(3.0), 6)

    def test_single_group_shuffle(self, spark):
        from dipper_spark.operators.aggregates import spearman_rho

        df = spark.createDataFrame(
            [("g", float(i % 7), float((i * 3) % 11)) for i in range(50)],
            ["g", "a", "b"],
        )
        out = spearman_rho(df, "g", "a", "b")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # both rank windows must share one group-keyed exchange (plus the
        # agg's own); never more than 2 hash exchanges, nothing python-side
        assert plan.count("Exchange hashpartitioning") <= 2
        assert "Python" not in plan


class TestLDiversity:
    def test_constant_sensitive_group_flagged(self, spark):
        from dipper_spark.operators.governance import l_diversity_report

        rows = (
            [("US", "auto", 100.0)] * 5            # k=5 but constant band
            + [("DE", "auto", float(v)) for v in (0, 600, 1200)]  # 3 bands
        )
        df = spark.createDataFrame(rows, ["nat", "seg", "band"])
        got = {(r.nat, r.seg): r for r in
               l_diversity_report(df, ["nat", "seg"], "band", l=3).collect()}
        us = got[("US", "auto")]
        # size-5 group passes k-anonymity yet leaks: 1 distinct value
        assert (us.group_n, us.l_distinct, us.diverse) == (5, 1, 0)
        de = got[("DE", "auto")]
        assert (de.group_n, de.l_distinct, de.diverse) == (3, 3, 1)


class TestWorstWindow:
    def test_planted_rare_block_is_localized(self, spark):
        from dipper_spark.operators.search import worst_window_logprob

        common = ("the quick brown fox jumps over lazy dogs daily now " * 4).split()
        rare_block = [f"zxq{i}" for i in range(4)]
        # doc 1: rare block planted at token offset 20
        doc1 = " ".join(common[:20] + rare_block + common[20:])
        # doc 2: all common -> its worst window is still common-ish
        doc2 = " ".join(common)
        df = spark.createDataFrame([(1, doc1), (2, doc2)], ["doc_id", "text"])
        got = {r.id: r for r in
               worst_window_logprob(df, "doc_id", "text", window=6).collect()}
        # the minimizing 6-token window must cover all 4 rare tokens:
        # starts in [18, 20] (window spans start..start+5, block is 20..23)
        assert 18 <= got[1].win_start <= 20, got[1]
        assert got[1].win_lp_micro < got[2].win_lp_micro

    def test_short_docs_drop_out(self, spark):
        from dipper_spark.operators.search import worst_window_logprob

        df = spark.createDataFrame(
            [(1, "too short"), (2, " ".join(f"w{i}" for i in range(12)))],
            ["doc_id", "text"],
        )
        out = worst_window_logprob(df, "doc_id", "text", window=10).collect()
        assert [r.id for r in out] == [2]
        assert out[0].win_start in (0, 1, 2)  # 12 tokens -> starts 0..2


class TestChi2Keyness:
    def test_planted_marker_token_tops_its_source(self, spark):
        from dipper_spark.operators.search import chi2_keyness

        shared = "the of and to in " * 4
        rows = [(i, "s1", shared + "alpha alpha alpha") for i in range(5)] + [
            (i + 10, "s2", shared + "beta beta beta") for i in range(5)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        got = chi2_keyness(df, "source", "text", k=3, min_count=5).collect()
        top = {r.group: r.token for r in got if r.rank == 1}
        # each source's most distinctive token is its planted marker
        assert top == {"s1": "alpha", "s2": "beta"}
        # shared function words are never over-represented in either
        assert all(r.token not in {"the", "of", "and", "to", "in"} for r in got)
        # chi2 of a perfectly-separating marker: hand check it is large
        assert all(r.chi2 > 10 for r in got if r.rank == 1)

    def test_degenerate_single_group_returns_empty_not_nan(self, spark):
        """One group means n_s == n: e21/e22 are zero and chi2 would be NaN
        — which sorts ABOVE real values under DESC and corrupts the top-k.
        The guard drops those rows; result is empty, never NaN-ranked."""
        from dipper_spark.operators.search import chi2_keyness

        df = spark.createDataFrame(
            [(i, "only", "alpha beta gamma alpha beta alpha " * 3)
             for i in range(5)],
            ["doc_id", "source", "text"],
        )
        assert chi2_keyness(df, "source", "text", k=3, min_count=2).count() == 0

    def test_degenerate_single_token_returns_empty_not_nan(self, spark):
        """One distinct token means n_t == n for it: e12/e22 are zero."""
        from dipper_spark.operators.search import chi2_keyness

        df = spark.createDataFrame(
            [(1, "s1", "word word word"), (2, "s2", "word word")],
            ["doc_id", "source", "text"],
        )
        assert chi2_keyness(df, "source", "text", k=3, min_count=2).count() == 0


class TestSelfJoinSizeF2:
    def test_upper_bound_and_tightness_without_collisions(self, spark):
        from dipper_spark.operators.sketches import count_min_build

        # 5 keys with counts 1..5: exact F2 = 55; width 256 >> 5 keys means
        # collisions are improbable -> the CMS inner product is EXACT
        rows = [(f"k{i}",) for i in range(1, 6) for _ in range(i)]
        df = spark.createDataFrame(rows, ["k"])
        cms = count_min_build(df, "k", depth=3, width=256)
        per_d = {
            r.d: r.s
            for r in cms.groupBy("d").agg(F.sum(F.col("c") * F.col("c")).alias("s")).collect()
        }
        assert min(per_d.values()) == 55
        # width 2 forces collisions: estimate must only ever grow
        tight = count_min_build(df, "k", depth=3, width=2)
        per_d2 = [
            r.s
            for r in tight.groupBy("d").agg(F.sum(F.col("c") * F.col("c")).alias("s")).collect()
        ]
        assert min(per_d2) >= 55


class TestDriftPsi:
    def test_identical_halves_zero_and_shift_positive(self, spark):
        from dipper_spark.plans import QUERIES  # noqa: F401 - registry import

        from dipper_spark.plans.catalog_search import q_drift_psi

        import tempfile, os
        # synth corpus: even/odd halves identical -> every term ~0
        filler = "the of and to in for on at by it is was"
        same = [(i, filler, "en", "s", len(filler)) for i in range(40)]
        with tempfile.TemporaryDirectory() as d:
            spark.createDataFrame(
                same, ["doc_id", "text", "lang", "source", "n_chars"]
            ).write.parquet(os.path.join(d, "documents.parquet"))
            rows = q_drift_psi(spark, d).collect()
            assert sum(r.psi_term_nano for r in rows) == 0
        # shifted: odd half gets much longer docs (higher quality score)
        shifted = [
            (i, filler if i % 2 == 0 else " ".join([filler] * 12), "en", "s", 1)
            for i in range(40)
        ]
        with tempfile.TemporaryDirectory() as d:
            spark.createDataFrame(
                shifted, ["doc_id", "text", "lang", "source", "n_chars"]
            ).write.parquet(os.path.join(d, "documents.parquet"))
            rows = q_drift_psi(spark, d).collect()
            total = sum(r.psi_term_nano for r in rows) / 1e9
            assert total > 0.25  # industry "significant shift" threshold


class TestAnnCatalogRecallFloor:
    def test_ivfpq_catalog_config_recall_floor(self, spark, sf_dir):
        """Round-12 verdict item #3: the catalog's residual-PQ capacity must
        stay at a configuration its own measurement calls useful.  The r12
        catalog ran 16x16x1 (mean recall@5 ~0.26 on this fixture) while
        docs/ANN_TRADEOFF.md finding #3 prescribed 16x64+; the catalog now
        runs 16x64x2 (measured 0.44 here) and this floor makes the gap
        structural — an oracle-matched-but-useless config (the oracle only
        proves the machinery, not the capacity) goes red below 0.35."""
        from dipper_spark.plans import QUERIES

        rows = QUERIES["q_ann_ivfpq_recall"](spark, sf_dir).collect()
        mean_recall = sum(r.recall for r in rows) / len(rows)
        assert mean_recall >= 0.35, f"catalog ADC recall@5 {mean_recall}"
