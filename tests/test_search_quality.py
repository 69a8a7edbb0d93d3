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
