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
