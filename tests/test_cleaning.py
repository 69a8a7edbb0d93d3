"""Unit tests for corpus-cleaning operators (PII + boilerplate strip)."""

import pyspark.sql.functions as F

from dipper_spark.operators.cleaning import (
    collapse_token_runs,
    pii_counts,
    redact_pii,
    strip_boilerplate_chunks,
)


def test_pii_redaction_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "reach me at jo.doe+x@mail-srv.example.org or 12-345-678-9012"),
            (2, "server 10.0.255.3 logged 2 hits"),
            (3, "nothing sensitive here"),
        ],
        ["id", "t"],
    )
    out = df.select(
        "id",
        redact_pii("t").alias("r"),
        *[v.alias(k) for k, v in pii_counts("t").items()],
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[1].r == "reach me at [EMAIL] or [PHONE]"
    assert rows[1].email == 1 and rows[1].phone == 1 and rows[1].ip == 0
    assert rows[2].r == "server [IP] logged 2 hits"
    assert rows[2].ip == 1
    assert rows[3].r == "nothing sensitive here"
    assert rows[3].email == rows[3].phone == rows[3].ip == 0


def test_redaction_placeholders_not_rematched(spark):
    # the chain order (email -> phone -> ip) must not let a placeholder be
    # consumed by a later pattern
    df = spark.createDataFrame([(1, "a@b.co 11-222-333-4444 1.2.3.4")], ["id", "t"])
    assert df.select(redact_pii("t").alias("r")).collect()[0].r == \
        "[EMAIL] [PHONE] [IP]"


def test_strip_boilerplate_preserves_order(spark):
    boiler = " ".join(["footer"] * 10)          # one 10-token hot chunk
    uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(10))
    rows = [
        (1, uniq("a") + " " + boiler + " " + uniq("b")),
        (2, uniq("c") + " " + boiler),
        (3, uniq("d") + " " + boiler),
        (4, boiler),                             # all-boilerplate doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.id: r
        for r in strip_boilerplate_chunks(df, "doc_id", "text", 10, max_doc_freq=2).collect()
    }
    # the footer chunk occurs in 4 > 2 docs -> stripped everywhere; the
    # surviving chunks keep their original order (a... before b...)
    assert out[1].clean_text == uniq("a") + " " + uniq("b")
    assert out[1].n_chunks == 3 and out[1].n_dropped == 1
    assert out[2].clean_text == uniq("c")
    # the all-boilerplate doc SURFACES with empty text, not as a lost row
    assert out[4].clean_text == "" and out[4].n_dropped == 1


def test_strip_keeps_intra_doc_repetition(spark):
    # a chunk repeated WITHIN one doc is repetition, not boilerplate:
    # doc frequency is distinct-doc-based, so it survives
    chunk = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, chunk + " " + chunk), (2, " ".join(f"x{i}" for i in range(10)))],
        ["doc_id", "text"],
    )
    out = {
        r.id: r
        for r in strip_boilerplate_chunks(df, "doc_id", "text", 10, max_doc_freq=1).collect()
    }
    assert out[1].n_dropped == 0 and out[1].clean_text == chunk + " " + chunk


# ---- consecutive-duplicate-token scrub --------------------------------------


def test_collapse_token_runs_semantics(spark):
    from dipper_spark.functions.text import tokens

    rows = [
        (1, "the the the cat cat sat"),   # runs collapse to one survivor
        (2, "a b a b"),                   # non-adjacent recurrence untouched
        (3, "x"),                         # singleton passes through
        (4, "go go go go go go"),         # all-run doc keeps exactly one
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r.kept
        for r in df.select(
            "doc_id", collapse_token_runs(tokens("text")).alias("kept")
        ).collect()
    }
    assert out[1] == ["the", "cat", "sat"]
    assert out[2] == ["a", "b", "a", "b"]
    assert out[3] == ["x"]
    assert out[4] == ["go"]


# ---- bloom filter (operators/sketches.py) -----------------------------------


def test_bloom_no_false_negatives_and_mergeable(spark):
    from dipper_spark.operators.sketches import bloom_build, bloom_probe

    items = spark.createDataFrame([(f"key-{i}",) for i in range(200)], ["k"])
    bits = bloom_build(items, "k", k=3, m=4096)
    assert bits.count() <= 4096
    # every inserted key MUST read maybe_present (no false negatives)
    got = {r.k: r.maybe_present for r in bloom_probe(bits, items, "k", 3, 4096).collect()}
    assert all(got.values()) and len(got) == 200
    # novel keys are mostly absent (m=4096, 600 set bits -> fp rate ~0.3%)
    novel = spark.createDataFrame([(f"novel-{i}",) for i in range(200)], ["k"])
    nv = [r.maybe_present for r in bloom_probe(bits, novel, "k", 3, 4096).collect()]
    assert sum(nv) <= 5
    # merging two filters is UNION+DISTINCT of bit rows: a key inserted in
    # either shard reads present in the merged filter
    items2 = spark.createDataFrame([(f"other-{i}",) for i in range(50)], ["k"])
    merged = bits.unionByName(bloom_build(items2, "k", 3, 4096)).distinct()
    got2 = {
        r.k: r.maybe_present
        for r in bloom_probe(merged, items.unionByName(items2), "k", 3, 4096).collect()
    }
    assert all(got2.values()) and len(got2) == 250
