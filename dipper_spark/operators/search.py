"""Full-text relevance operators for corpus curation: BM25 query scoring
and per-document TF-IDF keyword extraction.

Beyond-reference operators (SURVEY §2's LLM-pipeline section): a
training-data pipeline needs lexical retrieval both for corpus inspection
("show me the docs most about X") and for targeted quality/topic filtering.
Both operators are pure relational plans — no UDFs, no driver loops — and
their arithmetic is written so a SQL oracle reproduces it bit-for-bit:

- global corpus statistics (N, avg doc length, per-term doc frequency) are
  integer-valued, and the average is computed as exact-integer sum/count, so
  every downstream double is a deterministic function of integers;
- BM25 per-document scores sum the per-term contributions in FIXED textual
  term order inside one map-side expression (never a groupBy SUM whose
  float addition order would depend on shuffle arrival).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dipper_spark.functions.text import tokens
from dipper_spark.operators.util import ensure_parallelism

_TERM_RE = re.compile(r"^[a-z0-9]+$")


def _tf(term: str) -> Column:
    """Term frequency inside the pre-tokenized ``_toks`` array.

    SQL-text lambda, not F.filter(python_lambda): pyspark 4.1 reuses
    lambda-variable ids across multiple higher-order functions in one
    select (see operators/dedup.py:_signatures_from_sets) — with one tf
    column per query term in a single select, expr() keeps each lambda in
    its own scope."""
    assert _TERM_RE.match(term), f"query term must be [a-z0-9]+: {term!r}"
    return F.expr(f"CAST(size(filter(_toks, x -> x = '{term}')) AS DOUBLE)")


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-``k`` documents for a bag of query terms.

    score(d) = Σ_t  ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
                    · tf_td·(k1+1) / (tf_td + k1·(1 - b + b·|d|/avgdl))

    Plan shape (the scale path): one corpus scan computes per-term tf and
    doc length map-side; a single tiny aggregate derives ALL global stats
    (N, Σ|d|, per-term document frequencies) as parallel aggregates in one
    pass; the 1-row stats frame broadcasts back over the scan; scoring is a
    map-side expression; the final top-k compiles to TakeOrderedAndProject
    (per-partition partial top-k, no global sort).  Total cost: two corpus
    scans, zero wide shuffles — at 100 TB the stats row is bytes.

    Determinism: avgdl = Σ|d|/N is exact (integer-valued doubles below 2^53
    sum exactly in any order); tf/df/N are integers; the per-doc score adds
    its ≤|query| terms in fixed textual order — so the score doubles are
    bit-identical on any engine and the (score DESC, id) ranking is stable.

    Returns (id, score, rank), score rounded to 6, rank 1..k.
    """
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), tokens(text_col).alias("_toks")
    )
    base = base.select(
        "id",
        F.size("_toks").cast("double").alias("dl"),
        *[_tf(t).alias(f"tf{i}") for i, t in enumerate(query_terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf{i}") > 0, 1)).cast("double").alias(f"df{i}")
            for i in range(len(query_terms))
        ],
    )
    score = None
    for i in range(len(query_terms)):
        tf, dfi = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log(
            F.lit(1.0) + (F.col("n_docs") - dfi + F.lit(0.5)) / (dfi + F.lit(0.5))
        )
        contrib = idf * tf * F.lit(k1 + 1.0) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
        score = contrib if score is None else score + contrib
    scored = (
        base.crossJoin(F.broadcast(stats))
        .withColumn("score", score)
        .filter(F.col("score") > 0)  # exact: all-zero tf sums to exactly 0.0
        .select("id", "score")
    )
    top = scored.orderBy(F.desc("score"), "id").limit(k)
    w = Window.orderBy(F.desc("score"), "id")
    return top.select(
        "id",
        F.round("score", 6).alias("score"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


def unigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram distribution — the cheap LM-quality proxy (CCNet-style
    perplexity filtering, degraded to order-0): documents of rare/garbage
    tokens score low, fluent in-distribution text scores high.

    Plan shape: explode → corpus term frequencies by hash-agg (map-side
    combine) → frequency joined back on the term key → per-doc sum/count.
    The total-token scalar is a broadcast 1-row frame.  Two keyed shuffles
    (term, then doc id), both with partial aggregation — no UDFs, no
    driver state.

    Returns (id, n_tokens, avg_logprob) with avg_logprob = Σ ln(cnt/T)/n
    rounded to 6 (per-doc float summation is ~hundreds of terms; the
    1e-13-scale order sensitivity is far below the rounding grain).
    """
    tok = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term")
    )
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = tok.agg(F.count(F.lit(1)).cast("double").alias("t"))
    return (
        tok.join(freq, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.log(F.col("cnt") / F.col("t"))).alias("_s"),
        )
        .select(
            "id",
            "n_tokens",
            F.round(F.col("_s") / F.col("n_tokens"), 6).alias("avg_logprob"),
        )
    )


def tfidf_keywords(
    df: DataFrame, id_col: str, text_col: str, top_n: int = 3
) -> DataFrame:
    """Per-document top-``top_n`` keywords by TF-IDF (raw term count ×
    ln(N/df)), ties broken lexically by term.

    Plan shape: tokenize + explode → (doc, term) hash-agg for tf (map-side
    partial combine absorbs within-partition repeats); term doc-frequency
    is a second hash-agg OVER THE TF TABLE (already one row per (doc,term),
    so df = count(*) — no distinct needed); df joins back on the term key
    (AQE broadcasts it when the vocabulary is small, sort-merge otherwise —
    natural-language vocabularies grow ~O(corpus^0.5) [Heaps' law], so the
    join stays far below corpus scale); final per-doc ranking is one window
    over the doc key.

    Determinism: tfidf = tf·ln(N/df) is a pure function of three integers —
    identical doubles on any engine; equal scores tie-break on the term.

    Returns (id, term, tfidf, rank) with tfidf rounded to 6.
    """
    tok = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term")
    )
    # tf feeds both the doc-frequency aggregate and the scoring join —
    # checkpoint once so tokenize + the (doc, term) count shuffle are not
    # re-run per consumer (guide §1.2)
    tf = (
        tok.groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dft"))
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("dft")))
    )
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_n)
        .select("id", "term", F.round("tfidf", 6).alias("tfidf"), "rank")
    )


def hashed_linear_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    weight_seed: str = "w",
) -> DataFrame:
    """Hashing-trick linear text classifier (fastText/CCNet-shape quality
    scorer): each token hashes into one of ``n_buckets`` feature buckets,
    each bucket carries a fixed weight in [-1, 1), and a document's score
    is the mean bucket weight over its tokens.

    The weight table is IMPLICIT — weight(b) = md5-fraction(seed ':' b)
    rescaled to [-1, 1) — so the "model" ships as pure expression text: no
    broadcast table, no UDF, and a SQL oracle reproduces it exactly (both
    hash draws are 32-bit md5 prefixes over 2^32, exactly representable as
    doubles).  A real trained model drops in by replacing the weight
    lambda with a broadcast map lookup; the plan shape is unchanged.

    Plan shape: one map-side pass — tokenize, fold the per-token weights
    in array order inside a single ``aggregate`` lambda (fixed float
    addition order, no shuffle).  At 100 TB this scores at scan speed,
    which is the point of the hashing trick: the feature space never
    materializes.

    Returns (id, n_tokens, clf_score rounded to 6, label 0/1 int).
    """
    bucket = (
        f"CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT) % {n_buckets}"
    )
    weight = (
        f"(CAST(conv(substring(md5(concat('{weight_seed}:', "
        f"CAST({bucket} AS STRING))), 1, 8), 16, 10) AS DOUBLE) "
        f"/ 4294967296.0) * 2.0 - 1.0"
    )
    fold = F.expr(
        f"aggregate(_toks, CAST(0.0 AS DOUBLE), (acc, t) -> acc + ({weight}))"
    )
    # NOTE round 14: an internal ensure_parallelism was measured here and
    # REVERTED — the hashing fold is light enough that the round-robin
    # exchange costs more than the spread gains for the scorer's pure
    # consumers (q_quality_classifier 0.23 -> 0.45 s, q_rank_corr 0.7 ->
    # 1.3 s at sf1.0).  Callers that pair the score with a HEAVY second
    # branch (quality_rules) spread the input themselves — q_calibration
    # went 5.3-6.7 -> 1.5 s at sf1.0 doing exactly that.
    base = df.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("_toks")
    ).withColumn("_n", F.size("_toks").cast("long"))
    return base.select(
        "id",
        F.col("_n").alias("n_tokens"),
        F.round(fold / F.col("_n"), 6).alias("clf_score"),
        (fold / F.col("_n") > 0).cast("int").alias("label"),
    )


def bigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Mean bigram log-probability per document under the corpus's own
    order-1 LM — one rung up the perplexity-filter ladder from
    :func:`unigram_logprob` (CCNet-style: flag documents whose local word
    order is improbable even when their vocabulary is normal).

    p(b | a) = count(a b) / count(a ·), both counts over corpus bigram
    occurrences, so the model is closed over the corpus and needs no
    smoothing (every observed bigram has positive probability).

    Plan shape: one bigram explode; two hash aggregations (bigram counts,
    prefix counts — both map-side partial); two equi-joins back on the
    count keys; one per-doc aggregation.  Everything keys on token
    strings, no UDFs.  Docs with < 2 tokens drop out (no bigrams).
    """
    from dipper_spark.operators.util import exploded_word_ngrams

    bg = exploded_word_ngrams(
        df.select(F.col(id_col).alias("id"), F.col(text_col)),
        ["id"],
        text_col,
        n=2,
        out="b",
    )
    # the exploded bigram stream feeds three consumers (bigram counts,
    # prefix counts, the scoring join base) — stage it once instead of
    # re-tokenizing the corpus per consumer (guide §1.2; the durable
    # 100 TB analog is a parquet staging write of the n-gram stream)
    bg = bg.localCheckpoint(eager=True)
    c2 = bg.groupBy("b").agg(F.count(F.lit(1)).alias("cnt2"))
    c1 = (
        bg.select(F.split(F.col("b"), " ").getItem(0).alias("a"))
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("cnt1"))
    )
    scored = (
        bg.join(c2, "b")
        .withColumn("a", F.split(F.col("b"), " ").getItem(0))
        .join(c1, "a")
        .withColumn(
            "lp", F.log(F.col("cnt2").cast("double") / F.col("cnt1").cast("double"))
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.sum("lp") / F.count(F.lit(1)), 6).alias("avg_logprob"),
    )


def rrf_fuse(
    arms: dict[str, DataFrame],
    id_col: str = "id",
    rank_col: str = "rank",
    k_const: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of named ranked lists:
    rrf(d) = Σ_arm 1/(k_const + rank_arm(d)), a document absent from an
    arm contributing 0 — the standard hybrid-retrieval combiner for a
    lexical (BM25) and a semantic (embedding cosine) arm.

    Scale shape: each arm arrives ALREADY truncated to its own top-N
    (bounded by construction — TakeOrdered on the arm side), so fusion
    operates on ≤ Σ N_arm rows however large the corpus: a union, one
    grouped sum, and a TakeOrdered top-``k``.  No corpus-sized input ever
    reaches this operator.

    Determinism: 1/(k_const + rank) is a pure function of integer rank;
    the per-doc sum adds arms in the fixed iteration order of ``arms``;
    ties break by id.

    Returns (id, <arm>_rank..., rrf_score, rank), score rounded to 6.
    """
    joined = None
    for name, arm in arms.items():
        a = arm.select(
            F.col(id_col).alias("id"), F.col(rank_col).alias(f"{name}_rank")
        )
        joined = a if joined is None else joined.join(a, "id", "full_outer")
    contribs = [
        F.coalesce(
            F.lit(1.0) / (F.lit(float(k_const)) + F.col(f"{name}_rank")), F.lit(0.0)
        )
        for name in arms
    ]
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    w = Window.orderBy(F.desc("rrf_score"), "id")
    return (
        joined.withColumn("rrf_score", score)
        .orderBy(F.desc("rrf_score"), "id")
        .limit(k)
        .select(
            "id",
            *[F.col(f"{name}_rank") for name in arms],
            F.round("rrf_score", 6).alias("rrf_score"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
    )


def pmi_collocations(
    df: DataFrame, text_col: str, min_count: int = 5, k: int = 50
) -> DataFrame:
    """Top-``k`` bigram collocations by pointwise mutual information over
    the corpus bigram stream (Church & Hanks 1990): for the contingency
    table of the bigram stream, lift(a,b) = c(ab)·N / (c(a·)·c(·b)) and
    pmi = ln(lift) — the association score that surfaces multi-word
    expressions ("los angeles") a frequency-only heavy-hitter report
    (``q_top_ngrams``) buries under common-word pairs.

    All marginals derive from ONE bigram aggregate (left/right sums over
    the (a,b) count table — aggregates of the aggregate, never a second
    corpus pass); the ``min_count`` filter lands BEFORE the marginal
    joins, so the joined frame is the collocation-candidate table, not
    the full bigram vocabulary.  N arrives as a broadcast 1-row frame.
    Global top-k compiles to TakeOrdered (no full sort).  ORDERING is on
    the lift DOUBLE, which is integer-ratio arithmetic — multiply/divide
    of exact integers, correctly rounded and cross-engine deterministic,
    unlike ordering on the libm ln() — pmi itself is display-rounded to
    6dp.
    """
    from dipper_spark.operators.util import exploded_word_ngrams

    bg = exploded_word_ngrams(df, [], text_col, n=2, out="b")
    ab = bg.select(
        F.split("b", " ").getItem(0).alias("a"),
        F.split("b", " ").getItem(1).alias("w2"),
    )
    # the count table feeds four consumers (both marginals, the total and
    # the join base); eagerly checkpoint it so the corpus explode + count
    # shuffle run once, not per consumer (guide §1.2) — the table is
    # bigram-vocabulary-bounded, the staging-write analog at scale
    cab = (
        ab.groupBy("a", "w2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .localCheckpoint(eager=True)
    )
    ca = cab.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    cb = cab.groupBy("w2").agg(F.sum("n_ab").alias("n_b"))
    tot = cab.agg(F.sum("n_ab").alias("n_total"))
    lift = (F.col("n_ab").cast("double") * F.col("n_total").cast("double")) / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    return (
        cab.filter(F.col("n_ab") >= min_count)
        .join(ca, "a")
        .join(cb, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            F.concat_ws(" ", "a", "w2").alias("bigram"),
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            lift.alias("_lift"),
            F.round(F.log(lift), 6).alias("pmi"),
        )
        .orderBy(F.desc("_lift"), "bigram")
        .limit(k)
        .drop("_lift")
    )


def kneser_ney_logprob(
    train: DataFrame,
    heldout: DataFrame,
    id_col: str,
    text_col: str,
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen &
    Goodman 1999, single discount) trained on ``train`` and scored on
    ``heldout`` — the real perplexity filter: unlike the closed-corpus
    :func:`bigram_logprob`, held-out scoring forces unseen-event mass, and
    KN assigns it by CONTINUATION counts (how many contexts a word
    completes), the fix for burstiness that plain add-k lacks.

    p_kn(w2|w1) = max(c(w1w2)−d, 0)/c(w1)
                  + d·N1+(w1,·)/c(w1) · p_cont(w2)
    p_cont(w2)  = (N1+(·,w2)+1) / (N1+(·,·)+V)      [+1/+V = OOV escape]
    unseen w1   → p_cont(w2) alone (unigram backoff).

    Every model table is an aggregate of the train bigram count table
    (type-bounded, never stream-sized); scalars (bigram-type total, vocab)
    ride a broadcast 1-row frame; held-out bigrams join the model on token
    keys.  All arithmetic is CAST-to-double with fixed association so a
    SQL oracle reproduces each probability bit-for-bit.
    """
    from dipper_spark.functions.text import tokens
    from dipper_spark.operators.util import exploded_word_ngrams

    d = float(discount)
    bg_t = exploded_word_ngrams(train, [], text_col, n=2, out="b")
    ab = bg_t.select(
        F.split("b", " ").getItem(0).alias("a"),
        F.split("b", " ").getItem(1).alias("w2"),
    )
    # four consumers (forward/reverse marginals, type total, heldout join)
    # — checkpoint the vocabulary-bounded bigram count table once so the
    # train-corpus explode + count shuffle are not re-run per consumer
    c2 = (
        ab.groupBy("a", "w2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .localCheckpoint(eager=True)
    )
    c1 = c2.groupBy("a").agg(
        F.sum("n_ab").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1p_fwd"),
    )
    cr = c2.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1p_rev"))
    consts = (
        c2.agg(F.count(F.lit(1)).cast("long").alias("t_types"))
        .crossJoin(
            train.select(F.explode(tokens(text_col)).alias("t"))
            .agg((F.countDistinct("t") + 1).cast("long").alias("v_size"))
        )
    )
    bg_h = exploded_word_ngrams(
        heldout.select(F.col(id_col).alias("id"), F.col(text_col)),
        ["id"],
        text_col,
        n=2,
        out="b",
    ).select(
        "id",
        F.split("b", " ").getItem(0).alias("a"),
        F.split("b", " ").getItem(1).alias("w2"),
    )
    j = (
        bg_h.join(c2, ["a", "w2"], "left")
        .join(c1, "a", "left")
        .join(cr, "w2", "left")
        .crossJoin(F.broadcast(consts))
    )
    pc = (F.coalesce(F.col("n1p_rev"), F.lit(0)) + 1).cast("double") / (
        F.col("t_types") + F.col("v_size")
    ).cast("double")
    seen = F.greatest(
        F.coalesce(F.col("n_ab"), F.lit(0)).cast("double") - F.lit(d), F.lit(0.0)
    ) / F.col("c1").cast("double") + F.lit(d) * F.col("n1p_fwd").cast(
        "double"
    ) / F.col("c1").cast("double") * pc
    p = F.when(F.col("c1").isNull(), pc).otherwise(seen)
    return j.select("id", p.alias("p")).groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.sum(F.log("p")) / F.count(F.lit(1)), 6).alias("avg_logprob"),
    )


def worst_window_logprob(
    df: DataFrame, id_col: str, text_col: str, window: int = 10
) -> DataFrame:
    """Quality LOCALIZATION: per document, the ``window``-token span with
    the lowest summed unigram log-probability under the corpus's own LM —
    doc-level scores (:func:`unigram_logprob`) tell you *that* a document
    is degenerate; this tells you *where* (the spam block, the encoding
    glitch, the keyword-stuffed footer), feeding span-level cleanup
    instead of whole-doc rejection.

    Per-token scores are integer MICRO-log-probs (round(ln p · 1e6)):
    windowed sums of BIGINTs are exact whatever the engine's frame
    evaluation order (DuckDB's segment-tree windowed aggregation sums
    pairwise, which is NOT ulp-stable for doubles — integers make the
    cross-engine question moot).  One token explode, a vocabulary-sized
    count join, one per-doc ordered window pass, one min-per-doc;
    documents shorter than ``window`` have no full span and drop out.

    Returns (id, win_start 0-based, win_lp_micro).
    """
    from dipper_spark.functions.text import tokens

    base = df.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("_toks")
    ).withColumn("n", F.size("_toks"))
    tok = base.select("id", "n", F.posexplode("_toks").alias("pos", "term"))
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    tot = tok.agg(F.count(F.lit(1)).cast("double").alias("t"))
    lp = tok.join(freq, "term").crossJoin(F.broadcast(tot)).select(
        "id",
        "n",
        "pos",
        F.round(F.log(F.col("cnt") / F.col("t")) * 1000000.0)
        .cast("long")
        .alias("micro"),
    )
    w = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    cand = lp.select(
        "id", "pos", "n", F.sum("micro").over(w).alias("win_lp")
    ).filter(F.col("pos") <= F.col("n") - window)
    from dipper_spark.operators.windows import topk_per_group

    return topk_per_group(
        cand, "id", [F.col("win_lp").asc(), F.col("pos").asc()], k=1
    ).select(
        "id",
        F.col("pos").cast("long").alias("win_start"),
        F.col("win_lp").cast("long").alias("win_lp_micro"),
    )


def chi2_keyness(
    df: DataFrame,
    group_col: str,
    text_col: str,
    k: int = 10,
    min_count: int = 5,
) -> DataFrame:
    """Distinctive vocabulary per group by chi-square keyness (the
    corpus-linguistics keyword statistic, cf. Rayson & Garside 2000 —
    chi-square rather than log-likelihood G² so the RANKING statistic is
    pure exact-input arithmetic: products/quotients of integer counts,
    four contingency terms summed in fixed textual order, no libm in a
    comparison position; see docs/ORACLE_DETERMINISM.md).

    For each (group, token): the 2×2 contingency of token-vs-rest ×
    group-vs-rest, χ² = Σ(O−E)²/E, kept only when over-represented
    (O11 > E11) and c(token, group) ≥ min_count.  Top-k per group via the
    salted two-phase top-k (groups are few; tokens unbounded at scale).

    All marginals are aggregates of the ONE (group, token) count table;
    the grand total rides a broadcast 1-row frame.  Returns (group,
    token, n_obs, chi2 rounded 6, rank).
    """
    from dipper_spark.functions.text import tokens
    from dipper_spark.operators.util import ensure_parallelism
    from dipper_spark.operators.windows import salted_topk_per_group

    tok = ensure_parallelism(df).select(
        F.col(group_col).alias("grp"), F.explode(tokens(text_col)).alias("t")
    )
    # four consumers of the one count table (group/token marginals, grand
    # total, join base) — checkpoint once so the corpus tokenize + count
    # shuffle are not re-run per consumer (the pmi_collocations discipline)
    cst = (
        tok.groupBy("grp", "t")
        .agg(F.count(F.lit(1)).alias("n_st"))
        .localCheckpoint(eager=True)
    )
    cs = cst.groupBy("grp").agg(F.sum("n_st").cast("long").alias("n_s"))
    ct = cst.groupBy("t").agg(F.sum("n_st").cast("long").alias("n_t"))
    tot = cst.agg(F.sum("n_st").cast("long").alias("n"))
    j = (
        cst.filter(F.col("n_st") >= min_count)
        .join(cs, "grp")
        .join(ct, "t")
        .crossJoin(F.broadcast(tot))
        # degenerate-input guard: with a single group (n_s == n) or a single
        # distinct token (n_t == n) the e12/e21/e22 denominators are 0 and
        # chi2 would be NaN — which sorts ABOVE real values in DESC order and
        # silently corrupts the top-k.  Such tokens/groups carry no keyness
        # signal (there is no "rest" to contrast against): drop them.
        .filter((F.col("n_s") < F.col("n")) & (F.col("n_t") < F.col("n")))
    )
    n_d = F.col("n").cast("double")
    cs_d = F.col("n_s").cast("double")
    ct_d = F.col("n_t").cast("double")
    o11 = F.col("n_st").cast("double")
    o12 = cs_d - o11
    o21 = ct_d - o11
    o22 = n_d - cs_d - ct_d + o11
    e11 = cs_d * ct_d / n_d
    e12 = cs_d * (n_d - ct_d) / n_d
    e21 = (n_d - cs_d) * ct_d / n_d
    e22 = (n_d - cs_d) * (n_d - ct_d) / n_d
    chi2 = (
        (o11 - e11) * (o11 - e11) / e11
        + (o12 - e12) * (o12 - e12) / e12
        + (o21 - e21) * (o21 - e21) / e21
        + (o22 - e22) * (o22 - e22) / e22
    )
    scored = j.filter(o11 > e11).select(
        "grp", "t", F.col("n_st").cast("long").alias("n_obs"), chi2.alias("_chi2")
    )
    return (
        salted_topk_per_group(
            scored,
            "grp",
            [F.desc("_chi2"), F.col("t")],
            k,
            salt_on=F.col("t"),
            rank_col="rank",
            keep_rank=True,
        )
        .select(
            F.col("grp").alias("group"),
            F.col("t").alias("token"),
            "n_obs",
            F.round("_chi2", 6).alias("chi2"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
