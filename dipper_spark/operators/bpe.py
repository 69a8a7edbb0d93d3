"""BPE vocabulary training as a distributed iterative pipeline.

Beyond-reference operator (SURVEY §2's LLM-pipeline section): byte-pair
encoding is THE tokenizer-training algorithm, and its inner loop — count
adjacent symbol pairs, take the most frequent, merge it everywhere,
repeat — is the third iterative algorithm in this engine after Lloyd's
k-means (operators/similarity.py) and PageRank (operators/graph.py), with
the same discipline: a FIXED iteration count, per-iteration lineage
truncation, deterministic tie-breaks, and therefore a SQL oracle that can
unroll the whole run as CTEs and hash-match the learned merge table.

Scale anatomy — the part that matters at 100 TB:

- the corpus-sized work happens ONCE: tokenize + word-frequency groupBy
  (one shuffle with map-side partials).  Everything after operates on the
  word VOCABULARY weighted by frequency — the classic BPE-training trick
  (Sennrich et al. 2016 do exactly this in one process; here the vocab
  frame is distributed but typically millions of rows, not billions);
- each merge iteration is: pair explode over the vocab (explode-first INT
  positions, strings assembled post-Generate), one grouped sum, a 1-row
  argmax collect (legitimately driver-side — same class as the VoID
  stats), and a map-side fold applying the merge left-to-right;
- the merge application is a pure ``aggregate`` fold — no UDF: greedy
  left-to-right semantics fall out of folding "if the accumulator ends
  with `left` and the next symbol is `right`, replace the tail with the
  merged token, else append".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dipper_spark.functions.text import tokens
from dipper_spark.operators.util import ensure_parallelism, tiny_df


def _merge_fold(left: str, right: str) -> str:
    """SQL text applying one BPE merge to the ``syms`` array, greedy
    left-to-right.  ``left``/``right`` must be sanitized (they come from
    the corpus alphabet; quotes are escaped here regardless)."""
    l, r = left.replace("'", "''"), right.replace("'", "''")
    m = l + r
    return (
        "CASE WHEN size(syms) < 2 THEN syms ELSE "
        "aggregate(slice(syms, 2, size(syms) - 1), slice(syms, 1, 1), "
        f"(acc, x) -> CASE WHEN element_at(acc, -1) = '{l}' AND x = '{r}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{m}')) "
        "ELSE concat(acc, array(x)) END) END"
    )


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges from a text corpus.

    Returns ``(merges, vocab)``:

    - ``merges`` — (step, left, right, merged, pair_freq): the learned
      merge table in order (step 1-based; pair_freq is the corpus-weighted
      adjacent-pair count that won the step, ties broken (freq desc, left
      asc, right asc));
    - ``vocab`` — (word, freq, syms): the word vocabulary with each word's
      final symbol sequence after all merges (the trained segmenter state).
    """
    spark = df.sparkSession
    words = (
        ensure_parallelism(df)
        .select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    vocab = words.select(
        "word", "freq", F.split("word", "").alias("syms")
    ).localCheckpoint(eager=True)

    merge_rows = []
    for step in range(1, n_merges + 1):
        base = vocab.select("freq", "syms", F.size("syms").alias("_n"))
        pairs = (
            base.filter(F.col("_n") >= 2)
            .select(
                "freq",
                "syms",
                F.explode(F.sequence(F.lit(1), F.col("_n") - 1)).alias("_i"),
            )
            .select(
                F.element_at("syms", F.col("_i")).alias("left"),
                F.element_at("syms", F.col("_i") + 1).alias("right"),
                "freq",
            )
        )
        top = (
            pairs.groupBy("left", "right")
            .agg(F.sum("freq").alias("pair_freq"))
            .orderBy(F.desc("pair_freq"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, freq = top[0].left, top[0].right, int(top[0].pair_freq)
        merge_rows.append((step, l, r, l + r, freq))
        vocab = vocab.withColumn(
            "syms", F.expr(_merge_fold(l, r))
        ).localCheckpoint(eager=True)

    merges = tiny_df(
        spark, merge_rows,
        "step int, left string, right string, merged string, pair_freq long",
    )
    return merges, vocab


def bpe_segment_counts(vocab: DataFrame) -> DataFrame:
    """Corpus-weighted counts of the final BPE symbols (the token
    distribution the trained vocabulary induces): (sym, n_occurrences).
    One explode + grouped sum over the vocab frame."""
    return (
        vocab.select("freq", F.explode("syms").alias("sym"))
        .groupBy("sym")
        .agg(F.sum("freq").cast("long").alias("n_occurrences"))
    )


def bpe_encode(
    df: DataFrame, id_col: str, text_col: str, vocab: DataFrame
) -> DataFrame:
    """Encode every document with a TRAINED BPE vocabulary — the apply
    half of the tokenizer (train = ``bpe_train``).  The expensive merge
    fold already ran once per distinct WORD when the vocabulary was
    trained; encoding a corpus is therefore a broadcast word→segmentation
    join plus one per-doc re-aggregation — the right 100 TB shape (the
    corpus is scanned once and never carries the fold; the vocab frame is
    dictionary-sized).  An out-of-vocabulary word falls back to its
    character split (= the 0-merge segmentation), the BPE byte-level
    fallback discipline.

    Returns (doc_id, n_words, n_tokens, enc_fingerprint) where
    ``n_tokens`` is the document's encoded length under the vocabulary and
    ``enc_fingerprint`` is the md5 of the full space-joined token stream
    in document order — an order-sensitive witness that the encoding
    itself (not just its length) matches the oracle.
    """
    w = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text_col)).alias("pos", "word"),
    )
    v = F.broadcast(
        vocab.select(
            "word",
            F.array_join("syms", " ").alias("wsyms"),
            F.size("syms").cast("long").alias("wn"),
        )
    )
    enc = w.join(v, "word", "left").select(
        "doc_id",
        "pos",
        F.coalesce("wsyms", F.concat_ws(" ", F.split("word", ""))).alias("wsyms"),
        F.coalesce("wn", F.length("word").cast("long")).alias("wn"),
    )
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("wn").cast("long").alias("n_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "wsyms"))),
                    lambda s: s.getField("wsyms"),
                ),
            )
        ).alias("enc_fingerprint"),
    )
