"""Unigram-LM (SentencePiece-style) tokenizer training — the second
TRAINED tokenizer next to BPE (operators/bpe.py), and the fourth iterative
algorithm proven by CTE unrolling (after Lloyd's, PageRank, BPE).

Kudo 2018 ("Subword Regularization") trains a unigram language model over
a candidate piece vocabulary with EM: segment the corpus under the current
piece probabilities, re-estimate probabilities from the segmentation
counts, repeat.  This implementation is hard-EM (Viterbi-EM): the E-step
keeps only the single best segmentation per word — deterministic, exactly
reproducible relationally, and the standard practical simplification.

Determinism discipline (the q_kneser_ney / PSI playbook):

- piece scores are INTEGER micro-log-probs: floor(ln(c/T)·1e6 + 0.5) as
  BIGINT, where c and T are exact integer counts — both engines compute
  ln on the SAME exactly-rounded double c/T, and one libm ulp moves the
  product by ~1e-9 of a unit, so the floor is stable;
- Viterbi compares integer score SUMS (exact), with the total order
  (score desc, n_pieces asc, segmentation asc) — no float ever sits in a
  comparison position;
- single-character pieces are never pruned (count floored at 1), the
  SentencePiece coverage guarantee: every word stays segmentable.

Scale anatomy — same as BPE: the corpus is touched ONCE (word-frequency
groupBy); everything after runs on the word VOCABULARY (millions of rows
at 100 TB, never billions).  Each Viterbi position step is one
vocab-sized groupBy (argmin over ≤ piece_max_len candidate extensions);
the unroll depth is the fixed ``word_max_len`` cap.  Words longer than
the cap are excluded from the model and fall back to character splits at
encode time (documented, mirrored by the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dipper_spark.functions.text import tokens
from dipper_spark.operators.util import ensure_parallelism


def _micro_log(count_col, total_col):
    """floor(ln(c/T)*1e6 + 0.5) as BIGINT — the cross-engine fixed-point
    log score (floor(x+0.5) is the repo-wide rounding rule; ln runs on an
    exactly-rounded double ratio of exact integers)."""
    return F.floor(
        F.log(count_col.cast("double") / total_col.cast("double")) * 1000000.0
        + F.lit(0.5)
    ).cast("long")


def unigram_train(
    df: DataFrame,
    text_col: str,
    piece_max_len: int = 4,
    top_pieces: int = 40,
    em_iters: int = 2,
    word_max_len: int = 12,
) -> tuple[DataFrame, DataFrame]:
    """Train a unigram-LM tokenizer; returns ``(model, segs)``.

    - ``model`` — (piece, n_count, score_micro): the final piece table
      after ``em_iters`` Viterbi-EM rounds (n_count = corpus-weighted use
      count from the last E-step, score_micro = floor(ln(c/T)·1e6+0.5));
    - ``segs`` — (word, freq, n_pieces, seg): each distinct word's final
      Viterbi segmentation (space-joined), the trained segmenter state
      ``unigram_encode`` broadcasts.

    Candidate seeding: all substrings of length 1..piece_max_len weighted
    by word frequency; multi-char candidates pruned to ``top_pieces`` by
    (count desc, piece asc), single chars all kept (coverage).  The EM
    totals are 1-row driver artifacts (same class as the BPE argmax /
    VoID stats).
    """
    spark = df.sparkSession
    words = (
        ensure_parallelism(df)
        .select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.length("word") <= word_max_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=True)
    )

    # ---- seed counts: every substring occurrence, frequency-weighted ----
    subs = (
        words.select(
            "word",
            "freq",
            F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"),
        )
        .select(
            "word",
            "freq",
            "i",
            F.explode(F.sequence(F.lit(1), F.lit(piece_max_len))).alias("d"),
        )
        .filter(F.col("i") + F.col("d") - 1 <= F.length("word"))
        .select(F.substring("word", F.col("i"), F.col("d")).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("c"))
    )
    multi = (
        subs.filter(F.length("piece") >= 2)
        .orderBy(F.desc("c"), "piece")
        .limit(top_pieces)
    )
    model = (
        multi.unionByName(subs.filter(F.length("piece") == 1))
        .localCheckpoint(eager=True)
    )

    segs = None
    for _ in range(em_iters):
        total = int(model.agg(F.sum("c")).collect()[0][0])
        scored = F.broadcast(
            model.select("piece", _micro_log(F.col("c"), F.lit(total)).alias("s"))
        )

        # ---- Viterbi DP over positions 0..word_max_len ----
        dp = {
            0: words.select(
                "word",
                "freq",
                F.lit(0).cast("long").alias("sc"),
                F.lit(0).alias("np"),
                F.lit("").alias("seg"),
            )
        }
        for i in range(1, word_max_len + 1):
            cands = None
            for d in range(1, min(piece_max_len, i) + 1):
                prev = dp[i - d].filter(F.length("word") >= i)
                c = prev.join(
                    scored,
                    F.substring(prev["word"], i - d + 1, d) == scored["piece"],
                ).select(
                    "word",
                    "freq",
                    (F.col("sc") + F.col("s")).alias("sc"),
                    (F.col("np") + 1).alias("np"),
                    F.when(F.col("seg") == "", F.col("piece"))
                    .otherwise(F.concat_ws(" ", "seg", "piece"))
                    .alias("seg"),
                )
                cands = c if cands is None else cands.unionByName(c)
            # argmax under (sc desc, np asc, seg asc): struct-min on the
            # negated score gives exactly that composite total order
            best = (
                cands.groupBy("word", "freq")
                .agg(F.min(F.struct((-F.col("sc")).alias("m"), "np", "seg")).alias("b"))
                .select(
                    "word",
                    "freq",
                    (-F.col("b.m")).alias("sc"),
                    F.col("b.np").alias("np"),
                    F.col("b.seg").alias("seg"),
                )
            )
            # MANDATORY lineage truncation: dp[i] references dp[i-1..i-P],
            # so an un-truncated plan grows like a P-step Fibonacci —
            # ~1.5k nested join subtrees by i=12, which stalls Catalyst
            # long before any task runs.  The checkpointed frame is
            # vocab-sized; same discipline as the PageRank iteration.
            dp[i] = best.localCheckpoint(eager=True)

        segs = None
        for i in range(1, word_max_len + 1):
            fin = dp[i].filter(F.length("word") == i)
            segs = fin if segs is None else segs.unionByName(fin)
        segs = segs.select(
            "word", "freq", F.col("np").alias("n_pieces"), "seg"
        ).localCheckpoint(eager=True)

        # ---- E-counts -> next model (singles floored at 1: coverage) ----
        used = (
            segs.select("freq", F.explode(F.split("seg", " ")).alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").alias("e"))
        )
        model = (
            model.select("piece")
            .join(used, "piece", "left")
            .select(
                "piece",
                F.when(
                    F.length("piece") == 1, F.greatest(F.coalesce("e", F.lit(0)), F.lit(1))
                )
                .otherwise(F.col("e"))
                .alias("c"),
            )
            .filter(F.col("c").isNotNull() & (F.col("c") >= 1))
            .localCheckpoint(eager=True)
        )

    total = int(model.agg(F.sum("c")).collect()[0][0])
    out_model = model.select(
        "piece",
        F.col("c").cast("long").alias("n_count"),
        _micro_log(F.col("c"), F.lit(total)).alias("score_micro"),
    )
    return out_model, segs


def unigram_encode(
    df: DataFrame, id_col: str, text_col: str, segs: DataFrame
) -> DataFrame:
    """Encode a corpus with a trained unigram segmenter — the apply half,
    sharing ``bpe_encode``'s broadcast-join shape exactly: the Viterbi
    fold ran once per distinct WORD at train time; encoding scans the
    corpus once and joins the dictionary-sized (word → segmentation)
    frame.  Out-of-vocabulary words (incl. words over the train-time
    length cap) fall back to their character split.

    Returns (doc_id, n_words, n_tokens, enc_fingerprint) — fingerprint =
    md5 of the space-joined token stream in document order."""
    w = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text_col)).alias("pos", "word"),
    )
    v = F.broadcast(
        segs.select("word", F.col("seg").alias("wseg"), F.col("n_pieces").alias("wn"))
    )
    enc = w.join(v, "word", "left").select(
        "doc_id",
        "pos",
        F.coalesce("wseg", F.concat_ws(" ", F.split("word", ""))).alias("wseg"),
        F.coalesce(F.col("wn").cast("long"), F.length("word").cast("long")).alias("wn"),
    )
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("wn").cast("long").alias("n_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "wseg"))),
                    lambda s: s.getField("wseg"),
                ),
            )
        ).alias("enc_fingerprint"),
    )
