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


def _viterbi_map_literal(
    words: DataFrame, scored_rows: list, piece_max_len: int, depth: int
) -> DataFrame:
    """Viterbi as PURE COLUMN EXPRESSIONS — the dictionary-sized-model
    fast path: piece scores ride a map literal (the same bounded driver
    artifact as the BPE merge table), each position's best state is
    ``F.least`` over ≤ piece_max_len candidate structs, and the whole DP
    is one map-side select — NO joins, NO shuffles, NO per-step jobs.
    12s → ~1s on the fixture corpus vs the join form.

    Struct order (m=−score, np, seg) makes least() the (score desc,
    pieces asc, seg asc) argmax; try_element_at returns NULL for
    absent pieces and F.least skips NULL candidates.  Expression size is
    Fibonacci in depth, so every SECOND position is materialized through
    a localCheckpoint barrier (a map-only job): at cadence 4 the
    generated Java for one projection crosses the JVM's 64 KB method
    limit and whole-stage codegen silently falls back to interpreted
    evaluation — slower than the joins it replaced.  The barrier is the
    expression-level twin of the join path's lineage truncation.
    """
    smap = F.create_map(
        *[F.lit(v) for r in scored_rows for v in (r["piece"], int(r["s"]))]
    )
    df = words
    zero = F.struct(
        F.lit(0).cast("long").alias("m"), F.lit(0).alias("np"), F.lit("").alias("seg")
    )
    dp: dict = {0: zero}
    fin = F.lit(None).cast("struct<m:bigint,np:int,seg:string>")
    for i in range(1, depth + 1):
        cands = []
        for d in range(1, min(piece_max_len, i) + 1):
            piece = F.substring(F.col("word"), i - d + 1, d)
            s = F.try_element_at(smap, piece)
            prev = dp[i - d]
            cands.append(
                F.when(
                    s.isNotNull() & prev.isNotNull() & (F.length("word") >= i),
                    F.struct(
                        (prev["m"] - s).alias("m"),
                        (prev["np"] + 1).alias("np"),
                        F.when(prev["seg"] == "", piece)
                        .otherwise(F.concat_ws(" ", prev["seg"], piece))
                        .alias("seg"),
                    ),
                )
            )
        dp[i] = cands[0] if len(cands) == 1 else F.least(*cands)
        fin = F.when(F.length("word") == i, dp[i]).otherwise(fin)
        if i % 2 == 0 and i < depth:
            # expression barrier: name the live lookback window + the
            # running final state, checkpoint (map-only job), and rebind
            keep = {f"_d{j}": dp[j] for j in range(max(0, i - piece_max_len + 1), i + 1)}
            df = df.select(
                "word", "freq", *[c.alias(n) for n, c in keep.items()],
                fin.alias("_fin"),
            ).localCheckpoint(eager=True)
            dp = {j: F.col(f"_d{j}") for j in range(max(0, i - piece_max_len + 1), i + 1)}
            dp[0] = zero
            fin = F.col("_fin")
            df = df  # columns rebound; word/freq preserved
    return df.select(
        "word",
        "freq",
        fin["np"].alias("n_pieces"),
        fin["seg"].alias("seg"),
    )


def _viterbi_join(
    words: DataFrame, scored: DataFrame, piece_max_len: int, depth: int
) -> DataFrame:
    """Viterbi as per-position broadcast joins + grouped argmin — the
    LARGE-vocabulary path (a multi-million-piece model cannot ride a map
    literal through codegen; it broadcasts like any dimension).  One
    vocab-sized keyed shuffle per position; lineage truncated every
    second step (dp[i] references dp[i-1..i-P]: an untruncated plan grows
    like a P-step Fibonacci and stalls Catalyst — the PageRank
    discipline)."""
    dp = {
        0: words.select(
            "word",
            "freq",
            F.lit(0).cast("long").alias("sc"),
            F.lit(0).alias("np"),
            F.lit("").alias("seg"),
        )
    }
    for i in range(1, depth + 1):
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
        dp[i] = (
            best.localCheckpoint(eager=True)
            if (i % 2 == 0 or i == depth)
            else best
        )
    segs = None
    for i in range(1, depth + 1):
        fin = dp[i].filter(F.length("word") == i)
        segs = fin if segs is None else segs.unionByName(fin)
    return segs.select("word", "freq", F.col("np").alias("n_pieces"), "seg")


def unigram_train(
    df: DataFrame,
    text_col: str,
    piece_max_len: int = 4,
    top_pieces: int = 40,
    em_iters: int = 2,
    word_max_len: int = 12,
    map_lookup_max: int = 10_000,
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

    Two bit-identical Viterbi strategies, switched on model size: up to
    ``map_lookup_max`` pieces the scores ride a map literal and the DP is
    pure column expressions (no joins/shuffles — the dictionary-sized
    fast path); above it, per-position broadcast joins (a multi-million-
    piece model broadcasts like any dimension).
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

    # DP unroll depth = the corpus's actual longest word (bounded by the
    # cap): steps past it would only run empty jobs.  One tiny agg on the
    # checkpointed words frame; the SQL oracle keeps the full static
    # unroll — its extra CTEs are provably empty.
    actual_max = words.agg(F.max(F.length("word"))).collect()[0][0] or 1
    depth = min(word_max_len, int(actual_max))

    segs = None
    for _ in range(em_iters):
        stats = model.agg(
            F.sum("c").alias("t"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        total, n_pieces = int(stats.t), int(stats.n)
        scored = model.select(
            "piece", _micro_log(F.col("c"), F.lit(total)).alias("s")
        )
        if n_pieces <= map_lookup_max:
            segs = _viterbi_map_literal(words, scored.collect(), piece_max_len, depth)
        else:
            segs = _viterbi_join(words, scored, piece_max_len, depth)
        segs = segs.localCheckpoint(eager=True)

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
