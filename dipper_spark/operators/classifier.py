"""Trained linear text classifier — the supervised step up from the
fixed-hash scorer in :func:`operators.search.hashed_linear_score`
(fastText/CCNet-shape quality & language filters).

A 100 TB curation pipeline does not ship hand-tuned weights: it TRAINS a
cheap linear model on a labeled slice (CCNet trains fastText on
Wikipedia-vs-crawl; FineWeb-Edu distills an LLM judge into a linear
head), stores the weight vector, and scores every shard at scan speed.
Here the teacher is the repo's own Gopher-style rule conjunction
(:func:`functions.text.quality_rules` — the q_calibration label), so the
trained model distills five hard thresholds into one calibrated score.

Features per document (the standard cheap-quality-feature set):

- ``n_buckets`` hashed bag-of-words buckets — token ``t`` maps to bucket
  ``md5(t) % n_buckets``, value ``cnt_b / n_tokens``;
- dense pseudo-buckets: BIAS (-1, value 1), REL_LEN (-2,
  ``least(n,100)/100``), ALPHA (-3, alphabetic-token fraction), STOP
  (-4, English-stopword fraction), WORDLEN (-5,
  ``least(mean token chars, 10) / 10`` — clamped so fx <= SCALE holds
  structurally);
- every feature value is stored as an integer MICRO-FEATURE
  ``fx = floor(numer * SCALE / denom + 0.5)`` where numer/denom are
  exact BIGINTs (token counts, char counts), so the grain table is pure
  integers.

**Model**: linear, squared loss, full-batch gradient descent, targets
mapped to ±1 (``ys = 2y - 1``) so the decision threshold is 0 and the
first gradient step already points along the class-mean difference.  No
transcendental functions — a logistic's ``exp`` is libm-specific and
would break bit-parity with the DuckDB oracle, while +,-,*,/ and floor
are IEEE-pinned on both engines.

**Fixed-point integer state** (the unigram trainer's micro-log trick,
``operators/unigram.py``): weights live as BIGINT micro-units
(``w = W / 1e6``) and every cross-row sum — the per-document margin
numerator and the per-bucket gradient — is a sum of BIGINTs, which is
exact and ORDER-FREE.  Float accumulation order varies with partition
layout; integer sums cannot, so training is partition-invariant and a
SQL oracle replays it bit-identically with the iterations unrolled as
CTEs (the 5th iterative oracle in the catalog, after PageRank, BPE,
unigram-EM and SCD2).

Update rule (real math, then the pinned fixed-point form)::

    w <- w - lr/N * sum_i (margin_i - ys_i) * x_i

    margin_i = CAST(M_i AS DOUBLE) / (SCALE * SCALE),  M_i = sum_b W_b*fx_ib
    g_ib     = floor(r_i * fx_ib + 0.5)                # BIGINT grain
    W_b     <- W_b - floor((lr_num * sum_i g_ib) / (lr_den * N) + 0.5)

Every float expression has a FIXED parenthesization mirrored verbatim in
the oracle SQL; ``floor(x + 0.5)`` is the repo's round-half-up parity
rule (the pHash discipline, multimodal/ops.py).  The default learning
rate 1/4 sits under the GD stability bound: ``||x||^2 <= 1 (bias) + 1
(L1-normalized BOW) + 4 (dense features in [0,1]) <= 6``, so squared
loss needs ``lr < 2/6`` — lr = 4 visibly diverges and a test pins that.

Scale shape: featurize is ONE corpus scan and one shuffle to
(doc, bucket) — map-side partial count — checkpointed once, so the
corpus is read once regardless of iteration count.  Each iteration is
two hash aggregations (margin by doc, gradient by bucket) plus one
equi-join of the grain table to per-doc residuals; the weight vector is
a bounded driver artifact (n_buckets + 5 rows, the BPE-merge-table
class) injected back as a map literal — no shuffle carries it.  Apply is
a single scan + broadcast join + map-side-partial aggregation: scan
speed at 100 TB, which is the entire point of a linear filter.

Reference analog: dipper scores and filters on precomputed per-row
evidence everywhere (e.g. CTD.py evidence filtering); the train/apply
split mirrors its stage-once / consume-many artifact discipline
(OMIM.py:256-260).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dipper_spark.functions.text import EN_STOPWORDS, tokens
from dipper_spark.operators.util import ensure_parallelism, tiny_df

SCALE = 1_000_000
BIAS, REL_LEN, ALPHA, STOP, WORDLEN = -1, -2, -3, -4, -5


def _bucket_expr(tok_col: str, n_buckets: int):
    """md5-prefix hash bucket — bit-compatible with the DuckDB form
    ``CAST(('0x' || substr(md5(t),1,8)) AS BIGINT) % n`` (both operands
    non-negative, so the modulo agrees)."""
    return F.expr(
        f"CAST(conv(substring(md5({tok_col}), 1, 8), 16, 10) AS BIGINT) "
        f"% {n_buckets}"
    )


def _micro(numer, denom):
    """Integer micro-feature ``floor((numer * SCALE) / denom + 0.5)``:
    numer*SCALE is an exact BIGINT product, the division is the single
    float op, floor(x+0.5) is the cross-engine rounding rule."""
    return F.floor(
        (numer.cast("long") * F.lit(SCALE)) / denom + F.lit(0.5)
    ).cast("long")


def _grain_base(
    df: DataFrame, id_col: str, text_col: str, carry: tuple = (), checkpoint: bool = False
) -> DataFrame:
    """``(id, _toks, n, *carry)`` — the single tokenize pass both grain
    branches read.  ``ensure_parallelism`` first: a labeled slice or a
    small corpus often scans as ONE parquet split, which would run the
    regex tokenizer (the dominant per-row cost) on one core while 31 idle.
    ``checkpoint=True`` (the trainer) materializes the pass eagerly so the
    hashed branch, the dense branch and the label all share computed
    partitions — legitimate for a labeling-cost-bounded training slice;
    the apply path stays LAZY (checkpointing token arrays of a 100 TB
    corpus would be a full materialization, not scan speed)."""
    base = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("id"),
            tokens(text_col).alias("_toks"),
            *[F.col(c) for c in carry],
        )
        .withColumn("n", F.size("_toks").cast("long"))
    )
    return base.localCheckpoint(eager=True) if checkpoint else base


def _grains_from_base(base: DataFrame, n_buckets: int, carry: tuple = ()) -> DataFrame:
    """ONE tokenized pass feeds both grain families.  The former shape
    union'd a hashed branch (explode → count) with a dense branch (array
    ops over ``_toks``) — two independent subtrees, so on a LAZY base
    (the apply path, deliberately un-checkpointed at corpus scale) the
    plan scanned AND re-tokenized the whole corpus once per branch
    (2 FileScans in the committed q_classifier_apply_stored plan).  Now
    the dense numerators ride the SAME exploded stream as per-bucket
    partial sums: both branches consume the one (id, bucket) exchange,
    which AQE's stage reuse dedupes, so the corpus is scanned and
    tokenized exactly once (guide §1.2 / §8: move the heavy pass once).
    ``explode_outer`` keeps null-``_toks`` docs alive for the dense
    branch (null bucket, filtered from the hashed side) — value-level
    behavior is unchanged, every fx is the same exact integer (or the
    same NULL) as the array-op form, re-proven against the oracle."""
    keep = list(carry)
    t = F.col("t")
    per_bucket = (
        base.select("id", "n", *keep, F.explode_outer("_toks").alias("t"))
        .groupBy("id", "n", *keep, _bucket_expr("t", n_buckets).alias("bucket"))
        .agg(
            F.count("t").cast("long").alias("cnt"),
            F.sum(F.when(t.rlike("^[a-z]+$"), 1).otherwise(0)).cast("long").alias("_alpha"),
            F.sum(F.when(t.isin(EN_STOPWORDS), 1).otherwise(0)).cast("long").alias("_stop"),
            F.sum(F.length("t")).cast("long").alias("_chars"),
        )
    )
    # dictionary-sized per doc (<= n_buckets + 1 bucket rows), so this
    # second aggregation is doc-scale; collect_list order is irrelevant
    # (every downstream consumer is order-free)
    per_doc = per_bucket.groupBy("id", "n", *keep).agg(
        F.collect_list(F.struct("bucket", "cnt")).alias("_bl"),
        F.sum("_alpha").alias("_alpha"),
        F.sum("_stop").alias("_stop"),
        F.sum("_chars").alias("_chars"),
    )
    dense_vals = [
        (BIAS, F.lit(SCALE).cast("long")),
        (REL_LEN, _micro(F.least(F.col("n"), F.lit(100).cast("long")), F.lit(100).cast("long"))),
        # coalesce(sum, 0) == size(filter(...)) for every non-null _toks
        # (split never yields an empty array, so a present doc always has
        # >= 1 exploded row); for null _toks both forms reach the same
        # NULL fx through the null denominator n
        (ALPHA, _micro(F.coalesce(F.col("_alpha"), F.lit(0).cast("long")), F.col("n"))),
        (STOP, _micro(F.coalesce(F.col("_stop"), F.lit(0).cast("long")), F.col("n"))),
        # clamp at 1.0: a corpus with mean token length > 10 chars would
        # otherwise push fx above SCALE, breaking the documented
        # ||x||^2 <= 6 lr-stability bound (lr=1/4 could diverge).  The
        # least() makes the bound structural, not a data-shape accident;
        # mirrored as least() in the oracle CTE.  sum(length(t)) is the
        # exploded-stream identity of length(array_join(_toks, '')).
        (WORDLEN, _micro(
            F.least(
                F.coalesce(F.col("_chars"), F.lit(0).cast("long")),
                F.lit(10).cast("long") * F.col("n"),
            ),
            F.lit(10).cast("long") * F.col("n"),
        )),
    ]
    # hashed grains re-emerge from the collected bucket list (the null
    # bucket of an exploded-outer null token is dropped here, exactly the
    # rows the former explode() never produced), dense grains append as
    # literals — ONE concat'd explode, no union, so no branch for the
    # optimizer to prune differently and nothing upstream evaluates twice
    grain_entries = F.concat(
        F.transform(
            F.filter(F.col("_bl"), lambda s: s["bucket"].isNotNull()),
            lambda s: F.struct(
                s["bucket"].alias("bucket"),
                _micro(s["cnt"], F.col("n")).alias("fx"),
            ),
        ),
        F.array(*[
            F.struct(F.lit(b).cast("long").alias("bucket"), v.alias("fx"))
            for b, v in dense_vals
        ]),
    )
    return per_doc.select(
        "id", "n", *keep, F.explode(grain_entries).alias("_f")
    ).select(
        "id", "n", *keep,
        F.col("_f.bucket").alias("bucket"), F.col("_f.fx").alias("fx"),
    )


def classifier_grains(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int = 64
) -> DataFrame:
    """Micro-feature grain table ``(id, n, bucket, fx)``: one row per
    (document, active feature).  One corpus scan; the only shuffle is the
    map-side-partial count on (id, bucket)."""
    return _grains_from_base(
        _grain_base(df, id_col, text_col), n_buckets
    )


def _weight_sql(weights: dict[int, int]) -> str:
    """The current weight vector as a map-literal SQL fragment (the
    unigram fast-path trick: no join and no broadcast job for
    dictionary-sized state).  ONE string handed to the SQL parser: the
    former ``create_map(*[F.lit(..) for ..])`` form cost ~139 py4j round
    trips per iteration (~250 ms on the driver, ~4 s across a
    16-iteration training) to construct the very same
    CreateMap/GetMapValue/coalesce expression.  The literal map lands in
    the codegen ``references[]`` array, so the generated source — and
    hence the Janino compile — is shared across iterations (measured:
    zero recompiles after iteration 2)."""
    if not weights:
        return "CAST(0 AS BIGINT)"
    items = ",".join(f"{b}L,{w}L" for b, w in sorted(weights.items()))
    return f"CAST(coalesce(map({items})[bucket], 0) AS BIGINT)"


def _weight_lit(weights: dict[int, int]):
    """:func:`_weight_sql` as a column expression (window fallback)."""
    return F.expr(_weight_sql(weights))


#: ``SCALE²`` rendered exactly as the float literal the former
#: ``F.lit(float(SCALE) * float(SCALE))`` produced — the margin division
#: must stay the same IEEE double op the oracle CTEs mirror.
_D2 = repr(float(SCALE) * float(SCALE))

#: monotonically increasing temp-view suffix (unique per _gradient call,
#: so interleaved trainings in one session can never resolve each
#: other's grain view)
_GRAIN_VIEW_N = 0


def _gradient(feat: DataFrame, weights: dict[int, int], bcast: bool) -> DataFrame:
    """One iteration's per-bucket gradient.  ``bcast=True`` (the default
    for any realistically-sized labeled training slice) joins the
    doc-sized residual table back onto the grains with a SHUFFLE_HASH
    hint: the grain table is hash-partitioned (and persisted) on ``id``
    and the residual aggregation inherits that layout, so the join plans
    with ZERO exchanges and zero sorts, and — unlike the former
    broadcast-residual form — the whole iteration is ONE job (no
    broadcast-build job, no 320 MB residual broadcast ceiling; the
    per-partition hash build is the partition's own doc slice).
    Measured at sf0.1: 32 → 16 jobs for the 16-iteration training, loop
    3.5 → 2.3 s, weights bit-identical (integer grains make the math
    engine- and shape-independent).  ``bcast=False`` is the window-sum
    fallback; a test pins the equivalence of both paths."""
    if bcast:
        # ONE spark.sql call over a temp view of the persisted grain
        # table: the same tree as the equivalent 7-step DataFrame chain,
        # built in ~30 ms of driver time instead of ~80 ms (measured;
        # x16 iterations this is pure driver pacing — guide §1.2).  A
        # temp view resolves to feat's ANALYZED plan, so the cache
        # lookup still hits the persisted InMemoryRelation (DataFrame
        # interpolation via spark.sql(..., feat=feat) re-expands the
        # plan with fresh expression ids and MISSES the cache — measured
        # as a full featurize re-run per iteration; do not use it here).
        # The view is NOT dropped here: catalog.dropTempView cascades an
        # uncacheQuery whose sameResult match UNPERSISTS the grain cache
        # itself (measured: every later iteration re-ran featurize).  The
        # trainer drops its views after the loop, post-unpersist.
        spark = feat.sparkSession
        global _GRAIN_VIEW_N
        _GRAIN_VIEW_N += 1
        view = f"__dipper_clf_grains_{_GRAIN_VIEW_N}"
        feat.createOrReplaceTempView(view)
        return spark.sql(
                f"""
                SELECT bucket, sum(CAST(floor(r * fx + 0.5) AS BIGINT)) AS G
                FROM (
                  SELECT /*+ SHUFFLE_HASH(res) */ f.bucket, f.fx, res.r
                  FROM {view} f
                  JOIN (
                    SELECT id, (CAST(M AS DOUBLE) / {_D2})
                               - CAST(2 * y - 1 AS DOUBLE) AS r
                    FROM (SELECT id, y, sum(({_weight_sql(weights)}) * fx) AS M
                          FROM {view} GROUP BY id, y)
                  ) res ON f.id = res.id
                )
                GROUP BY bucket
                """
        )
    else:
        from pyspark.sql import Window

        w = Window.partitionBy("id")
        grain = (
            feat.withColumn("_wb", _weight_lit(weights))
            .withColumn("_M", F.sum(F.col("_wb") * F.col("fx")).over(w))
            .withColumn(
                "r",
                F.col("_M").cast("double") / F.lit(float(SCALE) * float(SCALE))
                - (F.lit(2).cast("long") * F.col("y") - F.lit(1)).cast("double"),
            )
        )
    return (
        grain.withColumn(
            "_g", F.floor(F.col("r") * F.col("fx") + F.lit(0.5)).cast("long")
        )
        .groupBy("bucket")
        .agg(F.sum("_g").alias("G"))
    )


def linear_classifier_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col,
    n_buckets: int = 64,
    iters: int = 3,
    lr_num: int = 1,
    lr_den: int = 4,
    broadcast_residuals: int = 20_000_000,
) -> DataFrame:
    """Full-batch GD, ``iters`` rounds, rational learning rate
    ``lr_num/lr_den`` (rational so the update stays a pure integer
    expression).  ``label_col`` is a 0/1 column name or Column.  Returns
    the trained weight table ``(bucket, w_micro)`` over every feature
    observed in the corpus (unobserved hash buckets have zero gradient
    and stay at the zero init, so they are omitted — apply coalesces
    missing buckets to 0).

    Partition-order invariant by construction: every accumulation that
    crosses rows is a BIGINT sum of pre-rounded grains.  The returned
    frame is dictionary-sized (<= n_buckets + 5 rows).

    ``broadcast_residuals``: while the labeled slice has at most this
    many documents the per-iteration residuals are re-attached with the
    co-partitioned SHUFFLE_HASH join (see :func:`_gradient` — zero
    exchanges, one job per iteration); a larger slice falls back to the
    window form.  Classifier training slices are bounded by labeling
    cost in practice (CCNet/FineWeb train on 1e5-1e7 labeled docs), so
    the join path is the normal one."""
    spark = df.sparkSession
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast("long")
    # ONE tokenize pass, parallel and eagerly checkpointed, with the label
    # carried through both grain branches — the former shape tokenized the
    # slice twice (hashed + dense branches) plus once more for the labels
    # frame and then joined labels back on id; a one-file slice ran all of
    # that on a single core (guide §2.5 input skew / §1.2: remove passes)
    labeled = df.select(
        F.col(id_col).alias("_cid"), F.col(text_col).alias("_ctext"), y.alias("y")
    )
    base = _grain_base(labeled, "_cid", "_ctext", carry=("y",), checkpoint=True)
    n_docs = base.count()
    # size the checkpointed grain table by volume (~70 grains/doc, target
    # ~500k grains per partition), capped at the cluster parallelism —
    # 16 iterations of driver-paced jobs over 32 near-empty partitions is
    # pure scheduling overhead at small SF, while at corpus scale this
    # saturates the executors exactly like the default layout would
    n_part = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            (n_docs * (n_buckets // 2 + 5)) // 500_000 + 1,
        ),
    )
    # persist() instead of localCheckpoint: a checkpoint scan reports
    # UnknownPartitioning, so every iteration's per-doc aggregation paid a
    # full re-exchange of the grain rows (and the residual join could
    # never be co-partitioned).  InMemoryRelation PRESERVES the
    # hashpartitioning(id, n_part) below it, which is what lets the
    # SHUFFLE_HASH residual join and the margin aggregation plan with
    # zero exchanges (guide §2.4: two operations keyed the same way share
    # one exchange).  Bounded like the former checkpoint: the grain table
    # of a labeling-cost-bounded slice, dropped in the finally below.
    feat = (
        _grains_from_base(base, n_buckets, carry=("y",))
        .select("id", "bucket", "fx", F.col("y").cast("long").alias("y"))
        .repartition(n_part, "id")
        .persist()
    )
    feat.count()  # materialize before the loop (the former eager checkpoint)
    bcast = n_docs <= broadcast_residuals
    weights: dict[int, int] = {}
    # AQE off for the iteration jobs only (restored after): each gradient
    # job is two hash aggregations over an already-checkpointed grain
    # table whose layout never changes, so runtime re-planning buys
    # nothing and its extra stage-resubmission costs ~60 ms/iteration
    # (measured 5.5 s -> 4.5 s over 16 iterations, weights identical —
    # the update is integer-exact under any plan).  shuffle.partitions is
    # pinned to the grain table's own partition count for the same jobs:
    # with AQE off the doc/bucket-sized aggregations would otherwise fan
    # out to the global shuffle width (32 near-empty tasks per stage,
    # 4 stages x iters of pure scheduling; guide §1.2 per-task overhead).
    # Integer sums are partition-count-invariant, so weights are
    # bit-identical (pinned by the experiment and the oracle).
    aqe_prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    sp_prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    view_start = _GRAIN_VIEW_N
    try:
        for _ in range(iters):
            grad = _gradient(feat, weights, bcast).collect()
            for row in grad:  # bounded: <= n_buckets + 5 rows (BPE-merge-table class)
                step = math.floor((lr_num * int(row.G)) / (lr_den * n_docs) + 0.5)
                weights[int(row.bucket)] = weights.get(int(row.bucket), 0) - step
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)
        spark.conf.set("spark.sql.shuffle.partitions", sp_prev)
        feat.unpersist(blocking=False)
        # drop the per-iteration grain views AFTER unpersist (dropping a
        # view cascades an uncacheQuery over sameResult plans — see
        # _gradient; at this point the cache is already gone)
        for i in range(view_start + 1, _GRAIN_VIEW_N + 1):
            spark.catalog.dropTempView(f"__dipper_clf_grains_{i}")
    out = sorted(weights.items())
    return tiny_df(
        spark, [(int(b), int(w)) for b, w in out], "bucket LONG, w_micro LONG"
    )


def linear_classifier_apply(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    n_buckets: int = 64,
) -> DataFrame:
    """Score a corpus with a trained (possibly store-loaded) weight
    table: rebuild the same micro-feature grains, broadcast-join the
    dictionary-sized weight table, and aggregate the exact BIGINT margin
    numerator per document.  Returns ``(id, n_tokens, score, pred)``
    where score is the margin (round 6) and pred thresholds at 0 (the
    squared-loss target is ±1).

    One scan + one broadcast join + one map-side-partial aggregation —
    at 100 TB this runs at scan speed like every other curation filter,
    and the grain identity with training means a stored model scores a
    document exactly as the trainer saw it."""
    wmap = F.broadcast(
        weights.select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("w_micro").cast("long").alias("w_micro"),
        )
    )
    scored = (
        classifier_grains(df, id_col, text_col, n_buckets)
        .join(wmap, "bucket", "left")
        .groupBy("id", "n")
        .agg(
            F.sum(
                F.coalesce("w_micro", F.lit(0)).cast("long") * F.col("fx")
            ).alias("M")
        )
        .select(
            "id",
            F.col("n").alias("n_tokens"),
            (
                F.col("M").cast("double") / F.lit(float(SCALE) * float(SCALE))
            ).alias("_score"),
        )
    )
    return scored.select(
        "id",
        "n_tokens",
        F.round("_score", 6).alias("score"),
        (F.col("_score") > 0.0).cast("int").alias("pred"),
    )
