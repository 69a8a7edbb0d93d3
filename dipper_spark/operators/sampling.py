"""Deterministic sampling operators for training-data pipelines.

Beyond-reference (SURVEY §2's LLM-pipeline section): corpus curation needs
REPRODUCIBLE sampling — the same inputs must select the same rows on any
cluster, any partitioning, any engine.  ``df.sample()`` is seed-and-
partitioning dependent; these operators instead hash a stable key and
compare against a rate threshold, so membership is a pure function of the
row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hex digits compared (md5 prefix); 16^8 buckets ≈ 2.3e-10 rate resolution
_HEX_DIGITS = 8
_BUCKETS = 16 ** _HEX_DIGITS


def hash_fraction(key: Column | str) -> Column:
    """The row's deterministic position in [0, 1): the first 8 hex chars of
    md5(key) over 16^8.  Engine-portable (identical in DuckDB/Trino)."""
    k = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(F.md5(k.cast("string")), 1, _HEX_DIGITS), 16, 10).cast(
        "double"
    ) / F.lit(float(_BUCKETS))


def _threshold_hex(rate: float) -> str:
    return format(min(int(rate * _BUCKETS), _BUCKETS - 1), f"0{_HEX_DIGITS}x")


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff the md5-prefix of
    its key is below the stratum's rate threshold (lexicographic hex
    compare — no numeric conversion, so the predicate is identical in any
    engine with md5).

    The per-stratum thresholds compile to a CASE expression evaluated
    map-side on the scan: no shuffle, no join, no driver state.  At 100 TB
    this is the only sampling shape that re-runs identically after a
    repartition or an engine swap; rates are exact in expectation with
    per-stratum deviation O(1/sqrt(stratum size))."""
    key = F.md5(F.col(key_col).cast("string")).substr(1, _HEX_DIGITS)
    thr = F.lit(_threshold_hex(default_rate))
    for stratum, rate in rates.items():
        thr = F.when(F.col(strata_col) == stratum, F.lit(_threshold_hex(rate))).otherwise(thr)
    return df.filter(key < thr)


def temperature_resample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.3,
) -> DataFrame:
    """Temperature-based mixture resampling: draw a ``target_frac`` subset
    whose source mixture follows p_s^alpha (renormalized) instead of the
    raw corpus shares — the standard pretraining up/down-weighting of rare
    vs dominant sources (alpha<1 flattens, alpha=1 keeps proportions).

    Per-source Bernoulli rate: rate_s = min(1, target_frac · q_s / p_s)
    with p_s the corpus share and q_s = p_s^alpha / Σ p_t^alpha; membership
    is the deterministic md5-hash draw (see :func:`weighted_sample`), so
    the sample reproduces exactly on any partitioning/engine.

    Plan shape: one groupBy(source) count (map-side partials), the rate
    table computed ON the #sources-row frame (the unpartitioned window is
    over sources, not rows — bounded by the source vocabulary), broadcast
    back, map-side filter.  Two corpus scans, zero wide shuffles.

    alpha=0.5 computes p^alpha via sqrt (IEEE-exact, so bit-identical
    across engines); other alphas use pow (within 1 ulp per libm — the
    threshold compare is still deterministic to ~1e-16 boundary mass).
    Rates are exact in expectation; realized counts deviate
    O(1/sqrt(N_s)) per source.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(source_col).alias("_src")).agg(
        F.count(F.lit(1)).cast("double").alias("n_s")
    )
    total = counts.agg(F.sum("n_s").alias("n"))
    rates = counts.crossJoin(F.broadcast(total)).withColumn(
        "p", F.col("n_s") / F.col("n")
    )
    w = F.sqrt(F.col("p")) if alpha == 0.5 else F.pow(F.col("p"), F.lit(alpha))
    rates = rates.withColumn("w", w).withColumn(
        "q", F.col("w") / F.sum("w").over(Window.partitionBy())
    )
    rates = rates.select(
        "_src",
        F.least(F.lit(1.0), F.lit(target_frac) * F.col("q") / F.col("p")).alias(
            "keep_rate"
        ),
    )
    joined = df.join(
        F.broadcast(rates), F.col(source_col) == F.col("_src")
    ).drop("_src")
    return joined.filter(hash_fraction(F.col(key_col)) < F.col("keep_rate"))


def weighted_sample(df: DataFrame, key_col: str, weight: Column) -> DataFrame:
    """Deterministic importance sampling with a PER-ROW keep probability:
    keep a row iff hash_fraction(key) < weight, where ``weight`` is any
    column expression in [0, 1] (e.g. a quality score mapped to a rate).

    This is the up/down-weighting primitive corpus mixing needs (quality-
    weighted retention, per-domain temperature sampling): membership is a
    pure function of (key, weight-inputs), so the draw reproduces exactly
    across partitionings, re-runs, and engines, and E[kept | row] = weight.
    Map-side only — no shuffle, no state; at 100 TB it is a scan-speed
    filter.  The hash fraction is a 32-bit md5 prefix over 2^32 (exactly
    representable as a double on both sides of the oracle compare)."""
    return df.filter(hash_fraction(F.col(key_col)) < weight)


def epoch_shuffle(
    df: DataFrame, key_col: str, n_shards: int = 8, seed: str = "ep1"
) -> DataFrame:
    """Deterministic epoch shuffle + shard assignment: the global training
    order of a pretraining run, reproducible on any cluster.

    Each row draws ``h = md5(seed ':' key)``; its output shard is the
    32-bit hash prefix mod ``n_shards`` and its position within the shard
    is its rank in (h, key) order.  Changing ``seed`` reshuffles the whole
    corpus (a new epoch); nothing depends on input partitioning or row
    order, so epoch k is identical across re-runs and engines.

    Plan shape: one map pass to compute the draw, one shuffle keyed on the
    shard (uniform by construction — md5 output is unskewed regardless of
    key skew), and a per-shard rank.  At 100 TB each shard sorts only its
    own ~1/n_shards slice; there is no global sort and no driver state.
    This is the write-side ordering step feeding sequence packing
    (``q_sequence_pack``) and shard-file sinks.
    """
    from pyspark.sql import Window

    k = F.col(key_col)
    h = F.md5(F.concat(F.lit(seed + ":"), k.cast("string")))
    shard = (
        F.conv(F.substring(h, 1, _HEX_DIGITS), 16, 10).cast("long")
        % F.lit(n_shards)
    ).cast("int")
    out = df.withColumn("_h", h).withColumn("shard", shard)
    pos = F.row_number().over(Window.partitionBy("shard").orderBy("_h", key_col))
    return out.withColumn("pos", pos.cast("long")).drop("_h")


def source_quota(
    df: DataFrame, key_col: str, source_col: str, quota: int
) -> DataFrame:
    """Deterministic per-source document caps (domain-quota sampling): keep
    at most ``quota`` rows per source, chosen by md5-hash rank with the key
    as tiebreaker — a uniform, reproducible draw independent of row order
    or partitioning.

    Salted two-phase exact selection: ``source`` is a low-cardinality key
    (~tens of values), so a single per-source window would push EVERY
    document of a mega-source through one task's external sort.  Instead
    phase 1 ranks within ``(source, salt)`` cells (salt fanned out from the
    key hash) and keeps the ``quota`` smallest hashes per cell; the final
    per-source rank then runs over ≤ quota·n_salts survivors — bounded
    fan-in no matter how large the source.  The selected set is identical
    to the single-window form (the global quota-smallest hashes of a
    source are each among the quota-smallest of their own salt cell)."""
    from dipper_spark.operators.windows import salted_topk_per_group

    k = F.col(key_col)
    out = salted_topk_per_group(
        df.withColumn("_h", F.md5(k.cast("string"))),
        source_col,
        [F.col("_h"), k],
        quota,
        salt_on=k,
    )
    return out.drop("_h")


def dsir_logratio(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169): score
    every raw document by the log-likelihood ratio of its hashed n-gram
    features under bag-of-ngram models fit on the target vs the raw
    corpus — log w(x) = sum_f [ln p_target(f) - ln p_raw(f)] over the
    document's unigram + bigram occurrences, features hashed into
    ``n_buckets`` buckets, Laplace-1 smoothed.  Selection composes with
    ``weighted_sample`` / Gumbel top-k downstream.

    Beyond-reference operator.  Scale shape: the feature-distribution
    "model" is a bounded ``n_buckets``-row table built by two hash-aggs
    over the exploded features (map-side partial combine), broadcast back
    for per-doc scoring — the raw corpus is scanned twice (fit, score),
    never shuffled on doc volume; scoring is a broadcast equi-join + one
    re-aggregation on the doc key.  The hash trick bounds model size
    independent of corpus size, which is the paper's point at 100 TB.

    Returns (id, n_feats, logratio) for raw documents with >= 1 feature.
    """
    from dipper_spark.functions.text import tokens, word_shingles
    from dipper_spark.operators.util import ensure_parallelism

    bucket = F.expr(
        f"CAST(conv(substring(md5(_f), 1, 8), 16, 10) AS BIGINT) % {n_buckets}"
    )

    def feats(df: DataFrame, keep_id: bool) -> DataFrame:
        toks = tokens(text_col)
        cols = [F.col(id_col).alias("id")] if keep_id else []
        return (
            ensure_parallelism(df)
            .select(*cols, F.explode(F.concat(toks, word_shingles(toks, 2))).alias("_f"))
            .withColumn("bucket", bucket)
        )

    tf = feats(target, False).groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    rf = feats(raw, False).groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    # materialize the bounded bucket table once, then derive the corpus
    # totals FROM it (sum of per-bucket counts == total feature count, an
    # exact integer identity) — the former shape re-aggregated tf and rf a
    # second time just for the totals, re-scanning and re-tokenizing both
    # corpora (guide §1.2: don't recompute what you already have)
    counts = (
        tf.join(rf, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
        .localCheckpoint(eager=True)
    )
    totals = counts.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr"))
    tbl = (
        counts.join(F.broadcast(totals), F.lit(True))
        .select(
            "bucket",
            (
                F.log((F.col("ct") + 1) / (F.col("tt") + n_buckets))
                - F.log((F.col("cr") + 1) / (F.col("tr") + n_buckets))
            ).alias("lr"),
        )
    )
    return (
        feats(raw, True)
        .join(F.broadcast(tbl), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum("lr"), 6).alias("logratio"),
        )
    )


def gumbel_topk(
    df: DataFrame,
    key_col: str,
    logweight: Column,
    k: int,
    seed: str = "g1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of exactly ``k`` rows via the
    Gumbel top-k trick (equivalently Efraimidis-Spirakis): each row scores
    ``logweight - ln(-ln(u))`` where ``u`` is its deterministic md5
    fraction (salted with ``seed``), and the global top-k by score is an
    exact weight-proportional-without-replacement draw.  Deterministic:
    membership is a pure function of (key, seed, weight) — same inputs,
    same sample, on any engine or partitioning.

    Beyond-reference operator — the selection half of importance
    resampling (pairs with ``dsir_logratio``).  Scale shape: scoring is
    map-side; the global top-k is TakeOrderedAndProject (per-partition
    partial top-k folded on the driver), never a global sort.  ``u`` is
    offset by half a bucket so it is strictly inside (0, 1) and the double
    log never sees 0.

    Returns the k selected rows with their ``score`` (rounded), ties on
    score broken by key.
    """
    key = F.col(key_col)
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 8),
            16, 10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    scored = df.withColumn("score", logweight - F.log(-F.log(u)))
    return (
        scored.orderBy(F.col("score").desc(), key.asc())
        .limit(k)
        .withColumn("score", F.round("score", 6))
    )
