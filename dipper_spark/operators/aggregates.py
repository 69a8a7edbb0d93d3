"""Aggregation operators — SURVEY §2.5 (A1-A9).

Triple-set dedup / histograms / VoID stats live in core.triples; here are the
generic analytic aggregations.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dipper_spark.operators.util import tiny_df


def interval_rollup(
    df: DataFrame,
    levels: Mapping[str, Column],
    start: Column | str,
    end: Column | str,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Hierarchical extent rollup: for every ancestor level of each row, the
    min(start)/max(end)/count over its descendants.

    Reference: UCSC cytoband parents get extents = min/max over child bands up
    a prefix hierarchy 13q21.31→13q21.3→…→13 (UCSCBands.py:271-498, rollup at
    459-496; parent generation Monochrom.make_parent_bands 348-368) — done
    there with an ordered stateful Python loop.

    Spark-first rewrite: explode each row into (level, ancestor_key) pairs,
    then ONE groupBy — a single shuffle for the whole hierarchy instead of one
    pass per level.  ``levels`` maps level-name → ancestor-key expression.
    """
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    extra = extra_keys or []
    pairs = F.array(
        *[
            F.struct(F.lit(name).alias("level"), key.cast("string").alias("node"))
            for name, key in levels.items()
        ]
    )
    return (
        df.select(*extra, s.alias("__start"), e.alias("__end"), F.explode(pairs).alias("__a"))
        .groupBy(*extra, F.col("__a.level").alias("level"), F.col("__a.node").alias("node"))
        .agg(
            F.min("__start").alias("start"),
            F.max("__end").alias("end"),
            F.count(F.lit(1)).alias("n_children"),
        )
    )


def group_zscore(
    df: DataFrame,
    group: str | list[str],
    value: Column | str,
    z_col: str = "zscore",
    grid: int | None = None,
) -> DataFrame:
    """Per-group z-score of a value column via an analytic window.

    Reference: MPD computes strain z-scores against per-(measure,sex) means
    and keeps |z| >= 2 (MPD._process_strainmeans_file 326-388, threshold at
    416-418) — a two-pass dict build in Python; here one window (partial agg
    + single shuffle on the group key).  stddev is the sample stddev (pandas/
    numpy default ddof=1 used by the reference's mean lists).

    ``grid``: when the values live on a known decimal grid (e.g. 100 for
    2-decimal money), pass it to compute the moments in FIXED POINT —
    every cross-row sum becomes an exact BIGINT sum of quantized units
    (``floor(v*grid + 0.5)``), so the result is identical at every
    partition layout and data scale.  The default float path is fine for
    per-entity groups, but a fixed group count with group size ∝ corpus
    (the MPD shape) accumulates order-dependent last-ulp error in
    ``avg``/``stddev`` — observed flipping round-4 output at sf1.0.
    Integer-sum bound: ``n * (max|v|*grid)^2`` must stay under 2^63
    (~1e10 rows at 4-decimal money); raise to a decimal cast beyond that.
    """
    group_cols = [group] if isinstance(group, str) else list(group)
    v = F.col(value) if isinstance(value, str) else value
    w = Window.partitionBy(*group_cols)
    if grid is None:
        return df.withColumn(
            z_col, (v - F.avg(v).over(w)) / F.stddev_samp(v).over(w)
        )
    g = float(grid)
    q = F.floor(v * F.lit(g) + F.lit(0.5)).cast("long")
    out = (
        df.withColumn("_q", q)
        .withColumn("_n", F.count(F.lit(1)).over(w))
        .withColumn("_s1", F.sum("_q").over(w))
        .withColumn("_s2", F.sum(F.col("_q") * F.col("_q")).over(w))
    )
    mean = (F.col("_s1").cast("double") / F.col("_n")) / F.lit(g)
    ex2 = (F.col("_s2").cast("double") / F.col("_n")) / F.lit(g * g)
    var = (ex2 - mean * mean) * (
        F.col("_n").cast("double") / (F.col("_n") - F.lit(1))
    )
    zexpr = ((F.col("_q").cast("double") / F.lit(g)) - mean) / F.sqrt(var)
    # n=1 must yield NULL exactly like stddev_samp on the float path:
    # unguarded, n/(n-1) divides by zero (Inf/NaN z), and Spark drops NaN
    # from abs(z)>=thresh while DuckDB ranks NaN above everything — a
    # singleton group would silently diverge between the engines.
    zexpr = F.when(F.col("_n") > F.lit(1), zexpr)
    return out.withColumn(z_col, zexpr).drop("_q", "_n", "_s1", "_s2")


def group_percentiles(
    df: DataFrame,
    group: str | list[str],
    value: Column | str,
    probs: list[float],
    names: list[str] | None = None,
) -> DataFrame:
    """Exact interpolated percentiles of ``value`` per group — the corpus
    length-distribution report (p50/p90/p99 tokens per source et al.).

    Uses the EXACT ``percentile`` aggregate, not approx_percentile: the
    linear-interpolation-at-rank-(n-1)p definition is shared by DuckDB's
    quantile_cont / Trino et al., so results are engine-portable and
    oracle-checkable; approx sketches are not.  All requested percentiles
    compute in ONE aggregate pass (a single sort per group inside the
    aggregate, one shuffle on the group key).  Exactness costs a per-group
    value buffer — right for per-group reporting where groups are bounded;
    switch to approx_percentile for unbounded single-group scans."""
    group_cols = [group] if isinstance(group, str) else list(group)
    v = F.col(value) if isinstance(value, str) else value
    names = names or [f"p{int(p * 100)}" for p in probs]
    pct = F.percentile(v, F.array(*[F.lit(p) for p in probs]))
    out = df.groupBy(*group_cols).agg(pct.alias("_pct"))
    return out.select(
        *group_cols,
        *[F.round(F.col("_pct")[i], 6).alias(n) for i, n in enumerate(names)],
    )


def hit_miss_counts(matched: DataFrame, missed: DataFrame) -> DataFrame:
    """Hit/miss counters as a tiny metrics DataFrame.

    Reference: A8 — GO uniprot map hit%/miss (GeneOntology.py:495-501),
    STRING filtered_out_count (StringDB.py:209-225)."""
    spark = matched.sparkSession
    n_hit, n_miss = matched.count(), missed.count()
    total = n_hit + n_miss
    return tiny_df(
        spark,
        [(n_hit, n_miss, total, (100.0 * n_hit / total) if total else None)],
        "n_hit long, n_miss long, n_total long, hit_pct double",
    )


def key_skew_stats(
    df: DataFrame,
    group: str | list[str],
    key: str,
    top_n: int = 10,
) -> DataFrame:
    """Partition-skew diagnostics for a prospective shuffle key: per group,
    how concentrated are the rows on their hottest keys?  The pre-flight
    audit a 100 TB pipeline runs BEFORE keying a join/agg on a column —
    top1_share near 1.0 means one key owns the stage (salt it; see
    ``salted_topk_per_group`` / the quota sampler's salting), skew_ratio =
    max/mean key load predicts the straggler factor under hash
    partitioning.

    Shape: one (group, key) hash-agg with map-side combine — everything
    after runs on the COUNT table (keys-sized, not rows-sized).  max/sum/
    count are plain hash-aggs; the top-N mass uses the salted two-phase
    top-k because ``group`` is low-cardinality while keys can number in
    the billions — a naive per-group window would funnel every key through
    one task's sort.

    Returns (*group, n_rows, n_keys, max_key_rows, top1_share,
    topn_share, skew_ratio).
    """
    from dipper_spark.operators.windows import salted_topk_per_group

    group_cols = [group] if isinstance(group, str) else list(group)
    counts = df.groupBy(*group_cols, key).agg(F.count(F.lit(1)).alias("n"))
    stats = counts.groupBy(*group_cols).agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_key_rows"),
    )
    top = (
        salted_topk_per_group(
            counts,
            group_cols,
            [F.desc("n"), F.col(key)],
            top_n,
            salt_on=F.col(key),
        )
        .groupBy(*group_cols)
        .agg(F.sum("n").cast("long").alias("_topn_rows"))
    )
    return stats.join(top, group_cols).select(
        *group_cols,
        "n_rows",
        "n_keys",
        "max_key_rows",
        F.round(F.col("max_key_rows").cast("double") / F.col("n_rows"), 6).alias(
            "top1_share"
        ),
        F.round(F.col("_topn_rows").cast("double") / F.col("n_rows"), 6).alias(
            "topn_share"
        ),
        F.round(
            (F.col("max_key_rows").cast("double") * F.col("n_keys"))
            / F.col("n_rows"),
            6,
        ).alias("skew_ratio"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    lo: float = -1.0,
    hi: float = 1.0,
) -> DataFrame:
    """Reliability-diagram binning for any scored+labeled frame: equal-width
    score bins over [lo, hi), per-bin row count and positive fraction — the
    calibration audit run before trusting a cheap classifier's scores as
    sampling weights (a well-calibrated scorer's frac_positive tracks the
    bin midpoint).  One hash-agg over ``n_bins`` groups; every output
    double is a ratio of exact integers (division of exact doubles —
    cross-engine deterministic).  Returns (bin, bin_lo, n_rows,
    n_positive, frac_positive)."""
    scale = n_bins / (hi - lo)
    s = F.col(score_col)
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((s - F.lit(lo)) * F.lit(scale)).cast("int")),
    )
    return (
        df.select(bin_.alias("bin"), F.col(label_col).alias("_y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("_y").cast("long").alias("n_positive"),
        )
        .select(
            "bin",
            (F.col("bin").cast("double") / F.lit(scale) + F.lit(lo)).alias("bin_lo"),
            "n_rows",
            "n_positive",
            F.round(
                F.col("n_positive").cast("double") / F.col("n_rows").cast("double"), 6
            ).alias("frac_positive"),
        )
    )


def spearman_rho(
    df: DataFrame,
    group: str | list[str],
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Spearman rank correlation between two per-row signals, per group —
    the signal-agreement audit (do two quality scorers ORDER the corpus
    the same way? calibration checks levels; this checks ranks, which is
    what sampling/filtering actually consumes).

    TRUE tie-aware Spearman = Pearson correlation of the average ranks
    (NOT the 1 − 6Σd²/(n(n²−1)) shortcut, which is only exact when there
    are no ties).  Average ranks avg_rank = rank() + (n_ties − 1)/2 are
    half-integers, so every sum the computational Pearson form needs
    (Σra, Σrb, Σra², Σrb², Σra·rb) is a sum of quarter-integers — EXACT
    in IEEE double at any partition order — and the final
    (nΣab − ΣaΣb) / sqrt((nΣa² − (Σa)²)(nΣb² − (Σb)²)) is deterministic
    arithmetic an oracle reproduces bit-for-bit (sqrt is correctly
    rounded in IEEE 754).  Groups of < 2 rows return NULL; so does a
    group where either signal is CONSTANT (variance 0 → rho undefined —
    previously the shortcut silently reported a finite value here).

    Shape: both rank windows partition on the SAME group key — one keyed
    shuffle, two in-partition sorts — then a per-group hash-agg.  Returns
    (*group, n_rows, rho).
    """
    group_cols = [group] if isinstance(group, str) else list(group)
    half = lambda col: (  # noqa: E731 - local rank helper
        F.rank().over(Window.partitionBy(*group_cols).orderBy(col))
        + (F.count(F.lit(1)).over(Window.partitionBy(*group_cols, col)) - 1).cast(
            "double"
        )
        / F.lit(2.0)
    )
    ranked = df.select(
        *group_cols, half(a_col).alias("_ra"), half(b_col).alias("_rb")
    )
    ra, rb = F.col("_ra"), F.col("_rb")
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(ra).alias("_sa"),
        F.sum(rb).alias("_sb"),
        F.sum(ra * ra).alias("_saa"),
        F.sum(rb * rb).alias("_sbb"),
        F.sum(ra * rb).alias("_sab"),
    )
    n_d = F.col("n_rows").cast("double")
    var_a = n_d * F.col("_saa") - F.col("_sa") * F.col("_sa")
    var_b = n_d * F.col("_sbb") - F.col("_sb") * F.col("_sb")
    cov = n_d * F.col("_sab") - F.col("_sa") * F.col("_sb")
    rho = F.round(cov / F.sqrt(var_a * var_b), 6)
    return agg.select(
        *group_cols,
        "n_rows",
        F.when(
            (F.col("n_rows") > 1) & (var_a > 0) & (var_b > 0), rho
        ).alias("rho"),
    )
