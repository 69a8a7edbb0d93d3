"""Streaming histogram sketch: the online half of the bounded-state
quantile path.

The fixed-width histogram sketch (``operators/sketches.histogram_quantiles``)
is a pure counter matrix, so maintaining it over a stream is just a grouped
count — Spark's streaming state per group is ≤ ``n_bins`` counters however
much data flows through, and micro-batch merging IS the sketch's merge
operation (addition).  This is the production split for percentile
monitoring at 100 TB/day: the stream keeps the tiny sketch current; readers
extract quantiles from the counter table on demand (batch side,
``histogram_counts_to_quantiles``), never re-scanning history.

Batch/stream equivalence is the correctness argument and is pytest-pinned:
the same function on the same rows produces identical counters either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin(v: Column, lo: float, hi: float, n_bins: int) -> Column:
    width = (hi - lo) / n_bins
    return F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")),
    ).alias("bin")


def streaming_value_histogram(
    events: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    lo: float = 0.0,
    hi: float = 512.0,
    n_bins: int = 64,
) -> DataFrame:
    """Maintain per-group histogram-sketch counters over a stream (use
    ``outputMode("complete")`` — the aggregation state is the sketch
    itself, ≤ groups × n_bins rows) or identically over a batch frame.

    Returns (group, bin, n)."""
    return (
        events.select(F.col(group_col).alias("grp"), _bin(F.col(value_col), lo, hi, n_bins))
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_counts_to_quantiles(
    counts: DataFrame,
    probs: dict[str, float],
    lo: float = 0.0,
    hi: float = 512.0,
    n_bins: int = 64,
) -> DataFrame:
    """Read quantiles off a (grp, bin, n) counter table — the query-time
    half (same estimator as ``histogram_quantiles``: upper edge of the
    first bin whose cumulative count reaches p·total)."""
    from pyspark.sql import Window

    width = (hi - lo) / n_bins
    w = Window.partitionBy("grp").orderBy("bin")
    wt = Window.partitionBy("grp")
    cum = counts.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(wt)
    )
    edge = F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6)
    aggs = [
        F.min(
            F.when(
                F.col("cum").cast("double") >= F.lit(p) * F.col("total").cast("double"),
                edge,
            )
        ).alias(name)
        for name, p in probs.items()
    ]
    return cum.groupBy("grp").agg(F.max("total").cast("long").alias("n_total"), *aggs)


def streaming_token_count_min(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Maintain a count-min sketch of the token stream over a document
    stream — the online heavy-hitter counter.  ``count_min_build`` is a
    pure counter aggregation (d × width cells), so the SAME operator runs
    identically over a stream (``outputMode("complete")``: state is the
    sketch itself, ≤ depth·width rows however much text flows) or a batch
    frame, and micro-batch merging IS the sketch merge (addition).
    Point queries read off the counter table with the batch-side
    ``count_min_estimate`` — never re-scanning history.

    Batch/stream equivalence is pytest-pinned, mirroring the histogram
    sketch above."""
    from dipper_spark.functions.text import tokens
    from dipper_spark.operators.sketches import count_min_build

    tok = docs.select(F.explode(tokens(text_col)).alias("t"))
    return count_min_build(tok, "t", depth=depth, width=width)


def streaming_token_hll(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    p: int = 10,
) -> DataFrame:
    """Maintain per-group HyperLogLog registers over a document stream —
    the online distinct counter.  ``hll_registers`` is a grouped MAX over
    (group, bucket) cells, so the same operator runs identically on a
    stream (``outputMode("complete")``: state is the register table,
    ≤ groups × 2^p rows forever) or a batch frame; micro-batch merging IS
    the HLL merge (per-bucket max).  Estimates read off the counter table
    with the batch-side ``hll_estimate`` — history is never re-scanned.

    Completes the streaming sketch family (histogram → quantiles,
    count-min → heavy hitters, HLL → cardinality); batch/stream register
    equality is pytest-pinned."""
    from dipper_spark.functions.text import tokens
    from dipper_spark.operators.sketches import hll_registers

    tok = docs.select(
        F.col(group_col).alias("grp"), F.explode(tokens(text_col)).alias("t")
    )
    return hll_registers(tok, "t", ["grp"], p=p)
