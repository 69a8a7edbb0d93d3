"""Stream-stream joins with event-time bounds — the stateful join surface
of Structured Streaming (SURVEY §2.10 depth, beyond-reference).

The attribution shape (every error joined to the same user's clicks from
the preceding hour) as a WATERMARKED stream-stream inner join: the time
bound in the join condition is what lets Spark expire join state — without
it both sides buffer forever.  Identical code runs on static frames (the
watermark is a no-op there), which is how the test proves the semantics
against the batch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_attribution_join(
    errors: DataFrame,
    clicks: DataFrame,
    *,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner join: each error event with every click by the same user in
    the ``lookback`` interval before it.

    On streams both sides carry a watermark and the interval bound
    ``c.ts IN [e.ts - lookback, e.ts]`` lets the state store drop click
    rows older than watermark+lookback — bounded state, the requirement
    for an unbounded run.  On static frames the same expression is a
    plain range join.  Returns (error_id, user_id, click_id, gap_us).
    """
    # watermarks require TIMESTAMP (with zone); the synthetic events carry
    # TIMESTAMP_NTZ — identity cast under the session's pinned UTC zone
    e = errors.select(
        F.col("event_id").alias("error_id"),
        F.col("user_id"),
        F.col("ts").cast("timestamp").alias("e_ts"),
    )
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").cast("timestamp").alias("c_ts"),
    )
    if errors.isStreaming:
        e = e.withWatermark("e_ts", watermark)
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("e_ts"))
        & (F.col("c_ts") >= F.col("e_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    us = lambda col: F.unix_micros(F.col(col).cast("timestamp"))  # noqa: E731
    return (
        e.join(c, cond, "inner")
        .select(
            "error_id",
            "user_id",
            "click_id",
            (us("e_ts") - us("c_ts")).alias("gap_us"),
        )
    )


def enrich_with_dim(
    stream: DataFrame, dim: DataFrame, key: str, broadcast_dim: bool = True
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of ``stream`` joins
    the static ``dim`` on ``key`` — the lookup-table shape (user profile,
    source metadata, quality-rule config) in its streaming form.

    Stream-static inner joins are stateless in Structured Streaming: no
    watermark, no state store — the static side is simply re-planned into
    every micro-batch, so a broadcast hint on it makes each micro-batch a
    map-side hash join (the dim is read once per trigger; snapshot-refresh
    it by restarting the query or using a Delta-style versioned source).
    At 100 TB-of-stream the dim side stays dimension-sized; that asymmetry
    is the whole design.
    """
    from pyspark.sql import functions as F

    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, key)
