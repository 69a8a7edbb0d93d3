"""Window / top-k operators — SURVEY §2.6 (W1-W2).

Reference: Bgee keeps the top-20 anatomy rows per gene after a global sort
(Bgee._parse_gene_anatomy 181-210: pandas sort_values().groupby().head(20)).

Spark-first: rank-within-partition, never a global sort.  row_number over
(partition, order) prunes to k with a single shuffle; at 100 TB the sort is
per-key and spillable, and AQE splits skewed keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    partition: str | list[str],
    order: list[Column],
    k: int,
    rank_col: str = "rank",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group, deterministic given a total order.

    ``order`` must break ties (the reference's pandas sort is stable on file
    order, which is not reproducible under parallelism — callers add a
    tie-break key, exactly what a distributed rewrite must do).
    """
    parts = [partition] if isinstance(partition, str) else list(partition)
    w = Window.partitionBy(*parts).orderBy(*order)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def salted_topk_per_group(
    df: DataFrame,
    partition: str | list[str],
    order: list[Column],
    k: int,
    salt_on: Column,
    n_salts: int = 64,
    rank_col: str = "rank",
    keep_rank: bool = False,
) -> DataFrame:
    """EXACT top-k per group via salted two-phase selection — the
    low-cardinality-partition form of ``topk_per_group``.

    A plain per-group window is a scale hazard when the partition key has
    few distinct values (e.g. ~20 sources over a 100 TB corpus): every row
    of a group funnels through ONE task's external sort.  This variant
    first ranks within ``(partition, salt)`` — salt is
    ``pmod(xxhash64(salt_on), n_salts)``, so each group fans out over
    ``n_salts`` parallel cells — and keeps the per-cell top-k.  Any row in
    a group's true top-k is, under the same total order, also within the
    top-k of its own salt cell, so phase 1 never discards a winner.  The
    final window then ranks ≤ ``k * n_salts`` survivors per group — a
    bounded, broadcast-sized set regardless of corpus size.

    ``order`` must be a total order (ties broken), same contract as
    ``topk_per_group``; the output is row-for-row identical to the
    single-window form.
    """
    parts = [partition] if isinstance(partition, str) else list(partition)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(salt_on), F.lit(n_salts)))
    w1 = Window.partitionBy(*parts, "_salt").orderBy(*order)
    survivors = (
        salted.withColumn("_srk", F.row_number().over(w1))
        .filter(F.col("_srk") <= k)
        .drop("_srk", "_salt")
    )
    w2 = Window.partitionBy(*parts).orderBy(*order)
    out = survivors.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)


def rolling_range_agg(
    df: DataFrame,
    partition: str | list[str],
    order_value: Column,
    agg: Column,
    preceding: int,
    out_col: str = "rolling",
) -> DataFrame:
    """Sliding aggregate over a VALUE RANGE (not a row count): for each row,
    ``agg`` over the partition's rows whose ``order_value`` lies in
    [current - preceding, current] — the trailing-window event-time
    aggregate (per-user moving averages, rate counters, rolling exposure).

    RANGE framing is the semantic Spark shares exactly with DuckDB/ANSI
    (peers at equal order values always enter the frame together, so the
    result is deterministic even with timestamp ties — a ROWS frame is
    not).  One shuffle on the partition key; the frame scan is the
    streaming-window pass within each sorted partition.  The batch twin of
    the Structured Streaming windowed aggregate (streaming/events.py) for
    when the trailing window must END at each event rather than on tumbling
    boundaries.
    """
    parts = [partition] if isinstance(partition, str) else list(partition)
    w = (
        Window.partitionBy(*parts)
        .orderBy(order_value)
        .rangeBetween(-preceding, Window.currentRow)
    )
    return df.withColumn(out_col, agg.over(w))
