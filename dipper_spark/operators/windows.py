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
