"""Bucketed-table staging for shuffle-free co-located joins.

100 TB posture: a fact table joined repeatedly on the same key (triples on
subject, documents on doc_id, events on user_id) should pay its shuffle
ONCE — at write time — not on every query.  Spark bucketing persists the
hash-partitioning (and optionally the within-bucket sort) into the table
layout; a join of two tables bucketed on the join key with the same bucket
count then runs with NO Exchange and (if sorted) NO Sort on either side.

The reference has no analog (single-process rdflib holds everything in
RAM); this is the Spark-native replacement for its "keep the dict around
between passes" pattern at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and, by default, within-bucket sorted)
    parquet table.  ``n_buckets`` is the partitioning contract: every table
    that will co-join must use the SAME bucket columns and count.

    One shuffle now (the bucketed write), zero on every subsequent
    bucket-aligned join, aggregation, or window over the bucket key."""
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its distribution metadata intact
    (``spark.table``, not ``spark.read.parquet`` — a raw path read drops
    the bucket spec and the join shuffles again)."""
    return spark.table(table)
