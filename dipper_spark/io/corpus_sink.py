"""Training-shard sink: the write side of the deterministic epoch shuffle.

100 TB posture: the last step of a curation pipeline is writing the corpus
in TRAINING ORDER — a reproducible global permutation materialized as N
shard files, each internally ordered, so the trainer streams shard k
sequentially with zero shuffling at read time.  The order comes from
:func:`dipper_spark.operators.sampling.epoch_shuffle` (md5 draw → shard,
within-shard rank), so re-running the pipeline on any cluster layout
produces byte-identical shards.

Spark-native shape: ``repartition(n_shards, shard)`` aligns the physical
partitioning with the logical shard (one task writes one shard),
``sortWithinPartitions(pos)`` orders each file without any global sort,
and ``partitionBy("shard")`` makes the shard id recoverable from the
directory layout.  The only wide exchange is the single shard shuffle —
the same one the rank already needed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int = 8,
    seed: str = "ep1",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``n_shards`` shards in deterministic training order
    (see module docstring).  ``key_col`` must be a stable unique id — the
    permutation is a pure function of (seed, key).  ``fmt`` is "parquet"
    (columnar, the default) or "json" (jsonl — the common hand-off format
    to tokenizer pipelines; same layout, one JSON object per line in
    training order)."""
    from dipper_spark.operators.sampling import epoch_shuffle

    ordered = epoch_shuffle(df, key_col, n_shards=n_shards, seed=seed)
    writer = (
        ordered.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("pos")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if fmt == "json":
        writer.json(path)
    else:
        writer.parquet(path)


def read_training_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """Read one shard in training order.  Partition pruning keeps the scan
    to the single shard directory; the within-file row order IS the
    training order (parquet preserves write order within a file)."""
    return (
        spark.read.parquet(path)
        .filter(F.col("shard") == shard)
        .sortWithinPartitions("pos")
    )


def shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Per-shard row counts + pos-range sanity frame (the trainer's
    manifest): (shard, n_rows, min_pos, max_pos).  Dense positions mean
    max_pos == n_rows."""
    return (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("pos").alias("min_pos"),
            F.max("pos").alias("max_pos"),
        )
    )


def compact_landing_zone(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """Compact a small-files landing zone (the streaming-ingest side
    effect: one file per micro-batch per partition) into evenly-sized
    parquet files — the OPTIMIZE/compaction maintenance op every
    long-running ingest needs, as plain Spark.

    Row-count-driven: one cheap count, then ``ceil(n / target)`` output
    files via a round-robin repartition (uniform by construction — no
    skewed-file tail).  Writes to ``out_path`` so the swap is atomic at
    the directory level (rename/retarget), never in place.

    Returns {"rows": n, "files_in": k_in, "files_out": k_out}.
    """
    import math

    df = spark.read.parquet(in_path)
    n = df.count()
    files_in = len(df.inputFiles())
    k = max(1, math.ceil(n / target_rows_per_file))
    df.repartition(k).write.mode("overwrite").parquet(out_path)
    files_out = len(spark.read.parquet(out_path).inputFiles())
    return {"rows": n, "files_in": files_in, "files_out": files_out}
