"""SparkSession construction and test-table loading.

Scale notes: every config here is chosen for the 100 TB target, then scaled
down by env for local runs.  AQE handles skew-join splitting and runtime
coalescing of shuffle partitions; the shuffle-partition default is sized from
the local core count but on a real cluster should be ~2-3x total executor
cores (or left to AQE's coalescing with a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Dimension tables small enough to always broadcast (at any SF the TPC-H-ish
#: region/nation tables are constant-size; part/supplier grow with SF but stay
#: dim-like relative to lineitem).
BROADCAST_DIMS = {"region", "nation", "supplier", "part", "customer"}

_RUNTIME_CONFS = {
    # events.parquet is written with TIMESTAMP(NANOS) which Spark refuses by
    # default (PARQUET_TYPE_ILLEGAL); read the raw int64 and convert ourselves.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # deterministic timestamp rendering / epoch math vs the DuckDB oracle
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime shuffle coalescing + skew-join splitting; free insurance at
    # 100 TB where static partition counts are always wrong somewhere.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Skew splitting pinned explicitly: the banded joins (lsh_candidate_pairs,
    # simhash_pairs, blocked_neardup) hash-partition on bucket keys whose
    # population is data-dependent — a hot shingle band or dense LSH bucket
    # lands on one task without this.  factor 4 / 128m splits a partition
    # once it is 4x the median AND >=128 MB; advisory 64m keeps the split
    # granules (and coalesced partitions) executor-friendly.
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "4",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "128m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "dipper_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # collected-result ceiling: tools that value-hash full results at
        # scale (the sf1.0 oracle gate) raise this via the env knob
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_GRAFT_MAX_RESULT", "2g"),
        )
        # Arrow for any pandas-UDF path (similarity / multimodal operators)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally provided session.

    The verification driver hands us its own SparkSession; all confs we rely
    on are SQL confs and therefore runtime-settable.
    """
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf locked down
            pass
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table, normalizing physical quirks.

    ``events.ts`` arrives as int64 nanoseconds (see _RUNTIME_CONFS); it is
    exposed both as ``ts_ns`` (long) and ``ts`` (timestamp, microsecond
    precision — integer div by 1000, matching DuckDB's internal us truncation).
    """
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", F.expr("timestamp_micros(ts_ns div 1000)"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def stage_shuffle_bytes(spark: SparkSession) -> dict[int, int]:
    """Completed stages' ``{stageId: shuffleWriteBytes}`` via the UI REST
    API — the task-metrics feedback loop the bench uses to record a
    per-query SHUFFLE-VOLUME budget alongside wall time (round-11 verdict
    item #8): at small SF a plan regression (lost broadcast, extra
    exchange) can hide inside wall-time noise but shows immediately as a
    bytes jump.  REST is used instead of AppStatusStore because the py4j
    overload surface of the latter changes across Spark versions; returns
    {} when the UI is disabled (callers treat volume as unavailable, never
    fail the run)."""
    import json as _json
    import urllib.request

    sc = spark.sparkContext
    base = sc.uiWebUrl
    if not base:
        return {}
    url = f"{base}/api/v1/applications/{sc.applicationId}/stages?status=complete"
    try:
        with urllib.request.urlopen(url, timeout=10) as resp:
            stages = _json.load(resp)
        return {s["stageId"]: int(s.get("shuffleWriteBytes", 0)) for s in stages}
    except Exception:  # noqa: BLE001 — metrics must never sink the caller
        return {}
