"""Streaming corpus curation: the quality-filter + dedup funnel as a
Structured Streaming pipeline over a document landing zone.

Beyond-reference capability (SURVEY §2.10 + §2.12): a live ingest pipeline
applies the SAME column expressions as the batch catalog — quality rules,
token accounting, fingerprints are all stateless map-side expressions, so
they run unchanged under ``readStream`` — and drops exact duplicates with
bounded state via a watermarked ``dropDuplicates`` on the content
fingerprint.  ``Trigger.AvailableNow`` drains the landing zone
incrementally with exactly-once file tracking (the micro-batch analog of
the reference's cron-driven re-ingest, minus the full re-read)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dipper_spark.functions.text import doc_fingerprint, quality_rules, token_count

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def curate(docs: DataFrame, *, event_time_col: str | None = None) -> DataFrame:
    """The curation transform, identical for batch and streaming inputs:
    annotate rule flags + token counts + the content fingerprint, keep rule
    passers, drop exact-duplicate content.

    On a stream, ``event_time_col`` bounds the dedup state with a 1-hour
    watermark (duplicates arriving later than that survive — the standard
    bounded-state trade); batch mode dedups globally."""
    rules = quality_rules("text")
    out = docs.select(
        "*",
        token_count("text").alias("n_tokens"),
        doc_fingerprint("text").alias("fp"),
        rules["passed"].alias("passed"),
    ).filter(F.col("passed") == 1).drop("passed")
    if out.isStreaming and event_time_col:
        out = out.withWatermark(event_time_col, "1 hour").dropDuplicatesWithinWatermark(
            ["fp"]
        )
    else:
        out = out.dropDuplicates(["fp"])
    return out


def stream_curated(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain the parquet landing zone through the curation funnel into a
    parquet sink, AvailableNow (run-to-completion per invocation)."""
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(landing_dir)
    q = (
        curate(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
