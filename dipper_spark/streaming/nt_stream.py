"""Streamed nt sink + incremental landing-zone refresh (T1/T2).

Reference: StreamedGraph formats each triple as an nt line at addTriple time
and appends to an open handle, deferring dedup to a downstream sort+uniq
(dipper/graph/StreamedGraph.py:13-20, 92-132).  Source.check_if_remote_is_newer
(Source.py:280-358) only refetches changed inputs — in Structured Streaming
terms, ``Trigger.AvailableNow`` over a landing directory: each run processes
exactly the files that arrived since the last checkpoint, then stops.

Scale notes: the nt formatter is the same pure column pipeline as the batch
sink (io/sinks.py) — per-microbatch it is embarrassingly parallel.  Dedup
inside the stream uses watermarked ``dropDuplicates``, bounding state; the
fully-deferred variant (the reference's contract) keeps the stream stateless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from dipper_spark.core import TRIPLE_SCHEMA
from dipper_spark.core.curie import CurieMap
from dipper_spark.io.sinks import to_nt


def stream_triples_to_nt(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    curie_map: CurieMap | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """readStream over a parquet landing zone of triples → nt-line text sink.

    ``available_now=True`` is the T2 semantic: process what's new, then stop
    (the streaming analog of fetch-if-remote-newer).  Dedup deliberately
    deferred per the StreamedGraph contract (StreamedGraph.py:15-16).
    """
    stream = spark.readStream.schema(TRIPLE_SCHEMA).parquet(landing_dir)
    lines = to_nt(stream, curie_map)
    writer = (
        lines.writeStream.format("text")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_dedup_triples(stream: DataFrame, *, watermark_col: str | None = None,
                            delay: str = "1 hour") -> DataFrame:
    """In-stream s/p/o dedup.  With an event-time column the state store is
    bounded by the watermark (late duplicates past ``delay`` pass through —
    the downstream batch dedup still catches them, same two-tier contract as
    the reference's 'sort then uniquify')."""
    if watermark_col is not None:
        stream = stream.withWatermark(watermark_col, delay)
        return stream.dropDuplicatesWithinWatermark(["subject", "predicate", "object"])
    return stream.dropDuplicates(["subject", "predicate", "object"])
