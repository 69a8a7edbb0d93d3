"""Structured Streaming layer (SURVEY.md §2.10).

The reference has no event-time semantics — its only "streaming" is the
append-only StreamedGraph nt sink with deferred dedup
(dipper/graph/StreamedGraph.py:13-20) and fetch-if-newer incremental refresh
(dipper/sources/Source.py:280-358).  This package maps those two (T1/T2) onto
real Structured Streaming and then adds the engine-native capabilities the
reference lacks: watermarks, tumbling/sliding windows, late-data handling,
and custom stateful operators.
"""

from dipper_spark.streaming.nt_stream import (
    stream_triples_to_nt,
    streaming_dedup_triples,
)
from dipper_spark.streaming.events import (
    sessionize_events,
    windowed_event_counts,
)

__all__ = [
    "sessionize_events",
    "stream_triples_to_nt",
    "streaming_dedup_triples",
    "windowed_event_counts",
]
