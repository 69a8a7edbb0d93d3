"""Engine-native event-time operators: watermarked windows + custom stateful
sessionization (beyond-reference capability, SURVEY.md §2.10).

The reference processes no event streams; these operators make the engine a
superset on the driver's ``events`` table shape (event_id, ts, user_id,
event_type, value).  Batch equivalents of the window agg live in the oracle
catalog (q_windowed_events) — semantics match.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling (or sliding) per-type event counts with a watermark.

    Works on a stream (late rows beyond ``watermark`` dropped, state bounded)
    and identically on a batch frame (watermark is a no-op there, which is
    how the oracle checks the semantics).
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        src.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "sum_value",
        )
    )


SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])
_STATE_SCHEMA = StructType([
    StructField("start_ts", DoubleType()),
    StructField("last_ts", DoubleType()),
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])


def _make_session_fn(gap_ms: int):
    def _session_fn(key, pdfs, state):
        return _sessionize(key, pdfs, state, gap_ms)

    return _session_fn


def _sessionize(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState, gap_ms: int
) -> Iterator[pd.DataFrame]:
    """Gap-based sessionizer: a session closes after ``gap_ms`` idle (state
    timeout) and is emitted once closed."""
    if state.hasTimedOut:
        start_ts, last_ts, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]], dtype="int64"),
                # µs precision up front — Arrow's safe cast refuses ns→µs
                "session_start": pd.to_datetime(
                    pd.Series([int(start_ts * 1e6)]), unit="us"
                ).astype("datetime64[us]"),
                "session_end": pd.to_datetime(
                    pd.Series([int(last_ts * 1e6)]), unit="us"
                ).astype("datetime64[us]"),
                "n_events": pd.Series([n], dtype="int64"),
                "total_value": pd.Series([total], dtype="float64"),
            }
        )
        return
    rows = pd.concat(list(pdfs))
    # LATE-DATA CONTRACT (round-12): Spark filters below-watermark rows for
    # built-in aggregations but NOT for arbitrary stateful ops — an
    # applyInPandasWithState function sees every row, so a straggler past
    # the watermark would silently re-open a user's closed session (proven
    # red by tests/test_streaming.py TestLateDataContract before this
    # guard).  Enforce the contract ourselves with the engine-provided
    # watermark: drop rows whose event time is behind it, and never touch
    # state on a late-only invocation.
    wm_ms = state.getCurrentWatermarkMs()
    if wm_ms > 0:
        rows = rows[rows["ts"].astype("int64") / 1e6 >= wm_ms]
        if rows.empty:
            if state.exists:
                state.setTimeoutDuration(gap_ms)
            return
    ts = rows["ts"].astype("int64") / 1e9
    lo, hi = float(ts.min()), float(ts.max())
    n, total = len(rows), float(rows["value"].sum())
    if state.exists:
        start_ts, last_ts, pn, ptotal = state.get
        state.update((min(start_ts, lo), max(last_ts, hi), pn + n, ptotal + total))
    else:
        state.update((lo, hi, n, total))
    state.setTimeoutDuration(gap_ms)
    # nothing to emit until the session closes
    return
    yield  # pragma: no cover — marks this function as a generator


def sessionize_events(events: DataFrame, *, gap_ms: int = 30 * 60 * 1000) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` — the engine's
    extension point for operators Spark lacks (per-user gap sessionization
    emitting closed sessions after ``gap_ms`` of processing-time idleness)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
