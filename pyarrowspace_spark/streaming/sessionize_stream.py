"""Stateful streaming sessionization via applyInPandasWithState
(SURVEY §7.1 M7 — additive; the reference has no streaming surface).

Streaming twin of operators/analytics.sessionize: per-user gap-based
sessions maintained as keyed state across micro-batches; a session is
EMITTED when a later event arrives more than `gap_minutes` after the
session's last event. Idle-session flushing in production would add
EventTimeTimeout + watermark; the core state transition is identical.

Scale notes: state is one tiny tuple per active user key, partitioned
by user_id — the same shuffle key as the batch operator; per-batch
work is O(events in batch), independent of history length.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (LongType, StructField, StructType,
                               TimestampType)

OUT_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("session_start", TimestampType(), False),
    StructField("session_end", TimestampType(), False),
    StructField("n_events", LongType(), False),
])

# state: (session_start_us, last_event_us, n_events)
STATE_SCHEMA = StructType([
    StructField("start_us", LongType(), True),
    StructField("last_us", LongType(), True),
    StructField("n", LongType(), True),
])


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts_us",
    user_col: str = "user_id",
) -> DataFrame:
    """events must be a streaming DataFrame carrying (user_col,
    ts_col epoch-micros). Returns closed sessions, update mode."""
    if not events.isStreaming:
        raise ValueError("expected a streaming DataFrame (readStream source)")
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_minutes) * 60 * 1_000_000

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts = []
        for pdf in pdfs:
            ts.extend(int(t) for t in pdf[ts_col])
        ts.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        closed = []
        for t in ts:
            if last is not None and t - last > gap_us:
                closed.append((user_id, start, last, n))
                start, n = None, 0
            if start is None:
                start = t
            n += 1
            last = t
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame({
                "user_id": [c[0] for c in closed],
                "session_start": pd.to_datetime(
                    [c[1] for c in closed], unit="us"),
                "session_end": pd.to_datetime(
                    [c[2] for c in closed], unit="us"),
                "n_events": [c[3] for c in closed],
            })

    return (
        events.groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
