"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY §7.5 extension; the batch twin is
plans/weblog.py sessionization / plans/windows.py session_window).

This is the one place the engine needs arbitrary per-key streaming state —
Spark's built-in session_window covers aggregate-per-session, but emitting a
*session record on close* (the classic clickstream deliverable) needs a
custom state machine:

  per user: keep (session_start, last_seen, n_events);
  on new events → extend or roll the session (intra-batch gaps close
  sessions immediately); on event-time timeout (watermark passes
  last_seen + gap) → emit the final open session and clear state.

Scale notes: state is 3 longs per active user (bounded by watermark
eviction); events arrive grouped+sorted per key in Arrow batches. Output is
append-mode — each closed session exactly once.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_SECONDS = 30 * 60

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# state: (session_start_us, last_seen_us, n_events)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("cnt", LongType()),
    ]
)


def _emit(user_id: int, start_us: int, last_us: int, cnt: int) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "user_id": user_id,
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(last_us, unit="us"),
                "n_events": cnt,
            }
        ]
    )


def _sessionize_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    gap_us = SESSION_GAP_SECONDS * 1_000_000
    (user_id,) = key

    if state.hasTimedOut:
        start_us, last_us, cnt = state.get
        state.remove()
        yield _emit(user_id, start_us, last_us, cnt)
        return

    ts_list: list[int] = []
    for pdf in pdfs:
        ts_list.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
    ts_list.sort()

    if state.exists:
        start_us, last_us, cnt = state.get
    else:
        start_us, last_us, cnt = 0, 0, 0

    for t_us in ts_list:
        if cnt == 0:
            start_us, last_us, cnt = t_us, t_us, 1
        elif t_us - last_us > gap_us:
            # intra-batch gap: close the running session immediately
            yield _emit(user_id, start_us, last_us, cnt)
            start_us, last_us, cnt = t_us, t_us, 1
        else:
            last_us = max(last_us, t_us)
            cnt += 1

    state.update((start_us, last_us, cnt))
    # close when the watermark passes last event + gap
    state.setTimeoutTimestamp(last_us // 1000 + SESSION_GAP_SECONDS * 1000)


def sessionize_stream(
    events: DataFrame,
    time_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "0 seconds",
) -> DataFrame:
    """events (streaming) → closed-session records (append mode).

    Sessions close either on an intra-batch gap or via event-time timeout
    once the watermark passes last_seen + gap.
    """
    prepared = events.select(
        F.col(user_col).alias("user_id"), F.col(time_col).alias("ts")
    ).withWatermark("ts", watermark)
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
