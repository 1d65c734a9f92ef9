"""Streaming user-profile state: lifetime event count, value sum, and
first/last event time per user, updated per micro-batch (Update mode) — the
streaming materialization of "user 360" lookups that would otherwise
re-aggregate history per query.

Dual backend, same semantics (picked automatically):

- **transformWithState** (`transformWithStateInPandas`, Spark 4's
  arbitrary-stateful successor API with typed value state + TTL) when its
  protobuf dependency is importable;
- **applyInPandasWithState** otherwise (this container ships no
  `google.protobuf`, which the TWS state-server protocol requires — the
  fallback keeps the operator runnable everywhere; the TTL option maps to
  TWS only).

Scale: state is O(|users|) fixed-width rows in the state store, partitioned
by the grouping key — the same shuffle key every downstream per-user join
wants. TTL (`ttl_ms`, TWS path) ages out dormant users, bounding state on
unbounded key domains (the profile-level analog of the reference's 24 h
stream retention, kds.py:28-31)."""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame

PROFILE_SCHEMA = (
    "user_id BIGINT, events BIGINT, total_value DOUBLE, "
    "first_ts TIMESTAMP, last_ts TIMESTAMP"
)
_STATE_SCHEMA = (
    "events BIGINT, total_value DOUBLE, first_ts TIMESTAMP, last_ts TIMESTAMP"
)


def transform_with_state_available() -> bool:
    """TWS drives a protobuf state-server protocol; without the python
    `protobuf` package the driver worker crashes at init."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _fold(state: tuple | None, batches: list[pd.DataFrame]) -> tuple:
    events, total, first_ts, last_ts = state or (0, 0.0, None, None)
    for pdf in batches:
        if len(pdf) == 0:
            continue
        events += len(pdf)
        total += float(pdf["value"].sum())
        lo, hi = pdf["ts"].min(), pdf["ts"].max()
        first_ts = lo if first_ts is None else min(first_ts, lo)
        last_ts = hi if last_ts is None else max(last_ts, hi)
    return events, total, first_ts, last_ts


def _emit(key: Any, state: tuple) -> pd.DataFrame:
    events, total, first_ts, last_ts = state
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "events": [events],
            "total_value": [total],
            "first_ts": [first_ts],
            "last_ts": [last_ts],
        }
    )


def user_profile_stream(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """events stream (user_id, ts, value, …) → per-user running profile.
    Emits the updated profile row for each user touched by the batch."""
    if transform_with_state_available():
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class UserProfileProcessor(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._profile = handle.getValueState("profile", _STATE_SCHEMA, ttl_ms)

            def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
                prev = self._profile.get() if self._profile.exists() else None
                state = _fold(prev, list(rows))
                self._profile.update(state)
                yield _emit(key, state)

            def close(self) -> None:
                pass

        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=UserProfileProcessor(),
            outputStructType=PROFILE_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        prev = tuple(state.get) if state.exists else None
        folded = _fold(prev, list(pdfs))
        state.update(folded)
        yield _emit(key, folded)

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
