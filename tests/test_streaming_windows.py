"""Event-time streaming extensions: watermarked windowed aggregation
(late-data drop, exactly-once window emission) and the custom stateful
sessionizer (applyInPandasWithState)."""

from __future__ import annotations

import json
import os

import pytest

from web_analytics_on_aws_spark.streaming.sessionize import sessionize_stream
from web_analytics_on_aws_spark.streaming.windowed import start_windowed_ingest

EVENT_SCHEMA = "user_id long, ts timestamp"


def _write(landing: str, name: str, rows: list[tuple[int, str]]) -> None:
    os.makedirs(landing, exist_ok=True)
    with open(os.path.join(landing, name), "w") as f:
        for uid, ts in rows:
            f.write(json.dumps({"user_id": uid, "ts": ts}) + "\n")


def test_watermark_window_finalization_and_late_drop(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    schema = StructType(
        [StructField("user_id", LongType()), StructField("ts", TimestampType())]
    )
    tmp = str(tmp_path)
    landing = f"{tmp}/landing"

    # run 1: two events in the 10:00 window + one at 13:30 that advances the
    # watermark to 11:30 (2h delay) → the 10:00 window (ends 11:00) finalizes
    _write(
        landing,
        "a.jsonl",
        [(1, "2026-03-02T10:05:00Z"), (2, "2026-03-02T10:20:00Z"), (1, "2026-03-02T13:30:00Z")],
    )
    q = start_windowed_ingest(
        spark, landing, schema, f"{tmp}/out", f"{tmp}/ckpt",
        time_col="ts", window="1 hour", watermark="2 hours",
    )
    q.awaitTermination()
    out = {
        r["window_start"].isoformat(): r["cnt"]
        for r in spark.read.parquet(f"{tmp}/out").collect()
    }
    assert out == {"2026-03-02T10:00:00": 2}  # 13:00 window still open

    # run 2: a LATE event for 10:10 (watermark already 11:30 → dropped) and
    # one at 16:30 advancing the watermark → the 13:00 window finalizes
    _write(landing, "b.jsonl", [(3, "2026-03-02T10:10:00Z"), (1, "2026-03-02T16:30:00Z")])
    q = start_windowed_ingest(
        spark, landing, schema, f"{tmp}/out", f"{tmp}/ckpt",
        time_col="ts", window="1 hour", watermark="2 hours",
    )
    q.awaitTermination()
    out = {
        r["window_start"].isoformat(): r["cnt"]
        for r in spark.read.parquet(f"{tmp}/out").collect()
    }
    assert out["2026-03-02T10:00:00"] == 2  # late event did NOT mutate it
    assert out["2026-03-02T13:00:00"] == 1


def test_stateful_sessionizer_closes_on_gap_and_timeout(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    schema = StructType(
        [StructField("user_id", LongType()), StructField("ts", TimestampType())]
    )
    tmp = str(tmp_path)
    landing = f"{tmp}/landing"

    # user 1: burst at 10:00-10:10, then (same batch) 11:30 → intra-batch gap
    # closes session 1 immediately; 11:30 session stays open.
    # user 2: single event, stays open until watermark passes.
    _write(
        landing,
        "a.jsonl",
        [
            (1, "2026-03-02T10:00:00Z"),
            (1, "2026-03-02T10:10:00Z"),
            (1, "2026-03-02T11:30:00Z"),
            (2, "2026-03-02T10:00:00Z"),
        ],
    )

    def run():
        events = spark.readStream.schema(schema).json(landing)
        sessions = sessionize_stream(events, time_col="ts", watermark="0 seconds")
        q = (
            sessions.writeStream.outputMode("append")
            .format("parquet")
            .option("path", f"{tmp}/sessions")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (
                (r["user_id"], r["session_start"].isoformat(), r["n_events"])
                for r in spark.read.parquet(f"{tmp}/sessions").collect()
            )
        )

    got = run()
    assert (1, "2026-03-02T10:00:00", 2) in got  # gap-closed immediately

    # run 2: event far in the future advances the watermark → event-time
    # timeouts fire: user 1's 11:30 session and user 2's session both close
    _write(landing, "b.jsonl", [(9, "2026-03-02T18:00:00Z")])
    got = run()
    assert (1, "2026-03-02T10:00:00", 2) in got
    assert (1, "2026-03-02T11:30:00", 1) in got
    assert (2, "2026-03-02T10:00:00", 1) in got


def test_streaming_session_windows_close_on_watermark(spark, tmp_path):
    """Native session_window streaming agg: two bursts inside the gap fuse
    into one session; a later event past the gap opens a second session;
    append mode emits only sessions the watermark has closed."""
    import pyspark.sql.functions as F

    from web_analytics_on_aws_spark.streaming.windowed import (
        session_window_counts,
    )

    src = str(tmp_path / "src")
    rows = [
        (1, "2026-03-01 10:00:00"), (1, "2026-03-01 10:10:00"),  # session A
        (1, "2026-03-01 11:30:00"),                               # session B
        (2, "2026-03-01 10:05:00"),                               # session C
        # watermark driver: far-future event keeps its own session open
        (9, "2026-03-02 09:00:00"),
    ]
    spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.parquet(src)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    out = session_window_counts(stream, time_col="ts", gap="30 minutes",
                                watermark="1 hour")
    q = (
        out.writeStream.format("memory").queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # one more empty trigger advances the watermark past the closed sessions
    got = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    assert (1, "2026-03-01 10:00:00", 2) in got   # fused 2-event session
    assert (1, "2026-03-01 11:30:00", 1) in got   # separate later session
    assert (2, "2026-03-01 10:05:00", 1) in got
    assert all(u != 9 for u, _, _ in got)         # open session not emitted
