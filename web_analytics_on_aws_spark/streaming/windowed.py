"""Event-time windowed streaming aggregation with watermarks — the
Spark-native late-data story the reference lacks (SURVEY §2.7: its only
late-data semantic is "arrival-time partitioning absorbs lateness"; §7.5
mandates real event-time windows + watermarks as the extension).

Batch twins of these windows are oracle-checked in plans/windows.py; here
the same operators run incrementally with bounded state:

- watermark bounds state size (windows older than wm are finalized+evicted);
- append output mode emits each window exactly once, when it finalizes;
- late events beyond the watermark are dropped — the measurable,
  configurable alternative to the reference's silent late-arrival skew.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def windowed_counts(
    events: DataFrame,
    time_col: str = "timestamp",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Watermarked tumbling/sliding count over an event-time column.
    Works on both batch and streaming DataFrames (same plan, stateful when
    streaming)."""
    win = F.window(time_col, window, slide) if slide else F.window(time_col, window)
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(*keys, win)
        .agg(F.count("*").alias("cnt"))
        .select(
            *keys,
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "cnt",
        )
    )


def start_windowed_ingest(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    out_path: str,
    checkpoint_dir: str,
    time_col: str = "timestamp",
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = (),
    available_now: bool = True,
) -> StreamingQuery:
    """File-source event stream → watermarked windowed counts → parquet
    (append mode: each window lands exactly once, on finalization)."""
    events = spark.readStream.schema(schema).json(landing_dir)
    agg = windowed_counts(events, time_col, window, None, watermark, keys)
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def session_window_counts(
    events: DataFrame,
    time_col: str = "timestamp",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Watermarked SESSION windows (gap-based, Spark-native
    ``session_window``): dynamic per-key windows that extend while events
    arrive within ``gap`` and finalize when the watermark passes the gap —
    the streaming twin of the batch sessionization in plans/windows.py
    (``weblog_session_window_30m``). Append mode emits each closed session
    exactly once with its span and count.

    Scale: state is one open session per active key (merged in the state
    store as events arrive, keyed by the same shuffle key downstream
    per-user operators want); the watermark bounds it to keys active in
    the horizon."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(*keys, F.session_window(time_col, gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            *keys,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
