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
