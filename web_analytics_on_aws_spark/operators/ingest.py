"""Partitioned ingest writer — the engine-side replacement for Firehose S3
delivery (SURVEY §2.1 S7/S8, §2.7 T3).

Reference semantics being reproduced:

- Hive-style directory partitioning on **ingest/processing time**, not event
  time: Firehose's prefix ``json-data/year=!{timestamp:yyyy}/month=.../
  day=.../hour=.../`` uses the *delivery* timestamp
  (/root/reference/web-analytics-parquet/.example.cdk.context.json:16);
  the ``timestamp`` column stays event time. A late event simply lands in a
  later ``hour=`` directory — by design (SURVEY §2.7).
- Record-granularity routing: ``Ok`` → raw zone, ``ProcessingFailed`` →
  ``error/`` zone with the same arrival-time layout (firehose.py:175-176).
- Partition columns are **int** via directory discovery
  (athena_named_query.py:33-37).

Scale notes: one pass over the batch, split by a pre-computed boolean —
Spark writes both zones without re-validating. Delivery is append-based
at-least-once — exactly Firehose's posture (a retried Lambda batch can be
re-delivered); the downstream upsert path (operators/upsert.py) is where
effectively-once is recovered when unique keys are configured, mirroring the
reference's T4/T5 design.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from web_analytics_on_aws_spark.operators.validate import RESULT_OK
from web_analytics_on_aws_spark.schema import PARTITION_COLUMNS


def with_ingest_partitions(df: DataFrame, ingest_ts: Column | None = None) -> DataFrame:
    """Stamp arrival-time partition columns (year, month, day, hour as int).

    ``ingest_ts`` defaults to the wall clock (Firehose delivery time); pass a
    column (e.g. a batch timestamp) for deterministic tests/replays.
    """
    ts = ingest_ts if ingest_ts is not None else F.current_timestamp()
    # Zero-padded partition VALUES so directory names match the Firehose
    # prefix shape exactly (year=2026/month=03/day=02/hour=14); hive partition
    # discovery re-infers them as ints on read — the same padded-path /
    # unpadded-int-value duality the reference has (athena_ctas.py:41-76).
    return (
        df.withColumn("year", F.year(ts).cast("int"))
        .withColumn("month", F.format_string("%02d", F.month(ts)))
        .withColumn("day", F.format_string("%02d", F.dayofmonth(ts)))
        .withColumn("hour", F.format_string("%02d", F.hour(ts)))
    )


def write_split(
    validated: DataFrame,
    raw_path: str,
    error_path: str,
    ingest_ts: Column | None = None,
    fmt: str = "text",
    mode: str = "append",
) -> None:
    """Route a validated batch: Ok → raw zone, ProcessingFailed → error zone,
    both hive-partitioned by arrival time.

    The raw zone stores the original wire payload (JSON lines, uncompressed —
    firehose.py:168) so compaction can re-read it exactly as Athena's
    ``web_log_json`` table does; the error zone keeps the offending payload
    for replay (S8).
    """
    stamped = with_ingest_partitions(validated, ingest_ts)
    # Both zones store the ORIGINAL wire payload as JSON-lines (the text sink
    # writes the raw string untouched — Firehose's payload.rstrip+newline,
    # schema_validator.py:127, is implicit in line framing). Parsing happens
    # at read time via the declared web_log_json schema, exactly like the
    # reference's OpenX JsonSerDe table.
    valid = stamped.filter(F.col("result") == RESULT_OK).select("value", *PARTITION_COLUMNS)
    invalid = stamped.filter(F.col("result") != RESULT_OK).select(
        "value", *PARTITION_COLUMNS
    )
    (
        valid.write.mode(mode)
        .partitionBy(*PARTITION_COLUMNS)
        .format(fmt)
        .save(raw_path)
    )
    (
        invalid.write.mode(mode)
        .partitionBy(*PARTITION_COLUMNS)
        .format("text")
        .save(error_path)
    )
