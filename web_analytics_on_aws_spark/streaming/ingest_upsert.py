"""The datafirehose-iceberg variant's full streaming pipeline: landing →
validate (snake_case dialect) → parse to typed columns → MERGE on
``unique_keys`` into an event-partitioned table (SURVEY §3.1 iceberg delta +
§2.7 T4/T5).

Reference semantics: Firehose invokes the transformer Lambda (validation +
``operation: update`` tagging when ``unique_keys = [user_id, timestamp]``,
firehose_to_iceberg_transformer.py:114-138) and then itself commits the
micro-batch into the Iceberg table — appends without keys, upserts with.
Here ``foreachBatch`` plays Firehose's committer role: per batch, the
validated records MERGE into the table (last-write-wins within the batch by
arrival order), invalid records quarantine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from web_analytics_on_aws_spark.operators.ingest import write_split
from web_analytics_on_aws_spark.operators.upsert import (
    DEFAULT_UNIQUE_KEYS,
    merge_parquet,
    tag_operation,
)
from web_analytics_on_aws_spark.operators.validate import RESULT_OK, validate
from web_analytics_on_aws_spark.schema import WEB_LOG_ICEBERG_FIELDS
from web_analytics_on_aws_spark.streaming.ingest_stream import read_landing_stream


def start_ingest_upsert(
    spark: SparkSession,
    landing_dir: str,
    table_path: str,
    error_path: str,
    checkpoint_dir: str,
    unique_keys: list[str] | None = None,
    partition_by: list[str] | None = None,
    available_now: bool = False,
    trigger_seconds: int | None = 60,
) -> StreamingQuery:
    """Landing → validated, typed, MERGEd event-partitioned table.

    ``unique_keys=None`` → append mode (``operation='insert'``), matching
    the reference's keyless configuration.
    """
    if partition_by is None:
        partition_by = ["event"]
    lines = read_landing_stream(spark, landing_dir)
    data_cols = [n for n, _ in WEB_LOG_ICEBERG_FIELDS]

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        validated = validate(batch_df, value_col="value", dialect="iceberg")
        validated.persist()
        try:
            # quarantine invalids (record granularity, T3)
            invalid = validated.filter(F.col("result") != RESULT_OK).select("value")
            if invalid.limit(1).count() > 0:
                from web_analytics_on_aws_spark.operators.ingest import (
                    with_ingest_partitions,
                )

                (
                    with_ingest_partitions(invalid)
                    .write.mode("append")
                    .partitionBy("year", "month", "day", "hour")
                    .format("text")
                    .save(error_path)
                )
            typed = (
                validated.filter(F.col("result") == RESULT_OK)
                .select(*data_cols)
                .withColumn("__arrival_seq", F.monotonically_increasing_id())
            )
            typed = tag_operation(typed, unique_keys)
            if unique_keys:
                merge_parquet(
                    spark,
                    typed.drop("operation"),
                    table_path,
                    keys=unique_keys,
                    partition_by=partition_by,
                    order_col="__arrival_seq",
                )
            else:
                (
                    typed.drop("operation", "__arrival_seq")
                    .write.mode("append")
                    .partitionBy(*partition_by)
                    .parquet(table_path)
                )
        finally:
            validated.unpersist()

    writer = lines.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
