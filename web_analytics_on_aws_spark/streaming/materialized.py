"""Streaming materialized aggregate: per-key running counters maintained
across micro-batches with bucket-scoped merges.

The reference materializes nothing (every query recomputes over S3; SURVEY
§3.3) — but its users' dashboards recompute the same per-user/per-event
counters hourly. This operator maintains that result incrementally:

  landing stream → per-batch partial aggregate → merge into a persistent
  counter table partitioned by key-hash bucket → dynamic-partition-overwrite
  of ONLY the buckets the batch touched.

Scale design: the state table is hive-partitioned on ``__bucket =
pmod(hash(keys), n_buckets)``. A micro-batch touching k distinct keys
rewrites at most min(k, n_buckets) partitions — merge I/O is proportional
to the batch's key footprint, not the table size (the plain-parquet
equivalent of Iceberg MERGE INTO with bucket(n, key) partitioning). Reads
of existing state are partition-pruned to the same buckets. Counters are
additive (count/sum), so merge = union + re-aggregate — associative,
restart-safe under checkpoint replay of a completed batch only if the batch
is re-merged idempotently; we get that by tagging state rows with the last
applied batch_id per bucket and skipping already-applied batches.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

N_BUCKETS_DEFAULT = 16


def _bucket(keys: Sequence[str], n_buckets: int) -> F.Column:
    if not keys:  # global (keyless) view → single bucket
        return F.lit(0).cast("int")
    return F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int")


def merge_counters(
    spark: SparkSession,
    state_path: str,
    batch_df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    batch_id: int,
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> None:
    """Merge one micro-batch into the counter table (cnt, total per keys).

    Reads only the touched buckets (partition-pruned), skips batches already
    applied to a bucket (idempotent re-delivery), unions + re-aggregates,
    and dynamic-partition-overwrites just those buckets.
    """
    keys = list(keys)
    batch_agg = (
        batch_df.groupBy(*keys)
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("total"),
        )
        .withColumn("__bucket", _bucket(keys, n_buckets))
        .withColumn("__last_batch", F.lit(batch_id).cast("long"))
    )
    touched = [r["__bucket"] for r in batch_agg.select("__bucket").distinct().collect()]
    if not touched:
        return

    out_cols = [*keys, "cnt", "total", "__last_batch", "__bucket"]
    merged = batch_agg.select(out_cols)
    if os.path.exists(state_path):
        existing = (
            spark.read.option("basePath", state_path)
            .parquet(state_path)
            .filter(F.col("__bucket").isin(touched))
        )
        # idempotency: a checkpoint-replayed batch that already reached these
        # buckets must not double-count
        already = existing.filter(F.col("__last_batch") >= batch_id).limit(1).count()
        if already:
            return
        merged = existing.select(out_cols).unionByName(merged)

    final = (
        merged.groupBy(*keys, "__bucket")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("total").alias("total"),
            F.max("__last_batch").alias("__last_batch"),
        )
        .select(out_cols)
    )
    # spark.sql.sources.partitionOverwriteMode=dynamic (session.py) scopes the
    # overwrite to the touched __bucket= partitions only
    final.write.mode("overwrite").partitionBy("__bucket").parquet(state_path)


def start_counter_view(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    state_path: str,
    checkpoint_dir: str,
    keys: Sequence[str] = ("user_id",),
    value_col: str = "value",
    n_buckets: int = N_BUCKETS_DEFAULT,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Run the landing-dir stream into the materialized counter table."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.json(landing_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        merge_counters(
            batch_df.sparkSession, state_path, batch_df, keys, value_col,
            batch_id, n_buckets,
        )

    writer = lines.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_counters(spark: SparkSession, state_path: str) -> DataFrame:
    df = spark.read.option("basePath", state_path).parquet(state_path)
    return df.drop("__bucket", "__last_batch")


def merge_uniques(
    spark: SparkSession,
    state_path: str,
    batch_df: DataFrame,
    keys: Sequence[str],
    col: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
    lgk: int = 12,
) -> None:
    """Merge one micro-batch into a materialized per-key UNIQUES view backed
    by HLL sketches (operators/sketches.py rationale).

    Unlike the additive counters above, no batch-id replay guard is needed:
    HLL union is IDEMPOTENT (registers are per-bucket maxima — re-merging a
    checkpoint-replayed batch is a no-op on the state), so at-least-once
    delivery gives exactly-once *results*. State is one ~2^lgk-byte binary
    per key, bucket-partitioned like the counters; distinct-user dashboards
    read estimates without ever re-scanning history.
    """
    keys = list(keys)
    batch_agg = (
        batch_df.groupBy(*keys)
        .agg(F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("uniq_sketch"))
        .withColumn("__bucket", _bucket(keys, n_buckets))
    )
    touched = [r["__bucket"] for r in batch_agg.select("__bucket").distinct().collect()]
    if not touched:
        return
    out_cols = [*keys, "uniq_sketch", "__bucket"]
    merged = batch_agg.select(out_cols)
    if os.path.exists(state_path):
        existing = (
            spark.read.option("basePath", state_path)
            .parquet(state_path)
            .filter(F.col("__bucket").isin(touched))
        )
        merged = existing.select(out_cols).unionByName(merged)
    final = (
        merged.groupBy(*keys, "__bucket")
        .agg(F.hll_union_agg("uniq_sketch").alias("uniq_sketch"))
        .select(out_cols)
    )
    final.write.mode("overwrite").partitionBy("__bucket").parquet(state_path)


def start_uniques_view(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    state_path: str,
    checkpoint_dir: str,
    keys: Sequence[str] = ("hostname",),
    col: str = "userId",
    n_buckets: int = N_BUCKETS_DEFAULT,
    available_now: bool = True,
) -> StreamingQuery:
    """Run the landing-dir stream into the materialized uniques view."""
    lines = spark.readStream.schema(schema).json(landing_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        merge_uniques(
            batch_df.sparkSession, state_path, batch_df, keys, col, n_buckets
        )

    writer = lines.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_uniques(spark: SparkSession, state_path: str) -> DataFrame:
    """Current per-key distinct estimates from the materialized view."""
    df = spark.read.option("basePath", state_path).parquet(state_path)
    return df.select(
        *[c for c in df.columns if c not in ("uniq_sketch", "__bucket")],
        F.hll_sketch_estimate("uniq_sketch").alias("uniq_estimate"),
    )


def topk_counters(
    spark: SparkSession, state_path: str, k: int = 10, by: str = "cnt"
) -> DataFrame:
    """Read-side top-k over the materialized counter view: a dashboard
    "top users by events" answered from O(keys) state rows — never from
    raw history. TakeOrderedAndProject over the state table (no full sort);
    deterministic tie-break on the key columns."""
    df = read_counters(spark, state_path)
    keys = [c for c in df.columns if c not in ("cnt", "total")]
    return df.orderBy(F.desc(by), *[F.asc(c) for c in keys]).limit(k)
