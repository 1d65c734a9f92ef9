"""SparkSession factory with scale-oriented defaults.

The reference delegates physical execution to Athena engine v3 (Trino); our
equivalent is Catalyst + Tungsten with AQE enabled (SURVEY.md §4). Defaults
here are chosen for a large cluster but parameterized so tests run on
``local[N]``:

- AQE on (runtime coalesce / skew-join handling — replaces hand-tuning
  shuffle partition counts per scale factor).
- UTC session timezone (the reference's wire format is implicit-UTC
  ``yyyy-MM-dd'T'HH:mm:ss'Z'`` — /root/reference/web-analytics-parquet/src/
  main/python/SchemaValidator/schema_validator.py:70-82).
- ``parquet.nanosAsLong`` — the driver's testdata stores ``events.ts`` as
  TIMESTAMP(NANOS) which vanilla Spark rejects; we read nanos as long and
  normalize in the loader (sources/tables.py).
- Snappy parquet (reference curated zone: athena_ctas.py:33-34).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "web-analytics-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    On a real cluster, ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # int64-micros timestamps (Iceberg's mandated physical type), NOT
        # Spark's legacy INT96: INT96 columns carry no parquet min/max
        # stats, which silently disables both footer skipping AND manifest
        # column stats (collect_file_stats) on every timestamp column
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource filter pushdown (snapshot format file skipping)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Ingest-time hive partitioning writes one dir per (y,m,d,h); keep
        # dynamic partition overwrite so compaction re-runs are idempotent
        # (reference fakes idempotency with drop-then-recreate, SURVEY §3.2).
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Report sortBy order from bucketed scans (operators/maintenance.py
        # bucketize writes one file per bucket, which Spark re-verifies
        # before trusting the order): sort-merge joins between co-bucketed
        # tables then need neither Exchange nor Sort.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
