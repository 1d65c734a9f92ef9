"""Table-maintenance operators: clustering rewrite and layout statistics.

The reference's only maintenance job is small-file compaction (SURVEY §2.6
D5 — hourly CTAS, `athena_ctas.py`), reproduced in operators/compaction.py.
At 100 TB the second-order layout problem appears: even compacted files are
useless for selective queries unless row groups are *clustered* on the
filter keys, because parquet min/max pruning only skips a row group when
the key range inside it is narrow. Iceberg exposes this as
`rewrite_data_files` with a sort order; plain-parquet Spark expresses it as
repartitionByRange + sortWithinPartitions — which is what this module does.

- ``cluster_rewrite``: range-repartition on the cluster keys (one skew-aware
  sampling pass, AQE-compatible) then sort within partitions and write.
  Output files have disjoint key ranges → a point/range predicate prunes to
  O(1) files instead of all of them.
- ``layout_stats``: per-file min/max/rows for a column — the observability
  to verify clustering actually happened (and the input a planner would use
  to decide whether a rewrite is due, ≅ Iceberg's
  `optimize_rewrite_delete_file_threshold='10'` trigger,
  web-analytics-iceberg/README.md:187).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def cluster_rewrite(
    df: DataFrame,
    out_path: str,
    cluster_by: Sequence[str],
    num_files: int = 8,
    partition_by: Sequence[str] | None = None,
) -> None:
    """Rewrite ``df`` clustered on ``cluster_by``: range-partition into
    ``num_files`` disjoint key ranges, sort rows within each, write parquet.

    Range partitioning samples key quantiles, so skewed keys still yield
    balanced files (vs hash bucketing, which preserves skew per bucket).
    """
    cols = [F.col(c) for c in cluster_by]
    out = df.repartitionByRange(num_files, *cols).sortWithinPartitions(*cols)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_path)


def layout_stats(
    spark: SparkSession, path: str, column: str
) -> DataFrame:
    """Per-file (min, max, rows) for ``column`` — distributed: groups by the
    file provenance column, never collects row data to the driver."""
    df = spark.read.parquet(path)
    return (
        df.withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(
            F.min(column).alias("min_val"),
            F.max(column).alias("max_val"),
            F.count("*").alias("rows"),
        )
    )


def clustering_overlap(stats: DataFrame) -> int:
    """Number of overlapping (min,max) file-range pairs — 0 means perfectly
    clustered (every file's key range disjoint). Computed with a window over
    ranges sorted by min: a file overlaps its predecessor iff its min <= the
    running max of all earlier files."""
    from pyspark.sql import Window

    w = (
        Window.orderBy("min_val")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    overlapped = (
        stats.withColumn("__prev_max", F.max("max_val").over(w))
        .filter(F.col("__prev_max").isNotNull() & (F.col("min_val") <= F.col("__prev_max")))
        .count()
    )
    return overlapped


def bucketize(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and sorted) managed parquet table.

    The 100 TB answer to the fact-fact shuffle (SCALE.md): ``orders`` and
    ``lineitem`` bucketed on orderkey with the same bucket count make every
    orderkey equi-join between them shuffle-free — each bucket pair is
    joined in place, so the two largest tables in the warehouse never cross
    the network for their most common join. This is the Spark-native
    equivalent of the reference's hive-partitioned layout taken one level
    further: partitioning prunes *scans* (SURVEY §1.4), bucketing prunes
    *exchanges*. sortBy on the join key additionally removes the sort from
    sort-merge joins (bucketed reads report the sort order to the planner).

    At 100 TB pick ``num_buckets`` so one bucket of the bigger table is
    ~128-512 MB (e.g. 4096 buckets for a 1 TB-compressed lineitem); bucket
    counts must MATCH across tables intended to co-join (Spark only
    colocates equal counts; a 2:1 ratio still shuffles the smaller side).
    """
    # One file per bucket: repartition on the same hash the bucketing uses
    # (both are Murmur3 HashPartitioning) so each task owns exactly one
    # bucket. Spark only propagates sortBy ordering to the planner (letting
    # sort-merge joins skip their Sort) when a bucket is a single file.
    writer = (
        df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
        .write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    writer.saveAsTable(table)


def bucket_info(spark: SparkSession, table: str) -> dict:
    """Bucket spec of a managed table ({num_buckets, bucket_cols, sort_cols})."""
    rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    info = {r.col_name: r.data_type for r in rows}
    parse = lambda s: [c.strip(" `") for c in s.strip("[]").split(",")] if s else []
    return {
        "num_buckets": int(info.get("Num Buckets", "0")),
        "bucket_cols": parse(info.get("Bucket Columns", "")),
        "sort_cols": parse(info.get("Sort Columns", "")),
    }
