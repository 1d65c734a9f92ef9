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
