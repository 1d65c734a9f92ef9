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


def morton_code(cols: Sequence[str], mins, maxs, bits: int = 8) -> F.Column:
    """Z-order (Morton) key for 2+ numeric columns, pure JVM bit arithmetic.

    Each column is scaled to a ``bits``-bit integer rank over its [min, max]
    range (uniform buckets — fine for layout; quantile buckets would handle
    heavy skew), then the ranks' bits are interleaved so nearby z-values are
    nearby in EVERY dimension at once. mins/maxs are plain Python numbers
    (one cheap agg to obtain) — broadcast as literals, no per-row lookup.
    """
    n = 1 << bits
    ranks = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = float(hi) - float(lo) or 1.0
        r = F.floor((F.col(c).cast("double") - F.lit(float(lo))) / F.lit(span) * n)
        ranks.append(F.least(F.greatest(r, F.lit(0)), F.lit(n - 1)).cast("long"))
    z = F.lit(0).cast("long")
    d = len(ranks)
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * d + j))
    return z


def zorder_rewrite(
    df: DataFrame,
    out_path: str,
    cluster_by: Sequence[str],
    num_files: int = 8,
    bits: int = 8,
) -> None:
    """Rewrite clustered on the Z-ORDER of ``cluster_by`` (vs
    ``cluster_rewrite``'s lexicographic order, which gives tight ranges on
    the FIRST key only): every file gets a bounded min/max envelope in every
    clustered dimension, so parquet min/max skipping prunes selective
    predicates on ANY of them. This is the plain-parquet equivalent of
    Iceberg/Delta OPTIMIZE ZORDER BY — the layout half of the reference's
    compaction job (SURVEY §2.6 D5) taken to multi-dimensional predicates.
    """
    cols = list(cluster_by)
    row = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    mins = [row[f"lo_{c}"] for c in cols]
    maxs = [row[f"hi_{c}"] for c in cols]
    z = morton_code(cols, mins, maxs, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_path)
    )
