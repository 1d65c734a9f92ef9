"""Training-corpus shard export: size-bounded, order-preserving shards with
a manifest — the hand-off format between a curation pipeline and a training
dataloader (WebDataset/Megatron-style fixed-size shards, parquet-encoded).

Contract: every row carries a total-order position column (from
``sampling.epoch_shuffle`` / ``sampling.roundrobin_interleave``); shard i
holds positions [i·rows_per_shard, (i+1)·rows_per_shard). Shard assignment
is then a row-local expression — no extra shuffle beyond the hive
partitionBy write — and rereading any shard subset is partition-pruned at
the directory level. Readers restore exact training order by sorting the
(bounded, rows_per_shard-sized) shard on the position column.

At 100 TB: shard count = rows/rows_per_shard directories; the manifest is
one tiny aggregate (|shards| rows) collected to the driver — bounded by
construction, not by data luck.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "_shard_manifest.json"


def write_training_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int = 100_000,
    pos_col: str = "train_pos",
) -> dict:
    """Write ``df`` as hive-partitioned shards of ``rows_per_shard`` rows
    (last shard ragged), plus a JSON manifest {shard_id: {n_rows, min_pos,
    max_pos}}. Returns the manifest dict. Positions must be the dense
    1-based global order the sampling operators emit."""
    if pos_col not in df.columns:
        raise ValueError(f"position column {pos_col!r} missing; run epoch_shuffle "
                         "or roundrobin_interleave first")
    sharded = df.withColumn(
        "shard_id",
        F.floor((F.col(pos_col) - 1) / F.lit(rows_per_shard)).cast("long"),
    )
    sharded.write.partitionBy("shard_id").mode("overwrite").parquet(path)
    # Manifest stats come from the WRITTEN bytes (two-column partition-
    # pruned read), not a recompute of the upstream lineage — half the job
    # cost, and the manifest can never diverge from the data on disk.
    written = sharded.sparkSession.read.parquet(path)
    stats = (
        written.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(pos_col).alias("min_pos"),
            F.max(pos_col).alias("max_pos"),
        )
        .collect()
    )
    manifest = {
        "rows_per_shard": rows_per_shard,
        "pos_col": pos_col,
        "n_shards": len(stats),
        "total_rows": int(sum(r["n_rows"] for r in stats)),
        "shards": {
            str(r["shard_id"]): {
                "n_rows": int(r["n_rows"]),
                "min_pos": int(r["min_pos"]),
                "max_pos": int(r["max_pos"]),
            }
            for r in sorted(stats, key=lambda r: r["shard_id"])
        },
    }
    for sid, s in manifest["shards"].items():
        lo = int(sid) * rows_per_shard + 1
        hi = lo + rows_per_shard - 1
        if not (lo <= s["min_pos"] and s["max_pos"] <= hi):
            raise AssertionError(
                f"shard {sid} holds positions outside [{lo}, {hi}]: {s}"
            )
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        return json.load(f)


def read_training_shards(
    spark: SparkSession,
    path: str,
    shards: list[int] | None = None,
) -> DataFrame:
    """Read shards back in training order. ``shards`` restricts to a subset
    (a dataloader worker's slice) — the filter is on the hive partition
    column, so non-selected shard directories are never listed or read."""
    manifest = read_manifest(path)
    df = spark.read.parquet(path)
    if shards is not None:
        df = df.filter(F.col("shard_id").isin([int(s) for s in shards]))
    return df.orderBy(manifest["pos_col"])
