"""Incremental compaction planner: only small-file partitions are selected
and rewritten; untouched partitions keep their files byte-identical."""

from __future__ import annotations

import glob

from web_analytics_on_aws_spark.operators.compaction import (
    compact_partition_path,
    partition_file_stats,
    plan_compaction,
)


def _seed(spark, root: str) -> None:
    # partition a: 12 tiny files; partition b: 1 file (already compact)
    a = spark.range(0, 120).selectExpr("id", "id * 2 AS v")
    a.repartition(12).write.mode("overwrite").parquet(f"{root}/day=a")
    b = spark.range(0, 10).selectExpr("id", "id * 2 AS v")
    b.coalesce(1).write.mode("overwrite").parquet(f"{root}/day=b")


def test_plan_selects_only_small_file_partitions(spark, tmp_path):
    root = str(tmp_path / "t")
    _seed(spark, root)
    stats = {s["partition"]: s for s in partition_file_stats(spark, root)}
    assert stats["day=a"]["n_files"] == 12
    assert stats["day=b"]["n_files"] == 1
    due = plan_compaction(spark, root, min_files=10)
    assert [s["partition"] for s in due] == ["day=a"]


def test_compact_rewrites_due_partition_only(spark, tmp_path):
    root = str(tmp_path / "t")
    _seed(spark, root)
    before_b = sorted(glob.glob(f"{root}/day=b/*.parquet"))
    rows_before = spark.read.parquet(root).count()
    for s in plan_compaction(spark, root, min_files=10):
        n = compact_partition_path(spark, root, s["partition"])
        assert n == 1  # tiny bytes → one output file
    assert len(glob.glob(f"{root}/day=a/*.parquet")) == 1
    assert sorted(glob.glob(f"{root}/day=b/*.parquet")) == before_b
    assert spark.read.parquet(root).count() == rows_before
    assert plan_compaction(spark, root, min_files=10) == []  # converged
