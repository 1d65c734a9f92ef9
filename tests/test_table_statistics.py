"""Manifest-resolved table statistics feeding the join planner (VERDICT
r3 #8): the Python `snapshot` DataSource cannot report statistics to
Catalyst (no such hook in the pyspark DataSourceReader API), so a join
against it plans as shuffle even when the table is KBs.
`snapshots.broadcast_if_small` resolves row/byte counts from the manifest
+ parquet footers (metadata-only) and flips the join to broadcast — the
plan pin here shows the SAME join planned both ways.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from web_analytics_on_aws_spark.sources.snapshots import (
    broadcast_if_small,
    commit_append,
    delete_keys_mor,
    delete_where_mor,
    table_statistics,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_table_statistics_metadata_only(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_append(
        spark.range(200).withColumn("v", F.col("id") * 2).coalesce(2), t
    )
    st = table_statistics(t)
    assert st["row_count"] == 200 and st["exact"] and st["n_files"] == 2
    assert 0 < st["size_bytes"] < 1 << 20

    # MOR position deletes subtract their sidecar rows exactly
    delete_where_mor(spark, t, "id < 10")
    st = table_statistics(t)
    assert st["row_count"] == 190 and st["exact"]

    # equality deletes → row count becomes an upper bound
    delete_keys_mor(spark, t, spark.createDataFrame([(11,)], "id long"))
    st = table_statistics(t)
    assert st["row_count"] == 190 and not st["exact"]


def test_manifest_stats_flip_join_to_broadcast(spark, tmp_path):
    from web_analytics_on_aws_spark.sources.snapshot_datasource import (
        SnapshotDataSource,
    )

    t = str(tmp_path / "dim")
    commit_append(
        spark.range(100).withColumn("name", F.concat(F.lit("n"), "id")), t
    )
    spark.dataSource.register(SnapshotDataSource)
    dim = spark.read.format("snapshot").option("path", t).load()
    # fact sized ABOVE the broadcast threshold in Catalyst's own estimate
    # (range ≈ 8 B/row → ~16 MB vs the 1 MB threshold set below), so
    # neither side auto-broadcasts: the fact is too big, the DataSource
    # dim has no statistics
    fact = spark.range(2_000_000).withColumn("k", F.col("id") % 100)
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1MB")
    try:
        # WITHOUT stats: Catalyst sees the DataSource's default size
        # estimate → no broadcast at planning time
        plain = fact.join(dim, fact["k"] == dim["id"])
        assert "BroadcastHashJoin" not in _plan(plain)

        # WITH manifest stats: KB-scale table → broadcast hint → BHJ
        hinted = fact.join(
            broadcast_if_small(spark, dim, t), fact["k"] == dim["id"]
        )
        assert "BroadcastHashJoin" in _plan(hinted)
        assert plain.count() == hinted.count() == 2_000_000

        # threshold disabled → hint declines, plan unchanged
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        off = fact.join(
            broadcast_if_small(spark, dim, t), fact["k"] == dim["id"]
        )
        assert "BroadcastHashJoin" not in _plan(off)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)


def test_table_statistics_missing_table_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        table_statistics(str(tmp_path / "nope"))


def test_stats_metadata_table_and_cli(spark, tmp_path, capsys):
    from web_analytics_on_aws_spark.__main__ import main
    from web_analytics_on_aws_spark.sources.snapshots import metadata_table

    t = str(tmp_path / "t")
    commit_append(spark.range(25).coalesce(1), t)
    row = metadata_table(spark, t, "stats").collect()[0]
    assert (row["row_count"], row["n_files"], row["exact"]) == (25, 1, True)
    assert main(["snapshot", t, "stats"]) == 0
    assert "row_count" in capsys.readouterr().out


def test_pruning_aware_broadcast_flip(spark, tmp_path):
    """Round 7: a filtered read of an OVER-threshold partitioned dimension
    broadcasts when its post-prune byte total fits — the estimate runs the
    reader's own file-skipping against the pushed filters, manifest-only."""
    import pyspark.sql.functions as F
    from pyspark.sql.datasource import EqualTo

    from web_analytics_on_aws_spark.sources.partitioning import (
        set_partition_spec,
    )
    from web_analytics_on_aws_spark.sources.snapshot_datasource import (
        SnapshotDataSource,
    )
    from web_analytics_on_aws_spark.sources.snapshots import (
        broadcast_if_small,
        commit_append,
        estimate_pruned_bytes,
        table_statistics,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)
    t = str(tmp_path / "dim")
    # ~2.5 MB table: one hot partition value (~99%) + a tiny one
    dim = spark.range(120_000).select(
        F.col("id"),
        F.when(F.col("id") % 100 == 0, "small").otherwise("big").alias("seg"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    commit_append(dim.limit(0), t)
    set_partition_spec(spark, t, [("seg", "identity")])
    commit_append(dim, t)

    total = table_statistics(t)["size_bytes"]
    pushed = [EqualTo(("seg",), "small")]
    pruned = estimate_pruned_bytes(t, pushed)
    assert 0 < pruned < total / 10  # the slice really is a sliver

    fact = spark.range(500_000).withColumn(
        "k", (F.col("id") % 1200) * 100
    )
    ds = (
        spark.read.format("snapshot").option("path", t).load()
        .filter(F.col("seg") == "small")
    )
    import io
    from contextlib import redirect_stdout

    def plan(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain()
        return buf.getvalue()

    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # threshold between the pruned slice and the whole table: the
        # whole-table estimate declines the hint, the pruned one takes it
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(int(pruned * 4))
        )
        unaware = fact.join(
            broadcast_if_small(spark, ds, t), fact["k"] == ds["id"]
        )
        assert "BroadcastHashJoin" not in plan(unaware)
        aware = fact.join(
            broadcast_if_small(spark, ds, t, pushed=pushed),
            fact["k"] == ds["id"],
        )
        assert "BroadcastHashJoin" in plan(aware)
        assert unaware.count() == aware.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)
