"""Z-order clustering rewrite (snapshots.cluster_zorder): multi-dimension
file-level skipping gets sharper after the rewrite, rows are unchanged, old
versions still time-travel to the pre-rewrite layout."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import LessThanOrEqual

from web_analytics_on_aws_spark.sources.snapshot_datasource import (
    planned_files,
    SnapshotDataSource,
    SnapshotReader,
)
from web_analytics_on_aws_spark.sources.snapshots import (
    cluster_zorder,
    commit_append,
    read_snapshot,
)


def _planned(t, filters):
    reader = SnapshotReader({"path": t}, None)
    if filters:
        reader.pushFilters(filters)
    return len(planned_files(reader.partitions()))


@pytest.fixture(scope="module")
def zordered(spark, tmp_path_factory):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)
    t = str(tmp_path_factory.mktemp("zorder") / "t")
    # two decorrelated dimensions, appended in id order and split round-
    # robin → every input file spans the FULL x and y range (the layout
    # that makes min/max skipping useless)
    df = spark.range(0, 20000).select(
        "id",
        ((F.col("id") * 7919) % 1000).alias("x"),
        ((F.col("id") * 104729) % 1000).alias("y"),
    )
    commit_append(df.repartition(8), t)
    before = {
        "files": _planned(t, None),
        "x": _planned(t, [LessThanOrEqual(("x",), 49)]),
        "xy": _planned(
            t, [LessThanOrEqual(("x",), 49), LessThanOrEqual(("y",), 49)]
        ),
    }
    # tiny target size to force a multi-file clustered layout at test scale
    result = cluster_zorder(spark, t, ["x", "y"], target_file_mb=0.01)
    return spark, t, before, result


def test_rows_unchanged_and_files_rewritten(zordered):
    spark, t, before, result = zordered
    assert result["rewritten"] == 8 and result["files_out"] > 4
    df = read_snapshot(spark, t)
    assert df.count() == 20000
    agg = df.agg(
        F.sum("id").alias("sid"), F.sum("x").alias("sx"), F.sum("y").alias("sy")
    ).collect()[0]
    assert agg["sid"] == sum(range(20000))
    assert agg["sx"] == sum((i * 7919) % 1000 for i in range(20000))
    assert agg["sy"] == sum((i * 104729) % 1000 for i in range(20000))


def test_unclustered_layout_cannot_skip(zordered):
    _, _, before, _ = zordered
    # round-robin append: every file spans the full range → zero pruning
    assert before["x"] == before["files"] == 8
    assert before["xy"] == 8


def test_clustered_layout_prunes_single_and_multi_dim(zordered):
    spark, t, before, result = zordered
    total = _planned(t, None)
    assert total == result["files_out"]
    x_only = _planned(t, [LessThanOrEqual(("x",), 49)])
    xy = _planned(t, [LessThanOrEqual(("x",), 49), LessThanOrEqual(("y",), 49)])
    # a 5% x-range must no longer touch every file, and adding the y
    # predicate must prune at least as hard (the multi-dimension win
    # single-column sorting cannot give)
    assert x_only < total
    assert xy <= x_only
    assert xy < total / 2
    # correctness under the pruned plan (Spark re-evaluates the predicate)
    n = (
        spark.read.format("snapshot")
        .option("path", t)
        .load()
        .filter((F.col("x") <= 49) & (F.col("y") <= 49))
        .count()
    )
    expected = sum(
        1
        for i in range(20000)
        if (i * 7919) % 1000 <= 49 and (i * 104729) % 1000 <= 49
    )
    assert n == expected


def test_time_travel_still_resolves_old_layout(zordered):
    spark, t, before, result = zordered
    old = read_snapshot(spark, t, version=result["version"] - 1)
    assert old.count() == 20000


def test_string_column_refused(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_append(spark.range(5).selectExpr("id", "CAST(id AS STRING) AS s"), t)
    with pytest.raises(ValueError, match="range geometry"):
        cluster_zorder(spark, t, ["s"])


def test_zorder_preserves_partition_tuples(spark, tmp_path):
    """VERDICT r6 #3: z-order on a hidden-partitioned table rewrites
    WITHIN each partition tuple group (like optimize) — outputs inherit
    the tuple, so manifest pruning on the partition column survives the
    clustering rewrite instead of silently degrading to footer stats."""
    import pyspark.sql.functions as F
    from pyspark.sql.datasource import EqualTo

    from web_analytics_on_aws_spark.sources.partitioning import (
        set_partition_spec,
    )
    from web_analytics_on_aws_spark.sources.snapshot_datasource import (
        SnapshotReader,
    )
    from web_analytics_on_aws_spark.sources.snapshots import (
        _read_manifest,
        cluster_zorder,
        commit_append,
        current_version,
        read_snapshot,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)
    t = str(tmp_path / "t")
    df = spark.range(4000).select(
        F.col("id"),
        (F.col("id") % 97).alias("x"),
        ((F.col("id") * 31) % 89).alias("y"),
        F.expr(
            "timestamp_micros(cast(1709600000000000 + (id % 4) * 86400000000"
            " as long))"
        ).alias("ts"),
    )
    commit_append(df.limit(0), t)
    set_partition_spec(spark, t, [("ts", "day")])
    commit_append(df, t)

    before = sorted(tuple(r) for r in read_snapshot(spark, t).collect())
    res = cluster_zorder(spark, t, ["x", "y"], target_file_mb=0.01)
    assert res["files_out"] >= 4  # at least one file per day group
    m = _read_manifest(t, current_version(t))
    fp = m.get("file_partitions", {})
    # every non-empty rewritten file still carries a day tuple (the
    # pre-spec empty seed legitimately stays untupled)
    fs = m.get("file_stats", {})
    untupled = [f for f in m["files"] if f not in fp]
    assert all(fs.get(f, {}).get("rows") == 0 for f in untupled)
    days = {fp[f]["values"]["ts_day"] for f in m["files"] if f in fp}
    assert len(days) == 4
    # a day probe plans only that day's files
    r = SnapshotReader({"path": t}, None)
    r.pushFilters([EqualTo(("ts",), datetime.datetime(2024, 3, 6, 0, 53, 20))])
    kept = [p.path for p in planned_files(r.partitions()) if p.path in fp]
    assert kept
    assert len({fp[p]["values"]["ts_day"] for p in kept}) == 1
    assert len(kept) < len([f for f in m["files"] if f in fp])
    # row multiset unchanged
    after = sorted(tuple(r) for r in read_snapshot(spark, t).collect())
    assert after == before
