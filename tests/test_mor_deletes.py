"""Merge-on-read position deletes (snapshots.delete_where_mor /
compact_deletes): Iceberg-v2-style delete sidecars — a delete commits
kilobytes instead of rewriting touched data files; every reader applies
them; compaction folds them back in."""

import os

import pytest
from pyspark.sql import functions as F

from web_analytics_on_aws_spark.sources.snapshots import (
    _manifest_deletes,
    _read_manifest,
    commit_append,
    compact_deletes,
    current_version,
    delete_where,
    delete_where_mor,
    merge_into,
    optimize,
    read_snapshot,
    set_constraints,
    table_changes,
    vacuum,
)


def _ids(spark, t, version=None):
    return sorted(
        r["id"] for r in read_snapshot(spark, t, version=version).collect()
    )


@pytest.fixture()
def two_file_table(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_append(spark.range(0, 10).coalesce(1), t)   # v1: ids 0-9
    commit_append(spark.range(10, 20).coalesce(1), t)  # v2: ids 10-19
    return t


def test_mor_delete_hides_rows_without_rewriting_files(spark, two_file_table):
    t = two_file_table
    files_before = _read_manifest(t, current_version(t))["files"]
    res = delete_where_mor(spark, t, "id % 2 = 0")
    assert res["rows_deleted"] == 10 and res["operation"] == "delete-mor"
    m = _read_manifest(t, res["version"])
    assert m["files"] == sorted(files_before)  # data files untouched
    assert len(_manifest_deletes(m)) >= 1
    assert _ids(spark, t) == list(range(1, 20, 2))
    # time travel to the pre-delete version still sees every row
    assert _ids(spark, t, version=res["version"] - 1) == list(range(20))


def test_mor_redelete_is_noop_with_honest_counts(spark, two_file_table):
    t = two_file_table
    v = delete_where_mor(spark, t, "id < 5")["version"]
    res2 = delete_where_mor(spark, t, "id < 5")
    assert res2["rows_deleted"] == 0 and res2["version"] == v  # no new commit
    assert _ids(spark, t) == list(range(5, 20))


def test_mor_datasource_read_applies_deletes(spark, two_file_table):
    from web_analytics_on_aws_spark.sources.snapshot_datasource import (
        SnapshotDataSource,
    )

    t = two_file_table
    delete_where_mor(spark, t, "id >= 15")
    spark.dataSource.register(SnapshotDataSource)
    got = sorted(
        r["id"]
        for r in spark.read.format("snapshot").option("path", t).load().collect()
    )
    assert got == list(range(15))


def test_cow_dml_refuses_until_compacted(spark, two_file_table):
    t = two_file_table
    delete_where_mor(spark, t, "id = 3")
    with pytest.raises(ValueError, match="compact_deletes"):
        delete_where(spark, t, "id = 4")
    with pytest.raises(ValueError, match="compact_deletes"):
        optimize(spark, t, small_file_mb=64.0)
    src = spark.range(0, 1).select(F.col("id"))
    with pytest.raises(ValueError, match="compact_deletes"):
        merge_into(spark, t, src, ["id"])
    compact_deletes(spark, t)
    # CoW eligibility restored
    assert delete_where(spark, t, "id = 4")["rows_matched"] == 1
    assert _ids(spark, t) == sorted(set(range(20)) - {3, 4})


def test_compact_deletes_rewrites_only_touched_files(spark, two_file_table):
    t = two_file_table
    delete_where_mor(spark, t, "id = 12")  # touches only the second file
    res = compact_deletes(spark, t)
    assert res["files_rewritten"] == 1 and res["files_kept"] == 1
    m = _read_manifest(t, res["version"])
    assert _manifest_deletes(m) == []
    assert _ids(spark, t) == sorted(set(range(20)) - {12})
    # pre-compaction AND pre-delete versions still time travel
    assert _ids(spark, t, version=res["version"] - 1) == sorted(
        set(range(20)) - {12}
    )
    assert _ids(spark, t, version=res["version"] - 2) == list(range(20))
    # idempotent on a clean table
    assert compact_deletes(spark, t)["files_rewritten"] == 0


def test_vacuum_keeps_delete_sidecars_of_retained_head(spark, two_file_table):
    t = two_file_table
    delete_where_mor(spark, t, "id < 3")
    vacuum(t, retain_last=1)
    assert _ids(spark, t) == list(range(3, 20))


def test_append_after_mor_delete_carries_sidecars(spark, two_file_table):
    t = two_file_table
    delete_where_mor(spark, t, "id = 0")
    commit_append(spark.range(20, 25).coalesce(1), t)
    assert _ids(spark, t) == list(range(1, 25))


def test_set_constraints_carries_sidecars(spark, two_file_table):
    t = two_file_table
    delete_where_mor(spark, t, "id = 19")
    set_constraints(spark, t, {"nonneg": "id >= 0"})
    assert _ids(spark, t) == list(range(19))


def test_table_changes_reports_mor_deletes_once(spark, two_file_table):
    t = two_file_table
    v0 = current_version(t)
    delete_where_mor(spark, t, "id IN (2, 11)")
    ch = table_changes(spark, t, v0).collect()
    assert sorted((r["id"], r["_change_type"]) for r in ch) == [
        (2, "delete"), (11, "delete"),
    ]
    # across the compaction that materializes those deletes: no new events
    v1 = current_version(t)
    compact_deletes(spark, t)
    assert table_changes(spark, t, v1).count() == 0
    # and end-to-end from v0: still exactly the two deletes
    assert sorted(
        (r["id"], r["_change_type"]) for r in table_changes(spark, t, v0).collect()
    ) == [(2, "delete"), (11, "delete")]


def test_changes_stream_reports_mor_deletes(spark, two_file_table):
    from web_analytics_on_aws_spark.sources.changes_stream_datasource import (
        SnapshotChangesDataSource,
    )

    t = two_file_table
    v0 = current_version(t)
    delete_where_mor(spark, t, "id = 7")
    spark.dataSource.register(SnapshotChangesDataSource)
    out = (
        spark.readStream.format("snapshot_changes")
        .option("path", t)
        .option("startingVersion", str(v0))
        .load()
    )
    q = (
        out.writeStream.format("memory")
        .queryName("mor_changes")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT id, _change_type FROM mor_changes"
    ).collect()
    assert sorted((r["id"], r["_change_type"]) for r in rows) == [(7, "delete")]
