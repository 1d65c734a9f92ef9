"""Streaming change feed (sources/changes_stream_datasource.py): pending
commits drain per trigger, every event stamped with its own
_commit_version, exactly-once across drains."""

import pytest
from pyspark.sql import functions as F

from web_analytics_on_aws_spark.sources.changes_stream_datasource import (
    SnapshotChangesDataSource,
)
from web_analytics_on_aws_spark.sources.snapshots import (
    commit_append,
    delete_keys_mor,
    delete_where,
    merge_into,
    upsert_keys_mor,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SnapshotChangesDataSource)
    return spark


def _drain(spark, t, ckpt, name, starting=None):
    """AvailableNow drain through foreachBatch (the memory sink cannot
    resume from a checkpoint); returns the batch rows."""
    reader = spark.readStream.format("snapshot_changes").option("path", t)
    if starting is not None:
        reader = reader.option("startingVersion", starting)
    rows = []

    def collect(batch_df, batch_id):
        rows.extend(batch_df.collect())

    q = (
        reader.load()
        .writeStream.foreachBatch(collect)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return rows


def test_streams_each_commit_as_a_batch(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    commit_append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, val string").coalesce(1),
        t,
    )
    # v2: append; v3: merge (update 2, insert 9); v4: delete id=1
    commit_append(
        spark.createDataFrame([(3, "c")], "id long, val string").coalesce(1), t
    )
    merge_into(
        spark, t,
        spark.createDataFrame([(2, "B"), (9, "z")], "id long, val string"),
        ["id"],
    )
    delete_where(spark, t, "id = 1")

    out = _drain(spark, t, ckpt, "chstream", starting=1)
    got = {
        (r["id"], r["val"], r["_change_type"], r["_commit_version"])
        for r in out
    }
    assert got == {
        (3, "c", "insert", 2),
        (2, "B", "insert", 3),
        (9, "z", "insert", 3),
        (2, "b", "delete", 3),
        (1, "a", "delete", 4),
    }

    # second drain off the same checkpoint: nothing new → no new rows
    out2 = _drain(spark, t, ckpt, "chstream2")
    assert len(out2) == 0

    # a fresh commit streams exactly once, with its version
    commit_append(
        spark.createDataFrame([(7, "q")], "id long, val string").coalesce(1), t
    )
    out3 = _drain(spark, t, ckpt, "chstream3")
    assert [
        (r["id"], r["_change_type"], r["_commit_version"]) for r in out3
    ] == [(7, "insert", 5)]


def test_default_start_is_head_only_new_commits(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    commit_append(
        spark.createDataFrame([(1, "x")], "id long, val string").coalesce(1), t
    )
    out = _drain(spark, t, str(tmp_path / "c1"), "headonly")
    assert len(out) == 0  # history before the stream started is skipped


def test_streams_across_equality_delete_commits(registered, tmp_path):
    """ADVICE r3 (medium): a stream whose offset crosses an
    upsert_keys_mor / delete_keys_mor commit must resolve the equality
    deletes per endpoint (driver-side, same sequence rule as the read
    path) instead of failing permanently — mode="mor" tables ARE
    consumable by snapshot_changes."""
    spark = registered
    t = str(tmp_path / "t")
    commit_append(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, val string"
        ).coalesce(1),
        t,
    )
    # v2: MOR upsert (update 2 → B, insert 9); v3: MOR delete key 1
    upsert_keys_mor(
        spark, t,
        spark.createDataFrame([(2, "B"), (9, "z")], "id long, val string"),
        ["id"],
    )
    delete_keys_mor(spark, t, spark.createDataFrame([(1,)], "id long"))

    out = _drain(spark, t, str(tmp_path / "ckpt"), "eqstream", starting=1)
    got = {
        (r["id"], r["val"], r["_change_type"], r["_commit_version"])
        for r in out
    }
    assert got == {
        (2, "B", "insert", 2),
        (9, "z", "insert", 2),
        (2, "b", "delete", 2),
        (1, "a", "delete", 3),
    }

    # stream result ≡ flat head read, folded over the v1 base
    from web_analytics_on_aws_spark.sources.snapshots import read_snapshot

    live = {(1, "a"), (2, "b"), (3, "c")}
    for r in sorted(out, key=lambda r: r["_commit_version"]):
        tup = (r["id"], r["val"])
        live.add(tup) if r["_change_type"] == "insert" else live.remove(tup)
    head = {
        (r["id"], r["val"]) for r in read_snapshot(spark, t).collect()
    }
    assert live == head


def test_feed_drives_incremental_rollup(registered, tmp_path):
    """Compose: streamed change events → counting-IVM fold per micro-batch
    (foreachBatch) ≡ flat recompute of the source head."""
    spark = registered
    t = str(tmp_path / "t")
    commit_append(
        spark.createDataFrame(
            [(1, "view", 10.0), (2, "click", 5.0)], "id long, et string, v double"
        ).coalesce(1),
        t,
    )
    merge_into(
        spark, t,
        spark.createDataFrame([(1, "view", 99.0), (3, "cart", 7.0)],
                              "id long, et string, v double"),
        ["id"],
    )
    state: dict = {}

    def fold(batch_df, batch_id):
        for r in batch_df.collect():
            sign = 1 if r["_change_type"] == "insert" else -1
            n, sv = state.get(r["et"], (0, 0.0))
            state[r["et"]] = (n + sign, sv + sign * r["v"])

    q = (
        spark.readStream.format("snapshot_changes")
        .option("path", t).option("startingVersion", 0 if False else 1)
        .load()
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "c2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # state has only the post-v1 delta; add v1's rollup to compare to head
    state.setdefault("view", (0, 0.0))
    base = {"view": (1, 10.0), "click": (1, 5.0)}
    total = {
        k: (base.get(k, (0, 0.0))[0] + state.get(k, (0, 0.0))[0],
            base.get(k, (0, 0.0))[1] + state.get(k, (0, 0.0))[1])
        for k in set(base) | set(state)
    }
    assert total == {"view": (1, 99.0), "click": (1, 5.0), "cart": (1, 7.0)}
