"""Streaming materialized counter view: correctness across micro-batches,
bucket-scoped rewrites, and replay idempotency."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from web_analytics_on_aws_spark.streaming.materialized import (
    merge_counters,
    read_counters,
    start_counter_view,
)

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _write(d: str, name: str, rows: list[tuple[int, str, float]]) -> None:
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        for uid, ts, v in rows:
            f.write(json.dumps({"user_id": uid, "ts": ts, "value": v}) + "\n")


def _run(spark, landing, state, ckpt):
    q = start_counter_view(
        spark, landing, SCHEMA, state, ckpt, keys=("user_id",), value_col="value"
    )
    q.awaitTermination()


def test_counters_accumulate_across_runs(spark, tmp_path):
    tmp = str(tmp_path)
    landing, state, ckpt = f"{tmp}/land", f"{tmp}/state", f"{tmp}/ckpt"

    _write(landing, "b1.jsonl", [
        (1, "2026-03-02T10:00:00Z", 10.0),
        (1, "2026-03-02T10:01:00Z", 5.0),
        (2, "2026-03-02T10:02:00Z", 7.0),
    ])
    _run(spark, landing, state, ckpt)
    got = {r.user_id: (r.cnt, float(r.total)) for r in read_counters(spark, state).collect()}
    assert got == {1: (2, 15.0), 2: (1, 7.0)}

    # second batch arrives later; user 2 untouched
    _write(landing, "b2.jsonl", [
        (1, "2026-03-02T11:00:00Z", 1.0),
        (3, "2026-03-02T11:01:00Z", 2.5),
    ])
    _run(spark, landing, state, ckpt)
    got = {r.user_id: (r.cnt, float(r.total)) for r in read_counters(spark, state).collect()}
    assert got == {1: (3, 16.0), 2: (1, 7.0), 3: (1, 2.5)}


def test_merge_scopes_rewrite_to_touched_buckets(spark, tmp_path):
    tmp = str(tmp_path)
    state = f"{tmp}/state"
    ev1 = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 9)], "user_id long, value double"
    )
    merge_counters(spark, state, ev1, ["user_id"], "value", batch_id=0)

    # snapshot per-bucket file mtimes
    def bucket_files():
        out = {}
        for d in os.listdir(state):
            if d.startswith("__bucket="):
                files = sorted(os.listdir(os.path.join(state, d)))
                out[d] = [
                    (f, os.path.getmtime(os.path.join(state, d, f))) for f in files
                ]
        return out

    before = bucket_files()
    assert len(before) >= 2  # keys spread over multiple buckets

    # batch 2 touches exactly one key → at most one bucket rewritten
    ev2 = spark.createDataFrame([(1, 100.0)], "user_id long, value double")
    merge_counters(spark, state, ev2, ["user_id"], "value", batch_id=1)
    after = bucket_files()

    changed = [b for b in before if before[b] != after.get(b)]
    assert len(changed) <= 1
    got = {r.user_id: float(r.total) for r in read_counters(spark, state).collect()}
    assert got[1] == 101.0 and got[8] == 8.0


def test_replayed_batch_is_idempotent(spark, tmp_path):
    state = f"{tmp_path}/state"
    ev = spark.createDataFrame([(1, 5.0), (2, 3.0)], "user_id long, value double")
    merge_counters(spark, state, ev, ["user_id"], "value", batch_id=0)
    merge_counters(spark, state, ev, ["user_id"], "value", batch_id=0)  # replay
    got = {r.user_id: (r.cnt, float(r.total)) for r in read_counters(spark, state).collect()}
    assert got == {1: (1, 5.0), 2: (1, 3.0)}


def test_uniques_view_accumulates_and_replay_is_idempotent(spark, tmp_path):
    from web_analytics_on_aws_spark.streaming.materialized import (
        merge_uniques,
        read_uniques,
        start_uniques_view,
    )

    tmp = str(tmp_path)
    landing, state, ckpt = f"{tmp}/land", f"{tmp}/state", f"{tmp}/ckpt"
    _write(landing, "b1.jsonl", [
        (u, "2026-03-02T10:00:00Z", 1.0) for u in (1, 2, 3, 2, 1)
    ])
    q = start_uniques_view(
        spark, landing, SCHEMA, state, ckpt, keys=(), col="user_id"
    )
    q.awaitTermination()
    # keys=() → one global row
    est1 = read_uniques(spark, state).collect()[0].uniq_estimate
    assert est1 == 3  # HLL exact at tiny cardinalities

    # new batch with one overlapping and one new user
    _write(landing, "b2.jsonl", [
        (3, "2026-03-02T11:00:00Z", 1.0),
        (4, "2026-03-02T11:01:00Z", 1.0),
    ])
    q = start_uniques_view(
        spark, landing, SCHEMA, state, ckpt, keys=(), col="user_id"
    )
    q.awaitTermination()
    assert read_uniques(spark, state).collect()[0].uniq_estimate == 4

    # replay the SAME batch content manually: HLL union is idempotent,
    # state must not change (no batch-id guard needed)
    batch = spark.createDataFrame(
        [(3, 1.0), (4, 1.0)], "user_id long, value double"
    )
    merge_uniques(spark, state, batch, [], "user_id")
    assert read_uniques(spark, state).collect()[0].uniq_estimate == 4


def test_uniques_view_per_key_grouping(spark, tmp_path):
    from web_analytics_on_aws_spark.streaming.materialized import (
        merge_uniques,
        read_uniques,
    )

    host_df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1), ("a", 1)], "hostname string, user_id long"
    )
    state = str(tmp_path / "state")
    merge_uniques(spark, state, host_df, ["hostname"], "user_id")
    got = {r.hostname: r.uniq_estimate for r in read_uniques(spark, state).collect()}
    assert got == {"a": 2, "b": 1}


def test_topk_counters_reads_state_only(spark, tmp_path):
    import json

    from web_analytics_on_aws_spark.streaming.materialized import (
        start_counter_view,
        topk_counters,
    )
    from pyspark.sql.types import LongType, StructField, StructType, DoubleType

    landing = tmp_path / "landing"
    landing.mkdir()
    rows = [{"user_id": i % 5, "value": 1.0} for i in range(100)]
    rows += [{"user_id": 99, "value": 1.0}] * 50
    (landing / "b.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = StructType([
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
    ])
    q = start_counter_view(
        spark, str(landing), schema, str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    top = topk_counters(spark, str(tmp_path / "state"), k=2).collect()
    assert [(r["user_id"], r["cnt"]) for r in top] == [(99, 50), (0, 20)]
