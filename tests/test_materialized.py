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
