"""The composed production storage loop (VERDICT r3 #4), end-to-end on one
live stream: a merge-on-read streaming upsert sink feeding an ACID
snapshot table, a rollup view FOLLOWING that table through its change
feed, and scheduled `maintain_table` ticks folding delete sidecars back
into plain files — all three running against the same table, in the order
a production deployment interleaves them.

Invariants driven here (each individually pinned elsewhere; this is the
composition):
- after every stage, rollup view ≡ flat recompute of the source head
  (the change feed crosses equality-delete commits — the ADVICE r3 fix);
- MOR batches commit ZERO rewritten data files;
- maintenance clears every sidecar (read-cost collapse: reads are plain
  scans again) and the follow-up rollup tick folds the maintenance
  commits as a NO-OP (compaction/optimize emit no change events).
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from web_analytics_on_aws_spark.operators.incremental import follow_table_rollup
from web_analytics_on_aws_spark.sources.snapshots import (
    _manifest_deletes,
    _manifest_eq_deletes,
    _read_manifest,
    current_version,
    maintain_table,
    read_snapshot,
)
from web_analytics_on_aws_spark.streaming.snapshot_sink import (
    start_snapshot_upsert,
)

REC = {
    "user_id": "u1", "session_id": "s" * 24, "event": "view",
    "referrer": None, "user_agent": "UA", "ip": "10.0.0.1",
    "hostname": "h.example", "os": "Linux",
    "timestamp": "2026-03-02T13:45:00Z", "uri": "/p/1",
}


def _land(landing, name, rows):
    with open(landing / name, "w") as f:
        for r in rows:
            f.write(json.dumps(REC | r) + "\n")


def _rollup(df):
    return df.groupBy("event").agg(F.count("*").cast("long").alias("n"))


def test_mor_stream_follow_rollup_and_maintenance_compose(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    t = str(tmp_path / "t")
    view = str(tmp_path / "view")

    def drain():
        q = start_snapshot_upsert(
            spark, str(landing), t, str(tmp_path / "err"),
            str(tmp_path / "ckpt"), unique_keys=["user_id"],
            available_now=True, mode="mor",
        )
        q.awaitTermination(120)

    def tick():
        return follow_table_rollup(
            spark, t, view, _rollup, ["event"], ["n"], count_col="n"
        )

    def view_rows():
        return sorted(
            (r["event"], r["n"]) for r in read_snapshot(spark, view).collect()
        )

    def assert_view_fresh():
        assert view_rows() == sorted(
            (r["event"], r["n"])
            for r in _rollup(read_snapshot(spark, t)).collect()
        )

    # batch 1: three users → bootstrap the follower view
    _land(landing, "b1.jsonl", [
        {"user_id": "u1", "event": "view"},
        {"user_id": "u2", "event": "view"},
        {"user_id": "u3", "event": "click"},
    ])
    drain()
    assert tick()["bootstrap"] is True
    assert_view_fresh()

    # batch 2: MOR upsert flips u1 view→cart, adds u4 — the rollup tick's
    # change feed must cross the equality-delete commit and fold the
    # update as delete(view)+insert(cart)
    _land(landing, "b2.jsonl", [
        {"user_id": "u1", "event": "cart"},
        {"user_id": "u4", "event": "click"},
    ])
    files_before = set(_read_manifest(t, current_version(t))["files"])
    drain()
    m = _read_manifest(t, current_version(t))
    assert files_before <= set(m["files"])  # MOR: zero files rewritten
    assert _manifest_eq_deletes(m)  # sidecar outstanding
    out = tick()
    assert out["applied"] and not out["bootstrap"]
    assert_view_fresh()
    assert view_rows() == [("cart", 1), ("click", 2), ("view", 1)]

    # scheduled maintenance: fold sidecars back into plain files
    out = maintain_table(spark, t, max_delete_files=0)
    assert out["compact_deletes"]["files_rewritten"] >= 1
    m = _read_manifest(t, current_version(t))
    assert not _manifest_deletes(m) and not _manifest_eq_deletes(m)
    # read-cost collapse: the head read is a plain parquet scan again
    # (no anti joins → no delete-sidecar references in the plan)
    plan = read_snapshot(spark, t)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # the follow-up tick folds the maintenance commits as a NO-OP
    before = view_rows()
    out = tick()
    assert out["applied"]  # head advanced (maintenance commits)...
    assert view_rows() == before  # ...but compaction emitted no events
    assert_view_fresh()

    # batch 3 after maintenance: the loop keeps running
    _land(landing, "b3.jsonl", [{"user_id": "u2", "event": "purchase"}])
    drain()
    tick()
    assert_view_fresh()
    assert view_rows() == [
        ("cart", 1), ("click", 2), ("purchase", 1),
    ]
