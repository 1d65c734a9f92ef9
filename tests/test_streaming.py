"""Structured Streaming ingest parity (SURVEY §3.1): landing dir →
micro-batches → validated split → partitioned zones, checkpointed."""

from __future__ import annotations

import datetime as dt
import json
import os

from web_analytics_on_aws_spark.streaming.ingest_stream import run_ingest_once


def _write_landing_file(landing: str, name: str, records: list[dict | str]) -> None:
    os.makedirs(landing, exist_ok=True)
    with open(os.path.join(landing, name), "w") as f:
        for r in records:
            f.write((r if isinstance(r, str) else json.dumps(r)) + "\n")


def _rec(i: int, ts: str = "2026-03-02T13:45:00Z") -> dict:
    return {
        "userId": f"user-{i}",
        "sessionId": "s" * 24,
        "referrer": None,
        "userAgent": "UA",
        "ip": "10.0.0.1",
        "hostname": "h.example",
        "os": "Linux",
        "timestamp": ts,
        "uri": f"/p/{i}",
    }


def test_streaming_ingest_drains_and_splits(spark, tmp_path):
    tmp = str(tmp_path)
    landing = f"{tmp}/landing"
    _write_landing_file(landing, "batch1.jsonl", [_rec(i) for i in range(10)])
    bad = _rec(99)
    bad["timestamp"] = "2026-03-02 13:45:00"
    _write_landing_file(landing, "batch2.jsonl", [bad, "garbage not json"])

    run_ingest_once(
        spark, landing, f"{tmp}/raw", f"{tmp}/error", f"{tmp}/ckpt", dialect="parquet"
    )
    assert spark.read.text(f"{tmp}/raw").count() == 10
    assert spark.read.text(f"{tmp}/error").count() == 2

    # checkpoint: re-running with no new files is a no-op (exactly-once file
    # tracking), then a new file is picked up incrementally
    run_ingest_once(
        spark, landing, f"{tmp}/raw", f"{tmp}/error", f"{tmp}/ckpt", dialect="parquet"
    )
    assert spark.read.text(f"{tmp}/raw").count() == 10

    _write_landing_file(landing, "batch3.jsonl", [_rec(100 + i) for i in range(3)])
    run_ingest_once(
        spark, landing, f"{tmp}/raw", f"{tmp}/error", f"{tmp}/ckpt", dialect="parquet"
    )
    assert spark.read.text(f"{tmp}/raw").count() == 13


def test_cleanup_landing_prunes_aged_files_only(spark, tmp_path):
    """S5 retention (VERDICT r1 #5): files older than the window are pruned
    from the LANDING zone; fresh landing files and the quarantine zone are
    preserved, and the already-checkpointed stream state is unaffected."""
    import time

    from web_analytics_on_aws_spark.streaming.ingest_stream import cleanup_landing

    t = str(tmp_path)
    landing, err = f"{t}/landing", f"{t}/err"
    os.makedirs(landing), os.makedirs(err)
    now = time.time()
    old, fresh = f"{landing}/old.jsonl", f"{landing}/fresh.jsonl"
    for p in (old, fresh):
        with open(p, "w") as f:
            f.write("{}\n")
    os.utime(old, (now - 25 * 3600, now - 25 * 3600))  # 25 h old
    q = f"{err}/bad.txt"
    with open(q, "w") as f:
        f.write("not json\n")
    os.utime(q, (now - 48 * 3600, now - 48 * 3600))  # quarantine is NOT a buffer

    assert cleanup_landing(landing, older_than_hours=24, now=now) == 1
    assert not os.path.exists(old)
    assert os.path.exists(fresh)
    assert os.path.exists(q)  # retention never touches the error zone
    # idempotent second run
    assert cleanup_landing(landing, older_than_hours=24, now=now) == 0


def test_merge_into_sql_parses_as_merge(spark):
    """VERDICT r1 #6: no OTF jar in the env, so pin the emitted MERGE INTO
    against Spark's own SQL grammar (parse-only — analysis needs a live
    Iceberg/Delta catalog): it must round-trip to a MergeIntoTable plan."""
    from web_analytics_on_aws_spark.operators.upsert import merge_into_sql

    sql = merge_into_sql("db.events_iceberg")
    assert "WHEN MATCHED THEN UPDATE SET *" in sql
    assert "WHEN NOT MATCHED THEN INSERT *" in sql
    plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
    assert plan.getClass().getSimpleName() == "MergeIntoTable"
