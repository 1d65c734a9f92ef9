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
