"""Stream-stream interval join + watermarked dedup, driven through file
sources in a temp dir exactly like the other streaming tests."""

from __future__ import annotations

import json
import os

from pyspark.sql.types import LongType, StructField, StructType, TimestampType

from web_analytics_on_aws_spark.streaming.joins import (
    dedup_within_watermark,
    interval_join,
)

SCHEMA = StructType(
    [StructField("user_id", LongType()), StructField("ts", TimestampType())]
)


def _write(d: str, name: str, rows: list[tuple[int, str]], tcol: str = "ts") -> None:
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        for uid, ts in rows:
            f.write(json.dumps({"user_id": uid, tcol: ts}) + "\n")


def test_interval_join_matches_band_only(spark, tmp_path):
    tmp = str(tmp_path)
    views_schema = StructType(
        [StructField("user_id", LongType()), StructField("view_ts", TimestampType())]
    )
    buys_schema = StructType(
        [StructField("user_id", LongType()), StructField("buy_ts", TimestampType())]
    )
    # user 1: view 30 min before buy (in band), view 2h before (out),
    # view after buy (out); user 2: view in-band but different key than buy
    _write(
        f"{tmp}/views",
        "v.jsonl",
        [
            (1, "2026-03-02T09:30:00Z"),
            (1, "2026-03-02T08:00:00Z"),
            (1, "2026-03-02T10:30:00Z"),
            (2, "2026-03-02T09:45:00Z"),
        ],
        tcol="view_ts",
    )
    _write(f"{tmp}/buys", "b.jsonl", [(1, "2026-03-02T10:00:00Z")], tcol="buy_ts")

    buys = spark.readStream.schema(buys_schema).json(f"{tmp}/buys")
    views = spark.readStream.schema(views_schema).json(f"{tmp}/views")
    joined = interval_join(
        buys, views, key="user_id", left_ts="buy_ts", right_ts="view_ts",
        max_lag="1 hour",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ij_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM ij_out").collect()
    assert len(rows) == 1
    assert rows[0].user_id == 1
    assert rows[0].view_ts.isoformat() == "2026-03-02T09:30:00"


def test_dedup_within_watermark_drops_dupes_keeps_first(spark, tmp_path):
    tmp = str(tmp_path)
    # same (user_id, ts) appears three times; distinct rows pass
    _write(
        f"{tmp}/in",
        "a.jsonl",
        [
            (1, "2026-03-02T10:00:00Z"),
            (1, "2026-03-02T10:00:00Z"),
            (1, "2026-03-02T10:00:00Z"),
            (1, "2026-03-02T10:05:00Z"),
            (2, "2026-03-02T10:00:00Z"),
        ],
    )
    src = spark.readStream.schema(SCHEMA).json(f"{tmp}/in")
    dd = dedup_within_watermark(src, keys=("user_id", "ts"), time_col="ts")
    q = (
        dd.writeStream.format("memory")
        .queryName("dd_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.ts.isoformat()) for r in spark.sql("SELECT * FROM dd_out").collect()
    )
    assert got == [
        (1, "2026-03-02T10:00:00"),
        (1, "2026-03-02T10:05:00"),
        (2, "2026-03-02T10:00:00"),
    ]


def test_enrich_with_dim_broadcasts_static_side(spark, tmp_path):
    from web_analytics_on_aws_spark.streaming.joins import enrich_with_dim

    tmp = str(tmp_path)
    _write(
        f"{tmp}/ev",
        "e.jsonl",
        [(1, "2026-03-02T09:30:00Z"), (2, "2026-03-02T09:31:00Z"),
         (9, "2026-03-02T09:32:00Z")],
    )
    dim = spark.createDataFrame(
        [(1, "pro"), (2, "free")], "user_id long, plan string"
    )
    stream = spark.readStream.schema(SCHEMA).json(f"{tmp}/ev")
    q = (
        enrich_with_dim(stream, dim, "user_id")
        .writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r.user_id, r.plan)
        for r in spark.sql("SELECT user_id, plan FROM enrich_out").collect()
    }
    # left join: unmatched stream rows survive with null plan
    assert rows == {(1, "pro"), (2, "free"), (9, None)}
