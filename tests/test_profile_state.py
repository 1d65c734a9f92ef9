"""transformWithStateInPandas user-profile operator: state accumulates
across micro-batches (checkpointed), emits updated rows per batch."""

from __future__ import annotations

import pyspark.sql.functions as F

from web_analytics_on_aws_spark.streaming.profile_state import user_profile_stream


def _write_batch(spark, path, name, rows):
    import json
    import os

    os.makedirs(path, exist_ok=True)
    with open(f"{path}/{name}", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _drain(spark, landing, out, ckpt):
    from web_analytics_on_aws_spark.streaming.profile_state import (
        transform_with_state_available,
    )

    if transform_with_state_available():
        # the transformWithState path additionally requires RocksDB state
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    stream = (
        spark.readStream.schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE")
        .json(landing)
    )
    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        user_profile_stream(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_profile_state_accumulates_across_batches(spark, tmp_path):
    t = str(tmp_path)
    landing, out, ckpt = f"{t}/landing", f"{t}/out", f"{t}/ckpt"

    _write_batch(spark, landing, "b1.jsonl", [
        {"user_id": 1, "ts": "2026-03-02T10:00:00", "value": 2.0},
        {"user_id": 1, "ts": "2026-03-02T11:00:00", "value": 3.0},
        {"user_id": 2, "ts": "2026-03-02T10:30:00", "value": 5.0},
    ])
    _drain(spark, landing, out, ckpt)

    _write_batch(spark, landing, "b2.jsonl", [
        {"user_id": 1, "ts": "2026-03-02T12:00:00", "value": 4.0},
    ])
    _drain(spark, landing, out, ckpt)

    # last emitted row per user = current profile
    prof = spark.read.parquet(out)
    latest = {
        r["user_id"]: r
        for r in prof.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy(F.desc("events"))
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    u1 = latest[1]
    assert u1["events"] == 3 and u1["total_value"] == 9.0  # state carried over
    assert u1["first_ts"].hour == 10 and u1["last_ts"].hour == 12
    assert latest[2]["events"] == 1 and latest[2]["total_value"] == 5.0
