"""observe()/Observation metrics (streaming/observability.py): in-plan
counters for batch and streaming, no second scan."""

import pyspark.sql.functions as F

from web_analytics_on_aws_spark.streaming import observability as obs_mod


def test_batch_observation_counts(spark):
    df = spark.range(100).withColumn("ok", F.col("id") % 4 != 0)
    observed, obs = obs_mod.with_validity_metrics(df, "ok")
    assert observed.filter("ok").count() == 75  # any action finalizes obs
    m = obs.get
    assert m["n_total"] == 100 and m["n_valid"] == 75 and m["n_invalid"] == 25


def test_streaming_observed_metrics(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(50).select(
        F.col("id"), (F.col("id") % 5 != 0).alias("ok")
    ).write.parquet(src)
    stream = spark.readStream.schema("id long, ok boolean").parquet(src)
    stream = obs_mod.observe_stream(
        stream, "ingest",
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("n_valid"),
    )
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    m = obs_mod.last_observed(q, "ingest")
    assert m is not None and m["n_total"] == 50 and m["n_valid"] == 40
