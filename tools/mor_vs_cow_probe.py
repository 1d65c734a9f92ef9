"""Quantify the MOR upsert claim for SCALE.md: time merge_into (CoW) vs
upsert_keys_mor (eq-delete sidecar) for a small key-dispersed batch
against a many-file snapshot table built from the sf0.1 events rows.

The batch's keys spread across every file — the CoW worst case (every
file touched → full rewrite) and exactly the shape a CDC/upsert stream
produces. Run: python tools/mor_vs_cow_probe.py [n_files] [batch_rows]
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from web_analytics_on_aws_spark.sources import snapshots

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    events = (
        spark.read.parquet("/root/testdata/sf0.1/events.parquet")
        .select("event_id", "user_id", "event_type", "value")
    )
    n = events.count()

    def build(table: str) -> None:
        if os.path.isdir(table):
            shutil.rmtree(table)
        snapshots.commit_append(events.repartition(n_files), table)

    # batch keys stride the id space → every data file contains a match
    ev_types = dict(events.dtypes)
    batch = (
        spark.range(batch_rows)
        .select(
            (F.col("id") * (n // batch_rows))
            .cast(ev_types["event_id"]).alias("event_id"),
            F.lit(-1).cast(ev_types["user_id"]).alias("user_id"),
            F.lit("upserted").cast(ev_types["event_type"]).alias("event_type"),
            F.lit(0.0).cast(ev_types["value"]).alias("value"),
        )
    )
    batch.persist().count()

    t_cow = os.path.join("/tmp/morprobe", "cow")
    t_mor = os.path.join("/tmp/morprobe", "mor")
    build(t_cow)
    build(t_mor)

    t0 = time.perf_counter()
    res_cow = snapshots.merge_into(spark, t_cow, batch, ["event_id"])
    cow_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    res_mor = snapshots.upsert_keys_mor(spark, t_mor, batch, ["event_id"])
    mor_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_read_mor = snapshots.read_snapshot(spark, t_mor).count()
    mor_read_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_read_cow = snapshots.read_snapshot(spark, t_cow).count()
    cow_read_s = time.perf_counter() - t0
    assert n_read_mor == n_read_cow == n, (n_read_mor, n_read_cow, n)

    def table_bytes(t):
        tot = 0
        for root, _d, fs in os.walk(os.path.join(t, "data")):
            tot += sum(os.path.getsize(os.path.join(root, f)) for f in fs)
        return tot

    print(
        f"rows={n} files={n_files} batch={batch_rows}\n"
        f"CoW merge_into:    {cow_s:.2f}s  files_rewritten={res_cow['files_rewritten']}\n"
        f"MOR upsert_keys:   {mor_s:.2f}s  (one commit, 0 rewrites)\n"
        f"read after (MOR):  {mor_read_s:.2f}s   read after (CoW): {cow_read_s:.2f}s\n"
        f"bytes on disk: cow={table_bytes(t_cow)//1024}KB mor={table_bytes(t_mor)//1024}KB"
    )
    spark.stop()


if __name__ == "__main__":
    main()
