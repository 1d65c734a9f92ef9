"""Measured evidence for the incremental-dedup scaling claim (SCALE.md):
admit a growing corpus shard by shard and time each admission against
RE-RUNNING one-shot global dedup over the cumulative corpus — the naive
alternative a persisted digest index replaces.

Disk-honest framing: the cumulative corpus lives in parquet (appended per
shard) and the baseline re-reads it each round, exactly like a real daily
job; the incremental path reads the shard plus the digest INDEX parquet
(~40 B/doc vs full documents). The structural claim this measures is the
bytes-touched asymmetry — the baseline's input grows with the corpus's
FULL text mass, the index grows at digest mass — plus the flat per-shard
admission cost.

Env knobs: PROBE_SHARDS (default 8), PROBE_REPL (default 20 — corpus
inflation factor with distinct texts, sf0.1 × 20 = 100k docs).

Run: python tools/incr_dedup_probe.py [sf_dir]   (writes JSON to stdout)
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_SHARDS = int(os.environ.get("PROBE_SHARDS", "8"))
REPL = int(os.environ.get("PROBE_REPL", "20"))


def main() -> None:
    import pyspark.sql.functions as F

    from web_analytics_on_aws_spark.operators.incremental_dedup import (
        dedup_shard_against_index,
    )
    from web_analytics_on_aws_spark.session import get_spark
    from web_analytics_on_aws_spark.sources.tables import load_table

    spark = get_spark(
        app_name="incr-dedup-probe", master="local[8]",
        shuffle_partitions=8, extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, SF, "documents").select("doc_id", "text")
    n0 = base.count()
    # inflate with DISTINCT texts (suffix per replica) so dedup work is
    # real, not degenerate all-dups
    docs = (
        base.crossJoin(
            spark.range(REPL).withColumnRenamed("id", "__r")
        )
        .select(
            (F.col("doc_id") * REPL + F.col("__r")).alias("doc_id"),
            F.concat_ws(" #", "text", F.col("__r").cast("string"))
            .alias("text"),
        )
    )
    n = n0 * REPL
    per = n // N_SHARDS

    work = tempfile.mkdtemp(prefix="incr-dedup-probe-")
    idx = os.path.join(work, "idx")
    cum_dir = os.path.join(work, "cumulative")
    shard_dir = os.path.join(work, "shards")
    # materialize shards to parquet once — both paths then read from disk
    for i in range(N_SHARDS):
        lo, hi = i * per, (i + 1) * per if i < N_SHARDS - 1 else n
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).write.parquet(os.path.join(shard_dir, f"s{i + 1}"))

    rows = []
    try:
        for i in range(1, N_SHARDS + 1):
            shard = spark.read.parquet(os.path.join(shard_dir, f"s{i}"))
            t0 = time.perf_counter()
            r = dedup_shard_against_index(
                spark, shard, idx, txn=("probe", i), collect_stats=False
            )
            r["accepted"].write.format("noop").mode("overwrite").save()
            t_incr = time.perf_counter() - t0

            # the naive daily job: append the shard, re-dedup the archive
            shard.write.mode("append").parquet(cum_dir)
            t0 = time.perf_counter()
            (
                spark.read.parquet(cum_dir)
                .groupBy(F.md5("text").alias("d"))
                .agg(F.min("doc_id").alias("doc_id"))
                .write.format("noop").mode("overwrite").save()
            )
            t_full = time.perf_counter() - t0

            def _du(path):
                total = 0
                for root, _dirs, files in os.walk(path):
                    total += sum(
                        os.path.getsize(os.path.join(root, f)) for f in files
                    )
                return total

            rows.append(
                {
                    "shard": i,
                    "incremental_sec": round(t_incr, 3),
                    "full_rededup_sec": round(t_full, 3),
                    "corpus_mb": round(_du(cum_dir) / 1e6, 2),
                    "index_mb": round(_du(idx) / 1e6, 2),
                }
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {"sf": SF, "repl": REPL, "docs": n, "shards": rows}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
