"""Measured contrast for executor-side manifest-stats collection
(VERDICT r6 #2): a ≥500-file commit collects per-file footer bounds in
parallel write-side tasks (mapInPandas fan-out) vs the old serial driver
loop, with byte-identical manifest content.

Local footers are page-cache-warm, so the measured gap understates object
storage (each footer there is a ~20-50 ms network round-trip — serial is
minutes per 10k-file commit; parallel is bounded by cluster width).

Usage: python tools/stats_collect_probe.py [files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 600

    import pyspark.sql.functions as F

    from web_analytics_on_aws_spark.session import get_spark
    from web_analytics_on_aws_spark.sources import snapshots

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="stats-collect-probe-") + "/t"
    df = spark.range(n_files * 200).select(
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("x"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        F.expr(
            "timestamp_micros(cast(1709600000000000 + id * 1000000 as long))"
        ).alias("ts"),
    )
    snapshots.commit_append(df.repartition(n_files), base)
    m = snapshots._read_manifest(base, snapshots.current_version(base))
    paths = m["files"]

    out = {"n_files": len(paths)}

    def timed(mode: str) -> tuple[float, dict]:
        os.environ["SPARK_GRAFT_STATS_DISTRIBUTE"] = mode
        try:
            t0 = time.time()
            stats = snapshots.collect_file_stats(paths, spark)
            return time.time() - t0, stats
        finally:
            os.environ.pop("SPARK_GRAFT_STATS_DISTRIBUTE", None)

    # local page-cache footers: the serial driver loop wins (this is WHY
    # dispatch is scheme-aware — local paths keep the loop)
    serial_s, serial = timed("never")
    timed("always")  # warm the python workers once
    distributed_s, distributed = timed("always")
    assert distributed == serial, "distributed fold diverged from serial"
    out["local_pagecache"] = {
        "serial_s": round(serial_s, 2),
        "distributed_s": round(distributed_s, 2),
    }

    # object-store model: each footer open pays a simulated 20 ms network
    # round-trip (SPARK_GRAFT_STATS_FOOTER_DELAY_MS hook) — the regime the
    # executor fan-out exists for
    os.environ["SPARK_GRAFT_STATS_FOOTER_DELAY_MS"] = "20"
    try:
        serial_s, serial2 = timed("never")
        distributed_s, distributed2 = timed("always")
    finally:
        os.environ.pop("SPARK_GRAFT_STATS_FOOTER_DELAY_MS", None)
    assert distributed2 == serial2 == serial
    out["simulated_20ms_footer_latency"] = {
        "serial_s": round(serial_s, 2),
        "distributed_s": round(distributed_s, 2),
        "speedup": round(serial_s / max(distributed_s, 1e-9), 1),
    }
    out["identical_manifest_content"] = True
    print(json.dumps(out))
    shutil.rmtree(os.path.dirname(base), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
