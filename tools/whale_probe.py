"""Planted-whale skew probe for the attribution credit join (VERDICT r3
#3): build an events table with a 10^5-touch bot/whale user next to a
normal population, then time `events_attribution_multitouch` with the
shipped per-user touch cap vs. with the cap effectively disabled — the
measured contrast behind the SCALE.md row.

Usage: python tools/whale_probe.py [workdir]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = dt.datetime(2024, 1, 1)


def main() -> int:
    from pyspark.sql import functions as F

    from web_analytics_on_aws_spark.plans import engagement
    from web_analytics_on_aws_spark.session import get_spark

    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="whale-probe-"
    )
    spark = get_spark(app_name="whale-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    # population: 2000 normal users × 100 touches; ONE whale with 10^5
    # touches and 1000 purchases — the bot key a cap must bound
    normal = (
        spark.range(200_000)
        .select(
            F.col("id").alias("event_id"),
            (F.lit(BASE) + F.make_interval(mins=(F.col("id") % 5000).cast("int")))
            .alias("ts"),
            (F.col("id") % 2000 + 10).alias("user_id"),
            F.when(F.col("id") % 50 == 0, "purchase").otherwise("view")
            .alias("event_type"),
            F.lit(10.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    # one touch per 6 s going back ≈7 days: EVERY whale touch falls inside
    # each purchase's 7-day window — the worst-case uncapped fanout
    whale_touch = spark.range(100_000).select(
        (F.col("id") + 1_000_000).alias("event_id"),
        (F.lit(BASE) - F.make_interval(secs=(F.col("id") * 6).cast("int")))
        .alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    whale_buy = spark.range(1_000).select(
        (F.col("id") + 2_000_000).alias("event_id"),
        (F.lit(BASE) + F.make_interval(mins=(F.col("id") + 1).cast("int")))
        .alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        F.lit("purchase").alias("event_type"),
        F.lit(100.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    ev = normal.unionByName(whale_touch).unionByName(whale_buy)
    sf = os.path.join(work, "sf")
    ev.repartition(8).write.mode("overwrite").parquet(
        os.path.join(sf, "events.parquet")
    )

    def timed(label: str) -> float:
        t0 = time.perf_counter()
        n = engagement.attribution_multitouch(spark, sf).count()
        el = time.perf_counter() - t0
        print(f"{label}: {el:.2f} s ({n} channel rows)", flush=True)
        return round(el, 2)

    timed("warmup (capped)")
    capped = timed("capped (shipped _TOUCH_CAP)")
    orig = engagement._TOUCH_CAP
    engagement._TOUCH_CAP = 1 << 30  # cap disabled: the pre-guard plan
    try:
        uncapped = timed("uncapped (cap disabled)")
    finally:
        engagement._TOUCH_CAP = orig
    print(json.dumps({
        "whale_touches": 100_000, "whale_purchases": 1_000,
        "capped_sec": capped, "uncapped_sec": uncapped,
        "ratio": round(uncapped / capped, 1),
    }))
    spark.stop()
    if work.startswith(tempfile.gettempdir()):
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
