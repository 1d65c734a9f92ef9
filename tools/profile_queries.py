"""Per-query profiling: split wall time into DataFrame build (Python-side
plan construction incl. fixture freshness checks), first execution, and
steady-state execution (min of N noop-sink runs); also count Spark jobs
per execution via the status tracker.

Usage: python tools/profile_queries.py [query ...]   (default: HEADLINE)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as bench.py.
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

    from bench import HEADLINE
    from web_analytics_on_aws_spark import plans
    from web_analytics_on_aws_spark.session import get_spark
    from web_analytics_on_aws_spark.sources import tables
    from web_analytics_on_aws_spark.sources.tables import TABLE_NAMES, load_table

    plans.load_all()
    names = sys.argv[1:] or HEADLINE
    shuffle_parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "8"))
    spark = get_spark(
        app_name="profile",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle_parts,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if os.environ.get("SPARK_GRAFT_INPUT_PARTS"):
        tables.INPUT_PARTITIONS = int(os.environ["SPARK_GRAFT_INPUT_PARTS"])
    else:
        tables.INPUT_SPLIT_MB = float(os.environ.get("SPARK_GRAFT_SPLIT_MB", "2"))
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).count()

    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in names:
        fn = plans.QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_first = time.perf_counter() - t0
        runs = []
        jobs_before = len(tracker.getJobIdsForGroup(None) or [])
        t_build = t_exec = 1e9
        njobs = 0
        for _ in range(3):
            j0 = tracker.getJobInfos() if hasattr(tracker, "getJobInfos") else None
            t0 = time.perf_counter()
            df2 = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df2.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            t_build = min(t_build, t1 - t0)
            t_exec = min(t_exec, t2 - t1)
            runs.append(round(t2 - t0, 3))
        out[name] = {
            "build_cold": round(t_build_cold, 3),
            "first_exec": round(t_first, 3),
            "build": round(t_build, 3),
            "exec": round(t_exec, 3),
            "runs": runs,
        }
        print(
            f"{name:40s} build={t_build:6.3f} exec={t_exec:6.3f} "
            f"first={t_first:6.3f} cold_build={t_build_cold:6.3f}",
            flush=True,
        )
    with open("/tmp/profile_queries.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
