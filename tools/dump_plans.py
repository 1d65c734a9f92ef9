"""Dump `.explain("formatted")` for named queries to plans/r12/<q>_<tag>.txt.

Evidence artifacts for the optimization rounds: capture the physical plan
of each query before and after a change so plan claims (Exchange counts,
join strategies, PushedFilters, Python-eval nodes) are checkable without
running Spark.

Usage: python tools/dump_plans.py <tag> [query ...]
  tag      suffix for the plan files (e.g. "before", "after")
  query    query names (default: every bench HEADLINE query)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_PLAN_DIR (default plans/r12).
"""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import HEADLINE
    from web_analytics_on_aws_spark import plans
    from web_analytics_on_aws_spark.session import get_spark

    plans.load_all()
    names = sys.argv[2:] or HEADLINE
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLAN_DIR", os.path.join(ROOT, "plans", "r12")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="plan-dump", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = plans.QUERIES[name](spark, sf)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(p)
        print(path)
    spark.stop()


if __name__ == "__main__":
    main()
