"""Command-line entry point: run registered queries, ad-hoc Spark SQL, or
Athena/Trino-dialect SQL against the testdata tables.

    python -m web_analytics_on_aws_spark list
    python -m web_analytics_on_aws_spark query tpch_q1_pricing_summary
    python -m web_analytics_on_aws_spark sql   "SELECT COUNT(*) FROM events"
    python -m web_analytics_on_aws_spark trino 'SELECT "event_type", count(*) FROM events GROUP BY 1'

Options: --sf DIR (default /root/testdata/sf0.01), --limit N (default 20).
Tables region nation customer supplier part orders lineitem events
documents embeddings are registered as temp views for sql/trino.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="web_analytics_on_aws_spark")
    ap.add_argument("command", choices=["list", "query", "sql", "trino"])
    ap.add_argument("arg", nargs="?", help="query name or SQL text")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=20)
    args = ap.parse_args(argv)

    from web_analytics_on_aws_spark import plans

    plans.load_all()

    if args.command == "list":
        for name in sorted(plans.QUERIES):
            mark = "oracle" if name in plans.ORACLES else "rows-only"
            print(f"{name}  [{mark}]")
        return 0

    if not args.arg:
        ap.error(f"{args.command} requires an argument")

    from web_analytics_on_aws_spark.session import get_spark
    from web_analytics_on_aws_spark.sources.tables import TABLE_NAMES, load_table

    spark = get_spark(app_name="cli")
    spark.sparkContext.setLogLevel("ERROR")
    if args.command == "query":
        if args.arg not in plans.QUERIES:
            print(f"unknown query {args.arg!r} — try `list`", file=sys.stderr)
            return 2
        df = plans.QUERIES[args.arg](spark, args.sf)
    else:
        for t in TABLE_NAMES:
            load_table(spark, args.sf, t).createOrReplaceTempView(t)
        if args.command == "sql":
            df = spark.sql(args.arg)
        else:
            from web_analytics_on_aws_spark.functions.trino_compat import trino_sql

            df = trino_sql(spark, args.arg)
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
