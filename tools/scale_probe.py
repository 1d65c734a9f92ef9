"""10x-replication scaling probe for SCALE.md: replicate the sf0.1 tables
with disjoint id spaces, time a named set of queries at 1x vs 10x.

Usage: python tools/scale_probe.py q1 q2 ...
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_SRC = "/root/testdata/sf0.1"
SF = "/tmp/sf1x1"   # 1x copy, re-written with splittable row groups
OUT = "/tmp/sf1x10"
# id column + replication shift per table (disjoint id spaces per replica).
# Foreign keys shift consistently so replicated fact rows keep joining:
# orders.o_custkey ↔ customer.c_custkey, lineitem.l_orderkey ↔
# orders.o_orderkey (suppliers/parts stay shared — dims joined by
# unshifted keys).
TABLES = {
    "events": ("event_id", 10_000_000, "user_id", 1_000_000),
    "documents": ("doc_id", 10_000_000, None, 0),
    "embeddings": ("vec_id", 10_000_000, None, 0),
    "orders": ("o_orderkey", 100_000_000, "o_custkey", 10_000_000),
    "lineitem": ("l_orderkey", 100_000_000, None, 0),
    "customer": ("c_custkey", 10_000_000, None, 0),
}


def build_replica(src: str = SF_SRC, out_1x: str | None = SF,
                  out_10x: str = OUT, factor: int = 10) -> None:
    """Materialize a ``factor``×-replicated copy of ``src`` with disjoint
    id spaces (and optionally a re-chunked 1× copy for fair ratios).
    Shared by scale_probe and bench_10x."""
    for d in ([out_1x] if out_1x else []) + [out_10x]:
        if os.path.isdir(d):
            shutil.rmtree(d)
        os.makedirs(d)
    con = duckdb.connect()
    # 1x side: identical data, but re-chunked — ratios must compare
    # parallel-vs-parallel, not one single-row-group task vs 50 splits
    if out_1x:
        for t in list(TABLES) + ["region", "nation", "supplier", "part"]:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
                f"'{out_1x}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 2000)"
            )
    for t, (idc, shift, idc2, shift2) in TABLES.items():
        cols = con.sql(f"SELECT * FROM '{src}/{t}.parquet' LIMIT 0").columns
        sel = []
        for c in cols:
            if c == idc:
                sel.append(f"{c} + r * {shift} AS {c}")
            elif idc2 and c == idc2:
                sel.append(f"{c} + r * {shift2} AS {c}")
            else:
                sel.append(c)
        # small row groups: parquet splits only at row-group boundaries, and
        # DuckDB's default single giant group would serialize every Spark
        # scan of the replica into ONE task (measured: map-heavy queries
        # then report single-thread time, not scaling)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{src}/{t}.parquet', "
            f"(SELECT UNNEST(range(0, {factor})) AS r)) TO "
            f"'{out_10x}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 2000)"
        )
    # untouched tables: copy through so load_table finds them
    for t in ["region", "nation", "supplier", "part"]:
        shutil.copy(f"{src}/{t}.parquet", f"{out_10x}/{t}.parquet")


def build():
    build_replica(SF_SRC, SF, OUT, 10)


def main(names):
    build()
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # DuckDB's COPY writes one big row group per table; without a
        # smaller split size the whole 10x file becomes ONE scan task and
        # every map-heavy query measures single-thread time, not scaling.
        # openCostInBytes must drop too — the split size is effectively
        # max(openCost, …), so the 4 MB default still yields one task for
        # small-but-dense files.
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "64k")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from web_analytics_on_aws_spark import plans

    plans.load_all()
    def run(fn, sf):
        # noop sink, not count(): count() lets Catalyst prune joins that
        # don't affect cardinality, timing a cheaper plan than the query
        fn(spark, sf).write.format("noop").mode("overwrite").save()

    for name in names:
        fn = plans.QUERIES[name]
        # warm BOTH scales: steady-state engine cost is the measurement —
        # one-time amortized work (JIT, broadcast machinery, materialized
        # index builds) must not land inside either timed run
        run(fn, SF)
        run(fn, OUT)
        t0 = time.perf_counter()
        run(fn, SF)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(fn, OUT)
        t10 = time.perf_counter() - t0
        n1, n10 = fn(spark, SF).count(), fn(spark, OUT).count()
        print(
            f"{name}: sf0.1 {t1:.2f}s ({n1} rows) | 10x {t10:.2f}s ({n10} rows)"
            f" | ratio {t10 / t1:.1f}x",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
