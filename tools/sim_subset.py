"""Run the driver sim's compare for a named subset of queries.

Usage: python tools/sim_subset.py query1 query2 ... [--sf DIR]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from tools.driver_sim import TABLES, canon, kind


def main(names, sf):
    spark = (
        SparkSession.builder.master("local[8]").appName("sim-subset").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    bad = []
    for name in names:
        if name not in qs:
            print(f"UNKNOWN {name}")
            bad.append(name)
            continue
        spdf = qs[name](spark, sf).toPandas()
        if name not in oracles:
            print(f"rows-only {name}: {len(spdf)} rows")
            continue
        ddf = con.execute(oracles[name]).df()
        if sorted(spdf.columns) != sorted(ddf.columns):
            print(f"COLS {name}: {sorted(spdf.columns)} vs {sorted(ddf.columns)}")
            bad.append(name)
            continue
        tmis = [
            (c, kind(spdf[c]), kind(ddf[c]))
            for c in spdf.columns
            if kind(spdf[c]) != kind(ddf[c])
        ]
        if tmis:
            print(f"TYPE {name}: {tmis}")
            bad.append(name)
        cs, cd = canon(spdf), canon(ddf)
        if cs != cd:
            print(f"VALUE {name}: rows {len(cs)} vs {len(cd)}")
            shown = 0
            for a, b in zip(cs, cd):
                if a != b and shown < 3:
                    print("  spark:", a[:6], "\n  duck :", b[:6])
                    shown += 1
            bad.append(name)
        else:
            print(f"OK {name}: {len(cs)} rows")
    print(f"DONE bad={sorted(set(bad))}")
    spark.stop()


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2 :]
    os.environ.setdefault("SPARK_GRAFT_GOLDEN_SF_DIR", sf)
    main(args, sf)
