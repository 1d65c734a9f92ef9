"""Dtype-aware driver simulation — the full local correctness gate.

The grading driver samples ~50 of the registered queries per round; this
sim runs EVERY oracled query (vanilla local[8] session, sf0.01 by default)
and compares pandas-level dtypes AND canonical values against DuckDB —
catching DuckDB HUGEINT / decimal-width artifacts that a value-only compare
misses but the driver's type-sensitive hash trips on (the root cause of all
11 round-1 hash mismatches). Rows-only queries are executed for crashes.

Run before every round handoff:  python tools/driver_sim.py [sf_dir]
Expect:  DONE: ... type_bad=[]; val_bad=[]
"""
import datetime
import decimal
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def kind(series):
    """Collapse a pandas dtype to a comparison category."""
    k = series.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "date-or-datetime"
    # object: inspect first non-null value
    for v in series:
        if v is None or (isinstance(v, float) and pd.isna(v)):
            continue
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            return "float"
        if isinstance(v, str):
            return "str"
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "list"
        if isinstance(v, (datetime.datetime, datetime.date)):
            return "date-or-datetime"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        return type(v).__name__
    return "all-null"


def cell(v):
    if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
        return "NULL"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        if v.time() == datetime.time(0, 0) and v.tzinfo is None:
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return repr([cell(x) for x in v])
    return repr(v)


def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(cell(r[c]) for c in cols) for _, r in df[cols].iterrows()]
    return sorted(rows)


def main():
    # golden oracles (plans/goldens.py) must reference-compute over the
    # SAME corpus the queries run on — at non-default SF the default
    # (sf0.01) golden would mismatch by construction. Set here, not at
    # module import (sim_subset imports this module with its own argv).
    os.environ.setdefault("SPARK_GRAFT_GOLDEN_SF_DIR", SF)
    spark = SparkSession.builder.master("local[8]").appName("type-sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    print(f"entry(): {len(rows)} rows", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    type_bad, val_bad = [], []
    for i, (name, sql) in enumerate(sorted(oracles.items())):
        try:
            spdf = qs[name](spark, SF).toPandas()
            ddf = con.execute(sql).df()
        except Exception as ex:
            print(f"ERROR {name}: {ex}", flush=True)
            val_bad.append(name)
            continue
        if sorted(spdf.columns) != sorted(ddf.columns):
            print(f"COLS {name}: {sorted(spdf.columns)} vs {sorted(ddf.columns)}", flush=True)
            val_bad.append(name)
            continue
        tmis = []
        for c in spdf.columns:
            ks, kd = kind(spdf[c]), kind(ddf[c])
            if ks != kd:
                tmis.append((c, ks, kd, str(spdf[c].dtype), str(ddf[c].dtype)))
        if tmis:
            type_bad.append(name)
            print(f"TYPE {name}: {tmis}", flush=True)
        if canon(spdf) != canon(ddf):
            val_bad.append(name)
            cs, cd = canon(spdf), canon(ddf)
            print(f"VALUE {name}: rows {len(cs)} vs {len(cd)}", flush=True)
            for a, b in list(zip(cs, cd))[:3]:
                if a != b:
                    print("  spark:", a[:4], "\n  duck :", b[:4], flush=True)
        if (i + 1) % 20 == 0:
            print(f"...{i+1}/{len(oracles)}", flush=True)
    print(f"DONE: {len(oracles)} oracled; type_bad={type_bad}; val_bad={val_bad}", flush=True)
    rows_only_bad = []
    for name in sorted(set(qs) - set(oracles)):
        try:
            n = qs[name](spark, SF).count()
            print(f"rows-only {name}: {n} rows", flush=True)
        except Exception as ex:
            rows_only_bad.append(name)
            print(f"ERROR rows-only {name}: {ex}", flush=True)
    spark.stop()
    return 1 if (type_bad or val_bad or rows_only_bad) else 0


if __name__ == "__main__":
    sys.exit(main())
