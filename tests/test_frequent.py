"""Heavy hitters: Misra-Gries candidate generation has no false negatives
at the support threshold, and the two-phase operator is bit-exact against a
plain groupBy — on skewed data spread across many partitions."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F

from web_analytics_on_aws_spark.operators.frequent import (
    heavy_hitters,
    misra_gries_candidates,
)


def _skewed(spark, n_partitions=8):
    # Zipf-ish: item i appears roughly 3000/i times; tail of singletons.
    rows = []
    for i in range(1, 40):
        rows += [(f"item_{i}",)] * (3000 // i)
    rows += [(f"tail_{j}",) for j in range(2000)]
    # interleave deterministically so partitions see mixed traffic
    rows.sort(key=lambda r: hash(r[0]) % 997)
    return spark.createDataFrame(rows, ["k"]).repartition(n_partitions), Counter(
        r[0] for r in rows
    )


def test_candidates_cover_all_heavy_items(spark):
    df, exact = _skewed(spark)
    n = sum(exact.values())
    support = 0.01
    capacity = 100  # ceil(1/support)
    cands = {r["item"] for r in misra_gries_candidates(df, "k", capacity).collect()}
    heavy = {k for k, c in exact.items() if c >= support * n}
    assert heavy, "test data must contain heavy items"
    assert heavy <= cands, f"missing heavy items: {heavy - cands}"
    # bounded output: at most capacity per partition
    assert len(cands) <= capacity * df.rdd.getNumPartitions()


def test_heavy_hitters_exact_vs_groupby(spark):
    df, exact = _skewed(spark)
    got = {
        (r["k"], r["n"]) for r in heavy_hitters(df, "k", support="0.01").collect()
    }
    n = sum(exact.values())
    # same decimal threshold the operator uses
    from decimal import Decimal
    from math import ceil

    thr = ceil(Decimal("0.01") * n)
    want = {(k, c) for k, c in exact.items() if c >= thr}
    assert got == want


def test_heavy_hitters_empty_and_allheavy(spark):
    empty = spark.createDataFrame([], "k string")
    assert heavy_hitters(empty, "k", support="0.5").count() == 0
    two = spark.createDataFrame([("a",), ("a",), ("b",), ("b",)], ["k"]).repartition(4)
    got = {(r["k"], r["n"]) for r in heavy_hitters(two, "k", support="0.5").collect()}
    assert got == {("a", 2), ("b", 2)}
