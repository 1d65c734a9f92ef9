"""Data-quality operators: profiler metrics vs hand-computed truth, and
expectations catching planted violations (null handling included)."""

from __future__ import annotations

import pyspark.sql.functions as F

from web_analytics_on_aws_spark.operators import dq


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", -1.0), (3, None, 2.0), (3, "a", None)],
        ["id", "cat", "v"],
    )


def test_profile_exact_and_approx(spark):
    df = _df(spark)
    rows = {r["column"]: r for r in dq.profile_columns(df, ["id", "cat", "v"]).collect()}
    assert rows["id"]["n_rows"] == 4 and rows["id"]["n_nonnull"] == 4
    assert rows["id"]["n_distinct"] == 3
    assert rows["cat"]["n_nonnull"] == 3 and rows["cat"]["n_distinct"] == 2
    assert rows["v"]["n_nonnull"] == 3
    approx = {r["column"]: r for r in
              dq.profile_columns(df, ["id"], approx=True).collect()}
    assert abs(approx["id"]["n_distinct"] - 3) <= 1  # HLL at tiny n is near-exact


def test_expect_counts_nulls_as_violations(spark):
    df = _df(spark)
    got = {r["check"]: (r["n_violations"], r["passed"])
           for r in dq.expect(df, {
               "v_nonneg": F.col("v") >= 0,          # -1 fails, NULL fails
               "cat_known": F.col("cat").isin("a", "b"),  # NULL fails
           }).collect()}
    assert got["v_nonneg"] == (2, False)
    assert got["cat_known"] == (1, False)


def test_expect_unique_and_references(spark):
    df = _df(spark)
    u = dq.expect_unique(df, ["id"]).first()
    assert (u["n_violations"], u["passed"]) == (1, False)
    parent = spark.createDataFrame([(1,), (2,)], ["pid"])
    r = dq.expect_references(df, "id", parent, "pid").first()
    assert (r["n_violations"], r["passed"]) == (2, False)  # both id=3 rows orphaned
    ok = dq.expect_unique(df.dropDuplicates(["id"]), ["id"]).first()
    assert ok["passed"] is True
