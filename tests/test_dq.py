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


def test_reconcile_detects_planted_drift(spark):
    from web_analytics_on_aws_spark.operators.dq import reconcile

    src = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)], "k long, v double"
    ).select("k", F.col("v").cast("decimal(18,2)").alias("v"))
    # target: k=2 drifted by 5, k=4 missing, k=9 extra
    tgt = spark.createDataFrame(
        [(1, 4.0), (1, 6.0), (2, 25.0), (3, 30.0), (9, 1.0)], "k long, v double"
    ).select("k", F.col("v").cast("decimal(18,2)").alias("v"))
    row = reconcile(
        src, tgt, ["k"], {"v": (F.sum("v"), F.sum("v"))}, tolerance=0.01
    ).collect()[0]
    assert row["measure"] == "v"
    assert row["n_source_keys"] == 4 and row["n_target_keys"] == 4
    assert row["n_matched_keys"] == 3
    # mismatches: drifted k=2, missing k=4, extra k=9 → 3
    assert row["n_value_mismatches"] == 3
    assert abs(row["max_abs_diff"] - 5.0) < 1e-9


def test_reconcile_clean_parity(spark):
    from web_analytics_on_aws_spark.operators.dq import reconcile

    src = spark.createDataFrame([(1, 7.0), (2, 9.0)], "k long, v double")
    tgt = spark.createDataFrame(
        [(1, 3.0), (1, 4.0), (2, 9.0)], "k long, v double"
    )
    row = reconcile(
        src, tgt, ["k"],
        {"v": (F.sum(F.col("v").cast("decimal(18,2)")),
               F.sum(F.col("v").cast("decimal(18,2)")))},
    ).collect()[0]
    assert row["n_value_mismatches"] == 0 and row["max_abs_diff"] == 0.0


# --- property-based: reconcile vs Python brute force ---

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_kv = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-20, 20)), min_size=0, max_size=20
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(src=_kv, tgt=_kv)
def test_reconcile_matches_bruteforce(spark, src, tgt):
    from web_analytics_on_aws_spark.operators.dq import reconcile

    sdf = spark.createDataFrame(src or [(99, 0)], "k long, v long")
    tdf = spark.createDataFrame(tgt or [(98, 0)], "k long, v long")
    src_, tgt_ = src or [(99, 0)], tgt or [(98, 0)]
    row = reconcile(
        sdf, tdf, ["k"], {"v": (F.sum("v"), F.sum("v"))}
    ).collect()[0]

    ssum, tsum = defaultdict(int), defaultdict(int)
    for k, v in src_:
        ssum[k] += v
    for k, v in tgt_:
        tsum[k] += v
    assert row["n_source_keys"] == len(ssum)
    assert row["n_target_keys"] == len(tsum)
    assert row["n_matched_keys"] == len(set(ssum) & set(tsum))
    mism = sum(
        1
        for k in set(ssum) | set(tsum)
        if k not in ssum or k not in tsum or ssum[k] != tsum[k]
    )
    assert row["n_value_mismatches"] == mism
