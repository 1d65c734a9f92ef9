"""Sketch rollups: merge-vs-direct identity, error bounds, audit queries.

The load-bearing property is ASSOCIATIVITY: sketch(A ∪ B) must equal
union(sketch(A), sketch(B)) so rollups compose across partitions/days/
clusters. For HLL this is exact (registers are per-bucket maxima), so the
test pins equality, not epsilon-closeness.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_CORRECTNESS
from web_analytics_on_aws_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_rollup,
    kll_merge,
    kll_quantiles,
    kll_rollup,
)
from web_analytics_on_aws_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_CORRECTNESS, "events").withColumn(
        "day", F.col("ts").cast("date")
    )


def test_hll_merge_of_daily_equals_direct_global_exactly(spark, events):
    merged = hll_merge(hll_rollup(events, ["day"], "user_id"), []).collect()[0]
    direct = (
        events.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("uniq_estimate")
        ).collect()[0]
    )
    assert merged.uniq_estimate == direct.uniq_estimate
    assert merged.rows == events.count()


def test_hll_estimate_within_bound(spark, events):
    est = hll_estimate(hll_rollup(events, ["day"], "user_id"))
    exact = events.groupBy("day").agg(F.countDistinct("user_id").alias("exact"))
    rows = exact.join(est, "day").collect()
    assert rows
    for r in rows:
        assert abs(r.uniq_estimate - r.exact) <= 0.05 * r.exact, r


def test_kll_merged_median_rank_bound(spark, events):
    # Merge per-day KLL sketches, probe the global median, audit its rank.
    daily = kll_rollup(events, ["day"], "value")
    merged = kll_merge(daily)
    est = kll_quantiles(merged, [0.5]).collect()[0].p50
    n = events.count()
    rank = events.filter(F.col("value") <= est).count() / n
    assert abs(rank - 0.5) <= 0.05, (est, rank)


def test_sketch_rollup_is_constant_size(spark, events):
    # The scale contract: one bounded binary per group, regardless of rows.
    sizes = (
        hll_rollup(events, ["day"], "user_id")
        .select(F.length("uniq_sketch").alias("sz"))
        .agg(F.max("sz").alias("mx"))
        .collect()[0]
    )
    assert sizes.mx <= 2 ** 12 + 64  # lgk=12 registers + header


@pytest.mark.parametrize(
    "name",
    [
        "sketch_daily_uniques_audit",
        "sketch_global_uniques_merge_audit",
        "sketch_value_median_audit",
        "sketch_theta_union_audit",
    ],
)
def test_audit_queries_all_true(spark, name):
    from web_analytics_on_aws_spark import plans

    plans.load_all()
    df = plans.QUERIES[name](spark, SF_CORRECTNESS)
    rows = df.collect()
    assert rows
    flag = [c for c in df.columns if c.endswith("_tol") or c.endswith("_ok")][0]
    assert all(getattr(r, flag) for r in rows), rows


# --------------------------------------------------------------- count-min


def test_cms_never_undercounts_and_merges_linearly(spark):
    import pyspark.sql.functions as F

    from web_analytics_on_aws_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    rows = [(i % 7,) for i in range(200)] + [(99,)] * 50
    df = spark.createDataFrame(rows, "k long")
    keys = df.select("k").distinct()
    sk = cms_build(df, "k", depth=5, width=64)
    est = {
        r["k"]: r["cms_estimate"]
        for r in cms_estimate(sk, keys, "k", depth=5, width=64).collect()
    }
    true = {r["k"]: r["c"] for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()}
    for k, t in true.items():
        assert est[k] >= t  # CMS one-sided error

    # linearity: cell-wise sum of the two half sketches == full sketch
    a = df.filter(F.col("k") < 50)
    b = df.filter(F.col("k") >= 50)
    merged = (
        cms_build(a, "k", depth=5, width=64)
        .unionAll(cms_build(b, "k", depth=5, width=64))
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = {(r["r"], r["c"]): r["cnt"] for r in sk.collect()}
    got = {(r["r"], r["c"]): r["cnt"] for r in merged.collect()}
    assert got == full


def test_cms_unseen_key_estimates_bounded_by_eps(spark):
    import math

    from web_analytics_on_aws_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame([(i,) for i in range(300)], "k long")
    sk = cms_build(df, "k", depth=5, width=1024)
    probe = spark.createDataFrame([(10_000,)], "k long")
    est = cms_estimate(sk, probe, "k", depth=5, width=1024).collect()[0][
        "cms_estimate"
    ]
    assert 0 <= est <= math.ceil(math.e / 1024 * 300)
