"""Property-based check of the salting operators: for ARBITRARY small
tables (random keys, values, duplicates, hot keys), salted_join must equal
the plain join as a multiset and salted_agg must equal the plain groupBy —
the exact-equivalence claim their shared oracles rely on, fuzzed beyond the
fixed testdata distribution.

One Spark job per hypothesis example would be slow; instead each example
generates both tables, runs the pair of plans once, and compares collected
multisets — examples are capped small so shrinking stays fast.
"""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from web_analytics_on_aws_spark.operators.skew import salted_agg, salted_join

keys = st.integers(min_value=0, max_value=5)  # tiny domain → forced hot keys
rows = st.lists(st.tuples(keys, st.integers(-100, 100)), min_size=0, max_size=25)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=rows, right=rows)
def test_salted_join_multiset_equals_plain_join(spark, left, right):
    l = spark.createDataFrame(left or [(0, 0)], "k int, lv int")
    r = spark.createDataFrame(right or [(0, 0)], "k int, rv int")
    if not left:
        l = l.filter(F.lit(False))
    if not right:
        r = r.filter(F.lit(False))

    plain = Counter(map(tuple, l.join(r, "k").collect()))
    salted = Counter(
        map(tuple, salted_join(l, r, on=["k"], salt_buckets=4).collect())
    )
    assert salted == plain


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows)
def test_salted_agg_equals_plain_groupby(spark, data):
    df = spark.createDataFrame(data or [(0, 0)], "k int, v int")
    if not data:
        df = df.filter(F.lit(False))

    plain = {
        (row["k"], row["cnt"], row["total"])
        for row in df.groupBy("k")
        .agg(F.count("*").alias("cnt"), F.sum("v").alias("total"))
        .collect()
    }
    salted = {
        (row["k"], row["cnt"], row["total"])
        for row in salted_agg(
            df,
            ["k"],
            {"cnt": (F.count("*"), F.sum("cnt")), "total": (F.sum("v"), F.sum("total"))},
            salt_buckets=4,
        ).collect()
    }
    assert salted == plain
