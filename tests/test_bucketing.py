"""Bucketed co-located joins: the fact-fact shuffle eliminator (SCALE.md).

Writes orders+lineitem as orderkey-bucketed managed tables and pins the plan:
the join between them must contain NO Exchange (each bucket pair joins in
place) and, because both are sortBy(orderkey), no Sort either. This is the
scale property that makes the orders ⨝ lineitem join survive 100 TB.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F

import pytest

from tests.conftest import SF_SMOKE
from web_analytics_on_aws_spark.operators.maintenance import bucket_info, bucketize
from web_analytics_on_aws_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    db = "bucketdb"
    loc = tmp_path_factory.mktemp("bucket_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    bucketize(
        load_table(spark, SF_SMOKE, "orders"), f"{db}.orders_b", ["o_orderkey"], 8
    )
    bucketize(
        load_table(spark, SF_SMOKE, "lineitem"), f"{db}.lineitem_b", ["l_orderkey"], 8
    )
    yield db
    spark.sql(f"DROP DATABASE {db} CASCADE")


def _fmt_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucket_spec_recorded(spark, bucketed):
    info = bucket_info(spark, f"{bucketed}.lineitem_b")
    assert info["num_buckets"] == 8
    assert info["bucket_cols"] == ["l_orderkey"]
    assert info["sort_cols"] == ["l_orderkey"]


def test_colocated_join_has_no_exchange_and_no_sort(spark, bucketed):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(f"{bucketed}.orders_b")
        li = spark.table(f"{bucketed}.lineitem_b")
        j = o.join(li, o.o_orderkey == li.l_orderkey)
        plan = _fmt_plan(j)
        assert "SortMergeJoin" in plan
        assert not re.search(r"\(\d+\) Exchange", plan), plan
        assert not re.search(r"\(\d+\) Sort\b", plan), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_join_matches_unbucketed_result(spark, bucketed):
    o = spark.table(f"{bucketed}.orders_b")
    li = spark.table(f"{bucketed}.lineitem_b")
    j = o.join(li, o.o_orderkey == li.l_orderkey).count()
    po = load_table(spark, SF_SMOKE, "orders")
    pl = load_table(spark, SF_SMOKE, "lineitem")
    plain = po.join(pl, po.o_orderkey == pl.l_orderkey).count()
    assert j == plain


def test_bucketed_agg_on_bucket_key_skips_shuffle(spark, bucketed):
    # groupBy on the bucket column: the partial/final agg collapses to one
    # stage — bucketed layout satisfies the required hash distribution.
    agg = spark.table(f"{bucketed}.lineitem_b").groupBy("l_orderkey").count()
    plan = _fmt_plan(agg)
    assert not re.search(r"\(\d+\) Exchange", plan), plan


def test_zorder_bounds_every_dimension(spark, tmp_path):
    """Z-order vs lexicographic clustering on (o_custkey, o_totalprice):
    a selective predicate on the SECOND column must overlap fewer files
    under z-order (lexical clustering leaves the second dim unbounded)."""
    from web_analytics_on_aws_spark.operators.maintenance import (
        cluster_rewrite,
        layout_stats,
        zorder_rewrite,
    )

    orders = load_table(spark, SF_SMOKE, "orders")
    lex, zo = str(tmp_path / "lex"), str(tmp_path / "zo")
    cluster_rewrite(orders, lex, ["o_custkey", "o_totalprice"], num_files=16)
    zorder_rewrite(orders, zo, ["o_custkey", "o_totalprice"], num_files=16)

    # lossless
    assert spark.read.parquet(zo).count() == orders.count()

    def files_hit(path: str, lo: float, hi: float) -> int:
        st = layout_stats(spark, path, "o_totalprice")
        return st.filter(
            (F.col("max_val") >= lo) & (F.col("min_val") <= hi)
        ).count()

    lo, hi = 1000.0, 2000.0  # narrow band on the second cluster key
    assert files_hit(zo, lo, hi) < files_hit(lex, lo, hi)
