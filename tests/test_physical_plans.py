"""Physical-plan regression tests: the scale properties SURVEY §4 relies on
(predicate pushdown to the parquet scan, column pruning, broadcast joins for
dims, TakeOrderedAndProject for top-k, partial aggregation) must survive
refactors. A query can stay correct while silently losing its plan shape —
these tests pin the shape."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from web_analytics_on_aws_spark import plans

plans.load_all()


def _explain(spark, name: str) -> str:
    df = plans.QUERIES[name](spark, SF_SMOKE)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q1_filter_pushdown_and_partial_agg(spark):
    plan = _explain(spark, "tpch_q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "partial_sum" in plan  # map-side combine
    # column pruning: only the 7 needed columns reach the scan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


def test_q3_broadcasts_dims_and_takeordered(spark):
    plan = _explain(spark, "tpch_q3_top_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must not shuffle-sort at this size
    assert "TakeOrderedAndProject" in plan  # LIMIT never plans a full sort


def test_q5_single_fact_pass_all_dims_broadcast(spark):
    plan = _explain(spark, "tpch_q5_regional_revenue")
    assert plan.count("BroadcastHashJoin") >= 4
    # the only Exchange should be the final aggregation shuffle, not a join
    assert "SortMergeJoin" not in plan


def test_events_scan_prunes_columns(spark):
    plan = _explain(spark, "weblog_daily_uniques")
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "props" not in read_schema and "event_type" not in read_schema


def test_partition_predicate_pushdown_on_ctas_hour(spark):
    plan = _explain(spark, "weblog_ctas_hour")
    # year/month/day/hour derive from ts: the ts IsNotNull guard must reach
    # the scan, and only projected columns are read
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "props" not in read_schema


def test_anti_and_semi_join_plan_shapes(spark):
    anti = _explain(spark, "join_anti_customers_without_orders")
    semi = _explain(spark, "join_semi_customers_with_open_orders")
    assert "LeftAnti" in anti
    assert "LeftSemi" in semi


def test_no_cartesian_products_anywhere(spark):
    """No registered query may plan an unconditioned cross join of two
    large inputs; the only nested-loop joins allowed are broadcast ones
    (single-row query vectors, LSH probes, scalar subqueries)."""
    for name in sorted(plans.QUERIES):
        plan = _explain(spark, name)
        assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"


def test_knn_broadcasts_query_vector_not_corpus(spark):
    plan = _explain(spark, "embedding_knn_q0")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
