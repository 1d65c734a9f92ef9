"""Data-quality queries: table profiling and expectation suites with exact
DuckDB oracles (operators/dq.py). The table-level complement of the
reference's per-record validator (SURVEY §2.2 P3)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from web_analytics_on_aws_spark.operators import dq
from web_analytics_on_aws_spark.plans import query
from web_analytics_on_aws_spark.sources.tables import load_table


@query(
    "dq_profile_events",
    oracle="""
    WITH t AS (SELECT * FROM events)
    SELECT 'event_id' AS "column", (SELECT COUNT(*) FROM t) AS n_rows,
           COUNT(event_id) AS n_nonnull, COUNT(DISTINCT event_id) AS n_distinct FROM t
    UNION ALL
    SELECT 'user_id', (SELECT COUNT(*) FROM t),
           COUNT(user_id), COUNT(DISTINCT user_id) FROM t
    UNION ALL
    SELECT 'event_type', (SELECT COUNT(*) FROM t),
           COUNT(event_type), COUNT(DISTINCT event_type) FROM t
    UNION ALL
    SELECT 'value', (SELECT COUNT(*) FROM t),
           COUNT(value), COUNT(DISTINCT value) FROM t
    """,
)
def dq_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass long-form profile of the events table (row count,
    non-null count, exact distinct count per column). The `approx=True`
    variant swaps exact distincts for HLL at 100 TB widths."""
    ev = load_table(spark, sf_dir, "events")
    return dq.profile_columns(ev, ["event_id", "user_id", "event_type", "value"])


@query(
    "dq_expectations",
    oracle="""
    SELECT 'value_non_negative' AS "check",
           COUNT(*) FILTER (WHERE NOT COALESCE(value >= 0, FALSE)) AS n_violations,
           COUNT(*) FILTER (WHERE NOT COALESCE(value >= 0, FALSE)) = 0 AS passed
    FROM events
    UNION ALL
    SELECT 'known_event_type',
           COUNT(*) FILTER (WHERE NOT COALESCE(
               event_type IN ('view','click','purchase','signup','error'), FALSE)),
           COUNT(*) FILTER (WHERE NOT COALESCE(
               event_type IN ('view','click','purchase','signup','error'), FALSE)) = 0
    FROM events
    UNION ALL
    SELECT 'ts_in_window',
           COUNT(*) FILTER (WHERE NOT COALESCE(
               ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01', FALSE)),
           COUNT(*) FILTER (WHERE NOT COALESCE(
               ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01', FALSE)) = 0
    FROM events
    UNION ALL
    SELECT 'unique(event_id)',
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT),
           COALESCE(SUM(n - 1), 0) = 0
    FROM (SELECT COUNT(*) AS n FROM events GROUP BY event_id)
    UNION ALL
    SELECT 'o_custkey->c_custkey',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)),
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) = 0
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over the warehouse: row-local checks fused into one
    aggregation pass, plus a key-uniqueness check (one O(groups) shuffle)
    and a referential-integrity anti-join — each emitting
    (check, n_violations, passed)."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    row_local = dq.expect(
        ev,
        {
            "value_non_negative": F.col("value") >= 0,
            "known_event_type": F.col("event_type").isin(
                "view", "click", "purchase", "signup", "error"
            ),
            "ts_in_window": (F.col("ts") >= "2024-01-01")
            & (F.col("ts") < "2024-02-01"),
        },
    )
    return (
        row_local.unionByName(dq.expect_unique(ev, ["event_id"]))
        .unionByName(
            dq.expect_references(orders, "o_custkey", customer, "c_custkey")
        )
    )
