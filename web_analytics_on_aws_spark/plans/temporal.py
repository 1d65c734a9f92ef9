"""Temporal-join plans: as-of attribution and trailing-window range counts.

DuckDB's native ``ASOF JOIN`` is the oracle for the as-of operator — the
Spark side runs the union+sort formulation from ``operators/temporal.py``
(one exchange, no per-key quadratic work), and both must agree row-for-row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from web_analytics_on_aws_spark.operators.temporal import asof_join, range_count_join
from web_analytics_on_aws_spark.plans import query
from web_analytics_on_aws_spark.sources.tables import load_table

HOUR_US = 3_600 * 1_000_000


@query(
    "asof_purchase_attribution",
    oracle="""
    WITH views AS (
      SELECT user_id, ts, MAX(event_id) AS view_event_id
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, v.view_event_id,
           CASE WHEN v.ts IS NULL THEN NULL
                ELSE epoch_us(p.ts) - epoch_us(v.ts) END AS gap_us
    FROM purchases p
    ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase joined as-of to the user's
    latest prior (or simultaneous) view. The right side is pre-aggregated to
    one row per (user_id, ts) — max event_id as the deterministic
    representative — so sort ties can't change the carried payload."""
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
        .withColumn("view_ts", F.col("ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload=["view_event_id", "view_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "view_event_id",
        (F.unix_micros("ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )


@query(
    "range_views_before_purchase",
    oracle="""
    SELECT p.event_id, p.user_id, COUNT(v.ts) AS views_1h
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      ON v.user_id = p.user_id
     AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
    GROUP BY p.event_id, p.user_id
    """,
)
def views_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-band range join: views in the hour before each purchase.
    The naive inequality join (DuckDB side) is O(|p|·|v|) per user; the
    Spark side buckets views by hour and explodes each purchase into its two
    overlapping buckets — an equi hash join plus residual filter."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    counted = range_count_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        window_micros=HOUR_US,
        count_alias="views_1h",
    )
    return counted.select("event_id", "user_id", "views_1h")
