"""Event-time window plans — the Spark-native analytics extension beyond the
reference's arrival-time-only model (SURVEY §2.7 notes the reference has *no*
event-time windows; §7.5 mandates adding tumbling/sliding/session windows).

These use Spark's native window operators (``F.window``, ``F.session_window``)
— the same operators that run stateful in Structured Streaming with
watermarks (streaming/windowed.py) — evaluated here in batch mode so the
DuckDB oracle can check them exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from web_analytics_on_aws_spark.functions import dec_sum
from web_analytics_on_aws_spark.plans import query
from web_analytics_on_aws_spark.sources.tables import load_table


@query(
    "weblog_tumbling_window_1h",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
)
def tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window via the native window() operator
    (window.start == date_trunc('hour') for epoch-aligned windows)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("cnt"), dec_sum("value").alias("total_value"))
        .select(F.col("window.start").alias("window_start"), "cnt", "total_value")
    )


@query(
    "weblog_sliding_window_1h_30m",
    oracle="""
    SELECT to_timestamp((floor(epoch(ts))::BIGINT // 1800 - k.k) * 1800)
             AT TIME ZONE 'UTC' AS window_start,
           COUNT(*) AS cnt,
           COUNT(DISTINCT user_id) AS uniq_users
    FROM events, (SELECT unnest(range(0, 2)) AS k) k
    GROUP BY 1
    """,
)
def sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window every 30 minutes: each event belongs to
    3600/1800 = 2 windows. The oracle reproduces the window-assignment
    arithmetic (starts at slide-aligned epochs covering the event)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("cnt"), F.countDistinct("user_id").alias("uniq_users"))
        .select(F.col("window.start").alias("window_start"), "cnt", "uniq_users")
    )


@query(
    "weblog_session_window_30m",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                   OR date_diff('microsecond', LAG(ts) OVER w, ts)
                      >= 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS seq
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           date_diff('second', MIN(ts), MAX(ts)) AS dur_sec
    FROM sess GROUP BY user_id, seq
    """,
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (30-min gap): one row per (user, session) with
    start/size — the operator that runs stateful under Structured Streaming.

    Session-window semantics: a gap of exactly 30:00 starts a NEW session
    (window closes at last_ts + gap, exclusive), hence `>= 1800s` in the
    gaps-and-islands oracle — compared at MICROSECOND precision: a
    second-granular date_diff truncates a 1799.3 s gap up to 1800 and
    wrongly splits the session (bit at sf0.1, where sub-second timestamp
    collisions with ~30-min gaps exist).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
                "dur_sec"
            ),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "dur_sec",
        )
    )


@query(
    "window_top3_orders_with_ties",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(RANK() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC) AS INT) AS rnk
      FROM orders
    )
    WHERE rnk <= 3
    """,
)
def top3_orders_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK() variant of the per-customer top-3: ties share a rank and ALL
    tied rows survive the cut (row_number's arbitrary tiebreak is the other
    registered query — keeping both pins the semantic difference). Same
    single-shuffle window plan."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "orders_rolling3_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS avg3
    FROM orders
    """,
)
def orders_rolling3_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame trailing average (last 3 orders per customer) — the
    count-based sibling of the RANGE-frame 7-day window
    (`events_7day_moving_revenue`); decimal-cast input keeps the windowed
    AVG bit-identical across engines. One shuffle on the partition key."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.avg(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"),
            6,
        ).alias("avg3"),
    )
