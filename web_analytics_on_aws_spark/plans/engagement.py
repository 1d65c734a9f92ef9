"""Engagement-metric registrations: rolling DAU/WAU/MAU and session path
mining — the product-analytics queries a web-log warehouse answers daily
(reference query surface: Athena over the event table, SURVEY §3.3; these
are the canonical rollups that workload runs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from web_analytics_on_aws_spark.plans import query
from web_analytics_on_aws_spark.plans.weblog import SESSION_GAP_SECONDS
from web_analytics_on_aws_spark.sources.tables import load_table


@query(
    "events_rolling_active_users",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), days AS (
      SELECT DISTINCT d FROM daily
    ), expanded AS (
      SELECT daily.d + CAST(off AS INT) AS day, user_id, off
      FROM daily, (SELECT UNNEST(range(0, 28)) AS off)
    ), counts AS (
      SELECT day,
             COUNT(DISTINCT CASE WHEN off = 0 THEN user_id END) AS dau,
             COUNT(DISTINCT CASE WHEN off <= 6 THEN user_id END) AS wau_7d,
             COUNT(DISTINCT user_id) AS mau_28d
      FROM expanded GROUP BY day
    )
    SELECT days.d AS day, dau, wau_7d, mau_28d
    FROM counts JOIN days ON days.d = counts.day
    """,
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling DAU / 7-day WAU / 28-day MAU per calendar day, exact.

    Scale shape: events reduce FIRST to distinct (day, user) rows — the
    only pass over the raw log — then each user-day fans out to the ≤28
    target days it supports (a bounded 28× expansion of the already-tiny
    user-day set, the standard trick that turns sliding distinct-count
    windows into one partial-agg groupBy). Rows for days beyond the data's
    range are dropped by the join back to observed days. Never a
    per-day rescan of the corpus, never an expanding distinct state."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    expanded = daily.select(
        "d", "user_id", F.explode(F.sequence(F.lit(0), F.lit(27))).alias("off")
    ).select(
        F.date_add(F.col("d"), F.col("off")).alias("day"), "user_id", "off"
    )
    counts = expanded.groupBy("day").agg(
        F.count_distinct(
            F.when(F.col("off") == 0, F.col("user_id"))
        ).alias("dau"),
        F.count_distinct(
            F.when(F.col("off") <= 6, F.col("user_id"))
        ).alias("wau_7d"),
        F.count_distinct("user_id").alias("mau_28d"),
    )
    days = daily.select(F.col("d").alias("day")).distinct()
    return counts.join(days, "day").select("day", "dau", "wau_7d", "mau_28d")


@query(
    "events_session_path_trigrams",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR date_diff('second', LAG(ts) OVER w, ts)
                          > {SESSION_GAP_SECONDS}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_seq
      FROM flagged
    ), tri AS (
      SELECT event_type || '>' || LEAD(event_type, 1) OVER w2
               || '>' || LEAD(event_type, 2) OVER w2 AS path,
             LEAD(event_type, 2) OVER w2 AS third
      FROM sessions
      WINDOW w2 AS (PARTITION BY user_id, sess_seq ORDER BY ts, event_id)
    ), counted AS (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tri WHERE third IS NOT NULL GROUP BY path
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, path) AS INT) AS rank,
           path, cnt
    FROM counted ORDER BY rank LIMIT 10
    """,
)
def session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 behavior paths: 3-step event-type sequences within 30-min
    sessions (the flow/path-analysis primitive). The gaps-and-islands
    sessionization and the trigram LEADs share one (user) shuffle; the
    path census is a map-side-combined count over ≤ |types|³ keys, and the
    top-10 is a window over that tiny aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
                > SESSION_GAP_SECONDS
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_sess"),
    )
    sessions = flagged.withColumn(
        "sess_seq",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    w2 = Window.partitionBy("user_id", "sess_seq").orderBy("ts", "event_id")
    tri = sessions.select(
        F.concat_ws(
            ">",
            "event_type",
            F.lead("event_type", 1).over(w2),
            F.lead("event_type", 2).over(w2),
        ).alias("path"),
        F.lead("event_type", 2).over(w2).alias("third"),
    ).filter(F.col("third").isNotNull())
    counted = tri.groupBy("path").agg(F.count("*").cast("bigint").alias("cnt"))
    wr = Window.orderBy(F.desc("cnt"), F.asc("path"))
    return (
        counted.withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= 10)
        .select("rank", "path", "cnt")
    )
