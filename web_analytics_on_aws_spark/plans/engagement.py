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
    # drop NULL users up front: the oracle's COUNT(DISTINCT user_id)
    # ignores NULLs, and the plain-count rewrite below would otherwise
    # count a (day, NULL) row as an active user
    # daily feeds the 28× fan-out AND the observed-days join-back:
    # materialize the user-day reduction once (r12 — two consumers re-ran
    # the raw-log scan + distinct; the user-day set is tiny next to it)
    daily = (
        ev.filter(F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
        .localCheckpoint()
    )
    expanded = daily.select(
        "d", "user_id", F.explode(F.sequence(F.lit(0), F.lit(27))).alias("off")
    ).select(
        F.date_add(F.col("d"), F.col("off")).alias("day"), "user_id", "off"
    )
    # reduce to one row per (day, user) carrying the smallest supporting
    # offset FIRST — the dau/wau/mau tallies then need only plain counts
    # (min_off == 0 ⇔ active that day, ≤ 6 ⇔ active in the last week),
    # instead of three COUNT(DISTINCT)s each expanding the fan-out 3×
    per_user = expanded.groupBy("day", "user_id").agg(
        F.min("off").alias("mo")
    )
    counts = per_user.groupBy("day").agg(
        F.sum(F.when(F.col("mo") == 0, 1).otherwise(0)).alias("dau"),
        F.sum(F.when(F.col("mo") <= 6, 1).otherwise(0)).alias("wau_7d"),
        F.count("*").alias("mau_28d"),
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


@query(
    "events_hourly_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY date_trunc('hour', ts)
    ), scored AS (
      SELECT hr, cnt,
             AVG(cnt) OVER w AS mu,
             STDDEV_SAMP(cnt) OVER w AS sd
      FROM hourly
      WINDOW w AS (ORDER BY hr ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT hr, cnt,
           ROUND(mu, 6) AS trailing_mean,
           ROUND((cnt - mu) / sd, 6) AS zscore,
           (ABS(ROUND((cnt - mu) / sd, 6)) >= 2.0) AS is_anomaly
    FROM scored WHERE sd IS NOT NULL AND sd > 0
    """,
)
def hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational anomaly detection on the event stream: hourly counts
    z-scored against the trailing 24-hour window (mean/sample-stddev over
    a ROWS frame that excludes the current hour). The raw log reduces to
    |hours| rows first — the window runs over the tiny hourly series, so
    the detector costs one partial-agg shuffle regardless of event
    volume."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    w = Window.orderBy("hr").rowsBetween(-24, -1)
    scored = hourly.select(
        "hr",
        "cnt",
        F.avg("cnt").over(w).alias("mu"),
        F.stddev_samp("cnt").over(w).alias("sd"),
    )
    z = (F.col("cnt") - F.col("mu")) / F.col("sd")
    return scored.filter(F.col("sd").isNotNull() & (F.col("sd") > 0)).select(
        "hr",
        "cnt",
        F.round("mu", 6).alias("trailing_mean"),
        F.round(z, 6).alias("zscore"),
        (F.abs(F.round(z, 6)) >= 2.0).alias("is_anomaly"),
    )


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    ), converting AS (
      SELECT date_diff('second', first_view, first_purchase) / 60.0 AS minutes
      FROM per_user
      WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase > first_view
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converting,
           ROUND(quantile_cont(minutes, 0.50), 6) AS p50_minutes,
           ROUND(quantile_cont(minutes, 0.90), 6) AS p90_minutes
    FROM converting
    """,
)
def time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: per user, minutes from first view
    to first purchase (conditional MINs — one reduce over the log), exact
    interpolated p50/p90 over the converting-user series. The percentile
    sorts |converting users| values, not events."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    minutes = (
        F.col("first_purchase").cast("long") - F.col("first_view").cast("long")
    ) / F.lit(60.0)
    conv = per_user.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") > F.col("first_view"))
    ).select(minutes.alias("minutes"))
    return conv.agg(
        F.count("*").cast("bigint").alias("n_converting"),
        F.round(F.percentile("minutes", 0.50), 6).alias("p50_minutes"),
        F.round(F.percentile("minutes", 0.90), 6).alias("p90_minutes"),
    )


# Shared attribution base (purchases × prior-7-day same-user touches) —
# one definition for every attribution model's oracle; floor(epoch)
# matches Spark's flooring timestamp→long cast.
#
# Skew guard (VERDICT r3 #3): per-user touch history is capped at the most
# recent _TOUCH_CAP touches BEFORE the credit join — a bot/whale key with
# 10^5 touches would otherwise fan out touches × purchases inside one
# task. Human users never approach the cap, so headline results are
# unchanged; the cap is deterministic (ordered by (tl, touch_id) desc) so
# both engines drop the same rows. Documented model semantics.
_TOUCH_CAP = 1000

_ATTRIB_CTES = f"""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS pl, value
      FROM events WHERE event_type = 'purchase'
    ), t0 AS (
      SELECT event_id AS touch_id, user_id, event_type AS channel,
             CAST(floor(epoch(ts)) AS BIGINT) AS tl
      FROM events WHERE event_type IN ('view', 'click', 'cart')
    ), t AS (
      SELECT touch_id, user_id, channel, tl FROM (
        SELECT t0.*, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY tl DESC, touch_id DESC) AS __tr
        FROM t0
      ) WHERE __tr <= {_TOUCH_CAP}
    ), j AS (
      SELECT p.purchase_id, p.value, t.touch_id, t.channel, t.tl,
             (p.pl - t.tl) AS dt
      FROM p JOIN t USING (user_id)
      WHERE p.pl - t.tl BETWEEN 1 AND 604800
    )
"""


def _capped_touches(ev: DataFrame) -> DataFrame:
    """view/click/cart touches, per-user history capped at the latest
    _TOUCH_CAP rows (see _ATTRIB_CTES skew-guard note): one window pass
    bounds the whale-key credit-join fanout at touches≤cap × purchases
    instead of unbounded."""
    t = ev.filter(F.col("event_type").isin("view", "click", "cart")).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        F.col("event_type").alias("channel"),
        F.col("ts").cast("long").alias("tl"),
    )
    wu = Window.partitionBy("user_id").orderBy(
        F.col("tl").desc(), F.col("touch_id").desc()
    )
    return (
        t.withColumn("__tr", F.row_number().over(wu))
        .filter(F.col("__tr") <= _TOUCH_CAP)
        .drop("__tr")
    )


@query(
    "events_attribution_multitouch",
    oracle=_ATTRIB_CTES + """
    , per_p AS (
      -- decimal-exact sums: float addition is order-dependent and the two
      -- engines aggregate in different orders; casting each addend to a
      -- fixed-scale decimal makes every SUM exact and order-free
      SELECT purchase_id, COUNT(*) AS n,
             CAST(SUM(CAST(POWER(0.5, dt / 86400.0) AS DECIMAL(30,15)))
                  AS DOUBLE) AS wsum
      FROM j GROUP BY purchase_id
    ), credits AS (
      SELECT j.channel,
             j.value / per_p.n AS lin,
             j.value * POWER(0.5, j.dt / 86400.0) / per_p.wsum AS dec
      FROM j JOIN per_p USING (purchase_id)
    ), touched AS (
      SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_credits,
             ROUND(CAST(SUM(CAST(lin AS DECIMAL(30,12))) AS DOUBLE), 4)
               AS linear_revenue,
             ROUND(CAST(SUM(CAST(dec AS DECIMAL(30,12))) AS DOUBLE), 4)
               AS decay_revenue
      FROM credits GROUP BY channel
    ), direct AS (
      -- same decimal-cast accumulation as the touched channels: raw
      -- double sums are order-dependent and can drift past the 4-dp
      -- rounding at larger SFs (ADVICE r3)
      SELECT 'direct' AS channel,
             CAST(COUNT(*) AS BIGINT) AS n_credits,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE), 4)
               AS linear_revenue,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE), 4)
               AS decay_revenue
      FROM p WHERE purchase_id NOT IN (SELECT purchase_id FROM j)
    )
    SELECT * FROM touched UNION ALL SELECT * FROM direct
    """,
)
def attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch revenue attribution, linear AND time-decay in ONE
    credit pass: every purchase's value is split across its same-user
    view/click/cart touchpoints of the prior 7 days — equally (linear) and
    by 1-day-half-life weights 0.5^(Δt/86400) (time-decay); untouched
    purchases credit a 'direct' channel in full. The join is user-keyed
    (equi) with the range as a post-filter — per-user touch lists bound
    the fanout, never a cross join; one (purchase) reduce for the
    normalizers, one channel rollup. Integer-second deltas feed POWER
    identically on both engines; revenue sums rounded to 4."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").cast("long").alias("pl"),
        "value",
    )
    t = _capped_touches(ev)
    j = (
        p.join(t, "user_id")
        .withColumn("dt", F.col("pl") - F.col("tl"))
        .filter((F.col("dt") >= 1) & (F.col("dt") <= 604800))
        .select("purchase_id", "value", "channel", "dt")
    )
    w = F.pow(F.lit(0.5), F.col("dt") / F.lit(86400.0))
    # decimal-exact sums (see oracle comment): order-free across engines
    per_p = j.groupBy("purchase_id").agg(
        F.count("*").alias("n"),
        F.sum(w.cast("decimal(30,15)")).cast("double").alias("wsum"),
    )
    credits = j.join(per_p, "purchase_id").select(
        "channel",
        (F.col("value") / F.col("n")).alias("lin"),
        (F.col("value") * w / F.col("wsum")).alias("dec"),
    )
    touched = credits.groupBy("channel").agg(
        F.count("*").cast("bigint").alias("n_credits"),
        F.round(
            F.sum(F.col("lin").cast("decimal(30,12)")).cast("double"), 4
        ).alias("linear_revenue"),
        F.round(
            F.sum(F.col("dec").cast("decimal(30,12)")).cast("double"), 4
        ).alias("decay_revenue"),
    )
    direct = (
        p.join(j.select("purchase_id").distinct(), "purchase_id", "left_anti")
        .agg(
            F.count("*").cast("bigint").alias("n_credits"),
            F.round(
                F.sum(F.col("value").cast("decimal(30,12)")).cast("double"), 4
            ).alias("linear_revenue"),
            F.round(
                F.sum(F.col("value").cast("decimal(30,12)")).cast("double"), 4
            ).alias("decay_revenue"),
        )
        .select(
            F.lit("direct").alias("channel"),
            "n_credits",
            "linear_revenue",
            "decay_revenue",
        )
    )
    return touched.unionByName(direct)


@query(
    "events_attribution_ushape",
    oracle=_ATTRIB_CTES + """
    , ranked AS (
      SELECT purchase_id, value, channel,
             ROW_NUMBER() OVER (PARTITION BY purchase_id
               ORDER BY tl, touch_id) AS r,
             COUNT(*) OVER (PARTITION BY purchase_id) AS n
      FROM j
    ), credits AS (
      SELECT channel,
             value * CASE
               WHEN n = 1 THEN 1.0
               WHEN n = 2 THEN 0.5
               WHEN r = 1 OR r = n THEN 0.4
               ELSE 0.2 / (n - 2)
             END AS cr
      FROM ranked
    )
    SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_credits,
           ROUND(CAST(SUM(CAST(cr AS DECIMAL(30,12))) AS DOUBLE), 4)
             AS ushape_revenue
    FROM credits GROUP BY channel
    """,
)
def attribution_ushape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) attribution: 40% of each purchase's value
    to the FIRST touch, 40% to the LAST, the middle 20% split across the
    in-between touches (single touch → 100%, two → 50/50) — the third
    standard model next to linear/time-decay. Touch order is totaled by
    (time, touch id) so rank assignment is engine-independent; credits
    are exact rationals over integers and sum through decimals. Same
    user-keyed credit join as events_attribution_multitouch."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").cast("long").alias("pl"),
        "value",
    )
    t = _capped_touches(ev)
    j = (
        p.join(t, "user_id")
        .withColumn("dt", F.col("pl") - F.col("tl"))
        .filter((F.col("dt") >= 1) & (F.col("dt") <= 604800))
        .select("purchase_id", "value", "touch_id", "channel", "tl")
    )
    wp = Window.partitionBy("purchase_id")
    ranked = j.withColumn(
        "r", F.row_number().over(wp.orderBy("tl", "touch_id"))
    ).withColumn("n", F.count("*").over(wp))
    credit = F.col("value") * (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("r") == 1) | (F.col("r") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    return (
        ranked.select("channel", credit.alias("cr"))
        .groupBy("channel")
        .agg(
            F.count("*").cast("bigint").alias("n_credits"),
            F.round(
                F.sum(F.col("cr").cast("decimal(30,12)")).cast("double"), 4
            ).alias("ushape_revenue"),
        )
    )
