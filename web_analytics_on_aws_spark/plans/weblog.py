"""Web-log analytics plans over the driver's ``events`` table.

``events`` maps onto the reference's web-log model (FIXTURES.md §5): ``ts`` ≅
``timestamp``, ``event_type`` ≅ ``event`` (the iceberg variant's partition
column, /root/reference/web-analytics-iceberg/README.md:181), ``props`` ≅
extra attributes as a JSON string. These plans reproduce the reference's
declared query workload (SURVEY §2: A1 COUNT(*), A2 validity tally, P1/P2
partition-pruned projection, D7 partition listing) and the Spark-native
analytics extensions (sessionization, daily uniques, top-k) from SURVEY §7.

Scale notes: every query is groupBy/window on DataFrames — partial aggregates
map-side, single shuffle on the grouping key. The hourly-rollup key
(y,m,d,h) is exactly the reference's hive partition layout, so on a real
deployment these scans are partition-pruned (SURVEY §1.4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from web_analytics_on_aws_spark.functions import dec_sum
from web_analytics_on_aws_spark.plans import query
from web_analytics_on_aws_spark.sources.tables import load_table

# Gap threshold for sessionization (extension operator, SURVEY §7.5).
SESSION_GAP_SECONDS = 30 * 60


@query("weblog_count", oracle="SELECT COUNT(*) AS cnt FROM events")
def weblog_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — the reference's canonical smoke query
    (athena_named_query.py:53,100)."""
    return load_table(spark, sf_dir, "events").agg(F.count("*").alias("cnt"))


@query(
    "weblog_events_by_type",
    oracle="""
    SELECT event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           COUNT(DISTINCT user_id) AS uniq_users
    FROM events GROUP BY event_type
    """,
)
def events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event rollup — the iceberg table's partition column (SURVEY §1.4)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            dec_sum("value").alias("total_value"),
            F.countDistinct("user_id").alias("uniq_users"),
        )
    )


@query(
    "weblog_hourly_partitions",
    oracle="""
    SELECT CAST(year(ts) AS INT) AS year, CAST(month(ts) AS INT) AS month,
           CAST(day(ts) AS INT) AS day, CAST(hour(ts) AS INT) AS hour,
           COUNT(*) AS cnt
    FROM events GROUP BY 1, 2, 3, 4
    """,
)
def hourly_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hive partition ledger: per-(year,month,day,hour) counts ≅
    `SHOW PARTITIONS` + per-partition counts (D7, athena_named_query.py:51)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.year("ts").cast("int").alias("year"),
        F.month("ts").cast("int").alias("month"),
        F.dayofmonth("ts").cast("int").alias("day"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(F.count("*").alias("cnt"))


@query(
    "weblog_ctas_hour",
    oracle="""
    SELECT event_id, user_id, event_type, value, ts
    FROM events
    WHERE year(ts) = 2024 AND month(ts) = 1 AND day(ts) = 15 AND hour(ts) = 12
    """,
)
def ctas_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2 — the hourly-compaction CTAS shape: explicit column projection
    plus a single-hour partition predicate (athena_ctas.py:30-38). On hive
    layout this is a partition-pruned scan reading exactly one directory."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.year("ts") == 2024)
        & (F.month("ts") == 1)
        & (F.dayofmonth("ts") == 15)
        & (F.hour("ts") == 12)
    ).select("event_id", "user_id", "event_type", "value", "ts")


@query(
    "weblog_validity_tally",
    oracle="""
    SELECT CASE WHEN ts IS NOT NULL AND user_id IS NOT NULL
                 AND event_type IN ('click','view','purchase','signup','error')
                 AND value IS NOT NULL AND value >= 0
           THEN 'Ok' ELSE 'ProcessingFailed' END AS result,
           COUNT(*) AS cnt
    FROM events GROUP BY 1
    """,
)
def validity_tally(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/A2 — per-record accept/reject split with Ok/ProcessingFailed
    result values (schema_validator.py:89-94,119-138) expressed as a single
    vectorized predicate; the full wire-format validator (strict JSON checks)
    lives in operators/validate.py."""
    ev = load_table(spark, sf_dir, "events")
    valid = (
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isin("click", "view", "purchase", "signup", "error")
        & F.col("value").isNotNull()
        & (F.col("value") >= 0)
    )
    return (
        ev.select(
            F.when(valid, F.lit("Ok")).otherwise(F.lit("ProcessingFailed")).alias("result")
        )
        .groupBy("result")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "weblog_sessionization",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                   OR date_diff('second', prev_ts, ts) > {SESSION_GAP_SECONDS}
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ), sessions AS (
      SELECT user_id, event_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_seq
      FROM flagged
    ), per_session AS (
      SELECT user_id, sess_seq, COUNT(*) AS sess_events,
             date_diff('second', MIN(ts), MAX(ts)) AS sess_dur_sec
      FROM sessions GROUP BY user_id, sess_seq
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(sess_events) AS BIGINT) AS n_events,
           CAST(MAX(sess_events) AS BIGINT) AS max_session_events,
           CAST(MAX(sess_dur_sec) AS BIGINT) AS max_session_dur_sec
    FROM per_session GROUP BY user_id
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running sum —
    the classic gaps-and-islands plan: one shuffle on user_id serves both
    window passes and the final aggregate (same partitioning reused)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
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
        "sess_seq", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_session = sessions.groupBy("user_id", "sess_seq").agg(
        F.count("*").alias("sess_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "sess_dur_sec"
        ),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum("sess_events").cast("bigint").alias("n_events"),
        F.max("sess_events").cast("bigint").alias("max_session_events"),
        F.max("sess_dur_sec").cast("bigint").alias("max_session_dur_sec"),
    )


@query(
    "weblog_top_users",
    oracle="""
    SELECT user_id, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    ORDER BY cnt DESC, user_id LIMIT 10
    """,
)
def top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with deterministic (cnt, key) tiebreak. Spark plans
    TakeOrderedAndProject — no full sort at scale."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"), dec_sum("value").alias("total_value"))
        .orderBy(F.desc("cnt"), F.asc("user_id"))
        .limit(10)
    )


@query(
    "weblog_top_users_salted",
    oracle="""
    SELECT user_id, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    ORDER BY cnt DESC, user_id LIMIT 10
    """,
)
def top_users_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof twin of weblog_top_users: two-phase salted aggregation
    (operators/skew.py). Algebraic aggregates make it EXACTLY equivalent —
    same oracle SQL as the unsalted query — while hot keys fan out over 16
    reducers in phase 1."""
    from web_analytics_on_aws_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["user_id"],
        {
            "cnt": (F.count("*"), F.sum("cnt")),
            "total_value": (
                F.sum(F.col("value").cast("decimal(18,2)")),
                F.sum("total_value").cast("double"),
            ),
        },
        salt_buckets=16,
    )
    return out.orderBy(F.desc("cnt"), F.asc("user_id")).limit(10)


@query(
    "weblog_daily_uniques",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS uniq_users,
           COUNT(*) AS cnt
    FROM events GROUP BY 1
    """,
)
def daily_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact daily uniques (count-distinct expands to a two-phase aggregate).
    The approximate variant for 100 TB (HLL sketch, no expansion) is
    `weblog_daily_uniques_approx` — not hash-comparable to an exact oracle,
    so it ships as a rows-only-checked query."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.countDistinct("user_id").alias("uniq_users"),
        F.count("*").alias("cnt"),
    )


@query(
    "weblog_daily_uniques_approx",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           COUNT(DISTINCT user_id) AS exact_uniq_users,
           TRUE AS within_tol
    FROM events GROUP BY day
    """,
)
def daily_uniques_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for uniques: approx_count_distinct (HyperLogLog++, rsd
    0.01) — one map-side sketch per partition, constant-size shuffle. The
    estimate itself isn't hash-comparable, so the gate uses the
    audit-boolean pattern (same as the sketch rollups): emit the EXACT
    per-day count plus a boolean asserting the estimate lands within 5×rsd
    — the oracle pins the exact column and the audit column both."""
    ev = load_table(spark, sf_dir, "events")
    day = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx"),
        F.countDistinct("user_id").alias("exact_uniq_users"),
    )
    tol = F.greatest(F.col("exact_uniq_users") * 0.05, F.lit(2.0))
    return day.select(
        "day",
        "exact_uniq_users",
        (F.abs(F.col("approx") - F.col("exact_uniq_users")) <= tol).alias(
            "within_tol"
        ),
    )


@query(
    "weblog_value_moments",
    oracle="""
    SELECT event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_value,
           (CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
            - (CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               * CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)) / COUNT(*))
             / (COUNT(*) - 1) AS var_value
    FROM events GROUP BY event_type
    """,
)
def value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/sample-variance computed from exact decimal Σx and Σx² — the
    portable alternative to var_samp (whose float accumulation is summation-
    order-dependent and therefore not hash-comparable across engines)."""
    ev = load_table(spark, sf_dir, "events")
    d = F.col("value").cast("decimal(18,2)")
    sum_x = F.sum(d).cast("double")
    sum_x2 = F.sum(d * d).cast("double")
    n = F.count("*")
    return ev.groupBy("event_type").agg(
        n.alias("cnt"),
        (sum_x / n).alias("mean_value"),
        ((sum_x2 - (sum_x * sum_x) / n) / (n - F.lit(1))).alias("var_value"),
    )


@query(
    "weblog_props_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
)
def props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON attribute extraction from the props payload — the engine-side
    equivalent of the validator Lambda's json.loads (schema_validator.py:115),
    kept JVM-side via get_json_object."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket")
    ).agg(F.count("*").alias("cnt"), dec_sum("value").alias("total_value"))


@query(
    "weblog_session_depth_histogram",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                   OR date_diff('second', prev_ts, ts) > {SESSION_GAP_SECONDS}
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ), sessions AS (
      SELECT user_id, event_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_seq
      FROM flagged
    ), per_session AS (
      SELECT user_id, sess_seq, COUNT(*) AS depth
      FROM sessions GROUP BY user_id, sess_seq
    )
    SELECT CAST(LEAST(depth, 10) AS INT) AS depth_bucket,
           COUNT(*) AS sessions,
           CAST(SUM(depth) AS BIGINT) AS events
    FROM per_session GROUP BY depth_bucket
    """,
)
def session_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-depth distribution (events per session, capped 10+ bucket) —
    the engagement histogram layered on the same gaps-and-islands pipeline
    as weblog_sessionization: two windows + two aggregates, ALL on the
    user_id partitioning, then a tiny |buckets| reduce."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
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
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per_session = sessions.groupBy("user_id", "sess_seq").agg(
        F.count("*").alias("depth")
    )
    return (
        per_session.groupBy(
            F.least(F.col("depth"), F.lit(10)).cast("int").alias("depth_bucket")
        )
        .agg(F.count("*").alias("sessions"), F.sum("depth").alias("events"))
    )


@query(
    "weblog_ip_network_rollup",
    oracle="""
    WITH logs AS (
      SELECT user_id,
             user_id % 256 AS o2
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT CASE WHEN o2 < 64 THEN 'zone-a'
                WHEN o2 < 128 THEN 'zone-b'
                WHEN o2 < 192 THEN 'zone-c'
                ELSE 'zone-d' END AS net,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM logs
    GROUP BY 1
    """,
)
def weblog_ip_network_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IP → network enrichment rollup (the reference record's `ip` field
    joined to a network dim): client IPs derive deterministically from
    user_id, the dim is four /10 CIDR zones, and the lookup runs through
    `enrich.enrich_ip_ranges` — a bucketized EQUI join with a residual
    BETWEEN (never a nested-loop range scan; the dim fans out to /16
    buckets, fact rows never fan out). The oracle resolves the same zones
    arithmetically — an independent path that agrees iff the CIDR math,
    bucketing, and join residual are all correct."""
    from web_analytics_on_aws_spark.operators import enrich

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    logs = ev.select(
        "user_id",
        F.concat_ws(
            ".",
            F.lit("10"),
            (F.col("user_id") % 256).cast("string"),
            ((F.col("user_id") * 7) % 256).cast("string"),
            ((F.col("user_id") * 13) % 256).cast("string"),
        ).alias("ip"),
    )
    zones = spark.createDataFrame(
        [("zone-a", "10.0.0.0/10"), ("zone-b", "10.64.0.0/10"),
         ("zone-c", "10.128.0.0/10"), ("zone-d", "10.192.0.0/10")],
        "net string, cidr string",
    )
    ranges = zones.select(
        "net", enrich.cidr_to_range("cidr").alias("r")
    ).select("net", "r.start", "r.end")
    return (
        enrich.enrich_ip_ranges(logs, ranges)
        .groupBy("net")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
