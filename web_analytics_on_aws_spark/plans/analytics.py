"""Product-analytics extension plans over the ``events`` stream table.

The reference's declared workload stops at COUNT(*) (SURVEY §2.4) but its
*purpose* is web analytics — these are the queries its users run on the same
data via Athena (funnels, retention, activity heatmaps, distributions). Each
is a single-pass declarative plan: one shuffle on the grouping key, partial
aggregation map-side, no driver-side iteration.

Scale notes (100 TB): funnel and retention both reduce events → per-user
rows first (the 150-user test cardinality is billions in production — still
a plain hash aggregate keyed by user_id, AQE-coalesced); the pivot emits a
fixed 5-column conditional aggregate (no wide-pivot explosion); the word
explode is a generator → aggregate pipeline whose intermediate never
materializes on the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from web_analytics_on_aws_spark.plans import query
from web_analytics_on_aws_spark.sources.tables import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
        MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS total_users,
      CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS step1_view,
      CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
               THEN 1 ELSE 0 END) AS BIGINT) AS step2_click,
      CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                AND t_purchase > t_click
               THEN 1 ELSE 0 END) AS BIGINT) AS step3_purchase
    FROM per_user
    """,
)
def funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (first-occurrence ordering: first view →
    later first click → later first purchase). One aggregate builds a
    per-user step-timestamp row; a second counts survivors per step — no
    self-joins, so the plan is two hash aggregates regardless of data size."""
    ev = load_table(spark, sf_dir, "events")
    first_of = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))
    per_user = ev.groupBy("user_id").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    as_cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))
    return per_user.agg(
        F.count("*").alias("total_users"),
        as_cnt(s1).alias("step1_view"),
        as_cnt(s2).alias("step2_click"),
        as_cnt(s3).alias("step3_purchase"),
    )


@query(
    "retention_daily_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
      FROM events GROUP BY user_id
    )
    SELECT cohort_date,
           CAST(date_diff('day', cohort_date, CAST(ts AS DATE)) AS INT)
             AS day_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY cohort_date, day_offset
    """,
)
def retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: cohort = first-activity date, cell =
    distinct users active N days later. The first-seen aggregate broadcasts
    (|users| ≪ |events| after reduction; at true scale it shuffle-joins on
    user_id, the same key as the aggregate — one co-partitioned exchange)."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_date")
    )
    return (
        ev.join(first_seen, "user_id")
        .groupBy(
            "cohort_date",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_date"))
            .cast("int")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "events_daily_type_pivot",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
      CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
        AS click,
      CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
        AS error,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        AS purchase,
      CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)
        AS signup,
      CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
        AS view
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
)
def daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day × event-type matrix via ``pivot`` with an explicit value list —
    explicit values keep the plan a single-pass conditional aggregate (no
    extra distinct-values job, schema fixed at plan time)."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves null (not 0) for absent combos — normalize like the CASE sums
    return out.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES]
    )


@query(
    "events_dow_hour_heatmap",
    oracle="""
    SELECT CAST(isodow(ts) AS INT) AS dow, CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
           COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS uniq_users
    FROM events GROUP BY dow, hod
    """,
)
def dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap on ISO weekday (1=Mon..7=Sun; Spark's ``weekday`` is
    0-based Monday, DuckDB's ``isodow`` 1-based — the +1 aligns them) ×
    hour-of-day: 168 groups, pure map-side combine."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.weekday("ts") + F.lit(1)).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hod"),
        )
        .agg(
            F.count("*").alias("cnt"),
            F.countDistinct("user_id").alias("uniq_users"),
        )
    )


@query(
    "events_value_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.50) AS p50,
           quantile_cont(value, 0.75) AS p75,
           quantile_cont(value, 0.95) AS p95
    FROM events GROUP BY event_type
    """,
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per event type (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``). Exact percentile sorts
    within-group — fine for low-cardinality grouping; the streaming-scale
    variant is ``weblog_daily_uniques_approx``-style approx_percentile."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("p25"),
        F.percentile("value", 0.50).alias("p50"),
        F.percentile("value", 0.75).alias("p75"),
        F.percentile("value", 0.95).alias("p95"),
    )


@query(
    "doc_word_explode_top50",
    oracle="""
    SELECT word, COUNT(*) AS cnt
    FROM (
      SELECT unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ) words
    WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 50
    """,
)
def word_explode_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral word explode → top-50: generator (explode) feeding a hash
    aggregate, deterministic (cnt, word) tiebreak. The explode multiplies
    rows ~|tokens| but stays pipelined inside the stage — no materialized
    blow-up; the aggregate output is |vocab|, tiny."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(50)
    )


@query(
    "cube_orders_status_priority",
    oracle="""
    SELECT CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
           o_orderstatus, o_orderpriority, COUNT(*) AS cnt
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with GROUPING() markers — all four grouping-set combinations in
    one pass (Catalyst plans an Expand + single aggregate, not four scans)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.count("*").alias("cnt"),
    ).select("g_status", "g_prio", "o_orderstatus", "o_orderpriority", "cnt")


@query(
    "events_type_unpivot",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS cnt
    FROM events GROUP BY CAST(ts AS DATE), event_type
    """,
)
def type_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trips the pivot: wide day × type matrix back to long form via
    ``unpivot`` (relational UNPIVOT/MELT); zero-filled cells dropped so the
    result is exactly the long-form aggregate."""
    wide = daily_pivot(spark, sf_dir)
    return (
        wide.unpivot(["day"], EVENT_TYPES, "event_type", "cnt")
        .filter(F.col("cnt") > 0)
    )


@query(
    "text_pii_redaction",
    oracle=r"""
    WITH synth AS (
      SELECT doc_id,
             'reach user' || CAST(doc_id AS VARCHAR)
               || '@mail.com or +1 555-123-4567 re: ' || text AS raw
      FROM documents
    ), red AS (
      SELECT raw,
             regexp_replace(
               regexp_replace(
                 regexp_replace(raw,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]'),
                 '\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3,4}[- .]?[0-9]{0,4}',
                 '[PHONE]'),
               '[0-9]{7,}', '[NUM]') AS redacted
      FROM synth
    )
    SELECT COUNT(*) AS docs,
      CAST(SUM(CASE WHEN raw LIKE '%@%' THEN 1 ELSE 0 END) AS BIGINT)
        AS had_email,
      CAST(SUM(CASE WHEN redacted LIKE '%@%' THEN 1 ELSE 0 END) AS BIGINT)
        AS leaked_email,
      CAST(SUM(CASE WHEN redacted LIKE '%[EMAIL]%' THEN 1 ELSE 0 END) AS BIGINT)
        AS masked_email,
      CAST(SUM(CASE WHEN redacted LIKE '%[PHONE]%' THEN 1 ELSE 0 END) AS BIGINT)
        AS masked_phone,
      CAST(SUM(length(raw) - length(redacted)) AS BIGINT) AS chars_removed
    FROM red
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit: synthesize an email+phone prefix onto every real
    document (both engines build the identical input), run the shared
    redaction chain, and assert-by-aggregate that nothing leaks. The chain
    is `operators.text.redact_pii` — pure regexp_replace, codegen-friendly."""
    from web_analytics_on_aws_spark.operators.text import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    synth = docs.select(
        F.concat(
            F.lit("reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.com or +1 555-123-4567 re: "),
            F.col("text"),
        ).alias("raw")
    )
    red = synth.withColumn("redacted", redact_pii("raw"))
    flag = lambda c, pat: F.sum(F.when(c.contains(pat), 1).otherwise(0))
    return red.agg(
        F.count("*").alias("docs"),
        flag(F.col("raw"), "@").alias("had_email"),
        flag(F.col("redacted"), "@").alias("leaked_email"),
        flag(F.col("redacted"), "[EMAIL]").alias("masked_email"),
        flag(F.col("redacted"), "[PHONE]").alias("masked_phone"),
        F.sum(F.length("raw") - F.length("redacted"))
        .cast("bigint")
        .alias("chars_removed"),
    )


@query(
    "events_7day_moving_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,2))) AS rev,
             COUNT(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY CAST(ts AS DATE)
    )
    SELECT day, CAST(rev AS DOUBLE) AS day_revenue,
           CAST(SUM(rev) OVER w AS DOUBLE) AS rev_7d,
           CAST(SUM(n) OVER w AS BIGINT) AS cnt_7d
    FROM daily
    WINDOW w AS (ORDER BY date_diff('day', DATE '1970-01-01', day)
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def moving_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day revenue: RANGE frame keyed on days-since-epoch so
    calendar gaps are respected (a ROWS frame would silently span gaps).
    Exact decimal sums inside the frame; doubles only at the edge. The
    window is global but over the DAILY grain (≤ a few thousand rows after
    the aggregate, whatever the event count) — safe at any scale."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("rev"),
            F.count("*").alias("n"),
        )
    )
    from pyspark.sql import Window as W

    w = (
        W.orderBy(F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "day",
        F.col("rev").cast("double").alias("day_revenue"),
        F.sum("rev").over(w).cast("double").alias("rev_7d"),
        F.sum("n").over(w).alias("cnt_7d"),
    )


@query(
    "orders_price_deciles",
    oracle="""
    SELECT decile, COUNT(*) AS cnt,
           CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi
    FROM (
      SELECT o_totalprice,
             CAST(NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS INT)
               AS decile
      FROM orders
    ) t
    GROUP BY decile
    """,
)
def price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile boundaries over a deterministic total order
    (price, key) — the histogram-equi-depth shape. Global-order window: at
    100 TB swap for approx_percentile boundaries or range-partitioned
    two-pass ranking; kept exact here for the oracle."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.orderBy(F.col("o_totalprice"), F.col("o_orderkey"))
    return (
        orders.select(
            "o_totalprice", F.ntile(10).over(w).cast("int").alias("decile")
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("cnt"),
            F.min(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("lo"),
            F.max(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("hi"),
        )
    )


@query(
    "customer_first_last_order",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER w AS last_order,
           CAST(date_diff('day',
                FIRST_VALUE(o_orderdate) OVER w,
                LAST_VALUE(o_orderdate)  OVER w) AS INT) AS active_days
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE over an explicit unbounded frame (the default
    frame stops at CURRENT ROW — the classic last_value trap) with a
    deterministic (date, key) order."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        orders.select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
            F.datediff(
                F.last("o_orderdate").over(w), F.first("o_orderdate").over(w)
            )
            .cast("int")
            .alias("active_days"),
        )
        .distinct()
    )


_SQL_SURFACE_STMT = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS cnt
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


@query("sql_surface_passthrough", oracle=_SQL_SURFACE_STMT)
def sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's interactive-SQL entry point (SURVEY §3.3): the user
    hands the engine a SQL *string* over cataloged tables. Identical text
    runs on Spark (session-catalog views ≅ Glue catalog) and DuckDB —
    proving the raw SQL surface, not just the DataFrame API."""
    from web_analytics_on_aws_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_SURFACE_STMT)


@query(
    "event_type_transitions",
    oracle="""
    SELECT prev_type, event_type AS next_type, COUNT(*) AS cnt
    FROM (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ) t
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavior transitions (the Markov matrix behind path/flow
    diagrams): lag over each user's deterministic (ts, event_id) timeline,
    then count (from → to) pairs. One shuffle on user_id; 25 output rows
    regardless of event volume."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "incremental_daily_rollup",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
)
def incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: the base rollup (history before a
    mid-day cutoff) is merged with a delta rollup (rows after it) by
    key-wise reduce — never re-scanning history. The cutoff falls mid-day
    so the boundary day's groups exist on BOTH sides and the merge is
    actually exercised; the oracle recomputes flat from all rows, proving
    merged ≡ recomputed bit-for-bit."""
    from web_analytics_on_aws_spark.operators.incremental import (
        daily_event_rollup,
        merge_rollups,
    )

    ev = load_table(spark, sf_dir, "events")
    cutoff = "2024-01-21 12:00:00"
    base = daily_event_rollup(ev.filter(F.col("ts") < cutoff))
    delta = daily_event_rollup(ev.filter(F.col("ts") >= cutoff))
    merged = merge_rollups(
        base,
        delta,
        ["day", "event_type"],
        {"n_events": "sum", "sum_value": "sum", "max_value": "max"},
    )
    return merged.withColumn("sum_value", F.col("sum_value").cast("double"))


@query(
    "events_value_histogram",
    oracle="""
    SELECT CASE WHEN value < 0 THEN CAST(0 AS BIGINT)
                WHEN value >= 500 THEN CAST(21 AS BIGINT)
                ELSE CAST(FLOOR((value - 0) * 20 / (500 - 0)) AS BIGINT) + 1
           END AS bucket,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS bucket_sum
    FROM events
    GROUP BY 1
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via SQL-standard width_bucket — one partial-agg
    pass, 20ish groups out regardless of input size (the fixed-bounds
    companion to the NTILE equi-depth deciles). DuckDB has no width_bucket;
    the oracle replicates Spark's full semantics — floor((v−lo)·n/(hi−lo))+1
    in range, 0 below, n+1 at-or-above the upper bound (the overflow
    clamp only bites at sf≥0.1, where values exceed 500)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.width_bucket("value", F.lit(0), F.lit(500), F.lit(20)).alias("bucket")
    ).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("bucket_sum"),
    )


@query(
    "events_value_trend",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE)
             AS slope_num,
           CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT) AS slope_den
    FROM (SELECT event_type,
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
                 CAST(value AS DECIMAL(18,2)) AS y
          FROM events)
    GROUP BY event_type
    """,
)
def events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend (is `value` drifting over the month?) via exact
    decimal moments: emit the slope's numerator n·Σxy − Σx·Σy and
    denominator n·Σx² − (Σx)² instead of their float quotient, so the
    result is bit-exact across engines (divide at the consumer). One
    partial-agg pass — the distributed equivalent of regr_slope."""
    ev = load_table(spark, sf_dir, "events")
    xy = ev.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("x"),
        F.col("value").cast("decimal(18,2)").alias("y"),
    )
    agg = xy.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return agg.select(
        "event_type",
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        .alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("bigint")
        .alias("slope_den"),
    )


@query(
    "sql_udf_surface",
    oracle=r"""
    SELECT doc_id,
           len(string_split_regex(trim(text), ' +')) AS n_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
             AS n_bpe,
           length(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3,4}[- .]?[0-9]{0,4}',
               '[PHONE]', 'g'),
               '[0-9]{7,}', '[NUM]', 'g')) AS redacted_len
    FROM documents
    WHERE ((doc_id % 2147483648 * 2654435761) % 4294967296) / 4294967296.0 < 0.5
    """,
)
def sql_udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's scalar functions consumed purely through SQL text — a
    user at the interactive surface (SURVEY §3.3) calls token_count /
    bpe_token_count / redact_pii / hash_fraction as registered SQL
    functions (declarative `CREATE FUNCTION`, inlined by Catalyst — not
    Python UDFs). The oracle inlines the equivalent expressions."""
    from web_analytics_on_aws_spark.functions.sql_udfs import register_sql_functions
    from web_analytics_on_aws_spark.sources.tables import register_views

    register_sql_functions(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT doc_id,
               token_count(text) AS n_tokens,
               bpe_token_count(text) AS n_bpe,
               length(redact_pii(text)) AS redacted_len
        FROM documents
        WHERE hash_fraction(doc_id) < 0.5
        """
    )


@query(
    "events_hourly_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT event_type, date_trunc('hour', MIN(ts)) AS mn,
             date_trunc('hour', MAX(ts)) AS mx
      FROM events GROUP BY event_type
    ),
    cal AS (
      SELECT event_type, UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
      FROM bounds
    ),
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS cnt,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value)
               AS avg_v
      FROM events GROUP BY 1, 2
    )
    SELECT c.event_type, c.hr, COALESCE(h.cnt, 0) AS events_cnt,
           h.cnt IS NULL AS is_gap,
           last_value(h.avg_v IGNORE NULLS) OVER (
             PARTITION BY c.event_type ORDER BY c.hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_avg
    FROM cal c LEFT JOIN hourly h USING (event_type, hr)
    """,
)
def hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification + forward fill: generate the complete
    per-type hourly calendar (sequence/explode between each type's observed
    bounds), left-join the hourly aggregate, zero-fill counts, and carry the
    last observed hourly average across gaps (`last(…, ignorenulls)` over an
    unbounded-preceding frame).

    Scale shape: the hourly aggregate reduces events before anything else
    (map-side combine; |types × hours| ≪ |events|); the calendar is
    generated, never materialized from data (|types| rows explode to
    |types × hours|); the join and the forward-fill window share the
    event_type hash partitioning. At 100 TB the dominant cost is the one
    events aggregate — gap-filling itself is metadata-sized."""
    from web_analytics_on_aws_spark.functions import dec_avg

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count("*").alias("cnt"), dec_avg("value").alias("avg_v"))
    cal = (
        ev.groupBy("event_type")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("mn"),
            F.date_trunc("hour", F.max("ts")).alias("mx"),
        )
        .select(
            "event_type",
            F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("hr"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cal.join(hourly, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce("cnt", F.lit(0)).alias("events_cnt"),
            F.col("cnt").isNull().alias("is_gap"),
            F.last("avg_v", ignorenulls=True).over(w).alias("filled_avg"),
        )
    )


@query(
    "events_user_skew_profile",
    oracle="""
    WITH cnts AS (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt, user_id) AS i,
             COUNT(*) OVER () AS n
      FROM cnts
    )
    SELECT COUNT(*) AS distinct_keys,
           CAST(SUM(cnt) AS BIGINT) AS total_rows,
           MAX(cnt) AS max_cnt,
           ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6) AS max_share,
           ROUND(CAST(SUM(CASE WHEN i > n - 10 THEN cnt
                               ELSE 0 END) AS DOUBLE) / SUM(cnt), 6)
             AS top10_share,
           ROUND((2.0 * SUM(i * cnt) - (COUNT(*) + 1) * SUM(cnt))
                 / (COUNT(*) * SUM(cnt)), 6) AS gini
    FROM ranked
    """,
)
def user_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew profiler for choosing a join/agg strategy: distinct keys,
    hottest-key share, top-10 share, and the Gini coefficient of the
    per-key histogram — the decision inputs for broadcast vs shuffle,
    AQE skew-split, or the explicit salted operators (skew.py). All
    moments are exact integer sums over the ranked histogram (ties don't
    affect Σi·cnt — permutations within equal counts cancel); doubles
    appear only in the final three ratios, identically on both engines.

    Scale: one events aggregate (map-side combined) reduces to |keys| rows;
    the rank is a single sort of longs. Run it per candidate key column as
    a planning pass — cheaper than one bad shuffle."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    cnts = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    ranked = cnts.select(
        "cnt",
        F.row_number().over(Window.orderBy("cnt", "user_id")).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.count("*").alias("distinct_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.max("cnt").cast("double") / F.sum("cnt"), 6).alias("max_share"),
        F.round(
            F.sum(F.when(F.col("i") > F.col("n") - 10, F.col("cnt")).otherwise(0))
            .cast("double")
            / F.sum("cnt"),
            6,
        ).alias("top10_share"),
        F.round(
            (2.0 * F.sum(F.col("i") * F.col("cnt"))
             - (F.count("*") + 1) * F.sum("cnt"))
            / (F.count("*") * F.sum("cnt")),
            6,
        ).alias("gini"),
    )


@query(
    "events_value_iqr_outliers",
    oracle="""
    WITH fences AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS p25,
             quantile_cont(value, 0.75) AS p75
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN e.value < p25 - 1.5 * (p75 - p25)
                     OR e.value > p75 + 1.5 * (p75 - p25)
                    THEN 1 ELSE 0 END) AS BIGINT) AS outliers,
           ROUND(CAST(SUM(CASE WHEN e.value < p25 - 1.5 * (p75 - p25)
                                OR e.value > p75 + 1.5 * (p75 - p25)
                               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS outlier_share
    FROM events e JOIN fences f USING (event_type)
    GROUP BY e.event_type
    """,
)
def value_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence anomaly counts per event type: exact interpolated
    quartiles → 1.5·IQR fences → outlier tally. The fence table is
    |event_types| rows and broadcasts; the events side is scanned once with
    a map-side conditional count — the same two-aggregate shape as the
    funnel, no sort of the raw values beyond the within-group quartile."""
    ev = load_table(spark, sf_dir, "events")
    fences = ev.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("p25"),
        F.percentile("value", 0.75).alias("p75"),
    )
    lo = F.col("p25") - 1.5 * (F.col("p75") - F.col("p25"))
    hi = F.col("p75") + 1.5 * (F.col("p75") - F.col("p25"))
    is_out = (F.col("value") < lo) | (F.col("value") > hi)
    return (
        ev.join(F.broadcast(fences), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(is_out, 1).otherwise(0)).alias("outliers"),
            F.round(
                F.sum(F.when(is_out, 1).otherwise(0)).cast("double") / F.count("*"),
                6,
            ).alias("outlier_share"),
        )
    )


@query(
    "events_weekly_revenue_wow",
    oracle="""
    WITH weekly AS (
      SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS week_start,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, week_start, revenue,
           ROUND((revenue - lag(revenue) OVER w)
                 / lag(revenue) OVER w, 6) AS wow_change
    FROM weekly
    WINDOW w AS (PARTITION BY event_type ORDER BY week_start)
    """,
)
def weekly_revenue_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type: exact decimal weekly sums, one
    lag window on the reduced series (|types × weeks| rows — the window
    never touches raw events). First week's change is NULL by definition.
    Both engines divide the same two doubles, so the rounded ratio is
    bit-stable."""
    from pyspark.sql import Window

    from web_analytics_on_aws_spark.functions import dec_sum

    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type",
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
    ).agg(dec_sum("value").alias("revenue"))
    w = Window.partitionBy("event_type").orderBy("week_start")
    prev = F.lag("revenue").over(w)
    return weekly.select(
        "event_type",
        "week_start",
        "revenue",
        F.round((F.col("revenue") - prev) / prev, 6).alias("wow_change"),
    )


@query(
    "funnel_purchase_within_7d",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
        MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS total_users,
      CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS viewers,
      CAST(SUM(CASE WHEN t_purchase > t_view
                AND t_purchase <= t_view + INTERVAL 7 DAY
               THEN 1 ELSE 0 END) AS BIGINT) AS converted_7d,
      CAST(SUM(CASE WHEN t_purchase > t_view + INTERVAL 7 DAY
               THEN 1 ELSE 0 END) AS BIGINT) AS converted_late
    FROM per_user
    """,
)
def funnel_within_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded conversion funnel: first purchase must land within 7
    days of first view to count (the marketing-attribution variant of the
    unbounded funnel). Same two-hash-aggregate shape — the window
    constraint is a row-local interval predicate on the per-user step
    timestamps, zero extra joins or shuffles."""
    ev = load_table(spark, sf_dir, "events")
    first_of = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))
    per_user = ev.groupBy("user_id").agg(
        first_of("view").alias("t_view"),
        first_of("purchase").alias("t_purchase"),
    )
    deadline = F.col("t_view") + F.expr("INTERVAL 7 DAY")
    in_window = (F.col("t_purchase") > F.col("t_view")) & (
        F.col("t_purchase") <= deadline
    )
    late = F.col("t_purchase") > deadline
    as_cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))
    return per_user.agg(
        F.count("*").alias("total_users"),
        as_cnt(F.col("t_view").isNotNull()).alias("viewers"),
        as_cnt(in_window).alias("converted_7d"),
        as_cnt(late).alias("converted_late"),
    )


@query(
    "incremental_join_view_nations",
    oracle="""
    SELECT n.n_name AS nation,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def incremental_join_view_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance (insert-delta counting IVM): the
    orders⋈customer view is maintained from a historical base plus an
    order-date delta AND a customer-key delta (both Δ-sides exercised, plus
    the Δ⋈Δ corner), then rolled up per nation. The oracle recomputes flat
    from the full tables — maintained ≡ recomputed, the
    `incremental_daily_rollup` contract lifted to joins. Maintenance cost
    ∝ |Δ|: every Δ-join probes the big side via a broadcast of the
    micro-batch-sized delta."""
    from web_analytics_on_aws_spark.operators.incremental import maintain_join_view

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")

    o_old = orders.filter(F.col("o_orderdate") < "1997-01-01")
    o_delta = orders.filter(F.col("o_orderdate") >= "1997-01-01")
    c_old = cust.filter(F.col("c_custkey") % 10 != 0)
    c_delta = cust.filter(F.col("c_custkey") % 10 == 0)

    keyed_o = [
        d.withColumnRenamed("o_custkey", "custkey") for d in (o_old, o_delta)
    ]
    keyed_c = [
        d.withColumnRenamed("c_custkey", "custkey") for d in (c_old, c_delta)
    ]
    view_old = keyed_o[0].join(keyed_c[0], "custkey")
    maintained = maintain_join_view(
        view_old, keyed_o[0], keyed_o[1], keyed_c[0], keyed_c[1], "custkey"
    )
    return (
        maintained.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )
