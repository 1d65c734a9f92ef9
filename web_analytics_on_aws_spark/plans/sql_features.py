"""Advanced-SQL-surface registrations: recursive CTEs and LATERAL
correlated subqueries — Trino/Athena engine-v3 features a reference user
can type today (SURVEY §3.3: the declared query surface is full Trino
SQL), executed here through Spark SQL's own implementations (recursive
CTEs are new in Spark 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from web_analytics_on_aws_spark.plans import query


# Spark's recursive CTE currently supports UNION ALL only (the UNION-
# distinct form raises UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so the
# registered recursion is acyclic — the classic date-dimension build.
_RECURSIVE_SPARK = """
WITH RECURSIVE bounds AS (
  SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi FROM events
), cal(day) AS (
  SELECT lo FROM bounds
  UNION ALL
  SELECT date_add(day, 1) FROM cal WHERE day < (SELECT hi FROM bounds)
), per_day AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
         COUNT(DISTINCT user_id) AS n_users
  FROM events GROUP BY CAST(ts AS DATE)
)
SELECT cal.day, CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(n_users, 0) AS BIGINT) AS n_users
FROM cal LEFT JOIN per_day ON per_day.day = cal.day
"""

_RECURSIVE_DUCK = _RECURSIVE_SPARK.replace(
    # CAST back to DATE: DuckDB promotes DATE + INTERVAL to TIMESTAMP,
    # which would emit a datetime column where Spark emits date
    "date_add(day, 1)", "CAST(day + INTERVAL 1 DAY AS DATE)"
).replace("SELECT lo FROM bounds", "SELECT CAST(lo AS DATE) FROM bounds")


@query("sql_recursive_calendar_spine", oracle=_RECURSIVE_DUCK)
def recursive_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE date-dimension build: the calendar spine is generated
    by the recursion (one row per day between the data's bounds — engine
    iterates the anchor + step, never scans data per day), then each day
    left-joins its activity rollup. Covers the WITH RECURSIVE surface added
    in Spark 4; the non-recursive generate/sequence twin of this plan is
    `events_hourly_gapfill`."""
    from web_analytics_on_aws_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SPARK)


_LATERAL_STMT = """
SELECT n.n_name, top.c_name, top.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name
  LIMIT 2
) AS top
"""


@query("sql_lateral_top2_per_nation", oracle=_LATERAL_STMT)
def lateral_top2_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with ORDER BY + LIMIT: top-2 customers
    by balance per nation, identical SQL text on both engines. The outer
    side is a dim (25 rows) so the dependent join is bounded by design;
    the scale path for top-k-per-group over a FACT outer is the window
    form (`window_top3_orders_per_customer`) — this registration covers
    the SQL *surface*, and Catalyst decorrelates it into a ranked join
    rather than 25 re-scans (pinned in plan tests)."""
    from web_analytics_on_aws_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_STMT)


@query(
    "acl_masked_events_rollup",
    oracle="""
    WITH policy_view AS (
      SELECT sha256(CAST(user_id AS VARCHAR)) AS user_id, event_type, value
      FROM events
      WHERE event_type <> 'purchase'
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM policy_view
    GROUP BY event_type
    """,
)
def acl_masked_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LakeFormation-analog governance surface (SURVEY §2.6 D8, reference
    web-analytics-iceberg/cdk_stacks/lake_formation.py:28-73): an 'analyst'
    principal is granted column-level SELECT on events with user_id
    sha256-masked (deterministic pseudonymization — distinct counts still
    work) and a row filter hiding purchase events; the rollup runs entirely
    through the policy view. Enforcement is a plan rewrite, so the row
    filter is pushed to the parquet scan and unselected columns are pruned
    — the policy costs nothing at 100 TB beyond the mask hash."""
    import pyspark.sql.functions as F

    from web_analytics_on_aws_spark.sources.policy import PolicyCatalog
    from web_analytics_on_aws_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    cat = PolicyCatalog()
    cat.grant(
        "analyst",
        "events",
        permissions={"SELECT"},
        columns=("user_id", "event_type", "value"),
        masked={"user_id": "sha256"},
        row_filter="event_type <> 'purchase'",
    )
    view = cat.apply(events, "analyst", "events")
    return view.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


_TRINO_TEXT = """
SELECT "event_type" AS etype,
       count(*) AS n,
       CAST(max(strpos("event_type", 'c')) AS BIGINT) AS max_pos,
       CAST(min(date_diff('day', TIMESTAMP '2024-01-01 00:00:00',
                CAST(CAST(ts AS DATE) AS TIMESTAMP))) AS BIGINT) AS first_day
FROM events
GROUP BY "event_type"
"""


@query(
    "trino_dialect_surface",
    oracle="""
    SELECT event_type AS etype,
           COUNT(*) AS n,
           CAST(MAX(strpos(event_type, 'c')) AS BIGINT) AS max_pos,
           CAST(MIN(date_diff('day', TIMESTAMP '2024-01-01 00:00:00',
                    CAST(CAST(ts AS DATE) AS TIMESTAMP))) AS BIGINT) AS first_day
    FROM events
    GROUP BY event_type
    """,
)
def trino_dialect_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's interactive dialect, accepted verbatim: a Trino/
    Athena-text query (double-quoted identifiers, strpos, date_diff with a
    unit string — SURVEY §3.3's engine-v3 surface) rewritten to Spark SQL
    by functions/trino_compat.py and executed against the session catalog.
    The oracle runs DuckDB's native near-Trino dialect — the shim's output
    must agree exactly. date_diff is anchored on whole-day timestamps where
    Trino's complete-unit and DuckDB's boundary-crossing semantics
    coincide (the delta is documented in the shim)."""
    from web_analytics_on_aws_spark.functions.trino_compat import trino_sql
    from web_analytics_on_aws_spark.sources.tables import load_table

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return trino_sql(spark, _TRINO_TEXT)


@query(
    "sql_not_in_null_semantics",
    oracle="""
    SELECT 'not_in_with_nulls' AS probe,
           (SELECT COUNT(*) FROM orders
            WHERE o_custkey NOT IN
                  (SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL
                               ELSE c_custkey END
                   FROM customer)) AS n_not_in,
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE (CASE WHEN c.c_custkey % 100 = 0 THEN NULL
                                          ELSE c.c_custkey END) = o.o_custkey))
             AS n_not_exists,
           (SELECT COUNT(*) FROM orders
            WHERE o_custkey NOT IN
                  (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0))
             AS n_not_in_clean
    """,
)
def sql_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI three-valued-logic corner every engine must get right: a NULL
    in a NOT IN subquery makes the predicate UNKNOWN for every non-matching
    row (n_not_in = 0 whenever any NULL is present), while the NOT EXISTS
    rewrite keeps matching — the pair documents why optimizers need the
    null-aware anti join. The clean NOT IN column pins the non-degenerate
    path. Identical text runs on both engines."""
    from web_analytics_on_aws_spark.sources.tables import load_table

    for t in ("orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
    SELECT 'not_in_with_nulls' AS probe,
           (SELECT COUNT(*) FROM orders
            WHERE o_custkey NOT IN
                  (SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL
                               ELSE c_custkey END
                   FROM customer)) AS n_not_in,
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE (CASE WHEN c.c_custkey % 100 = 0 THEN NULL
                                          ELSE c.c_custkey END) = o.o_custkey))
             AS n_not_exists,
           (SELECT COUNT(*) FROM orders
            WHERE o_custkey NOT IN
                  (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0))
             AS n_not_in_clean
    """)


@query(
    "sql_agg_surface_extras",
    oracle="""
    SELECT r.r_name AS region,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_csv,
           CAST(median(n.n_nationkey) AS DOUBLE) AS median_key,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def sql_agg_surface_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern aggregate surface parity: ordered LISTAGG (new in Spark 4 /
    Trino listagg / DuckDB string_agg), exact median, and GROUP BY over a
    dim join — the everyday reporting shapes an Athena user types."""
    from web_analytics_on_aws_spark.sources.tables import load_table

    for t in ("nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
    SELECT r.r_name AS region,
           listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name) AS nations_csv,
           CAST(median(n.n_nationkey) AS DOUBLE) AS median_key,
           COUNT(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """)


_TRINO_URL_TEXT = """
SELECT url_extract_host(uri) AS host,
       url_extract_path(uri) AS path,
       day_of_week(ts) AS iso_dow,
       COUNT(*) AS n,
       COUNT(DISTINCT url_extract_parameter(uri, 'uid')) AS uniq_uids,
       url_extract_port(uri) AS port,
       date_format(MIN(CAST(ts AS DATE)), '%Y-%m-%d') AS first_day
FROM weblog_uris
GROUP BY 1, 2, 3, 6
"""


@query(
    "trino_url_traffic_rollup",
    oracle="""
    WITH uris AS (
      SELECT
        CASE user_id % 3 WHEN 0 THEN 'www.example.com'
                         WHEN 1 THEN 'shop.example.com'
                         ELSE 'api.example.com' END AS host,
        '/' || event_type || '/item' AS path,
        CAST(isodow(ts) AS INTEGER) AS iso_dow,
        CASE WHEN user_id % 5 = 0 THEN CAST(8443 AS BIGINT) END AS port,
        CAST(user_id AS VARCHAR) AS uid,
        strftime(ts, '%Y-%m-%d') AS day
      FROM events
    )
    SELECT host, path, iso_dow, COUNT(*) AS n,
           COUNT(DISTINCT uid) AS uniq_uids,
           port, MIN(day) AS first_day
    FROM uris GROUP BY host, path, iso_dow, port
    """,
)
def trino_url_traffic_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-log URL dissection in the reference's own dialect: the Trino
    text (url_extract_host/path/port/parameter — Trino's URL function
    family; ISO day_of_week; MySQL-style date_format — none of which exist
    under those semantics in Spark) runs through the trino_compat shim,
    which maps them onto JVM parse_url/date_format expressions. The URL is
    synthesized per event (testdata has no URI column), and the DuckDB
    oracle computes each extraction from the GENERATION rule, never
    parsing — so the shim's parser mapping is checked against an
    independent derivation, not itself.

    Scale: map-only projection + one hash aggregate on (host, path, dow,
    port) — low-cardinality keys, partial aggregation does almost all the
    work map-side; parse_url is whole-stage-codegen'd JVM, no UDF."""
    from web_analytics_on_aws_spark.functions.trino_compat import trino_sql
    from web_analytics_on_aws_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_for_uris")
    spark.sql(
        """
        SELECT ts,
               concat(
                 'https://',
                 CASE pmod(user_id, 3) WHEN 0 THEN 'www.example.com'
                                       WHEN 1 THEN 'shop.example.com'
                                       ELSE 'api.example.com' END,
                 CASE WHEN pmod(user_id, 5) = 0 THEN ':8443' ELSE '' END,
                 '/', event_type, '/item',
                 '?uid=', CAST(user_id AS STRING),
                 '&s=', CAST(pmod(event_id, 7) AS STRING),
                 CASE WHEN pmod(event_id, 2) = 0 THEN '#top' ELSE '' END
               ) AS uri
        FROM events_for_uris
        """
    ).createOrReplaceTempView("weblog_uris")
    return trino_sql(spark, _TRINO_URL_TEXT)


# MATCH_RECOGNIZE-style row-pattern matching (Trino/Athena engine v3:
# SELECT ... FROM t MATCH_RECOGNIZE(PARTITION BY u ORDER BY ts PATTERN
# (V C+ P) DEFINE ...)). Spark has no MATCH_RECOGNIZE clause; the engine
# expresses the same semantics as symbolization + regex: each partition's
# rows, in ORDER BY order, become one symbol string (one char per row —
# the DEFINE classifier), and the PATTERN is a regex scanned left-to-right
# non-overlapping == AFTER MATCH SKIP PAST LAST ROW. Both engines run the
# identical derivation, so the oracle checks the symbolization AND the
# match semantics. Per-partition sequences are capped at the first 2000
# rows (deterministic ROW_NUMBER cap on both sides) — the skew guard a
# 100 TB run needs before building per-user strings.
_MATCH_RECOGNIZE_BODY = """
WITH ordered AS (
  SELECT user_id, substring(event_type, 1, 1) AS sym,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), capped AS (
  SELECT * FROM ordered WHERE rn <= 2000
), seqs AS (
  SELECT user_id, {AGG} AS seq
  FROM capped GROUP BY user_id
), matched AS (
  SELECT user_id, seq, {EXTRACT} AS funnels
  FROM seqs
)
SELECT user_id,
       CAST(length(seq) AS BIGINT) AS seq_len,
       CAST({NMATCH} AS BIGINT) AS n_funnels,
       CAST({MAXLEN} AS BIGINT) AS max_funnel_len
FROM matched
"""

_MR_SPARK = _MATCH_RECOGNIZE_BODY.format(
    AGG="listagg(sym, '') WITHIN GROUP (ORDER BY rn)",
    EXTRACT="regexp_extract_all(seq, 'vc+p', 0)",
    NMATCH="size(funnels)",
    MAXLEN="array_max(transform(funnels, x -> length(x)))",
)

_MR_DUCK = _MATCH_RECOGNIZE_BODY.format(
    AGG="string_agg(sym, '' ORDER BY rn)",
    EXTRACT="regexp_extract_all(seq, 'vc+p')",
    NMATCH="len(funnels)",
    MAXLEN="list_max(list_transform(funnels, x -> length(x)))",
)


@query("events_match_recognize_funnel", oracle=_MR_DUCK)
def match_recognize_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern funnel: MATCH_RECOGNIZE `PARTITION BY user_id ORDER BY
    ts PATTERN (V C+ P)` (view, 1+ clicks, purchase) with AFTER MATCH SKIP
    PAST LAST ROW, re-expressed Spark-first as per-user ordered
    symbolization (event_type -> one char via the DEFINE classifier) +
    non-overlapping greedy regex over the symbol string. Emits per user the
    sequence length, the number of completed funnels, and the longest
    funnel (its click-run + 2). Athena engine v3 ships MATCH_RECOGNIZE as
    part of the Trino surface the reference queries through (SURVEY §3.3).

    Scale: ONE shuffle on user_id (window + ordered listagg share the
    partitioning); the regex scan is per-row JVM, no UDF. Per-user strings
    are bounded by the rn <= 2000 cap, so a bot user costs the same as a
    heavy legitimate one — same whale guard class as the attribution touch
    cap."""
    from web_analytics_on_aws_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_MR_SPARK)
