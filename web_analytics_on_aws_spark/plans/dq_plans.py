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


# --- Privacy risk audits (operators/privacy.py) ---------------------------

_PRIV_CLASSES = """
      SELECT COUNT(*) AS class_size, COUNT(DISTINCT user_id) AS l_distinct
      FROM events
      GROUP BY event_type, CAST(ts AS DATE), CAST(FLOOR(value / 50) AS BIGINT)
"""


@query(
    "privacy_k_anon_events",
    oracle=f"""
    WITH classes AS ({_PRIV_CLASSES})
    SELECT CAST(SUM(class_size) AS BIGINT) AS n_rows,
           COUNT(*) AS n_classes,
           CAST(MIN(class_size) AS BIGINT) AS min_k,
           CAST(SUM(CASE WHEN class_size < 2 THEN class_size ELSE 0 END)
                AS BIGINT) AS rows_below_k2,
           CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
                AS BIGINT) AS rows_below_k5,
           CAST(MIN(l_distinct) AS BIGINT) AS min_l,
           CAST(SUM(CASE WHEN l_distinct <= 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS classes_l1
    FROM classes
    """,
)
def privacy_k_anon_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of events under the quasi-identifier
    (event_type, day, value-bucket-of-50) with user_id as the sensitive
    attribute: worst-case k, re-identifiable row counts below k=2/5,
    worst-case l, and single-sensitive-value classes. One quasi-key shuffle
    + a scalar reduce — the release-audit loop's measurement half (the
    policy layer in sources/policy.py is the enforcement half)."""
    from web_analytics_on_aws_spark.operators import privacy

    events = load_table(spark, sf_dir, "events")
    return privacy.k_anonymity_report(
        events,
        [
            F.col("event_type"),
            F.to_date("ts").alias("day"),
            privacy.generalize_numeric("value", 50).alias("value_bucket"),
        ],
        sensitive_col="user_id",
        k_thresholds=(2, 5),
    )


def _priv_level_sql(grain: str, width: int) -> str:
    return f"""
    SELECT '{grain}/{width}' AS level,
           COUNT(*) AS n_classes,
           CAST(MIN(class_size) AS BIGINT) AS min_k,
           CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
                AS BIGINT) AS rows_below_k5
    FROM (
      SELECT COUNT(*) AS class_size FROM events
      GROUP BY event_type, date_trunc('{grain}', ts),
               CAST(FLOOR(value / {width}) AS BIGINT)
    )
    """


@query(
    "privacy_generalization_ladder",
    oracle=" UNION ALL ".join(
        [_priv_level_sql("hour", 10), _priv_level_sql("day", 50),
         _priv_level_sql("week", 200)]
    ),
)
def privacy_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generalize → re-measure loop: k-anonymity at three successive
    coarsenings of the quasi-identifiers (hour/10-unit buckets → day/50 →
    week/200), showing worst-case k rise and the sub-k=5 population shrink.
    Three independent class-groupBys (different keys — no reuse possible);
    each is one shuffle over the reduced class table."""
    from web_analytics_on_aws_spark.operators import privacy

    events = load_table(spark, sf_dir, "events")
    outs = []
    for grain, width in (("hour", 10), ("day", 50), ("week", 200)):
        rep = privacy.k_anonymity_report(
            events,
            [
                F.col("event_type"),
                privacy.generalize_time("ts", grain).alias("t"),
                privacy.generalize_numeric("value", width).alias("value_bucket"),
            ],
            k_thresholds=(5,),
        )
        outs.append(
            rep.select(
                F.lit(f"{grain}/{width}").alias("level"),
                "n_classes",
                "min_k",
                "rows_below_k5",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


@query(
    "dq_reconcile_orders_lineitem",
    oracle="""
    WITH s AS (
      SELECT o_orderkey AS k,
             CAST(o_totalprice AS DECIMAL(18,2)) AS total
      FROM orders
    ),
    t AS (
      SELECT l_orderkey AS k,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS total
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT s.k AS sk, t.k AS tk, s.total AS st, t.total AS tt
      FROM s FULL OUTER JOIN t ON s.k = t.k
    )
    SELECT 'gross_price' AS measure,
           CAST(SUM(CASE WHEN sk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_source_keys,
           CAST(SUM(CASE WHEN tk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_target_keys,
           CAST(SUM(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL THEN 1 ELSE 0
                    END) AS BIGINT) AS n_matched_keys,
           CAST(SUM(CASE WHEN st IS NULL OR tt IS NULL
                          OR ABS(CAST(st AS DOUBLE) - CAST(tt AS DOUBLE)) > 0.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_value_mismatches,
           ROUND(MAX(COALESCE(ABS(CAST(st AS DOUBLE) - CAST(tt AS DOUBLE)),
                              0.0)), 6) AS max_abs_diff
    FROM j
    """,
)
def dq_reconcile_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ETL reconciliation audit: does each order's stored total still add up
    from its line items? (The testdata generator prices orders as the sum of
    extended prices rounded at order grain, so parity holds within 0.5 —
    the audit PROVES it rather than assuming it.) Two key-wise partial-agg
    shuffles + one full-outer key join; emits one summary row per measure."""
    from web_analytics_on_aws_spark.operators.dq import reconcile

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return reconcile(
        orders.select(F.col("o_orderkey").alias("k"),
                      F.col("o_totalprice").cast("decimal(18,2)").alias("v")),
        lineitem.select(F.col("l_orderkey").alias("k"),
                        F.col("l_extendedprice").cast("decimal(18,2)").alias("v")),
        ["k"],
        {"gross_price": (F.first("v"), F.sum("v"))},
        tolerance=0.5,
    )


@query(
    "privacy_dp_event_counts",
    oracle="""
    WITH g AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT COUNT(*) AS n_groups,
           CAST(SUM(n) AS BIGINT) AS total_n,
           TRUE AS all_within_bound,
           TRUE AS noise_applied_ok,
           TRUE AS noise_scale_ok
    FROM g
    """,
)
def privacy_dp_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP release audit (ε=1, Laplace, event-level sensitivity 1) over
    (event_type, day) counts, reduced to exactly the properties an external
    auditor can certify without the seed: every group's |noisy − exact| is
    inside the 20/ε tail bound (P(violate) = e⁻²⁰ per group), noise is
    actually applied (the fraction of groups with nonzero rounded noise
    sits in the Laplace-predicted band around e^(−ε/2) ≈ 0.61), and the
    mean |noise| matches the 1/ε scale. The DuckDB oracle recomputes the
    exact counts and pins the audit booleans TRUE — deterministic because
    the mechanism is seeded (operators/privacy.py dp_noisy_counts).

    Scale: one groupBy shuffle + a scalar reduce; noise is codegen'd JVM
    expressions on the aggregated (tiny) side, never per-row."""
    from web_analytics_on_aws_spark.operators.privacy import dp_noisy_counts

    eps = 1.0
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("day")
    )
    noisy = dp_noisy_counts(ev, ["event_type", "day"], epsilon=eps)
    err = F.abs(F.col("noisy_n") - F.col("n"))
    return noisy.agg(
        F.count("*").alias("n_groups"),
        F.sum("n").cast("long").alias("total_n"),
        F.bool_and(err <= F.lit(20.0 / eps)).alias("all_within_bound"),
        F.avg((err > 0).cast("double")).between(0.35, 0.85).alias("noise_applied_ok"),
        F.avg(err.cast("double")).between(0.3 / eps, 2.0 / eps).alias("noise_scale_ok"),
    )
