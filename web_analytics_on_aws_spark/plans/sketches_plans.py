"""Sketch-rollup queries with cross-engine audit oracles.

Approximate results can't hash-match an exact oracle, so these queries use
the **audit-boolean pattern**: the Spark side computes the sketch estimate
AND the exact answer, emitting the exact value plus a `within_tol` boolean;
the DuckDB oracle emits the same exact value plus literal TRUE. The driver's
bit-exact compare then *does* gate the sketch: an estimate that violates its
error bound flips the boolean and fails the hash. (Same trick as
`embedding_quantize_error` — turn an approximate property into an exact one.)

Scale rationale in operators/sketches.py: sketch rollups shuffle O(groups)
bytes instead of O(distinct), and coarser grains are sketch unions over the
rollup table, never a re-scan of raw events.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from web_analytics_on_aws_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_rollup,
    kll_quantiles,
    kll_rollup,
    within_tolerance,
)
from web_analytics_on_aws_spark.plans import query
from web_analytics_on_aws_spark.sources.tables import load_table

# HLL lgk=12 → rsd ≈ 1.6%; audits allow 5% (3σ). KLL k=200 → rank error
# ≈ 1.65%; audits allow ±5 rank points.
_HLL_TOL = 0.05
_KLL_RANK_TOL = 0.05


@query(
    "sketch_daily_uniques_audit",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS uniq_users,
           TRUE AS within_tol
    FROM events GROUP BY 1
    """,
)
def sketch_daily_uniques_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily uniques from an HLL sketch rollup, audited against the exact
    count: emits (day, exact, estimate-within-5%). The rollup is the
    materializable artifact — at 100 TB it replaces every COUNT(DISTINCT)
    re-scan over raw events."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    est = hll_estimate(hll_rollup(ev, ["day"], "user_id"))
    exact = ev.groupBy("day").agg(F.countDistinct("user_id").alias("uniq_users"))
    return exact.join(est.select("day", "uniq_estimate"), "day").select(
        "day",
        "uniq_users",
        within_tolerance(F.col("uniq_estimate"), F.col("uniq_users"), _HLL_TOL).alias(
            "within_tol"
        ),
    )


@query(
    "sketch_global_uniques_merge_audit",
    oracle="""
    SELECT COUNT(DISTINCT user_id) AS uniq_users, TRUE AS within_tol
    FROM events
    """,
)
def sketch_global_uniques_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-time uniques answered by MERGING the daily sketch rollup
    (hll_union_agg), never re-scanning events — the associativity property
    that makes sketch rollups compose across 1000 executors. Audited against
    the exact global distinct."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    merged = hll_merge(hll_rollup(ev, ["day"], "user_id"), [])
    exact = ev.agg(F.countDistinct("user_id").alias("uniq_users"))
    return exact.crossJoin(F.broadcast(merged)).select(
        "uniq_users",
        within_tolerance(F.col("uniq_estimate"), F.col("uniq_users"), _HLL_TOL).alias(
            "within_tol"
        ),
    )


@query(
    "sketch_value_median_audit",
    oracle="""
    SELECT event_type, COUNT(*) AS cnt, TRUE AS median_rank_ok
    FROM events GROUP BY event_type
    """,
)
def sketch_value_median_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL median per event_type, audited by its *rank*: the fraction of
    values ≤ the estimate must sit within 50%±5 rank points (KLL guarantees
    ±1.65 at k=200). Rank is the right audit for quantile sketches — value
    distance is scale-dependent, rank error is the actual contract."""
    ev = load_table(spark, sf_dir, "events")
    med = kll_quantiles(kll_rollup(ev, ["event_type"], "value"), [0.5]).select(
        "event_type", F.col("p50").alias("est_median")
    )
    ranked = ev.join(F.broadcast(med), "event_type").groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.avg((F.col("value") <= F.col("est_median")).cast("double")).alias("rank"),
    )
    return ranked.select(
        "event_type",
        "cnt",
        (F.abs(F.col("rank") - 0.5) <= F.lit(_KLL_RANK_TOL)).alias("median_rank_ok"),
    )


@query(
    "sketch_theta_union_audit",
    oracle="""
    SELECT COUNT(DISTINCT user_id) AS uniq_users,
           CAST(COUNT(DISTINCT event_type) AS INT) AS n_groups,
           TRUE AS within_tol
    FROM events
    """,
)
def sketch_theta_union_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches per event_type unioned to the global distinct-user
    estimate (theta supports full set algebra — union here; intersections /
    A-not-B come free for audience-overlap questions). Audited vs exact."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("s")
    )
    est = per_type.agg(
        F.theta_sketch_estimate(F.theta_union_agg("s")).alias("est"),
        F.count("*").cast("int").alias("n_groups"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("uniq_users"))
    return exact.crossJoin(F.broadcast(est)).select(
        "uniq_users",
        "n_groups",
        within_tolerance(F.col("est"), F.col("uniq_users"), _HLL_TOL).alias(
            "within_tol"
        ),
    )


@query(
    "events_heavy_hitter_users",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) >= (SELECT CEIL(COUNT(*) * CAST(0.007 AS DECIMAL(8,4)))
                        FROM events)
    """,
)
def events_heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (users with ≥0.7% of all events) at sketch cost:
    per-partition Misra-Gries candidates (map-only, bounded memory) + a
    broadcast semi-join recount — the shuffle carries only candidate keys,
    never the full user-id cardinality, yet the result is bit-exact against
    the plain GROUP BY/HAVING oracle."""
    from web_analytics_on_aws_spark.operators.frequent import heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", support="0.007", count_alias="n_events")


@query(
    "sketch_theta_overlap_audit",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_v,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_p
      FROM events GROUP BY user_id
    )
    SELECT CAST(SUM(has_v * has_p) AS BIGINT) AS both_exact,
           CAST(SUM(has_v * (1 - has_p)) AS BIGINT) AS view_only_exact,
           TRUE AS both_within_tol,
           TRUE AS view_only_within_tol
    FROM per_user
    """,
)
def sketch_theta_overlap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap via theta set algebra: viewers ∩ purchasers
    (`theta_intersection`) and viewers ∖ purchasers (`theta_difference`)
    estimated from two per-segment sketches — the questions COUNT(DISTINCT)
    can't answer from a rollup without re-scanning raw events. At 100 TB the
    segment sketches are built once (fixed bytes per segment), and every
    pairwise overlap/exclusion combination is sketch-local arithmetic.
    Audit-boolean oracle: exact intersection counts hash-gate the estimates
    within theta's intersection error envelope."""
    ev = load_table(spark, sf_dir, "events")
    sk = lambda t: F.theta_sketch_agg(
        F.when(F.col("event_type") == t, F.col("user_id"))
    )
    ests = ev.agg(
        F.theta_sketch_estimate(
            F.theta_intersection(sk("view"), sk("purchase"))
        ).alias("est_both"),
        F.theta_sketch_estimate(
            F.theta_difference(sk("view"), sk("purchase"))
        ).alias("est_vonly"),
    )
    flags = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("has_v"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "has_p"
        ),
    )
    exact = flags.agg(
        F.sum(F.col("has_v") * F.col("has_p")).alias("both_exact"),
        F.sum(F.col("has_v") * (1 - F.col("has_p"))).alias("view_only_exact"),
    )
    # theta intersection error compounds vs union — audit at a wider 15%
    return exact.crossJoin(F.broadcast(ests)).select(
        "both_exact",
        "view_only_exact",
        within_tolerance(F.col("est_both"), F.col("both_exact"), 0.15).alias(
            "both_within_tol"
        ),
        within_tolerance(F.col("est_vonly"), F.col("view_only_exact"), 0.15).alias(
            "view_only_within_tol"
        ),
    )


@query(
    "sketch_cms_topk_audit",
    oracle="""
    WITH counts AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt,
             CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id) AS INT)
               AS rank
      FROM events GROUP BY user_id
    )
    SELECT user_id, true_cnt, rank,
           TRUE AS never_undercounts, TRUE AS within_eps
    FROM counts WHERE rank <= 10
    """,
)
def cms_topk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch audited on the exact top-10 users: the sketch is a
    depth×width cell table (one partial-agg shuffle, O(d·w) state — never
    per-key state), estimates broadcast-probe it, and the booleans pin the
    CMS guarantees: estimates never undercount, and overcount stays within
    the e/width · N bound (deterministic for the fixed seed). Exact
    anchors (true_cnt, rank) hash-gate against DuckDB."""
    from web_analytics_on_aws_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    depth, width = 5, 1024
    sketch = cms_build(ev, "user_id", depth=depth, width=width)
    counts = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("true_cnt")
    )
    w = Window.orderBy(F.desc("true_cnt"), F.asc("user_id"))
    top = (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 10)
    )
    total = ev.agg(F.count("*").alias("__n"))
    est = cms_estimate(sketch, top.select("user_id"), "user_id", depth=depth, width=width)
    import math

    eps = math.e / width
    return (
        top.join(est, "user_id")
        .crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "true_cnt",
            "rank",
            (F.col("cms_estimate") >= F.col("true_cnt")).alias("never_undercounts"),
            (
                F.col("cms_estimate")
                <= F.col("true_cnt") + F.ceil(F.col("__n") * F.lit(eps))
            ).alias("within_eps"),
        )
    )
