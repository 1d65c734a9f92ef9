"""Privacy risk auditing: k-anonymity / l-diversity over quasi-identifiers.

Companion to the access-policy layer (``sources/policy.py``): masks and row
filters control WHO sees a column; these operators measure whether what's
left is re-identifiable — the standard release-audit loop (generalize →
re-measure k → release). Reference context: the LakeFormation grant stack
(web-analytics-iceberg/cdk_stacks/lake_formation.py) is the reference's
entire governance surface; k-anonymity is the analytic half a real release
pipeline adds on top.

Scale design: one shuffle on the quasi-identifier key (the equivalence-class
groupBy), then a tiny single-partition reduce over class sizes. Class counts
are exact; no collect of per-class rows. For 100 TB, the quasi-key groupBy
is the same shape as any grouped aggregate — AQE handles skewed classes
(e.g. a dominant (event_type, day) cell) like any hot key.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def equivalence_classes(
    df: DataFrame,
    quasi_cols: Sequence[str | Column],
    sensitive_col: str | None = None,
) -> DataFrame:
    """Group rows by the quasi-identifier tuple: one row per equivalence
    class with its size (and, if given, the count of distinct sensitive
    values — the l in l-diversity)."""
    aggs = [F.count("*").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(sensitive_col).alias("l_distinct"))
    return df.groupBy(*quasi_cols).agg(*aggs)


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str | Column],
    sensitive_col: str | None = None,
    k_thresholds: Sequence[int] = (2, 5),
) -> DataFrame:
    """One-row risk summary: class count, worst-case k (min class size),
    and how many ROWS sit in classes smaller than each threshold (the
    re-identifiable population). With ``sensitive_col``: worst-case l and
    the number of classes with a single sensitive value (attribute
    disclosure even when k is satisfied)."""
    classes = equivalence_classes(df, quasi_cols, sensitive_col)
    aggs = [
        F.sum("class_size").cast("long").alias("n_rows"),
        F.count("*").alias("n_classes"),
        F.min("class_size").alias("min_k"),
    ]
    for k in k_thresholds:
        aggs.append(
            F.sum(F.when(F.col("class_size") < k, F.col("class_size")).otherwise(0))
            .cast("long")
            .alias(f"rows_below_k{k}")
        )
    if sensitive_col is not None:
        aggs.append(F.min("l_distinct").alias("min_l"))
        aggs.append(
            F.sum(F.when(F.col("l_distinct") <= 1, 1).otherwise(0))
            .cast("long")
            .alias("classes_l1")
        )
    return classes.agg(*aggs)


# Generalization ladder helpers — the coarsening moves a release pipeline
# applies between measurements. All row-local (no shuffle).

def generalize_time(col: str | Column, grain: str) -> Column:
    """Truncate a timestamp to ``grain`` ('hour' | 'day' | 'week' | 'month')."""
    return F.date_trunc(grain, col)


def generalize_numeric(col: str | Column, width: float) -> Column:
    """Bucket a numeric column into fixed-width intervals (bucket index)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.floor(c / F.lit(width)).cast("long")


def generalize_prefix(col: str | Column, n: int) -> Column:
    """Keep an n-char prefix of a string (ZIP-code style truncation)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.substring(c, 1, n)


def dp_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    seed: int = 0xD9,
) -> DataFrame:
    """Event-level ε-differentially-private group counts via the Laplace
    mechanism (sensitivity 1: adding/removing one event changes any count
    by ≤1, so noise scale b = 1/ε).

    The noise is DETERMINISTIC given ``seed``: uniform u ∈ (0,1) comes from
    ``xxhash64(group_key, seed)`` and is inverse-CDF-transformed to
    Laplace(1/ε). That keeps release pipelines reproducible (re-running a
    governed export emits bit-identical numbers — and a run is auditable
    by bound-checking |noisy − exact|), at the standard cost that the seed
    must be treated as secret alongside the raw data. All expressions are
    JVM/codegen — the noise costs nothing on top of the groupBy shuffle.

    Returns group_cols + ``n`` (exact, for in-pipeline auditing — drop it
    before release!) + ``noisy_n``.
    """
    grouped = df.groupBy(*group_cols).agg(F.count("*").alias("n"))
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in group_cols])
    u = (F.xxhash64(key, F.lit(seed)) / F.lit(float(2**64))) + F.lit(0.5)
    u = F.greatest(F.lit(1e-12), F.least(F.lit(1.0 - 1e-12), u))
    b = 1.0 / float(epsilon)
    lap = (
        F.lit(-b)
        * F.signum(u - F.lit(0.5))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    )
    return grouped.withColumn(
        "noisy_n", F.round(F.col("n") + lap).cast("long")
    )
