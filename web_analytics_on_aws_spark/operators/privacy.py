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
