"""Data-quality operators: column profiling and declarative expectations.

The reference's only quality gate is the per-record schema validator
(SURVEY §2.2 P3 — accept/reject into raw vs error zones). A training-data
pipeline needs the *table-level* counterpart: profile what landed, and
assert invariants (uniqueness, referential integrity, ranges, set
membership) before data flows downstream. Both operators here follow the
engine's audit pattern — tiny exact result tables the driver can
hash-check against a DuckDB oracle.

Scale notes: `profile_columns` is ONE aggregation pass; multiple exact
COUNT(DISTINCT)s make Catalyst plan an Expand (input ×|cols| before the
shuffle) — acceptable for ≤ a handful of profiled columns, and the
`approx=True` switch replaces them with HLL (`approx_count_distinct`) for
wide 100 TB profiles where a 2% cardinality error is fine (that path is
pytest-checked, not oracle-checked). `expect` composes each check as a
conditional count inside the same single pass; referential-integrity
checks add one left-anti broadcast join each.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def profile_columns(
    df: DataFrame, cols: Sequence[str], approx: bool = False
) -> DataFrame:
    """Long-form per-column profile: (column, n_rows, n_nonnull,
    n_distinct). Exact integer metrics only — engine-portable and
    hash-stable. One aggregation pass; column order of the output follows
    ``cols``."""
    distinct = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count("*").alias("__rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            distinct(c).alias(f"__nd_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}" for c in cols
    )
    return wide.selectExpr(
        "__rows AS n_rows",
        f"stack({len(cols)}, {stacked}) AS (column, n_nonnull, n_distinct)",
    ).select("column", "n_rows", "n_nonnull", "n_distinct")


def expect(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Evaluate named row-level expectations in ONE pass: each value is a
    boolean Column that should hold for every row. Returns one row per
    check: (check, n_violations, passed) — tiny, exact, oracle-friendly.
    NULL predicate results count as violations (unknown ≠ pass)."""
    aggs = [
        F.count(F.when(~F.coalesce(cond, F.lit(False)), 1)).alias(name)
        for name, cond in checks.items()
    ]
    wide = df.agg(*aggs)
    stacked = ", ".join(f"'{name}', `{name}`" for name in checks)
    return wide.selectExpr(
        f"stack({len(checks)}, {stacked}) AS (check, n_violations)"
    ).withColumn("passed", F.col("n_violations") == 0)


def expect_unique(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Key-uniqueness check: (check, n_violations, passed) where violations
    = rows beyond the first per key. Needs its own aggregation (uniqueness
    is not row-local); shuffles O(groups)."""
    name = "unique(" + ",".join(key_cols) + ")"
    dup = (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("__n"))
        .agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("n_violations"))
    )
    return dup.select(
        F.lit(name).alias("check"),
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def expect_references(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str | None = None,
) -> DataFrame:
    """Referential-integrity check: child rows whose key has no parent.
    One left-anti join (broadcast when the parent is a dim)."""
    name = name or f"{child_key}->{parent_key}"
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    ).agg(F.count("*").alias("n_violations"))
    return orphans.select(
        F.lit(name).alias("check"),
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def reconcile(
    source: DataFrame,
    target: DataFrame,
    key_cols: Sequence[str],
    measures: dict[str, tuple[Column, Column]],
    tolerance: float = 0.0,
) -> DataFrame:
    """Cross-table reconciliation — the ETL audit that proves a derived
    table still adds up to its source (row parity per key + measure parity
    within ``tolerance``). One row per measure:

        (measure, n_source_keys, n_target_keys, n_matched_keys,
         n_value_mismatches, max_abs_diff)

    ``measures`` maps a name to (source_expr, target_expr); expressions are
    aggregated per key on each side first (so either side may be at finer
    grain than the key), then compared on a full outer join. Keep the
    exprs decimal-typed for exact parity — float sums reconcile to noise.

    Scale shape: two key-wise partial-agg shuffles (one per side) + one
    key join; output is |measures| rows. The classic instance is
    orders.o_totalprice vs SUM over its lineitems — pinned as the
    registered query `dq_reconcile_orders_lineitem`.
    """
    keys = list(key_cols)
    s = source.groupBy(*keys).agg(
        *[expr.alias(f"__s_{name}") for name, (expr, _) in measures.items()]
    )
    t = target.groupBy(*keys).agg(
        *[expr.alias(f"__t_{name}") for name, (_, expr) in measures.items()]
    )
    s = s.withColumn("__in_s", F.lit(1))
    t = t.withColumn("__in_t", F.lit(1))
    j = s.join(t, keys, "full_outer").select(
        *[
            F.struct(
                F.col(f"__s_{name}").alias("s"), F.col(f"__t_{name}").alias("t")
            ).alias(name)
            for name in measures
        ],
        F.coalesce("__in_s", F.lit(0)).alias("__in_s"),
        F.coalesce("__in_t", F.lit(0)).alias("__in_t"),
    )
    # ONE aggregation pass over the join for every measure (not one job per
    # measure): all stats land in a single row, reshaped driver-side —
    # bounded at |measures| values.
    aggs = [
        F.sum("__in_s").cast("bigint").alias("n_source_keys"),
        F.sum("__in_t").cast("bigint").alias("n_target_keys"),
        F.sum(
            F.when((F.col("__in_s") == 1) & (F.col("__in_t") == 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_matched_keys"),
    ]
    for name in measures:
        sm, tm = F.col(f"{name}.s"), F.col(f"{name}.t")
        diff = F.abs(sm.cast("double") - tm.cast("double"))
        aggs.append(
            F.sum(
                F.when(sm.isNull() | tm.isNull() | (diff > tolerance), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias(f"__mm_{name}")
        )
        aggs.append(
            F.round(F.max(F.coalesce(diff, F.lit(0.0))), 6).alias(f"__md_{name}")
        )
    row = j.agg(*aggs).collect()[0]
    out_rows = [
        (
            name,
            row["n_source_keys"],
            row["n_target_keys"],
            row["n_matched_keys"],
            row[f"__mm_{name}"],
            float(row[f"__md_{name}"]),
        )
        for name in measures
    ]
    return source.sparkSession.createDataFrame(
        out_rows,
        "measure string, n_source_keys bigint, n_target_keys bigint, "
        "n_matched_keys bigint, n_value_mismatches bigint, max_abs_diff double",
    )
