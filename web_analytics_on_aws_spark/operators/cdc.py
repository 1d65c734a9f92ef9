"""Change-data-capture: keyed table diff and snapshot changelog.

The reference's iceberg variants upsert on ``unique_keys`` (SURVEY §2.7
T4/T5, firehose_to_iceberg_transformer.py:127-138) — which implies its
storage layer understands row identity over time. This module exposes the
*read side* of that contract: the changelog between two table states, in
Delta/Iceberg CDF convention (`_change_type` ∈ insert / delete /
update_preimage / update_postimage), so downstream consumers (incremental
materialized views, audit, replication) can subscribe to changes instead of
re-reading snapshots.

Plan shape (the scale story): ONE full-outer shuffle join on the key —
both sides hash-partition once, every change class is derived from the same
joined row via a CASE + explode, so there is no per-class re-join and no
second pass. Comparison is null-safe (`<=>`) per column. At 100 TB the join
key is the upsert key (already the natural distribution for both states);
pre-bucketed states (operators/maintenance.py::bucketize) make the diff
entirely shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

CHANGE_COL = "_change_type"


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Keyed changelog from state ``old`` to state ``new``.

    Output: keys + compare_cols + `_change_type`; update rows appear twice
    (preimage with old values, postimage with new values), matching the
    Delta CDF / Iceberg changelog convention.
    """
    keys = list(keys)
    cols = list(compare_cols or [c for c in old.columns if c not in keys])
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")

    changed = None
    for c in cols:
        neq = ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        changed = neq if changed is None else changed | neq
    kinds = (
        F.when(F.col("__in_old").isNull(), F.array(F.lit("insert")))
        .when(F.col("__in_new").isNull(), F.array(F.lit("delete")))
        .when(changed, F.array(F.lit("update_preimage"), F.lit("update_postimage")))
        .otherwise(F.array().cast("array<string>"))
    )
    ex = j.select("*", F.explode(kinds).alias(CHANGE_COL))
    use_old = F.col(CHANGE_COL).isin("delete", "update_preimage")
    out_keys = [
        F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k) for k in keys
    ]
    out_cols = [
        F.when(use_old, F.col(f"__o_{c}")).otherwise(F.col(f"__n_{c}")).alias(c)
        for c in cols
    ]
    return ex.select(*out_keys, *out_cols, F.col(CHANGE_COL))


def snapshot_changelog(
    spark,
    table: str,
    keys: Sequence[str],
    from_version: int,
    to_version: int | None = None,
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Changelog between two committed snapshot versions of a
    sources/snapshots.py table (the engine's Iceberg-mechanism tables)."""
    from web_analytics_on_aws_spark.sources.snapshots import read_snapshot

    old = read_snapshot(spark, table, version=from_version)
    new = read_snapshot(spark, table, version=to_version)
    return table_diff(old, new, keys, compare_cols)


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    time_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """SCD2 (Kimball type-2 slowly-changing-dimension) history build:
    collapse each key's attribute sequence into change rows with
    [valid_from, valid_to) intervals and an is_current flag.

    Ordering inside a key is (time_col, tiebreak_col) — fully deterministic.
    One shuffle on the dimension key serves both windows (identical
    partition spec → Catalyst plans a single exchange).
    Output: (key_col, attr_col, valid_from, valid_to, is_current).

    Same-timestamp flip-flops (A→B→A within one time_col value) are KEPT as
    zero-length ``[t, t)`` intervals in tiebreak order — every observed
    change survives, matching the event-sourcing convention (and the pure-
    Python reference in tests/test_corpus_ops_property.py). Consumers that
    want the day-collapsed view filter ``valid_from < valid_to OR
    is_current``; pinned by a regression case in tests/test_cdc.py.
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(time_col, tiebreak_col)
    changes = (
        df.withColumn("__prev", F.lag(attr_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(attr_col)))
        .select(key_col, attr_col, time_col, tiebreak_col)
    )
    w2 = Window.partitionBy(key_col).orderBy(time_col, tiebreak_col)
    return changes.select(
        key_col,
        attr_col,
        F.col(time_col).alias("valid_from"),
        F.lead(time_col).over(w2).alias("valid_to"),
        F.lead(time_col).over(w2).isNull().alias("is_current"),
    )
