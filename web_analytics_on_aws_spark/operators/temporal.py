"""Temporal join operators Spark lacks natively: as-of join, range join.

Neither appears in the reference (it has no joins at all, SURVEY §2.3), but
both are table stakes for event-stream analytics over its data model (e.g.
"attribute each purchase to the latest prior page view"). Trino/Athena users
write these as correlated subqueries or inequality joins; naive translation
is O(n·m) per key. These are the scalable Spark formulations:

- ``asof_join``: single shuffle+sort. Union both sides into one keyed
  stream, sort by (keys, ts, side), and carry the latest right-side payload
  forward with ``last(..., ignorenulls=True)`` over a running window. Cost
  is one exchange on the equality keys + an in-partition sort — the same
  plan shape as a window function, no per-key quadratic blowup, AQE-skew
  splittable.
- ``range_count_join``: time-bucketed band join. Bucket the right side by
  ``floor(ts / width)``, explode each left row to the (at most two) buckets
  its window overlaps, equi-join on (keys, bucket) — Catalyst plans a plain
  hash join — then apply the exact range predicate as a residual filter.
  Shuffle volume is |left|·2 + |right| instead of a cross product.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: each left row gains the payload of the latest
    right row with ``right_ts <= left_ts`` (``<`` when ``strict``) and equal
    ``on`` keys; nulls where no prior right row exists.

    Right rows should be unique per (on, right_ts) — pre-aggregate to pick a
    deterministic representative if not, or the carried payload depends on
    sort ties.

    Output: all left columns plus ``payload`` columns from the right side.
    """
    on = list(on)
    payload = list(payload)
    left_cols = left.columns
    # Ties at equal ts: non-strict → the right row must sort before the left
    # row so last() sees it; strict → after, so it's invisible.
    l_side, r_side = (1, 0) if not strict else (0, 1)
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(l_side))
    for p in payload:
        l = l.withColumn(p, F.lit(None))
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        *[F.col(p) for p in payload],
        *[F.lit(None).alias(c) for c in left_cols if c not in on],
    )
    unioned = l.select(r.columns).unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", *[F.last(p, ignorenulls=True).over(w).alias(f"__asof_{p}") for p in payload]
    )
    return filled.filter(F.col("__side") == l_side).select(
        *left_cols, *[F.col(f"__asof_{p}").alias(p) for p in payload]
    )


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    window_micros: int,
    count_alias: str = "matches",
) -> DataFrame:
    """Count, per left row, the right rows with equal ``on`` keys and
    ``left_ts - window <= right_ts < left_ts`` (a trailing band).

    Left rows with no matches keep count 0 (left join semantics). Left rows
    must be distinct (they are the output grain).
    """
    on = list(on)
    left_cols = left.columns
    l = left.withColumn("__lm", F.unix_micros(F.col(left_ts)))
    r = right.select(
        *on,
        F.unix_micros(F.col(right_ts)).alias("__rm"),
    ).withColumn("__bucket", (F.col("__rm") / F.lit(window_micros)).cast("long"))
    # a trailing window of width w overlaps exactly buckets b-1 and b
    l_expl = l.withColumn(
        "__bucket",
        F.explode(
            F.array(
                (F.col("__lm") / F.lit(window_micros)).cast("long") - 1,
                (F.col("__lm") / F.lit(window_micros)).cast("long"),
            )
        ),
    )
    joined = l_expl.join(r, on + ["__bucket"], "inner").filter(
        (F.col("__rm") >= F.col("__lm") - F.lit(window_micros))
        & (F.col("__rm") < F.col("__lm"))
    )
    counts = joined.groupBy(*[l_expl[c] for c in left_cols]).agg(
        F.count("*").alias(count_alias)
    )
    return (
        left.join(counts, left_cols, "left")
        .withColumn(count_alias, F.coalesce(F.col(count_alias), F.lit(0)))
    )
