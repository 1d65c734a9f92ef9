"""Skew-mitigation operators: salted two-phase aggregation.

At 100 TB, a handful of hot keys (one bot user, one viral URI) can make a
single reducer the straggler. AQE's skew-join splitting (enabled in
session.py) covers joins; for *aggregations* the classic remedy is salting:

  phase 1: groupBy(key, salt = hash(row) % N) — hot keys fan out over N
           reducers, each computing a partial aggregate;
  phase 2: groupBy(key) over the N partials — at most N rows per key.

For algebraic aggregates (count/sum/min/max) the result is exactly the
plain groupBy — which is why the registered salted query can share the plain
query's DuckDB oracle verbatim.

(Spark's partial/final HashAggregate already does map-side combining, which
absorbs most aggregation skew; explicit salting matters when the *merge*
side still concentrates — e.g. high-cardinality-payload aggregates like
collect_list/percentile sketches — and for engines/pipelines where the
partial phase is bypassed. The operator documents and demonstrates the
pattern with exact-equivalence guarantees.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_join(
    skewed: DataFrame,
    replicated: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
) -> DataFrame:
    """Inner equi-join with explicit key salting for hot-key skew.

    The skewed (fact) side gets a deterministic per-row salt
    ``xxhash64(all columns) % N``; the other side is replicated N× with one
    row per salt value, and the join runs on ``on + [salt]``. Every fact row
    matches exactly one replica of each matching build row, so the result
    multiset is EXACTLY the plain join — which is why the registered query
    shares the unsalted oracle verbatim — while a key that used to land on
    one reducer now spreads over N.

    Use when the build side is too large to broadcast AND the probe-side
    key histogram is concentrated (one viral URI / bot user at 100 TB).
    AQE's skew-join split (on in session.py) handles this adaptively for
    sort-merge joins; explicit salting is the deterministic form that also
    survives engines/stages where AQE can't rewrite (e.g. a skewed key
    feeding a downstream window). Cost: build side bytes × N — keep N small
    (4–16) and salt only the skewed partition range if known.
    """
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets)
    ).cast("int")
    lhs = skewed.withColumn("__salt", salt)
    rhs = replicated.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return lhs.join(rhs, [*on, "__salt"], "inner").drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column name → (phase1 aggregate over rows,
    phase2 aggregate over phase-1 partials). E.g.::

        salted_agg(df, ["user_id"], {
            "cnt": (F.count("*"), F.sum("cnt")),
            "total": (dec_sum("value"), F.sum("total").cast("double")),
        })
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[c1.alias(name) for name, (c1, _) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[c2.alias(name) for name, (_, c2) in aggs.items()]
    )
