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
