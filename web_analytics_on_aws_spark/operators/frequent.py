"""Distributed heavy hitters (frequent items) — exact results at sketch cost.

The reference's query surface (Athena v3 = Trino) exposes
``approx_most_frequent``; this module is the 100 TB-native Spark version,
and it is *exact*, not approximate, via the classic two-phase design:

1. **Candidate generation** — a per-partition Misra-Gries summary (bounded
   memory: ``capacity`` counters per partition, maintained across Arrow
   batches inside one ``mapInPandas`` pass). MG's guarantee composes across
   partitions: any item with global frequency > N/(capacity+1) survives in
   at least one partition summary, so with ``capacity >= ceil(1/support)``
   the candidate union has **no false negatives** for the support threshold.
2. **Exact verification** — broadcast the tiny candidate set (≤ capacity ×
   n_partitions items) back over the data as a semi-join, recount exactly,
   and keep items with count ≥ ceil(support·N).

Why this beats a plain groupBy at 100 TB: the full groupBy shuffles one
record per *distinct* key (billions for user-id-like columns); here the
shuffle after the semi-join carries only candidate keys (≤ thousands), and
phase 1 is a map-only pass. The final answer is still bit-exact — which is
why the driver can oracle-check it against a plain GROUP BY/HAVING.

Threshold arithmetic is DECIMAL on both engines (``support`` is passed as a
decimal string): ``0.007 * 10000`` in binary float is 70.0000…01 and would
ceil to 71 — the decimal path makes Spark and DuckDB agree exactly.
"""

from __future__ import annotations

from decimal import Decimal
from math import ceil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def misra_gries_candidates(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries candidate items for ``col`` (one `item`
    column, ≤ ``capacity`` rows per partition, duplicates across partitions
    possible). Batched MG: merge each Arrow batch's value_counts into the
    counter dict, then evict by subtracting the (capacity+1)-th largest
    count from all — total decrement ≤ n_p/(capacity+1) per partition, the
    bound the no-false-negative proof needs."""
    import pandas as pd

    src = df.select(F.col(col).alias("item"))
    out_schema = src.schema

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf["item"].value_counts(dropna=True).items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > capacity:
                dec = sorted(counters.values(), reverse=True)[capacity]
                counters = {k: n - dec for k, n in counters.items() if n > dec}
        yield pd.DataFrame({"item": list(counters.keys())}).astype(
            {"item": pdf["item"].dtype} if counters else {}
        )

    return src.mapInPandas(mg, out_schema)


def heavy_hitters(
    df: DataFrame,
    col: str,
    support: str = "0.007",
    item_alias: str | None = None,
    count_alias: str = "n",
) -> DataFrame:
    """Items of ``col`` occurring in ≥ ``support`` fraction of rows, with
    their exact counts. ``support`` is a decimal string (exact threshold
    arithmetic on any engine). One map-only candidate pass + one broadcast
    semi-join recount; never a full-cardinality shuffle."""
    frac = Decimal(support)
    capacity = ceil(1 / frac)
    cands = misra_gries_candidates(df, col, capacity).distinct()
    counts = (
        df.select(F.col(col).alias("item"))
        .join(F.broadcast(cands), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").alias(count_alias))
    )
    total = df.agg(F.count("*").alias("_total"))
    out = counts.join(F.broadcast(total)).filter(
        F.col(count_alias) >= F.ceil(F.col("_total") * F.lit(frac))
    )
    return out.select(F.col("item").alias(item_alias or col), count_alias)
