"""Plan-attached metrics via Spark's observe API — counters computed by the
SAME job that runs the query (no second scan, exactly-once per micro-batch
for streams), surfaced to the driver. This is the engine-side replacement
for the reference's CloudWatch metric emissions around the validator
Lambda: validity tallies ride the ingest plan itself.

Batch: ``pyspark.sql.Observation`` blocks until the action finishes and
hands back the metric row. Streaming: ``df.observe(name, …)`` attaches
metrics that appear in every progress event (``observedMetrics``) —
at-most-once per batch, aggregated JVM-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation
from pyspark.sql.streaming import StreamingQuery


def with_validity_metrics(df: DataFrame, valid_col: str, name: str = "validity"):
    """Batch form: returns (observed_df, Observation). After any action on
    observed_df, ``obs.get`` holds {n_total, n_valid, n_invalid} computed
    in-plan — no second scan of the input."""
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col(valid_col), 1).otherwise(0)).alias("n_valid"),
        # NULL flags count as invalid (a validity column that failed to
        # compute IS an invalid record) — n_valid + n_invalid == n_total
        F.sum(
            F.when(F.coalesce(F.col(valid_col), F.lit(False)), 0).otherwise(1)
        ).alias("n_invalid"),
    )
    return observed, obs


def observe_stream(df: DataFrame, name: str, *exprs) -> DataFrame:
    """Streaming form: attach named metrics to a streaming DataFrame; each
    micro-batch's values land in the progress event."""
    return df.observe(name, *exprs)


def last_observed(query: StreamingQuery, name: str) -> dict | None:
    """The most recent micro-batch's observed metrics for ``name`` (None
    until the first batch completes)."""
    progress = query.lastProgress
    if not progress:
        return None
    return (progress.get("observedMetrics") or {}).get(name)
