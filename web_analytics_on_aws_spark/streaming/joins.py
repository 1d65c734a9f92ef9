"""Stream-stream interval join and watermarked streaming deduplication.

Completes the Structured Streaming operator surface beyond the reference's
ingest pipeline (SURVEY §2.7 lists no joins at all): correlating two live
event streams (e.g. purchases against the page views that preceded them)
requires a *stateful* join where both sides buffer rows until the watermark
proves no more matches can arrive.

Scale notes: state is keyed by the equality column — partitioned across
executors by the same shuffle as a batch join — and the interval condition
plus both watermarks give Spark the eviction bound (state size ∝
event-rate × interval width, not total history). The dedup operator is the
streaming twin of the batch `dropDuplicates` used in the upsert path
(operators/upsert.py): `dropDuplicatesWithinWatermark` keeps only
watermark-bounded state rather than all-time key history.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_lag: str = "1 hour",
    left_watermark: str = "2 hours",
    right_watermark: str = "3 hours",
) -> DataFrame:
    """Join rows of ``left`` to rows of ``right`` with the same ``key``
    where ``right_ts`` falls in ``[left_ts - max_lag, left_ts)`` — the
    streaming twin of ``operators.temporal.range_count_join``'s band.

    Both inputs must be streaming DataFrames with event-time columns; the
    watermarks bound join state on both sides (right state must cover the
    lag window, hence the larger default). Column names must not collide
    except for ``key``.
    """
    lag = F.expr(f"INTERVAL {max_lag}")
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts] - lag)
        & (rw[right_ts] < lw[left_ts])
    )
    return lw.join(rw, cond, "inner").drop(rw[key])


def dedup_within_watermark(
    events: DataFrame,
    keys: tuple[str, ...],
    time_col: str = "timestamp",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup on ``keys`` with watermark-bounded state:
    duplicates arriving within the watermark horizon are dropped; state for
    keys older than the watermark is evicted (unbounded-history dedup would
    OOM a long-running stream). Mirrors the reference's upsert key semantics
    (unique_keys = user_id, timestamp — SURVEY §2.7 T5) as a pure stream
    transform."""
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    keys: list[str] | str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: decorate a live event stream with a
    small dimension table (user profile, geo lookup, experiment arm).

    Stream-static joins are stateless — each micro-batch joins against the
    current static relation, no watermark needed. The dimension side is
    broadcast-hinted: at cluster scale every executor holds the dim once and
    the stream is never shuffled, which is the only plan shape that survives
    a high-rate stream (a shuffle join would re-partition every micro-batch).
    The static plan is re-resolved per batch, so an overwritten dim parquet
    is picked up without restarting the query."""
    on = [keys] if isinstance(keys, str) else list(keys)
    return stream.join(F.broadcast(dim), on, how)
