"""Whale-key skew guard on the attribution credit join (VERDICT r3 #3):
plans/engagement.py caps each user's touch history at the latest
_TOUCH_CAP rows BEFORE joining purchases × touches, so a bot/whale key
with 10^5 touches can no longer fan one task out to touches × purchases.

The test plants a 10^5-touch whale next to normal users, checks the join
fanout is bounded by cap × purchases, and re-derives the expected credit
totals independently (pure Python over the planted data) so the cap's
documented semantics — only the newest cap touches attribute — hold
exactly.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from web_analytics_on_aws_spark.plans.engagement import (
    _TOUCH_CAP,
    _capped_touches,
)

BASE = dt.datetime(2024, 1, 1)


def _events(spark, tmp_path):
    """events table: whale user 1 with 100k view touches (1/minute,
    newest first distinct) + 3 purchases; user 2 a normal 5-touch user
    with 1 purchase."""
    rows = []
    eid = 0
    for i in range(100_000):  # whale touches, one per minute going back
        rows.append(
            (eid, BASE + dt.timedelta(minutes=-i), 1, "view", 1.0, None)
        )
        eid += 1
    for d in (1, 2, 3):  # whale purchases, after all touches
        rows.append(
            (eid, BASE + dt.timedelta(hours=d), 1, "purchase", 100.0, None)
        )
        eid += 1
    for i in range(5):
        rows.append(
            (eid, BASE + dt.timedelta(minutes=-i), 2, "view", 1.0, None)
        )
        eid += 1
    rows.append((eid, BASE + dt.timedelta(hours=1), 2, "purchase", 50.0, None))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = str(tmp_path / "sf" / "events.parquet")
    df.coalesce(2).write.parquet(out)
    return str(tmp_path / "sf")


def test_whale_touch_fanout_is_bounded(spark, tmp_path):
    sf = _events(spark, tmp_path)
    ev = spark.read.parquet(f"{sf}/events.parquet")
    t = _capped_touches(ev)
    per_user = {
        r["user_id"]: r["n"]
        for r in t.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    # the whale's 10^5 touches collapse to exactly the cap; normals intact
    assert per_user == {1: _TOUCH_CAP, 2: 5}
    # credit-join fanout bound: ≤ cap × purchases per user, never 10^5 ×
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("long").alias("pl")
    )
    j = (
        p.join(t, "user_id")
        .filter(
            (F.col("pl") - F.col("tl") >= 1)
            & (F.col("pl") - F.col("tl") <= 604800)
        )
    )
    assert j.count() <= _TOUCH_CAP * 3 + 5


def test_capped_attribution_totals_match_independent_model(spark, tmp_path):
    """Linear attribution over the planted data, recomputed in pure
    Python under the SAME documented cap semantics (newest cap touches
    only) — the registered plan must agree to the cent."""
    from web_analytics_on_aws_spark.plans import engagement

    sf = _events(spark, tmp_path)
    out = {
        r["channel"]: (r["n_credits"], r["linear_revenue"])
        for r in engagement.attribution_multitouch(spark, sf).collect()
    }
    # whale: cap keeps the newest 1000 touches (minutes 0..-999), ALL
    # within 7 days of each purchase → each purchase splits 100.0 over
    # 1000 touches; user 2: 5 touches within window split 50.0.
    # No purchase is untouched → no 'direct' row (empty agg yields one
    # all-null row whose channel literal still appears; accept either).
    n, rev = out["view"]
    assert n == 3 * _TOUCH_CAP + 5
    assert abs(rev - (3 * 100.0 + 50.0)) < 1e-6
