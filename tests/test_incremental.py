"""Incremental rollup maintenance: merged partials are bit-identical to a
flat recompute, for any split point and for repeated (associative) merges."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE
from web_analytics_on_aws_spark.operators.incremental import (
    daily_event_rollup,
    merge_rollups,
)
from web_analytics_on_aws_spark.sources.tables import load_table

MEASURES = {"n_events": "sum", "sum_value": "sum", "max_value": "max"}
KEYS = ["day", "event_type"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_equals_flat_recompute(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    flat = daily_event_rollup(ev)
    base = daily_event_rollup(ev.filter(F.col("ts") < "2024-01-15 06:30:00"))
    delta = daily_event_rollup(ev.filter(F.col("ts") >= "2024-01-15 06:30:00"))
    merged = merge_rollups(base, delta, KEYS, MEASURES)
    assert _rows(merged) == _rows(flat)


def test_three_way_merge_associative(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    c1, c2 = "2024-01-10", "2024-01-20"
    parts = [
        daily_event_rollup(ev.filter(F.col("ts") < c1)),
        daily_event_rollup(ev.filter((F.col("ts") >= c1) & (F.col("ts") < c2))),
        daily_event_rollup(ev.filter(F.col("ts") >= c2)),
    ]
    left = merge_rollups(merge_rollups(parts[0], parts[1], KEYS, MEASURES), parts[2], KEYS, MEASURES)
    right = merge_rollups(parts[0], merge_rollups(parts[1], parts[2], KEYS, MEASURES), KEYS, MEASURES)
    flat = daily_event_rollup(ev)
    assert _rows(left) == _rows(right) == _rows(flat)


def test_unmergeable_measure_rejected(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    r = daily_event_rollup(ev)
    try:
        merge_rollups(r, r, KEYS, {"n_events": "avg"})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_incremental_join_equals_flat_recompute(spark):
    from web_analytics_on_aws_spark.operators.incremental import (
        incremental_join_delta,
        maintain_join_view,
    )

    a_old = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")], "k long, av string"
    )
    a_delta = spark.createDataFrame([(2, "w"), (3, "v")], "k long, av string")
    b_old = spark.createDataFrame([(1, 10), (2, 20), (2, 21)], "k long, bv long")
    b_delta = spark.createDataFrame([(2, 22), (3, 30)], "k long, bv long")

    view_old = a_old.join(b_old, "k")
    maintained = maintain_join_view(
        view_old, a_old, a_delta, b_old, b_delta, "k"
    )
    flat = a_old.unionByName(a_delta).join(
        b_old.unionByName(b_delta), "k"
    )
    got = sorted(tuple(r) for r in maintained.collect())
    want = sorted(tuple(r) for r in flat.collect())
    assert got == want and len(got) > len(view_old.collect())
    # delta alone contains no old⋈old rows (cost ∝ |delta|)
    dj = incremental_join_delta(a_old, a_delta, b_old, b_delta, "k").collect()
    old_rows = {tuple(r) for r in view_old.collect()}
    assert all(tuple(r) not in old_rows for r in dj)


def test_incremental_join_multiset_duplicates(spark):
    from web_analytics_on_aws_spark.operators.incremental import maintain_join_view

    a_old = spark.createDataFrame([(1, "x"), (1, "x")], "k long, av string")
    a_delta = spark.createDataFrame([(1, "x")], "k long, av string")
    b_old = spark.createDataFrame([(1, 1)], "k long, bv long")
    b_delta = spark.createDataFrame([(1, 1)], "k long, bv long")
    maintained = maintain_join_view(
        a_old.join(b_old, "k"), a_old, a_delta, b_old, b_delta, "k"
    )
    flat = a_old.unionByName(a_delta).join(b_old.unionByName(b_delta), "k")
    assert maintained.count() == flat.count() == 6


def test_change_feed_maintains_rollup_with_deletes(spark, tmp_path):
    """table_changes → apply_change_feed ≡ flat recompute, through a merge
    (update+insert) AND a delete — base table never rescanned."""
    import datetime as dt

    from web_analytics_on_aws_spark.operators.incremental import (
        apply_change_feed,
    )
    from web_analytics_on_aws_spark.sources.snapshots import (
        commit_append,
        delete_where,
        merge_into,
        read_snapshot,
        table_changes,
    )

    t = str(tmp_path / "t")

    def mkdf(rows):
        return spark.createDataFrame(
            [(i, dt.datetime(2026, 3, d, 10), e, float(v)) for i, d, e, v in rows],
            "event_id long, ts timestamp, event_type string, value double",
        )

    commit_append(mkdf([(1, 1, "view", 10), (2, 1, "view", 20), (3, 2, "click", 5)]), t)
    v1 = 1

    def rollup(df):
        return df.groupBy(
            F.to_date("ts").alias("day"), F.col("event_type")
        ).agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )

    base = rollup(read_snapshot(spark, t, version=v1)).persist()
    base.count()

    merge_into(
        spark, t, mkdf([(2, 1, "view", 99), (4, 2, "cart", 7)]), ["event_id"]
    )
    delete_where(spark, t, "event_type = 'click'")

    changes = table_changes(spark, t, v1)
    maintained = apply_change_feed(base, changes, rollup, ["day", "event_type"], ["n", "sv"])
    flat = rollup(read_snapshot(spark, t))

    def canon(df):
        return sorted(
            (str(r["day"]), r["event_type"], r["n"], str(r["sv"]))
            for r in df.collect()
        )

    assert canon(maintained) == canon(flat)
    # the deleted 'click' group vanished entirely (zero-count drop-out)
    assert all(e != "click" for _, e, _, _ in canon(maintained))

    # ADVICE r2: signed sum ordered FIRST — a group whose sum legitimately
    # reaches zero must survive (only the explicit count_col gates drop-out)
    def rollup_sum_first(df):
        return df.groupBy(
            F.to_date("ts").alias("day"), F.col("event_type")
        ).agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
            F.count("*").cast("long").alias("n"),
        )

    base2 = rollup_sum_first(read_snapshot(spark, t, version=v1))
    merge_into(
        spark, t,
        mkdf([(1, 1, "view", -99)]),  # day-1 view now {−99, 99}: sv=0, n=2
        ["event_id"],
    )
    changes2 = table_changes(spark, t, v1)
    kept = apply_change_feed(
        base2, changes2, rollup_sum_first, ["day", "event_type"],
        ["sv", "n"], count_col="n",
    )
    day1_view = [
        r for r in kept.collect()
        if str(r["day"]) == "2026-03-01" and r["event_type"] == "view"
    ]
    assert len(day1_view) == 1 and float(day1_view[0]["sv"]) == 0.0

    # count_col must be one of sum_measures; unlisted base measures refuse
    with pytest.raises(ValueError, match="count_col"):
        apply_change_feed(base2, changes2, rollup_sum_first,
                          ["day", "event_type"], ["sv", "n"], count_col="zz")
    with pytest.raises(ValueError, match="not listed"):
        apply_change_feed(base2, changes2, rollup_sum_first,
                          ["day", "event_type"], ["sv"], count_col="sv")
    base.unpersist()


def test_follow_table_rollup_tracks_source_exactly_once(spark, tmp_path):
    """A rollup view follows the source table across append/merge/delete
    ticks: every tick ≡ flat recompute, an idle tick no-ops, and a
    re-driven tick (same source head) applies nothing twice."""
    import datetime as dt

    from web_analytics_on_aws_spark.operators.incremental import (
        follow_table_rollup,
    )
    from web_analytics_on_aws_spark.sources.snapshots import (
        commit_append,
        delete_where,
        merge_into,
        read_snapshot,
    )

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")

    def mkdf(rows):
        return spark.createDataFrame(
            [(i, dt.datetime(2026, 3, d, 10), e, float(v)) for i, d, e, v in rows],
            "event_id long, ts timestamp, event_type string, value double",
        )

    def rollup(df):
        return df.groupBy(
            F.to_date("ts").alias("day"), F.col("event_type")
        ).agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )

    def tick():
        return follow_table_rollup(
            spark, src, view, rollup, ["day", "event_type"], ["n", "sv"]
        )

    def assert_view_fresh():
        def canon(df):
            return sorted(
                (str(r["day"]), r["event_type"], r["n"], str(r["sv"]))
                for r in df.collect()
            )

        assert canon(read_snapshot(spark, view)) == canon(
            rollup(read_snapshot(spark, src))
        )

    commit_append(mkdf([(1, 1, "view", 10), (2, 1, "click", 5)]), src)
    assert tick()["bootstrap"] is True
    assert_view_fresh()

    commit_append(mkdf([(3, 2, "view", 7)]), src)
    merge_into(spark, src, mkdf([(1, 1, "view", 99), (4, 2, "cart", 3)]), ["event_id"])
    r = tick()
    assert r["applied"] and not r["bootstrap"]
    assert_view_fresh()

    delete_where(spark, src, "event_type = 'click'")
    assert tick()["applied"]
    assert_view_fresh()

    # idle tick: nothing new → no-op, view version unchanged
    from web_analytics_on_aws_spark.sources.snapshots import current_version

    v = current_version(view)
    assert tick()["applied"] is False
    assert current_version(view) == v
