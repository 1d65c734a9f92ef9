"""Edge-semantics tests for the temporal join operators (ties, strictness,
band boundaries) against hand-computed expectations — the oracle test covers
the bulk path at data scale."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from web_analytics_on_aws_spark.operators.temporal import asof_join, range_count_join


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_asof_backward_picks_latest_prior(spark):
    left = _mk(
        spark,
        [(1, _ts("2024-01-01T10:00:00")), (1, _ts("2024-01-01T12:00:00"))],
        ["k", "lts"],
    )
    right = _mk(
        spark,
        [
            (1, _ts("2024-01-01T09:00:00"), "a"),
            (1, _ts("2024-01-01T11:00:00"), "b"),
            (1, _ts("2024-01-01T13:00:00"), "c"),
        ],
        ["k", "rts", "v"],
    )
    out = {
        (r.k, r.lts): r.v
        for r in asof_join(left, right, ["k"], "lts", "rts", ["v"]).collect()
    }
    assert out[(1, _ts("2024-01-01T10:00:00"))] == "a"
    assert out[(1, _ts("2024-01-01T12:00:00"))] == "b"


def test_asof_tie_inclusive_vs_strict(spark):
    left = _mk(spark, [(1, _ts("2024-01-01T10:00:00"))], ["k", "lts"])
    right = _mk(
        spark,
        [
            (1, _ts("2024-01-01T09:00:00"), "before"),
            (1, _ts("2024-01-01T10:00:00"), "tie"),
        ],
        ["k", "rts", "v"],
    )
    incl = asof_join(left, right, ["k"], "lts", "rts", ["v"]).collect()[0]
    strict = asof_join(left, right, ["k"], "lts", "rts", ["v"], strict=True).collect()[0]
    assert incl.v == "tie"
    assert strict.v == "before"


def test_asof_no_prior_row_yields_null_and_keys_isolate(spark):
    left = _mk(
        spark,
        [(1, _ts("2024-01-01T08:00:00")), (2, _ts("2024-01-01T10:00:00"))],
        ["k", "lts"],
    )
    right = _mk(spark, [(1, _ts("2024-01-01T09:00:00"), "a")], ["k", "rts", "v"])
    out = {r.k: r.v for r in asof_join(left, right, ["k"], "lts", "rts", ["v"]).collect()}
    assert out[1] is None  # right row is after the left row
    assert out[2] is None  # other key never leaks across partitions


def test_range_count_band_boundaries(spark):
    base = _ts("2024-01-01T10:00:00")
    left = _mk(spark, [(100, 1, base)], ["id", "k", "lts"])
    right = _mk(
        spark,
        [
            (1, base - datetime.timedelta(hours=1)),        # == lower bound: in
            (1, base - datetime.timedelta(minutes=30)),     # inside: in
            (1, base),                                      # == upper bound: out
            (1, base - datetime.timedelta(hours=1, seconds=1)),  # below: out
            (2, base - datetime.timedelta(minutes=10)),     # other key: out
        ],
        ["k", "rts"],
    )
    out = range_count_join(
        left, right, ["k"], "lts", "rts", 3_600 * 1_000_000, "n"
    ).collect()
    assert len(out) == 1 and out[0].n == 2


def test_range_count_zero_matches_kept(spark):
    left = _mk(spark, [(7, 1, _ts("2024-01-01T10:00:00"))], ["id", "k", "lts"])
    right = spark.createDataFrame(
        [], "k int, rts timestamp"
    )
    out = range_count_join(
        left, right, ["k"], "lts", "rts", 3_600 * 1_000_000, "n"
    ).collect()
    assert len(out) == 1 and out[0].n == 0


def test_asof_matches_bruteforce_random(spark):
    import random

    rnd = random.Random(7)
    base = _ts("2024-01-01T00:00:00")
    left_rows = [
        (rnd.randint(1, 5), base + datetime.timedelta(seconds=rnd.randint(0, 5000)))
        for _ in range(80)
    ]
    right_rows = [
        (rnd.randint(1, 5), base + datetime.timedelta(seconds=rnd.randint(0, 5000)), i)
        for i in range(120)
    ]
    # unique (k, rts): drop duplicate key-ts pairs keeping max payload
    best = {}
    for k, rts, v in right_rows:
        best[(k, rts)] = max(best.get((k, rts), -1), v)
    right_rows = [(k, rts, v) for (k, rts), v in best.items()]

    left = _mk(spark, left_rows, ["k", "lts"])
    right = _mk(spark, right_rows, ["k", "rts", "v"])
    got = {
        (r.k, r.lts): r.v
        for r in asof_join(left, right, ["k"], "lts", "rts", ["v"]).collect()
    }
    for k, lts in left_rows:
        cands = [(rts, v) for (rk, rts, v) in right_rows if rk == k and rts <= lts]
        want = max(cands)[1] if cands else None
        assert got[(k, lts)] == want, (k, lts)
