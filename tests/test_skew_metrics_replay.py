"""Salted aggregation equivalence, per-batch metrics sink, error replay,
and LSH near-dup recall."""

from __future__ import annotations

import glob
import json

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE
from web_analytics_on_aws_spark import plans
from web_analytics_on_aws_spark.operators.skew import salted_agg, salted_join
from web_analytics_on_aws_spark.sources.tables import load_table
from web_analytics_on_aws_spark.streaming.ingest_stream import (
    replay_errors,
    run_ingest_once,
)

plans.load_all()


def test_salted_agg_exactly_matches_plain_groupby(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    plain = {
        (r["user_id"]): (r["cnt"], r["total_value"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .collect()
    }
    salted = {
        (r["user_id"]): (r["cnt"], r["total_value"])
        for r in salted_agg(
            ev,
            ["user_id"],
            {
                "cnt": (F.count("*"), F.sum("cnt")),
                "total_value": (
                    F.sum(F.col("value").cast("decimal(18,2)")),
                    F.sum("total_value").cast("double"),
                ),
            },
        ).collect()
    }
    assert plain == salted


def test_metrics_sink_counts_per_batch(spark, tmp_path):
    import os

    from tests.test_streaming import _rec, _write_landing_file

    tmp = str(tmp_path)
    bad = _rec(1)
    bad["timestamp"] = "nope"
    _write_landing_file(f"{tmp}/landing", "a.jsonl", [_rec(i) for i in range(4)] + [bad])
    run_ingest_once(
        spark, f"{tmp}/landing", f"{tmp}/raw", f"{tmp}/error", f"{tmp}/ckpt",
        metrics_path=f"{tmp}/metrics",
    )
    files = glob.glob(f"{tmp}/metrics/batch-*.json")
    assert files
    agg = {"total": 0, "valid": 0, "invalid": 0}
    for fn in files:
        m = json.load(open(fn))
        for k in agg:
            agg[k] += m[k]
    assert agg == {"total": 5, "valid": 4, "invalid": 1}


def test_replay_errors_recovers_fixed_records(spark, tmp_path):
    """Quarantined garbage stays quarantined; a record that was invalid only
    by timestamp format is recoverable after producer fix (simulated by
    rewriting the error zone content)."""
    import os

    from tests.test_streaming import _rec, _write_landing_file

    tmp = str(tmp_path)
    bad = _rec(7)
    bad["timestamp"] = "2026-03-02 13:45:00"
    _write_landing_file(f"{tmp}/landing", "a.jsonl", [bad, "total garbage"])
    run_ingest_once(spark, f"{tmp}/landing", f"{tmp}/raw", f"{tmp}/error", f"{tmp}/ckpt")
    assert spark.read.text(f"{tmp}/error").count() == 2

    # producer-side fix: rewrite the recoverable record's timestamp in place
    fixed_dir = f"{tmp}/error_fixed"
    os.makedirs(fixed_dir, exist_ok=True)
    with open(f"{fixed_dir}/fixed.jsonl", "w") as f:
        for r in spark.read.text(f"{tmp}/error").collect():
            f.write(r["value"].replace("2026-03-02 13:45:00", "2026-03-02T13:45:00Z") + "\n")

    replay_errors(spark, fixed_dir, f"{tmp}/raw", f"{tmp}/error2")
    assert spark.read.text(f"{tmp}/raw").count() == 1  # recovered
    assert spark.read.text(f"{tmp}/error2").count() == 1  # garbage re-quarantined


def test_embedding_lsh_near_dup_is_subset_with_exact_scores(spark):
    exact = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in plans.QUERIES["embedding_near_dup_pairs"](spark, SF_SMOKE).collect()
    }
    from web_analytics_on_aws_spark.operators import similarity
    from web_analytics_on_aws_spark.sources.tables import load_table as _lt

    lsh = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in similarity.lsh_cosine_pairs(
            _lt(spark, SF_SMOKE, "embeddings"), threshold=0.4, bands=8, planes=4
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert exact[k] == v
    # sign-LSH with 4 planes keeps decent recall on cos>=0.4 pairs
    assert len(lsh) >= len(exact) * 0.3


def test_salted_join_exactly_matches_plain_join(spark):
    """Each fact row matches exactly one replica of each build row, so the
    salted join is the plain join's multiset — row-for-row."""
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(cust, "o_custkey")
    salted = salted_join(orders, cust, on=["o_custkey"], salt_buckets=8)

    assert salted.count() == plain.count()
    # no fact row duplicated by the replication (o_orderkey is unique and
    # custkey is a key of customer → exactly one output row per order)
    assert (
        salted.groupBy("o_orderkey").count().filter(F.col("count") > 1).count()
        == 0
    )
    agg = lambda df: sorted(
        (r["c_mktsegment"], r["cnt"], r["tot"])
        for r in df.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("tot"),
        )
        .collect()
    )
    assert agg(salted) == agg(plain)
