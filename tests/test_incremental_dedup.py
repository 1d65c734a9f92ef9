"""Incremental exact dedup against a persisted digest index
(operators/incremental_dedup.py): shard-at-a-time admission must converge
to the same corpus as one-shot global dedup, stay exactly-once under
replay, and recover from every crash point in the two-commit sequence."""

from __future__ import annotations

import pyspark.sql.functions as F

from web_analytics_on_aws_spark.operators.incremental_dedup import (
    dedup_shard_against_index,
    index_stats,
    start_incremental_dedup_stream,
)
from web_analytics_on_aws_spark.sources.snapshots import (
    commit_append,
    current_version,
    read_snapshot,
)


def _shard(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


SHARD1 = [(0, "alpha"), (1, "beta"), (2, "alpha")]          # within-shard dup
SHARD2 = [(10, "beta"), (11, "gamma"), (12, "gamma")]       # cross + within
SHARD3 = [(20, "alpha"), (21, "delta")]                     # cross-shard dup


def _run_all(spark, tmp_path, app="dedup"):
    idx = str(tmp_path / "idx")
    corpus = str(tmp_path / "corpus")
    out = []
    for i, rows in enumerate([SHARD1, SHARD2, SHARD3], 1):
        out.append(
            dedup_shard_against_index(
                spark, _shard(spark, rows), idx,
                txn=(app, i), corpus_table=corpus,
            )
        )
    return idx, corpus, out


def test_incremental_matches_global_dedup(spark, tmp_path):
    idx, corpus, out = _run_all(spark, tmp_path)
    got = {
        (r["doc_id"], r["text"])
        for r in read_snapshot(spark, corpus).collect()
    }
    # keys increase across shards, so first-arrival min-key == the global
    # one-shot dedup survivor (min doc_id per distinct text)
    all_rows = SHARD1 + SHARD2 + SHARD3
    expect = {}
    for k, t in all_rows:
        if t not in expect or k < expect[t]:
            expect[t] = k
    assert got == {(k, t) for t, k in expect.items()}
    # per-shard accounting
    assert [o["n_accepted"] for o in out] == [2, 1, 1]
    assert [o["n_within_shard_dups"] for o in out] == [1, 1, 0]
    assert [o["n_index_dups"] for o in out] == [0, 1, 1]
    st = index_stats(spark, idx)
    assert st["admitted"] == 4 and st["exact"]


def test_first_arrival_wins_not_min_key(spark, tmp_path):
    """Incremental semantics are FIRST-ARRIVAL (the earlier shard's
    survivor stands even when a later shard carries a smaller key) —
    the property that lets admission be append-only."""
    idx = str(tmp_path / "idx")
    dedup_shard_against_index(
        spark, _shard(spark, [(100, "omega")]), idx, txn=("d", 1)
    )
    r = dedup_shard_against_index(
        spark, _shard(spark, [(5, "omega")]), idx, txn=("d", 2)
    )
    assert r["n_accepted"] == 0 and r["n_index_dups"] == 1
    rows = read_snapshot(spark, idx).collect()
    assert [(x["key"]) for x in rows] == [100]


def test_replayed_shard_is_noop(spark, tmp_path):
    idx, corpus, _ = _run_all(spark, tmp_path)
    v_idx, v_corpus = current_version(idx), current_version(corpus)
    n = read_snapshot(spark, corpus).count()
    # at-least-once upstream re-delivers shard 2 → nothing moves
    r = dedup_shard_against_index(
        spark, _shard(spark, SHARD2), idx, txn=("dedup", 2),
        corpus_table=corpus,
    )
    assert r["n_accepted"] == 0
    assert current_version(idx) == v_idx
    assert current_version(corpus) == v_corpus
    assert read_snapshot(spark, corpus).count() == n


def test_crash_between_corpus_and_index_commit_replays_cleanly(
    spark, tmp_path
):
    """Crash point 2 of the docstring matrix: corpus commit durable,
    index admission lost. The replay must complete the admission without
    double-writing the corpus."""
    idx = str(tmp_path / "idx")
    corpus = str(tmp_path / "corpus")
    batch = _shard(spark, SHARD1)
    # simulate the half-done first attempt: corpus rows landed (survivors
    # of within-shard dedup), index commit never happened
    from pyspark.sql import Window

    survivors = (
        batch.withColumn("__d", F.md5("text"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__d").orderBy("doc_id")
            ),
        )
        .filter("__rn = 1")
        .select("doc_id", "text")
    )
    commit_append(survivors, corpus, txn=("dedup", 1))
    assert current_version(idx) is None

    r = dedup_shard_against_index(
        spark, batch, idx, txn=("dedup", 1), corpus_table=corpus
    )
    # the replay re-derived the same accepted set, corpus no-oped, index
    # completed — exactly one copy everywhere
    assert r["n_accepted"] == 2
    assert read_snapshot(spark, corpus).count() == 2
    assert read_snapshot(spark, idx).count() == 2
    assert current_version(corpus) == 1


def test_index_join_stays_jvm_side(spark, tmp_path):
    """Plan hygiene: the admission pipeline is pure JVM (digest, agg,
    anti join, semi join) — no Python eval nodes anywhere."""
    idx, _corpus, _ = _run_all(spark, tmp_path)
    batch = _shard(spark, [(30, "alpha"), (31, "epsilon")])
    from web_analytics_on_aws_spark.sources import snapshots

    index = snapshots.read_snapshot(spark, idx).select("digest")
    d = batch.select(F.md5("text").alias("digest"), "doc_id")
    plan = (
        d.join(index, "digest", "left_anti")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_streaming_incremental_dedup(spark, tmp_path):
    """Shards as a stream: two availableNow drains over a growing landing
    dir admit each document once, across restarts, with state ONLY in the
    index table."""
    import json

    landing = tmp_path / "landing"
    landing.mkdir()
    idx = str(tmp_path / "idx")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    def drop(name, rows):
        with open(landing / name, "w") as f:
            for k, t in rows:
                f.write(json.dumps({"doc_id": k, "text": t}) + "\n")

    def drain():
        src = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .json(str(landing))
        )
        q = start_incremental_dedup_stream(
            spark, src, idx, corpus, ckpt, available_now=True
        )
        q.awaitTermination(120)

    drop("s1.jsonl", SHARD1)
    drain()
    assert read_snapshot(spark, corpus).count() == 2  # alpha, beta
    drop("s2.jsonl", SHARD2)
    drop("s3.jsonl", SHARD3)
    drain()  # restart from checkpoint; s1 not re-admitted
    got = {
        (r["doc_id"], r["text"])
        for r in read_snapshot(spark, corpus).collect()
    }
    assert got == {(0, "alpha"), (1, "beta"), (11, "gamma"), (21, "delta")}
    assert read_snapshot(spark, idx).count() == 4
