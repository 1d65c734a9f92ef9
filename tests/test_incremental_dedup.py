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
    d = batch.select(F.unhex(F.md5("text")).alias("digest"), "doc_id")
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


BASE = ("the quick brown fox jumps over the lazy dog while the sly cat "
        "watches from the warm sunny windowsill every single afternoon")
NEAR = ("the quick brown fox jumps over the lazy dog while the sly cat "
        "watches from the warm sunny windowsill every single evening")
OTHER = ("completely different subject matter entirely about spark "
         "partitions shuffles joins aggregations and columnar storage "
         "formats for analytical workloads")
OTHER_NEAR = ("completely different subject matter entirely about spark "
              "partitions shuffles joins aggregations and columnar storage "
              "formats for analytical pipelines")


def test_near_dedup_incremental_admission(spark, tmp_path):
    from web_analytics_on_aws_spark.operators.incremental_dedup import (
        near_dedup_shard_against_index,
    )

    idx = str(tmp_path / "nidx")
    # shard 1: BASE + a short (unshingleable) doc
    r1 = near_dedup_shard_against_index(
        spark, _shard(spark, [(0, BASE), (1, "hi")]), idx, txn=("nd", 1)
    )
    assert r1["n_accepted"] == 2 and r1["n_index_rejected"] == 0
    # shard 2: near-dup of BASE (reject vs index), OTHER + its near-dup
    # (within-shard: larger key rejected), clean repeat of the short doc
    # (no LSH identity → admitted; exact index handles those)
    r2 = near_dedup_shard_against_index(
        spark,
        _shard(spark, [(10, NEAR), (11, OTHER), (12, OTHER_NEAR), (13, "yo")]),
        idx,
        txn=("nd", 2),
    )
    assert r2["n_index_rejected"] == 1          # NEAR vs admitted BASE
    assert r2["n_within_rejected"] == 1         # OTHER_NEAR loses to OTHER
    assert r2["n_accepted"] == 2                # OTHER + "yo"
    got = {r["doc_id"] for r in r2["accepted"].collect()}
    assert got == {11, 13}


def test_near_dedup_replay_rejects_everything_and_commits_nothing(
    spark, tmp_path
):
    from web_analytics_on_aws_spark.operators.incremental_dedup import (
        near_dedup_shard_against_index,
    )

    idx = str(tmp_path / "nidx")
    near_dedup_shard_against_index(
        spark, _shard(spark, [(0, BASE), (1, OTHER)]), idx, txn=("nd", 1)
    )
    v_sig = current_version(idx + "_sigs")
    v_band = current_version(idx + "_bands")
    # replayed shard: every doc now collides with ITSELF in the index at
    # est_jaccard 1.0 → rejected; txn stamps make both commits no-ops
    r = near_dedup_shard_against_index(
        spark, _shard(spark, [(0, BASE), (1, OTHER)]), idx, txn=("nd", 1)
    )
    assert r["n_accepted"] == 0 and r["n_index_rejected"] == 2
    assert current_version(idx + "_sigs") == v_sig
    assert current_version(idx + "_bands") == v_band


def test_near_dedup_matches_one_shot_lsh_on_planted_corpus(spark, tmp_path):
    """Cross-shard parity: docs the ONE-SHOT minhash_lsh_pairs operator
    pairs up must collapse to a single survivor through the incremental
    path, and unpaired docs must all survive."""
    from web_analytics_on_aws_spark.operators.dedup import minhash_lsh_pairs
    from web_analytics_on_aws_spark.operators.incremental_dedup import (
        near_dedup_shard_against_index,
    )

    all_rows = [(0, BASE), (1, OTHER), (10, NEAR), (11, OTHER_NEAR)]
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            _shard(spark, all_rows), threshold=0.5
        ).collect()
    }
    assert pairs == {(0, 10), (1, 11)}  # planted near-dup structure

    idx = str(tmp_path / "nidx")
    acc = []
    for i, rows in enumerate([all_rows[:2], all_rows[2:]], 1):
        r = near_dedup_shard_against_index(
            spark, _shard(spark, rows), idx, txn=("nd", i)
        )
        acc += [x["doc_id"] for x in r["accepted"].collect()]
    assert sorted(acc) == [0, 1]  # one survivor per near-dup class
