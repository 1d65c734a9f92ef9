"""Incremental exact deduplication against a PERSISTED digest index.

The 100 TB ingestion reality: the corpus arrives in shards (a crawl dump a
day), and re-running global dedup over the whole corpus per shard is an
O(corpus) scan each time. The standard production shape (CCNet/RefinedWeb
pipelines) is instead:

1. digest the NEW shard's documents (16-byte content hash — rows reduce to
   digests before anything shuffles);
2. dedup WITHIN the shard (min-key survivor per digest — one partial-agg
   shuffle over shard-sized data);
3. anti-join the survivors against the persisted digest INDEX (shuffle on
   the digest key — uniformly distributed by construction, skew-free; at
   scale the index is bucketized on digest so the join co-locates with
   zero exchange, `operators/maintenance.py::bucketize` discipline);
4. append the accepted digests to the index ATOMICALLY, txn-stamped — a
   replayed shard (at-least-once upstream delivery) is a no-op, so the
   index can never double-admit under retries.

Cost per shard is O(shard + matching index partitions), never O(corpus).
The index row is (digest, key) — 24ish bytes/doc, ~2.4 TB of index for a
10^11-doc corpus, itself a snapshot table with time travel (audit "when
did we first see this document?" = one index read).

Reference scope note: the reference pipeline has no dedup surface
(SURVEY §2 ext); this extends the mandated exact-dedup operator family
(`operators/dedup.py`, cites there) to the incremental regime.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from web_analytics_on_aws_spark.sources import snapshots

INDEX_SCHEMA = "digest string, key long"


def _digested(batch: DataFrame, key_col: str, text_col: str) -> DataFrame:
    # md5 of the raw text: 16-byte content identity, same digest the
    # one-shot exact dedup keys on (operators/dedup.py) so the two paths
    # agree document-for-document.
    return batch.select(
        F.md5(F.col(text_col)).alias("digest"),
        F.col(key_col).cast("long").alias("key"),
    )


def dedup_shard_against_index(
    spark: SparkSession,
    batch: DataFrame,
    index_table: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    txn: tuple[str, int] | None = None,
    corpus_table: str | None = None,
) -> dict:
    """Admit a shard against the persisted digest index.

    Returns ``{"accepted": DataFrame(of batch rows that survived),
    "n_batch", "n_within_shard_dups", "n_index_dups", "n_accepted",
    "index_version"}``.

    **Exactly-once under replay** (``txn`` = (app, shard_id), the Delta
    txnAppId protocol): accepted rows are committed to ``corpus_table``
    (when given) BEFORE their digests are admitted to the index, both
    stamped with the same txn. Every crash point then replays cleanly:
    crash before the corpus commit → full recompute (index unchanged, the
    anti join yields the same deterministic set); crash between the two
    commits → the corpus commit no-ops on replay, the index admission
    completes; crash after both → the anti join now sees the admitted
    digests, accepts nothing, and both txn-stamped commits no-op. A shard
    can never be double-admitted or half-admitted.

    Plan shape: one partial-agg shuffle on digest (within-shard survivor),
    one anti join on digest vs the index (broadcast while the index is
    small, else shuffle on the uniformly-distributed digest — skew-free by
    construction; at 100 TB keep the index bucketized on digest so the
    anti join co-locates with zero exchange), one semi join back to the
    shard's full rows (document bodies never ride through the index join).
    """
    d = _digested(batch, key_col, text_col)
    n_batch = d.count()
    # within-shard survivor: min key per digest (deterministic)
    survivors = d.groupBy("digest").agg(F.min("key").alias("key"))
    n_survivors = survivors.count()

    if snapshots.current_version(index_table) is None:
        fresh = survivors
        n_index_dups = 0
    else:
        index = snapshots.read_snapshot(spark, index_table).select("digest")
        fresh = survivors.join(index, "digest", "left_anti")
        n_index_dups = n_survivors - fresh.count()

    accepted_keys = fresh.select("key")
    accepted = batch.join(
        accepted_keys.withColumnRenamed("key", key_col), key_col, "left_semi"
    )
    if corpus_table is not None:
        # corpus first (see crash matrix above): its rows must be durable
        # before the index forever refuses their digests
        snapshots.commit_append(accepted, corpus_table, txn=txn)
    v = snapshots.commit_append(
        fresh.select("digest", "key"), index_table, txn=txn
    )
    return {
        "accepted": accepted,
        "n_batch": n_batch,
        "n_within_shard_dups": n_batch - n_survivors,
        "n_index_dups": n_index_dups,
        "n_accepted": n_survivors - n_index_dups,
        "index_version": v,
    }


def index_stats(spark: SparkSession, index_table: str) -> dict:
    """Footer-only index accounting (no scan): total admitted digests and
    the per-version admission ledger — "how much of each crawl survived"
    straight from manifest statistics."""
    st = snapshots.table_statistics(index_table)
    versions = [
        {"version": h["version"], "operation": h["operation"]}
        for h in snapshots.history(index_table)
    ]
    return {"admitted": st["row_count"], "exact": st["exact"],
            "versions": versions}


def start_incremental_dedup_stream(
    spark: SparkSession,
    source_df: DataFrame,
    index_table: str,
    corpus_table: str,
    checkpoint_dir: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    app_id: str = "incr-dedup",
    available_now: bool = False,
    trigger_seconds: int | None = 60,
):
    """Production mode: crawl shards arriving as a STREAM. Each micro-batch
    runs the full admission (within-batch survivor → index anti join →
    corpus-then-index txn commits) with the micro-batch id as the txn
    stamp — Structured Streaming's checkpoint replay and the snapshot
    layer's txn ledger compose into end-to-end exactly-once admission
    (same protocol as streaming/snapshot_sink.py).

    ``source_df`` is any streaming DataFrame carrying (key_col, text_col);
    dedup state lives ENTIRELY in the index table (no Spark state store) —
    the stream can restart anywhere, on any cluster, and the admission
    ledger is queryable/time-travelable like any snapshot table."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.limit(1).count():
            return
        dedup_shard_against_index(
            spark, batch_df, index_table,
            key_col=key_col, text_col=text_col,
            txn=(app_id, batch_id), corpus_table=corpus_table,
        )

    writer = source_df.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
