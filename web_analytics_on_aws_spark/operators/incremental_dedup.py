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

INDEX_SCHEMA = "digest binary, key long"


def _digested(batch: DataFrame, key_col: str, text_col: str) -> DataFrame:
    # md5 of the raw text — same content identity the one-shot exact dedup
    # keys on (operators/dedup.py), stored as 16 RAW bytes (unhex), not the
    # 32-char hex string: digests are incompressible, so at 10^11 docs the
    # hex form would double the index's permanent footprint for nothing.
    return batch.select(
        F.unhex(F.md5(F.col(text_col))).alias("digest"),
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
    collect_stats: bool = True,
) -> dict:
    """Admit a shard against the persisted digest index.

    Returns ``{"accepted": DataFrame(of batch rows that survived),
    "n_batch", "n_within_shard_dups", "n_index_dups", "n_accepted",
    "index_version"}``. ``collect_stats=False`` skips the three count
    actions (the admission ledger reads None) — the production fast path
    when only the commits matter; per-version counts remain recoverable
    afterwards from the index table's footer statistics.

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
    n_batch = d.count() if collect_stats else None
    # within-shard survivor: min key per digest (deterministic)
    survivors = d.groupBy("digest").agg(F.min("key").alias("key"))
    n_survivors = survivors.count() if collect_stats else None

    if snapshots.current_version(index_table) is None:
        fresh = survivors
        n_index_dups = 0 if collect_stats else None
    else:
        index = snapshots.read_snapshot(spark, index_table).select("digest")
        fresh = survivors.join(index, "digest", "left_anti")
        n_index_dups = (
            n_survivors - fresh.count() if collect_stats else None
        )

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
        "n_within_shard_dups": (
            n_batch - n_survivors if collect_stats else None
        ),
        "n_index_dups": n_index_dups,
        "n_accepted": (
            n_survivors - n_index_dups if collect_stats else None
        ),
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


# ---------------------------------------------------------------------------
# NEAR-dup incremental admission: MinHash-LSH band index persisted as
# snapshot tables, so fuzzy dedup also runs O(shard) per shard.
# ---------------------------------------------------------------------------


def _sig_table(index_table: str) -> str:
    return index_table + "_sigs"


def _band_table(index_table: str) -> str:
    return index_table + "_bands"


def _banded(sig_df: DataFrame, bands: int, rows: int) -> DataFrame:
    # (key, band, bkey): band keys are 64-bit xxhash64 over the band's
    # signature slice — at 10^11 docs a 32-bit band key would birthday
    # into false rejects; 64-bit keeps the collision mass negligible
    return sig_df.select(
        "key",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> named_struct('band', b, "
                f"'bkey', xxhash64(cast(b AS string), "
                f"cast(slice(sig, b*{rows}+1, {rows}) AS string))))"
            )
        ).alias("bk"),
    ).select("key", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))


def near_dedup_shard_against_index(
    spark: SparkSession,
    batch: DataFrame,
    index_table: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
    txn: tuple[str, int] | None = None,
) -> dict:
    """Admit a shard under NEAR-duplicate semantics (banded MinHash-LSH,
    the Lee et al. 2022 / RefinedWeb fuzzy-dedup regime) against a
    persisted two-table index:

    - ``<index>_sigs``  (key, sig array<int>) — one 128-int signature per
      admitted doc (verification side);
    - ``<index>_bands`` (key, band, bkey)     — 32 band keys per admitted
      doc (candidate-lookup side; at scale bucketized on (band, bkey)).

    Admission: shard docs' bands probe the band index; only BAND-COLLIDING
    (candidate) pairs fetch signatures and verify ``est_jaccard >=
    threshold`` — the S-curve guarantees recall, verification restores
    precision (no doc is rejected on a band collision alone). Within-shard
    near-dups resolve first (min-key survivor of each candidate pair,
    verified the same way). Both index commits carry the same txn stamp —
    the crash/replay matrix of :func:`dedup_shard_against_index` applies
    unchanged.

    Returns ``{"accepted": DataFrame, "n_batch", "n_within_rejected",
    "n_index_rejected", "n_accepted"}``. Empty-shingle docs (texts shorter
    than ``shingle_k`` words) have no LSH identity and are admitted as-is;
    route them through the EXACT digest index instead."""
    from web_analytics_on_aws_spark.operators.dedup import (
        minhash_signature,
        with_shingles,
    )

    rows = num_hashes // bands
    sh = with_shingles(batch, text_col, shingle_k)
    sig = (
        sh.select(
            F.col(key_col).cast("long").alias("key"),
            F.when(
                F.size("shingles") > 0,
                minhash_signature("shingles", num_hashes),
            ).alias("sig"),
        )
        .persist()
    )
    try:
        n_batch = sig.count()
        hashable = sig.filter(F.col("sig").isNotNull())
        shard_bands = _banded(hashable, bands, rows)

        est = (
            F.expr(
                "aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)),"
                " 0, (acc, v) -> acc + v)"
            )
            / F.lit(float(num_hashes))
        )

        def _verified_pairs(cand: DataFrame, sig_b_df: DataFrame) -> DataFrame:
            # candidate (key_a, key_b) pairs → keep those whose signature
            # agreement clears the threshold
            return (
                cand.dropDuplicates(["key_a", "key_b"])
                .join(
                    hashable.select(
                        F.col("key").alias("key_a"), F.col("sig").alias("sig_a")
                    ),
                    "key_a",
                )
                .join(
                    sig_b_df.select(
                        F.col("key").alias("key_b"), F.col("sig").alias("sig_b")
                    ),
                    "key_b",
                )
                .filter(F.round(est, 6) >= threshold)
                .select("key_a", "key_b")
            )

        # 1. within-shard: survivor = smaller key of every verified pair
        l, r = shard_bands.alias("l"), shard_bands.alias("r")
        within_cand = l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.key") < F.col("r.key")),
        ).select(F.col("l.key").alias("key_a"), F.col("r.key").alias("key_b"))
        within_rejected = (
            _verified_pairs(within_cand, hashable)
            .select(F.col("key_b").alias("key"))
            .distinct()
        )
        shard_kept = sig.join(within_rejected, "key", "left_anti")

        # 2. vs index: any verified hit rejects the shard doc
        n_index_rejected = 0
        if snapshots.current_version(_band_table(index_table)) is not None:
            idx_bands = snapshots.read_snapshot(spark, _band_table(index_table))
            idx_sigs = snapshots.read_snapshot(spark, _sig_table(index_table))
            kept_bands = _banded(
                shard_kept.filter(F.col("sig").isNotNull()), bands, rows
            )
            idx_cand = kept_bands.alias("s").join(
                idx_bands.alias("i"),
                (F.col("s.band") == F.col("i.band"))
                & (F.col("s.bkey") == F.col("i.bkey")),
            ).select(
                F.col("s.key").alias("key_a"), F.col("i.key").alias("key_b")
            )
            index_rejected = (
                _verified_pairs(idx_cand, idx_sigs)
                .select(F.col("key_a").alias("key"))
                .distinct()
            )
            n_index_rejected = index_rejected.count()
            shard_kept = shard_kept.join(index_rejected, "key", "left_anti")

        n_kept = shard_kept.count()

        # 3. admit: signatures first, then bands (band probe finding a key
        # whose signature is missing would break verification — commit in
        # dependency order, same discipline as corpus-before-index)
        admitted_sigs = shard_kept.filter(F.col("sig").isNotNull())
        snapshots.commit_append(
            admitted_sigs.select("key", "sig"), _sig_table(index_table),
            txn=txn,
        )
        snapshots.commit_append(
            _banded(admitted_sigs, bands, rows), _band_table(index_table),
            txn=txn,
        )

        accepted = batch.join(
            shard_kept.select(F.col("key").alias(key_col)), key_col,
            "left_semi",
        )
        return {
            "accepted": accepted,
            "n_batch": n_batch,
            "n_within_rejected": n_batch - n_kept - n_index_rejected,
            "n_index_rejected": n_index_rejected,
            "n_accepted": n_kept,
        }
    finally:
        sig.unpersist()
