"""Materialized IVF index over snapshot tables — the production ANN
deployment SCALE.md prescribes, as working code.

`similarity.ivf_topk` / `ivfpq_adc_topk` re-assign cells on every run (fine
for one-shot queries; linear in corpus). This module materializes the
index once: vectors are stamped with their coarse cell
(`similarity.ivf_assign`), laid out range-clustered on ``centroid_id`` so
every data file covers a tight cell envelope, and committed to a snapshot
table (ACID, exactly-once appendable from a stream via txn stamps). The
trained quantizer persists in a sibling ``<table>__centroids`` snapshot
table so build, append, and probe always agree on cell geometry.

Probing reads through the ``snapshot`` Python DataSource with a
``centroid_id IN (cells)`` predicate: file-level min/max skipping (now
understanding ``In``) opens only the files whose envelope intersects a
probed cell — at 100 TB a probe reads ~nprobe/num_centroids of the data
FILES, not just of the rows, and appends never rewrite the index (new
files carry their own envelopes).

Cites: Jégou et al., TPAMI 2011 (IVF); the layout trick is the same
cluster_rewrite/z-order envelope argument from operators/maintenance.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from web_analytics_on_aws_spark.operators.similarity import (
    _pair_sim,
    _with_prep,
    as_double_vec,
    cosine_similarity,
    deterministic_centroids,
    ivf_assign,
    kmeans_refine,
)
from web_analytics_on_aws_spark.sources import snapshots


def _centroids_table(table: str) -> str:
    return table + "__centroids"


def _layout(assigned: DataFrame, files_hint: int) -> DataFrame:
    """Range-cluster on the cell id so each data file covers a tight
    centroid envelope (what makes the probe's In-filter skip files)."""
    return assigned.repartitionByRange(files_hint, "centroid_id").sortWithinPartitions(
        "centroid_id"
    )


def build_ivf_index(
    corpus: DataFrame,
    table: str,
    num_centroids: int = 16,
    kmeans_iterations: int = 0,
    files_hint: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Create (overwrite) the materialized index: train/seed the coarse
    quantizer, persist it, assign + cluster + commit the corpus. Returns
    the index table's snapshot version.

    Geometry consistency: the two tables commit separately (no cross-table
    transaction in the snapshot layer), so every index ROW carries the
    ``quantizer_version`` it was assigned under, and ``probe``/``append``
    time-travel-read the centroids AT that version — a rebuild racing a
    probe, or a crash between the two commits, can never pair rows with a
    quantizer that didn't stamp them."""
    cents = (
        kmeans_refine(corpus, num_centroids, kmeans_iterations, id_col, vec_col)
        if kmeans_iterations > 0
        else deterministic_centroids(corpus, num_centroids, id_col, vec_col)
    )
    qv = snapshots.commit_overwrite(cents, _centroids_table(table))
    assigned = ivf_assign(corpus, cents, id_col, vec_col).withColumn(
        "quantizer_version", F.lit(qv).cast("int")
    )
    return snapshots.commit_overwrite(_layout(assigned, files_hint), table)


def append_to_index(
    batch_df: DataFrame,
    table: str,
    txn: tuple[str, int] | None = None,
    files_hint: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Assign a new batch against the PERSISTED quantizer and append it —
    the ``foreachBatch`` body of a streaming index maintainer. With
    ``txn=(app_id, batch_id)`` the append is exactly-once under replay
    (snapshot txn-stamp protocol); the index never rewrites existing
    files."""
    spark = batch_df.sparkSession
    iv = snapshots.current_version(table)
    qv = _index_quantizer_version(spark, table, iv)
    cents = snapshots.read_snapshot(spark, _centroids_table(table), version=qv)
    assigned = ivf_assign(batch_df, cents, id_col, vec_col).withColumn(
        "quantizer_version", F.lit(qv).cast("int")
    )
    out = snapshots.commit_append(_layout(assigned, files_hint), table, txn=txn)
    # A rebuild racing this append would change the quantizer under us
    # (commit_append's CAS retry happily lands on the new head): verify the
    # committed head is still single-version and fail LOUDLY if not — the
    # mixed state is repairable by rebuilding, never silently probed.
    _index_quantizer_version(spark, table, snapshots.current_version(table))
    return out


def _index_quantizer_version(
    spark: SparkSession, table: str, version: int | None = None
) -> int:
    """The single quantizer version the index's rows were stamped with
    (raises if a half-migrated index mixes versions — that state is
    unreachable through this module's API).

    Resolved from parquet FOOTER min/max of the constant
    ``quantizer_version`` column — metadata-only reads over the manifest's
    file list (the same cost class as scan planning), never a row scan:
    probes and appends must not read the corpus to learn its geometry."""
    import pyarrow.parquet as pq

    cur = version if version is not None else snapshots.current_version(table)
    if cur is None:
        raise FileNotFoundError(f"no index snapshots at {table}")
    files = snapshots._read_manifest(table, cur)["files"]
    versions: set[int] = set()
    for f in files:
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        idx = names["quantizer_version"]
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                # stats disabled on this file — fall back to scanning it
                versions.update(
                    int(r[0])
                    for r in spark.read.parquet(f)
                    .select("quantizer_version")
                    .distinct()
                    .collect()
                )
                break
            versions.add(int(st.min))
            versions.add(int(st.max))
    if len(versions) != 1:
        raise ValueError(
            f"index {table} mixes quantizer versions {sorted(versions)}; rebuild it"
        )
    return versions.pop()


def probe_ivf_index(
    spark: SparkSession,
    table: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    reader: str = "native",
    rank_rounding: int | None = None,
) -> DataFrame:
    """Approximate top-k against the materialized index: pick each query's
    ``nprobe`` nearest cells from the persisted quantizer, read only the
    probed cells, brute-force exactly within. Output: (query_id, vec_id,
    sim, rank) — same contract as ``similarity.ivf_topk``, and identical
    results for the same quantizer and nprobe.

    ``rank_rounding``: rank on ``round(sim, r)`` with an id tiebreak
    instead of the raw float — the cross-engine-stable ordering an
    oracle-checked consumer needs (two sims within 1e-r become an explicit
    id-ordered tie rather than an engine-dependent float comparison).
    Default None keeps raw-sim ordering.

    ``reader="native"`` (default) scans through the JVM parquet reader
    with the ``centroid_id IN (probed)`` predicate pushed into the scan —
    the range-clustered layout makes row-group min/max skip non-probed
    cells natively, with none of the Python DataSource's per-file worker
    overhead. ``reader="datasource"`` goes through
    ``spark.read.format("snapshot")`` instead, where the same predicate
    prunes at FILE level during planning (the path that also serves time
    travel/evolution reads). At toy bench scale the two measure equal
    (probe wall time is fixed overhead there — SCALE.md); the index's real
    win is reading nprobe/num_centroids of the BYTES, which only shows
    once per-file data dwarfs per-file constants."""
    from web_analytics_on_aws_spark.sources.snapshot_datasource import (
        SnapshotDataSource,
    )

    # Registration is idempotent. File skipping additionally needs
    # spark.sql.python.filterPushdown.enabled=true — set by the session
    # factory (session.py), deliberately NOT flipped here: without it the
    # probe stays correct (the In filter evaluates post-scan), just unpruned,
    # and a caller's explicit disable is honored.
    spark.dataSource.register(SnapshotDataSource)
    # Pin ONE index version for the whole probe: quantizer resolution and
    # the data read must see the same snapshot, or a rebuild landing
    # between them would pair rows with the wrong geometry.
    iv = snapshots.current_version(table)
    if iv is None:
        raise FileNotFoundError(f"no index snapshots at {table}")
    qv = _index_quantizer_version(spark, table, iv)
    cents = snapshots.read_snapshot(spark, _centroids_table(table), version=qv)
    qscored = queries.join(F.broadcast(cents)).select(
        query_id_col,
        "qv",
        "centroid_id",
        cosine_similarity(as_double_vec("qv"), F.col("cv")).alias("csim"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.desc("csim"), F.asc("centroid_id"))
    probes = (
        qscored.withColumn("__pr", F.row_number().over(wq))
        .filter(F.col("__pr") <= nprobe)
        .select(query_id_col, "qv", "centroid_id")
    )
    # Bounded collect by the broadcast-small query contract (≤ |queries|·nprobe ids)
    cells = sorted(
        {r["centroid_id"] for r in probes.select("centroid_id").distinct().collect()}
    )
    if reader == "native":
        index = snapshots.read_snapshot(spark, table, version=iv).filter(
            F.col("centroid_id").isin(cells)
        )
    else:
        index = (
            spark.read.format("snapshot")
            .option("path", table)
            .option("version", str(iv))
            .load()
            .filter(F.col("centroid_id").isin(cells))
        )
    scored = (
        _with_prep(index, vec_col, "__dv", "__nrm")
        .join(F.broadcast(_with_prep(probes, "qv", "__qdv", "__qnrm")), "centroid_id")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            _pair_sim("__dv", "__nrm", "__qdv", "__qnrm").alias("sim"),
        )
    )
    rank_key = (
        F.round("sim", rank_rounding) if rank_rounding is not None
        else F.col("sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc(rank_key), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
