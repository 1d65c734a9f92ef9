"""Materialized IVF index (operators/ann_index.py): probe parity with the
one-shot operator, file-level cell pruning through the snapshot
DataSource's In filter, exactly-once streamed appends."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from web_analytics_on_aws_spark.operators import ann_index, similarity
from web_analytics_on_aws_spark.sources import snapshots
from web_analytics_on_aws_spark.sources.tables import load_table


def _queries(emb, n=3):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )


def test_probe_matches_one_shot_ivf(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    t = str(tmp_path / "idx")
    ann_index.build_ivf_index(emb, t, num_centroids=8)
    q = _queries(emb)
    cents = snapshots.read_snapshot(spark, t + "__centroids")
    want = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in similarity.ivf_topk(
            emb, q, k=5, nprobe=3, centroids=cents
        ).collect()
    }
    for reader in ("native", "datasource"):
        got = {
            (r["query_id"], r["vec_id"], r["rank"])
            for r in ann_index.probe_ivf_index(
                spark, t, q, k=5, nprobe=3, reader=reader
            ).collect()
        }
        assert got == want and len(got) == 15, reader


def test_probe_skips_unprobed_cell_files(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    t = str(tmp_path / "idx")
    # one file per range-cluster → tight centroid envelopes
    ann_index.build_ivf_index(emb, t, num_centroids=8, files_hint=8)
    from pyspark.sql.datasource import In

    from web_analytics_on_aws_spark.sources.snapshot_datasource import (
        SnapshotReader,
        planned_files,
    )

    all_parts = planned_files(SnapshotReader({"path": t}, None).partitions())
    reader = SnapshotReader({"path": t}, None)
    reader.pushFilters([In(("centroid_id",), (0,))])
    pruned = planned_files(reader.partitions())
    assert 0 < len(pruned) < len(all_parts)


def test_append_exactly_once_and_visible(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    t = str(tmp_path / "idx")
    ann_index.build_ivf_index(base, t, num_centroids=8)
    v1 = ann_index.append_to_index(extra, t, txn=("maintainer", 1))
    n1 = snapshots.read_snapshot(spark, t).count()
    # replayed micro-batch: no-op
    v2 = ann_index.append_to_index(extra, t, txn=("maintainer", 1))
    n2 = snapshots.read_snapshot(spark, t).count()
    assert v2 == v1 and n2 == n1 == emb.count()
    # appended vectors are probe-visible: parity with one-shot over the union
    q = _queries(emb, 2)
    cents = snapshots.read_snapshot(spark, t + "__centroids")
    got = {
        (r["query_id"], r["vec_id"])
        for r in ann_index.probe_ivf_index(spark, t, q, k=5, nprobe=8).collect()
    }
    want = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ivf_topk(
            emb, q, k=5, nprobe=8, num_centroids=8, centroids=cents
        ).collect()
    }
    assert got == want


def test_streaming_index_maintenance(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = emb.filter(F.col("vec_id") < 50)
    t = str(tmp_path / "idx")
    ann_index.build_ivf_index(base, t, num_centroids=4)
    landing = str(tmp_path / "landing")
    emb.filter(F.col("vec_id") >= 50).write.parquet(landing)
    stream = (
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", "1")
        .parquet(landing)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, bid: ann_index.append_to_index(b, t, txn=("stream", bid))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = snapshots.read_snapshot(spark, t).count()
    assert n == emb.count()


def test_ivf_geometry_sqrt_rule():
    """√n sizing (plans/corpus_ops._ivf_geometry): C is the smallest power
    of two ≥ √n within [16, 256]; ~4 cells per file — probes then touch
    nprobe·n/C ≈ 4√n rows, sublinear in corpus size."""
    from web_analytics_on_aws_spark.plans.corpus_ops import _ivf_geometry

    assert _ivf_geometry(100) == (16, 8)
    assert _ivf_geometry(500) == (32, 8)
    assert _ivf_geometry(2_000) == (64, 16)
    assert _ivf_geometry(20_000) == (256, 64)
    c_huge, files_huge = _ivf_geometry(10**9)
    assert c_huge == 256 and files_huge == 64  # clamped ceiling
