"""Training-shard export (operators/export.py): size bounds, manifest
integrity, order round-trip, partition-pruned shard-subset reads."""

import pytest
from pyspark.sql import functions as F

from web_analytics_on_aws_spark.operators import export, sampling


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(1, 1001).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )


def test_write_read_roundtrip_and_sizes(spark, corpus, tmp_path):
    ordered = sampling.epoch_shuffle(corpus, epoch=1)
    path = str(tmp_path / "shards")
    manifest = export.write_training_shards(ordered, path, rows_per_shard=256)
    assert manifest["total_rows"] == 1000
    assert manifest["n_shards"] == 4  # ceil(1000/256)
    sizes = [s["n_rows"] for s in manifest["shards"].values()]
    assert sizes == [256, 256, 256, 232]
    back = export.read_training_shards(spark, path)
    rows = back.select("train_pos", "doc_id").collect()
    assert [r["train_pos"] for r in rows] == list(range(1, 1001))
    # order is the epoch-1 shuffle order, deterministically reproducible
    again = sampling.epoch_shuffle(corpus, epoch=1).select("train_pos", "doc_id")
    assert [r["doc_id"] for r in rows] == [
        r["doc_id"] for r in again.orderBy("train_pos").collect()
    ]


def test_shard_subset_read_is_partition_pruned(spark, corpus, tmp_path):
    ordered = sampling.epoch_shuffle(corpus, epoch=0)
    path = str(tmp_path / "shards")
    export.write_training_shards(ordered, path, rows_per_shard=100)
    sub = export.read_training_shards(spark, path, shards=[2, 3])
    plan = sub._sc._jvm.PythonSQLUtils.explainString(
        sub._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert "shard_id" in plan.split("PartitionFilters")[1][:300]
    got = sub.select("train_pos").collect()
    assert [r["train_pos"] for r in got] == list(range(201, 401))


def test_missing_pos_col_raises(spark, corpus, tmp_path):
    with pytest.raises(ValueError, match="position column"):
        export.write_training_shards(corpus, str(tmp_path / "x"))


def test_sparse_positions_make_ragged_but_valid_shards(spark, corpus, tmp_path):
    # non-dense positions (e.g. after a post-order filter) still shard into
    # their correct envelopes — shards just come out ragged
    sparse = corpus.withColumn("train_pos", F.col("doc_id") * 5).limit(0).union(
        corpus.withColumn("train_pos", F.col("doc_id") * 5)
    )
    m = export.write_training_shards(sparse, str(tmp_path / "s"), rows_per_shard=10)
    assert m["total_rows"] == 1000
    for sid, s in m["shards"].items():
        lo = int(sid) * 10 + 1
        assert lo <= s["min_pos"] and s["max_pos"] <= lo + 9
        assert s["n_rows"] == 2  # positions 5 and 10 per envelope of 10
