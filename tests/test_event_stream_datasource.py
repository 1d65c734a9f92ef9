"""Streaming Python DataSource: deterministic offset-range generation
(exactly-once replay contract) + bounded end-to-end drain."""

from __future__ import annotations

from web_analytics_on_aws_spark.sources.event_stream_datasource import (
    SyntheticEventsDataSource,
    SyntheticEventStreamReader,
)


def test_reader_offsets_are_deterministic_and_replayable():
    r = SyntheticEventStreamReader({"rowsperbatch": "10", "startid": "5"})
    assert r.initialOffset() == {"id": 5}
    rows1, end1 = r.read({"id": 5})
    rows1 = list(rows1)
    assert end1 == {"id": 15} and len(rows1) == 10
    # the replay path regenerates the committed range bit-identically
    assert list(r.readBetweenOffsets({"id": 5}, {"id": 15})) == rows1
    # a second reader instance (restarted query) agrees too
    r2 = SyntheticEventStreamReader({"rowsperbatch": "10"})
    assert list(r2.readBetweenOffsets({"id": 5}, {"id": 15})) == rows1


def test_bounded_stream_drains_exactly_max_id_rows(spark, tmp_path):
    spark.dataSource.register(SyntheticEventsDataSource)
    out, ckpt = f"{tmp_path}/out", f"{tmp_path}/ckpt"
    def drain_once():
        q = (
            spark.readStream.format("synthetic_events")
            .option("rowsPerBatch", "25")
            .option("maxId", "60")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # availableNow advances one offset increment per run for simple stream
    # readers; the checkpoint carries progress across runs (that persistence
    # is itself part of the exactly-once contract under test)
    for _ in range(5):
        drain_once()
        if spark.read.parquet(out).count() >= 60:
            break
    got = spark.read.parquet(out)
    assert got.count() == 60
    ids = sorted(r["event_id"] for r in got.collect())
    assert ids == list(range(60))  # no gaps, no duplicates
    # field derivation matches the reference's iceberg event domain
    events = {r["event"] for r in got.collect()}
    assert events <= {"visit", "view", "list", "like", "cart", "purchase"}
