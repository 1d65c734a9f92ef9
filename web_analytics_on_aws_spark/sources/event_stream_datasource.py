"""`spark.readStream.format("synthetic_events")` — a Spark 4 Python
streaming DataSource generating the reference's click-event shape with
offset-tracked exactly-once semantics.

The reference's load generator paces fake events into Kinesis at 0.5 s/record
(SURVEY §2.1 S13, gen_fake_data.py:87); its delivery guarantee comes from
shard sequence numbers. Here the offset IS the event id: every batch covers
an id range ``[start, end)`` and every field is a pure function of the id —
so ``readBetweenOffsets`` (the replay path Structured Streaming calls when a
batch must be re-executed after failure) regenerates bit-identical rows, and
a restarted query never duplicates or loses an event. That determinism is
pinned in pytest, and it is the same property the snapshot sink's txn stamps
rely on downstream.

Bounded mode (``maxId``) makes ``trigger(availableNow=True)`` drain and stop
— the CI-friendly way to run a finite load test through the full streaming
pipeline (landing-less: source → validate → sink directly).

Scale: the source emits tuples from the driver-side worker per micro-batch —
it's a load generator, not an ingest path; the partitioned landing-dir /
file sources remain the high-throughput entry (streaming/ingest_stream.py).
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

EVENT_TYPES = ["visit", "view", "list", "like", "cart", "purchase"]

SCHEMA = (
    "event_id BIGINT, user_id STRING, session_id STRING, event STRING, "
    "ip STRING, hostname STRING, timestamp STRING, uri STRING"
)


def _row(i: int) -> Tuple:
    """Every field derives deterministically from the event id — the
    replay/regeneration contract."""
    minute, second = (i * 7) % 60, (i * 13) % 60
    return (
        i,
        f"user-{i % 50}",
        f"sess-{(i // 10) % 1000:024d}",
        EVENT_TYPES[i % len(EVENT_TYPES)],
        f"10.0.{(i // 256) % 256}.{i % 256}",
        "synthetic.example",
        f"2026-03-02T13:{minute:02d}:{second:02d}Z",
        f"/p/{i % 200}",
    )


class SyntheticEventStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self._per_batch = int(options.get("rowsperbatch", 100))
        self._start = int(options.get("startid", 0))
        self._max_id = int(options["maxid"]) if "maxid" in options else None

    def initialOffset(self) -> dict:
        return {"id": self._start}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        lo = int(start["id"])
        hi = lo + self._per_batch
        if self._max_id is not None:
            hi = min(hi, self._max_id)
        return iter([_row(i) for i in range(lo, hi)]), {"id": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # failure replay: regenerate exactly the committed range
        return iter([_row(i) for i in range(int(start["id"]), int(end["id"]))])

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up — the generator is stateless


class SyntheticEventsDataSource(DataSource):
    """Register with ``spark.dataSource.register(SyntheticEventsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema) -> SyntheticEventStreamReader:
        return SyntheticEventStreamReader(self.options)
