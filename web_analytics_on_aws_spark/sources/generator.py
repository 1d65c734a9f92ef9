"""Synthetic web-log event source — parity with the reference's fake-data
generator (SURVEY §2.1 S13; /root/reference/web-analytics-parquet/src/utils/
gen_fake_data.py:21-87, iceberg flavor adds `event`,
web-analytics-iceberg/src/utils/gen_fake_data.py:55).

Spark-first: events are derived column expressions over ``spark.range(n)`` —
fully distributed, deterministic given (n, seed), no Python-side loop, no
third-party faker. The streaming flavor maps the rate source the same way.

Wire format matches the reference generator: one JSON object per line,
camelCase or snake_case dialect, timestamp ``yyyy-MM-dd'T'HH:mm:ss'Z'`` with
randomized minute/second within the base hour (gen_fake_data.py:29-34).
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from web_analytics_on_aws_spark.schema import EVENT_VALUES

_OSES = ["Linux", "Windows 8.1", "macOS", "openSUSE", "Android", "iOS"]
_HOSTS = ["shop.example", "news.example", "blog.example", "docs.example"]
_REFERRERS = ["search.example", "social.example", "mail.example"]


def _pick(options: list[str], h: Column) -> Column:
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(h, F.lit(len(options))) + 1).cast("int"))


def fake_events(
    spark: SparkSession,
    n: int,
    base_hour: dt.datetime | None = None,
    dialect: str = "parquet",
    seed: int = 47,
    invalid_every: int | None = None,
) -> DataFrame:
    """n deterministic fake events as raw JSON lines (column ``value``).

    ``invalid_every``: every k-th record gets a wire-format-violating
    timestamp — for exercising the validation split, mirroring the
    reference's negative test cases.
    """
    base = base_hour or dt.datetime(2026, 1, 1, 12, 0, 0)
    base = base.replace(minute=0, second=0, microsecond=0)

    df = spark.range(n)
    h = F.xxhash64(F.col("id"), F.lit(seed))
    # randomized minute/second within the base hour (gen_fake_data.py:29-34)
    offset_sec = F.pmod(h, F.lit(3600))
    ts = F.date_format(
        F.timestamp_seconds(F.lit(int(base.timestamp())) + offset_sec),
        "yyyy-MM-dd'T'HH:mm:ss'Z'",
    )
    if invalid_every:
        ts = F.when(
            F.col("id") % invalid_every == 0,
            F.date_format(
                F.timestamp_seconds(F.lit(int(base.timestamp())) + offset_sec),
                "yyyy-MM-dd HH:mm:ss",
            ),
        ).otherwise(ts)

    user = F.format_string("user-%04d", F.pmod(h, F.lit(max(n // 3, 1))).cast("int"))
    session = F.md5(F.concat(user, F.lit("-"), (F.pmod(h, F.lit(7))).cast("string")))
    fields: list[tuple[str, Column]] = [
        ("userId" if dialect == "parquet" else "user_id", user),
        ("sessionId" if dialect == "parquet" else "session_id", session),
    ]
    if dialect == "iceberg":
        fields.append(("event", _pick(EVENT_VALUES, F.xxhash64(h, F.lit(1)))))
    fields += [
        ("referrer", _pick(_REFERRERS, F.xxhash64(h, F.lit(2)))),
        ("userAgent" if dialect == "parquet" else "user_agent", F.lit("Mozilla/5.0")),
        (
            "ip",
            F.format_string(
                "10.%d.%d.%d",
                F.pmod(F.xxhash64(h, F.lit(3)), F.lit(256)).cast("int"),
                F.pmod(F.xxhash64(h, F.lit(4)), F.lit(256)).cast("int"),
                F.pmod(F.xxhash64(h, F.lit(5)), F.lit(256)).cast("int"),
            ),
        ),
        ("hostname", _pick(_HOSTS, F.xxhash64(h, F.lit(6)))),
        ("os", _pick(_OSES, F.xxhash64(h, F.lit(7)))),
        ("timestamp", ts),
        (
            "uri",
            F.format_string(
                "https://%s/page/%d?q=%d",
                _pick(_HOSTS, F.xxhash64(h, F.lit(6))),
                F.pmod(F.xxhash64(h, F.lit(8)), F.lit(50)).cast("int"),
                F.col("id").cast("int"),
            ),
        ),
    ]
    json_col = F.to_json(F.struct(*[c.alias(name) for name, c in fields]))
    return df.select(json_col.alias("value"))


def write_landing_batch(
    spark: SparkSession,
    landing_dir: str,
    n: int,
    **kwargs,
) -> None:
    """Drop one JSON-lines file batch into the landing zone (≅ one
    PutRecords call, S2)."""
    fake_events(spark, n, **kwargs).coalesce(1).write.mode("append").text(landing_dir)


def fake_event_stream(
    spark: SparkSession, rows_per_second: int = 10, **kwargs
) -> DataFrame:
    """Rate-source streaming flavor: same derived columns over the rate
    source's (timestamp, value) — the 0.5 s/record pacing knob of the
    reference generator (gen_fake_data.py:87) becomes rowsPerSecond."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
        .withColumnRenamed("value", "id")
    )
    seed = kwargs.get("seed", 47)
    h = F.xxhash64(F.col("id"), F.lit(seed))
    user = F.format_string("user-%04d", F.pmod(h, F.lit(1000)).cast("int"))
    json_col = F.to_json(
        F.struct(
            user.alias("userId"),
            F.md5(user).alias("sessionId"),
            F.lit(None).cast("string").alias("referrer"),
            F.lit("Mozilla/5.0").alias("userAgent"),
            F.lit("10.0.0.1").alias("ip"),
            F.lit("shop.example").alias("hostname"),
            F.lit("Linux").alias("os"),
            F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("timestamp"),
            F.format_string("/page/%d", F.pmod(h, F.lit(50)).cast("int")).alias("uri"),
        )
    )
    return rate.select(json_col.alias("value"))
