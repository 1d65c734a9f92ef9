"""Fixed, declared schemas — the reference enforces schemas at ingest and
never infers (SURVEY.md §1.5).

Two web-log dialects exist in the reference:

- **parquet variant** (camelCase, 9 fields) — Avro schema hardcoded in the
  validator Lambda: /root/reference/web-analytics-parquet/src/main/python/
  SchemaValidator/schema_validator.py:23-67
- **iceberg variants** (snake_case, 10 fields, adds ``event``) —
  /root/reference/web-analytics-iceberg/src/main/python/IcebergTransformer/
  firehose_to_iceberg_transformer.py:29-77

The wire timestamp is a strict string-datetime ``yyyy-MM-dd'T'HH:mm:ss'Z'``
(schema_validator.py:70-82); any other shape is a validation failure.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Wire format of the `timestamp` field (schema_validator.py:70-71), as a
# Spark datetime pattern and as an anchored regex for strict-shape checking.
TS_WIRE_FORMAT = "yyyy-MM-dd'T'HH:mm:ss'Z'"
TS_WIRE_REGEX = r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$"

# --- parquet variant: camelCase, 9 fields (schema_validator.py:23-67) ------
# (name, nullable). Every field is a wire string; `timestamp` parses to a
# TimestampType column after validation.
WEB_LOG_FIELDS: list[tuple[str, bool]] = [
    ("userId", False),
    ("sessionId", False),
    ("referrer", True),
    ("userAgent", True),
    ("ip", False),
    ("hostname", False),
    ("os", True),
    ("timestamp", False),
    ("uri", False),
]

# --- iceberg variants: snake_case, 10 fields (adds `event`) ----------------
# (firehose_to_iceberg_transformer.py:29-77; event values from
#  web-analytics-iceberg/src/utils/gen_fake_data.py:55)
WEB_LOG_ICEBERG_FIELDS: list[tuple[str, bool]] = [
    ("user_id", False),
    ("session_id", False),
    ("event", True),
    ("referrer", True),
    ("user_agent", True),
    ("ip", False),
    ("hostname", False),
    ("os", True),
    ("timestamp", False),
    ("uri", False),
]

EVENT_VALUES = ["visit", "view", "list", "like", "cart", "purchase"]


def _wire_struct(fields: list[tuple[str, bool]]) -> StructType:
    return StructType([StructField(n, StringType(), True) for n, _ in fields])


def _table_struct(fields: list[tuple[str, bool]]) -> StructType:
    out = []
    for n, nullable in fields:
        t = TimestampType() if n == "timestamp" else StringType()
        out.append(StructField(n, t, nullable))
    return StructType(out)


# All-string structs used while parsing/validating raw JSON lines (everything
# nullable so from_json never fails; validation is explicit predicates).
WEB_LOG_WIRE_SCHEMA = _wire_struct(WEB_LOG_FIELDS)
WEB_LOG_ICEBERG_WIRE_SCHEMA = _wire_struct(WEB_LOG_ICEBERG_FIELDS)

# Post-validation table schemas (timestamp parsed).
WEB_LOG_SCHEMA = _table_struct(WEB_LOG_FIELDS)
WEB_LOG_ICEBERG_SCHEMA = _table_struct(WEB_LOG_ICEBERG_FIELDS)

# Hive partition columns, ingest-time derived (SURVEY §1.4; layout
# `year=YYYY/month=MM/day=DD/hour=HH` from .example.cdk.context.json:16).
PARTITION_COLUMNS = ["year", "month", "day", "hour"]

# --- driver-provided synthetic tables (TESTDATA.md / FIXTURES.md §5) -------
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)
