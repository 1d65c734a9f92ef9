"""Port of the reference's 6-case inline validity oracle (FIXTURES.md §3;
schema_validator.py:151-234, firehose_to_iceberg_transformer.py:147-248)."""

from __future__ import annotations

import json

import pytest

from web_analytics_on_aws_spark.operators.validate import (
    RESULT_FAILED,
    RESULT_OK,
    validate,
    validity_metrics,
)


def _base_iceberg() -> dict:
    return {
        "user_id": "5f2c9a0e-1111-4ecc-a3b6-000000000001",
        "session_id": "0a1b2c3d4e5f60718293a4b5",
        "event": "view",
        "referrer": "example.org",
        "user_agent": "Mozilla/5.0 (X11; Linux x86_64)",
        "ip": "10.20.30.40",
        "hostname": "shop.example",
        "os": "Debian",
        "timestamp": "2022-09-16T07:35:46Z",
        "uri": "https://shop.example/a/b?x=1&y=2",
    }


def _base_parquet() -> dict:
    return {
        "userId": "5f2c9a0e-1111-4ecc-a3b6-000000000001",
        "sessionId": "0a1b2c3d4e5f60718293a4b5",
        "referrer": "example.org",
        "userAgent": "Mozilla/5.0 (X11; Linux x86_64)",
        "ip": "10.20.30.40",
        "hostname": "shop.example",
        "os": "Debian",
        "timestamp": "2022-09-16T07:35:46Z",
        "uri": "https://shop.example/a/b?x=1&y=2",
    }


def _iceberg_cases() -> list[tuple[str, str, dict]]:
    v1 = _base_iceberg()
    v2 = _base_iceberg()
    del v2["referrer"]  # optional field absent → Ok
    v3 = _base_iceberg()
    v3["timestamp"] = "2022-09-16 07:35:46"  # bad wire format
    v4 = _base_iceberg()
    del v4["user_id"]  # required field absent
    v5 = _base_iceberg()
    v5["ip"] = 212234672  # JSON int where Avro string required
    v6 = _base_iceberg()  # camelCase keys vs snake_case schema
    for old, new in [("user_id", "userId"), ("session_id", "sessionId"), ("user_agent", "userAgent")]:
        v6[new] = v6.pop(old)
    return [
        ("V1_valid", RESULT_OK, v1),
        ("V2_optional_absent", RESULT_OK, v2),
        ("V3_bad_timestamp", RESULT_FAILED, v3),
        ("V4_required_absent", RESULT_FAILED, v4),
        ("V5_type_mismatch", RESULT_FAILED, v5),
        ("V6_column_name_mismatch", RESULT_FAILED, v6),
    ]


def _parquet_cases() -> list[tuple[str, str, dict]]:
    v1 = _base_parquet()
    v2 = _base_parquet()
    del v2["referrer"]
    v3 = _base_parquet()
    v3["timestamp"] = "2022-09-16 07:35:46"
    v4 = _base_parquet()
    del v4["userId"]
    v5 = _base_parquet()
    v5["ip"] = 212234672
    return [
        ("V1_valid", RESULT_OK, v1),
        ("V2_optional_absent", RESULT_OK, v2),
        ("V3_bad_timestamp", RESULT_FAILED, v3),
        ("V4_required_absent", RESULT_FAILED, v4),
        ("V5_type_mismatch", RESULT_FAILED, v5),
    ]


@pytest.mark.parametrize(
    "dialect,cases",
    [("iceberg", _iceberg_cases()), ("parquet", _parquet_cases())],
    ids=["iceberg", "parquet"],
)
def test_validation_oracle(spark, dialect, cases):
    df = spark.createDataFrame(
        [(name, json.dumps(rec)) for name, _, rec in cases], "case string, value string"
    )
    out = {
        r["case"]: r["result"]
        for r in validate(df.select("case", "value"), dialect=dialect)
        .join(df, "value")
        .select("case", "result")
        .collect()
    }
    for name, expected, _ in cases:
        assert out[name] == expected, f"{dialect}/{name}: got {out[name]}, want {expected}"


def test_validation_extra_fields_ignored(spark):
    """fastavro non-strict semantics: unknown keys do not invalidate."""
    rec = _base_iceberg()
    rec["totally_unknown"] = "x"
    df = spark.createDataFrame([(json.dumps(rec),)], "value string")
    assert validate(df, dialect="iceberg").first()["result"] == RESULT_OK


def test_validation_non_object_and_garbage(spark):
    df = spark.createDataFrame(
        [('["an","array"]',), ("42",), ("not json at all",), ('{"a":',)], "value string"
    )
    res = [r["result"] for r in validate(df, dialect="parquet").collect()]
    assert res == [RESULT_FAILED] * 4


def test_validation_null_required_vs_null_optional(spark):
    ok = _base_iceberg()
    ok["referrer"] = None  # explicit null on optional → Ok
    bad = _base_iceberg()
    bad["ip"] = None  # explicit null on required → fail
    df = spark.createDataFrame(
        [(json.dumps(ok),), (json.dumps(bad),)], "value string"
    )
    res = [r["result"] for r in validate(df, dialect="iceberg").collect()]
    assert res == [RESULT_OK, RESULT_FAILED]


def test_validity_metrics_counter(spark):
    """The Lambda's Counter(total, valid, invalid) log line (FIXTURES §3:
    a V1-V6 mix tallies total=6 valid=2 invalid=4)."""
    df = spark.createDataFrame(
        [(json.dumps(rec),) for _, _, rec in _iceberg_cases()], "value string"
    )
    m = validity_metrics(validate(df, dialect="iceberg")).first()
    assert (m["total"], m["valid"], m["invalid"]) == (6, 2, 4)


def test_validate_parses_timestamp_column(spark):
    import datetime

    df = spark.createDataFrame([(json.dumps(_base_iceberg()),)], "value string")
    row = validate(df, dialect="iceberg").first()
    assert row["timestamp"] == datetime.datetime(2022, 9, 16, 7, 35, 46)
    assert row["user_id"].startswith("5f2c9a0e")
