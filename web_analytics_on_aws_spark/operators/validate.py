"""Record validation — the engine-side replacement for the reference's two
validator Lambdas (SURVEY §2.2 P3-P5).

Reference semantics (the authoritative 6-case oracle is the inline golden
test at /root/reference/web-analytics-parquet/src/main/python/SchemaValidator/
schema_validator.py:151-234 and .../IcebergTransformer/
firehose_to_iceberg_transformer.py:147-248):

Both Lambdas call ``fastavro.validation.validate(record, schema,
raise_errors=False)`` (schema_validator.py:89-94), which means:

- a **required** (non-union) field that is missing, null, or not a JSON
  string → invalid;
- an **optional** (``['string','null']``) field may be missing or null, but
  if present must be a JSON string;
- **extra keys are ignored** (fastavro non-strict) — the iceberg V6 case
  (camelCase keys against the snake_case schema) fails because the required
  snake_case keys are *missing*, not because unknown keys are present;
- the **timestamp** logical type routes through ``prepare_datetime``'s
  ``strptime(data, '%Y-%m-%dT%H:%M:%SZ')`` (schema_validator.py:73-82), so
  any other shape (e.g. ``"2022-09-16 07:35:46"``) raises → invalid;
- a payload that is valid JSON but not an object → invalid.

Spark-first implementation: no Python runs per record. ``from_json`` alone
can't reproduce Avro strictness (it nulls out mismatches), so validity is a
boolean column composed of explicit predicates over VARIANT-typed parses —
``try_parse_json`` + ``schema_of_variant(try_variant_get(...))`` gives exact
per-field JSON types JVM-side, inside whole-stage codegen. At 100 TB this is
a pure map-side operator: no shuffle, no UDF, fully pipelined with the scan.

Known divergence (documented): CPython ``strptime`` accepts un-zero-padded
fields (``2024-1-1T0:0:0Z``); we require the canonical zero-padded wire shape
the generator actually emits (gen_fake_data.py strftime always pads).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from web_analytics_on_aws_spark.schema import (
    TS_WIRE_FORMAT,
    TS_WIRE_REGEX,
    WEB_LOG_FIELDS,
    WEB_LOG_ICEBERG_FIELDS,
)

RESULT_OK = "Ok"
RESULT_FAILED = "ProcessingFailed"

_DIALECTS = {
    "parquet": WEB_LOG_FIELDS,
    "iceberg": WEB_LOG_ICEBERG_FIELDS,
}


def _field_type(value_col: str, field: str) -> Column:
    """JSON type of ``$.field`` as seen by the variant parser: 'STRING',
    'BIGINT', 'VOID' (explicit null), NULL (missing key / non-JSON)."""
    return F.expr(f"schema_of_variant(try_variant_get(try_parse_json({value_col}), '$.{field}'))")


def _key_present(value_col: str, field: str) -> Column:
    return F.array_contains(F.json_object_keys(F.col(value_col)), field)


def validity_column(value_col: str = "value", dialect: str = "parquet") -> Column:
    """Boolean validity predicate reproducing fastavro semantics."""
    fields = _DIALECTS[dialect]
    is_object = F.json_object_keys(F.col(value_col)).isNotNull()
    checks: list[Column] = [is_object]
    for name, nullable in fields:
        ftype = _field_type(value_col, name)
        present = _key_present(value_col, name)
        if nullable:
            checks.append(~present | ftype.isin("STRING", "VOID"))
        else:
            checks.append(present & (ftype == "STRING"))
    # Strict wire-format timestamp: anchored regex + actual parse both pass.
    ts_raw = F.get_json_object(F.col(value_col), "$.timestamp")
    checks.append(ts_raw.rlike(TS_WIRE_REGEX))
    checks.append(F.try_to_timestamp(ts_raw, F.lit(TS_WIRE_FORMAT)).isNotNull())
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return F.coalesce(out, F.lit(False))


def validate(df: DataFrame, value_col: str = "value", dialect: str = "parquet") -> DataFrame:
    """Tag each raw JSON line with ``result`` ('Ok'/'ProcessingFailed') and
    project the parsed, typed columns (timestamp parsed to TimestampType).

    Output: original ``value_col`` + one column per schema field + ``result``.
    """
    fields = _DIALECTS[dialect]
    cols: list[Column] = [F.col(value_col)]
    for name, _ in fields:
        raw = F.get_json_object(F.col(value_col), f"$.{name}")
        if name == "timestamp":
            cols.append(F.try_to_timestamp(raw, F.lit(TS_WIRE_FORMAT)).alias(name))
        else:
            cols.append(raw.alias(name))
    cols.append(
        F.when(validity_column(value_col, dialect), F.lit(RESULT_OK))
        .otherwise(F.lit(RESULT_FAILED))
        .alias("result")
    )
    return df.select(*cols)


def validity_metrics(validated: DataFrame) -> DataFrame:
    """A2 — the Lambda's Counter(total, valid, invalid) as one tiny aggregate
    (schema_validator.py:106,121,145)."""
    return validated.agg(
        F.count("*").alias("total"),
        F.count_if(F.col("result") == RESULT_OK).alias("valid"),
        F.count_if(F.col("result") == RESULT_FAILED).alias("invalid"),
    )
