"""Uniform multi-format table IO: parquet / orc / json-lines / csv.

The reference's storage surface is JSON-Lines (raw zone) + Snappy-Parquet
(curated zone) — SURVEY §1.3. A drop-in engine additionally meets users
where their data already is: the same four formats Spark ships native
vectorized readers for. One helper pair keeps options consistent so every
zone/table round-trips losslessly:

- Timestamps are written in the reference's wire format
  ``yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]'Z'`` for the text formats (csv/json), so
  a curated table exported to CSV re-ingests through the same strict
  validator (operators/validate.py).
- csv/json are schema-on-read: ``read_table`` requires the schema (inference
  is a full extra pass at 100 TB and type-drifts silently — never used).
- parquet/orc are self-describing columnar; both get predicate pushdown +
  column pruning from Catalyst, and both compress Snappy by default
  (reference curated zone: athena_ctas.py:33-34).

Scale: format choice changes the *scan*, not the plan — the same queries run
over any of the four; columnar formats additionally skip columns/row-groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "json", "csv")

# Microsecond-precision variant of the reference wire format (schema.py
# TS_WIRE_FORMAT is whole-second) — lossless for TimestampType columns.
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

_TEXT_OPTS = {"timestampFormat": _TS_FMT, "timeZone": "UTC"}
_CSV_OPTS = {**_TEXT_OPTS, "header": "true", "nullValue": "\\N", "escape": '"'}


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` at ``path`` in any supported format, hive-partitioned
    when ``partition_by`` is given (same layout rules for every format)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.options(**_CSV_OPTS)
    elif fmt == "json":
        writer = writer.options(**_TEXT_OPTS)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
) -> DataFrame:
    """Read a table written by ``write_table``. Text formats (csv/json)
    require ``schema`` — declared-schema reads only, matching the
    reference's no-inference posture (SURVEY §1.5)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    reader = spark.read.format(fmt)
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(f"{fmt} is schema-on-read: pass the declared schema")
        reader = reader.schema(schema)
        reader = reader.options(**(_CSV_OPTS if fmt == "csv" else _TEXT_OPTS))
    elif schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
