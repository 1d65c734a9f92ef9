"""The reference's shipped named queries, re-emitted in Spark SQL dialect —
so a user of the reference can run the exact workflow they run today
(SURVEY §3.3; /root/reference/web-analytics-parquet/cdk_stacks/
athena_named_query.py:19-54 for web_log_json, :66-101 for web_log_parquet).

The Athena originals are Hive-SerDe DDL (OpenX JsonSerDe / ParquetHiveSerDe);
the Spark re-emission uses ``USING JSON`` / ``USING PARQUET`` — same declared
columns (`timestamp` backticked, as the reference does), same int partition
columns, same statement sequence: CREATE DATABASE → CREATE TABLE → MSCK →
SHOW PARTITIONS → COUNT(*).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_WEB_LOG_COLUMNS = """  `userId` STRING,
  `sessionId` STRING,
  `referrer` STRING,
  `userAgent` STRING,
  `ip` STRING,
  `hostname` STRING,
  `os` STRING,
  `timestamp` TIMESTAMP,
  `uri` STRING"""


def named_query_statements(
    db: str, json_location: str, parquet_location: str
) -> dict[str, list[str]]:
    """The two named-query scripts as ordered statement lists (the reference
    ships them as one multi-statement string per table; Spark executes
    statements one at a time)."""
    return {
        "web_log_json": [
            f"CREATE DATABASE IF NOT EXISTS {db}",
            f"""CREATE TABLE IF NOT EXISTS {db}.web_log_json (
{_WEB_LOG_COLUMNS})
USING JSON
PARTITIONED BY (`year` INT, `month` INT, `day` INT, `hour` INT)
LOCATION '{json_location}'""",
            f"MSCK REPAIR TABLE {db}.web_log_json",
            f"SHOW PARTITIONS {db}.web_log_json",
            f"SELECT COUNT(*) FROM {db}.web_log_json",
        ],
        "web_log_parquet": [
            f"CREATE DATABASE IF NOT EXISTS {db}",
            f"""CREATE TABLE IF NOT EXISTS {db}.web_log_parquet (
{_WEB_LOG_COLUMNS})
USING PARQUET
PARTITIONED BY (`year` INT, `month` INT, `day` INT, `hour` INT)
LOCATION '{parquet_location}'""",
            f"MSCK REPAIR TABLE {db}.web_log_parquet",
            f"SHOW PARTITIONS {db}.web_log_parquet",
            f"SELECT COUNT(*) FROM {db}.web_log_parquet",
        ],
    }


def run_named_query(spark: SparkSession, statements: list[str]) -> DataFrame:
    """Execute a named-query script; returns the last statement's result
    (the COUNT(*), in the shipped scripts)."""
    result: DataFrame | None = None
    for stmt in statements:
        result = spark.sql(stmt)
    assert result is not None
    return result
