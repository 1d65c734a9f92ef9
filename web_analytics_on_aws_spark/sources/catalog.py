"""Catalog & DDL surface — the Spark-session-catalog replacement for
Glue/Athena DDL (SURVEY §2.6 D1-D7, §2.1 S10-S12).

The reference's entire DDL workload (athena_named_query.py:19-101 and the
MergeSmallFiles partition maintenance, athena_ctas.py:41-76) maps to plain
Spark SQL; this module emits/executes the same statements so a reference
user's named queries keep working verbatim:

  D1 CREATE DATABASE IF NOT EXISTS      → identical
  D2 CREATE EXTERNAL TABLE ... PARTITIONED BY → CREATE TABLE ... USING ...
  D3 MSCK REPAIR TABLE                  → identical (built into Spark SQL)
  D4 ALTER TABLE ADD IF NOT EXISTS PARTITION → identical
  D6 DROP TABLE IF EXISTS               → identical
  D7 SHOW PARTITIONS                    → identical
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from web_analytics_on_aws_spark.schema import WEB_LOG_FIELDS

# Data columns of the web_log tables, typed as in the Athena DDL
# (athena_named_query.py:23-45): everything string except `timestamp`.
def _ddl_columns(fields=WEB_LOG_FIELDS) -> str:
    cols = []
    for name, _ in fields:
        typ = "TIMESTAMP" if name == "timestamp" else "STRING"
        cols.append(f"`{name}` {typ}")
    return ", ".join(cols)


def create_database(spark: SparkSession, db: str) -> None:
    """D1 (athena_named_query.py:20,67)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")


def create_web_log_json(spark: SparkSession, db: str, table: str, location: str) -> None:
    """S10 — raw-zone JSON table (athena_named_query.py:23-45)."""
    spark.sql(
        f"""CREATE TABLE IF NOT EXISTS {db}.{table} ({_ddl_columns()})
            USING JSON
            PARTITIONED BY (year INT, month INT, day INT, hour INT)
            LOCATION '{location}'"""
    )


def create_web_log_parquet(spark: SparkSession, db: str, table: str, location: str) -> None:
    """S11 — curated-zone Parquet table (athena_named_query.py:70-92)."""
    spark.sql(
        f"""CREATE TABLE IF NOT EXISTS {db}.{table} ({_ddl_columns()})
            USING PARQUET
            PARTITIONED BY (year INT, month INT, day INT, hour INT)
            LOCATION '{location}'"""
    )


def msck_repair(spark: SparkSession, db: str, table: str) -> None:
    """D3 (athena_named_query.py:48,95)."""
    spark.sql(f"MSCK REPAIR TABLE {db}.{table}")


def add_hour_partitions(
    spark: SparkSession, db: str, table: str, base_location: str, center: dt.datetime
) -> None:
    """D4 — register the 3-hour window (T−1, T, T+1) with explicit zero-padded
    LOCATIONs against unpadded int partition values, reproducing
    athena_ctas.py:41-76 (stmt :49-52, loop :54-59)."""
    for delta in (-1, 0, 1):
        h = center.replace(minute=0, second=0, microsecond=0) + dt.timedelta(hours=delta)
        loc = (
            f"{base_location}/year={h.year}/month={h.month:02d}/"
            f"day={h.day:02d}/hour={h.hour:02d}"
        )
        spark.sql(
            f"""ALTER TABLE {db}.{table} ADD IF NOT EXISTS
                PARTITION (year={h.year}, month={h.month}, day={h.day}, hour={h.hour})
                LOCATION '{loc}'"""
        )


def drop_table(spark: SparkSession, db: str, table: str) -> None:
    """D6 (athena_ctas.py:86-87)."""
    spark.sql(f"DROP TABLE IF EXISTS {db}.{table}")


def show_partitions(spark: SparkSession, db: str, table: str) -> DataFrame:
    """D7 (athena_named_query.py:51,98) — unsorted, as documented in the
    reference README (web-analytics-parquet/README.md:244)."""
    return spark.sql(f"SHOW PARTITIONS {db}.{table}")


def list_tables(spark: SparkSession, db: str) -> DataFrame:
    """S3 — `GET /streams` ≅ ListStreams → catalog table listing
    (apigw.py:62-99)."""
    return spark.sql(f"SHOW TABLES IN {db}")


def describe_table(spark: SparkSession, db: str, table: str) -> DataFrame:
    """S3 — `GET /streams/{name}` ≅ DescribeStream → DESCRIBE TABLE
    (apigw.py:101-139)."""
    return spark.sql(f"DESCRIBE TABLE {db}.{table}")


def count_star(spark: SparkSession, db: str, table: str) -> int:
    """A1 — the canonical smoke query (athena_named_query.py:53,100)."""
    return spark.sql(f"SELECT COUNT(*) AS cnt FROM {db}.{table}").first()["cnt"]


def create_view(
    spark: SparkSession, db: str, view: str, select_sql: str, dialect: str = "trino"
) -> None:
    """Athena ``CREATE OR REPLACE VIEW`` — the catalog object an Athena
    user layers over the raw/curated tables (views are first-class in the
    Athena console workflow even though the reference's CDK ships none).
    ``dialect="trino"`` (default) accepts the Athena/Trino text a reference
    user would paste and rewrites it through functions/trino_compat.py
    before storing; ``dialect="spark"`` stores the text as-is."""
    if dialect == "trino":
        from web_analytics_on_aws_spark.functions.trino_compat import (
            trino_to_spark_sql,
        )

        select_sql = trino_to_spark_sql(select_sql)
    elif dialect != "spark":
        raise ValueError(f"unknown dialect {dialect!r}")
    spark.sql(f"CREATE OR REPLACE VIEW {db}.{view} AS {select_sql}")


def drop_view(spark: SparkSession, db: str, view: str) -> None:
    """DROP VIEW IF EXISTS — completes the view lifecycle."""
    spark.sql(f"DROP VIEW IF EXISTS {db}.{view}")


def list_views(spark: SparkSession, db: str) -> DataFrame:
    """SHOW VIEWS — catalog discovery for the view layer."""
    return spark.sql(f"SHOW VIEWS IN {db}")
