"""SQL UDF surface: the engine's scalar functions exposed to `spark.sql`.

The reference has no UDF facility at all — its two Lambdas are the closest
thing (SURVEY §2.8). This module gives the interactive-SQL surface
(SURVEY §3.3) first-class scalar functions via Spark's SQL function DDL
(`CREATE FUNCTION … RETURN expr`). Each body is a pure built-in-expression
rewrite of the corresponding `operators/` Column helper — so SQL-surface
users and DataFrame users get bit-identical semantics, and everything
stays inside whole-stage codegen (these are *declarative* SQL functions,
inlined by Catalyst at analysis time — NOT Python UDFs; zero serialization
cost at any scale).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from web_analytics_on_aws_spark.operators.sampling import KNUTH, MOD

# name -> (arg signature, return type, body). Bodies must stay in sync with
# the Column versions in operators/{text,sampling}.py (pinned by pytest).
SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    "token_count": (
        "s STRING",
        "INT",
        "size(split(trim(s), ' +'))",
    ),
    "bpe_token_count": (
        "s STRING",
        "INT",
        r"size(regexp_extract_all(lower(s), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0))",
    ),
    "hash_fraction": (
        "k BIGINT",
        "DOUBLE",
        f"(k % 2147483648 * {KNUTH} % {MOD}) / CAST({MOD} AS DOUBLE)",
    ),
    "redact_pii": (
        "s STRING",
        "STRING",
        r"""regexp_replace(regexp_replace(regexp_replace(s,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]'),
            '\\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3,4}[- .]?[0-9]{0,4}', '[PHONE]'),
            '[0-9]{7,}', '[NUM]')""",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every engine scalar as a TEMPORARY SQL function on this
    session; returns the registered names."""
    for name, (sig, ret, body) in SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) "
            f"RETURNS {ret} RETURN {body}"
        )
    return list(SQL_FUNCTIONS)
