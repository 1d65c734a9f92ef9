"""SQL UDF surface: registered SQL functions are bit-identical to the
Column-expression helpers they mirror, and inline into codegen (no
BatchEvalPython in the plan)."""

from __future__ import annotations

import pyspark.sql.functions as F

from web_analytics_on_aws_spark.functions import token_count
from web_analytics_on_aws_spark.functions.sql_udfs import register_sql_functions
from web_analytics_on_aws_spark.operators.sampling import (
    bpe_style_token_count,
    hash_fraction,
)
from web_analytics_on_aws_spark.operators.text import redact_pii


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "hello big  world"),
            (2, "email me: a.b+x@mail-host.org or b@c.io today"),
            (3, "call +1 555-123-4567 or 12345678 now!! #tags"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )


def test_sql_functions_match_column_helpers(spark):
    df = _docs(spark)
    register_sql_functions(spark)
    df.createOrReplaceTempView("t")
    got = spark.sql("""
        SELECT doc_id, token_count(text) AS tc, bpe_token_count(text) AS bc,
               redact_pii(text) AS red, hash_fraction(doc_id) AS hf
        FROM t
    """).collect()
    want = df.select(
        "doc_id",
        token_count(F.col("text")).alias("tc"),
        bpe_style_token_count("text").alias("bc"),
        redact_pii("text").alias("red"),
        hash_fraction("doc_id").alias("hf"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    red = {r["doc_id"]: r["red"] for r in got}
    assert "[EMAIL]" in red[2] and "@" not in red[2]
    assert "[PHONE]" in red[3] and "[NUM]" in red[3]


def test_sql_functions_inline_no_python_udf(spark):
    register_sql_functions(spark)
    _docs(spark).createOrReplaceTempView("t")
    df = spark.sql("SELECT token_count(text) AS n FROM t")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
