"""Trino/Athena dialect shim (functions/trino_compat.py): curated rewrites
produce Spark results matching native-Spark equivalents; out-of-surface
constructs refuse loudly."""

import pytest
from pyspark.sql import functions as F

from web_analytics_on_aws_spark.functions.trino_compat import (
    TrinoCompatError,
    trino_sql,
    trino_to_spark_sql,
)


@pytest.fixture(scope="module")
def views(spark):
    spark.createDataFrame(
        [(1, "alice", "2024-01-01 10:00:00", 10.5, ["a", "b"]),
         (2, "bob", "2024-01-03 22:30:00", 20.0, ["b"]),
         (3, "carol", "2024-02-01 00:00:00", None, [])],
        "id long, name string, ts string, v double, tags array<string>",
    ).withColumn("ts", F.col("ts").cast("timestamp")).createOrReplaceTempView("t")
    return spark


def test_identifier_quoting_and_renames(views):
    spark = views
    out = trino_sql(
        spark,
        'SELECT "name", strpos("name", \'li\') AS p, codepoint(\'A\') AS cp FROM t ORDER BY "id"',
    ).collect()
    assert [r["name"] for r in out] == ["alice", "bob", "carol"]
    assert out[0]["p"] == 2 and out[1]["p"] == 0
    assert out[0]["cp"] == 65


def test_date_diff_and_add_units(views):
    spark = views
    out = trino_sql(
        spark,
        "SELECT date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS dd, "
        "date_add('hour', 2, ts) AS plus2 FROM t ORDER BY id",
    ).collect()
    assert [r["dd"] for r in out] == [0, 2, 31]
    assert str(out[0]["plus2"]) == "2024-01-01 12:00:00"


def test_aggregates_and_json(views):
    spark = views
    out = trino_sql(
        spark,
        "SELECT approx_distinct(name) AS d, arbitrary(id) AS a FROM t",
    ).collect()[0]
    assert out["d"] == 3 and out["a"] in (1, 2, 3)
    j = trino_sql(
        spark,
        """SELECT json_extract_scalar('{"k": "v"}', '$.k') AS x""",
    ).collect()[0]
    assert j["x"] == "v"


def test_array_contains_and_varchar_cast(views):
    spark = views
    out = trino_sql(
        spark,
        "SELECT id, contains(tags, 'b') AS has_b, CAST(id AS VARCHAR(10)) AS s "
        "FROM t ORDER BY id",
    ).collect()
    assert [r["has_b"] for r in out] == [True, True, False]
    assert out[2]["s"] == "3"


def test_string_literals_untouched(views):
    # a literal containing a rename target and double quotes must pass through
    out = trino_sql(
        views, "SELECT 'strpos(\"x\") it''s' AS lit"
    ).collect()[0]
    assert out["lit"] == 'strpos("x") it\'s'


def test_unsupported_refuses(views):
    with pytest.raises(TrinoCompatError, match="curated"):
        trino_to_spark_sql("SELECT * FROM t TABLESAMPLE BERNOULLI (10)")
    with pytest.raises(TrinoCompatError, match="unit"):
        trino_to_spark_sql("SELECT date_diff('fortnight', a, b) FROM t")


def test_reference_shaped_weblog_query(views):
    """The shape a reference user actually pastes (athena_named_query.py
    style aggregation over the web log), in Trino dialect."""
    spark = views
    sql = (
        'SELECT "name" AS user_name, count(*) AS n, '
        "approx_distinct(CAST(v AS VARCHAR)) AS vals "
        "FROM t WHERE date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) < 40 "
        'GROUP BY "name" ORDER BY user_name'
    )
    out = trino_sql(spark, sql).collect()
    assert [r["user_name"] for r in out] == ["alice", "bob", "carol"]
    assert [r["n"] for r in out] == [1, 1, 1]


def test_exotic_identifiers_convert_not_mislex(views):
    # hyphens / leading digits / "" escapes are legal Trino identifiers —
    # they must become backticked identifiers, never string literals
    assert trino_to_spark_sql('SELECT "user-agent" FROM t') == \
        "SELECT `user-agent` FROM t"
    assert trino_to_spark_sql('SELECT "2col" FROM t') == "SELECT `2col` FROM t"
    assert trino_to_spark_sql('SELECT "we""ird" FROM t') == 'SELECT `we"ird` FROM t'
    with pytest.raises(TrinoCompatError, match="backtick"):
        trino_to_spark_sql('SELECT "a`b" FROM t')


def test_truncate_not_silently_mismapped(views):
    # Trino numeric truncate() has no exact Spark rename — it must pass
    # through untouched (and fail loudly in Spark if unsupported) rather
    # than silently becoming date trunc()
    assert "trunc(" not in trino_to_spark_sql("SELECT truncate(v, 1) FROM t").replace(
        "truncate(", ""
    )


# --- property-based: arbitrary identifier names survive the rewrite ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_names = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters='`"\x00\x01',
        exclude_categories=("Cc",),
    ),
    min_size=1, max_size=20,
)


@settings(max_examples=50, deadline=None)
@given(name=_names)
def test_identifier_rewrite_roundtrips(name):
    quoted = '"' + name.replace('"', '""') + '"'
    out = trino_to_spark_sql(f"SELECT {quoted} FROM t")
    assert out == f"SELECT `{name}` FROM t"
