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
        trino_to_spark_sql("SELECT * FROM t TABLESAMPLE SYSTEM (10)")
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


# --- round-2 dialect widening: URL functions, ISO dow, MySQL datetime
# patterns, UNNEST, lambdas, bitwise, float classification -------------------


def test_day_of_week_iso_semantics(views):
    # Trino day_of_week is ISO: Monday=1 … Sunday=7 (Spark dayofweek is
    # Sunday=1 — the shim must re-map, not rename)
    out = trino_sql(
        views,
        "SELECT day_of_week(TIMESTAMP '2024-01-01 12:00:00') AS mon, "
        "dow(TIMESTAMP '2024-01-07 12:00:00') AS sun, "
        "day_of_week(DATE '2024-01-03') AS wed",
    ).collect()[0]
    assert (out["mon"], out["sun"], out["wed"]) == (1, 7, 3)


def test_url_extract_functions(views):
    u = "'https://shop.example.com:8443/cart/item?uid=42&ref=mail#frag'"
    out = trino_sql(
        views,
        f"SELECT url_extract_host({u}) AS h, url_extract_path({u}) AS p, "
        f"url_extract_protocol({u}) AS pr, url_extract_query({u}) AS q, "
        f"url_extract_fragment({u}) AS f, url_extract_port({u}) AS po, "
        f"url_extract_parameter({u}, 'uid') AS uid, "
        f"url_extract_parameter({u}, 'missing') AS miss",
    ).collect()[0]
    assert out["h"] == "shop.example.com"
    assert out["p"] == "/cart/item"
    assert out["pr"] == "https"
    assert out["q"] == "uid=42&ref=mail"
    assert out["f"] == "frag"
    assert out["po"] == 8443
    assert out["uid"] == "42"
    assert out["miss"] is None


def test_date_parse_and_format_mysql_patterns(views):
    out = trino_sql(
        views,
        "SELECT date_parse('2024-03-05T07:08:09Z', '%Y-%m-%dT%H:%i:%sZ') AS ts, "
        "date_format(TIMESTAMP '2024-03-05 07:08:09', '%Y/%m/%d %H:%i') AS s, "
        "date_format(TIMESTAMP '2024-03-05 07:08:09', '%W %b') AS wd",
    ).collect()[0]
    assert str(out["ts"]) == "2024-03-05 07:08:09"
    assert out["s"] == "2024/03/05 07:08"
    assert out["wd"] == "Tuesday Mar"


def test_date_parse_pattern_must_be_literal(views):
    with pytest.raises(TrinoCompatError, match="literal"):
        trino_to_spark_sql("SELECT date_parse(s, fmt_col) FROM t")
    with pytest.raises(TrinoCompatError, match="unsupported"):
        trino_to_spark_sql("SELECT date_parse(s, '%Q') FROM t")


def test_bitwise_functions_to_operators(views):
    out = trino_sql(
        views,
        "SELECT bitwise_and(12, 10) AS a, bitwise_or(12, 10) AS o, "
        "bitwise_xor(12, 10) AS x, bitwise_not(0) AS n, "
        "bitwise_and(12, bitwise_or(2, 1)) AS nested, "
        "bitwise_left_shift(1, 4) AS ls",
    ).collect()[0]
    assert (out["a"], out["o"], out["x"], out["n"]) == (8, 14, 6, -1)
    assert out["nested"] == 12 & (2 | 1) and out["ls"] == 16


def test_float_classification(views):
    out = trino_sql(
        views,
        "SELECT is_finite(v) AS f, is_infinite(v) AS i, is_nan(nan()) AS n, "
        "is_finite(infinity()) AS inf_fin, is_infinite(infinity()) AS inf_inf, "
        "is_finite(nan()) AS nan_fin FROM t WHERE id = 1",
    ).collect()[0]
    assert (out["f"], out["i"], out["n"]) == (True, False, True)
    assert (out["inf_fin"], out["inf_inf"], out["nan_fin"]) == (False, True, False)


def test_unnest_array_and_map(views):
    out = trino_sql(
        views,
        "SELECT id, tag FROM t CROSS JOIN UNNEST(tags) AS u (tag) ORDER BY id, tag",
    ).collect()
    assert [(r["id"], r["tag"]) for r in out] == [(1, "a"), (1, "b"), (2, "b")]
    out = trino_sql(
        views,
        "SELECT k, v FROM (SELECT map('x', 1) AS m) "
        "CROSS JOIN UNNEST(m) AS kv (k, v)",
    ).collect()
    assert [(r["k"], r["v"]) for r in out] == [("x", 1)]
    with pytest.raises(TrinoCompatError, match="UNNEST"):
        trino_to_spark_sql("SELECT y FROM t, UNNEST(x) AS q (y)")


def test_unnest_with_ordinality(views):
    """Trino's `UNNEST(...) WITH ORDINALITY AS t (elem, ord)` — 1-based
    bigint position column, rewritten through inline(transform(...)) so
    both output columns resolve as top-level names."""
    out = trino_sql(
        views,
        "SELECT id, tag, n FROM t CROSS JOIN UNNEST(tags) "
        "WITH ORDINALITY AS u (tag, n) ORDER BY id, n",
    ).collect()
    assert [(r["id"], r["tag"], r["n"]) for r in out] == [
        (1, "a", 1), (1, "b", 2), (2, "b", 1),
    ]
    assert isinstance(out[0]["n"], int)
    with pytest.raises(TrinoCompatError, match="ORDINALITY"):
        trino_to_spark_sql(
            "SELECT x FROM t CROSS JOIN UNNEST(tags) WITH ORDINALITY AS u (x)"
        )


def test_lambda_surface(views):
    out = trino_sql(
        views,
        "SELECT reduce(sequence(1, 4), 0, (s, x) -> s + x, s -> s) AS tot, "
        "any_match(tags, x -> x = 'a') AS has_a, "
        "all_match(tags, x -> length(x) = 1) AS all1 "
        "FROM t WHERE id = 1",
    ).collect()[0]
    assert out["tot"] == 10 and out["has_a"] is True and out["all1"] is True


def test_misc_renames_execute(views):
    out = trino_sql(
        views,
        "SELECT format('%s:%d', name, id) AS f, starts_with(name, 'al') AS sw, "
        "levenshtein_distance(name, 'alice') AS lev, to_hex(CAST('A' AS BINARY)) AS hx, "
        "week(TIMESTAMP '2024-01-10 00:00:00') AS wk, "
        "day_of_year(DATE '2024-02-01') AS doy, "
        "format_datetime(TIMESTAMP '2024-03-05 07:08:09', 'yyyy-MM-dd HH:mm') AS fd "
        "FROM t WHERE id = 1",
    ).collect()[0]
    assert out["f"] == "alice:1" and out["sw"] is True and out["lev"] == 0
    assert out["hx"] == "41" and out["wk"] == 2 and out["doy"] == 32
    assert out["fd"] == "2024-03-05 07:08"


def test_rand_rename_parses(views):
    assert "rand()" in trino_to_spark_sql("SELECT random() FROM t")
    # a column merely NAMED random must not be rewritten
    assert trino_to_spark_sql("SELECT random FROM t") == "SELECT random FROM t"


def test_random_with_bound_is_integer_uniform_not_seed(views):
    """ADVICE r2: Trino random(n) = integer in [0, n); Spark rand(n) seeds
    a [0,1) double. The rewrite must produce the integer semantics."""
    out = trino_to_spark_sql("SELECT random(10) FROM t")
    assert "floor(rand() * (10))" in out and "rand(10)" not in out
    vals = [
        r["r"]
        for r in trino_sql(
            views, "SELECT random(3) AS r FROM t"
        ).collect()
    ]
    assert all(isinstance(v, int) and 0 <= v < 3 for v in vals)
    with pytest.raises(TrinoCompatError):
        trino_to_spark_sql("SELECT random(1, 2, 3) FROM t")


def test_tablesample_bernoulli_rewrites_system_refuses(views):
    out = trino_to_spark_sql("SELECT * FROM t TABLESAMPLE BERNOULLI (10.5)")
    assert "TABLESAMPLE (10.5 PERCENT)" in out
    # executes: row-level Bernoulli keeps a subset (0 ≤ n ≤ total)
    n = trino_sql(
        views, "SELECT count(*) AS n FROM t TABLESAMPLE BERNOULLI (50)"
    ).collect()[0]["n"]
    assert 0 <= n <= 3
    with pytest.raises(TrinoCompatError):
        trino_to_spark_sql("SELECT * FROM t TABLESAMPLE SYSTEM (10)")
    with pytest.raises(TrinoCompatError, match="BERNOULLI"):
        trino_to_spark_sql("SELECT * FROM t TABLESAMPLE foo")


def test_unload_statement_exports_query_results(views, tmp_path):
    from web_analytics_on_aws_spark.functions.trino_compat import trino_statement

    dest = str(tmp_path / "out")
    res = trino_statement(
        views,
        f"UNLOAD (SELECT \"id\", strpos(name, 'o') AS p FROM t) "
        f"TO '{dest}' WITH (format='PARQUET', compression='snappy')",
    )
    assert res == {"path": dest, "format": "parquet", "rows": 3}
    back = views.read.parquet(dest)
    assert {r["id"]: r["p"] for r in back.collect()} == {1: 0, 2: 2, 3: 4}


def test_unload_partitioned_by_and_refusals(views, tmp_path):
    from web_analytics_on_aws_spark.functions.trino_compat import trino_statement

    dest = str(tmp_path / "parts")
    res = trino_statement(
        views,
        f"UNLOAD (SELECT id, name FROM t) TO '{dest}' "
        f"WITH (format='JSON', partitioned_by=ARRAY['name'])",
    )
    assert res["rows"] == 3
    import os

    assert any(d.startswith("name=") for d in os.listdir(dest))
    with pytest.raises(TrinoCompatError, match="format"):
        trino_statement(views, f"UNLOAD (SELECT 1) TO '{dest}2' WITH (format='AVRO')")
    with pytest.raises(TrinoCompatError, match="unknown UNLOAD"):
        trino_statement(views, f"UNLOAD (SELECT 1) TO '{dest}3' WITH (bogus='x')")
    # a non-UNLOAD statement falls through to trino_sql
    assert trino_statement(views, "SELECT 1 AS one").collect()[0]["one"] == 1


def test_grouping_sets_with_empty_set(views):
    # Trino's grand-total grouping set literal `()` runs natively in Spark
    out = trino_sql(
        views,
        'SELECT "name", CAST(COUNT(*) AS BIGINT) AS n FROM t '
        'GROUP BY GROUPING SETS (("name"), ())',
    ).collect()
    rows = {r["name"]: r["n"] for r in out}
    assert rows[None] == 3  # grand total row
    assert rows["alice"] == 1 and len(rows) == 4
