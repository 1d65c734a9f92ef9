"""Cross-check every oracle-declared query against DuckDB at sf0.001 —
a local replica of the driver's correctness gate (row count + column names +
order-insensitive exact values, floats compared bit-exactly)."""

from __future__ import annotations

import datetime
import math

import pytest

from tests.conftest import SF_SMOKE


def _canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return repr(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)


def _all_cases():
    from web_analytics_on_aws_spark import plans

    plans.load_all()
    return sorted(plans.ORACLES)


@pytest.mark.parametrize("name", _all_cases())
def test_query_matches_oracle(spark, duck, name, monkeypatch):
    from web_analytics_on_aws_spark import plans

    # Lazy goldens (plans/goldens.py) must be computed from the same SF the
    # Spark side reads here (the driver's default is sf0.01).
    monkeypatch.setenv("SPARK_GRAFT_GOLDEN_SF_DIR", SF_SMOKE)

    sdf = plans.QUERIES[name](spark, SF_SMOKE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    sql = plans.ORACLES[name]
    rel = duck.execute(sql() if callable(sql) else sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _canon_rows(spark_cols, spark_rows)
    b = _canon_rows(duck_cols, duck_rows)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    assert a == b, f"{name}: value mismatch at sorted rows {mism}: " + "; ".join(
        f"spark={a[i]} duck={b[i]}" for i in mism
    )
