"""CDC: keyed table diff and snapshot changelog semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from web_analytics_on_aws_spark.operators.cdc import snapshot_changelog, table_diff
from web_analytics_on_aws_spark.sources.snapshots import commit_overwrite


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, a string, b double")


def test_table_diff_classes(spark):
    old = _df(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0), (4, None, 4.0)])
    new = _df(spark, [(2, "y", 2.0), (3, "z", 9.0), (4, "w", 4.0), (5, "n", 5.0)])
    out = {
        (r.k, r._change_type): (r.a, r.b)
        for r in table_diff(old, new, ["k"]).collect()
    }
    assert out == {
        (1, "delete"): ("x", 1.0),
        (3, "update_preimage"): ("z", 3.0),
        (3, "update_postimage"): ("z", 9.0),
        (4, "update_preimage"): (None, 4.0),  # null-safe compare: None != "w"
        (4, "update_postimage"): ("w", 4.0),
        (5, "insert"): ("n", 5.0),
    }
    # unchanged row 2 emits nothing — already asserted by exact dict equality


def test_table_diff_single_join_no_per_class_rejoin(spark):
    old = _df(spark, [(1, "x", 1.0)])
    new = _df(spark, [(1, "x", 2.0)])
    import re

    df = table_diff(old, new, ["k"])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert len(re.findall(r"\(\d+\) \w*Join", plan)) == 1, plan


def test_snapshot_changelog_between_versions(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_overwrite(_df(spark, [(1, "x", 1.0), (2, "y", 2.0)]), t)
    commit_overwrite(_df(spark, [(2, "y", 5.0), (3, "z", 3.0)]), t)
    log = snapshot_changelog(spark, t, ["k"], from_version=1, to_version=2)
    got = sorted((r.k, r._change_type) for r in log.collect())
    assert got == [
        (1, "delete"),
        (2, "update_postimage"),
        (2, "update_preimage"),
        (3, "insert"),
    ]
