"""File-level bloom index (sources/bloom_index.py): equality probes skip
files min/max stats cannot, never at the cost of a false skip."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, In

from web_analytics_on_aws_spark.sources.bloom_index import (
    _geometry,
    _hashes,
    build_bloom_index,
    load_bloom_index,
    may_contain,
)
from web_analytics_on_aws_spark.sources.snapshot_datasource import (
    planned_files,
    SnapshotDataSource,
    SnapshotReader,
)
from web_analytics_on_aws_spark.sources.snapshots import commit_append


def _planned(t, filters):
    r = SnapshotReader({"path": t}, None)
    if filters:
        r.pushFilters(filters)
    return len(planned_files(r.partitions()))


@pytest.fixture(scope="module")
def indexed(spark, tmp_path_factory):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)
    t = str(tmp_path_factory.mktemp("bloom") / "t")
    # interleaved id spaces: every file's [min, max] covers every probe, so
    # footer stats can never prune — exactly the case bloom exists for
    commit_append(
        spark.range(0, 1000).select((F.col("id") * 2).alias("user_id")).coalesce(1), t
    )
    commit_append(
        spark.range(0, 1000).select((F.col("id") * 2 + 1).alias("user_id")).coalesce(1), t
    )
    built = build_bloom_index(spark, t, ["user_id"])
    return spark, t, built


def test_build_covers_current_files(indexed):
    spark, t, built = indexed
    assert built == {"user_id": 2}
    idx = load_bloom_index(t)
    assert set(idx) == {"user_id"} and len(idx["user_id"]) == 2


def test_equality_probe_skips_wrong_parity_file(indexed):
    spark, t, _ = indexed
    assert _planned(t, None) == 2
    # stats can't prune (both files span ~[0, 2000]); bloom must
    assert _planned(t, [EqualTo(("user_id",), 42)]) == 1
    assert _planned(t, [EqualTo(("user_id",), 43)]) == 1
    # absent value: provably in no file
    assert _planned(t, [EqualTo(("user_id",), 999_999)]) == 0
    # correctness through the full read path
    df = spark.read.format("snapshot").option("path", t).load()
    assert df.filter("user_id = 42").count() == 1
    assert df.filter("user_id = 999999").count() == 0


def test_in_probe_unions_file_sets(indexed):
    spark, t, _ = indexed
    assert _planned(t, [In(("user_id",), (42, 999_999))]) == 1
    assert _planned(t, [In(("user_id",), (42, 43))]) == 2
    assert _planned(t, [In(("user_id",), (999_999, 888_888))]) == 0


def test_no_false_negatives_exhaustive(indexed):
    spark, t, _ = indexed
    idx = load_bloom_index(t)["user_id"]
    # every present value must pass its file's bloom (zero false negatives)
    rows = (
        spark.read.format("snapshot").option("path", t).load()
        .select("user_id").collect()
    )
    import pyarrow.parquet as pq

    for f, entry in idx.items():
        present = set(pq.read_table(f)["user_id"].to_pylist())
        for v in present:
            assert may_contain(entry, v)


def test_unindexed_new_file_never_skipped(indexed):
    spark, t, _ = indexed
    commit_append(
        spark.range(0, 10).select((F.col("id") + 50_000).alias("user_id")).coalesce(1), t
    )
    # 50_005 lives only in the new (unindexed) file — must still be planned
    assert _planned(t, [EqualTo(("user_id",), 50_005)]) == 1
    df = spark.read.format("snapshot").option("path", t).load()
    assert df.filter("user_id = 50005").count() == 1
    # rebuild restores skipping over all three files
    build_bloom_index(spark, t, ["user_id"])
    assert _planned(t, [EqualTo(("user_id",), 999_999)]) == 0


def test_geometry_and_fpp_sanity():
    m, k = _geometry(1000, 0.01)
    assert m >= 9000 and 5 <= k <= 10  # ~9.6 bits/key, 7 hashes at 1% fpp
    # double hashing produces k distinct positions with high probability
    assert len(set(_hashes("someval", m, k))) == k


def test_layout_rewrite_refreshes_index(spark, tmp_path):
    """optimize()/cluster_zorder() replace the file set — with a sidecar
    present they must rebuild it so the NEW files skip too."""
    from web_analytics_on_aws_spark.sources.snapshots import optimize

    t = str(tmp_path / "t")
    commit_append(
        spark.range(0, 500).select((F.col("id") * 2).alias("user_id")).coalesce(1), t
    )
    commit_append(
        spark.range(0, 500).select((F.col("id") * 2 + 1).alias("user_id")).coalesce(1), t
    )
    build_bloom_index(spark, t, ["user_id"])
    assert _planned(t, [EqualTo(("user_id",), 999_999)]) == 0
    res = optimize(spark, t, small_file_mb=64.0, min_small_files=2)
    assert res["rewritten"] == 2  # both tiny files merged into one
    # merged file is brand new — the auto-refresh must have re-indexed it
    assert _planned(t, [EqualTo(("user_id",), 999_999)]) == 0
    assert _planned(t, [EqualTo(("user_id",), 42)]) == 1
    df = spark.read.format("snapshot").option("path", t).load()
    assert df.filter("user_id = 42").count() == 1


def test_double_column_build_refused(spark, tmp_path):
    """ADVICE r2: Spark renders 1e20 as '1.0E20', Python as '1e+20' — a
    double-typed index would silently wrong-skip. The build must refuse."""
    t = str(tmp_path / "dbl")
    commit_append(
        spark.range(0, 10).select((F.col("id") * 1e19).alias("score")), t
    )
    with pytest.raises(TypeError, match="unsupported"):
        build_bloom_index(spark, t, ["score"])


def test_boolean_probe_renders_like_spark_cast(spark, tmp_path):
    """Python str(True)='True' but Spark cast renders 'true'; the probe
    must normalize, or every boolean probe would falsely report absent."""
    t = str(tmp_path / "bools")
    commit_append(
        spark.range(0, 100).select((F.col("id") % 2 == 0).alias("flag")).coalesce(1), t
    )
    build_bloom_index(spark, t, ["flag"])
    idx = load_bloom_index(t)["flag"]
    entry = next(iter(idx.values()))
    assert may_contain(entry, True) and may_contain(entry, False)


def test_unrenderable_probe_value_never_skips(spark, tmp_path):
    """A probe value type with no reproducible rendering must keep the
    file (conservative), not hash Python repr and wrongly skip."""
    t = str(tmp_path / "ints")
    commit_append(spark.range(0, 50).select(F.col("id").alias("n")).coalesce(1), t)
    build_bloom_index(spark, t, ["n"])
    entry = next(iter(load_bloom_index(t)["n"].values()))
    assert may_contain(entry, 1.5) is True   # float probe on int column
    assert may_contain(entry, 7) is True     # present int still matches
    assert may_contain(entry, 999) is False  # absent int still skips
