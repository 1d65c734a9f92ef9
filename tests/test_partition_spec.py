"""Hidden (transform) partitioning: spec DDL, partitioned writes, manifest
tuple pruning, spec evolution, and the Spark-parity Murmur3 behind bucket.

Models Iceberg's partition-spec semantics the reference's tables rely on
(web-analytics-iceberg: PARTITIONED BY event with hidden day/bucket
transforms) — sources/partitioning.py."""

from __future__ import annotations

import datetime
import os

import pyspark.sql.functions as F
import pytest

from web_analytics_on_aws_spark.sources import partitioning as P
from web_analytics_on_aws_spark.sources.snapshot_datasource import (
    planned_files,
    SnapshotDataSource,
    SnapshotReader,
)
from web_analytics_on_aws_spark.sources.snapshots import (
    _read_manifest,
    commit_append,
    current_version,
    delete_where,
    read_snapshot,
)


@pytest.fixture()
def registered(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)
    return spark


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _tuples(table):
    return _read_manifest(table, current_version(table)).get(
        "file_partitions", {}
    )


def _kept(table, filters):
    r = SnapshotReader({"path": table}, None)
    r.pushFilters(filters)
    return len(planned_files(r.partitions()))


def _total(table):
    return len(planned_files(SnapshotReader({"path": table}, None).partitions()))


def _untupled(table):
    """Files with no partition tuple (e.g. the pre-spec seed commit) —
    never pruned by the partition check, by design."""
    m = _read_manifest(table, current_version(table))
    fp = m.get("file_partitions", {})
    return sum(1 for f in m["files"] if f not in fp)


# ---------------------------------------------------------------------------
# murmur3 parity — the planning-side hash must be bit-identical to F.hash
# ---------------------------------------------------------------------------


def test_murmur3_matches_spark_hash(spark):
    longs = [0, 1, -1, 42, 2**31 - 1, -(2**31), 123456789, 2**62, -(2**62)]
    strs = ["", "a", "ab", "abc", "abcd", "abcde", "héllo wörld", "日本語"]
    dates = [datetime.date(1970, 1, 1), datetime.date(2024, 3, 5)]
    tss = [
        datetime.datetime(1970, 1, 1, 0, 0, 0),
        datetime.datetime(2024, 3, 5, 13, 7, 11, 250000),
    ]
    for vals, typ in [(longs, "long"), (strs, "string"), (dates, "date"),
                      (tss, "timestamp")]:
        got = spark.createDataFrame(
            [(v,) for v in vals], f"v {typ}"
        ).select("v", F.hash("v").alias("h")).collect()
        for r in got:
            assert P.spark_hash(r.v) == r.h, (typ, r.v)
    ints = [0, 1, -1, 77, 2**31 - 1, -(2**31)]
    for r in spark.createDataFrame(
        [(v,) for v in ints], "v int"
    ).select("v", F.hash("v").alias("h")).collect():
        assert P.murmur3_int(r.v) == r.h


def test_transform_expr_matches_apply_transform(spark):
    """Write-side Catalyst transform and planning-side python transform
    agree value-for-value (the pruning contract)."""
    rows = [
        (-27, "alphabet", datetime.datetime(2024, 3, 5, 23, 59, 59)),
        (0, "", datetime.datetime(1999, 12, 31, 0, 0, 1)),
        (103, "zz", datetime.datetime(2024, 3, 6, 0, 0, 0)),
        (-100, "a b/c", datetime.datetime(2024, 2, 29, 12, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "n long, s string, ts timestamp")
    types = {"n": "bigint", "s": "string", "ts": "timestamp"}
    fields = [
        {"name": "a", "source": "n", "transform": "truncate[10]"},
        {"name": "b", "source": "n", "transform": "bucket[7]"},
        {"name": "c", "source": "s", "transform": "truncate[3]"},
        {"name": "d", "source": "s", "transform": "bucket[5]"},
        {"name": "e", "source": "ts", "transform": "day"},
        {"name": "f", "source": "ts", "transform": "hour"},
        {"name": "g", "source": "ts", "transform": "month"},
        {"name": "h", "source": "ts", "transform": "year"},
        {"name": "i", "source": "n", "transform": "identity"},
    ]
    fields = [f | {"source_type": types[f["source"]]} for f in fields]
    out = df.select(
        "n", "s", "ts",
        *[P.transform_expr(f).cast("string").alias(f["name"]) for f in fields],
    ).collect()
    for r in out:
        src = {"n": r.n, "s": r.s, "ts": r.ts}
        for f in fields:
            assert str(P.apply_transform(f, src[f["source"]])) == getattr(
                r, f["name"]
            ), (f, src[f["source"]])


def test_transform_parity_int_column(spark):
    """ADVICE r5: bucket over an INT (32-bit) column — the write expression
    casts integrals to long so the planner's murmur3_long agrees; truncate
    over int floors numerically on both sides."""
    vals = [0, 1, -1, 3, 77, 12345, -(2**31), 2**31 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "n int")
    fields = [
        {"name": "b", "source": "n", "transform": "bucket[16]",
         "source_type": "int"},
        {"name": "t", "source": "n", "transform": "truncate[10]",
         "source_type": "int"},
    ]
    out = df.select(
        "n", *[P.transform_expr(f).cast("string").alias(f["name"])
               for f in fields],
    ).collect()
    for r in out:
        for f in fields:
            assert str(P.apply_transform(f, r.n)) == getattr(r, f["name"])


def test_transform_parity_digit_string_column(spark):
    """ADVICE r5: truncate over a STRING column whose values are digits
    (zip codes) — static dispatch prefixes on BOTH sides; the old per-row
    rlike dispatch floored '12345' to '12344' on write but the planner
    prefixed the literal to '1234', wrongly pruning the file."""
    df = spark.createDataFrame([("12345",), ("abcd",), ("-99",)], "z string")
    f = {"name": "t", "source": "z", "transform": "truncate[4]",
         "source_type": "string"}
    out = df.select("z", P.transform_expr(f).alias("t")).collect()
    for r in out:
        assert P.apply_transform(f, r.z) == r.t == r.z[:4]


def test_legacy_spec_mirrors_per_row_dispatch():
    """Specs written before source_type existed routed digit strings
    numerically; the planner must MIRROR that (equality stays exact) and
    refuse the genuinely ambiguous cases (bucket-int width, truncate range
    pruning)."""
    trunc = {"name": "t", "source": "z", "transform": "truncate[4]"}
    assert P.apply_transform(trunc, "12345") == "12344"  # numeric mirror
    assert P.apply_transform(trunc, "abcdef") == "abcd"
    assert P.apply_transform(trunc, 12345) == 12344
    assert not P._range_safe(trunc)  # mixed dispatch is not monotonic
    assert P._range_safe(trunc | {"source_type": "string"})
    assert P._range_safe(trunc | {"source_type": "int"})
    bucket = {"name": "b", "source": "n", "transform": "bucket[8]"}
    with pytest.raises(TypeError, match="ambiguous"):
        P.apply_transform(bucket, 3)  # hashInt(3) != hashLong(3)
    assert not P._range_safe(bucket | {"source_type": "bigint"})


# ---------------------------------------------------------------------------
# spec DDL + partitioned append
# ---------------------------------------------------------------------------


def _events_df(spark, n=200):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 10).alias("uid"),
        F.expr(
            "timestamp_micros(cast(1709600000000000 + id * 3600000000 as long))"
        ).alias("ts"),
    )


def test_partitioned_append_roundtrip(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    df = _events_df(spark)
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("ts", "day"), ("uid", "bucket[4]")])
    commit_append(df, t)

    assert _rows(read_snapshot(spark, t)) == _rows(df)
    via_ds = spark.read.format("snapshot").option("path", t).load()
    assert _rows(via_ds.select(*df.columns)) == _rows(df)

    tuples = _tuples(t)
    m = _read_manifest(t, current_version(t))
    with_tuple = [f for f in m["files"] if f in tuples]
    assert len(with_tuple) >= 8  # ≥ (days × buckets present) leaves
    ex = tuples[with_tuple[0]]
    assert ex["spec_id"] == 1
    assert set(ex["values"]) == {"ts_day", "uid_bucket4"}
    # hidden partitioning: data files carry exactly the table schema
    import pyarrow.parquet as pq

    assert set(pq.read_schema(with_tuple[0]).names) == set(df.columns)


def test_day_range_prune_and_correctness(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    df = _events_df(spark)  # ~9 distinct days, hourly rows
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("ts", "day")])
    commit_append(df, t)

    lit = datetime.datetime(2024, 3, 8, 12, 0, 0)
    got = (
        spark.read.format("snapshot").option("path", t).load()
        .filter(F.col("ts") >= F.lit(lit))
    )
    want = df.filter(F.col("ts") >= F.lit(lit))
    assert _rows(got.select(*df.columns)) == _rows(want)

    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

    un = _untupled(t)
    assert un < _kept(t, [GreaterThanOrEqual(("ts",), lit)]) < _total(t)
    assert un < _kept(t, [LessThan(("ts",), lit)]) < _total(t)
    # exactly ONE day-partition file survives an equality probe (the
    # writer's repartition bounds output at one file per value), plus the
    # tuple-less pre-spec seed
    assert _kept(t, [EqualTo(("ts",), lit)]) == 1 + un
    # out-of-range probe plans zero tupled files
    assert _kept(
        t, [GreaterThanOrEqual(("ts",), datetime.datetime(2030, 1, 1))]
    ) == un


def test_bucket_prune_equality_and_in(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    df = _events_df(spark)
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("uid", "bucket[4]")])
    commit_append(df, t)

    got = (
        spark.read.format("snapshot").option("path", t).load()
        .filter(F.col("uid") == 3)
    )
    assert _rows(got.select(*df.columns)) == _rows(df.filter("uid = 3"))

    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    total = _total(t)
    assert _kept(t, [EqualTo(("uid",), 3)]) < total
    assert _kept(t, [In(("uid",), (3, 7))]) < total
    # bucket is not monotonic: range predicates must NOT prune
    assert _kept(t, [GreaterThan(("uid",), 3)]) == total


def test_truncate_prunes_strings_and_ints(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("apple", -27), ("apricot", -3), ("banana", 4), ("cherry", 123)],
        "word string, n long",
    )
    commit_append(df.limit(0), t)
    P.set_partition_spec(
        spark, t, [("word", "truncate[2]"), ("n", "truncate[10]")]
    )
    commit_append(df, t)

    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

    un = _untupled(t)
    # partition pruning keeps the two 'ap' leaves; footer min/max pruning
    # then drops the all-'apricot' file too → exactly one data file planned
    assert _kept(t, [EqualTo(("word",), "apple")]) == 1 + un
    # range pruning floors the literal: only the n∈[120,130) file survives
    assert _kept(t, [GreaterThanOrEqual(("n",), 100)]) == 1 + un
    got = (
        spark.read.format("snapshot").option("path", t).load()
        .filter("word = 'apple'")
    )
    assert got.count() == 1


def test_spec_evolution_old_and_new_files_coexist(registered, tmp_path):
    """Iceberg spec evolution: files written under spec 1 (day) keep
    pruning by day; later files under spec 2 (bucket) prune by bucket —
    in the same table, no rewrite."""
    spark = registered
    t = str(tmp_path / "t")
    df1 = _events_df(spark, 96)
    commit_append(df1.limit(0), t)
    P.set_partition_spec(spark, t, [("ts", "day")])
    commit_append(df1, t)
    n_spec1 = _total(t)

    P.set_partition_spec(spark, t, [("uid", "bucket[4]")])
    df2 = _events_df(spark, 96).withColumn("id", F.col("id") + 1000)
    commit_append(df2, t)

    tuples = _tuples(t)
    assert {e["spec_id"] for e in tuples.values()} == {1, 2}

    from pyspark.sql.datasource import EqualTo

    total = _total(t)
    # bucket probe prunes only spec-2 files: every spec-1 file survives
    kept = _kept(t, [EqualTo(("uid",), 2)])
    assert n_spec1 <= kept < total
    # read correctness across both specs
    got = (
        spark.read.format("snapshot").option("path", t).load()
        .filter("uid = 2")
    )
    both = df1.unionByName(df2).filter("uid = 2")
    assert _rows(got.select("id", "uid", "ts")) == _rows(both)


def test_null_partition_pruned_for_comparisons(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, s string"
    )
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("s", "identity")])
    commit_append(df, t)

    from pyspark.sql.datasource import EqualTo

    # the all-null file can't satisfy s = 'a'; one tupled file survives
    assert _kept(t, [EqualTo(("s",), "a")]) == 1 + _untupled(t)
    got = (
        spark.read.format("snapshot").option("path", t).load()
        .filter("s = 'a'")
    )
    assert [r.id for r in got.collect()] == [1]
    # and reading back includes the null row
    assert read_snapshot(spark, t).count() == 3


def test_spec_on_renamed_column_still_prunes(registered, tmp_path):
    """Column mapping interplay: evolve-rename the source column after the
    spec exists; filters on the NEW logical name keep pruning (specs store
    physical names; the reader maps logical→physical before matching)."""
    spark = registered
    t = str(tmp_path / "t")
    df = _events_df(spark, 96)
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("uid", "bucket[4]")])
    commit_append(df, t)

    from web_analytics_on_aws_spark.sources.evolution import (
        evolve_rename_column,
    )

    evolve_rename_column(spark, t, "uid", "user_bucket_key")

    from pyspark.sql.datasource import EqualTo

    assert _kept(t, [EqualTo(("user_bucket_key",), 2)]) < _total(t)
    got = (
        spark.read.format("snapshot").option("path", t).load()
        .filter("user_bucket_key = 2")
    )
    assert got.count() == df.filter("uid = 2").count()

    # and a NEW spec set via the logical name works (translated to phys)
    P.set_partition_spec(spark, t, [("user_bucket_key", "identity")])
    commit_append(
        df.withColumnRenamed("uid", "user_bucket_key").withColumn(
            "id", F.col("id") + 5000
        ),
        t,
    )
    assert _kept(t, [EqualTo(("user_bucket_key",), 2)]) < _total(t)


def test_unpartition_and_tuple_carry_through_dml(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    df = _events_df(spark, 96)
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("uid", "bucket[4]")])
    commit_append(df, t)
    before = _tuples(t)
    assert before

    # CoW delete rewrites SOME files; untouched files keep their tuples
    delete_where(spark, t, "id % 7 = 0")
    after = _tuples(t)
    m = _read_manifest(t, current_version(t))
    carried = set(before) & set(m["files"])
    assert all(after.get(f) == before[f] for f in carried)
    assert read_snapshot(spark, t).count() == df.filter("id % 7 != 0").count()

    # unpartition: future appends are flat and tuple-less
    P.set_partition_spec(spark, t, [])
    commit_append(df.withColumn("id", F.col("id") + 10_000), t)
    m2 = _read_manifest(t, current_version(t))
    new_files = set(m2["files"]) - set(m["files"])
    assert new_files and not any(f in _tuples(t) for f in new_files)


def test_hot_identity_value_fans_out(registered, tmp_path, monkeypatch):
    """VERDICT r5 #1 + r6 #1: a coarse identity spec (the reference's own
    PARTITIONED BY event — six values) must not serialize a hot partition
    value through ONE write task, and the fanout is BYTES-driven: the hot
    value gets ceil(bytes/target) writers, the cold value stays at one
    file, and a tiny batch writes one file per value (no salt at all)."""
    spark = registered
    t = str(tmp_path / "t")
    df = spark.range(4000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 9, "view")
        .otherwise("click")
        .alias("event"),
    )
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("event", "identity")])
    # push the target file size below the hot value's estimated bytes so
    # the bytes-driven fanout engages at test scale
    monkeypatch.setenv("SPARK_GRAFT_TARGET_FILE_MB", "0.02")
    commit_append(df, t)
    by_val: dict[str, list[str]] = {}
    for f, e in _tuples(t).items():
        by_val.setdefault(e["values"]["event"], []).append(f)
    # the 90%-skewed value got >1 write task; the cold one stayed at 1
    cap = P._fanout_cap(df)
    assert 1 < len(by_val["view"]) <= cap
    assert len(by_val["click"]) == 1
    from pyspark.sql.datasource import EqualTo

    un = _untupled(t)
    assert _kept(t, [EqualTo(("event",), "click")]) == len(
        by_val["click"]
    ) + un
    got = (
        spark.read.format("snapshot").option("path", t).load()
        .filter("event = 'view'")
    )
    assert got.count() == df.filter("event = 'view'").count()


def test_optimize_preserves_partition_tuples(registered, tmp_path):
    """VERDICT r5 #2 (Iceberg binpack-within-partition): compaction groups
    rewrite inputs by partition tuple and the outputs inherit it — a
    day-partitioned table keeps pruning to the same day set after aging
    through optimize, instead of degrading to footer-stat skipping."""
    spark = registered
    t = str(tmp_path / "t")
    df = _events_df(spark, 96)  # 4 distinct days
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("ts", "day")])
    for i in range(3):  # 3 small appends → 3 small files per day
        commit_append(df.withColumn("id", F.col("id") + i * 1000), t)

    from pyspark.sql.datasource import EqualTo

    lit = datetime.datetime(2024, 3, 6, 12, 0, 0)
    un = _untupled(t)
    assert _kept(t, [EqualTo(("ts",), lit)]) == 3 + un
    total_rows = read_snapshot(spark, t).count()

    from web_analytics_on_aws_spark.sources.snapshots import optimize

    res = optimize(spark, t, small_file_mb=8.0, min_small_files=2)
    assert res["rewritten"] >= 12  # all 4 days × 3 files compacted
    # every rewritten output carries its group's tuple: the same day probe
    # now plans exactly ONE compacted file (plus the tuple-less seed)
    assert _kept(t, [EqualTo(("ts",), lit)]) == 1 + _untupled(t)
    m = _read_manifest(t, current_version(t))
    fp = m.get("file_partitions", {})
    days = {e["values"]["ts_day"] for e in fp.values()}
    assert len(days) == 4  # no cross-day merge
    assert read_snapshot(spark, t).count() == total_rows


def test_branch_and_fast_forward_carry_partitioning(registered, tmp_path):
    """ADVICE r5: a branch of a partitioned table keeps the spec (branch
    appends route through it) and fast-forward carries the spec AND the
    per-file tuples — re-keyed to the adopted paths — back onto main."""
    spark = registered
    t = str(tmp_path / "t")
    df = _events_df(spark, 48)
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("ts", "day")])
    commit_append(df, t)

    from web_analytics_on_aws_spark.sources.refs import (
        create_branch,
        fast_forward,
    )

    bp = create_branch(t, "audit")
    mb = _read_manifest(bp, current_version(bp))
    assert (mb.get("partitioning") or {}).get("current") == 1
    assert len(mb.get("file_partitions", {})) == len(_tuples(t))

    # a branch append routes through the carried spec → tupled files
    commit_append(df.withColumn("id", F.col("id") + 100), bp)
    mb2 = _read_manifest(bp, current_version(bp))
    new = set(mb2["files"]) - set(mb["files"])
    assert new and all(f in mb2["file_partitions"] for f in new)

    v = fast_forward(t, "audit")
    mm = _read_manifest(t, v)
    assert (mm.get("partitioning") or {}).get("current") == 1
    # every tupled branch file arrived on main with a tuple (adopted
    # branch-local paths re-keyed), so day pruning works on main
    assert len(mm["file_partitions"]) == len(mb2["file_partitions"])
    from pyspark.sql.datasource import GreaterThanOrEqual

    assert _kept(
        t, [GreaterThanOrEqual(("ts",), datetime.datetime(2030, 1, 1))]
    ) == _untupled(t)
    assert read_snapshot(spark, t).count() == 96


def test_merge_snapshot_keeps_identity_spec(registered, tmp_path):
    """VERDICT r5 #4: the weblog MERGE path (merge_snapshot →
    commit_overwrite) must route through the table's identity spec — one
    upsert must not silently de-partition the reference-parity
    PARTITIONED BY (event) table. Pins tuple carry + equality pruning
    after two overlapping merge batches."""
    from web_analytics_on_aws_spark.operators.upsert import merge_snapshot

    spark = registered
    t = str(tmp_path / "t")
    df = spark.range(300).select(
        F.col("id").alias("event_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("event"),
        (F.col("id") * 2).alias("value"),
    )
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("event", "identity")])
    merge_snapshot(spark, df.filter("event_id < 200"), t, keys=["event_id"])
    merge_snapshot(spark, df.filter("event_id >= 100"), t, keys=["event_id"])

    m = _read_manifest(t, current_version(t))
    fp = m.get("file_partitions", {})
    # every data file of the merged table carries a tuple (the overwrite
    # rewrote everything under the spec; no pre-spec stragglers survive)
    assert m["files"] and all(f in fp for f in m["files"])
    vals = {e["values"]["event"] for e in fp.values()}
    assert vals == {"view", "click", "purchase"}

    from pyspark.sql.datasource import EqualTo

    n_purchase = sum(
        1 for e in fp.values() if e["values"]["event"] == "purchase"
    )
    assert _kept(t, [EqualTo(("event",), "purchase")]) == n_purchase < _total(t)
    got = (
        spark.read.format("snapshot").option("path", t).load()
        .filter("event = 'purchase'")
    )
    assert _rows(got.select("event_id", "event", "value")) == _rows(
        df.filter("event = 'purchase'")
    )


def test_wap_stage_routes_through_spec(registered, tmp_path):
    """A write-audit-publish staged append on a partitioned table routes
    through the spec at STAGE time; publish adopts the tuples — no
    untupled (unprunable) files ever reach main."""
    from web_analytics_on_aws_spark.sources.refs import (
        commit_append_wap,
        publish_wap,
        read_wap,
    )

    spark = registered
    t = str(tmp_path / "t")
    df = _events_df(spark, 48)
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("ts", "day")])
    commit_append(df, t)
    n_before = len(_tuples(t))

    staged = df.withColumn("id", F.col("id") + 1000)
    commit_append_wap(staged, t, "audit1")
    # stage invisible on main; audit view sees both
    assert read_snapshot(spark, t).count() == 48
    assert read_wap(spark, t, "audit1").count() == 96

    publish_wap(t, "audit1")
    assert len(_tuples(t)) > n_before
    # every published staged file carries a day tuple: only the pre-spec
    # seed remains untupled
    assert _untupled(t) == 1
    from pyspark.sql.datasource import GreaterThanOrEqual

    assert _kept(
        t, [GreaterThanOrEqual(("ts",), datetime.datetime(2030, 1, 1))]
    ) == _untupled(t)
    assert read_snapshot(spark, t).count() == 96


def test_compact_deletes_preserves_tuples(registered, tmp_path):
    """MOR sidecar fold-in rewrites within partition groups (same contract
    as optimize): a day-partitioned streaming table keeps its tuples —
    and therefore manifest pruning — as maintenance folds deletes in."""
    from web_analytics_on_aws_spark.sources.snapshots import (
        compact_deletes,
        delete_where_mor,
    )

    spark = registered
    t = str(tmp_path / "t")
    df = _events_df(spark, 96)  # 4 days
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("ts", "day")])
    commit_append(df, t)
    delete_where_mor(spark, t, "id % 5 = 0")
    res = compact_deletes(spark, t)
    assert res["files_rewritten"] > 0
    m = _read_manifest(t, current_version(t))
    fp = m.get("file_partitions", {})
    # every rewritten survivor kept a day tuple; only the seed is untupled
    assert _untupled(t) == 1
    assert {e["values"]["ts_day"] for e in fp.values()} == {
        "2024-03-05", "2024-03-06", "2024-03-07", "2024-03-08"
    }
    from pyspark.sql.datasource import EqualTo

    lit = datetime.datetime(2024, 3, 6, 12, 0, 0)
    assert _kept(t, [EqualTo(("ts",), lit)]) < _total(t)
    assert read_snapshot(spark, t).count() == df.filter("id % 5 != 0").count()


def test_upsert_keys_mor_routes_through_spec(registered, tmp_path):
    """The streaming MOR upsert (upsert_keys_mor — the snapshot_sink
    write path) appends its data half through the current spec: tuples
    recorded, key sidecars untupled (they are delete metadata), and the
    table never slowly de-partitions under a streaming upsert load."""
    from web_analytics_on_aws_spark.sources.snapshots import upsert_keys_mor

    spark = registered
    t = str(tmp_path / "t")
    df = _events_df(spark, 96)
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("ts", "day")])
    commit_append(df, t)
    n_before = len(_tuples(t))

    batch = df.filter("id % 3 = 0").withColumn(
        "uid", F.col("uid") + 100
    )
    upsert_keys_mor(spark, t, batch, keys=["id"])
    m = _read_manifest(t, current_version(t))
    tuples = _tuples(t)
    assert len(tuples) > n_before  # new data files carry day tuples
    # read-back: upserted rows replaced, partition routing intact
    got = {r.id: r.uid for r in read_snapshot(spark, t).collect()}
    assert len(got) == 96 and got[0] == 100 and got[1] == 1
    # new data files have manifest stats too
    fs = m.get("file_stats", {})
    new_data = [f for f in m["files"] if f in tuples and f in fs]
    assert new_data


def test_partition_spec_survives_restore(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    df = _events_df(spark, 48)
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("ts", "day")])
    commit_append(df, t)
    v_part = current_version(t)
    commit_append(df.withColumn("id", F.col("id") + 100), t)

    from web_analytics_on_aws_spark.sources.snapshots import restore_version

    restore_version(spark, t, v_part)
    assert read_snapshot(spark, t).count() == 48
    # tuples for the restored files still present → pruning still works
    from pyspark.sql.datasource import GreaterThanOrEqual

    assert _kept(
        t,
        [GreaterThanOrEqual(("ts",), datetime.datetime(2030, 1, 1))],
    ) == _untupled(t)


# ---------------------------------------------------------------------------
# ADVICE r6: truncate on non-integral numerics must never prune
# ---------------------------------------------------------------------------


def test_truncate_nonintegral_numeric_never_prunes():
    """A stamped truncate spec on a float/double/decimal column truncated
    the STRING rendering on write, whose lexical order is not numeric
    order (10.50 → '10.' sorts BELOW 9.50 → '9.5'): range pruning on it
    silently dropped matching files (ADVICE r6). Such fields are no longer
    range-safe and literal transforms refuse (keep-the-file)."""
    for stype in ("double", "float", "decimal(10,2)"):
        f = {"name": "t", "source": "v", "transform": "truncate[3]",
             "source_type": stype}
        assert not P._range_safe(f)
        with pytest.raises(TypeError, match="not plannable"):
            P.apply_transform(f, 9.6)
    # the concrete wrong-prune from the advice: file tuple '10.' (value
    # 10.50), predicate v > 9.6 — the file HOLDS a match and must be kept
    from pyspark.sql.datasource import GreaterThan

    f = {"name": "t", "source": "v", "transform": "truncate[3]",
         "source_type": "double"}
    entry = {"spec_id": 1, "values": {"t": "10."}}
    assert P.file_may_match(
        [GreaterThan(("v",), 9.6)], entry, {"1": [f]}, {}
    )
    # integral and string stamps keep their exact pruning
    assert P._range_safe(f | {"source_type": "bigint"})
    assert P._range_safe(f | {"source_type": "string"})


def test_set_partition_spec_rejects_truncate_on_nonintegral(
    registered, tmp_path
):
    spark = registered
    t = str(tmp_path / "t")
    commit_append(
        spark.createDataFrame([(1.5, "a")], "v double, s string"), t
    )
    with pytest.raises(ValueError, match="truncate transform"):
        P.set_partition_spec(spark, t, [("v", "truncate[3]")])
    # string/integral truncate still accepted
    P.set_partition_spec(spark, t, [("s", "truncate[2]")])


def test_tiny_batch_writes_one_file_per_value(registered, tmp_path):
    """VERDICT r6 #1 (the other end): a small micro-batch under the
    default 128 MB target collapses to ONE file per partition value —
    no 8× small-file inflation for streaming appends."""
    spark = registered
    t = str(tmp_path / "t")
    df = spark.range(4000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 9, "view").otherwise("click").alias(
            "event"
        ),
    )
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("event", "identity")])
    commit_append(df, t)  # default target: this batch is tiny
    by_val: dict[str, int] = {}
    for e in _tuples(t).values():
        v = e["values"]["event"]
        by_val[v] = by_val.get(v, 0) + 1
    assert by_val == {"view": 1, "click": 1}


def test_fanout_grows_with_planted_bytes(registered, tmp_path, monkeypatch):
    """VERDICT r6 #1 done-criterion: n grows with the hot value's bytes
    at a fixed target file size."""
    spark = registered
    monkeypatch.setenv("SPARK_GRAFT_TARGET_FILE_MB", "0.02")
    files_at: dict[int, int] = {}
    for rows in (2000, 8000):
        t = str(tmp_path / f"t{rows}")
        df = spark.range(rows).select(
            F.col("id"), F.lit("hot").alias("event")
        )
        commit_append(df.limit(0), t)
        P.set_partition_spec(spark, t, [("event", "identity")])
        commit_append(df, t)
        files_at[rows] = len(_tuples(t))
    assert files_at[8000] > files_at[2000] >= 1


def test_sorted_fanout_bands_are_disjoint_per_value(
    registered, tmp_path, monkeypatch
):
    """VERDICT r6 #7: identity spec + declared write sort order → the n_v
    files of ONE partition value carry disjoint sort-column bands (range-
    bucket salt, not hash salt), so a point probe inside a partition plans
    O(1) files."""
    from web_analytics_on_aws_spark.sources.snapshots import set_sort_order

    spark = registered
    t = str(tmp_path / "t")
    df = spark.range(8000).select(
        (F.col("id") * 1315423911 % 8000).alias("k"),
        F.when(F.col("id") % 10 < 9, "view").otherwise("click").alias(
            "event"
        ),
    ).repartition(4)
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("event", "identity")])
    set_sort_order(spark, t, ["k"])
    monkeypatch.setenv("SPARK_GRAFT_TARGET_FILE_MB", "0.02")
    commit_append(df, t)

    m = _read_manifest(t, current_version(t))
    fs = m.get("file_stats", {})
    by_val: dict[str, list] = {}
    for f, e in _tuples(t).items():
        if fs.get(f, {}).get("rows"):
            by_val.setdefault(e["values"]["event"], []).append(
                tuple(fs[f]["cols"]["k"])
            )
    assert len(by_val["view"]) > 1  # the hot value really fanned out
    for bands in by_val.values():
        bands = sorted(bands)
        assert all(
            bands[i][1] < bands[i + 1][0] for i in range(len(bands) - 1)
        ), bands
    # point probe inside the hot partition plans O(1) files
    from pyspark.sql.datasource import EqualTo

    un = _untupled(t)
    kept = _kept(t, [EqualTo(("event",), "view"), EqualTo(("k",), 4321)])
    assert kept <= 1 + un
    got = (
        spark.read.format("snapshot").option("path", t).load()
        .filter("event = 'view' and k = 4321")
        .count()
    )
    assert got == df.filter("event = 'view' and k = 4321").count()


def test_metadata_partitions_table_uses_tuples(registered, tmp_path):
    """`table$partitions` on a hidden-partitioned table groups by the
    manifest partition TUPLE with manifest-stats rollups (Iceberg's real
    $partitions), not by commit directory."""
    from web_analytics_on_aws_spark.sources.snapshots import metadata_table

    spark = registered
    t = str(tmp_path / "t")
    df = spark.range(300).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, "view").otherwise("click").alias("ev"),
    )
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("ev", "identity")])
    commit_append(df, t)
    got = {
        r["partition"]: (r["n_files"], r["record_count"])
        for r in metadata_table(spark, t, "partitions").collect()
        if r["partition"] is not None
    }
    assert got['{"ev": "view"}'][1] == 100
    assert got['{"ev": "click"}'][1] == 200

    # outstanding MOR sidecars: SHOW PARTITIONS refuses (counts would
    # lie) but the inspection table still reports the grouping with
    # NULL counts instead of raising
    from web_analytics_on_aws_spark.sources.snapshots import delete_where_mor

    delete_where_mor(spark, t, "id % 10 = 0")
    rows = metadata_table(spark, t, "partitions").collect()
    by_part = {r["partition"]: r for r in rows if r["partition"]}
    assert set(by_part) == {'{"ev": "view"}', '{"ev": "click"}'}
    assert all(r["record_count"] is None for r in by_part.values())
    assert all(r["n_files"] >= 1 for r in by_part.values())


def test_cow_dml_rewrites_keep_partition_tuples(registered, tmp_path):
    """Round 7: copy-on-write DELETE/UPDATE route their replacement files
    through the CURRENT spec (Iceberg CoW rewrites adopt the current
    spec) — DML never leaves untupled files in a partitioned table, and
    an UPDATE that moves the partition source column re-routes rows."""
    spark = registered
    t = str(tmp_path / "t")
    df = spark.range(300).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, "view").otherwise("click").alias("ev"),
    )
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("ev", "identity")])
    commit_append(df, t)

    from web_analytics_on_aws_spark.sources.snapshots import update_where

    delete_where(spark, t, "id % 10 = 0")
    # an UPDATE that MOVES rows across partitions: view → purchase
    update_where(
        spark, t, "ev = 'view' and id % 2 = 1", {"ev": "'purchase'"}
    )
    m = _read_manifest(t, current_version(t))
    fp = m.get("file_partitions", {})
    fs = m.get("file_stats", {})
    untupled = [f for f in m["files"] if f not in fp]
    assert all(fs.get(f, {}).get("rows") == 0 for f in untupled)
    vals = {fp[f]["values"]["ev"] for f in m["files"] if f in fp}
    assert "purchase" in vals  # moved rows landed in their new partition
    # pruning still exact after two DML rewrites
    from pyspark.sql.datasource import EqualTo

    got = (
        spark.read.format("snapshot").option("path", t).load()
        .filter("ev = 'purchase'")
        .count()
    )
    want = df.filter("id % 10 != 0").filter(
        "ev = 'view' and id % 2 = 1"
    ).count()
    assert got == want
    kept = _kept(t, [EqualTo(("ev",), "purchase")])
    assert kept < len(m["files"])


def test_merge_into_keeps_partition_tuples(registered, tmp_path):
    """Round 7: the file-scoped CoW MERGE (snapshots.merge_into) routes
    its replacement files through the current spec too — keyed merges on
    a partitioned table keep every non-empty file tupled, and a source
    row that changes the partition column lands in its new partition."""
    from web_analytics_on_aws_spark.sources.snapshots import merge_into

    spark = registered
    t = str(tmp_path / "t")
    df = spark.range(300).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, "view").otherwise("click").alias("ev"),
    )
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("ev", "identity")])
    commit_append(df, t)
    # keyed merge: update 50 rows into a NEW partition value + insert 10
    src = spark.range(250, 310).select(
        F.col("id"), F.lit("purchase").alias("ev")
    )
    merge_into(spark, t, src, keys=["id"])
    m = _read_manifest(t, current_version(t))
    fp = m.get("file_partitions", {})
    fs = m.get("file_stats", {})
    untupled = [f for f in m["files"] if f not in fp]
    assert all(fs.get(f, {}).get("rows") == 0 for f in untupled)
    assert "purchase" in {
        fp[f]["values"]["ev"] for f in m["files"] if f in fp
    }
    got = {
        r["ev"]: r["n"]
        for r in read_snapshot(spark, t)
        .groupBy("ev").agg(F.count("*").alias("n")).collect()
    }
    assert got["purchase"] == 60 and sum(got.values()) == 310


def test_fanout_micro_batch_skips_sizing_job(
    registered, tmp_path, monkeypatch
):
    """Round 7: when Catalyst plan statistics already bound the batch
    under one target file, the partitioned write never runs its sizing
    aggregation — streaming micro-batch appends pay ZERO extra passes
    (pinned by making the measured path unreachable)."""
    from web_analytics_on_aws_spark.sources import partitioning as PP

    spark = registered
    df = spark.range(100).select(
        F.col("id"), F.lit("view").alias("event")
    )
    assert PP._plan_under_target(df, PP._target_bytes())

    def boom(*a, **kw):
        raise AssertionError("sizing job ran for an under-target batch")

    monkeypatch.setattr(PP, "_fanout_plan", boom)
    monkeypatch.setattr(PP, "_range_width", boom)
    t = str(tmp_path / "t")
    commit_append(df.limit(0), t)
    P.set_partition_spec(spark, t, [("event", "identity")])
    commit_append(df, t)
    assert read_snapshot(spark, t).count() == 100
    assert len(_tuples(t)) == 1  # one file for the one value
