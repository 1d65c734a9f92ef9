"""Partition pruning pins: static partition-filter pruning and runtime
dynamic partition pruning (DPP) on hive-layout tables — the mechanism that
makes a day-partitioned 100 TB fact table readable in O(days touched), and
a dim-filtered star join readable in O(days the dim selects)."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def parted(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("dpp")
    fact = str(root / "fact")
    (
        spark.range(10_000)
        .select(
            F.col("id"),
            (F.col("id") % 30).alias("day"),
            (F.col("id") % 7).alias("v"),
        )
        .write.partitionBy("day")
        .parquet(fact)
    )
    dim = spark.createDataFrame(
        [(d, "keep" if d < 3 else "drop") for d in range(30)], "day long, tag string"
    )
    return fact, dim


def test_static_partition_pruning(spark, parted):
    fact, _ = parted
    df = spark.read.parquet(fact).filter(F.col("day") == 3)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the partition predicate must land in PartitionFilters, not a row filter
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters")[1][:200]
    assert df.count() == 10_000 // 30 + (1 if 3 < 10_000 % 30 else 0)


def test_dynamic_partition_pruning_star_join(spark, parted):
    fact, dim = parted
    f = spark.read.parquet(fact)
    joined = f.join(dim.filter(F.col("tag") == "keep").hint("broadcast"), "day")
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # correctness: only days 0-2 survive
    assert joined.select("day").distinct().count() == 3


def test_aqe_splits_skewed_join(spark):
    """AQE's skew-join handling is the default remedy SCALE.md leans on for
    hot keys (salting is the manual fallback): a 95%-one-key fact joined
    sort-merge must show skew-split partitions in the final adaptive plan."""
    import pyspark.sql.functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        fact = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, 7).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pad"),
        )
        dim = spark.range(0, 200_000).select(
            F.col("id").alias("k"), F.lit("d").alias("dv")
        )
        joined = fact.join(dim, "k").select(F.count("*").alias("n"))
        assert joined.collect()[0]["n"] == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_analyze_table_feeds_cbo_stats(spark, tmp_path):
    """ANALYZE TABLE COMPUTE STATISTICS populates row/size stats the
    cost-based optimizer reads — the catalog half of stats-informed join
    planning (the runtime half is AQE, pinned above)."""
    import pyspark.sql.functions as F

    spark.sql("CREATE DATABASE IF NOT EXISTS statsdb")
    try:
        spark.range(5_000).select(
            F.col("id"), (F.col("id") % 50).alias("grp")
        ).write.mode("overwrite").saveAsTable("statsdb.fact")
        spark.sql("ANALYZE TABLE statsdb.fact COMPUTE STATISTICS FOR COLUMNS id, grp")
        stats_row = [
            r for r in spark.sql("DESCRIBE TABLE EXTENDED statsdb.fact").collect()
            if r["col_name"] == "Statistics"
        ]
        assert stats_row and "5000 rows" in stats_row[0]["data_type"]
        col = spark.sql("DESCRIBE TABLE EXTENDED statsdb.fact grp").collect()
        got = {r["info_name"]: r["info_value"] for r in col}
        # column NDV is an HLL estimate — assert the right ballpark
        assert 40 <= int(got["distinct_count"]) <= 60
    finally:
        spark.sql("DROP TABLE IF EXISTS statsdb.fact")
        spark.sql("DROP DATABASE IF EXISTS statsdb")
