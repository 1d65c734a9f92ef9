"""Registered queries over the NAMED-REFS storage surface (VERDICT r4 #6).

The refs layer (sources/refs.py: tags, zero-copy branches, fast-forward,
WAP) models the managed-Iceberg ref spec the reference's tables rely on
(`/root/reference/web-analytics-iceberg/README.md` — Iceberg v2 branching
and `spark.wap.id` staged commits). These queries make that surface
reachable from the driver's correctness gate: a deterministic snapshot
table is built ONCE per (machine, sf_dir) from `orders`, tagged and
branched, and the registered queries read THROUGH the refs — so
`read_ref`, tag pinning across head movement, and branch isolation are
all oracle-checked against plain SQL over the source parquet.

Table lifecycle (build-once, fingerprint-keyed, same discipline as the
materialized IVF index in plans/corpus_ops.py):

- v1  = orders with o_orderkey % 7 != 0          → tag  ``audit-v1``
- branch ``exp`` forks v1, then appends the even %7==0 keys (branch-only)
- main advances: CoW delete of o_orderkey % 5 == 0 rows

A tag read must see v1 EXACTLY (head has moved past it); a branch read
must see v1 + branch-local appends and NONE of main's later deletes.
"""

from __future__ import annotations

import json
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from web_analytics_on_aws_spark.plans import query
from web_analytics_on_aws_spark.sources.tables import load_table

_TAG = "audit-v1"
_BRANCH = "exp"


def _ensure_refs_table(spark: SparkSession, sf_dir: str) -> str:
    """Build the tagged/branched orders snapshot once per process+sf_dir
    (scratch under $TMPDIR, fingerprinted by the source parquet's row
    count + byte size + layout version); reuse across bench passes and
    driver reruns. Freshness check is footer metadata only."""
    import pyarrow.parquet as pq

    from web_analytics_on_aws_spark.sources import refs, snapshots

    src = os.path.join(sf_dir, "orders.parquet")
    fingerprint = {
        "n": pq.ParquetFile(src).metadata.num_rows,
        "bytes": os.path.getsize(src),
        "layout": 2,  # v2: columnar parquet manifest segments
    }
    from web_analytics_on_aws_spark.plans import scratch_root

    key = sf_dir.rstrip("/").replace("/", "_").lstrip("_")
    table = os.path.join(scratch_root(), "refs_table", key)
    marker = table + ".meta.json"
    if os.path.exists(marker):
        try:
            with open(marker) as fh:
                if json.load(fh) == fingerprint and (
                    snapshots.current_version(table) is not None
                ):
                    return table
        except (ValueError, OSError):
            pass
    shutil.rmtree(table, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    snapshots.commit_append(
        orders.filter(F.col("o_orderkey") % 7 != 0), table
    )
    refs.create_tag(table, _TAG)
    refs.create_branch(table, _BRANCH)
    snapshots.commit_append(
        orders.filter(
            (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 2 == 0)
        ),
        refs.branch_path(table, _BRANCH),
    )
    # main moves past the tag/branch point — CoW delete so the tag must
    # pin the PRE-delete file set to stay correct
    snapshots.delete_where(spark, table, "o_orderkey % 5 = 0")
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as fh:
        json.dump(fingerprint, fh)
    return table


def _status_rollup(df: DataFrame) -> DataFrame:
    return df.groupBy("o_orderstatus").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


@query(
    "snapshot_read_at_tag",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders WHERE o_orderkey % 7 <> 0
    GROUP BY o_orderstatus
    """,
)
def snapshot_read_at_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the snapshot table AT A TAG (`VERSION AS OF 'audit-v1'`
    surface, sources/refs.py:read_ref): the head has since CoW-deleted
    every o_orderkey % 5 == 0 row, so a correct tag read must resolve the
    PINNED v1 manifest — the oracle is v1's defining predicate over the
    source parquet. Metadata-only resolution (one JSON read) in front of
    an ordinary pruned parquet scan + one partial-agg shuffle."""
    from web_analytics_on_aws_spark.sources import refs

    table = _ensure_refs_table(spark, sf_dir)
    return _status_rollup(refs.read_ref(spark, table, _TAG))


@query(
    "snapshot_read_at_branch",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_orderkey % 7 <> 0
       OR (o_orderkey % 7 = 0 AND o_orderkey % 2 = 0)
    GROUP BY o_orderstatus
    """,
)
def snapshot_read_at_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the snapshot table AT A BRANCH HEAD: the `exp` branch forked
    v1 zero-copy and appended the even %7==0 keys into its OWN data dir,
    while main later deleted %5==0 rows — branch isolation means the read
    sees fork + branch-local appends and none of main's later DML. The
    oracle is that state's closed-form predicate over the source parquet."""
    from web_analytics_on_aws_spark.sources import refs

    table = _ensure_refs_table(spark, sf_dir)
    return _status_rollup(refs.read_ref(spark, table, _BRANCH))
