"""Graph-analytics registrations beyond connected components: PageRank
over the nation-trade graph — the iterative-algorithm pattern (bounded
node state, re-planned per round) with an exactly-unrolled SQL oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from web_analytics_on_aws_spark.plans import query
from web_analytics_on_aws_spark.sources.tables import load_table

_DAMP = 0.85
_ITERS = 3

# Edge extraction shared by both engines: trade volume (line counts) from
# the customer's nation to the supplier's nation.
_EDGES_SQL = """
    SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
           COUNT(*) AS w
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY c.c_nationkey, s.s_nationkey
"""


def _unrolled_oracle() -> str:
    """PageRank unrolled to _ITERS rounds in plain CTEs (no recursion —
    float semantics stay the simple Σ both engines share)."""
    sql = f"""
    WITH edges AS ({_EDGES_SQL}),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    outw AS (
      SELECT src, CAST(SUM(w) AS DOUBLE) AS ow FROM edges GROUP BY src
    ),
    norm AS (
      SELECT e.src, e.dst, e.w / o.ow AS p
      FROM edges e JOIN outw o ON o.src = e.src
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes)
    """
    prev = "r0"
    for i in range(1, _ITERS + 1):
        sql += f""",
    r{i} AS (
      SELECT nodes.node,
             (1.0 - {_DAMP}) / (SELECT n FROM nn)
             + {_DAMP} * COALESCE(inflow.s, 0.0)
             + {_DAMP} * COALESCE((SELECT SUM(r) FROM {prev}
                          WHERE node NOT IN (SELECT src FROM norm)), 0.0)
               / (SELECT n FROM nn) AS r
      FROM nodes
      LEFT JOIN (
        SELECT norm.dst AS node, SUM({prev}.r * norm.p) AS s
        FROM norm JOIN {prev} ON {prev}.node = norm.src
        GROUP BY norm.dst
      ) inflow ON inflow.node = nodes.node
    )"""
        prev = f"r{i}"
    sql += f"""
    SELECT node AS nationkey, ROUND(r, 6) AS pagerank
    FROM {prev}
    """
    return sql


@query("graph_nation_trade_pagerank", oracle=_unrolled_oracle())
def nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 rounds, dangling mass redistributed
    uniformly) over the nation→nation trade graph extracted from the fact
    tables. The iterative pattern for 100 TB graphs: the edge extraction
    is the only fact-scale work (one join tree + one groupBy — edges
    collapse to |nations|² rows); each round then joins the bounded
    rank state against the normalized edge list — rank state is O(nodes),
    lineage stays one round deep, and rounds scale with iterations, not
    data. The oracle unrolls the same three rounds in plain CTEs."""
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    edges = spark.sql(_EDGES_SQL)
    nodes = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    n = nodes.count()
    outw = edges.groupBy("src").agg(F.sum("w").cast("double").alias("ow"))
    norm = edges.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("p")
    )
    norm.cache()
    sources = norm.select(F.col("src").alias("node")).distinct()
    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    for _ in range(_ITERS):
        dangling = (
            ranks.join(sources, "node", "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("d"))
            .collect()[0]["d"]
        )
        inflow = (
            norm.join(ranks.select(F.col("node").alias("src"), "r"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("r") * F.col("p")).alias("s"))
        )
        ranks = nodes.join(inflow, "node", "left").select(
            "node",
            (
                F.lit((1.0 - _DAMP) / n)
                + F.lit(_DAMP) * F.coalesce(F.col("s"), F.lit(0.0))
                + F.lit(_DAMP * dangling / n)
            ).alias("r"),
        )
        # truncate lineage each round: without this the per-round dangling
        # collect and the final job re-execute every prior round's joins
        # (O(iters²) recomputation)
        ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        F.col("node").alias("nationkey"), F.round("r", 6).alias("pagerank")
    )
