"""TPC-H suite completion (adapted to the driver's reduced star schema).

The reference's query surface is full Trino SQL (Athena engine v3,
/root/reference/web-analytics-parquet/cdk_stacks/athena_workgroup.py:45-48);
plans/tpch.py covers q1/q3/q5/q6/q10/q14/q18 — this module completes the
remaining TPC-H query *shapes*, adapted to the available columns (the driver
schema has no partsupp table and lineitem carries only l_shipdate, so
commit/receipt-date and supplycost predicates are re-expressed on the columns
that exist; the operator shapes — correlated EXISTS, double aggregation over
an outer join, grouped-HAVING semi-joins, disjunctive pushdown, cross-
multiplied average thresholds — are preserved exactly).

Exactness discipline (driver hash-compares values bit-for-bit): money math is
decimal(18,2) before any arithmetic; average thresholds are cross-multiplied
(`x * n > sum`) instead of divided so no engine-dependent double rounding can
flip a boundary row; the only doubles are final casts applied identically on
both sides.

Scale notes (100 TB): every dim join here broadcasts; the self-joins on
lineitem (q17/q21 shapes) shuffle on l_orderkey/l_partkey — the natural key —
and are AQE-skew-splittable; all aggregates are partial/final hash aggregates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from web_analytics_on_aws_spark.functions import dec_sum
from web_analytics_on_aws_spark.plans import query
from web_analytics_on_aws_spark.plans.tpch import _REV_SQL, _rev
from web_analytics_on_aws_spark.sources.tables import load_table


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking: correlated EXISTS with a cross-table
    inequality (shipped-after-ordered replaces commit<receipt) — planned as a
    left-semi join on l_orderkey with the inequality as join residual."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
             {_REV_SQL} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between a nation pair: two broadcast copies of the
    nation dim (supplier-side and customer-side roles), symmetric pair
    predicate, group by (nation pair, ship year)."""
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
           COUNT(*) AS cnt
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             {_REV_SQL} AS volume, n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share: 8-way star join (nation twice in different
    roles), conditional decimal sum ratio per order year."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    share = F.when(F.col("nation") == "NATION_3", _rev()).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(share).cast("double") / F.sum(_rev()).cast("double")).alias(
                "mkt_share"
            ),
            F.count("*").alias("cnt"),
        )
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             {_REV_SQL} AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (no ps_supplycost in this schema → profit =
    discounted revenue): LIKE-filtered part dim broadcast into the fact,
    grouped by supplier nation × order year."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("sum_profit"))
    )


@query(
    "tpch_q12_priority_lines",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority line counts (q12 shape; l_returnflag stands in for
    the absent l_shipmode): fact-fact equi-join + CASE-count aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution: outer join with an extra join-side
    predicate (must stay in the ON clause, not a post-filter — filtering
    after the join would drop the zero-order customers), then a second
    aggregation over the first's result."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier: the revenue 'view' is computed once and reused for both
    the max (scalar) and the join probe; the decimal MAX comparison is exact
    so ties select identically in any engine."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    top = rev.agg(F.max("total_rev").alias("__max_rev"))
    return (
        rev.join(F.broadcast(top), rev.total_rev == F.col("__max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


@query(
    "tpch_q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part/supplier relationship (lineitem is the bridge — no partsupp in
    this schema): negated predicates + IN-list on the dim, COUNT(DISTINCT)
    over the join. Catalyst plans distinct-agg as a two-phase expand."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly,
           COUNT(*) AS cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS pk,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
                 COUNT(*) AS cq
          FROM lineitem GROUP BY l_partkey) per_part
      ON pk = p_partkey
    WHERE p_brand = 'Brand#11'
      AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cq < sq
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue: the classic correlated AVG threshold,
    de-correlated into a per-part aggregate join and cross-multiplied
    (qty * 5 * n < sum ⟺ qty < 0.2 * avg) so the boundary is decided in
    exact decimal arithmetic on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec("l_quantity")).alias("sq"), F.count("*").alias("cq")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, F.col("pk") == part.p_partkey)
        .filter(_dec("l_quantity") * 5 * F.col("cq") < F.col("sq"))
        .agg(
            (dec_sum("l_extendedprice") / F.lit(7.0)).cast("double").alias("avg_yearly"),
            F.count("*").alias("cnt"),
        )
    )


@query(
    "tpch_q19_disjunctive_pred",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under a 3-branch disjunctive predicate spanning
    both sides of the join — Catalyst extracts the common p/l conjuncts per
    side for pushdown and keeps the disjunction as join residual."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    br = F.col("p_brand")
    cond = (
        ((br == "Brand#12") & sz.between(1, 15) & q.between(1, 11))
        | ((br == "Brand#23") & sz.between(1, 25) & q.between(10, 20))
        | ((br == "Brand#34") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count("*").alias("cnt"),
        )
    )


@query(
    "tpch_q20_part_promotion",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50
    )
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion: IN over a grouped-HAVING subquery — an
    aggregate builds the qualifying-supplier set, then a left-semi join
    probes it. Exact decimal HAVING bound."""
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    qualified = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
    )
    return supp.join(
        qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (q21 shape; l_shipdate stands in
    for receipt-vs-commit lateness): EXISTS + NOT EXISTS self-joins on
    lineitem, both equi on l_orderkey with residual inequalities — two
    shuffles on the same key, co-partitioned by Catalyst."""
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    waiting = (
        l1.join(
            l2,
            (l1.l_orderkey == F.col("l2_orderkey"))
            & (l1.l_suppkey != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == F.col("l3_orderkey"))
            & (l1.l_suppkey != F.col("l3_suppkey"))
            & (F.col("l3_shipdate") > l1.l_shipdate),
            "left_anti",
        )
    )
    return (
        waiting.join(orders, waiting.l_orderkey == orders.o_orderkey, "left_semi")
        .join(F.broadcast(supp), waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "tpch_q22_idle_customers",
    oracle="""
    WITH stats AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, stats
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    GROUP BY c_nationkey
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity: above-average balance (cross-multiplied —
    bal * n > sum — so the threshold is exact) AND no *open* orders
    (anti-join on a filtered order subset; every high-balance customer has
    some order in this data, so the unfiltered form is empty), grouped by
    nation (the schema has no phone country code)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    stats = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("s"), F.count("*").alias("n")
    )
    return (
        cust.crossJoin(F.broadcast(stats))
        .filter(_dec("c_acctbal") * F.col("n") > F.col("s"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dec_sum("c_acctbal").alias("totacctbal"),
        )
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), elig AS (
      SELECT p_partkey, p_brand, s_name, s_acctbal, n_name, supplycost,
             MIN(supplycost) OVER (PARTITION BY p_partkey) AS mincost
      FROM ps
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE' AND p_size = 15 AND p_type = 'LARGE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           CAST(supplycost AS DOUBLE) AS min_cost
    FROM elig WHERE supplycost = mincost
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (q2 shape). The driver schema has no partsupp
    table, so supply cost is *derived*: MIN(extendedprice) per observed
    (partkey, suppkey) pair in lineitem — exact decimal, identical derivation
    on both engines. The correlated MIN subquery of the original is planned
    as a window MIN over p_partkey re-probed by an equality filter: one
    shuffle on l_partkey for the derived partsupp agg, the same partitioning
    reused by the window (no second exchange), all four dims broadcast.
    Reference surface: ad-hoc Trino SQL via Athena workgroup
    (web-analytics-parquet/cdk_stacks/athena_workgroup.py:45-48)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_dec("l_extendedprice")).alias("supplycost")
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    elig = (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), ps.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        elig.withColumn("mincost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("mincost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("supplycost").cast("double").alias("min_cost"),
        )
    )


@query(
    "tpch_q11_important_parts",
    oracle="""
    WITH val AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS part_val
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY l_partkey
    ), tot AS (SELECT SUM(part_val) AS total FROM val)
    SELECT l_partkey AS p_partkey, CAST(part_val AS DOUBLE) AS part_value
    FROM val, tot
    WHERE part_val * 1000 > total
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock identification (q11 shape): per-part value held by one
    nation's suppliers, kept only where it exceeds a fraction of the global
    total. Value is derived from lineitem (no partsupp in the driver schema):
    SUM(extendedprice) per partkey over that nation's lines. The HAVING-
    against-scalar-subquery is cross-multiplied (part_val * 1000 > total) in
    exact decimal so no double rounding can flip a boundary part. Plan: the
    nation's supplier set broadcasts into the lineitem scan (fact never
    shuffled for the join), one agg shuffle on l_partkey, and the grand total
    is a broadcast scalar re-probed with a cross join."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nat_supp = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    val = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("part_val"))
    )
    tot = val.agg(F.sum("part_val").alias("total"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("part_val") * 1000 > F.col("total"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("part_val").cast("double").alias("part_value"),
        )
    )


@query(
    "skew_salted_join_mktsegment",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS orders_cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def salted_join_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⨝ customer through the explicit hot-key salting operator
    (operators/skew.py::salted_join): the fact side is salted
    xxhash64(row) % 8, the customer side replicated 8×, the join runs on
    (custkey, salt) — result multiset EXACTLY the plain join, so this
    shares the unsalted oracle verbatim. The pattern is for build sides too
    big to broadcast under a concentrated key histogram; equivalence (not
    speed at this SF) is what the gate checks, and `tests/test_skew…`
    pins the per-row single-replica-match invariant."""
    from web_analytics_on_aws_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    joined = salted_join(orders, cust, on=["o_custkey"], salt_buckets=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("orders_cnt"),
        dec_sum("o_totalprice").alias("total_price"),
    )
