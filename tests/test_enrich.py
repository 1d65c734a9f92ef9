"""IP/CIDR range enrichment + UA classing (operators/enrich.py): exact
long math, bucket fanout bounds, join parity with a Python brute force,
and the equi-join (not nested-loop) plan shape."""

import pytest
from pyspark.sql import functions as F

from web_analytics_on_aws_spark.operators import enrich


def test_ip_to_long_edges(spark):
    df = spark.createDataFrame(
        [("0.0.0.0",), ("255.255.255.255",), ("10.0.0.1",), ("1.2.3.999",),
         ("1.2.3",), ("a.b.c.d",), (None,)],
        "ip string",
    )
    got = [r["v"] for r in df.select(enrich.ip_to_long("ip").alias("v")).collect()]
    assert got == [0, 4294967295, 167772161, None, None, None, None]


def test_cidr_to_range_math(spark):
    df = spark.createDataFrame(
        [("10.0.0.0/8",), ("192.168.1.7/24",), ("1.2.3.4/32",), ("0.0.0.0/0",)],
        "cidr string",
    )
    rows = df.select(enrich.cidr_to_range("cidr").alias("r")).collect()
    import ipaddress

    for cidr, r in zip(["10.0.0.0/8", "192.168.1.7/24", "1.2.3.4/32", "0.0.0.0/0"], rows):
        net = ipaddress.ip_network(cidr, strict=False)
        assert r["r"]["start"] == int(net.network_address)
        assert r["r"]["end"] == int(net.broadcast_address)


def test_bucket_fanout_bounded(spark):
    ranges = spark.createDataFrame([("big", "10.0.0.0/8")], "net string, cidr string")
    r = ranges.select("net", enrich.cidr_to_range("cidr").alias("x")).select(
        "net", "x.start", "x.end"
    )
    n = enrich.explode_range_buckets(r, bucket_bits=16).count()
    assert n == 256  # a /8 covers exactly 2^(16-8) /16 buckets


def test_range_join_matches_bruteforce(spark):
    import random

    rng = random.Random(3)
    ips = [
        f"{rng.randrange(256)}.{rng.randrange(256)}.{rng.randrange(256)}.{rng.randrange(256)}"
        for _ in range(200)
    ]
    cidrs = [("n0", "10.0.0.0/8"), ("n1", "172.16.0.0/12"), ("n2", "192.168.0.0/16"),
             ("n3", "0.0.0.0/2")]
    logs = spark.createDataFrame([(ip,) for ip in ips], "ip string")
    dim = spark.createDataFrame(cidrs, "net string, cidr string").select(
        "net", enrich.cidr_to_range("cidr").alias("r")
    ).select("net", "r.start", "r.end")
    # NOTE: these cidrs overlap (0.0.0.0/2 contains part of 10/8) — restrict
    # to the disjoint subset for the 1:1 contract
    dim = dim.filter(F.col("net") != "n3")
    got = {
        (r["ip"], r["net"])
        for r in enrich.enrich_ip_ranges(logs, dim).select("ip", "net").collect()
    }
    import ipaddress

    nets = {n: ipaddress.ip_network(c) for n, c in cidrs if n != "n3"}
    want = set()
    for ip in ips:
        hit = None
        for n, net in nets.items():
            if ipaddress.ip_address(ip) in net:
                hit = n
        want.add((ip, hit))
    assert got == want


def test_range_join_is_hash_not_nested_loop(spark):
    logs = spark.range(2000).select(
        F.concat_ws(
            ".", F.lit("10"), (F.col("id") % 250).cast("string"), F.lit("0"),
            F.lit("1"),
        ).alias("ip")
    )
    dim = spark.createDataFrame([("n", "10.0.0.0/8")], "net string, cidr string").select(
        "net", enrich.cidr_to_range("cidr").alias("r")
    ).select("net", "r.start", "r.end")
    out = enrich.enrich_ip_ranges(logs, dim)
    assert len(out.collect()) == 2000  # collect: finalizes THIS df's plan
    # final adaptive plan: the bucket equi-join runs as a (broadcast or
    # shuffled) HASH join — never a nested-loop/cartesian over the ranges
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_ua_class(spark):
    ua = spark.createDataFrame(
        [("Googlebot/2.1",), ("Mozilla/5.0 (iPhone; like Mac OS X)",),
         ("Mozilla/5.0 Chrome/120",), ("curl/8.0",), (None,)],
        "ua string",
    )
    got = [r["c"] for r in ua.select(enrich.ua_class("ua").alias("c")).collect()]
    assert got == ["bot", "mobile", "desktop", "other", None]
