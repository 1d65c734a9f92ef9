"""Log-record enrichment: IP → network-range lookup and user-agent
classing — the dimension attachments every web-log warehouse performs on
the reference's record shape (`ip`, `userAgent` fields; SURVEY §1.2).

IP range lookup is the textbook non-equi-join trap: ``ip BETWEEN start AND
end`` against a range dim plans a nested-loop. The scalable form bucketizes
both sides by a fixed prefix (default /16): every CIDR block covering a
bucket emits one row keyed by it (a /8 block fans out to its 256 /16
buckets — bounded, dim-side only), so the join becomes EQUI on the bucket
with a residual BETWEEN — broadcastable, hash-joinable, skew-manageable
like any key join. Fact rows are never fanned out.

All expressions JVM-side; no UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def ip_to_long(col: Column | str) -> Column:
    """Dotted-quad IPv4 string → uint32 as BIGINT (NULL on malformed)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"\.")
    valid = (F.size(parts) == 4) & F.forall(
        parts, lambda p: p.rlike("^[0-9]{1,3}$") & (p.cast("int") <= 255)
    )
    octets = [parts.getItem(i).cast("bigint") for i in range(4)]
    return F.when(
        valid,
        octets[0] * 16777216 + octets[1] * 65536 + octets[2] * 256 + octets[3],
    )


def cidr_to_range(cidr: Column | str) -> Column:
    """'a.b.c.d/n' → struct(start BIGINT, end BIGINT) of the block."""
    c = F.col(cidr) if isinstance(cidr, str) else cidr
    base = ip_to_long(F.split(c, "/").getItem(0))
    bits = F.split(c, "/").getItem(1).cast("int")
    # block size as double: powers of two ≤ 2^32 are exactly representable
    size = F.pow(F.lit(2.0), 32 - bits)
    start = (F.floor(base / size) * size).cast("bigint")
    return F.when(
        bits.between(0, 32) & base.isNotNull(),
        F.struct(
            start.alias("start"),
            (start + size.cast("bigint") - 1).alias("end"),
        ),
    )


def explode_range_buckets(
    ranges: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    bucket_bits: int = 16,
) -> DataFrame:
    """Fan a range dim out to one row per covered /bucket_bits bucket —
    the dim-side-only preprocessing that turns the range join into an
    equi-join. Bounded: a /8 block emits 2^(16-8)=256 rows at the default."""
    width = 1 << (32 - bucket_bits)
    return ranges.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / width).cast("bigint"),
                F.floor(F.col(end_col) / width).cast("bigint"),
            )
        ).alias("__bucket"),
    )


def enrich_ip_ranges(
    logs: DataFrame,
    ranges: DataFrame,
    ip_col: str = "ip",
    start_col: str = "start",
    end_col: str = "end",
    bucket_bits: int = 16,
) -> DataFrame:
    """Left-join each log row to the range covering its IP (equi-join on
    the /bucket_bits bucket + residual BETWEEN). Ranges must be disjoint
    for a 1:1 enrichment (standard for network dims)."""
    width = 1 << (32 - bucket_bits)
    keyed = logs.withColumn("__ipl", ip_to_long(ip_col)).withColumn(
        "__bucket", F.floor(F.col("__ipl") / width).cast("bigint")
    )
    # No forced broadcast: the bucketized dim is an ordinary equi-join side
    # — small dims broadcast via the planner/AQE, GeoIP-scale dims (millions
    # of ranges × bucket fanout) fall back to a shuffled hash join instead
    # of dying at the broadcast limit.
    dim = explode_range_buckets(ranges, start_col, end_col, bucket_bits)
    return (
        keyed.join(
            dim,
            (keyed["__bucket"] == dim["__bucket"])
            & (F.col("__ipl") >= F.col(start_col))
            & (F.col("__ipl") <= F.col(end_col)),
            "left",
        )
        .drop(dim["__bucket"])
        .drop("__bucket", "__ipl")
    )


UA_CLASSES = [
    ("bot", r"(?i)bot|crawler|spider|slurp"),
    ("mobile", r"(?i)mobile|android|iphone"),
    ("desktop", r"(?i)mozilla|chrome|safari|firefox|edge"),
]


def ua_class(col: Column | str) -> Column:
    """Coarse user-agent classing (bot/mobile/desktop/other) via an ordered
    regexp CASE — the shape of log-side device attribution."""
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit("other")
    for name, pat in reversed(UA_CLASSES):
        expr = F.when(c.rlike(pat), name).otherwise(expr)
    return F.when(c.isNull(), None).otherwise(expr)
