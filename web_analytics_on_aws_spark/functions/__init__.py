"""Scalar / columnar helper functions (SURVEY §2.8).

The reference's scalar surface is tiny (base64, JSON parse, strict
timestamp parse/format, string concat); everything here is built-in
`pyspark.sql.functions` compositions — JVM-side, inside whole-stage codegen.
No row-at-a-time Python UDFs.

Cross-engine determinism rules (the driver hash-compares against DuckDB):

- Money/measure sums go through ``dec_sum``: cast to DECIMAL(18,2) *before*
  summing. Decimal addition is associative, so Spark's parallel partial
  aggregation is bit-identical to DuckDB's sequential sum. Raw double sums
  are NOT (summation order varies per partitioning).
- Averages are exact-decimal sums divided by counts in double — double
  division of identical inputs is deterministic.
- Date parts are cast to INT on both sides (DuckDB's year() yields BIGINT,
  Spark's yields INT).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent exact sum of a double measure, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def dec_avg(col: Column | str, scale: int = 2) -> Column:
    """Exact-sum / count average, deterministic across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return dec_sum(c, scale) / F.count(c)


def token_split(col: Column | str) -> Column:
    """Whitespace tokenization (one regex split, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r" +")


def token_count(col: Column | str) -> Column:
    return F.size(token_split(col))


def occurrences(col: Column | str, needle: str) -> Column:
    """Count non-overlapping occurrences of a literal substring.

    Implemented as (len(s) - len(replace(s, needle, ''))) / len(needle) —
    exact integer arithmetic, portable to any SQL dialect.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit("")))) / F.lit(len(needle))
    ).cast("int")


def as_double_vec(col: Column | str) -> Column:
    """Cast array<float> → array<double> for exact-widening arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def vec_dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns — sequential left fold,
    matching DuckDB's sequential list arithmetic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def vec_norm_sq(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity over array<double>; formula shaped like DuckDB's
    list_cosine_similarity (dot / (sqrt(na)*sqrt(nb))) so the oracle agrees
    to well past 6 decimals."""
    return vec_dot(a, b) / (F.sqrt(vec_norm_sq(a)) * F.sqrt(vec_norm_sq(b)))
