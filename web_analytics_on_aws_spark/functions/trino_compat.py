"""Trino/Athena SQL compatibility shim.

The reference's interactive surface IS Trino SQL (Athena engine v3 —
SURVEY §3.3; the shipped named queries in
web-analytics-parquet/cdk_stacks/athena_named_query.py are Trino text). A
reference user switching engines pastes Athena SQL, so the engine accepts
the common Trino dialect and rewrites it to Spark SQL before
``spark.sql``.

Design: a small, TESTED, curated translation — not a full grammar. String
literals are tokenized out first so rewrites never touch quoted text; the
rewrites are (1) double-quoted identifiers → backticks, (2) function
renames where Spark has an exact-semantics equivalent, (3) structural
forms: ``date_diff('unit', a, b)`` / ``date_add('unit', n, d)`` →
``timestampdiff/timestampadd(UNIT, …)``, ``TRY_CAST`` passes through,
``x || y`` passes through (both engines concat). Anything outside the
curated surface raises ``TrinoCompatError`` listing the unsupported
construct rather than silently mis-running it.

Known, documented semantic deltas (asserted in tests): ``to_unixtime``
returns DOUBLE in Trino, BIGINT here via ``unix_timestamp``;
``approx_distinct`` maps to HLL ``approx_count_distinct`` (both
approximate, different sketches).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


class TrinoCompatError(ValueError):
    pass


# Trino name → Spark name, where argument order and semantics line up.
FUNCTION_RENAMES = {
    "approx_distinct": "approx_count_distinct",
    "arbitrary": "any_value",
    "strpos": "instr",
    "codepoint": "ascii",
    "from_iso8601_timestamp": "to_timestamp",
    "to_unixtime": "unix_timestamp",
    "json_extract_scalar": "get_json_object",
    "contains": "array_contains",
}

#: Constructs we refuse instead of guessing.
UNSUPPORTED = [
    r"\bWITH\s+ORDINALITY\b",
    r"\bTABLESAMPLE\b",
    r"\bMATCH_RECOGNIZE\b",
    r"\bGROUPING\s+SETS\s*\(\s*\(\s*\)\s*\)",  # Trino empty grouping set literal
    r"\bAT\s+TIME\s+ZONE\b",
]

_UNITS = {"second", "minute", "hour", "day", "week", "month", "quarter", "year"}


def _scan_quoted(sql: str, i: int, q: str, what: str) -> int:
    """Index of the closing quote ``q`` for the token opening at ``i``
    (doubled-quote escapes consumed)."""
    j = i + 1
    while j < len(sql):
        if sql[j] == q:
            if j + 1 < len(sql) and sql[j + 1] == q:
                j += 2
                continue
            return j
        j += 1
    raise TrinoCompatError(f"unterminated {what}")


def _tokenize(sql: str) -> tuple[str, list[str], list[str]]:
    """ONE left-to-right lex of both token kinds that shield their contents
    from the rewrites: single-quoted string literals (kept verbatim) and
    double-quoted identifiers (converted to backticks here — Trino allows
    ANY character in them, including quotes that would otherwise open a
    bogus string). Each becomes a placeholder restored after rewriting, so
    no rename/unit regex can ever fire inside either."""
    out, lits, idents = [], [], []
    i = 0
    while i < len(sql):
        c = sql[i]
        if c == "'":
            j = _scan_quoted(sql, i, "'", "string literal")
            lits.append(sql[i : j + 1])
            out.append(f"\x00{len(lits) - 1}\x00")
            i = j + 1
        elif c == '"':
            j = _scan_quoted(sql, i, '"', "quoted identifier")
            name = sql[i + 1 : j].replace('""', '"')
            if "`" in name:
                raise TrinoCompatError(
                    f"identifier {name!r} contains a backtick — "
                    "unrepresentable as a Spark quoted identifier"
                )
            idents.append(f"`{name}`")
            out.append(f"\x02{len(idents) - 1}\x02")
            i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out), lits, idents


def _restore(sql: str, lits: list[str], idents: list[str]) -> str:
    # ONE pass for both placeholder kinds: re.sub never rescans its own
    # replacements, so restored literal CONTENT (which may itself contain
    # placeholder-looking bytes) can never be re-substituted.
    return re.sub(
        r"([\x00\x02])(\d+)\1",
        lambda m: (lits if m.group(1) == "\x00" else idents)[int(m.group(2))],
        sql,
    )


def trino_to_spark_sql(sql: str) -> str:
    """Rewrite a Trino/Athena query string into Spark SQL text."""
    body, lits, idents = _tokenize(sql)

    for pat in UNSUPPORTED:
        if re.search(pat, body, flags=re.IGNORECASE):
            raise TrinoCompatError(
                f"construct not in the curated Trino-compat surface: {pat}"
            )

    # date_diff('unit', a, b) → timestampdiff(UNIT, a, b)
    def _datediff(m: re.Match) -> str:
        unit = lits[int(m.group(1))].strip("'").lower()
        if unit not in _UNITS:
            raise TrinoCompatError(f"date_diff unit {unit!r} unsupported")
        return f"timestampdiff({unit.upper()}, "

    body = re.sub(
        r"\bdate_diff\s*\(\s*\x00(\d+)\x00\s*,\s*",
        _datediff,
        body,
        flags=re.IGNORECASE,
    )

    # date_add('unit', n, d) → timestampadd(UNIT, n, d)
    def _dateadd(m: re.Match) -> str:
        unit = lits[int(m.group(1))].strip("'").lower()
        if unit not in _UNITS:
            raise TrinoCompatError(f"date_add unit {unit!r} unsupported")
        return f"timestampadd({unit.upper()}, "

    body = re.sub(
        r"\bdate_add\s*\(\s*\x00(\d+)\x00\s*,\s*",
        _dateadd,
        body,
        flags=re.IGNORECASE,
    )

    # function renames (word boundary + following open-paren)
    for trino, spark_name in FUNCTION_RENAMES.items():
        if trino == spark_name:
            continue
        body = re.sub(
            rf"\b{trino}\s*\(", f"{spark_name}(", body, flags=re.IGNORECASE
        )

    # VARCHAR / DOUBLE PRECISION type names in casts
    body = re.sub(r"\bvarchar\s*\(\s*\d+\s*\)", "string", body, flags=re.IGNORECASE)
    body = re.sub(r"\bvarchar\b", "string", body, flags=re.IGNORECASE)
    body = re.sub(r"\bdouble\s+precision\b", "double", body, flags=re.IGNORECASE)

    return _restore(body, lits, idents)


def trino_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Run a Trino/Athena query against the Spark session's catalog."""
    return spark.sql(trino_to_spark_sql(sql))
