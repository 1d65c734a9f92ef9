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
    "from_iso8601_date": "to_date",
    "to_unixtime": "unix_timestamp",
    "json_extract_scalar": "get_json_object",
    "contains": "array_contains",
    # string / binary
    "levenshtein_distance": "levenshtein",
    "starts_with": "startswith",
    "format": "format_string",
    "to_hex": "hex",
    "from_hex": "unhex",
    "to_base64": "base64",
    "from_base64": "unbase64",
    # math / misc — random is NOT a rename: Trino random(n) is a random
    # integer in [0, n) while Spark rand(n) seeds a [0,1) double; handled
    # arity-aware in the rewrite rules below (ADVICE r2)
    "is_nan": "isnan",
    "bitwise_left_shift": "shiftleft",
    "bitwise_right_shift": "shiftright",
    # arrays / lambdas — Trino reduce(arr, init, merge, finish) is exactly
    # Spark aggregate(arr, init, merge, finish); any/all_match are
    # exists/forall with identical lambda syntax (`x -> pred`)
    "reduce": "aggregate",
    "any_match": "exists",
    "all_match": "forall",
    # datetime parts
    "day_of_year": "dayofyear",
    "doy": "dayofyear",
    "day_of_month": "dayofmonth",
    "week": "weekofyear",
    "week_of_year": "weekofyear",
    "last_day_of_month": "last_day",
    # Joda patterns (format_datetime) use the same letters as JDK
    # DateTimeFormatter for y/M/d/H/m/s/E — documented delta for exotic
    # pattern letters, asserted for the common ones in tests
    "format_datetime": "date_format",
}

#: Trino url_extract_* → Spark parse_url part names.
_URL_PARTS = {
    "url_extract_host": "HOST",
    "url_extract_path": "PATH",
    "url_extract_protocol": "PROTOCOL",
    "url_extract_query": "QUERY",
    "url_extract_fragment": "REF",
}

#: MySQL-style %-patterns (Trino date_parse/date_format) → JDK
#: DateTimeFormatter patterns (Spark to_timestamp/date_format).
_MYSQL_TO_JDK = {
    "%Y": "yyyy", "%y": "yy", "%M": "MMMM", "%m": "MM", "%c": "M",
    "%b": "MMM", "%d": "dd", "%e": "d", "%j": "DDD", "%H": "HH",
    "%k": "H", "%h": "hh", "%I": "hh", "%i": "mm", "%s": "ss",
    "%S": "ss", "%f": "SSSSSS", "%p": "a", "%T": "HH:mm:ss",
    "%r": "hh:mm:ss a", "%W": "EEEE", "%a": "EEE", "%%": "%",
}

#: Constructs we refuse instead of guessing. TABLESAMPLE SYSTEM is refused
#: (block sampling has no Spark equivalent with the same statistics);
#: BERNOULLI is rewritten below — Spark's `TABLESAMPLE (p PERCENT)` is the
#: same per-row Bernoulli trial.
UNSUPPORTED = [
    r"\bTABLESAMPLE\s+SYSTEM\b",
    r"\bMATCH_RECOGNIZE\b",
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


def _mysql_pattern_to_jdk(fmt: str) -> str:
    """Convert a MySQL-style datetime pattern ('%Y-%m-%d') to the JDK
    DateTimeFormatter pattern Spark expects ('yyyy-MM-dd'). Literal
    alphabetic runs are single-quoted so they never parse as pattern
    letters; an unmapped %-token refuses rather than mis-parsing."""
    out: list[str] = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%":
            tok = fmt[i : i + 2]
            if tok not in _MYSQL_TO_JDK:
                raise TrinoCompatError(f"date pattern token {tok!r} unsupported")
            out.append(_MYSQL_TO_JDK[tok])
            i += 2
        else:
            j = i
            while j < len(fmt) and fmt[j] != "%":
                j += 1
            run = fmt[i:j]
            if any(c.isalpha() for c in run):
                out.append("'" + run.replace("'", "''") + "'")
            else:
                out.append(run)
            i = j
    return "".join(out)


def _split_top_level(s: str) -> list[str]:
    """Split an argument list on commas not nested in parens/brackets.
    Safe because string literals were tokenized out before this runs."""
    parts, depth, start = [], 0, 0
    for i, c in enumerate(s):
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(s[start:i].strip())
            start = i + 1
    tail = s[start:].strip()
    if tail or parts:
        parts.append(tail)
    return parts


def _rewrite_fn_calls(body: str, rules: dict) -> str:
    """Rewrite every ``name(args)`` call for names in ``rules`` with
    balanced-paren argument extraction (robust where a regex is not:
    literals are already placeholders, so every paren is structural).
    Inner args are rewritten first, and replacements are emitted straight
    to the output — a rule may reuse its own name without rescanning."""
    pattern = re.compile(
        r"\b(" + "|".join(re.escape(n) for n in rules) + r")\s*\(",
        re.IGNORECASE,
    )
    out: list[str] = []
    i = 0
    while True:
        m = pattern.search(body, i)
        if not m:
            out.append(body[i:])
            return "".join(out)
        out.append(body[i : m.start()])
        depth, j = 1, m.end()
        while j < len(body) and depth:
            if body[j] == "(":
                depth += 1
            elif body[j] == ")":
                depth -= 1
            j += 1
        if depth:
            raise TrinoCompatError(f"unbalanced parens after {m.group(1)}")
        inner = _rewrite_fn_calls(body[m.end() : j - 1], rules)
        out.append(rules[m.group(1).lower()](_split_top_level(inner)))
        i = j


def _nargs(name: str, args: list[str], n: int) -> list[str]:
    if len(args) != n:
        raise TrinoCompatError(f"{name} expects {n} args, got {len(args)}")
    return args


def _rewrite_unnest(body: str, idents: list[str]) -> str:
    """``CROSS JOIN UNNEST(expr) AS t (c1[, c2])`` → ``LATERAL VIEW
    explode(expr) t AS c1[, c2]`` (1 column: array element; 2 columns: map
    key/value — the two forms Athena web-log queries actually use).
    ``... UNNEST(expr) WITH ORDINALITY AS t (c, o)`` → ``LATERAL VIEW
    inline(transform(expr, (x, i) -> struct(x AS c, i+1 AS o))) t`` —
    `inline` surfaces the struct fields as top-level columns, so the
    1-based bigint ordinality Trino defines needs no post-hoc reference
    rewriting. Any UNNEST left standing refuses rather than mis-running."""
    pat = re.compile(r"\bCROSS\s+JOIN\s+UNNEST\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(body)
        if not m:
            return body
        depth, j = 1, m.end()
        while j < len(body) and depth:
            if body[j] == "(":
                depth += 1
            elif body[j] == ")":
                depth -= 1
            j += 1
        if depth:
            raise TrinoCompatError("unbalanced parens in UNNEST")
        expr = body[m.end() : j - 1]
        alias = re.match(
            r"\s*(WITH\s+ORDINALITY\s+)?AS\s+([\w\x02]+)\s*\(([^)]*)\)",
            body[j:],
            re.IGNORECASE,
        )
        if not alias:
            raise TrinoCompatError(
                "UNNEST requires an `AS alias (col[, col])` clause"
            )
        ordinal = bool(alias.group(1))
        cols = [c.strip() for c in alias.group(3).split(",")]
        if ordinal:
            if len(cols) != 2:
                raise TrinoCompatError(
                    "UNNEST WITH ORDINALITY needs exactly (element, ordinal)"
                )
            c, o = cols
            rewritten = (
                f" LATERAL VIEW inline(transform({expr}, (__x, __i) -> "
                f"struct(__x AS {c}, CAST(__i + 1 AS BIGINT) AS {o}))) "
                f"{alias.group(2)}"
            )
        else:
            if not 1 <= len(cols) <= 2:
                raise TrinoCompatError(
                    "UNNEST supports 1 (array) or 2 (map) columns"
                )
            rewritten = (
                f" LATERAL VIEW explode({expr}) {alias.group(2)} AS "
                + ", ".join(cols)
            )
        body = body[: m.start()] + rewritten + body[j + alias.end() :]


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

    def _mklit(text: str) -> str:
        """Shield generated SQL text as a literal placeholder so later
        rewrite passes can never touch it."""
        lits.append("'" + text.replace("'", "''") + "'")
        return f"\x00{len(lits) - 1}\x00"

    def _conv_pattern(name: str, arg: str) -> str:
        m = re.fullmatch(r"\x00(\d+)\x00", arg.strip())
        if not m:
            raise TrinoCompatError(f"{name} pattern must be a string literal")
        raw = lits[int(m.group(1))][1:-1].replace("''", "'")
        return _mklit(_mysql_pattern_to_jdk(raw))

    def _random(a: list[str]) -> str:
        # Trino: random() → [0,1) double; random(n) → integer in [0, n).
        # Spark rand(arg) treats the arg as a SEED — never pass it through.
        if len(a) == 0 or (len(a) == 1 and a[0] == ""):
            return "rand()"
        if len(a) == 1:
            return f"CAST(floor(rand() * ({a[0]})) AS BIGINT)"
        raise TrinoCompatError(f"random expects 0 or 1 args, got {len(a)}")

    _inf = "CAST('Infinity' AS DOUBLE)"
    rules = {
        "random": _random,
        # ISO day-of-week (Monday=1…Sunday=7) from Spark's Sunday=1 dayofweek
        "day_of_week": lambda a: f"(pmod(dayofweek({_nargs('day_of_week', a, 1)[0]}) + 5, 7) + 1)",
        "dow": lambda a: f"(pmod(dayofweek({_nargs('dow', a, 1)[0]}) + 5, 7) + 1)",
        # web-log URL dissection → parse_url
        **{
            fn: (lambda a, _p=part, _f=fn: f"parse_url({_nargs(_f, a, 1)[0]}, {_mklit(_p)})")
            for fn, part in _URL_PARTS.items()
        },
        "url_extract_parameter": lambda a: "parse_url({}, {}, {})".format(
            _nargs("url_extract_parameter", a, 2)[0], _mklit("QUERY"), a[1]
        ),
        # no PORT part in parse_url — take it off the AUTHORITY (host:port)
        "url_extract_port": lambda a: (
            "CAST(nullif(regexp_extract(parse_url({}, {}), {}, 1), {}) AS BIGINT)".format(
                _nargs("url_extract_port", a, 1)[0],
                _mklit("AUTHORITY"),
                _mklit(":([0-9]+)$"),
                _mklit(""),
            )
        ),
        # MySQL %-patterns → JDK patterns
        "date_parse": lambda a: "to_timestamp({}, {})".format(
            _nargs("date_parse", a, 2)[0], _conv_pattern("date_parse", a[1])
        ),
        "date_format": lambda a: "date_format({}, {})".format(
            _nargs("date_format", a, 2)[0], _conv_pattern("date_format", a[1])
        ),
        # two-arg bitwise functions → operators
        "bitwise_and": lambda a: "({} & {})".format(*_nargs("bitwise_and", a, 2)),
        "bitwise_or": lambda a: "({} | {})".format(*_nargs("bitwise_or", a, 2)),
        "bitwise_xor": lambda a: "({} ^ {})".format(*_nargs("bitwise_xor", a, 2)),
        "bitwise_not": lambda a: f"(~{_nargs('bitwise_not', a, 1)[0]})",
        # float classification (Spark orders NaN above Infinity, so a plain
        # abs-compare gives the exact Trino truth table incl. NaN)
        "is_finite": lambda a: f"(abs({_nargs('is_finite', a, 1)[0]}) < {_inf})",
        "is_infinite": lambda a: f"(abs({_nargs('is_infinite', a, 1)[0]}) = {_inf})",
        "infinity": lambda a: (_nargs("infinity", a, 0), _inf)[1],
        "nan": lambda a: (_nargs("nan", a, 0), "CAST('NaN' AS DOUBLE)")[1],
    }
    body = _rewrite_fn_calls(body, rules)

    # TABLESAMPLE BERNOULLI (p) → TABLESAMPLE (p PERCENT): both are a
    # per-row Bernoulli(p/100) trial. Any other TABLESAMPLE form refuses.
    body = re.sub(
        r"\bTABLESAMPLE\s+BERNOULLI\s*\(\s*(\d+(?:\.\d+)?)\s*\)",
        r"TABLESAMPLE (\1 PERCENT)",
        body,
        flags=re.IGNORECASE,
    )
    if re.search(r"\bTABLESAMPLE\b(?!\s*\()", body, flags=re.IGNORECASE):
        raise TrinoCompatError(
            "only TABLESAMPLE BERNOULLI (<percent>) is supported"
        )

    # CROSS JOIN UNNEST → LATERAL VIEW explode; leftover UNNEST refuses
    body = _rewrite_unnest(body, idents)
    if re.search(r"\bUNNEST\b", body, flags=re.IGNORECASE):
        raise TrinoCompatError(
            "only `CROSS JOIN UNNEST(expr) AS t (col[, col])` is supported"
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


_UNLOAD_FORMATS = {
    "parquet": "parquet",
    "json": "json",
    "orc": "orc",
    "textfile": "csv",
    "csv": "csv",
}


def trino_statement(spark: SparkSession, sql: str):
    """Execute a Trino/Athena STATEMENT: ``UNLOAD (query) TO 'path' WITH
    (format='PARQUET', ...)`` — Athena's result-export workflow — or any
    plain query (delegates to ``trino_sql``).

    UNLOAD returns {"path", "format", "rows"} after writing the inner
    query's result (itself full Athena dialect) with Spark's native
    writer; ``partitioned_by`` maps to ``partitionBy``, ``compression``
    to the writer codec. Unknown WITH keys or formats refuse loudly."""
    m = re.match(r"\s*UNLOAD\s*\(", sql, re.IGNORECASE)
    if not m:
        return trino_sql(spark, sql)
    depth, j = 1, m.end()
    while j < len(sql) and depth:
        if sql[j] == "(":
            depth += 1
        elif sql[j] == ")":
            depth -= 1
        # skip quoted literals so parens inside strings don't count
        elif sql[j] == "'":
            j = _scan_quoted(sql, j, "'", "string literal")
        j += 1
    if depth:
        raise TrinoCompatError("unbalanced parens in UNLOAD query")
    inner = sql[m.end() : j - 1]
    tail = sql[j:]
    tm = re.match(
        r"\s*TO\s+'([^']+)'\s*(?:WITH\s*\((.*)\))?\s*$",
        tail,
        re.IGNORECASE | re.DOTALL,
    )
    if not tm:
        raise TrinoCompatError("UNLOAD requires TO '<path>' [WITH (...)]")
    path, props_raw = tm.group(1), tm.group(2) or ""
    props: dict[str, str] = {}
    for part in _split_top_level(props_raw):
        if not part:
            continue
        pm = re.match(
            r"\s*(\w+)\s*=\s*(?:'([^']*)'|ARRAY\s*\[([^\]]*)\])\s*$",
            part,
            re.IGNORECASE,
        )
        if not pm:
            raise TrinoCompatError(f"malformed UNLOAD property {part!r}")
        val = pm.group(2) if pm.group(2) is not None else pm.group(3)
        props[pm.group(1).lower()] = val
    fmt = props.pop("format", "parquet").lower()
    if fmt not in _UNLOAD_FORMATS:
        raise TrinoCompatError(f"UNLOAD format {fmt!r} unsupported")
    partition_by = [
        c.strip().strip("'")
        for c in props.pop("partitioned_by", "").split(",")
        if c.strip()
    ]
    compression = props.pop("compression", None)
    if props:
        raise TrinoCompatError(f"unknown UNLOAD properties {sorted(props)}")
    df = trino_sql(spark, inner)
    writer = df.write.mode("error")
    if compression:
        writer = writer.option("compression", compression.lower())
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(_UNLOAD_FORMATS[fmt]).save(path)
    return {"path": path, "format": fmt, "rows": spark.read.format(
        _UNLOAD_FORMATS[fmt]
    ).load(path).count()}
