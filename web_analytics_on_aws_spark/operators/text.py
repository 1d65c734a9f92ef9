"""Text-analysis operators: language ID, quality scoring, token counting,
fingerprinting (extension surface, BASELINE.json north star).

All pure JVM column expressions (HOFs over token arrays) — portable to an
ANSI-SQL oracle and free of Python row costs. The simple aggregate plans
(stats/quality/fingerprints) live in plans/pipeline.py; this module holds
the per-document scoring operators.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from web_analytics_on_aws_spark.functions import token_count, token_split

# Marker function-words per language, checked in fixed priority order (ties
# resolve to the earlier language — deterministic in any engine).
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of", "and"]),
    ("es", ["el", "la", "los", "que"]),
    ("de", ["der", "die", "das", "und"]),
    ("fr", ["le", "les", "des", "et"]),
]


def _marker_count(tokens: Column, markers: list[str]) -> Column:
    lst = ", ".join(f"'{m}'" for m in markers)
    return F.size(F.filter(tokens, lambda t: t.isin(markers)))


def lang_id(text_col: str = "text") -> Column:
    """N-gram-style heuristic language ID: argmax of marker-token counts,
    fixed priority on ties, 'und' (undetermined) when no marker hits."""
    tokens = token_split(F.col(text_col))
    counts = [(lang, _marker_count(tokens, m)) for lang, m in LANG_MARKERS]
    best = F.greatest(*[c for _, c in counts])
    expr = F.when(best <= 0, F.lit("und"))
    for lang, c in counts:
        expr = expr.when(c == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def quality_score(text_col: str = "text") -> Column:
    """Heuristic quality in [0,1]: blend of length adequacy, mean word
    length sanity, and alphabetic purity — the shape of a pretraining
    quality filter. Deterministic, SQL-portable arithmetic."""
    t = F.col(text_col)
    n_tok = token_count(t).cast("double")
    n_chars = F.length(t).cast("double")
    mean_word = n_chars / F.greatest(n_tok, F.lit(1.0))
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    word_score = F.when((mean_word >= 3.0) & (mean_word <= 10.0), 1.0).otherwise(0.5)
    alpha_ratio = (
        F.length(F.regexp_replace(F.lower(t), "[^a-z ]", "")) / F.greatest(n_chars, F.lit(1.0))
    )
    return F.round((len_score + word_score + alpha_ratio) / F.lit(3.0), 6)


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stamp per-document analysis columns: predicted language, quality
    score, token count, rolling-hash fingerprint."""
    return (
        df.withColumn("pred_lang", lang_id(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("n_tokens", token_count(F.col(text_col)))
        .withColumn(
            "fingerprint",
            F.md5(
                F.array_join(
                    F.array_sort(F.array_distinct(token_split(F.col(text_col)))), " "
                )
            ),
        )
    )


def redact_pii(col: Column | str) -> Column:
    """Mask common PII shapes (emails, phone-like sequences, long digit
    runs) — the pre-training privacy scrub step. Pure JVM regexp_replace
    chain (whole-stage codegen, no UDF); patterns are RE2/Java-compatible
    (no lookaround) so the DuckDB oracle can run the identical chain."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]")
    c = F.regexp_replace(c, r"\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3,4}[- .]?[0-9]{0,4}", "[PHONE]")
    c = F.regexp_replace(c, r"[0-9]{7,}", "[NUM]")
    return c
