"""Corpus-curation query registrations: benchmark decontamination,
repetition scoring, vocabulary building, event co-occurrence — the
remaining hygiene passes of a large-scale training-data pipeline
(operators/text.py), each with an exact DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from web_analytics_on_aws_spark.operators import text
from web_analytics_on_aws_spark.plans import query
from web_analytics_on_aws_spark.sources.tables import load_table

_TOKS = "string_split_regex(trim(text), ' +')"


def _gram_sql(k: int) -> str:
    parts = " || ' ' || ".join(f"toks[i + {j}]" for j in range(k))
    return f"list_transform(range(1, len(toks) - {k - 2}), i -> {parts})"


@query(
    "pipeline_decontaminate_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOKS} AS toks FROM documents
    ), bg AS (
      SELECT DISTINCT UNNEST({_gram_sql(8)}) AS gram
      FROM toks WHERE doc_id % 97 = 0
    ), tg AS (
      SELECT doc_id, UNNEST({_gram_sql(8)}) AS gram
      FROM toks WHERE doc_id % 97 <> 0
    ), hits AS (
      SELECT DISTINCT doc_id FROM tg JOIN bg USING (gram)
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM hits)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
    FROM documents WHERE doc_id % 97 <> 0
    GROUP BY source
    """,
)
def decontaminate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination census: every ~97th document stands in for
    a held-out eval set; training docs sharing any 8-token shingle with it
    are flagged per source. The benchmark gram set broadcasts (eval sets
    are MBs against a TB corpus), so the train side is one map pass + a
    broadcast semi-join — zero corpus shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    hits = text.benchmark_ngram_overlap(train, bench, n=8)
    flagged = train.join(
        hits.withColumn("__hit", F.lit(1)), "doc_id", "left"
    )
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("__hit").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_contaminated"),
    )


@query(
    "text_repetition_scores",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), grams AS (
      SELECT doc_id, UNNEST({_gram_sql(3)}) AS gram
      FROM toks WHERE len(toks) >= 3
    ), per_gram AS (
      SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_grams,
           CAST(MAX(c) AS BIGINT) AS max_gram_count,
           ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS rep_score
    FROM per_gram GROUP BY doc_id
    """,
)
def repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition score (most-repeated-3-gram share of all
    3-gram occurrences) — the boilerplate/degenerate-text filter signal."""
    docs = load_table(spark, sf_dir, "documents")
    return text.repetition_scores(docs, k=3)


@query(
    "pipeline_vocab_top500",
    oracle=f"""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS INT) AS rank,
           tok, cnt
    FROM (
      SELECT tok, COUNT(*) AS cnt
      FROM (SELECT UNNEST({_TOKS}) AS tok FROM documents)
      GROUP BY tok
    )
    ORDER BY rank
    LIMIT 500
    """,
)
def vocab_top500(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocab build: top-500 corpus tokens by occurrence count,
    deterministic rank (count desc, token asc)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.vocab_topk(docs, k=500)


@query(
    "events_type_cooccurrence",
    oracle="""
    WITH per AS (SELECT DISTINCT user_id, event_type FROM events),
    singles AS (SELECT event_type, COUNT(*) AS n FROM per GROUP BY 1),
    tot AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
      FROM per a JOIN per b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both, sa.n AS n_a, sb.n AS n_b, n_users
    FROM pairs
    JOIN singles sa ON sa.event_type = type_a
    JOIN singles sb ON sb.event_type = type_b, tot
    """,
)
def type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence contingency table (the inputs to PMI/lift —
    the log itself stays consumer-side so every emitted value is an exact
    integer): users are reduced to distinct (user, type) rows FIRST, so the
    pair self-join is per-user over ≤ |types| rows — O(users × types²)
    candidates, never an events-level join."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.select("user_id", "event_type").distinct()
    singles = per.groupBy("event_type").agg(F.count("*").alias("n"))
    tot = ev.agg(F.countDistinct("user_id").alias("n_users"))
    a, b = per.alias("a"), per.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    return (
        pairs.join(
            F.broadcast(singles.select(F.col("event_type").alias("type_a"),
                                       F.col("n").alias("n_a"))), "type_a")
        .join(
            F.broadcast(singles.select(F.col("event_type").alias("type_b"),
                                       F.col("n").alias("n_b"))), "type_b")
        .crossJoin(F.broadcast(tot))
        .select("type_a", "type_b", "n_both", "n_a", "n_b", "n_users")
    )


@query(
    "pipeline_decontaminate_bloom",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOKS} AS toks FROM documents
    ), bg AS (
      SELECT DISTINCT UNNEST({_gram_sql(8)}) AS gram
      FROM toks WHERE doc_id % 97 = 0
    ), tg AS (
      SELECT doc_id, UNNEST({_gram_sql(8)}) AS gram
      FROM toks WHERE doc_id % 97 <> 0
    ), hits AS (
      SELECT DISTINCT doc_id FROM tg JOIN bg USING (gram)
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM hits)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
    FROM documents WHERE doc_id % 97 <> 0
    GROUP BY source
    """,
)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom-filtered twin of `pipeline_decontaminate_stats` for
    benchmark sets too big to broadcast raw: benchmark grams bit-OR into a
    sparse Bloom word table (≤ num_bits/64 rows — broadcastable even when
    the raw gram set is GBs), train grams probe it map-side, and only the
    survivors reach the exact confirm join. No false negatives + exact
    confirm ⇒ the SAME oracle as the broadcast variant, verbatim."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    hits = text.bloom_ngram_overlap(train, bench, n=8)
    flagged = train.join(hits.withColumn("__hit", F.lit(1)), "doc_id", "left")
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("__hit").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_contaminated"),
    )
