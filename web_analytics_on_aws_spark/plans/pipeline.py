"""LLM-training-data pipeline plans over ``documents`` / ``embeddings``.

Extension surface beyond the reference (mandated by BASELINE.json's north
star): deduplication, text analysis, and similarity search as first-class
DataFrame operators designed for 100 TB. The oracle-expressible queries live
here; the algorithmic operators (MinHash-LSH, SimHash, ANN) live in
``operators/dedup.py`` / ``operators/similarity.py`` and register their own
queries (some with rows-only checks where SQL can't express them).

Scale notes: everything is hash-groupBy shaped (exact dedup = groupBy on a
content hash; text stats = map-side expressions + tiny shuffle). Nothing
collects to the driver; the brute-force KNN broadcasts only the k query
vectors, never the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from web_analytics_on_aws_spark.functions import (
    as_double_vec,
    cosine_similarity,
    dec_sum,
    token_count,
    token_split,
)
from web_analytics_on_aws_spark.plans import query
from web_analytics_on_aws_spark.sources.tables import load_table

# Portable normalization: lowercase, strip non-alphanumerics, collapse runs
# of spaces. Same regexes are valid in Java (Spark) and RE2 (DuckDB).
_NORM_SQL = "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''), ' +', ' '))"


def _norm(c: F.Column) -> F.Column:
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(c), "[^a-z0-9 ]", ""), " +", " ")
    )


@query(
    "dedup_exact_stats",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_distinct,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dups
    FROM documents
    """,
)
def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash (md5) — hash-groupBy; at 100 TB the
    shuffle carries 16-byte digests, not documents."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_distinct"),
        (F.count("*") - F.countDistinct(F.md5("text"))).alias("n_exact_dups"),
    )


@query(
    "dedup_normalized_stats",
    oracle=f"""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT md5({_NORM_SQL})) AS n_distinct_norm
    FROM documents
    """,
)
def dedup_normalized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-exact dedup after canonicalization (case/punct/whitespace) —
    catches trivially-mutated duplicates exact hashing misses."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5(_norm(F.col("text")))).alias("n_distinct_norm"),
    )


@query(
    "text_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               string_split_regex(trim(text), ' +'))), ' ')) AS fingerprint
    FROM documents
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words document fingerprint: sorted distinct token set → md5.
    Word-order-insensitive duplicate detection, fully JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(token_split(F.col("text")))), " ")
        ).alias("fingerprint"),
    )


@query(
    "text_stats_by_lang",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           SUM(n_chars) AS total_chars,
           SUM(len(string_split_regex(trim(text), ' +'))) AS total_tokens,
           CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents GROUP BY lang
    """,
)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats per language: doc/char/token counts (whitespace
    tokenizer, SURVEY-mandated token counting)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(token_count(F.col("text")).cast("bigint")).alias("total_tokens"),
        (dec_sum("n_chars") / F.count("*")).alias("avg_chars"),
    )


@query(
    "text_quality_buckets",
    oracle="""
    WITH scored AS (
      SELECT lang,
             len(string_split_regex(trim(text), ' +')) AS n_tokens,
             n_chars
      FROM documents
    )
    SELECT lang,
           CASE WHEN n_tokens < 60 THEN 'short'
                WHEN n_tokens < 90 THEN 'medium'
                ELSE 'long' END AS quality_bucket,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / SUM(n_tokens)
             AS chars_per_token
    FROM scored GROUP BY 1, 2
    """,
)
def text_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length-based buckets + chars-per-token ratio —
    the shape of a training-data quality filter (score → bucket → keep/drop)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        token_count(F.col("text")).alias("n_tokens"),
        "n_chars",
    )
    bucket = (
        F.when(F.col("n_tokens") < 60, "short")
        .when(F.col("n_tokens") < 90, "medium")
        .otherwise("long")
    )
    return scored.groupBy("lang", bucket.alias("quality_bucket")).agg(
        F.count("*").alias("cnt"),
        (dec_sum("n_chars") / F.sum("n_tokens")).alias("chars_per_token"),
    )


@query(
    "token_count_by_source",
    oracle="""
    SELECT source, COUNT(*) AS n_docs,
           SUM(len(string_split_regex(trim(text), ' +'))) AS total_tokens
    FROM documents GROUP BY source
    """,
)
def token_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("bigint")).alias("total_tokens"),
    )


@query(
    "embedding_knn_q0",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                        (SELECT qv FROM q)), 6) AS sim
    FROM embeddings
    WHERE vec_id <> 0
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """,
)
def embedding_knn_q0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for one query vector: broadcast the (single)
    query row, scan the corpus once, TakeOrdered(k). The baseline ANN path —
    the LSH-bucketed variant is in operators/similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        as_double_vec("embedding").alias("qv")
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(
                cosine_similarity(as_double_vec("embedding"), F.col("qv")), 6
            ).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "embedding_label_stats",
    oracle="""
    SELECT label, COUNT(*) AS cnt,
           MIN(len(embedding)) AS dim,
           CAST(MIN(list_aggregate(embedding, 'min')) AS DOUBLE) AS min_val,
           CAST(MAX(list_aggregate(embedding, 'max')) AS DOUBLE) AS max_val
    FROM embeddings GROUP BY label
    """,
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-column profiling per label: dims + exact value range (min/max
    are float-exact so hash-stable across engines, unlike float sums)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count("*").alias("cnt"),
        F.min(F.size("embedding")).alias("dim"),
        F.min(F.array_min("embedding")).cast("double").alias("min_val"),
        F.max(F.array_max("embedding")).cast("double").alias("max_val"),
    )
