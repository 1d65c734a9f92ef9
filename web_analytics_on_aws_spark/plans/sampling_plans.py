"""Query registrations for the deterministic sampling / splitting / packing
operators (operators/sampling.py) — all oracle-checked: the Knuth-hash
selection is exact integer arithmetic both engines reproduce bit-for-bit."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from web_analytics_on_aws_spark.functions import dec_sum
from web_analytics_on_aws_spark.operators import sampling
from web_analytics_on_aws_spark.operators.sampling import (
    KNUTH,
    MOD,
    bpe_style_token_count,
    deterministic_sample,
    pack_sequences,
    train_val_test_split,
)
from web_analytics_on_aws_spark.plans import query
from web_analytics_on_aws_spark.sources.tables import load_table

_HASH_SQL = f"((doc_id % 2147483648 * {KNUTH}) % {MOD}) / {float(MOD)}"


@query(
    "pipeline_sample_20pct",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_HASH_SQL} < 0.2
    """,
)
def sample_20pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% corpus sample — stable under re-runs/repartitioning
    (pure row-local predicate, no shuffle, no rand())."""
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, 0.2).select("doc_id", "lang", "source")


@query(
    "pipeline_train_val_test_counts",
    oracle=f"""
    SELECT CASE WHEN {_HASH_SQL} < 0.1 THEN 'test'
                WHEN {_HASH_SQL} < 0.2 THEN 'val'
                ELSE 'train' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
)
def split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjoint, exhaustive, deterministic train/val/test assignment."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        train_val_test_split(docs, val_fraction=0.1, test_fraction=0.1)
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@query(
    "pipeline_bpe_token_counts",
    oracle=r"""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(lower(text),
               '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS total_bpe_tokens,
           COUNT(*) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization counts (letter runs / digit runs / single
    punctuation) — the second tokenizer the survey mandates beyond
    whitespace."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.sum(bpe_style_token_count("text").cast("bigint")).alias("total_bpe_tokens"),
        F.count("*").alias("n_docs"),
    )


@query(
    "pipeline_pack_sequences",
    oracle="""
    WITH toks AS (
      SELECT doc_id, len(string_split_regex(trim(text), ' +')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks
    )
    SELECT CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed GROUP BY 1
    """,
)
def pack_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing into 2048-token context windows (running-sum
    window over doc order), summarized per pack."""
    docs = load_table(spark, sf_dir, "documents")
    from web_analytics_on_aws_spark.functions import token_count

    toks = docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))
    packed = pack_sequences(toks, "n_tokens", context_len=2048)
    return packed.groupBy("pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
    )


@query(
    "pipeline_weighted_mixture",
    oracle=f"""
    WITH thin AS (
      SELECT doc_id, source, 0 AS mixture_source FROM documents
      WHERE (doc_id % 2147483648 * {sampling.KNUTH}) % {sampling.MOD} < 0.8 * {sampling.MOD}
      UNION ALL
      SELECT doc_id, source, 1 AS mixture_source FROM documents
      WHERE (doc_id % 2147483648 * {sampling.KNUTH}) % {sampling.MOD} < 0.25 * {sampling.MOD}
    )
    SELECT mixture_source, source, COUNT(*) AS cnt
    FROM thin GROUP BY mixture_source, source
    """,
)
def weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-source mixture (80% + 25% of the same corpus standing in for two
    corpora): per-source hash thinning → tag → union → per-source tallies.
    Deterministic, so the mixture is reproducible run-to-run and checkable
    in exact SQL."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    mixed = sampling.weighted_interleave([(docs, 0.8), (docs, 0.25)])
    return mixed.groupBy("mixture_source", "source").agg(
        F.count("*").alias("cnt")
    )


@query(
    "pipeline_group_sample_k",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM (SELECT lang, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY (doc_id % 2147483648 * {KNUTH}) % {MOD}, doc_id) AS rn
          FROM documents)
    WHERE rn <= 20
    GROUP BY lang
    """,
)
def group_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group reservoir equivalent: exactly 20 uniformly-chosen docs per
    language, deterministic under re-runs. id_sum pins the exact membership
    of the sample, not just its size."""
    docs = load_table(spark, sf_dir, "documents")
    sampled = sampling.sample_k_per_group(docs, ["lang"], 20)
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("doc_id").alias("id_sum")
    )


@query(
    "pipeline_stratified_rebalance",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE {_HASH_SQL} < CASE lang WHEN 'en' THEN 0.3
                                  WHEN 'zh' THEN 0.8
                                  ELSE 1.0 END
    GROUP BY lang
    """,
)
def stratified_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rebalancing via per-stratum deterministic sampling: keep 30%
    of dominant 'en', 80% of 'zh', all other languages whole — the
    downsample-the-head move of every pretraining mixture, as one row-local
    shuffle-free predicate."""
    from web_analytics_on_aws_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    sampled = stratified_sample(docs, ["lang"], {"en": 0.3, "zh": 0.8})
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


@query(
    "pipeline_epoch_shuffle_head",
    oracle="""
    WITH pos AS (
      SELECT doc_id, source,
             (doc_id + 1 * 40503) % 2147483648 * 2654435761 % 4294967296 AS p
      FROM documents
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY p, doc_id) AS BIGINT) AS train_pos,
           doc_id, source
    FROM pos
    ORDER BY train_pos LIMIT 100
    """,
)
def epoch_shuffle_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch corpus shuffle (epoch 1): every row gets a
    training position from a Knuth-hash permutation — stable across
    re-runs, repartitioning, and engines (exact integer arithmetic, no
    rand()). First 100 positions shown; at 100 TB the positions become a
    repartitionByRange materialization read in order."""
    from web_analytics_on_aws_spark.operators.sampling import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents")
    return (
        epoch_shuffle(docs.select("doc_id", "source"), epoch=1)
        .filter(F.col("train_pos") <= 100)
        .select("train_pos", "doc_id", "source")
    )


@query(
    "pipeline_interleave_roundrobin",
    oracle="""
    WITH pos AS (
      SELECT doc_id, source,
             (doc_id + 0 * 40503) % 2147483648 * 2654435761 % 4294967296 AS p
      FROM documents
    ), ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY p, doc_id) AS r
      FROM pos
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY r, source) AS BIGINT) AS train_pos,
           doc_id, source
    FROM ranked
    ORDER BY train_pos LIMIT 100
    """,
)
def interleave_roundrobin_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-balanced training order: per-source deterministic shuffle,
    then round-robin interleave across sources — every consecutive
    |sources| positions contain one doc per source (batch balance without
    a weighted sampler). First 100 positions."""
    from web_analytics_on_aws_spark.operators.sampling import (
        roundrobin_interleave,
    )

    docs = load_table(spark, sf_dir, "documents")
    return (
        roundrobin_interleave(docs.select("doc_id", "source"), epoch=0)
        .filter(F.col("train_pos") <= 100)
        .select("train_pos", "doc_id", "source")
    )
