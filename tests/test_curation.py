"""Corpus-curation operators (operators/text.py): planted-case oracles for
decontamination, repetition scoring, and vocab building."""

from __future__ import annotations

from web_analytics_on_aws_spark.operators.text import (
    benchmark_ngram_overlap,
    repetition_scores,
    vocab_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontamination_flags_only_overlapping_docs(spark):
    bench = _docs(spark, [(100, "one two three four five six seven eight tail")])
    train = _docs(
        spark,
        [
            # contains the benchmark 8-gram "one ... eight" verbatim
            (1, "prefix one two three four five six seven eight suffix"),
            # same tokens but broken order → no shared 8-gram
            (2, "eight seven six five four three two one tail tail tail"),
            # too short for any 8-gram
            (3, "one two three"),
        ],
    )
    flagged = {r["doc_id"] for r in benchmark_ngram_overlap(train, bench, n=8).collect()}
    assert flagged == {1}


def test_repetition_scores_planted_counts(spark):
    df = _docs(
        spark,
        [
            (1, "a b c a b c a b c"),  # 7 trigrams, "a b c" ×3
            (2, "w x y z"),  # 2 distinct trigrams, max 1
            (3, "only two"),  # < 3 tokens → no row
        ],
    )
    got = {r["doc_id"]: r for r in repetition_scores(df, k=3).collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_grams"] == 7 and got[1]["max_gram_count"] == 3
    assert got[1]["rep_score"] == round(3 / 7, 6)
    assert got[2]["n_grams"] == 2 and got[2]["max_gram_count"] == 1


def test_vocab_topk_rank_is_deterministic(spark):
    df = _docs(spark, [(1, "b b b a a c"), (2, "a c")])
    got = [(r["rank"], r["tok"], r["cnt"]) for r in vocab_topk(df, k=2).collect()]
    # counts: a=3, b=3, c=2 → ties break token-ascending
    assert got == [(1, "a", 3), (2, "b", 3)]


def test_bloom_decontamination_equals_exact_overlap(spark):
    from web_analytics_on_aws_spark.operators.text import bloom_ngram_overlap

    bench = _docs(spark, [(100, "one two three four five six seven eight tail")])
    train = _docs(
        spark,
        [
            (1, "prefix one two three four five six seven eight suffix"),
            (2, "eight seven six five four three two one tail tail tail"),
            (3, "one two three"),
            (4, "one two three four five six seven eight nine ten"),
        ],
    )
    exact = {r["doc_id"] for r in benchmark_ngram_overlap(train, bench, n=8).collect()}
    bloom = {r["doc_id"] for r in bloom_ngram_overlap(train, bench, n=8).collect()}
    assert bloom == exact == {1, 4}


def test_bloom_decontamination_tiny_filter_still_exact(spark):
    """With num_bits forced tiny the Bloom saturates (every probe may pass)
    — the exact confirm join must still remove all false positives."""
    from web_analytics_on_aws_spark.operators.text import bloom_ngram_overlap

    bench = _docs(spark, [(100, "a b c d e f g h")])
    train = _docs(
        spark,
        [(1, "x a b c d e f g h y"), (2, "h g f e d c b a x y z w v u t s")],
    )
    out = {
        r["doc_id"]
        for r in bloom_ngram_overlap(
            train, bench, n=8, num_bits=64, num_hashes=2
        ).collect()
    }
    assert out == {1}
