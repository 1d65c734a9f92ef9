"""Model-based quality filtering (operators/quality_model.py): planted
clean vs garbage docs must separate on held-out data; scoring is map-only."""

import pytest
from pyspark.sql import functions as F

from web_analytics_on_aws_spark.operators import quality_model


def _mk_docs(spark, n=60):
    import random

    rng = random.Random(11)
    clean_words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
                   "dog", "and", "runs", "in", "a", "field", "of", "green"]
    rows = []
    for i in range(n):
        rows.append((i, " ".join(rng.choice(clean_words) for _ in range(60)), True))
    for i in range(n, 2 * n):
        junk = "".join(rng.choice("0123456789#$%@!QZX") for _ in range(200))
        rows.append((i, junk, False))
    return spark.createDataFrame(rows, "doc_id long, text string, is_good boolean")


def test_classifier_separates_heldout(spark):
    docs = _mk_docs(spark)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)
    model = quality_model.train_quality_classifier(train, "is_good")
    scored = quality_model.score_quality(
        test, model, keep_cols=["doc_id", "is_good"]
    ).collect()
    good = [r["p_good"] for r in scored if r["is_good"]]
    bad = [r["p_good"] for r in scored if not r["is_good"]]
    assert min(good) > max(bad)  # full separation on this planted corpus
    assert all(0.0 <= p <= 1.0 for p in good + bad)


def test_features_are_jvm_only_and_scoring_map_only(spark):
    docs = _mk_docs(spark, n=10)
    feats = quality_model.quality_features(docs)
    plan = feats._sc._jvm.PythonSQLUtils.explainString(
        feats._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan  # featurization never shuffles
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    model = quality_model.train_quality_classifier(docs, "is_good")
    scored = quality_model.score_quality(docs, model, keep_cols=["doc_id"])
    splan = scored._sc._jvm.PythonSQLUtils.explainString(
        scored._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in splan  # scoring is a map-only transform


def test_feature_values_sane(spark):
    df = spark.createDataFrame(
        [(1, "The Cat 123 sat"), (2, "aaaa")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in quality_model.quality_features(df).collect()}
    r1 = rows[1]
    assert r1["f_n_tokens"] == 4.0
    assert abs(r1["f_digit_ratio"] - 3 / 15) < 1e-9
    assert abs(r1["f_upper_ratio"] - 2 / 15) < 1e-9
    assert r1["f_max_word_len"] == 3.0
    assert rows[2]["f_max_word_len"] == 4.0


def test_null_text_scores_as_empty(spark):
    docs = _mk_docs(spark, n=15)
    with_null = docs.union(
        spark.createDataFrame([(999, None, False)], docs.schema)
    )
    model = quality_model.train_quality_classifier(with_null, "is_good")
    scored = quality_model.score_quality(with_null, model, keep_cols=["doc_id"])
    rows = {r["doc_id"]: r["p_good"] for r in scored.collect()}
    assert 999 in rows and 0.0 <= rows[999] <= 1.0


def test_transform_serializable_after_session_observation(spark):
    """Regression: once any Observation has been attached in the session,
    an MLlib model transform whose closure still carries the training
    summary dies with NotSerializableException(ObservationManager) — the
    summary pins the SparkSession. train_quality_classifier must return a
    summary-stripped model that scores regardless of session history."""
    from pyspark.sql import Observation

    from web_analytics_on_aws_spark.operators.quality_model import (
        quality_features,
        train_quality_classifier,
    )

    df = spark.range(64).withColumn("ok", F.col("id") % 2 == 0)
    obs = Observation()
    df.observe(obs, F.count(F.lit(1)).alias("n")).count()
    assert obs.get["n"] == 64

    labeled = spark.createDataFrame(
        [("a perfectly reasonable document with enough words", True)] * 16
        + [("!!!! ////", False)] * 16,
        "text string, label boolean",
    )
    model = train_quality_classifier(labeled, "label")
    lr = model.stages[-1]
    assert not lr.hasSummary  # the summary (and its session pin) is gone
    assert model.transform(quality_features(labeled)).count() == 32
