"""Model-based quality filtering: distill heuristic gates into a smooth
classifier (the CCNet / GPT-3-style pipeline step — a linear classifier
over cheap document features replaces brittle hard thresholds and emits a
rankable quality probability).

Spark-native: features are pure JVM expressions (the same statistics the
Gopher gates and ``text.quality_score`` use), training is MLlib
``LogisticRegression`` (distributed L-BFGS — each iteration is one
map-side gradient pass + a tiny driver reduce; model state is the
coefficient vector, KBs), scoring is a map-only model transform. At 100 TB
you train on a sample (``sampling.deterministic_sample``) and score the
full corpus map-only — exactly what this module's API encourages.

Labels: any boolean column. The registered query uses the Gopher gate
verdict as weak supervision (rule distillation); a production pipeline
would label "looks like reference corpus" vs "looks like crawl noise".
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FEATURE_COLS = [
    "f_n_tokens",
    "f_mean_word_len",
    "f_alpha_ratio",
    "f_stopword_ratio",
    "f_digit_ratio",
    "f_upper_ratio",
    "f_max_word_len",
]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stamp the classifier's feature columns — all JVM-side expressions,
    one map-only pass, no shuffle."""
    from web_analytics_on_aws_spark.functions import token_split
    from web_analytics_on_aws_spark.operators.text import GOPHER_STOPWORDS

    # NULL text scores as the empty document — VectorAssembler (error-on-
    # invalid) would otherwise fail the whole job on one NULL row
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = token_split(t)
    n_tok = F.greatest(F.size(toks), F.lit(1)).cast("double")
    n_chars = F.greatest(F.length(t), F.lit(1)).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    return (
        df.withColumn("f_n_tokens", F.size(toks).cast("double"))
        .withColumn("f_mean_word_len", n_chars / n_tok)
        .withColumn(
            "f_alpha_ratio",
            F.length(F.regexp_replace(F.lower(t), "[^a-z ]", "")) / n_chars,
        )
        .withColumn(
            "f_stopword_ratio",
            F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, F.lower(w))))
            / n_tok,
        )
        .withColumn(
            "f_digit_ratio",
            F.length(F.regexp_replace(t, "[^0-9]", "")) / n_chars,
        )
        .withColumn(
            "f_upper_ratio",
            F.length(F.regexp_replace(t, "[^A-Z]", "")) / n_chars,
        )
        .withColumn(
            "f_max_word_len",
            F.coalesce(
                F.array_max(F.transform(toks, F.length)).cast("double"), F.lit(0.0)
            ),
        )
    )


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str,
    text_col: str = "text",
    max_iter: int = 30,
    reg_param: float = 0.01,
):
    """Fit a logistic-regression quality model on (text, boolean label).
    Returns the fitted PipelineModel (assembler + scaler + LR)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    feats = quality_features(labeled, text_col).withColumn(
        "__label", F.col(label_col).cast("double")
    )
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURE_COLS, outputCol="__fv"),
            StandardScaler(inputCol="__fv", outputCol="__fs", withMean=True),
            LogisticRegression(
                featuresCol="__fs",
                labelCol="__label",
                maxIter=max_iter,
                regParam=reg_param,
            ),
        ]
    )
    model = pipe.fit(feats)
    _drop_training_summary(model)
    return model


def _drop_training_summary(pipeline_model) -> None:
    """Detach the LR training summary from the fitted model.

    The summary object pins the SparkSession (and through it the session's
    ObservationManager); `model.transform` captures the model in its
    prediction-UDF closure, so once ANY `Observation` has been attached in
    the session (streaming/observability.py), closure serialization dies
    with `NotSerializableException: ObservationManager` (Spark 4.1, seen
    under the full test suite). The summary is training-time-only state —
    scoring never reads it — so we clear it (the Scala setter is
    `private[spark]`, which is public in bytecode, hence reachable from
    py4j) and keep model transforms serializable regardless of session
    history. Falls back silently if the internals move."""
    try:
        from pyspark.sql import SparkSession

        jvm = SparkSession.getActiveSession()._sc._jvm
        empty = getattr(getattr(jvm, "scala.Option$"), "MODULE$").empty()
        for stage in pipeline_model.stages:
            jobj = getattr(stage, "_java_obj", None)
            if jobj is not None and jobj.getClass().getName().endswith(
                "LogisticRegressionModel"
            ):
                jobj.setSummary(empty)
    except Exception:
        pass


def score_quality(
    df: DataFrame, model, text_col: str = "text", keep_cols: list | None = None
) -> DataFrame:
    """Score documents with a trained model: map-only transform emitting
    ``p_good`` (probability of the positive class)."""
    from pyspark.ml.functions import vector_to_array

    keep = keep_cols if keep_cols is not None else [c for c in df.columns]
    scored = model.transform(quality_features(df, text_col))
    return scored.select(
        *keep,
        F.round(vector_to_array("probability")[1], 6).alias("p_good"),
    )
