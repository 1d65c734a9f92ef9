"""PCA whitening (operators/embeddings.py): distributed Gram statistics
vs numpy, whitening correctness on a known anisotropic dataset, and the
JVM-only projection contract."""

from __future__ import annotations

import numpy as np
import pytest

from web_analytics_on_aws_spark.operators.embeddings import (
    gram_stats,
    train_pca_whitener,
    whiten,
)


def _vec_df(spark, m, partitions=4):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(m)],
        "vec_id long, embedding array<double>",
    ).repartition(partitions)


@pytest.fixture(scope="module")
def aniso():
    rng = np.random.default_rng(11)
    # anisotropic 6-d cloud: three dominant directions, offset mean
    base = rng.standard_normal((400, 6)) * np.array([5.0, 3.0, 1.0, 0.3, 0.2, 0.1])
    rot, _ = np.linalg.qr(rng.standard_normal((6, 6)))
    return base @ rot + np.array([1.0, -2.0, 0.5, 0.0, 3.0, -1.0])


def test_gram_stats_matches_numpy_across_partitions(spark, aniso):
    n, mean, cov = gram_stats(_vec_df(spark, aniso, partitions=7), "embedding", 6)
    assert n == 400
    np.testing.assert_allclose(mean, aniso.mean(axis=0), atol=1e-9)
    ref_cov = (aniso.T @ aniso) / 400 - np.outer(
        aniso.mean(axis=0), aniso.mean(axis=0)
    )
    np.testing.assert_allclose(cov, ref_cov, atol=1e-9)


def test_whitened_space_is_isotropic(spark, aniso):
    df = _vec_df(spark, aniso)
    model = train_pca_whitener(df, "embedding", dim=6, k=4)
    # eigvals descending, explained shares in (0, 1]
    assert model["eigvals"] == sorted(model["eigvals"], reverse=True)
    assert 0 < sum(model["explained"]) <= 1.0 + 1e-12
    y = np.stack(
        [
            r["white"]
            for r in whiten(df, model, "embedding", "white")
            .orderBy("vec_id")
            .collect()
        ]
    )
    my = y.mean(axis=0)
    cy = (y.T @ y) / len(y) - np.outer(my, my)
    np.testing.assert_allclose(my, 0.0, atol=1e-9)
    np.testing.assert_allclose(cy, np.eye(4), atol=1e-6)


def test_sign_canonicalization_is_deterministic(spark, aniso):
    df = _vec_df(spark, aniso)
    m1 = train_pca_whitener(df, "embedding", dim=6, k=3)
    m2 = train_pca_whitener(df.repartition(3), "embedding", dim=6, k=3)
    np.testing.assert_allclose(
        m1["components"], m2["components"], atol=1e-9
    )
    for row in m1["components"]:
        i = int(np.argmax(np.abs(row)))
        assert row[i] > 0 or abs(row[i]) < 1e-12


def test_projection_is_jvm_only(spark, aniso):
    df = _vec_df(spark, aniso)
    model = train_pca_whitener(df, "embedding", dim=6, k=2)
    plan = (
        whiten(df, model, "embedding", "white")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan  # training ran eagerly; projection is pure


def test_whiten_matches_numpy_projection(spark, aniso):
    df = _vec_df(spark, aniso)
    model = train_pca_whitener(df, "embedding", dim=6, k=3)
    w = np.asarray(model["components"])
    mean = np.asarray(model["mean"])
    expect = (aniso - mean) @ w.T
    got = np.stack(
        [
            r["white"]
            for r in whiten(df, model, "embedding", "white")
            .orderBy("vec_id")
            .collect()
        ]
    )
    np.testing.assert_allclose(got, expect, atol=1e-9)
