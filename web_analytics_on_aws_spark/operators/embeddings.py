"""Embedding-matrix preprocessing: PCA / ZCA whitening trained IN-PLAN.

The LLM-data use: embedding spaces out of an encoder are anisotropic —
a few directions carry most of the variance, which distorts every
cosine-threshold downstream (SemDeDup pruning, near-dup LSH, ANN recall).
Whitening (project onto principal axes, rescale to unit variance) is the
standard fix (Su et al. 2021, "Whitening Sentence Representations"; the
classical PCA/ZCA formulation).

Spark-first split of the work, the same shape as k-means training in
operators/similarity.py:

- **statistics pass** (distributed): one `mapInPandas` over the vectors
  emits per-partition partial (count, Σx, ΣxxT) — the d×d Gram — which
  the driver folds. Bytes to the driver = partitions × d² doubles (d=64
  → 32 KB each), independent of row count; the corpus is never
  collected. A pure-SQL Gram (posexplode² → d² terms/row) would explode
  each row 4096× — the Arrow kernel computes the same partial in one
  BLAS call per batch.
- **eigendecomposition** (driver): d×d `numpy.linalg.eigh` on the
  covariance — microseconds at any corpus size; eigenvector SIGN is
  canonicalized (largest-|component| positive) so retrains and
  re-implementations agree.
- **projection** (distributed, JVM): y_j = Σ_i W_ji·x_i + b_j as
  `aggregate(zip_with(...))` expressions over literal weight arrays —
  whole-stage-codegen arithmetic, no Python in the transform path.

Reference scope: extension operator (no reference analog — SURVEY §2
ext); companions: `operators/similarity.py` (consumers of the whitened
space)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def gram_stats(df: DataFrame, vec_col: str, dim: int) -> tuple[int, np.ndarray, np.ndarray]:
    """One distributed pass → (n, mean[d], cov[d×d]). Partial sums per
    partition ride to the driver as d² doubles each — KBs regardless of
    corpus size."""
    import pandas as pd

    schema = "n long, s array<double>, g array<double>"

    def _partial(batches):
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy())
            if m.size == 0:
                continue
            m = m.astype(np.float64, copy=False)
            n += m.shape[0]
            s += m.sum(axis=0)
            g += m.T @ m
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
        )

    parts = df.select(vec_col).mapInPandas(_partial, schema).collect()
    n = sum(r["n"] for r in parts)
    if n == 0:
        raise ValueError("gram_stats over an empty vector column")
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(dim, dim) for r in parts], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return n, mean, cov


def train_pca_whitener(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 8,
    eps: float = 0.0,
) -> dict:
    """Fit the top-``k`` PCA whitener: returns ``{"mean": [d],
    "components": k×d (rows = whitening directions, scaled 1/√λ),
    "eigvals": [k] descending, "explained": [k] (λ_i/Σλ)}``. Sign
    convention: each eigenvector's largest-magnitude component is
    positive — deterministic across retrains and LAPACK builds."""
    _n, mean, cov = gram_stats(df, vec_col, dim)
    lam, vec = np.linalg.eigh(cov)  # ascending
    order = np.argsort(lam)[::-1][:k]
    lam_k = lam[order]
    v_k = vec[:, order]  # d×k
    for j in range(v_k.shape[1]):
        i = int(np.argmax(np.abs(v_k[:, j])))
        if v_k[i, j] < 0:
            v_k[:, j] = -v_k[:, j]
    scale = 1.0 / np.sqrt(lam_k + eps)
    components = (v_k * scale).T  # k×d
    total = float(lam.sum())
    return {
        "mean": mean.tolist(),
        "components": components.tolist(),
        "eigvals": lam_k.tolist(),
        "explained": (lam_k / total).tolist(),
    }


def whiten(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "white",
) -> DataFrame:
    """Project vectors through the trained whitener — pure JVM arithmetic:
    y_j = Σ_i W_ji·(x_i − mean_i), one ``aggregate(zip_with(...))`` fold
    per output component over literal weights (k×d multiply-adds per row
    inside whole-stage codegen; no Python, no shuffle)."""
    mean = model["mean"]
    comps = model["components"]
    x = F.transform(F.col(vec_col), lambda c: c.cast("double"))
    outs = []
    for j, row in enumerate(comps):
        w = F.array(*[F.lit(float(v)) for v in row])
        bias = -float(np.dot(row, mean))
        outs.append(
            F.aggregate(
                F.zip_with(x, w, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            + F.lit(bias)
        )
    return df.select("*", F.array(*outs).alias(out_col))
