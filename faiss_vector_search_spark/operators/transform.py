"""Vector transforms — the Spark re-expression of FAISS's
VectorTransform family, here PCAMatrix (dimensionality reduction
before indexing/ANN, the standard "shrink 768→64 dims" step in
embedding pipelines).

Design for scale
----------------
Training is ONE distributed pass: each partition folds its Arrow
batches into a (count, Σx, ΣxxT) triple — a d-vector and a d×d Gram
matrix, independent of partition row count — and only P such triples
reach the driver, which does the tiny d×d eigendecomposition
(the same driver-held-model-state posture as ivf.py's k-means).
Application is a pure map: the (d,k) component matrix folds into the
plan as literal arrays, so projection is whole-stage-codegen
arithmetic — no Python, no shuffle, no broadcast variable even.

Determinism: eigenvector signs are fixed so the largest-magnitude
component of each eigenvector is positive; NumPy's ``eigh`` on the
same float64 Gram matrix is deterministic for a given build, which is
why the driver gate keeps PCA rows-only (pytest-gated) rather than
oracle-hashed.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PCAModel(NamedTuple):
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (d, k), orthonormal columns
    explained_variance: np.ndarray  # (k,), descending


def pca_train(
    df: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
) -> PCAModel:
    """Fit PCA with one pass over the data (mean and covariance from
    the same accumulated (n, Σx, ΣxxT) statistics)."""
    import pandas as pd

    def partials(batches):
        n, s, g = 0, None, None
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gram = x.T @ x
            g = gram if g is None else g + gram
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    d = len(df.select(vec_col).first()[0])
    parts = df.select(vec_col).mapInPandas(
        partials, schema="n bigint, s array<double>, g array<double>"
    ).collect()
    n = sum(p.n for p in parts)
    if n < 2:
        raise ValueError(f"PCA needs >= 2 vectors, got {n}")
    s = np.sum([np.asarray(p.s) for p in parts], axis=0)
    g = np.sum([np.asarray(p.g).reshape(d, d) for p in parts], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order]
    # sign convention: largest-|.| entry of each component positive
    flip = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])])
    flip[flip == 0] = 1.0
    return PCAModel(mean, comps * flip, np.maximum(evals[order], 0.0))


def pca_apply(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto the fitted components: out_j = (x - mean)·c_j.

    The model folds into the plan as literals — the whole projection
    is codegen'd column arithmetic over the scan."""
    mean_lit = F.array(*[F.lit(float(m)) for m in model.mean])
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), mean_lit, lambda x, m: x - m
    )
    def proj(j):
        comp = F.array(*[F.lit(float(c)) for c in model.components[:, j]])
        return F.aggregate(
            F.zip_with(centered, comp, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    out = F.array(*[proj(j) for j in range(model.components.shape[1])])
    return df.withColumn(out_col, out)
