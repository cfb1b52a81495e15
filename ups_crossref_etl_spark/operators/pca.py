"""PCA over embedding columns — distributed moments, driver eigen.

Extension layer — no counterpart in /root/reference. The pipeline use:
data-driven dimensionality reduction of an embedding column before
ANN / clustering / dedup — the learned counterpart to the sibling
random-projection operator (``similarity.py``'s JL path): JL preserves
distances obliviously; PCA concentrates VARIANCE, so the same k keeps
more recall when the spectrum decays (which real embedding spectra
do).

Architecture (the canonical Spark decomposition of PCA):
1. **Distributed sufficient statistics** — one ``mapInPandas`` pass
   accumulates per-partition ``(count, Σx, Σ x xᵀ)`` with numpy
   (float64); the driver sums the ≤ numPartitions partials. For d-dim
   vectors that is d² + d + 1 doubles per partition — bounded model
   state, the same ``collect()`` discipline as k-means centroids.
2. **Driver eigendecomposition** — covariance = Sxx/n − μμᵀ (d×d,
   driver-sized for embedding dims); ``numpy.linalg.eigh``, components
   sorted by descending eigenvalue. Sign canonicalized (largest-|·|
   coordinate of each component made positive) so results are
   partition-order independent.
3. **Map-only projection** — components broadcast in the task closure
   of an Arrow-batched ``pandas_udf``; projecting 100 TB never
   shuffles.

Correctness surface: eigenvectors are only defined up to sign/rotation
in degenerate spectra, so the gate pins INVARIANTS (orthonormality,
eigenvalue ordering, per-component projected variance == eigenvalue,
reconstruction error decreasing in k, total variance preserved) rather
than hashing component values — the sketch-contract pattern
(``q_emb_pca_bound``), like HLL and IVF recall bounds.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["PCAModel", "pca_fit", "pca_transform"]


class PCAModel(NamedTuple):
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (k, d) rows = principal axes
    eigenvalues: np.ndarray   # (k,) descending
    total_variance: float     # trace of covariance (all d dims)
    n: int


def pca_fit(df: DataFrame, vec_col: str, k: int) -> PCAModel:
    """Fit a rank-``k`` PCA on ``vec_col`` (array<float>). One pass for
    the moments, driver ``eigh`` on the d×d covariance."""
    schema = StructType(
        [
            StructField("n", LongType()),
            StructField("s", ArrayType(DoubleType())),
            StructField("ss", ArrayType(DoubleType())),
        ]
    )

    def moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        ss = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
            )
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            ss = g if ss is None else ss + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    parts = (
        df.select(F.col(vec_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .mapInPandas(moments, schema=schema)
        .collect()  # bounded: <= numPartitions rows of (d^2 + d + 1)
    )
    if not parts:
        raise ValueError("no vectors to fit")
    n = sum(r["n"] for r in parts)
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    d = s.shape[0]
    ss = np.sum([np.array(r["ss"]).reshape(d, d) for r in parts], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # enforce symmetry against fp drift
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][: int(k)]
    comps = evecs[:, order].T  # (k, d)
    # canonical sign: make the largest-|coordinate| of each row positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=mean,
        components=comps,
        eigenvalues=np.maximum(evals[order], 0.0),
        total_variance=float(np.trace(cov)),
        n=int(n),
    )


def pca_transform(
    df: DataFrame, model: PCAModel, vec_col: str, out_col: str = "pc"
) -> DataFrame:
    """Append ``out_col`` = centered projection onto the model's
    components (array<double>, length k). Map-only; the (k, d) model
    rides in the task closure."""
    mean = model.mean.copy()
    comps = model.components.copy()

    @F.pandas_udf(ArrayType(DoubleType()))
    def project(vs: pd.Series) -> pd.Series:
        x = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        p = (x - mean) @ comps.T
        return pd.Series(list(p))

    return df.withColumn(out_col, project(F.col(vec_col)))


class ProcrustesModel(NamedTuple):
    rotation: np.ndarray   # (d, d) orthogonal
    mean_x: np.ndarray     # (d,)
    mean_y: np.ndarray     # (d,)
    n: int


def procrustes_fit(
    df: DataFrame, x_col: str, y_col: str
) -> ProcrustesModel:
    """Orthogonal Procrustes alignment between two embedding versions
    living on the same rows: the rotation R = U V^T (from the SVD of the
    centered cross-covariance X^T Y) minimizing ||(X - mx) R - (Y - my)||_F
    (Schonemann 1966).

    THE embedding-migration primitive: after re-training or upgrading an
    encoder, old and new vectors disagree by (approximately) a rotation;
    aligning the old index instead of re-embedding the corpus turns a
    full re-encode into one map pass. Same scale recipe as
    :func:`pca_fit` — a mapInPandas moments pass whose output is bounded
    by partition count (each part ships n, two d-sums and one d*d
    cross-product), a driver-side d*d SVD (model-sized), and the
    rotation rides back in a task closure.
    """
    schema = StructType(
        [
            StructField("n", LongType()),
            StructField("sx", ArrayType(DoubleType())),
            StructField("sy", ArrayType(DoubleType())),
            StructField("m", ArrayType(DoubleType())),
        ]
    )

    def moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        sx = sy = m = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["x"]])
            y = np.array([np.asarray(v, dtype=np.float64) for v in pdf["y"]])
            n += x.shape[0]
            sx = x.sum(axis=0) if sx is None else sx + x.sum(axis=0)
            sy = y.sum(axis=0) if sy is None else sy + y.sum(axis=0)
            g = x.T @ y
            m = g if m is None else m + g
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "sx": [sx.tolist()],
                    "sy": [sy.tolist()],
                    "m": [m.ravel().tolist()],
                }
            )

    parts = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .mapInPandas(moments, schema=schema)
        .collect()  # bounded: <= numPartitions rows of (d^2 + 2d + 1)
    )
    if not parts:
        raise ValueError("no vector pairs to align")
    n = sum(r["n"] for r in parts)
    sx = np.sum([np.array(r["sx"]) for r in parts], axis=0)
    sy = np.sum([np.array(r["sy"]) for r in parts], axis=0)
    d = sx.shape[0]
    m = np.sum([np.array(r["m"]).reshape(d, d) for r in parts], axis=0)
    mx, my = sx / n, sy / n
    cross = m - np.outer(mx, sy)  # sum (x - mx)^T y  == X^T Y - mx sy^T
    u, _, vt = np.linalg.svd(cross)
    r = u @ vt
    return ProcrustesModel(rotation=r, mean_x=mx, mean_y=my, n=int(n))


def procrustes_apply(
    df: DataFrame, model: ProcrustesModel, x_col: str, out_col: str = "aligned"
) -> DataFrame:
    """Append ``out_col`` = (x - mean_x) @ R + mean_y — the aligned
    vector in the target space. Map-only; the (d, d) rotation rides in
    the task closure."""
    r = model.rotation.copy()
    mx = model.mean_x.copy()
    my = model.mean_y.copy()

    @F.pandas_udf(ArrayType(DoubleType()))
    def align(vs: pd.Series) -> pd.Series:
        x = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        out = (x - mx) @ r + my
        return pd.Series(list(out))

    return df.withColumn(out_col, align(F.col(x_col)))
