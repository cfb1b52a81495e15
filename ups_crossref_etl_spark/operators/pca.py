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
