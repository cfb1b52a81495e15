"""IVF (inverted-file) approximate nearest neighbor — the k-means-
quantizer alternative to the hyperplane LSH in ``similarity.py``.

Build: Lloyd's k-means over the embedding column. Each iteration is two
DataFrame jobs — (1) assign every vector to its nearest centroid (one
Arrow-batched argmin matmul per batch; the k×dim centroid matrix is a
closure constant), (2) recompute centroids as per-cluster per-dimension
means via posexplode + groupBy (map-side combinable). The centroid matrix
lives driver-side (k×dim floats — KBs), the data never leaves executors.

Probe: assign the query to its ``nprobe`` nearest centroids driver-side,
scan only those inverted lists (a partition-prunable filter when the
assignment is written as a partition column), exact-rank the survivors.

Deterministic: init picks the k lowest-id vectors, iterations are fixed
arithmetic — same result every run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType

from .similarity import cosine


def _assign_udf(centroids: np.ndarray):
    """argmin_c ||x - c||² = argmax_c (x·c - ||c||²/2) — one matmul/batch."""
    c = centroids.astype(np.float64)
    half_norms = (c * c).sum(axis=1) / 2.0

    @pandas_udf(IntegerType())
    def assign(embs: pd.Series) -> pd.Series:
        m = np.array([np.asarray(e, dtype=np.float64) for e in embs])
        scores = m @ c.T - half_norms
        return pd.Series(scores.argmax(axis=1).astype("int32"))

    return assign


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    max_iter: int = 5,
) -> np.ndarray:
    """Lloyd's iterations; returns the (k × dim) centroid matrix."""
    init_rows = (
        df.orderBy(id_col).limit(k).select(vec_col).collect()
    )  # deterministic seed: k lowest ids
    centroids = np.array([[float(x) for x in r[0]] for r in init_rows])

    for _ in range(max_iter):
        assign = _assign_udf(centroids)
        assigned = df.select(
            assign(F.col(vec_col)).alias("_c"),
            F.posexplode(vec_col).alias("_i", "_v"),
        )
        means = (
            assigned.groupBy("_c", "_i")
            .agg(F.avg(F.col("_v").cast("double")).alias("_m"))
            .collect()
        )
        new = centroids.copy()
        by_c: dict[int, dict[int, float]] = {}
        for r in means:
            by_c.setdefault(r["_c"], {})[r["_i"]] = r["_m"]
        for ci, dims in by_c.items():
            for di, v in dims.items():
                new[ci, di] = v
        if np.allclose(new, centroids, atol=1e-9):
            centroids = new
            break
        centroids = new
    return centroids


def assign_clusters(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Attach the IVF list id. At rest, write with
    ``partitionBy('_cluster')`` so probes prune partitions."""
    return df.withColumn("_cluster", _assign_udf(centroids)(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Probe the ``nprobe`` lists nearest the query; exact cosine rank."""
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centroids - q) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d2)[:nprobe]]
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assign_clusters(df, centroids, vec_col)
        .filter(F.col("_cluster").isin(probe))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), qcol), round_digits).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
