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
    """Lloyd's iterations; returns the (k × dim) centroid matrix.

    Each iteration is ONE map-only pass: every partition assigns its
    vectors (argmin matmul per Arrow batch) and emits k partial rows
    ``(cluster, partition, count, dim-sum vector)`` — the hand-rolled
    map-side combine. What reaches the driver is ``partitions × k``
    rows (KBs at any corpus size), merged in (cluster, partition) sort
    order so the float fold is deterministic. The previous shape —
    assignment UDF → ``posexplode`` of every vector into (dim, value)
    rows → corpus-sized groupBy shuffle — moved 64× the data per
    iteration and was the measured bottleneck of the SemDeDup pipeline
    (kmeans 5.9s of a 5.7s bench entry at sf0.1)."""
    init_rows = (
        df.orderBy(id_col).limit(k).select(vec_col).collect()
    )  # deterministic seed: k lowest ids
    centroids = np.array([[float(x) for x in r[0]] for r in init_rows])
    dim = centroids.shape[1]
    out_schema = f"_c int, _pid int, _n long, _s array<double>"

    for _ in range(max_iter):
        c = centroids.astype(np.float64)
        half_norms = (c * c).sum(axis=1) / 2.0

        def partials(batches):
            sums = np.zeros((k, dim))
            counts = np.zeros(k, dtype=np.int64)
            pid = -1
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pid = int(pdf["_pid"].iloc[0])
                m = np.array(
                    [np.asarray(e, dtype=np.float64) for e in pdf["_v"]]
                )
                a = (m @ c.T - half_norms).argmax(axis=1)
                np.add.at(sums, a, m)  # accumulates in row order
                np.add.at(counts, a, 1)
            if pid < 0:
                return
            yield pd.DataFrame(
                {
                    "_c": np.arange(k, dtype="int32"),
                    "_pid": pid,
                    "_n": counts,
                    "_s": list(sums),
                }
            )

        rows = (
            df.select(
                F.spark_partition_id().alias("_pid"),
                F.col(vec_col).alias("_v"),
            )
            .mapInPandas(partials, out_schema)
            .collect()
        )
        new = centroids.copy()
        by_c: dict[int, list] = {}
        for r in rows:
            by_c.setdefault(r["_c"], []).append(r)
        for ci, parts in by_c.items():
            parts.sort(key=lambda r: r["_pid"])  # deterministic fold order
            n = sum(p["_n"] for p in parts)
            if n == 0:
                continue  # empty cluster keeps its previous centroid
            s = np.zeros(dim)
            for p in parts:
                s += np.asarray(p["_s"], dtype=np.float64)
            new[ci] = s / n
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


def save_centroids(spark, centroids: np.ndarray, path: str) -> None:
    """Persist a fitted centroid matrix as parquet ``(cluster_id,
    centroid)`` — the index-maintenance step every production ANN
    deployment needs: fit once on a corpus sample, then ASSIGN new
    batches for months without refitting (drift is a re-fit decision,
    monitored via ``profile.psi_drift`` on the assignment histogram).
    Model state is k×dim floats — parquet keeps it engine-portable and
    diffable, vs a pickled array nothing else can read."""
    rows = [
        (int(i), [float(x) for x in centroids[i]]) for i in range(len(centroids))
    ]
    spark.createDataFrame(rows, "cluster_id int, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def load_centroids(spark, path: str) -> np.ndarray:
    """Inverse of ``save_centroids``: parquet → (k × dim) ndarray,
    ordered by cluster_id (the id IS the row index, so assignments made
    against the reloaded matrix are bit-identical to the original)."""
    rows = spark.read.parquet(path).orderBy("cluster_id").collect()
    return np.array([r["centroid"] for r in rows], dtype=np.float64)
