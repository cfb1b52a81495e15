"""SemDeDup-style SEMANTIC deduplication (Abbas et al., 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication" — public arXiv paper): cluster the embedding space with a
k-means coarse quantizer, compare pairs ONLY within a cluster with exact
cosine, and keep one representative per semantic-duplicate group.

Extension layer — the reference repo has no embedding operators; this is
the semantic tier of the dedup family (exact → MinHash/SimHash lexical →
embedding-cosine near-dup → semantic groups), the step large training
pipelines run after lexical dedup to remove paraphrase-level redundancy.

Scale shape (the whole point of the cluster blocking):
- all-pairs over 100 TB of embeddings is O(n²) and dead on arrival;
  within-cluster all-pairs is O(Σ|cᵢ|²) — with n/k ≈ 10³-sized clusters
  that is ~n·10³, a billion-row-feasible equi-join keyed on the cluster
  id (never a cartesian; the join key IS the blocking).
- k-means state (k×dim floats) is driver-side model state, broadcast in
  task closures; vectors never leave executors (``ivf.kmeans_fit``).
- keeper selection reuses ``dedup.quality_keeper``: min-label-propagation
  connected components over the within-cluster edge set + ONE window per
  component — no corpus self-join.
- oversized clusters (skew) bound the join: cap is |largest cluster|²;
  mitigate at scale by raising k (SemDeDup uses k ≈ n/10⁴) — the cluster
  size distribution is exactly what ``skew.key_skew_stats`` pre-flights.

Determinism: k-means init is the k lowest-id vectors and Lloyd's updates
are fixed arithmetic (``ivf.kmeans_fit``); cosines are quantized to 4 dp
with id tiebreaks before any comparison; keeper choice is (quality desc,
id asc). The full pipeline is a pure function of the data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from .dedup import quality_keeper
from .ivf import assign_clusters, kmeans_fit
from .similarity import cosine


def _centroid_cos_udf(centroids: np.ndarray):
    """cos(vec, centroid[assigned]) — one Arrow batch matmul; the k×dim
    centroid matrix is a closure constant like the IVF assigner's."""
    c = centroids.astype(np.float64)
    cn = np.sqrt((c * c).sum(axis=1))

    @pandas_udf(DoubleType())
    def ccos(embs: pd.Series, cl: pd.Series) -> pd.Series:
        m = np.array([np.asarray(e, dtype=np.float64) for e in embs])
        idx = cl.to_numpy()
        cc = c[idx]
        dot = (m * cc).sum(axis=1)
        vn = np.sqrt((m * m).sum(axis=1))
        return pd.Series(dot / (vn * cn[idx]))

    return ccos


def _multi_assign_udf(centroids: np.ndarray, nprobe: int):
    """Top-``nprobe`` nearest centroids per vector (argpartition over the
    same x·c − ||c||²/2 scores the IVF assigner uses), sorted ascending
    so the assignment list is deterministic."""
    from pyspark.sql.types import ArrayType, IntegerType

    c = centroids.astype(np.float64)
    half_norms = (c * c).sum(axis=1) / 2.0

    @pandas_udf(ArrayType(IntegerType()))
    def assign_n(embs: pd.Series) -> pd.Series:
        m = np.array([np.asarray(e, dtype=np.float64) for e in embs])
        scores = m @ c.T - half_norms
        top = np.argsort(-scores, axis=1)[:, :nprobe]
        return pd.Series([sorted(int(x) for x in row) for row in top])

    return assign_n


def semantic_edges(
    df: DataFrame,
    centroids: np.ndarray,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    nprobe: int = 2,
) -> DataFrame:
    """Cluster-blocked exact-cosine pairs ``(id_a, id_b, cos)`` with
    ``cos >= threshold``. Each vector is posted to its ``nprobe`` nearest
    clusters (multi-probe, the standard recall/cost knob: a pair is
    compared iff the two vectors share ANY posted cluster — pairs
    straddling one k-means boundary are recovered at ~nprobe× join
    volume). The cluster id is the equi-join key, so the plan is a hash
    join on ``_cluster`` + a row-local cosine filter + a pair-keyed
    ``distinct`` (a pair can meet in up to ``nprobe`` clusters), never a
    cross product. Precision is EXACT — every emitted pair passed the
    exact cosine test; recall misses only pairs whose vectors share none
    of their ``nprobe`` nearest centroids — the documented SemDeDup
    trade."""
    posted = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.explode(
            _multi_assign_udf(centroids, nprobe)(F.col(vec_col))
        ).alias("_cluster"),
    )
    a = posted.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"), "_cluster"
    )
    b = posted.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), "_cluster"
    )
    return (
        a.join(b, "_cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), round_digits).alias(
                "cos"
            ),
        )
        .filter(F.col("cos") >= F.lit(threshold))
        .distinct()
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    max_iter: int = 3,
    threshold: float = 0.35,
    round_digits: int = 4,
) -> DataFrame:
    """Full SemDeDup pass. Returns one row per input vector:
    ``(id_col, sem_quality, component, keeper_id, is_keeper)``.

    Keeper policy (the paper's): within a semantic-duplicate group keep
    the example FARTHEST from its cluster centroid — low
    centroid-cosine examples are the informative/hard ones, the ones
    closest to the centroid are the redundant mode. ``sem_quality`` is
    therefore ``round(-cos(vec, centroid), round_digits)`` and
    ``quality_keeper`` keeps the max (ties: min id)."""
    centroids = kmeans_fit(df, vec_col, id_col, k=k, max_iter=max_iter)
    assigned = assign_clusters(df, centroids, vec_col)
    scored = assigned.withColumn(
        "sem_quality",
        F.round(
            -_centroid_cos_udf(centroids)(F.col(vec_col), F.col("_cluster")),
            round_digits,
        ),
    )
    edges = semantic_edges(
        df, centroids, threshold, id_col, vec_col, round_digits
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    return quality_keeper(scored, id_col, "sem_quality", edges)
