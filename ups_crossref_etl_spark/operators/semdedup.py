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
    straddling one k-means boundary are recovered at ~nprobe× volume).
    Precision is EXACT — every emitted pair passed the exact cosine
    test; recall misses only pairs whose vectors share none of their
    ``nprobe`` nearest centroids — the documented SemDeDup trade.

    Execution: ONE groupBy(cluster) + applyInPandas block kernel — the
    within-cluster pair matrix is a numpy rank-1-update accumulation,
    NOT a self-join that materializes |c|² pair rows through a shuffle
    (the previous shape: interpreted higher-order-function cosines per
    pair row — HOFs don't enter whole-stage codegen — plus |c|²
    array-carrying rows; ~4× slower at sf0.1 and worse with |c|). The
    shuffle moves each vector ``nprobe`` times, nothing pairwise.

    Determinism: the kernel accumulates the Gram matrix dimension-by-
    dimension (``acc += outer(col_d, col_d)``), which reproduces
    ``similarity.dot``'s sequential fold order BIT-FOR-BIT (every
    acc[i,j] adds products in array order from 0.0), and norms come off
    the Gram diagonal (same fold). Rounding is half-away-from-zero on
    the shortest double repr — exactly ``F.round``'s BigDecimal
    HALF_UP — applied after a one-quantum raw prefilter so the Decimal
    path only touches near-threshold survivors.

    Memory: one ``rows_chunk × |c|`` slab at a time (the full |c|² Gram
    is never allocated), but a cluster's vectors do sit in one task —
    the SemDeDup deployment constraint: scale k with n so |c| stays
    ~10³-10⁴ (the paper's regime), and pre-flight the cluster size
    distribution with ``skew.key_skew_stats``."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-round_digits)
    pre = threshold - 10.0 ** (-round_digits)

    def block(pdf: pd.DataFrame) -> pd.DataFrame:
        g = len(pdf)
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "cos": pd.Series([], dtype="float64")})
        if g < 2:
            return empty
        ids = pdf["_id"].to_numpy()
        m = np.array([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        dim = m.shape[1]
        outs = []
        chunk = max(1, min(g, 2_000_000 // max(g, 1)))
        for s in range(0, g, chunk):
            rows = slice(s, min(s + chunk, g))
            acc = np.zeros((rows.stop - rows.start, g))
            for d in range(dim):  # fold order = array order (bit-exact)
                acc += np.outer(m[rows, d], m[:, d])
            nr = np.zeros(rows.stop - rows.start)
            nc = np.zeros(g)
            for d in range(dim):
                nr += m[rows, d] * m[rows, d]
                nc += m[:, d] * m[:, d]
            cosm = acc / np.outer(np.sqrt(nr), np.sqrt(nc))
            ri, ci = np.nonzero(cosm >= pre)
            keep = ids[rows][ri] != ids[ci]  # drop self-pairs
            for i, j in zip(ri[keep], ci[keep]):
                a, b = int(ids[rows][i]), int(ids[j])
                if a > b:
                    continue  # each unordered pair emitted once per block
                c = float(
                    Decimal(repr(cosm[i, j])).quantize(q, rounding=ROUND_HALF_UP)
                )
                if c >= threshold:
                    outs.append((a, b, c))
        if not outs:
            return empty
        return pd.DataFrame(outs, columns=["id_a", "id_b", "cos"])

    posted = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.explode(
            _multi_assign_udf(centroids, nprobe)(F.col(vec_col))
        ).alias("_cluster"),
    )
    return (
        posted.groupBy("_cluster")
        .applyInPandas(block, "id_a long, id_b long, cos double")
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
