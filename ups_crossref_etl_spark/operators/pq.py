"""Product quantization (PQ) for the embedding column — the codebook
compression path of the ANN stack (scalar quantization in
``similarity.scalar_quantize`` cuts bytes 4×; PQ cuts them ~32× by
storing one byte per subspace instead of the subvector itself).

Build: split each ``dim``-dimensional vector into ``m`` contiguous
subvectors and run Lloyd's k-means independently per subspace — all ``m``
subspaces train in the SAME two jobs per iteration (one Arrow-batched
argmin over the (m, k, d_sub) codebook tensor, one posexplode+groupBy for
the new per-subspace centroids), so training cost does not grow with
``m``. The codebook is driver-side model state (m·k·d_sub floats — KBs),
exactly like the IVF centroid matrix.

Query: asymmetric distance computation (ADC). The query stays unquantized;
per-subspace dot products against all k centroids form an (m, k) lookup
table inlined as literals, so scoring a database vector is ``m`` array
lookups summed in a codegen'd ``aggregate`` fold over its code array —
no Python, no shuffle, and top-k is TakeOrderedAndProject. At rest the
corpus stores only ``(id, pq_codes)``; a 100 TB embedding table becomes
~3 TB of codes scanned entirely JVM-side.

Deterministic: k-means seeds from the k lowest-id vectors per subspace and
runs fixed arithmetic — same codebook every run (same contract as
``ivf.kmeans_fit``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType


def _encode_udf(codebooks: np.ndarray):
    """codes[n, j] = argmin_c ||x_sub - cb[j, c]||² via one einsum/batch."""
    cb = codebooks.astype(np.float64)  # (m, k, d_sub)
    m, _, d_sub = cb.shape
    half_norms = (cb * cb).sum(axis=2) / 2.0  # (m, k)

    @pandas_udf(ArrayType(IntegerType()))
    def encode(embs: pd.Series) -> pd.Series:
        x = np.array([np.asarray(e, dtype=np.float64) for e in embs])
        xs = x.reshape(x.shape[0], m, d_sub)
        scores = np.einsum("nmd,mkd->nmk", xs, cb) - half_norms
        return pd.Series(list(scores.argmax(axis=2).astype("int32")))

    return encode


def pq_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    max_iter: int = 5,
) -> np.ndarray:
    """Train the (m × k × d_sub) PQ codebook tensor.

    The vector dimension must be divisible by ``m``. One k-means iteration
    = one encode pass (Arrow argmin) + one per-(subspace, code, dim) mean
    (map-side-combinable groupBy); the collect is m·k·d_sub rows of model
    state, never data."""
    first = df.select(F.size(vec_col).alias("_d")).limit(1).collect()
    if not first:
        raise ValueError("pq_fit: empty input")
    dim = first[0]["_d"]
    if dim % m != 0:
        raise ValueError(f"pq_fit: dim {dim} not divisible by m={m}")
    d_sub = dim // m

    # init is id-deterministic BY DESIGN (k lowest ids, plans as
    # TakeOrdered for k<=64): reproducible codebooks beat k-means++
    # randomness for an oracle-pinned engine; swap a seeded sample at
    # 100 TB if init quality ever dominates
    init_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    if len(init_rows) < k:
        raise ValueError(f"pq_fit: need >= k={k} vectors, got {len(init_rows)}")
    seed = np.array([[float(x) for x in r[0]] for r in init_rows])  # (k, dim)
    codebooks = np.stack(
        [seed[:, j * d_sub : (j + 1) * d_sub] for j in range(m)]
    )  # (m, k, d_sub)

    for _ in range(max_iter):
        enc = _encode_udf(codebooks)
        assigned = df.select(
            enc(F.col(vec_col)).alias("_codes"),
            F.posexplode(vec_col).alias("_i", "_v"),
        ).select(
            (F.col("_i") / d_sub).cast("int").alias("_j"),
            F.element_at("_codes", (F.col("_i") / d_sub).cast("int") + 1).alias("_c"),
            (F.col("_i") % d_sub).alias("_d"),
            F.col("_v").cast("double").alias("_v"),
        )
        means = (
            assigned.groupBy("_j", "_c", "_d")
            .agg(F.avg("_v").alias("_m"))
            .collect()
        )
        new = codebooks.copy()
        for r in means:
            new[r["_j"], r["_c"], r["_d"]] = r["_m"]
        if np.allclose(new, codebooks, atol=1e-9):
            codebooks = new
            break
        codebooks = new
    return codebooks


def pq_encode(
    df: DataFrame, codebooks: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Attach ``pq_codes: array<int>`` (length m) — the at-rest
    representation; drop ``vec_col`` downstream to realize the 32×."""
    return df.withColumn("pq_codes", _encode_udf(codebooks)(F.col(vec_col)))


def _lut_literal(table: np.ndarray) -> Column:
    """Inline an (m, k) float table as a literal array<array<double>>."""
    return F.array(
        *[F.array(*[F.lit(float(v)) for v in row]) for row in table]
    )


def pq_adc_scores(
    codes_col: Column, query_vec: list[float], codebooks: np.ndarray
) -> Column:
    """Approximate cosine(query, decoded vector) from the code array alone.

    ``cos ≈ Σ_j dot(q_j, cb[j, code_j]) / (|q| · sqrt(Σ_j |cb[j, code_j]|²))``
    — two (m × k) lookup tables (query dots, centroid norms²) inlined as
    literals, folded over the code array in one codegen'd ``aggregate``.
    Row-local; no Python on the scoring path."""
    cb = codebooks.astype(np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    m, _, d_sub = cb.shape
    if q.shape[0] != m * d_sub:
        raise ValueError("pq_adc_scores: query dim != m * d_sub")
    qs = q.reshape(m, d_sub)
    dot_lut = _lut_literal(np.einsum("md,mkd->mk", qs, cb))
    n2_lut = _lut_literal((cb * cb).sum(axis=2))
    qnorm = float(np.sqrt((q * q).sum()))

    def fold(lut: Column) -> Column:
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0.0),
            lambda acc, j: acc
            + F.element_at(
                F.element_at(lut, j + 1), F.element_at(codes_col, j + 1) + 1
            ),
        )

    denom = F.lit(qnorm) * F.sqrt(fold(n2_lut))
    return F.when(denom > 0, fold(dot_lut) / denom).otherwise(F.lit(0.0))


def pq_topk(
    df: DataFrame,
    query_vec: list[float],
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """ADC top-k over PQ codes: encode (or reuse a precomputed
    ``pq_codes`` column), score row-locally, TakeOrderedAndProject."""
    coded = (
        df
        if "pq_codes" in df.columns
        else pq_encode(df, codebooks, vec_col)
    )
    return (
        coded.select(
            F.col(id_col),
            F.round(
                pq_adc_scores(F.col("pq_codes"), query_vec, codebooks),
                round_digits,
            ).alias("adc_cos"),
        )
        .orderBy(F.desc("adc_cos"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: "np.ndarray",
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """IVF-PQ: the standard billion-scale ANN composition — IVF coarse
    centroids prune the corpus to ``nprobe`` lists (partition pruning
    when the table is written ``partitionBy('_cluster')``), then PQ ADC
    scores ONLY the surviving lists from their byte codes. At 100 TB the
    scan touches nprobe/nlist of the corpus and reads ~16 B/vector —
    the two reductions compose multiplicatively. Ranks are approximate
    (ADC); quality is pinned by the gate query's recall bound, same
    contract as ``ivf_topk``/``pq_topk`` alone."""
    from .ivf import assign_clusters

    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centroids - q) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d2, kind="stable")[:nprobe]]
    pruned = assign_clusters(df, centroids, vec_col).filter(
        F.col("_cluster").isin(probe)
    )
    coded = (
        pruned
        if "pq_codes" in pruned.columns
        else pq_encode(pruned, codebooks, vec_col)
    )
    return (
        coded.select(
            F.col(id_col),
            F.round(
                pq_adc_scores(F.col("pq_codes"), query_vec, codebooks),
                round_digits,
            ).alias("adc_cos"),
        )
        .orderBy(F.desc("adc_cos"), F.asc(id_col))
        .limit(k)
    )
