"""Hard-negative mining over embedding columns.

Contrastive/retrieval training (DPR, SimCSE, CLIP-style) needs, for
every anchor, the most-similar examples that are NOT of the anchor's
class — "hard" negatives close to the decision boundary. This module
provides the exact baseline and the IVF-blocked scale path, the same
two-tier contract as ``operators/similarity.py`` (exact truth for the
gate, cluster-blocked candidates for 100 TB).

Reference parity note: no counterpart in /root/reference (a
SQLite/pandas bibliometric ETL) — this is LLM-training-data extension
surface, same family as operators/semdedup.py.

Scale shape (operational path):
- vectors post to their ``nprobe`` nearest k-means centroids (one
  map-only Arrow pass; the centroid matrix is a task-closure constant);
- candidate generation is ONE groupBy(cluster) + applyInPandas block
  kernel emitting each anchor's per-block top-k cross-label matches —
  never a pairwise self-join shuffle (the |c|² rows stay inside the
  kernel as numpy slabs);
- global per-anchor top-k is a window over ≤ nprobe·k candidate rows
  per anchor (bounded — no skew exposure).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .semdedup import _multi_assign_udf
from .similarity import cosine

__all__ = ["hard_negatives_exact", "hard_negatives_ivf"]


def hard_negatives_exact(
    df: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_digits: int = 4,
) -> DataFrame:
    """Exact per-anchor top-``k`` cross-label neighbours by cosine.

    All-pairs — the ground-truth baseline, O(n²): run it on bounded
    samples (gate queries, recall audits of the IVF path), never the
    full corpus. Returns ``(anchor_id, neg_id, rank, cos)`` ordered by
    a total tiebreak (cos desc, neg_id asc per anchor, rounded before
    ranking so the order is engine-independent).
    """
    a = df.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("_va"),
        F.col(label_col).alias("_la"),
    )
    b = df.select(
        F.col(id_col).alias("neg_id"),
        F.col(vec_col).alias("_vb"),
        F.col(label_col).alias("_lb"),
    )
    pairs = a.join(b, F.col("_la") != F.col("_lb")).select(
        "anchor_id",
        "neg_id",
        F.round(cosine(F.col("_va"), F.col("_vb")), round_digits).alias("cos"),
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cos"), F.asc("neg_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "anchor_id", "neg_id", F.col("rank").cast("bigint").alias("rank"),
            "cos",
        )
    )


def hard_negatives_ivf(
    df: DataFrame,
    centroids: np.ndarray,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    nprobe: int = 2,
    round_digits: int = 4,
) -> DataFrame:
    """IVF-blocked hard negatives: candidates are cross-label pairs
    sharing ≥1 of their ``nprobe`` posted clusters; within each cluster
    a numpy block kernel scores all cross-label pairs exactly and emits
    each anchor's block-local top-``k``; a final window keeps the global
    top-``k`` per anchor over the ≤ ``nprobe·k`` surviving candidates.

    Per-block top-k then global top-k is lossless over the candidate
    set: the global winners within the union of blocks are each inside
    some block's top-k (cosines are identical wherever a pair re-occurs,
    and the ``distinct()`` collapses re-occurrences). Recall vs the
    exact operator misses only pairs sharing none of their posted
    clusters — the documented IVF trade, measured by the recall-bound
    gate query.

    Determinism: the kernel reproduces ``similarity.dot``'s fold order
    dimension-by-dimension and rounds HALF_UP like ``F.round`` (same
    discipline as ``semdedup.semantic_edges``).
    """
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-round_digits)

    def block(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "anchor_id": pd.Series([], dtype="int64"),
                "neg_id": pd.Series([], dtype="int64"),
                "cos": pd.Series([], dtype="float64"),
            }
        )
        g = len(pdf)
        if g < 2:
            return empty
        ids = pdf["_id"].to_numpy()
        labels = pdf["_l"].to_numpy()
        m = np.array([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        dim = m.shape[1]
        outs = []
        chunk = max(1, min(g, 2_000_000 // max(g, 1)))
        norms = np.zeros(g)
        for d in range(dim):
            norms += m[:, d] * m[:, d]
        norms = np.sqrt(norms)
        for s in range(0, g, chunk):
            rows = slice(s, min(s + chunk, g))
            acc = np.zeros((rows.stop - rows.start, g))
            for d in range(dim):  # fold order = array order (bit-exact)
                acc += np.outer(m[rows, d], m[:, d])
            cosm = acc / np.outer(norms[rows], norms)
            cross = labels[rows][:, None] != labels[None, :]
            for i in range(rows.stop - rows.start):
                cand = np.nonzero(cross[i])[0]
                if len(cand) == 0:
                    continue
                # round BEFORE the block-local cut so the local criterion
                # is identical to the global window's (rounded desc, id asc)
                rounded = {
                    int(ids[j]): float(
                        Decimal(repr(cosm[i, j])).quantize(
                            q, rounding=ROUND_HALF_UP
                        )
                    )
                    for j in cand
                }
                order = sorted(rounded.items(), key=lambda kv: (-kv[1], kv[0]))
                for nid, c in order[:k]:
                    outs.append((int(ids[rows][i]), nid, c))
        if not outs:
            return empty
        return pd.DataFrame(outs, columns=["anchor_id", "neg_id", "cos"])

    posted = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.col(label_col).alias("_l"),
        F.explode(
            _multi_assign_udf(centroids, nprobe)(F.col(vec_col))
        ).alias("_cluster"),
    )
    cands = (
        posted.groupBy("_cluster")
        .applyInPandas(block, "anchor_id long, neg_id long, cos double")
        .distinct()
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cos"), F.asc("neg_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "anchor_id", "neg_id", F.col("rank").cast("bigint").alias("rank"),
            "cos",
        )
    )


def uniform_negative_sampling(
    df: DataFrame,
    id_col: str,
    label_col: str,
    k: int = 5,
    oversample: int = 3,
    seed: str = "neg",
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive
    training: for each anchor row, ``k`` pseudo-random OTHER-label rows
    — ``(anchor_id, slot, neg_id, neg_label)`` with slot 1..k in draw
    order. The uniform counterpart to :func:`hard_negative_mining`
    (similarity-ranked): uniform negatives are the unbiased default;
    hard negatives are the curriculum upgrade.

    Draws are a pure function of ``(seed, anchor, slot)``: md5 → mod
    row-count → dense-rank index lookup, the engine-portable recipe of
    operators/sampling.py — so resampling is exactly reproducible
    (and oracle-checkable) with no RNG state. Candidates hitting the
    anchor itself or sharing its label are rejected; ``k + oversample``
    slots are drawn so k survivors is overwhelmingly likely (fewer
    survive deterministically on pathological label skew — callers see
    the shortfall, nothing resamples silently).

    Scale: one dense-rank index over the id table (window over ids —
    group-table-sized), explode anchors × (k + oversample) slots, ONE
    index-keyed equi-join to resolve draws, one label anti-filter, one
    per-anchor window to renumber surviving slots. No similarity
    computation, no candidate blowup beyond the constant slot factor.
    """
    from pyspark.sql import Window

    ids = df.select(
        F.col(id_col).alias("_nid"), F.col(label_col).alias("_nlabel")
    ).withColumn(
        "_idx",
        F.row_number().over(Window.orderBy("_nid")) - 1,
    )
    n = ids.count()
    slots = df.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("_albl"),
        F.explode(
            F.sequence(F.lit(1), F.lit(int(k) + int(oversample)))
        ).alias("_slot"),
    ).withColumn(
        "_idx",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(seed),
                        F.col("anchor_id").cast("string"),
                        F.col("_slot").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(n),
    )
    joined = (
        slots.join(ids, "_idx")
        .filter(
            (F.col("_nid") != F.col("anchor_id"))
            & (F.col("_nlabel") != F.col("_albl"))
        )
        .withColumn(
            "slot",
            F.row_number().over(
                Window.partitionBy("anchor_id").orderBy("_slot")
            ),
        )
        .filter(F.col("slot") <= k)
    )
    return joined.select(
        "anchor_id",
        F.col("slot").cast("bigint").alias("slot"),
        F.col("_nid").alias("neg_id"),
        F.col("_nlabel").alias("neg_label"),
    )
