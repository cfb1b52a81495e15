"""Similarity-search queries over ``embeddings`` (extension layer).

The probe vector is embeddings[vec_id=0]'s embedding — fetched driver-side
once (tiny) and inlined as literals so the scan-side plan has zero joins.
Oracles recompute cosine in DuckDB with double accumulation; both sides
round before ranking so ulp noise can't reorder the top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as sim
from ..sources.lake import read_table
from .registry import register

_ORACLE_TOPK = """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    expanded AS (
      SELECT e.vec_id,
             unnest(e.embedding)::DOUBLE AS ev,
             unnest(q.qv)::DOUBLE AS qe
      FROM embeddings e, q),
    dots AS (
      SELECT vec_id, sum(ev*qe) AS dot, sqrt(sum(ev*ev)) AS na, sqrt(sum(qe*qe)) AS nb
      FROM expanded GROUP BY vec_id)
    SELECT vec_id, round(dot/(na*nb), 4) AS cos_sim
    FROM dots
    ORDER BY cos_sim DESC, vec_id
    LIMIT 20
"""


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        read_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


@register(
    "q_emb_bruteforce_topk",
    _ORACLE_TOPK,
    doc="Exact cosine top-20 vs probe vector (zip_with+aggregate, no shuffle).",
)
def q_emb_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return sim.brute_force_topk(emb, _query_vec(spark, sf_dir), k=20)


@register(
    "q_emb_lsh_topk",
    None,  # approximate — recall checked against brute force in pytest
    doc="LSH-bucketed approximate top-10 (random-hyperplane bands).",
    gate=False,  # quality pinned by q_emb_ann_recall_bounds
)
def q_emb_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return sim.lsh_topk(emb, _query_vec(spark, sf_dir), k=10)


@register(
    "q_emb_norms",
    """
    WITH expanded AS (
      SELECT vec_id, label, unnest(embedding)::DOUBLE AS ev FROM embeddings)
    SELECT label,
           count(DISTINCT vec_id) AS n_vectors,
           round(avg(norm), 4) AS avg_norm
    FROM (SELECT vec_id, any_value(label) AS label, sqrt(sum(ev*ev)) AS norm
          FROM expanded GROUP BY vec_id) t
    GROUP BY label
    """,
    doc="Per-label vector-norm stats (embedding column hygiene check).",
)
def q_emb_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", sim.l2_norm(F.col("embedding")).alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
        )
    )


@register(
    "q_emb_pairwise_top_within_label",
    None,  # O(n²/labels) oracle is too slow in duckdb at sf0.1
    gate=False,  # exact path pinned by q_emb_pairwise_top_exact
    doc="Most-similar pair per label (blocked all-pairs + window top-1).",
)
def q_emb_pairwise_top_within_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return sim.pairwise_topk_within_label(emb)


@register(
    "q_emb_centroid_distance",
    """
    WITH expanded AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
             unnest(embedding)::DOUBLE AS ev
      FROM embeddings),
    centroids AS (
      SELECT label, i, avg(ev) AS c FROM expanded GROUP BY label, i),
    joined AS (
      SELECT e.vec_id, e.label, sum((e.ev - c.c)*(e.ev - c.c)) AS d2
      FROM expanded e JOIN centroids c ON e.label = c.label AND e.i = c.i
      GROUP BY e.vec_id, e.label)
    SELECT label, round(avg(sqrt(d2)), 4) AS avg_dist_to_centroid
    FROM joined GROUP BY label
    """,
    doc="Per-label centroid + mean L2 distance (IVF coarse-quantizer building block).",
)
def q_emb_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    # posexplode → per-dimension avg (the centroid), re-join, L2 — all native.
    exp = emb.select("vec_id", "label", F.posexplode("embedding").alias("i", "ev")).select(
        "vec_id", "label", "i", F.col("ev").cast("double").alias("ev")
    )
    cent = exp.groupBy("label", "i").agg(F.avg("ev").alias("c"))
    d2 = (
        exp.join(cent, ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(F.sum((F.col("ev") - F.col("c")) * (F.col("ev") - F.col("c"))).alias("d2"))
    )
    return d2.groupBy("label").agg(
        F.round(F.avg(F.sqrt("d2")), 4).alias("avg_dist_to_centroid")
    )


@register(
    "q_emb_near_dups",
    None,  # LSH-blocked; recall not SQL-replicable cheaply
    gate=False,  # precision+recall pinned by q_emb_near_dups_bound
    doc="Embedding-cosine near-duplicate pairs (LSH blocking + exact verify).",
)
def q_emb_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return sim.embedding_near_dups(emb, threshold=0.8)


@register(
    "q_emb_ivf_topk",
    None,  # approximate — recall vs brute force bounded in pytest
    gate=False,  # quality pinned by q_emb_ann_recall_bounds
    doc="IVF top-10: k-means coarse quantizer, nprobe nearest lists.",
)
def q_emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ivf

    emb = read_table(spark, sf_dir, "embeddings")
    centroids = ivf.kmeans_fit(emb, k=16, max_iter=3)
    return ivf.ivf_topk(emb, _query_vec(spark, sf_dir), centroids, k=10, nprobe=4)
