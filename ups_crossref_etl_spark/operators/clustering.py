"""Density clustering over embedding columns: DBSCAN (Ester et al.
1996) re-expressed as DataFrame joins + connected components.

Reference parity: the reference (rabarrazueta/ups-crossref-etl) has no
vector module — this is LLM-pipeline extension surface: density
clustering is the "find the blobs AND the outliers" complement to the
k-means paths (``ivf.kmeans_fit``, ``semdedup``) — noise points are
exactly the embeddings a curation pass should inspect (mislabeled,
off-distribution, junk), and DBSCAN needs no k.

Scale contract (two candidate-generation modes, the repo's standard
exact/operational split):

- ``mode="exact"``: all-pairs within the input — a DELIBERATELY BOUNDED
  quadratic (the blocking-quality-audit contract): gate it on slices
  whose size is bounded by construction. The join is keyed (constant
  block key), never a CartesianProduct node.
- ``mode="lsh"``: random-hyperplane band signatures (the
  ``similarity.embedding_near_dups`` machinery) generate candidates —
  for unit-norm vectors an L2 eps-ball IS a cosine cap
  (``d² = 2 - 2·cos`` → ``cos ≥ 1 - eps²/2``), exactly what hyperplane
  LSH buckets preserve. Work scales with band-bucket co-occupancy, not
  n². Recall < 1 is the documented price, with a ONE-SIDED guarantee:
  a missed pair can only DEMOTE points (core → border/noise) and SPLIT
  clusters — LSH never invents density, so lsh-cores ⊆ exact-cores and
  exact-noise ⊆ lsh-noise (property-tested invariants).

  Regime caveat (curse of dimensionality, stated rather than hidden):
  hyperplane banding prunes AND recalls only when eps maps to a high
  cosine (near-dup grade, cos ≳ 0.7 — per-plane collision
  ``1 - acos(cos)/π`` well above the 0.5 of random pairs). At
  weak-density eps (cos near 0) NO sublinear candidate scheme keeps
  recall — there the supported shape is ``mode="exact"`` on bounded
  slices (the graph family's bounded-subgraph contract), and the
  exact-vs-lsh agreement gate MEASURES the demotion rate instead of
  pretending it away.

Determinism: components are micro-quantized (``round(x·1e6)`` BIGINT)
before any distance, so d² is exact integer arithmetic both engines
reproduce bit-for-bit, and the eps test is an integer compare against
``round(eps·1e6)²``. Cluster ids are min-member-ids (from
``graph.connected_components``), border assignment takes the MIN
adjacent-core cluster — every tie broken, no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_QUANT = 1_000_000  # micro-quantization scale for exact integer distances


def _quantized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("_id"),
        # cast to double BEFORE the multiply: float32 * int stays float in
        # Spark's coercion, which would round differently than the
        # oracle's double math
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * F.lit(float(_QUANT))).cast(
                "bigint"
            ),
        ).alias("_q"),
        F.col(vec_col).alias("_v"),
    ).filter(F.col("_id").isNotNull() & F.col("_q").isNotNull())


def _d2_micro(a, b):
    """Exact integer squared L2 distance in micro² units."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def dbscan(
    df: DataFrame,
    eps: float,
    min_pts: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "lsh",
    bands: int = 16,
    planes_per_band: int = 6,
    dim: int = 64,
) -> DataFrame:
    """DBSCAN over an embedding column: ``(vec_id, role, cluster)`` for
    every input row, with ``role`` in {'core', 'border', 'noise'} and
    ``cluster`` = the min member id of the density-connected component
    (NULL for noise).

    Semantics (textbook): a point is CORE when its eps-ball holds >=
    ``min_pts`` points (itself included); clusters are connected
    components of the core-core eps-adjacency graph; a non-core point
    within eps of a core is a BORDER point of that core's cluster (MIN
    cluster id when several cores adjoin — the classic order-dependence
    of DBSCAN border assignment made deterministic); everything else is
    NOISE.

    Plan shape: candidate pairs (mode above) → exact integer-micro d²
    filter → id-keyed neighbor-count aggregate (core flag) →
    ``graph.connected_components`` on the core-core edges (min-id label
    propagation, rounds = component diameter) → one border min-join →
    union. Distances shuffle ids + quantized vectors only; the LSH path
    never goes quadratic.
    """
    if mode not in ("exact", "lsh"):
        raise ValueError(f"dbscan: unknown mode {mode!r}")
    from .graph import connected_components

    base = _quantized(df, id_col, vec_col).localCheckpoint()
    eps_u2 = int(round(eps * _QUANT)) ** 2

    if mode == "exact":
        # deliberately bounded quadratic: constant-key equi-join (never a
        # CartesianProduct node) — gate-tier only, on bounded slices
        a = base.select(
            F.lit(0).alias("_blk"),
            F.col("_id").alias("_ida"),
            F.col("_q").alias("_qa"),
        )
        b = base.select(
            F.lit(0).alias("_blk"),
            F.col("_id").alias("_idb"),
            F.col("_q").alias("_qb"),
        )
        cand = a.join(b, "_blk").filter(F.col("_ida") < F.col("_idb"))
    else:
        from .similarity import band_signatures_udf

        # validate dim against the data BEFORE building the plane
        # matrix: a mismatch otherwise surfaces as an opaque matmul
        # shape error inside the executor (ADVICE r8)
        first = base.select(F.size("_v").alias("_d")).limit(1).collect()
        if first and first[0]["_d"] != dim:
            raise ValueError(
                f"dbscan(mode='lsh'): dim={dim} does not match the "
                f"embedding column's actual dimension {first[0]['_d']} — "
                "pass dim=<actual> (the plane matrix is built from it)"
            )
        sig_udf = band_signatures_udf(dim, bands, planes_per_band)
        sigs = base.select(
            "_id", "_q", sig_udf(F.col("_v")).alias("_sigs")
        ).select("_id", "_q", F.posexplode("_sigs").alias("_band", "_sig"))
        cand = (
            sigs.alias("a")
            .join(
                sigs.alias("b"),
                (F.col("a._band") == F.col("b._band"))
                & (F.col("a._sig") == F.col("b._sig"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .select(
                F.col("a._id").alias("_ida"),
                F.col("a._q").alias("_qa"),
                F.col("b._id").alias("_idb"),
                F.col("b._q").alias("_qb"),
            )
            .dropDuplicates(["_ida", "_idb"])
        )

    nbrs = (
        cand.filter(_d2_micro(F.col("_qa"), F.col("_qb")) <= F.lit(eps_u2))
        .select("_ida", "_idb")
        .localCheckpoint()
    )
    sym = nbrs.select(F.col("_ida").alias("_id"), F.col("_idb").alias("_nb")).unionByName(
        nbrs.select(F.col("_idb").alias("_id"), F.col("_ida").alias("_nb"))
    )
    ncnt = sym.groupBy("_id").agg(F.count(F.lit(1)).alias("_nc"))
    flags = (
        base.select("_id")
        .join(ncnt, "_id", "left")
        .select(
            "_id",
            (
                (F.coalesce(F.col("_nc"), F.lit(0)) + 1) >= min_pts
            ).alias("_core"),
        )
        .localCheckpoint()
    )
    cores = flags.filter(F.col("_core")).select("_id")
    core_edges = (
        nbrs.join(cores.withColumnRenamed("_id", "_ida"), "_ida")
        .join(cores.withColumnRenamed("_id", "_idb"), "_idb")
        .select(F.col("_ida").alias("src"), F.col("_idb").alias("dst"))
    )
    cc = connected_components(core_edges)  # (node, component)
    core_out = (
        cores.join(cc, cores["_id"] == cc["node"], "left")
        .select(
            F.col("_id"),
            F.lit("core").alias("role"),
            # an isolated core (min_pts=1 style) is its own cluster
            F.coalesce(F.col("component"), F.col("_id")).alias("cluster"),
        )
    )
    non_core = flags.filter(~F.col("_core")).select("_id")
    border = (
        sym.join(non_core, "_id")
        .join(
            core_out.select(
                F.col("_id").alias("_nb"), F.col("cluster").alias("_cl")
            ),
            "_nb",
        )
        .groupBy("_id")
        .agg(F.min("_cl").alias("cluster"))
        .select("_id", F.lit("border").alias("role"), "cluster")
    )
    noise = (
        non_core.join(border.select("_id"), "_id", "left_anti")
        .select(
            "_id",
            F.lit("noise").alias("role"),
            F.lit(None).cast(core_out.schema["cluster"].dataType).alias(
                "cluster"
            ),
        )
    )
    return (
        core_out.unionByName(border)
        .unionByName(noise)
        .select(F.col("_id").alias(id_col), "role", "cluster")
    )
