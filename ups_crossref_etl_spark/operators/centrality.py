"""Distance-based graph centrality: all-pairs hop distances by min-plus
path doubling, and the closeness / harmonic centralities built on them.

Reference parity: the reference (rabarrazueta/ups-crossref-etl, single-file
SQLite/pandas ETL) has no graph module — this is engine-extension surface
for the corpus/citation graphs an LLM-data pipeline builds (which documents
sit closest to the rest of the near-dup graph? which authors anchor the
co-authorship component?).

Scale contract: all-pairs distances are O(reach^2) STATE — like
:func:`ups_crossref_etl_spark.operators.graph.transitive_closure`, these
run on BOUNDED subgraphs (a component, an ego net, a sampled seed set),
never a 100 TB edge list. What scales is the round count: min-plus
doubling needs only ``ceil(log2(diameter))`` self-joins instead of
``diameter`` frontier expansions, and every join is keyed on the midpoint
node (plain shuffle-hash joins — never a cross product). For corpus-scale
"how central-ish" questions use :func:`graph.hyper_anf` (HLL neighborhood
sketches), which trades exactness for linear state; these operators are
its exact sibling on the slice you can afford.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hop_distances(
    edges: DataFrame,
    directed: bool = True,
    max_rounds: int = 12,
    strict: bool = True,
) -> DataFrame:
    """All-pairs shortest HOP distances ``(src, dst, dist)`` (dist >= 1)
    of a bounded graph by MIN-PLUS PATH DOUBLING: each round joins the
    current distance table with itself on the midpoint node and keeps
    the per-pair minimum, so after r rounds every shortest path of
    length <= 2^r is found — a 60-cycle closes in 6 rounds, not 59.

    ``directed=False`` symmetrizes the edge list first (undirected
    distance). Self-pairs are ALWAYS excluded — both the initial edge
    filter and the min-plus join drop ``src == dst``, so a cycle
    through a node never emits a self-distance. That is the contract
    the closeness / harmonic / eccentricity consumers assume (a node's
    own row must not contribute to its distance sum).

    Plan shape per round: one midpoint-keyed self-join + one pair-keyed
    min aggregate, localCheckpointed to cut the lineage (the same
    skeleton as ``graph.transitive_closure``, carrying a dist payload).
    Convergence = a limit(1) probe finding no new-or-shorter pair;
    ``strict=True`` raises on ``max_rounds`` exhaustion because a
    silently truncated distance table inflates every closeness built on
    it. max_rounds=12 covers diameters to 4096.
    """
    e = edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    dist = (
        e.distinct()
        .select("src", "dst", F.lit(1).cast("bigint").alias("dist"))
        .localCheckpoint()
    )
    # r13 fixpoint detector: (pair count, total dist) — the pair set only
    # GROWS and a fixed pair's dist only SHRINKS, so the pair is invariant
    # iff the table is. One aggregate per round on the lazily-checkpointed
    # merge (scans every partition, completing the checkpoint in the same
    # job) replaces the old eager checkpoint + left-join + limit(1) probe
    # — one job per round instead of two, identical convergence decision.
    stats = dist.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("dist").alias("_s")
    ).collect()[0]
    prev = (stats["_n"], stats["_s"])
    converged = False
    for _ in range(max_rounds):
        # min-plus square: src --d1--> mid --d2--> dst
        via = (
            dist.alias("a")
            .join(
                dist.alias("b"),
                F.col("a.dst") == F.col("b.src"),
            )
            .filter(F.col("a.src") != F.col("b.dst"))
            .select(
                F.col("a.src").alias("src"),
                F.col("b.dst").alias("dst"),
                (F.col("a.dist") + F.col("b.dist")).alias("dist"),
            )
        )
        merged = (
            dist.unionByName(via)
            .groupBy("src", "dst")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
        stats = merged.agg(
            F.count(F.lit(1)).alias("_n"), F.sum("dist").alias("_s")
        ).collect()[0]
        cur = (stats["_n"], stats["_s"])
        dist = merged
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        msg = (
            f"hop_distances hit max_rounds={max_rounds} before the "
            "min-plus fixpoint — raise max_rounds (needs "
            ">= ceil(log2(diameter)) + 1)"
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return dist


def closeness_centrality(
    edges: DataFrame,
    directed: bool = False,
    max_rounds: int = 12,
) -> DataFrame:
    """Closeness + harmonic centrality per node of a bounded graph:
    ``(node, n_reached, sum_dist, closeness, harmonic)`` where over the
    nodes reachable FROM ``node`` (excluding itself)

    - ``closeness`` is the Wasserman–Faust component-corrected form
      ``n_reached^2 / ((n - 1) * sum_dist)`` with ``n_reached`` = nodes
      reached excluding self and ``n`` = total node count — comparable
      across components of different sizes;
    - ``harmonic`` is ``sum(1 / dist)`` (Marchiori–Latora), the form
      that needs no correction because unreachable nodes contribute 0.

    Isolated nodes (degree 0 after symmetrization) get 0.0 for both.

    Determinism: each ``1/dist`` term is quantized to integer nanos
    ``round(1e9 / dist)`` BEFORE the per-node sum, so the harmonic
    aggregate is exact integer arithmetic (order-independent,
    bit-reproducible against a SQL oracle); closeness divides exact
    BIGINT sums in one shot. Both round to 6 dp.

    Scale: inherits :func:`hop_distances`' bounded-subgraph contract —
    the distance table is O(reach^2). The per-node reduction afterwards
    is a plain node-keyed aggregate.
    """
    dist = hop_distances(
        edges, directed=directed, max_rounds=max_rounds, strict=True
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .filter(F.col("node").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    n_total = nodes.count()
    per_src = dist.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_r"),
        F.sum("dist").cast("bigint").alias("sum_dist"),
        F.sum(F.round(F.lit(1e9) / F.col("dist")).cast("bigint"))
        .cast("bigint")
        .alias("_hn"),
    )
    joined = nodes.join(per_src, "node", "left")
    r = F.coalesce(F.col("_r"), F.lit(0)).cast("double")
    if n_total > 1:
        clo = F.when(
            F.col("sum_dist").isNotNull() & (F.col("sum_dist") > 0),
            (r * r) / (F.lit(float(n_total - 1)) * F.col("sum_dist")),
        ).otherwise(F.lit(0.0))
    else:
        clo = F.lit(0.0)
    return joined.select(
        "node",
        F.coalesce(F.col("_r"), F.lit(0)).cast("bigint").alias("n_reached"),
        F.coalesce(F.col("sum_dist"), F.lit(0)).cast("bigint").alias("sum_dist"),
        (F.round(clo, 6) + 0.0).alias("closeness"),
        (
            F.round(F.coalesce(F.col("_hn"), F.lit(0)) / 1e9, 6) + 0.0
        ).alias("harmonic"),
    )


def eccentricity(
    edges: DataFrame,
    directed: bool = False,
    max_rounds: int = 12,
) -> DataFrame:
    """Per-node eccentricity (max hop distance to any reachable node)
    of a bounded graph, plus the graph's diameter/radius derived from
    it downstream: ``(node, n_reached, eccentricity)`` — eccentricity
    0 for isolated nodes (nothing reachable). The "how deep does this
    component go" profile that sizes BFS-style passes (label
    spreading, closure) before running them.

    Built on :func:`hop_distances` (min-plus path doubling), so it
    inherits the bounded-subgraph contract; the reduction is one
    node-keyed max aggregate.
    """
    dist = hop_distances(
        edges, directed=directed, max_rounds=max_rounds, strict=True
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .filter(F.col("node").isNotNull())
        .distinct()
    )
    per = dist.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_r"),
        F.max("dist").cast("bigint").alias("_e"),
    )
    return nodes.join(per, "node", "left").select(
        "node",
        F.coalesce("_r", F.lit(0)).cast("bigint").alias("n_reached"),
        F.coalesce("_e", F.lit(0)).cast("bigint").alias("eccentricity"),
    )


def betweenness_pairs(
    edges: DataFrame,
    directed: bool = False,
    max_rounds: int = 12,
) -> DataFrame:
    """Shortest-path coverage centrality per node of a bounded graph:
    ``(node, n_through_pairs)`` = the number of unordered node pairs
    ``(s, t)`` (both distinct from ``node``) with ``node`` on AT LEAST
    one shortest s-t path, i.e. ``d(s,v) + d(v,t) = d(s,t)``.

    On graphs whose shortest paths are UNIQUE (trees, in particular)
    this IS classic Freeman betweenness (every covered pair contributes
    its full unit); on graphs with multiple geodesics it is the
    well-defined upper variant sometimes called stress-coverage — each
    pair counts 0/1 instead of the fractional sigma_st(v)/sigma_st.
    The docstring states this honestly because the gate runs on a tree
    where both notions coincide exactly.

    Plan shape: :func:`hop_distances` (min-plus doubling, bounded
    subgraph contract), then ONE midpoint-keyed self-join of the
    distance table with itself (s→v ⋈ v→t) and ONE pair-keyed
    equi-join against d(s,t) to test the geodesic identity — all
    equi-joins on O(reach²) state, the same budget as the distance
    table itself. Counts are exact BIGINTs.
    """
    dist = hop_distances(
        edges, directed=directed, max_rounds=max_rounds, strict=True
    ).localCheckpoint()
    through = (
        dist.alias("a")
        .join(
            dist.alias("b"),
            F.col("a.dst") == F.col("b.src"),
        )
        .filter(F.col("a.src") != F.col("b.dst"))
        .select(
            F.col("a.src").alias("s"),
            F.col("a.dst").alias("v"),
            F.col("b.dst").alias("t"),
            (F.col("a.dist") + F.col("b.dist")).alias("_dsum"),
        )
        .filter(F.col("s") < F.col("t"))  # unordered pairs once
    )
    hits = (
        through.join(
            dist.select(
                F.col("src").alias("s"),
                F.col("dst").alias("t"),
                F.col("dist").alias("_dst"),
            ),
            ["s", "t"],
        )
        .filter(F.col("_dsum") == F.col("_dst"))
        .select("v", "s", "t")
        .distinct()  # a pair counts once however many midpoints match per v
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .filter(F.col("node").isNotNull())
        .distinct()
    )
    per = hits.groupBy(F.col("v").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    return nodes.join(per, "node", "left").select(
        "node",
        F.coalesce("_c", F.lit(0)).cast("bigint").alias("n_through_pairs"),
    )
