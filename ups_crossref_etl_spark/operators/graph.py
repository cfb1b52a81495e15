"""Distributed connected components (min-label propagation).

The general-purpose graph operator behind author entity resolution
(``plans/entities.py``) and transitive near-duplicate clustering
(``operators/dedup.near_dup_clusters``): given an undirected edge list,
assign every node the minimum node id reachable from it.

Scale shape: each iteration is one shuffle (join edges→labels + min-agg);
iteration count is the graph diameter, which for identity/dup graphs is
tiny (2-4). ``localCheckpoint`` truncates lineage per round — standard
practice for iterative algorithms on Spark (same shape GraphX uses for
its ConnectedComponents). The reference has no graph operator (its author
identity pass is a sequential dict replay,
src/barrazueta_pipeline_etl_crossref.py:317-420); this is the
distributed re-expression.
"""

from __future__ import annotations

import warnings

import pandas as pd  # noqa: F401 — pandas_udf type-hint resolution
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iter: int = 10, strict: bool = False
) -> DataFrame:
    """(src, dst) undirected edge list → (node, component) where component
    is the min node id in the node's connected component. Nodes appearing
    in no edge are absent — union singletons afterwards if needed.

    Converges when no label changes (checked with a limit(1) probe, not a
    full count); ``max_iter`` bounds worst-case pathological chains. If
    the loop exhausts ``max_iter`` with labels still changing, the
    returned components are NOT fully merged — that is raised
    (``strict=True``) or warned (default) rather than silently returned,
    because a downstream dedup would then keep/drop the wrong documents.

    Each round does min-label propagation (one hop along edges) PLUS
    pointer-halving (follow the label's own label — labels are node ids,
    so the label table doubles as a parent-pointer table): propagation
    alone needs ≥ diameter rounds, which long chain-shaped components
    (observed in the semantic near-dup graph: diameter > 12) turn into a
    non-convergence trap; with halving the label chain length roughly
    halves per round, so convergence is O(log diameter) — ``max_iter=10``
    covers diameters into the thousands. Cost: one extra label-keyed
    equi-join per round — the label table is node-sized, far smaller
    than the edge relation the propagation join already touches.
    """
    npart = edges.sparkSession.sparkContext.defaultParallelism
    sym = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition(npart, "src")
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(nodes.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("src", "node")
        )
        hop = nodes.join(neighbor_min, "node", "left").select(
            "node",
            "label",
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("_l1"),
        )
        # pointer-halving: labels are node ids, so (node, _l1) is a
        # parent-pointer table — follow it one step and take the min
        ptr = hop.select(F.col("node").alias("_pn"), F.col("_l1").alias("_pl"))
        updated = (
            hop.join(ptr, hop["_l1"] == ptr["_pn"], "left")
            .select(
                "node",
                "label",
                F.least(F.col("_l1"), F.coalesce("_pl", "_l1")).alias("new_label"),
            )
            # r13: lazy — the change-count aggregate below scans every
            # partition, completing the checkpoint in the same job (the
            # eager checkpoint + limit(1) probe paid two jobs per round;
            # a limit probe must NOT drive a lazy checkpoint, since it
            # can short-circuit before all partitions are stored)
            .localCheckpoint(eager=False)
        )
        changed = (
            updated.agg(
                F.sum((F.col("new_label") != F.col("label")).cast("int"))
            ).collect()[0][0]
            or 0
        )
        nodes = updated.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            converged = True
            break
    if not converged:
        msg = (
            f"connected_components hit max_iter={max_iter} with labels still "
            "changing — component ids are not fully merged; raise max_iter "
            "(need ≥ graph diameter)"
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return nodes.select("node", F.col("label").alias("component"))


def degree_stats(edges: DataFrame) -> DataFrame:
    """Undirected degree per node: ``(node, degree)`` over the
    de-duplicated symmetric closure (parallel edges and direction
    collapse; self-loops count once). One distinct + one groupBy, both
    on node keys."""
    sym = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )
    return sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def _canonical_edges(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set ``(lo, hi)`` with ``lo < hi`` by id:
    self-loops, duplicates, and direction collapse. One distinct."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .distinct()
    )


def _degree_oriented(canon: DataFrame) -> DataFrame:
    """Orient each canonical edge from the endpoint that is SMALLER in
    the total order ``(degree, id)`` to the larger one — the standard
    "compact-forward" orientation (Latapy 2008): out-degree under this
    order is bounded by O(sqrt(m)) for any graph (arboricity bound), so
    wedge generation from two out-edges of one node does Σ out-deg² =
    O(m^1.5) total work with NO d² hub blowup (raw-id orientation
    leaves a low-id hub with all its d neighbors on the out side).

    Input must be canonical ``(lo, hi)``; returns ``(a, b, _db)`` where
    ``a ≺ b`` in (degree, id) order and ``_db`` is b's degree — the
    sort key wedge pairing needs to order the two endpoints without a
    second degree join.
    """
    deg = (
        canon.select(F.col("lo").alias("node"))
        .unionByName(canon.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_d"))
    )
    j = canon.join(
        deg.select(F.col("node").alias("lo"), F.col("_d").alias("_dlo")), "lo"
    ).join(deg.select(F.col("node").alias("hi"), F.col("_d").alias("_dhi")), "hi")
    lo_first = (F.col("_dlo") < F.col("_dhi")) | (
        (F.col("_dlo") == F.col("_dhi")) & (F.col("lo") < F.col("hi"))
    )
    return j.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("a"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("b"),
        F.when(lo_first, F.col("_dhi")).otherwise(F.col("_dlo")).alias("_db"),
    )


def _oriented_triangles(ord_edges: DataFrame) -> DataFrame:
    """All triangles of the degree-oriented edge set, one row each:
    ``(v, p, q)`` where v ≺ p ≺ q in (degree, id) order — generated at
    the MIDDLE corner p as (in-edge v→p) × (out-edge p→q) pairs, closed
    by the oriented edge v→q. The in×out join emits exactly the wedges
    that could close (no post-filter, no double materialization — a
    two-out-edges formulation would emit Σ out-deg² rows and filter
    half away); per-node work is in(p)·out(p), which degree ordering
    bounds at O(d·sqrt(m)) even for hubs. Two equi-joins, never a
    cross product. The oriented edge set is localCheckpointed first: it
    is referenced three times, and without materialization each
    reference would recompute the degree aggregate + double join."""
    ord_edges = ord_edges.select("a", "b").localCheckpoint()
    wedges = ord_edges.select(
        F.col("a").alias("v"), F.col("b").alias("p")
    ).join(
        ord_edges.select(F.col("a").alias("p"), F.col("b").alias("q")), "p"
    )
    return wedges.join(
        ord_edges.select(F.col("a").alias("v"), F.col("b").alias("q")),
        ["v", "q"],
    ).select("v", "p", "q")


def triangle_count_dense(edges: DataFrame, max_nodes: int = 16384) -> DataFrame:
    """Triangle count for DENSE bounded graphs: one row ``(n_triangles)``.

    A near-clique on n nodes has ~n³/6 triangles; any wedge-join
    formulation must materialize and shuffle every one of them (137M
    wedge rows for the 1000-node 91%-dense supplier co-order graph at
    sf0.1 — measured; orientation choice moves the count by <0.1%
    because orientation only helps when degrees are SKEWED). Dense mode
    instead intersects adjacency BITSETS per edge: each node's
    neighborhood is packed into ceil(n/8) bytes, each canonical edge
    (u,v) popcounts ``bits(u) & bits(v)`` — Σ over edges = 3·triangles.
    Work is O(m·n/8) byte-ANDs with NOTHING materialized beyond the
    edge list: 453k edges × 125-byte bitsets ≈ 57 MB streamed through
    one Arrow batch pipeline vs 137M shuffled wedge rows.

    Contract: requires ``n_nodes ≤ max_nodes`` (raises otherwise) — the
    bitset table is n·ceil(n/8) bytes (16384 nodes → 32 MB, broadcast-
    joinable); the node-id remap is an n-row driver list, same bounded
    model state as k-means centroids. For unbounded/sparse graphs use
    :func:`triangle_count` (degree-oriented wedge joins).

    Python stays Arrow-vectorized: one pandas_udf packs neighbor lists
    to bitset bytes, one mapInPandas popcounts per-edge ANDs via a
    256-entry LUT — both map-only, no row-at-a-time udf().
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    canon = _canonical_edges(edges).localCheckpoint()
    node_ids = sorted(
        r[0]
        for r in canon.select(F.col("lo").alias("n"))
        .unionByName(canon.select(F.col("hi").alias("n")))
        .distinct()
        .collect()
    )
    n = len(node_ids)
    if n > max_nodes:
        raise ValueError(
            f"triangle_count_dense: {n} nodes exceeds max_nodes={max_nodes} "
            "— use the sparse degree-oriented triangle_count instead"
        )
    n_bytes = (n + 7) // 8
    spark = canon.sparkSession
    idx = F.broadcast(
        spark.createDataFrame(
            [(v, i) for i, v in enumerate(node_ids)], ["_nid", "_nix"]
        )
    )
    ei = (
        canon.join(idx.select(F.col("_nid").alias("lo"), F.col("_nix").alias("ui")), "lo")
        .join(idx.select(F.col("_nid").alias("hi"), F.col("_nix").alias("vi")), "hi")
        .select("ui", "vi")
    )
    und = ei.select(F.col("ui").alias("node"), F.col("vi").alias("nbr")).unionByName(
        ei.select(F.col("vi").alias("node"), F.col("ui").alias("nbr"))
    )

    @pandas_udf(BinaryType())
    def pack_bits(nbrs: pd.Series) -> pd.Series:
        out = []
        for arr in nbrs:
            b = np.zeros(n_bytes, dtype=np.uint8)
            a = np.asarray(arr, dtype=np.int64)
            np.bitwise_or.at(b, a >> 3, (1 << (a & 7)).astype(np.uint8))
            out.append(b.tobytes())
        return pd.Series(out)

    bits = F.broadcast(
        und.groupBy("node")
        .agg(F.collect_list("nbr").alias("_nbrs"))
        .select("node", pack_bits("_nbrs").alias("_bits"))
    )
    pairs = ei.join(
        bits.select(F.col("node").alias("ui"), F.col("_bits").alias("_bu")), "ui"
    ).join(bits.select(F.col("node").alias("vi"), F.col("_bits").alias("_bv")), "vi")

    lut = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)

    def popcount_partial(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.stack([np.frombuffer(x, dtype=np.uint8) for x in pdf["_bu"]])
            b = np.stack([np.frombuffer(x, dtype=np.uint8) for x in pdf["_bv"]])
            yield pd.DataFrame({"_common": [int(lut[a & b].sum())]})

    partials = pairs.select("_bu", "_bv").mapInPandas(
        popcount_partial, "_common bigint"
    )
    return partials.agg(
        (F.coalesce(F.sum("_common"), F.lit(0)) / 3).cast("bigint").alias("n_triangles")
    )


def triangle_count(edges: DataFrame, dense_max_nodes: int | None = None) -> DataFrame:
    """Global triangle count: one row ``(n_triangles)``.

    Compact-forward counting on the DEGREE-ORIENTED edge set: edges are
    canonicalized, then oriented from the endpoint smaller in
    ``(degree, id)`` order to the larger (:func:`_degree_oriented`);
    each triangle is generated exactly once as an (in-edge, out-edge)
    wedge at its middle corner closed by the oriented third edge.

    Scale shape: one degree aggregate + two equi-joins on node keys —
    never a cross product. Degree orientation bounds per-node wedge
    fanout (out-degree ≤ O(sqrt(m)), Latapy 2008), where raw-id
    orientation leaves a low-id hub producing d² wedges — the
    refinement that keeps hub-heavy co-occurrence graphs countable at
    100 TB.

    ``dense_max_nodes``: when set, a cheap node-count preflight
    dispatches graphs with ≤ that many nodes to
    :func:`triangle_count_dense` (bitset intersection — orders of
    magnitude less materialization on near-cliques, where wedge counts
    are orientation-invariant); larger graphs fall through to the
    sparse wedge join. Both paths are exact, so the dispatch never
    changes the result.
    """
    if dense_max_nodes is not None:
        canon = _canonical_edges(edges)
        n = (
            canon.select(F.col("lo").alias("n"))
            .unionByName(canon.select(F.col("hi").alias("n")))
            .distinct()
            .count()
        )
        if n <= dense_max_nodes:
            return triangle_count_dense(edges, max_nodes=dense_max_nodes)
    ord_edges = _degree_oriented(_canonical_edges(edges))
    return _oriented_triangles(ord_edges).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    max_iter: int = 50,
    strict: bool = True,
    broadcast_max_nodes: int = 10_000_000,
    peels_per_round: int = 2,
) -> DataFrame:
    """k-core decomposition membership: the maximal subgraph where every
    node has degree ≥ ``k`` within the subgraph. Returns
    ``(node, core_degree)`` for surviving nodes — the classic
    peel: repeatedly delete nodes of degree < k (deleting a node lowers
    its neighbours' degrees, which can push THEM under k) until a
    fixpoint. The standard corpus-graph quality/centrality signal
    (dense-core extraction over citation / co-occurrence / near-dup
    graphs) and a spam-farm detector.

    Scale shape: each round is one degree aggregate (explode of both
    endpoints of the surviving CANONICAL lo<hi edges — the symmetric 2×
    table is never materialized — map-side combined) plus two
    endpoint-keyed semi-joins; nothing pairwise, no window. Rounds needed = peel depth, which
    is small for real graphs (a node sequence each unlocking the next is
    the worst case); ``localCheckpoint`` truncates lineage per round.
    The peel step is IDEMPOTENT at the fixpoint (applying it to a
    converged subgraph changes nothing), which is what lets the SQL
    oracle over-unroll a fixed number of rounds safely.

    Convergence is verified (limit(1) probe); exhausting ``max_iter``
    with deletions still occurring raises (``strict=True``, default —
    a partial peel over-reports the core) or warns.

    Fixed-cost shape (r12 verdict #5, the cox/stream lesson — peel
    DEPTH costs a Catalyst+scheduling floor per materialized round
    regardless of data): (a) when the node count is bounded
    (``broadcast_max_nodes``; counted once from the input) the
    surviving-node set is BROADCAST into both semi-joins, so each peel
    is one degree aggregate + two map-side joins — the edge table never
    reshuffles per peel; (b) ``peels_per_round`` peels share one
    checkpoint+count job pair (the peel step is idempotent at the
    fixpoint, so over-peeling is safe by the same argument that lets
    the SQL oracle over-unroll — results are IDENTICAL, only the
    number of materialization floors changes).
    """
    import warnings

    # peel on the CANONICAL (lo < hi, distinct) edge form — degrees come
    # from an explode of both endpoints, so the symmetric 2x edge table
    # is never materialized and every per-round checkpoint writes half
    # the bytes (r13: the peel loop is materialization-bound)
    canon = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .distinct()
        .localCheckpoint()
    )
    # node count (one cheap aggregate on the checkpointed edges) gates
    # the broadcast of the per-peel survivor set; the set only shrinks,
    # so the input count is a sound upper bound for every round
    n_nodes = canon.select(
        F.explode(F.array("lo", "hi")).alias("node")
    ).select(F.count_distinct("node")).collect()[0][0]
    bcast = n_nodes <= broadcast_max_nodes

    def _degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.explode(F.array("lo", "hi")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("_deg"))
        )

    def _peel(e: DataFrame) -> DataFrame:
        keep = _degrees(e).filter(F.col("_deg") >= k).select("node")
        if bcast:
            keep = F.broadcast(keep)
        return (
            e.join(keep.withColumnRenamed("node", "lo"), "lo", "left_semi")
            .join(keep.withColumnRenamed("node", "hi"), "hi", "left_semi")
            .select("lo", "hi")
        )

    converged = False
    prev_edges = canon.count()
    for _ in range(max_iter):
        stepped = canon
        for _p in range(max(1, int(peels_per_round))):
            stepped = _peel(stepped)
        # r13: LAZY checkpoint — the convergence count() computes every
        # partition, which completes the checkpoint in the SAME job; an
        # eager checkpoint paid a separate materialization job per round
        pruned = stepped.localCheckpoint(eager=False)
        # the edge set only ever SHRINKS, so an unchanged count is a
        # fixpoint — one cheap count on the just-checkpointed edges
        # instead of an anti-join probe (halves the actions per round)
        cur_edges = pruned.count()
        canon = pruned
        if cur_edges == prev_edges:
            converged = True
            break
        prev_edges = cur_edges
    if not converged:
        msg = (
            f"kcore hit max_iter={max_iter} before the peel reached a "
            "fixpoint — the returned core over-approximates; raise max_iter"
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return _degrees(canon).select(
        "node", F.col("_deg").cast("bigint").alias("core_degree")
    )


def label_propagation(
    edges: DataFrame, rounds: int = 3, broadcast_max_nodes: int = 10_000_000
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007), made deterministic: every node starts as its own label; each
    round ALL nodes simultaneously adopt the label most frequent among
    their neighbors, ties broken by the SMALLEST label. Asynchronous LPA
    (the textbook version) is update-order-dependent — useless under a
    distributed scheduler; the synchronous variant with a total
    tie-break is a pure function of (edges, rounds), which is what makes
    it oracle-checkable and run-to-run stable on a cluster.

    Returns ``(node, label)`` after ``rounds`` rounds over the
    symmetrized edge set. Fixed small ``rounds`` is the production
    setting too: LPA's useful signal arrives in the first few rounds,
    and synchronous LPA on bipartite-ish structures can oscillate
    rather than converge — so a fixpoint loop is the WRONG contract
    (unlike kcore's monotone peel).

    Scale shape per round: one src-keyed equi-join of (node, label)
    onto edges, one (dst, label) count aggregate (map-side combinable),
    one per-dst argmax via ``max_by``-style struct max — aggregates,
    never a window; all three cluster on node keys. ``localCheckpoint``
    truncates lineage per round. The node set is static across rounds,
    so it is counted ONCE: when it fits under
    ``broadcast_max_nodes`` the per-round label table is broadcast
    (each round becomes map-only join + aggregate — measured 2x faster
    at sf0.1); above it the join shuffles, which is the only
    scale-correct choice for billion-node graphs.
    """
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node").cast("long"))
        .localCheckpoint()
    )
    small = labels.count() <= broadcast_max_nodes
    for _ in range(rounds):
        lab = labels.withColumnRenamed("node", "src")
        if small:
            lab = F.broadcast(lab)
        freq = (
            sym.join(lab, "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        labels = (
            freq.groupBy("node")
            .agg(
                F.max(F.struct(F.col("n"), (-F.col("label")).alias("_neg"))).alias(
                    "_b"
                )
            )
            .select("node", (-F.col("_b._neg")).cast("long").alias("label"))
            # r13 note: dropping this per-round checkpoint to unroll the
            # fixed 3 rounds into one AQE job (the pagerank shallow-run
            # lesson) was MEASURED SLOWER here (7.4 vs 5.6 s noop at
            # sf0.1) — the nested per-round label broadcasts serialize
            # construction without the checkpoint. Kept as-is.
            .localCheckpoint()
        )
    return labels


def k_hop_reach(edges: DataFrame, hops: int = 2) -> DataFrame:
    """EXACT k-hop neighborhood size per node: ``(node, n_reach)`` where
    ``n_reach`` counts distinct nodes reachable within ≤ ``hops``
    undirected hops (self excluded). The ground-truth twin of
    ``hyper_anf`` below — exact reach materializes every (node, reached)
    pair, so its output is Σ|N_h(v)| rows: fine for bounded/sampled
    graphs and contract queries, quadratic-prone on dense 100 TB graphs,
    which is precisely why the sketch variant exists.

    Each extension round is one node-keyed equi-join (frontier.dst =
    edges.src) plus a distinct — no windows, no cartesian; lineage is
    truncated per round.
    """
    sym = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    reach = sym
    for _ in range(hops - 1):
        ext = (
            reach.join(
                sym.select(F.col("src").alias("_m"), F.col("dst").alias("_d")),
                reach["dst"] == F.col("_m"),
            )
            .select("src", F.col("_d").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        reach = reach.unionByName(ext).distinct().localCheckpoint()
    return reach.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("n_reach")
    ).select(F.col("src").alias("node"), "n_reach")


def hyper_anf(edges: DataFrame, hops: int = 2, lg_k: int = 12) -> DataFrame:
    """HyperANF (Boldi–Rosa–Vigna): the approximate neighborhood function
    per node — ``(node, est_reach)`` estimating |{u : dist(v,u) ≤ hops}|
    INCLUDING v itself — via per-node HLL sketches merged along edges.
    The scale path for reach/centrality profiling: where ``k_hop_reach``
    materializes Σ|N_h(v)| pairs (quadratic-prone), this keeps ONE
    fixed-size sketch per node and each round is

        sketch_{r+1}(v) = sketch_r(v) ∪ ⋃_{u ∈ N(v)} sketch_r(u)

    — a node-keyed join + one ``hll_union_agg`` groupBy, shuffling
    node-count × KB sketches regardless of how dense the reachable sets
    get. At low cardinality the Datasketches HLL stays in exact (sparse)
    mode, so small-graph estimates equal exact counts — the property the
    ``q_graph_hyperanf_bound`` contract pins; at scale error is
    ~1.04/√2^lg_k.
    """
    sym = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        sym.select(F.col("src").alias("node")).distinct()
    )
    sketches = nodes.groupBy("node").agg(
        F.hll_sketch_agg("node", F.lit(lg_k)).alias("sk")
    ).localCheckpoint()
    for _ in range(hops):
        nbr = (
            sym.join(
                sketches.select(F.col("node").alias("dst"), F.col("sk").alias("_nsk")),
                "dst",
            )
            .groupBy("src")
            .agg(F.hll_union_agg("_nsk").alias("_usk"))
            .withColumnRenamed("src", "node")
        )
        sketches = (
            sketches.join(nbr, "node", "left")
            .select(
                "node",
                F.when(
                    F.col("_usk").isNull(), F.col("sk")
                ).otherwise(F.hll_union("sk", "_usk")).alias("sk"),
            )
            .localCheckpoint()
        )
    return sketches.select(
        "node",
        F.hll_sketch_estimate("sk").cast("long").alias("est_reach"),
    )


def clustering_coefficient(
    edges: DataFrame, dense_max_nodes: int | None = None
) -> DataFrame:
    """Global clustering coefficient summary, one row: ``(n_nodes,
    n_edges, n_triangles, n_wedges, global_cc)`` with global_cc =
    3*triangles / wedges (the transitivity ratio).

    The one-number cohesion diagnostic read before trusting
    community-detection output: random graphs sit near deg/n, social/
    co-occurrence graphs sit orders of magnitude higher. Reuses
    :func:`triangle_count`'s oriented two-join (never a cross product);
    wedges come from ONE degree aggregate over the canonical undirected
    edge set — sum of deg*(deg-1)/2 in exact integers, so the gate has
    a single rounded division. Triangle side inherits the degree-
    ordered compact-forward orientation from :func:`triangle_count`
    (Σ out-deg² work, no d² hub wedge sets); pass ``dense_max_nodes``
    to dispatch bounded near-cliques to the bitset-intersection dense
    path (:func:`triangle_count_dense`) — on the 1000-node 91%-dense
    supplier co-order graph that swaps 137M shuffled wedge rows for a
    57 MB streamed AND+popcount.

    Scale contract: this UNCAPPED path measured slope 1.65 at 10× on
    the dense part co-order graph (SCALE_PROBE.json) — for dense
    co-occurrence graphs too large for ``dense_max_nodes`` use
    :func:`transitivity_summary` with ``max_center_degree``, whose
    capped+exact+cap-agreement gate triple pins the truncation cost.
    """
    ori = _canonical_edges(edges).localCheckpoint()
    tri = triangle_count(
        ori.select(F.col("lo").alias("src"), F.col("hi").alias("dst")),
        dense_max_nodes=dense_max_nodes,
    )
    deg = (
        ori.select(F.col("lo").alias("node"))
        .unionByName(ori.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_d"))
    )
    summary = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        (F.sum(F.col("_d") * (F.col("_d") - 1)) / 2).cast("bigint").alias("n_wedges"),
    )
    n_edges = ori.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        summary.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            (
                F.round(
                    F.when(
                        F.col("n_wedges") > 0,
                        3.0
                        * F.col("n_triangles").cast("double")
                        / F.col("n_wedges").cast("double"),
                    ).otherwise(F.lit(0.0)),
                    6,
                )
                + 0.0
            ).alias("global_cc"),
        )
    )


def transitivity_summary(
    edges: DataFrame, max_center_degree: int | None = None
) -> DataFrame:
    """Transitivity as closed-wedges / wedges with CAPPABLE wedge
    centers — the scale path for dense co-occurrence graphs where
    :func:`clustering_coefficient`'s uncapped wedge join shuffles
    O(Σ deg²) rows (measured 1.65 slope at 10× on the part co-order
    graph, SCALE_PROBE.json). One row ``(n_centers, n_wedges,
    n_closed_wedges, transitivity)``.

    A wedge is an (a, v, b) path counted at its CENTER v; it is closed
    iff (a, b) is an edge. Uncapped, every triangle closes exactly
    three wedges (one per vertex), so ``transitivity ==
    clustering_coefficient().global_cc`` — that identity is what lets
    the bounded-subgraph exact gate pin the capped operational path.
    With ``max_center_degree`` set, wedges AND closed wedges restrict
    to centers with ``deg <= cap``: the hub centers that dominate
    Σ deg² (quadratic fanout each) are dropped symmetrically from
    numerator and denominator, so the ratio remains an unbiased
    transitivity-over-kept-centers (the same truncation contract as
    :func:`adamic_adar` / :func:`neighbor_jaccard`; accuracy cost is
    MEASURED by the cap-agreement gate, not asserted).

    Plan: degree aggregate → capped centers (deterministic function of
    exact degrees, hash-exact) → wedge self-join on the center (work =
    Σ deg² over KEPT centers) → left-semi against the canonical edge
    set → two global counts. No cross product, no per-row window.
    """
    ori = _canonical_edges(edges).localCheckpoint()
    und = ori.select(F.col("lo").alias("node"), F.col("hi").alias("nbr")).unionByName(
        ori.select(F.col("hi").alias("node"), F.col("lo").alias("nbr"))
    )
    deg = und.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("_d"))
    centers = deg.filter(F.col("_d") > 1)
    if max_center_degree is not None:
        centers = centers.filter(F.col("_d") <= max_center_degree)
    wedge_agg = centers.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_centers"),
        F.coalesce(F.sum(F.expr("_d * (_d - 1) div 2")), F.lit(0))
        .cast("bigint")
        .alias("n_wedges"),
    )
    w = und.join(centers.select("node"), "node")
    pairs = (
        w.alias("a")
        .join(w.alias("b"), "node")
        .filter(F.col("a.nbr") < F.col("b.nbr"))
        .select(F.col("a.nbr").alias("_u"), F.col("b.nbr").alias("_v"))
    )
    closed = pairs.join(
        ori,
        (pairs["_u"] == ori["lo"]) & (pairs["_v"] == ori["hi"]),
        "left_semi",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_closed_wedges"))
    return wedge_agg.crossJoin(F.broadcast(closed)).select(
        "n_centers",
        "n_wedges",
        "n_closed_wedges",
        (
            F.round(
                F.when(
                    F.col("n_wedges") > 0,
                    F.col("n_closed_wedges").cast("double")
                    / F.col("n_wedges").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            )
            + 0.0
        ).alias("transitivity"),
    )


def rich_club_coefficients(
    edges: DataFrame, thresholds: list[int]
) -> DataFrame:
    """Rich-club coefficient φ(k) (Zhou & Mondragón 2004) at each
    degree threshold: ``φ(k) = 2·E_{>k} / (N_{>k}·(N_{>k}−1))`` — the
    edge density among nodes of degree > k. One row per threshold:
    ``(k, n_rich, n_rich_edges, phi)``. Rising φ(k) means hubs form a
    densely wired core (the "rich club") — with :func:`degree_
    assortativity` this is the second hub-mixing diagnostic read before
    trusting degree-capped truncations: a strong club means the capped
    operators discard a structurally distinct core, so the
    cap-agreement gates deserve a tighter bound. (Raw φ, not the
    null-model-normalized ρ — normalization needs degree-preserving
    rewiring, a different machine.)

    Shape: degree aggregate → one join of both endpoint degrees onto
    the canonical edge list → ONE conditional aggregate per table
    (every threshold is a ``sum(when(...))`` column in the same pass —
    |thresholds| never multiplies the scans) → explode the 1-row
    result to per-k rows. All counts exact BIGINTs; φ is one rounded
    division.
    """
    if not thresholds:
        raise ValueError("rich_club_coefficients: thresholds required")
    ks = sorted(set(int(k) for k in thresholds))
    ori = _canonical_edges(edges).localCheckpoint()
    und = ori.select(F.col("lo").alias("node"), F.col("hi").alias("nbr")).unionByName(
        ori.select(F.col("hi").alias("node"), F.col("lo").alias("nbr"))
    )
    deg = und.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("_d"))
    nodes = deg.agg(
        *[
            F.sum(F.when(F.col("_d") > k, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_n{k}")
            for k in ks
        ]
    )
    ed = ori.join(
        deg.select(F.col("node").alias("lo"), F.col("_d").alias("_dx")), "lo"
    ).join(
        deg.select(F.col("node").alias("hi"), F.col("_d").alias("_dy")), "hi"
    )
    redges = ed.agg(
        *[
            F.sum(
                F.when((F.col("_dx") > k) & (F.col("_dy") > k), 1).otherwise(0)
            )
            .cast("bigint")
            .alias(f"_e{k}")
            for k in ks
        ]
    )
    wide = nodes.crossJoin(F.broadcast(redges))
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("bigint").alias("k"),
                        F.col(f"_n{k}").alias("n_rich"),
                        F.col(f"_e{k}").alias("n_rich_edges"),
                    )
                    for k in ks
                ]
            )
        ).alias("_r")
    )
    n = F.col("_r.n_rich").cast("double")
    return stacked.select(
        F.col("_r.k").alias("k"),
        F.col("_r.n_rich").alias("n_rich"),
        F.col("_r.n_rich_edges").alias("n_rich_edges"),
        (
            F.round(
                F.when(
                    F.col("_r.n_rich") > 1,
                    2.0
                    * F.col("_r.n_rich_edges").cast("double")
                    / (n * (n - 1.0)),
                ),
                6,
            )
            + 0.0
        ).alias("phi"),
    ).orderBy("k")


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of the degrees at the two ends of an edge, over the
    undirected edge set counted in BOTH directions. ONE row
    ``(n_edges, mean_degree, assortativity)`` — positive means hubs
    attach to hubs (social graphs), negative means hubs attach to
    leaves (the disassortative signature of citation/biological/
    co-occurrence graphs), and it is the one-number check run before
    trusting degree-capped truncations (:func:`adamic_adar`,
    :func:`transitivity_summary`): a strongly assortative graph
    concentrates wedge mass in hub-hub cores, so capping costs more
    there than the cap-agreement subgraph may show.

    Shape: one degree aggregate (node-keyed), two broadcast-size joins
    of the degree table back onto the edge list, one global moment
    aggregate — degrees are exact BIGINTs so every moment sum
    (Σxy, Σx, Σx²) is exact integer arithmetic on both engines; only
    the final correlation is a double. No window, no self-join.
    """
    ori = _canonical_edges(edges).localCheckpoint()
    und = ori.select(F.col("lo").alias("node"), F.col("hi").alias("nbr")).unionByName(
        ori.select(F.col("hi").alias("node"), F.col("lo").alias("nbr"))
    )
    deg = und.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("_d"))
    paired = (
        und.join(deg, "node")
        .withColumnRenamed("_d", "_dx")
        .join(deg.select(F.col("node").alias("nbr"), F.col("_d").alias("_dy")), "nbr")
    )
    agg = paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("_m"),
        F.sum("_dx").cast("bigint").alias("_sx"),
        F.sum(F.col("_dx") * F.col("_dy")).cast("bigint").alias("_sxy"),
        F.sum(F.col("_dx") * F.col("_dx")).cast("bigint").alias("_sxx"),
    )
    # both directions counted, so Σx = Σy and Σx² = Σy² — one moment set
    m = F.col("_m").cast("double")
    sx = F.col("_sx").cast("double")
    cov = F.col("_sxy").cast("double") - sx * sx / m
    var = F.col("_sxx").cast("double") - sx * sx / m
    return agg.select(
        F.expr("_m div 2").cast("bigint").alias("n_edges"),
        (F.round(sx / m, 6) + 0.0).alias("mean_degree"),
        (
            F.round(F.when(var > 0, cov / var), 6) + 0.0
        ).alias("assortativity"),
    )


def adamic_adar(
    edges: DataFrame,
    top_n: int = 50,
    max_degree: int | None = None,
) -> DataFrame:
    """Link prediction over an undirected graph: score every NON-edge
    pair that shares at least one neighbor by the Adamic–Adar index
    ``sum over common neighbors v of 1 / ln(deg(v))`` (Adamic & Adar
    2003) — the classic "which co-occurrence is about to happen"
    ranking (recommender candidates, entity-merge suggestions, missing
    citation checks). Returns the ``top_n`` candidate pairs:
    ``(u, v, common_neighbors, aa_score)`` ordered by (score DESC, u,
    v) with a full tiebreak.

    Plan shape: canonicalize edges → degree aggregate (node-keyed) →
    wedge self-join on the CENTER node (every pair of neighbors of v is
    a candidate, weighted by v's degree) → pair-keyed sum → anti-join
    against the real edge set → TakeOrdered top-n. The wedge join is
    the same oriented-neighbor shape as :func:`triangle_count` — work
    is ``sum deg(v)²``, never a cross product.

    Scale: ``sum deg(v)²`` is dominated by hub nodes, and hubs are
    exactly the neighbors Adamic–Adar down-weights (1/ln d → 0), so
    ``max_degree`` drops centers above a degree cap BEFORE the wedge
    join — the standard truncation (it bounds per-center fanout while
    discarding only the near-zero-weight contributions). At 100 TB run
    with a cap (e.g. 10_000); the exact gate query runs uncapped on a
    bounded subgraph.

    Determinism: per-center weight is quantized to integer nanos
    ``round(1e9 / ln(deg))`` BEFORE the pair-keyed sum, so the score
    aggregation is exact integer arithmetic (order-independent) and the
    oracle can reproduce it bit-for-bit; ``aa_score`` = nanos / 1e9
    rounded to 6 dp.
    """
    ori = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    und = ori.select(F.col("lo").alias("node"), F.col("hi").alias("nbr")).unionByName(
        ori.select(F.col("hi").alias("node"), F.col("lo").alias("nbr"))
    )
    deg = und.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("_d"))
    centers = deg.filter(F.col("_d") > 1)
    if max_degree is not None:
        centers = centers.filter(F.col("_d") <= max_degree)
    w_nanos = F.round(1e9 / F.log(F.col("_d").cast("double"))).cast("bigint")
    # r13: materialized once — feeds both sides of the wedge self-join
    # (same duplicated-subtree fix as codegree_pairs; values unchanged)
    weighted = und.join(centers, "node").select(
        "node", "nbr", w_nanos.alias("_w")
    ).localCheckpoint(eager=False)
    pairs = (
        weighted.alias("a")
        .join(weighted.alias("b"), "node")
        .filter(F.col("a.nbr") < F.col("b.nbr"))
        .select(
            F.col("a.nbr").alias("u"),
            F.col("b.nbr").alias("v"),
            F.col("a._w").alias("_w"),
        )
    )
    scored = pairs.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
        F.sum("_w").cast("bigint").alias("_nanos"),
    )
    non_edges = scored.join(
        ori,
        (scored["u"] == ori["lo"]) & (scored["v"] == ori["hi"]),
        "left_anti",
    )
    return (
        non_edges.orderBy(F.col("_nanos").desc(), "u", "v")
        .limit(top_n)
        .select(
            "u",
            "v",
            "common_neighbors",
            (F.round(F.col("_nanos") / 1e9, 6) + 0.0).alias("aa_score"),
        )
    )


def neighbor_jaccard(
    edges: DataFrame,
    top_n: int = 50,
    max_degree: int | None = None,
) -> DataFrame:
    """Link prediction by neighborhood Jaccard: score every NON-edge
    pair sharing at least one neighbor by ``|N(u) ∩ N(v)| /
    |N(u) ∪ N(v)|`` — the unweighted sibling of :func:`adamic_adar`
    (Liben-Nowell & Kleinberg 2003's baseline), preferring pairs whose
    neighborhoods OVERLAP proportionally rather than pairs sharing
    low-degree hubs. Returns the ``top_n`` pairs ``(u, v,
    common_neighbors, union_size, jaccard)`` ordered by (jaccard DESC,
    u, v).

    Plan shape: identical wedge skeleton to :func:`adamic_adar` —
    degree aggregate, center-keyed wedge self-join (work = sum deg²),
    pair-keyed count, two broadcastable degree lookups for the union
    size, anti-join vs the real edges, TakeOrdered. ``max_degree``
    drops hub CENTERS before the wedge join (the capped operational
    path for unbounded graphs; the exact gate runs uncapped on a
    bounded subgraph — same contract as adamic_adar).

    Determinism: jaccard is quantized to integer nanos
    ``round(1e9 * inter / union)`` for the ordering, so the top-n cut
    is exact integer comparison; the reported double is nanos / 1e9.
    """
    ori = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    und = ori.select(F.col("lo").alias("node"), F.col("hi").alias("nbr")).unionByName(
        ori.select(F.col("hi").alias("node"), F.col("lo").alias("nbr"))
    )
    deg = und.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("_d"))
    centers = deg.filter(F.col("_d") > 1)
    if max_degree is not None:
        centers = centers.filter(F.col("_d") <= max_degree)
    # r13: materialized once — feeds both sides of the wedge self-join
    # (same duplicated-subtree fix as codegree_pairs; values unchanged)
    wedge_in = und.join(centers.select("node"), "node").localCheckpoint(eager=False)
    pairs = (
        wedge_in.alias("a")
        .join(wedge_in.alias("b"), "node")
        .filter(F.col("a.nbr") < F.col("b.nbr"))
        .select(F.col("a.nbr").alias("u"), F.col("b.nbr").alias("v"))
    )
    inter = pairs.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("common_neighbors")
    )
    du = deg.select(F.col("node").alias("u"), F.col("_d").alias("_du"))
    dv = deg.select(F.col("node").alias("v"), F.col("_d").alias("_dv"))
    scored = (
        inter.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common_neighbors",
            (F.col("_du") + F.col("_dv") - F.col("common_neighbors"))
            .cast("bigint")
            .alias("union_size"),
        )
        .withColumn(
            "_nanos",
            F.round(
                F.lit(1e9)
                * F.col("common_neighbors")
                / F.col("union_size")
            ).cast("bigint"),
        )
    )
    non_edges = scored.join(
        ori,
        (scored["u"] == ori["lo"]) & (scored["v"] == ori["hi"]),
        "left_anti",
    )
    return (
        non_edges.orderBy(F.col("_nanos").desc(), "u", "v")
        .limit(top_n)
        .select(
            "u",
            "v",
            "common_neighbors",
            "union_size",
            (F.round(F.col("_nanos") / 1e9, 6) + 0.0).alias("jaccard"),
        )
    )


def modularity(edges: DataFrame, assign: DataFrame) -> DataFrame:
    """Newman modularity ``Q`` of a node partition over an undirected
    graph: ``Q = sum over communities c of (e_c/m - (d_c/(2m))^2)``
    with ``m`` = edge count, ``e_c`` = edges with both endpoints in
    ``c``, ``d_c`` = total degree of ``c`` (Newman & Girvan 2004).
    The standard "is this clustering better than random?" audit for
    the output of :func:`label_propagation` / louvain-style passes —
    or for any EXTERNAL partition (domain, nation, topic) you suspect
    explains the graph's wiring.

    ``assign`` is ``(node, community)``; unassigned endpoints drop the
    edge from ``e_c`` but keep degree mass out of every community
    (strict: both tables are inner-joined, so partial assignments
    compute modularity of the ASSIGNED subgraph — pass a total
    assignment for the textbook number).

    Returns ONE row: ``(n_communities, n_edges, modularity)``.

    Plan shape: canonical-dedup the edges (one shuffle), two
    node-keyed joins against the assignment (broadcastable when the
    assignment is a dimension), then two community-keyed aggregates
    whose outputs are community-count-sized. ``e_c``/``d_c``/``m``
    stay exact BIGINTs; ``Q`` is a one-shot double over integers, so
    the result is bit-reproducible cross-engine.
    """
    a = assign.select(
        F.col(assign.columns[0]).alias("_n"),
        F.col(assign.columns[1]).alias("_c"),
    ).distinct()
    ori = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .distinct()
    )
    # the labeled edge list feeds m / intra / degree — checkpoint so the
    # (possibly expensive) edge construction and joins run once
    lab = (
        ori.join(a.withColumnRenamed("_n", "lo").withColumnRenamed("_c", "_cl"), "lo")
        .join(a.withColumnRenamed("_n", "hi").withColumnRenamed("_c", "_ch"), "hi")
        .select("_cl", "_ch")
        .localCheckpoint()
    )
    m = lab.count()
    if m == 0:
        return ori.sparkSession.range(1).select(
            F.lit(0).cast("bigint").alias("n_communities"),
            F.lit(0).cast("bigint").alias("n_edges"),
            F.lit(0.0).alias("modularity"),
        )
    intra = lab.filter(F.col("_cl") == F.col("_ch")).groupBy(
        F.col("_cl").alias("_c")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_ec"))
    deg = (
        lab.select(F.col("_cl").alias("_c"))
        .unionByName(lab.select(F.col("_ch").alias("_c")))
        .groupBy("_c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_dc"))
    )
    per_c = deg.join(intra, "_c", "left").select(
        "_c",
        F.coalesce("_ec", F.lit(0)).alias("_ec"),
        "_dc",
    )
    q = (
        F.sum(F.col("_ec").cast("double")) / F.lit(float(m))
        - F.sum(F.col("_dc").cast("double") * F.col("_dc"))
        / F.lit(4.0 * m * m)
    )
    return per_c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_communities"),
        F.lit(m).cast("bigint").alias("n_edges"),
        (F.round(q, 6) + 0.0).alias("modularity"),
    )


def transitive_closure(
    edges: DataFrame, max_iter: int = 20, strict: bool = True
) -> DataFrame:
    """Reachability closure of a directed graph — all pairs ``(src,
    dst)`` with a directed path (length >= 1) — by PATH DOUBLING:
    each round self-joins the current closure on the midpoint node,
    doubling the maximum covered path length, so rounds =
    ceil(log2(longest shortest-path)) instead of the semi-naive
    one-hop-per-round (a 60-node cycle closes in 6 rounds, not 59).
    The recursive-CTE primitive (org charts, dependency graphs, SCC
    support) that Spark SQL lacks natively.

    Closure size is O(n^2) worst case — this is a BOUNDED-subgraph
    operator by contract (run it on the condensed / filtered graph,
    not a raw 100 TB edge list; the gate uses a bounded functional
    graph). ``strict=True`` raises if ``max_iter`` rounds don't reach
    the fixpoint — silently truncated reachability is a wrong answer,
    not an approximation. Fixpoint detection compares exact pair
    counts between rounds (the closure only grows, so equal counts
    mean converged).
    """
    e = (
        edges.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .select("src", "dst")
        .distinct()
        .localCheckpoint()
    )
    closure = e
    n_prev = closure.count()
    for i in range(max_iter):
        # fresh column names each round: the two join sides share
        # attribute lineage, and a USING-style self-join on colliding
        # ids trips Spark's resolver ("key not found: src#N")
        grown = (
            closure.alias("a")
            .join(
                closure.alias("b"), F.col("a.dst") == F.col("b.src")
            )
            .select(
                F.col("a.src").alias("_gs"), F.col("b.dst").alias("_gd")
            )
            .unionByName(
                closure.select(
                    F.col("src").alias("_gs"), F.col("dst").alias("_gd")
                )
            )
            .distinct()
            .select(F.col("_gs").alias("src"), F.col("_gd").alias("dst"))
            # r13: lazy — the count below materializes the checkpoint in
            # the same job (was one extra job per round)
            .localCheckpoint(eager=False)
        )
        n_now = grown.count()
        if n_now == n_prev:
            return closure
        closure, n_prev = grown, n_now
    if strict:
        raise RuntimeError(
            f"transitive_closure: no fixpoint after {max_iter} rounds"
        )
    return closure


def strongly_connected_components(
    edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Strongly connected components of a directed graph: ``(node,
    scc_id)`` with ``scc_id`` = the minimum node id in the component —
    u and v share a component iff each reaches the other. Built on
    :func:`transitive_closure` (same bounded-subgraph contract): the
    mutual-reach pair table is closure ∩ closureᵀ, and each node's id
    is the min over its mutual set and itself.

    Weaker labels (min-forward + min-backward reachable id) are NOT
    sufficient — e.g. edges {2→1, 3→1, 2→3} give nodes 2 and 3
    identical (F, B) pairs in different components — which is why this
    pays for the closure instead.
    """
    e = (
        edges.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .select("src", "dst")
        .distinct()
    )
    clo = transitive_closure(e, max_iter=max_iter).localCheckpoint()
    rev = clo.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    mutual = clo.join(rev, ["src", "dst"], "left_semi")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    best = mutual.groupBy(F.col("src").alias("node")).agg(
        F.min("dst").alias("_m")
    )
    return nodes.join(best, "node", "left").select(
        "node",
        F.least(F.col("node"), F.coalesce("_m", F.col("node"))).alias(
            "scc_id"
        ),
    )


def spread_labels(
    edges: DataFrame,
    seeds: DataFrame,
    max_iter: int = 15,
    strict: bool = True,
) -> DataFrame:
    """Semi-supervised label spreading by multi-source BFS: every node
    takes the label of its NEAREST seed (undirected hop distance), ties
    broken by the lexicographically smallest label — the
    weak-supervision primitive that turns a few hand-labeled documents
    plus a similarity/co-occurrence graph into corpus-wide labels
    (label a handful of spam clusters, propagate to the rest; seed
    known domains, label the near-dup neighborhoods).

    ``seeds`` is ``(node, label)``; a node with multiple seed rows
    keeps the smallest label at distance 0. Returns ``(node, label,
    dist)`` for every node REACHED from a seed (unreachable nodes are
    absent — absence is the honest answer, not a default label).

    Plan shape: per round one node-keyed join of the frontier state
    against the symmetric edge list + one min-struct aggregate — the
    connected-components shape with a (dist, label) payload; rounds =
    eccentricity of the seed set (bounded by graph diameter), each
    localCheckpointed; convergence detected by a limit(1) changed
    probe, ``strict=True`` raising on ``max_iter`` exhaustion (a
    silently half-spread labeling would poison downstream training).
    """
    sym = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    state = (
        seeds.select(
            F.col(seeds.columns[0]).alias("node"),
            F.struct(
                F.lit(0).cast("bigint").alias("dist"),
                F.col(seeds.columns[1]).cast("string").alias("label"),
            ).alias("_s"),
        )
        .groupBy("node")
        .agg(F.min("_s").alias("_s"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        pushed = (
            sym.join(state.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.struct(
                    (F.col("_s.dist") + 1).alias("dist"),
                    F.col("_s.label").alias("label"),
                ).alias("_s"),
            )
        )
        merged = (
            state.unionByName(pushed)
            .groupBy("node")
            .agg(F.min("_s").alias("_s"))
            .localCheckpoint()
        )
        changed = (
            merged.alias("m")
            .join(state.alias("s"), "node", "left")
            .filter(
                F.col("s._s").isNull() | (F.col("m._s") != F.col("s._s"))
            )
            .limit(1)
            .count()
        )
        state = merged
        if changed == 0:
            converged = True
            break
    if not converged:
        msg = (
            f"spread_labels hit max_iter={max_iter} with labels still "
            "spreading — raise max_iter (need >= seed-set eccentricity)"
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return state.select(
        "node",
        F.col("_s.label").alias("label"),
        F.col("_s.dist").alias("dist"),
    )


def ktruss(
    edges: DataFrame,
    k: int = 4,
    max_iter: int = 40,
    strict: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """k-truss decomposition membership (Cohen 2008): the maximal
    subgraph where every EDGE sits in at least ``k - 2`` triangles
    within the subgraph — the edge-level analog of :func:`kcore`
    (a k-core keeps well-connected NODES; a k-truss keeps edges with
    strong triangle reinforcement, the standard cohesive-community
    and spam-link filter: an edge with no triangle support is a weak
    tie however high its endpoints' degrees). Returns the surviving
    canonical edges ``(lo, hi, support)`` with their support inside
    the final truss.

    Peel: compute per-edge triangle support (the degree-oriented
    compact-forward join from :func:`triangle_count`, each triangle
    crediting its three edges), drop edges under ``k - 2``, repeat to
    the fixpoint — dropping an edge removes its triangles, which can
    push OTHER edges under the threshold. Each round is one degree
    aggregate + two node-keyed equi-joins + one edge-keyed count
    (never a cross product), localCheckpointed; rounds = peel depth.
    Degrees are re-derived per round from the surviving edges, so the
    orientation (and its Σ out-deg² wedge bound) tracks the shrinking
    subgraph. ``strict=True`` raises on ``max_iter`` exhaustion — a
    half-peeled truss is simply wrong.

    ``stats`` (optional dict, observability only — results are
    identical): on return carries ``peel_rounds`` (support passes run,
    including the fixpoint-confirming one) and ``edges_in`` — the
    density-vs-depth ledger the r12 verdict's #3 probe records.
    """
    if max_iter < 1:
        raise ValueError(f"ktruss: max_iter must be >= 1, got {max_iter}")
    ori = _canonical_edges(edges).localCheckpoint()
    n_prev = ori.count()
    if stats is not None:
        stats["edges_in"] = n_prev
        stats["peel_rounds"] = 0
    for _ in range(max_iter):
        if stats is not None:
            stats["peel_rounds"] += 1
        tri = _oriented_triangles(_degree_oriented(ori))
        sup = (
            tri.select(
                F.least("v", "p").alias("lo"), F.greatest("v", "p").alias("hi")
            )
            .unionByName(
                tri.select(
                    F.least("v", "q").alias("lo"),
                    F.greatest("v", "q").alias("hi"),
                )
            )
            .unionByName(
                tri.select(
                    F.least("p", "q").alias("lo"),
                    F.greatest("p", "q").alias("hi"),
                )
            )
            .groupBy("lo", "hi")
            .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        )
        surv = (
            ori.join(sup, ["lo", "hi"], "left")
            .select(
                "lo",
                "hi",
                F.coalesce("support", F.lit(0)).cast("bigint").alias(
                    "support"
                ),  # triangle-free edges survive a k<=2 truss
            )
            .filter(F.col("support") >= k - 2)
            .localCheckpoint()
        )
        n_now = surv.count()
        if n_now == n_prev:
            return surv.select("lo", "hi", "support")
        ori = surv.select("lo", "hi").localCheckpoint()
        n_prev = n_now
        if n_now == 0:
            return surv.select("lo", "hi", "support")
    if strict:
        raise RuntimeError(f"ktruss: no fixpoint after {max_iter} rounds")
    return surv.select("lo", "hi", "support")


def codegree_pairs(
    edges: DataFrame, max_center_degree: int | None = None
) -> DataFrame:
    """Codegree table ``(u, v, codeg)`` for every unordered node pair
    with at least one common neighbor — the wedge-count primitive under
    neighborhood link prediction (:func:`neighbor_jaccard` scores it),
    rectangle counting (:func:`rectangle_count` squares it), and
    co-citation / co-occurrence analyses.

    Wedges are generated at their CENTER (pairs of the center's
    neighbors), so work is Σ deg(center)² — the same hub cliff as
    Adamic-Adar, governed by the same contract: ``max_center_degree``
    drops high-degree wedge centers (a deterministic function of exact
    degrees, so results stay hash-exact for a fixed cap); the uncapped
    exact semantics run on bounded subgraphs (the AA/NJ capped + exact
    twin pattern). Plan: one symmetrized degree aggregate, one
    center-keyed self-join, one pair-keyed count — equi-joins only.
    """
    canon = _canonical_edges(edges)
    und = canon.select(
        F.col("lo").alias("node"), F.col("hi").alias("nbr")
    ).unionByName(
        canon.select(F.col("hi").alias("node"), F.col("lo").alias("nbr"))
    )
    deg = und.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("_d"))
    centers = deg.filter(F.col("_d") > 1)
    if max_center_degree is not None:
        centers = centers.filter(F.col("_d") <= max_center_degree)
    # r13: materialize the wedge input ONCE — ``wi`` feeds both sides of
    # the center-keyed self-join below, and without a checkpoint the
    # whole edge-build + degree-aggregate subtree is planned and executed
    # once per side (the rectangles _before plan carried 76 Exchanges).
    # Values are unchanged; only the duplicated subtree goes away.
    wi = und.join(centers.select("node"), "node").localCheckpoint(eager=False)
    pairs = (
        wi.alias("a")
        .join(wi.alias("b"), "node")
        .filter(F.col("a.nbr") < F.col("b.nbr"))
        .select(F.col("a.nbr").alias("u"), F.col("b.nbr").alias("v"))
    )
    return pairs.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("codeg")
    )


def rectangle_count(
    edges: DataFrame, max_center_degree: int | None = None
) -> DataFrame:
    """Global 4-cycle (rectangle) census: ONE row ``(n_codeg_pairs,
    sum_diag_squares, n_rectangles)`` where ``sum_diag_squares =
    Σ_{u<v} C(codeg(u,v), 2)`` counts squares once per DIAGONAL pair.
    Every rectangle has exactly two diagonals, so uncapped
    ``n_rectangles = sum_diag_squares / 2`` (emitted; NULL when a
    center cap is set, because capping can drop one diagonal's wedges
    and break the exactly-twice invariant — the capped run reports the
    raw diagonal census instead, the honest number).

    Rectangles are the bipartite-cohesion signal triangles can't see
    (author-paper, user-item, doc-token graphs are triangle-free but
    rectangle-rich) — the basis of the butterfly/k-bitruss literature
    (Sanei-Mehri et al. 2018). Scale contract inherits
    :func:`codegree_pairs`: capped wedge centers operationally, exact
    twin on bounded subgraphs.
    """
    cd = codegree_pairs(edges, max_center_degree=max_center_degree)
    # per-term BIGINT before the sum (codeg*(codeg-1) is always even, so
    # the integer division is exact): summing doubles then casting loses
    # exactness above 2^53 total on large graphs — and the DuckDB oracle
    # sums per-term BIGINTs, so the gate would diverge exactly there.
    agg = cd.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_codeg_pairs"),
        F.sum(
            F.expr(
                "CAST(codeg AS BIGINT) * (CAST(codeg AS BIGINT) - 1) div 2"
            )
        )
        .cast("bigint")
        .alias("sum_diag_squares"),
    )
    n_rect = (
        F.lit(None).cast("bigint")
        if max_center_degree is not None
        else F.expr("sum_diag_squares div 2").cast("bigint")
    )
    return agg.select(
        "n_codeg_pairs",
        F.coalesce("sum_diag_squares", F.lit(0)).alias("sum_diag_squares"),
        n_rect.alias("n_rectangles"),
    )
