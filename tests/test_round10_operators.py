"""Round-10 operator tests: capped-center transitivity (the scale fix
for clustering_coefficient's uncapped wedge path — r9 verdict #1) and
the round's regression guards.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# transitivity_summary
# --------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_transitivity_uncapped_matches_3t_over_w(spark):
    """Uncapped closed-wedges/wedges must equal clustering_coefficient's
    3*triangles/wedges (each triangle closes one wedge per vertex)."""
    from ups_crossref_etl_spark.operators.graph import (
        clustering_coefficient,
        transitivity_summary,
    )

    # triangle 1-2-3 plus pendant 3-4 and a second triangle 3-5-6
    e = _edges(
        spark, [(1, 2), (2, 3), (1, 3), (3, 4), (3, 5), (5, 6), (3, 6)]
    )
    cc = clustering_coefficient(e).collect()[0]
    tr = transitivity_summary(e).collect()[0]
    assert tr.n_wedges == cc.n_wedges
    assert tr.n_closed_wedges == 3 * cc.n_triangles
    assert tr.transitivity == cc.global_cc


def test_transitivity_triangle_is_one(spark):
    from ups_crossref_etl_spark.operators.graph import transitivity_summary

    r = transitivity_summary(_edges(spark, [(1, 2), (2, 3), (1, 3)])).collect()[0]
    assert r.n_centers == 3
    assert r.n_wedges == 3
    assert r.n_closed_wedges == 3
    assert r.transitivity == 1.0


def test_transitivity_cap_drops_hub_centers(spark):
    """Star 0-{1..5} plus edge 1-2: the hub 0 (deg 5) dominates wedges.
    Capping centers at degree <= 2 keeps only centers 1 and 2 (deg 2
    each): wedge (0,1,2) closed by edge 0-2? — center 1's neighbor pair
    is (0, 2), and 0-2 IS an edge, so each contributes 1 closed wedge.
    """
    from ups_crossref_etl_spark.operators.graph import transitivity_summary

    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    full = transitivity_summary(_edges(spark, star)).collect()[0]
    capped = transitivity_summary(
        _edges(spark, star), max_center_degree=2
    ).collect()[0]
    # uncapped: hub contributes C(5,2)=10 wedges (1 closed: pair 1-2),
    # centers 1 and 2 contribute 1 wedge each (both closed)
    assert full.n_wedges == 12 and full.n_closed_wedges == 3
    # capped at 2: hub dropped, only centers 1, 2 remain
    assert capped.n_centers == 2
    assert capped.n_wedges == 2 and capped.n_closed_wedges == 2
    assert capped.transitivity == 1.0


def test_transitivity_no_wedges_is_zero(spark):
    from ups_crossref_etl_spark.operators.graph import transitivity_summary

    r = transitivity_summary(_edges(spark, [(1, 2), (3, 4)])).collect()[0]
    assert r.n_wedges == 0 and r.transitivity == 0.0


# --------------------------------------------------------------------------
# distribution_distance (Wasserstein-1 / KS / Cramér-von Mises)
# --------------------------------------------------------------------------


def _dd(spark, a_vals, b_vals):
    from ups_crossref_etl_spark.operators.stats import distribution_distance

    rows = [("a", float(v)) for v in a_vals] + [("b", float(v)) for v in b_vals]
    df = spark.createDataFrame(rows, ["g", "v"])
    return distribution_distance(df, "g", "v", "a", "b").collect()[0]


def test_distribution_distance_identical_is_zero(spark):
    r = _dd(spark, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0])
    assert r.w1_distance == 0.0
    assert r.ks_stat == 0.0
    assert r.cvm_stat == 0.0
    assert r.n_a == 3 and r.n_b == 3 and r.n_values == 3


def test_distribution_distance_point_mass_shift(spark):
    # A = delta at 0, B = delta at 2: W1 = |0-2| = 2, KS = 1,
    # CvM = 1^2 * (1/2) + 0 = 0.5 (pooled weights at v=0: c=1 of n=2)
    r = _dd(spark, [0.0], [2.0])
    assert r.w1_distance == pytest.approx(2.0, abs=1e-6)
    assert r.ks_stat == 1.0
    assert r.cvm_stat == pytest.approx(0.5, abs=1e-6)


def test_distribution_distance_uniform_shift(spark):
    # A = {0, 1}, B = {1, 2}: mass 1/2 moves distance 1 twice over the
    # CDF integral -> W1 = 1.0; sup gap = 1/2
    r = _dd(spark, [0.0, 1.0], [1.0, 2.0])
    assert r.w1_distance == pytest.approx(1.0, abs=1e-6)
    assert r.ks_stat == pytest.approx(0.5, abs=1e-6)


def test_transitivity_cap_above_max_degree_is_noop(spark):
    """A cap no degree reaches must reproduce the uncapped result
    exactly — the cap-agreement gate's limiting case."""
    from ups_crossref_etl_spark.operators.graph import transitivity_summary

    e = _edges(
        spark, [(1, 2), (2, 3), (1, 3), (3, 4), (3, 5), (5, 6), (3, 6)]
    )
    full = transitivity_summary(e).collect()[0]
    capped = transitivity_summary(e, max_center_degree=100).collect()[0]
    assert full == capped


def test_distribution_distance_empty_group_nulls(spark):
    from ups_crossref_etl_spark.operators.stats import distribution_distance

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], ["g", "v"])
    r = distribution_distance(df, "g", "v", "a", "b").collect()[0]
    assert r.n_a == 2 and r.n_b == 0
    assert r.w1_distance is None
    assert r.ks_stat is None
    assert r.cvm_stat is None


def test_assortativity_ignores_self_loops_and_dup_edges(spark):
    from ups_crossref_etl_spark.operators.graph import degree_assortativity

    star = [(0, i) for i in range(1, 6)]
    noisy = star + [(0, 0), (3, 3)] + [(i, 0) for i in range(1, 6)]
    a = degree_assortativity(_edges(spark, star)).collect()[0]
    b = degree_assortativity(_edges(spark, noisy)).collect()[0]
    assert a == b


# --------------------------------------------------------------------------
# degree_assortativity
# --------------------------------------------------------------------------


def test_assortativity_star_is_negative_one(spark):
    """A star is perfectly disassortative: every edge pairs the hub
    (deg k) with a leaf (deg 1) -> r = -1."""
    from ups_crossref_etl_spark.operators.graph import degree_assortativity

    star = [(0, i) for i in range(1, 6)]
    r = degree_assortativity(_edges(spark, star)).collect()[0]
    assert r.n_edges == 5
    assert r.assortativity == pytest.approx(-1.0, abs=1e-6)


def test_assortativity_regular_graph_is_null(spark):
    """A cycle is 2-regular: zero degree variance -> undefined r (NULL)."""
    from ups_crossref_etl_spark.operators.graph import degree_assortativity

    cyc = [(i, (i + 1) % 5) for i in range(5)]
    r = degree_assortativity(_edges(spark, cyc)).collect()[0]
    assert r.n_edges == 5 and r.mean_degree == 2.0
    assert r.assortativity is None


def test_rich_club_clique_plus_pendants(spark):
    """K4 on {0,1,2,3} (deg >= 3) plus pendants 0-4, 1-5 (deg 1).
    k=2: rich = the 4 clique nodes, rich edges = 6 -> phi = 1.0.
    k=3: only 0 and 1 (deg 4) -> one edge between them -> phi = 1.0.
    k=4: nobody -> NULL phi."""
    from ups_crossref_etl_spark.operators.graph import rich_club_coefficients

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = k4 + [(0, 4), (1, 5)]
    out = {
        r.k: r
        for r in rich_club_coefficients(
            _edges(spark, edges), [2, 3, 4]
        ).collect()
    }
    assert out[2].n_rich == 4 and out[2].n_rich_edges == 6
    assert out[2].phi == 1.0
    assert out[3].n_rich == 2 and out[3].n_rich_edges == 1
    assert out[3].phi == 1.0
    assert out[4].n_rich == 0 and out[4].phi is None


def test_rich_club_periphery_only_club_is_sparse(spark):
    """Star hub + a single far edge: nodes above threshold share no
    edges -> phi = 0."""
    from ups_crossref_etl_spark.operators.graph import rich_club_coefficients

    edges = [(0, i) for i in range(1, 6)] + [(10, i) for i in range(11, 16)]
    out = rich_club_coefficients(_edges(spark, edges), [2]).collect()[0]
    assert out.n_rich == 2  # the two hubs
    assert out.n_rich_edges == 0 and out.phi == 0.0


def test_assortativity_networkx_parity(spark):
    try:
        import networkx as nx
    except ImportError:
        pytest.skip("networkx unavailable")
    from ups_crossref_etl_spark.operators.graph import degree_assortativity

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0), (5, 1)]
    g = nx.Graph(edges)
    want = nx.degree_assortativity_coefficient(g)
    r = degree_assortativity(_edges(spark, edges)).collect()[0]
    assert r.assortativity == pytest.approx(want, abs=1e-6)


# --------------------------------------------------------------------------
# eb_shrunk_means
# --------------------------------------------------------------------------


def test_eb_shrinkage_pulls_small_groups_harder(spark):
    from ups_crossref_etl_spark.operators.stats import eb_shrunk_means

    # +-0.5 within-group noise (so sigma2 > 0), built deterministically
    rows = (
        [("big_lo", 1.0 + 0.5 * (-1) ** i) for i in range(40)]
        + [("big_hi", 9.0 + 0.5 * (-1) ** i) for i in range(40)]
        + [("small_hi", 9.0 + 0.5 * (-1) ** i) for i in range(2)]
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r.g: r for r in eb_shrunk_means(df, "g", "v").collect()}
    mu = (40 * 1.0 + 40 * 9.0 + 2 * 9.0) / 82
    # every group shrinks toward mu, small group proportionally harder
    big_hi_pull = out["big_hi"].mean - out["big_hi"].shrunk_mean
    small_hi_pull = out["small_hi"].mean - out["small_hi"].shrunk_mean
    assert 0 <= big_hi_pull < small_hi_pull
    assert out["big_lo"].shrunk_mean > out["big_lo"].mean  # pulled UP
    assert abs(out["small_hi"].shrunk_mean - mu) < abs(
        out["small_hi"].mean - mu
    )


def test_eb_shrinkage_no_signal_collapses_to_grand_mean(spark):
    """Groups drawn identically (tau2 -> 0 by construction: all group
    means equal) collapse every shrunk mean to the grand mean."""
    from ups_crossref_etl_spark.operators.stats import eb_shrunk_means

    rows = [(g, v) for g in ("a", "b", "c") for v in (1.0, 2.0, 3.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = eb_shrunk_means(df, "g", "v").collect()
    for r in out:
        assert r.shrunk_mean == pytest.approx(2.0, abs=1e-6)


def test_eb_shrinkage_degenerate_single_group(spark):
    from ups_crossref_etl_spark.operators.stats import eb_shrunk_means

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], ["g", "v"])
    r = eb_shrunk_means(df, "g", "v").collect()[0]
    assert r.shrunk_mean is None and r.mean == pytest.approx(1.5)


# --------------------------------------------------------------------------
# logrank_test
# --------------------------------------------------------------------------


def test_logrank_hand_computed(spark):
    """A: events at t=1,2; B: events at t=2,3.
    t=1: n=(2,2), d_a=1 -> E_a=0.5,   V=0.25
    t=2: n=(1,2), d=2   -> E_a=2/3,   V=2/9
    t=3: n=(0,1) -> dropped (n<=1)
    O_a=2, E_a=7/6, V=0.25+2/9 -> chi2=(5/6)^2/(17/36)=1.470588
    """
    from ups_crossref_etl_spark.operators.survival import logrank_test

    rows = [("a", 1, 1), ("a", 1, 2), ("b", 1, 2), ("b", 1, 3)]
    df = spark.createDataFrame(rows, ["g", "ev", "t"])
    r = logrank_test(df, "g", "a", "b").collect()[0]
    assert r.n_a == 2 and r.n_b == 2
    assert r.events_a == 2 and r.events_b == 2
    assert r.expected_a == pytest.approx(7 / 6, abs=1e-6)
    assert r.chi2 == pytest.approx(1.470588, abs=1e-5)


def test_logrank_identical_groups_is_zeroish(spark):
    from ups_crossref_etl_spark.operators.survival import logrank_test

    rows = [(g, ev, t) for g in ("a", "b")
            for ev, t in [(1, 1), (1, 3), (0, 5), (1, 5), (0, 8)]]
    df = spark.createDataFrame(rows, ["g", "ev", "t"])
    r = logrank_test(df, "g", "a", "b").collect()[0]
    assert r.chi2 == pytest.approx(0.0, abs=1e-6)


def test_logrank_no_events_null_chi2(spark):
    from ups_crossref_etl_spark.operators.survival import logrank_test

    rows = [("a", 0, 5), ("b", 0, 5)]
    df = spark.createDataFrame(rows, ["g", "ev", "t"])
    r = logrank_test(df, "g", "a", "b").collect()[0]
    assert r.chi2 is None


def test_distribution_distance_scipy_parity(spark):
    try:
        from scipy.stats import wasserstein_distance
    except ImportError:
        pytest.skip("scipy unavailable")
    a = [0.5, 1.25, 1.25, 7.0, 3.5, 2.25]
    b = [0.25, 1.25, 4.0, 4.0, 9.5]
    r = _dd(spark, a, b)
    assert r.w1_distance == pytest.approx(
        wasserstein_distance(a, b), abs=1e-5
    )
