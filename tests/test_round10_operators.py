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
