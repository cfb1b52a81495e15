"""Unit tests for the round-6 second-wave operators: DSIR selection,
PMI collocations, keyword extraction, hard-negative mining, k-core."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# DSIR importance weighting
# --------------------------------------------------------------------------


def test_dsir_weights_orders_target_like_docs_first(spark):
    from ups_crossref_etl_spark.operators.selection import (
        dsir_select,
        dsir_weights,
    )

    rows = [
        # target slice: "alpha beta" world
        (0, "alpha beta alpha beta alpha", "t"),
        (1, "beta alpha beta alpha beta", "t"),
        # pool doc that mimics the target distribution
        (2, "alpha beta alpha beta", "p"),
        # pool doc from a different world
        (3, "gamma delta gamma delta", "p"),
        (4, "delta gamma delta gamma", "p"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    w = dsir_weights(
        df, "text", "doc_id", F.col("grp") == "t", n_buckets=64
    ).collect()
    by_id = {r["doc_id"]: r for r in w}
    # n_grams = unigrams + bigrams: doc 2 has 4 + 3
    assert by_id[2]["n_grams"] == 7
    # the target-mimicking pool doc must outscore the off-target docs
    assert by_id[2]["weight"] > by_id[3]["weight"]
    assert by_id[2]["weight"] > by_id[4]["weight"]

    sel = dsir_select(
        df, "text", "doc_id", F.col("grp") == "t", n=1, n_buckets=64
    ).collect()
    # selection excludes the target slice itself and picks the mimic
    assert [r["doc_id"] for r in sel] == [2]


# --------------------------------------------------------------------------
# PMI collocations
# --------------------------------------------------------------------------


def test_pmi_collocations_hand_computed(spark):
    from ups_crossref_etl_spark.operators.text_analysis import pmi_collocations

    # "new york" always adjacent; "the" everywhere dilutes its own PMI
    rows = [
        (0, "new york the cat"),
        (1, "new york the dog"),
        (2, "the bird new york"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(
        df, "text", "doc_id", k=10, min_count=3
    ).collect()
    # only pairs with c_ab >= 3 survive: "new york" (3x). T=12 unigrams,
    # P=9 total adjacent bigrams (3 per doc), c_new = c_york = 3
    assert len(out) == 1
    r = out[0]
    assert (r["w1"], r["w2"], r["n_pair"]) == ("new", "york", 3)
    expected = math.log((3 * 12 * 12) / (9 * 3 * 3))
    assert r["pmi"] == pytest.approx(round(expected, 4), abs=1e-9)


def test_top_keywords_prefers_rare_tokens(spark):
    from ups_crossref_etl_spark.operators.text_analysis import top_keywords

    rows = [
        (0, "common zebra common common"),
        (1, "common common common"),
        (2, "common common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = top_keywords(df, "text", "doc_id", k=2).collect()
    d0 = sorted(
        (r for r in out if r["doc_id"] == 0), key=lambda r: r["rank"]
    )
    # zebra: tf=1, df=1 -> score = 1*(ln(4/2)+1); common: tf=3, df=3 ->
    # 3*(ln(4/4)+1) = 3 — common wins on tf, zebra second
    assert [r["token"] for r in d0] == ["common", "zebra"]
    assert d0[0]["score"] == pytest.approx(3.0)
    assert d0[1]["score"] == pytest.approx(round(math.log(2) + 1, 4))


# --------------------------------------------------------------------------
# Hard-negative mining
# --------------------------------------------------------------------------


def _toy_vectors():
    # two labels on a line: cross-label nearest neighbours are obvious
    return [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),
        (2, [0.8, 0.6], 1),  # closest label-1 vector to label-0 cluster
        (3, [0.0, 1.0], 1),
        (4, [-1.0, 0.0], 0),
    ]


def test_hard_negatives_exact_planted(spark):
    from ups_crossref_etl_spark.operators.mining import hard_negatives_exact

    df = spark.createDataFrame(
        _toy_vectors(), "vec_id long, embedding array<double>, label long"
    )
    out = hard_negatives_exact(df, k=1).collect()
    top = {r["anchor_id"]: r["neg_id"] for r in out}
    # for anchors 0 and 1 (label 0) the hardest negative is vec 2
    assert top[0] == 2 and top[1] == 2
    # negatives never share the anchor's label
    labels = {i: l for i, _, l in _toy_vectors()}
    for r in out:
        assert labels[r["anchor_id"]] != labels[r["neg_id"]]
    # ranks are 1..k per anchor and cos is rounded to 4dp
    for r in out:
        assert r["rank"] == 1
        assert r["cos"] == round(r["cos"], 4)


def test_hard_negatives_ivf_cos_matches_exact_on_shared_pairs(spark):
    import numpy as np

    from ups_crossref_etl_spark.operators.mining import (
        hard_negatives_exact,
        hard_negatives_ivf,
    )

    df = spark.createDataFrame(
        _toy_vectors(), "vec_id long, embedding array<double>, label long"
    )
    exact = {
        (r["anchor_id"], r["neg_id"]): r["cos"]
        for r in hard_negatives_exact(df, k=4).collect()
    }
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    approx = hard_negatives_ivf(df, cents, k=4, nprobe=2).collect()
    assert approx, "nprobe=2 over 2 clusters must produce candidates"
    for r in approx:
        # every IVF pair is a true cross-label pair with the EXACT cosine
        assert (r["anchor_id"], r["neg_id"]) in exact
        assert r["cos"] == pytest.approx(
            exact[(r["anchor_id"], r["neg_id"])], abs=1e-9
        )
    # nprobe covering ALL clusters ⇒ candidate set is complete ⇒ the
    # per-anchor ranking equals the exact one
    got = {
        (r["anchor_id"], r["rank"]): r["neg_id"] for r in approx
    }
    ex_rank = {
        (r["anchor_id"], r["rank"]): r["neg_id"]
        for r in hard_negatives_exact(df, k=4).collect()
    }
    assert got == ex_rank


# --------------------------------------------------------------------------
# k-core
# --------------------------------------------------------------------------


def test_kcore_clique_with_tail(spark):
    from ups_crossref_etl_spark.operators.graph import kcore

    # 4-clique {0,1,2,3} plus a chain 3-10-11: the chain peels off at k=3
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 10), (10, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["core_degree"] for r in kcore(df, k=3).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_cascade_and_strict_max_iter(spark):
    from ups_crossref_etl_spark.operators.graph import kcore

    # path graph: k=2 peels it entirely, one endpoint per round (cascade)
    edges = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert kcore(df, k=2).count() == 0
    # a cycle IS a 2-core: nothing peels
    cyc = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    out = {r["node"]: r["core_degree"] for r in kcore(cyc, k=2).collect()}
    assert out == {0: 2, 1: 2, 2: 2}
    # strict: exhausting max_iter with deletions pending raises
    with pytest.raises(RuntimeError, match="fixpoint"):
        kcore(df, k=2, max_iter=1)
