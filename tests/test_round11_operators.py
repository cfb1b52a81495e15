"""Round-11 operator unit tests: multi-covariate Cox vs a pure-python
reference, the degenerate-risk-set guard, the TF-IDF absolute df cap,
and the midrank-on-ranged-cumsum swap."""

from __future__ import annotations

import math

import pytest


# --------------------------------------------------------------------------
# cox_ph_multi
# --------------------------------------------------------------------------


def _cox_multi_reference(rows, iterations=8, init=None):
    """Plain-python Newton on the Breslow partial likelihood for d=2 —
    mirrors the operator's micro-quantized per-time integer sums."""
    import numpy as np

    def stats(beta):
        times = sorted({t for t, _, _, _ in rows})
        # s0q, s1q(2), s2q(3: 00,01,11), d, sxq(2)
        per = {t: [0] * 9 for t in times}
        for t, d, x0, x1 in rows:
            w = math.exp(beta[0] * x0 + beta[1] * x1)
            p = per[t]
            p[0] += round(w * 1e6)
            p[1] += round(w * x0 * 1e6)
            p[2] += round(w * x1 * 1e6)
            p[3] += round(w * x0 * x0 * 1e6)
            p[4] += round(w * x0 * x1 * 1e6)
            p[5] += round(w * x1 * x1 * 1e6)
            p[6] += d
            p[7] += round(d * x0 * 1e6)
            p[8] += round(d * x1 * 1e6)
        nll = 0.0
        g = np.zeros(2)
        h = np.zeros((2, 2))
        for i, t in enumerate(times):
            tail = [per[u] for u in times[i:]]
            s0 = sum(p[0] for p in tail) / 1e6
            s1 = np.array(
                [sum(p[1] for p in tail), sum(p[2] for p in tail)]
            ) / 1e6
            s2 = (
                np.array(
                    [
                        [sum(p[3] for p in tail), sum(p[4] for p in tail)],
                        [sum(p[4] for p in tail), sum(p[5] for p in tail)],
                    ]
                )
                / 1e6
            )
            d = per[t][6]
            sx = np.array([per[t][7], per[t][8]]) / 1e6
            if d == 0:
                continue
            nll -= beta[0] * sx[0] + beta[1] * sx[1] - d * math.log(s0)
            g += sx - d * s1 / s0
            h += d * (s2 / s0 - np.outer(s1 / s0, s1 / s0))
        return nll, g, h

    beta = np.array(init, dtype=float) if init else np.zeros(2)
    nll, g, h = stats(beta)
    path = [nll]
    for _ in range(iterations):
        try:
            np.linalg.cholesky(h)
            step = np.linalg.solve(h, g)
        except np.linalg.LinAlgError:
            break
        accepted = False
        scale = 1.0
        for _ in range(10):
            trial = beta + scale * step
            tn, tg, th = stats(trial)
            if tn <= nll:
                beta, nll, g, h = trial, tn, tg, th
                accepted = True
                break
            scale *= 0.5
        if not accepted:
            break
        path.append(nll)
        if len(path) >= 2 and path[-2] - path[-1] < 1e-9:
            break
    return beta, path


def _multi_rows():
    rows = []
    for i in range(40):
        x0 = 1.0 if i % 2 == 0 else -1.0
        x1 = 0.5 if i % 3 == 0 else -0.5
        risk = x0 + 0.8 * x1
        if risk > 0.5:
            rows.append((float(1 + i % 3), 1, x0, x1))
        elif risk > -0.5:
            rows.append((float(4 + i % 3), 1 if i % 5 else 0, x0, x1))
        else:
            rows.append((float(8 + i % 4), 1 if i % 4 else 0, x0, x1))
    return rows


def test_cox_ph_multi_matches_reference(spark):
    from ups_crossref_etl_spark.operators.survival import cox_ph_multi

    rows = _multi_rows()
    df = spark.createDataFrame(
        rows, "t double, d int, x0 double, x1 double"
    )
    fit = cox_ph_multi(df, "t", "d", ["x0", "x1"], iterations=8)
    ref_beta, ref_path = _cox_multi_reference(rows)
    assert fit["n"] == 40
    assert fit["beta"][0] == pytest.approx(ref_beta[0], abs=1e-6)
    assert fit["beta"][1] == pytest.approx(ref_beta[1], abs=1e-6)
    assert fit["nll_path"][-1] == pytest.approx(ref_path[-1], abs=1e-6)
    # both true effects positive, and the path is monotone
    assert fit["beta"][0] > 0
    assert all(
        a >= b - 1e-12
        for a, b in zip(fit["nll_path"], fit["nll_path"][1:])
    )


def test_cox_ph_multi_nests_single(spark):
    """The 2-covariate fit must reach at-or-below the 1-covariate fit's
    nll on the same data (superset model, same start, enough
    iterations) — the contract q_events_cox_multi_bound gates."""
    from ups_crossref_etl_spark.operators.survival import (
        cox_ph,
        cox_ph_multi,
    )

    rows = _multi_rows()
    df = spark.createDataFrame(
        rows, "t double, d int, x0 double, x1 double"
    )
    single = cox_ph(df, "t", "d", "x0", iterations=8)
    multi = cox_ph_multi(df, "t", "d", ["x0", "x1"], iterations=8)
    assert multi["nll_path"][-1] <= single["nll_path"][-1] + 1e-9


def test_cox_degenerate_risk_set_raises(spark):
    """ADVICE r10: a quantized S0 that underflows to 0 at an event time
    must fail LOUDLY, not silently drop the event terms from the
    likelihood. Warm-start at a beta where every late-risk-set
    e^(beta*x) < 5e-7 to force the condition deterministically."""
    from ups_crossref_etl_spark.operators.survival import cox_ph

    rows = [(1.0, 1, 1.0)] * 5 + [(9.0, 1, -40.0)] * 5
    df = spark.createDataFrame(rows, "t double, d int, x double")
    with pytest.raises(ValueError, match="degenerate risk set"):
        cox_ph(df, "t", "d", "x", iterations=1, init=1.0)


def test_cox_multi_init_length_mismatch_raises(spark):
    from ups_crossref_etl_spark.operators.survival import cox_ph_multi

    df = spark.createDataFrame(
        [(1.0, 1, 0.5, 0.5)], "t double, d int, x0 double, x1 double"
    )
    with pytest.raises(ValueError, match="init length"):
        cox_ph_multi(
            df, "t", "d", ["x0", "x1"], iterations=1, init=[0.0]
        )


# --------------------------------------------------------------------------
# tfidf_knn_graph absolute cap
# --------------------------------------------------------------------------


def test_tfidf_absolute_cap_drops_frequent_tokens(spark):
    """With max_df=1 every shared token is dropped, so no pairs and no
    rows; uncapped the same corpus produces a full KNN graph."""
    from ups_crossref_etl_spark.operators.retrieval import (
        tfidf_knn_graph,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta delta"),
            (3, "alpha gamma delta"),
        ],
        "doc_id int, text string",
    )
    capped = tfidf_knn_graph(
        docs, "text", "doc_id", k=2, max_df=1, ngram=1
    )
    assert capped.count() == 0
    full = tfidf_knn_graph(
        docs, "text", "doc_id", k=2, max_df=None, ngram=1
    )
    assert full.count() == 6  # 3 docs x 2 neighbors


def test_tfidf_min_of_absolute_and_relative_caps(spark):
    """When both caps are given the tighter one wins: with 4 docs,
    max_df_frac=1.0 (cap 4) and max_df=2, a token in 3 docs must be
    dropped."""
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.retrieval import (
        tfidf_knn_graph,
    )

    docs = spark.createDataFrame(
        [
            (1, "common rare1"),
            (2, "common rare2"),
            (3, "common rare3"),
            (4, "solo"),
        ],
        "doc_id int, text string",
    )
    out = tfidf_knn_graph(
        docs, "text", "doc_id", k=3, max_df=2, max_df_frac=1.0, ngram=1
    )
    # 'common' (df=3) is dropped by the absolute cap; rare terms are
    # unshared, so no doc pair shares any kept token
    assert out.count() == 0


# --------------------------------------------------------------------------
# midranks on the ranged cumsum (cross-check vs scipy-style reference)
# --------------------------------------------------------------------------


def test_mann_whitney_near_unique_values_matches_reference(spark):
    """Near-unique values (the regime that degenerated the old
    unpartitioned window) still produce exact midranks through the
    range-partitioned prefix pass."""
    from ups_crossref_etl_spark.operators.stats import mann_whitney

    rows = []
    for i in range(200):
        g = "a" if i % 2 == 0 else "b"
        v = i * 1.37 + (0.11 if g == "a" else 0.0) + (i % 7) * 0.009
        rows.append((g, v))
    df = spark.createDataFrame(rows, "g string, v double")
    out = mann_whitney(df, "g", "v", "a", "b").collect()[0]
    # pure-python midrank reference
    vals = sorted(v for _, v in rows)
    rank = {v: i + 1 for i, v in enumerate(vals)}  # all unique here
    ra = sum(rank[v] for g, v in rows if g == "a")
    na = nb = 100
    u_a = ra - na * (na + 1) / 2
    assert out["n_a"] == na and out["n_b"] == nb
    assert out["u_a"] == pytest.approx(u_a, abs=0.01)
