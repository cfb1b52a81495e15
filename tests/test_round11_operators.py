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


# --------------------------------------------------------------------------
# round-11b wave: classical completions + FDR adjust + survival pair
# --------------------------------------------------------------------------


def test_cronbach_alpha_matches_reference(spark):
    from ups_crossref_etl_spark.operators.stats import cronbach_alpha

    rows = [
        (1.0 + 0.1 * i, 2.0 + 0.11 * i, 0.5 + 0.09 * i)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    out = cronbach_alpha(df, ["a", "b", "c"]).collect()[0]
    # reference on the SAME 1e-6 quantized grid
    qs = [[round(v * 1e6) for v in r] for r in rows]
    tots = [sum(r) for r in qs]

    def pvar(xs):
        n = len(xs)
        return (sum(x * x for x in xs) - sum(xs) ** 2 / n) / n / 1e12

    iv = sum(pvar([r[i] for r in qs]) for i in range(3))
    tv = pvar(tots)
    alpha = 3 / 2 * (1 - iv / tv)
    assert out["n"] == 30 and out["k_items"] == 3
    assert out["alpha"] == pytest.approx(alpha, abs=1e-5)
    # perfectly correlated items -> alpha ~ 1
    assert out["alpha"] > 0.99


def test_partial_corr_removes_confounder(spark):
    from ups_crossref_etl_spark.operators.stats import partial_corr

    # x and y both driven by z; partial correlation given z ~ 0
    rows = []
    for i in range(400):
        z = (i % 20) - 10.0
        x = 2.0 * z + ((i * 7) % 13 - 6) * 0.3
        y = -1.5 * z + ((i * 11) % 17 - 8) * 0.3
        rows.append((x, y, z))
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = partial_corr(df, "x", "y", "z").collect()[0]
    assert abs(out["r_xy"]) > 0.8  # spurious raw association
    assert abs(out["partial_r"]) < 0.2  # gone once z is controlled


def test_grubbs_flags_planted_outlier(spark):
    from ups_crossref_etl_spark.operators.stats import grubbs_test

    import statistics

    vals = [float(v) for v in range(20)] + [200.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "k string, v double"
    )
    out = grubbs_test(df, "k", "v").collect()[0]
    mean = statistics.fmean(vals)
    sd = statistics.stdev(vals)
    g = max(abs(v - mean) for v in vals) / sd
    assert out["n"] == 21
    assert out["g_stat"] == pytest.approx(g, abs=1e-4)
    assert out["g_stat"] > 4.0


def test_cochran_q_matches_reference(spark):
    from ups_crossref_etl_spark.operators.stats import cochran_q

    # 3 treatments, 8 complete subjects + 1 incomplete (excluded)
    data = {
        "s1": (1, 1, 0), "s2": (1, 0, 0), "s3": (1, 1, 1),
        "s4": (0, 0, 0), "s5": (1, 1, 0), "s6": (1, 0, 0),
        "s7": (1, 1, 0), "s8": (0, 1, 0),
    }
    rows = [
        (s, t, bool(v))
        for s, (a, b, c) in data.items()
        for t, v in zip(["t1", "t2", "t3"], (a, b, c))
    ]
    rows.append(("s9", "t1", True))  # incomplete block
    df = spark.createDataFrame(rows, "s string, t string, y boolean")
    out = cochran_q(df, "s", "t", "y").collect()[0]
    gj = [
        sum(v[i] for v in data.values()) for i in range(3)
    ]
    li = [sum(v) for v in data.values()]
    t = sum(gj)
    k = 3
    q = (k - 1) * (k * sum(g * g for g in gj) - t * t) / (
        k * t - sum(x * x for x in li)
    )
    assert out["n_subjects"] == 8
    assert out["k_treatments"] == 3
    assert out["q_stat"] == pytest.approx(q, abs=1e-6)


def test_page_trend_detects_monotone_blocks(spark):
    from ups_crossref_etl_spark.operators.stats import page_trend

    # every block strictly increasing along the hypothesized order ->
    # L is maximal: n*sum(j*j) = n*14; z = (L - 12n)/sqrt(2n)
    rows = []
    for b in range(12):
        for j, t in enumerate(["lo", "mid", "hi"]):
            rows.append((f"b{b}", t, float(j) + b * 0.01))
    df = spark.createDataFrame(rows, "b string, t string, v double")
    out = page_trend(df, "b", "t", "v", ["lo", "mid", "hi"]).collect()[0]
    n = 12
    assert out["n_blocks"] == n
    assert out["l_stat"] == pytest.approx(14.0 * n, abs=0.01)
    assert out["z"] == pytest.approx(
        (14 * n - 12 * n) / math.sqrt(2 * n), abs=1e-4
    )
    assert out["z"] > 4.0


def test_bh_adjust_matches_statsmodels_style_reference(spark):
    from ups_crossref_etl_spark.operators.stats import bh_adjust

    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205,
          0.212, 0.216, 0.222, 0.251, 0.269, 0.275, 0.34, 0.341,
          0.384, 0.569, 0.594, 0.696, 0.762, 0.94, 0.942, 0.975, 0.986]
    df = spark.createDataFrame(
        [(f"h{i:02d}", p) for i, p in enumerate(ps)],
        "k string, p double",
    )
    out = {
        r["k"]: r
        for r in bh_adjust(df, "k", "p").collect()
    }
    # reference BH step-up on the same 1e-9 quantized grid
    m = len(ps)
    order = sorted(range(m), key=lambda i: (ps[i], f"h{i:02d}"))
    c = [round(ps[i] * m / (r + 1) * 1e9) for r, i in enumerate(order)]
    suffix = c[:]
    for j in range(m - 2, -1, -1):
        suffix[j] = min(suffix[j], suffix[j + 1])
    for r, i in enumerate(order):
        got = out[f"h{i:02d}"]
        assert got["rank"] == r + 1
        assert got["q_value"] == pytest.approx(
            min(suffix[r], 10**9) / 1e9, abs=1e-6
        )
    # monotone in rank and capped at 1
    qs = [out[f"h{i:02d}"]["q_value"] for i in order]
    assert all(a <= b + 1e-12 for a, b in zip(qs, qs[1:]))
    assert max(qs) <= 1.0


def test_ranged_suffix_min_exact(spark):
    from ups_crossref_etl_spark.operators.stats import (
        _ranged_suffix_min,
    )

    vals = [(i, ((i * 37) % 101) - 50) for i in range(1, 201)]
    df = spark.createDataFrame(vals, "k int, w long")
    out = {
        r["k"]: r["s"]
        for r in _ranged_suffix_min(df, "k", "w", "s").collect()
    }
    ref = {}
    acc = 1 << 62
    for k, w in sorted(vals, reverse=True):
        acc = min(acc, w)
        ref[k] = acc
    assert out == ref


def test_greenwood_bands_match_hand_km(spark):
    from ups_crossref_etl_spark.operators.survival import (
        greenwood_bands,
    )
    import datetime as dt

    # 6 users sign up at t0; failures at hours 1,1,2; censored rest
    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(6):
        rows.append((u, "signup", base))
    for u, h in [(0, 1), (1, 1), (2, 2)]:
        rows.append((u, "purchase", base + dt.timedelta(hours=h)))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = {
        r["t"]: r
        for r in greenwood_bands(
            df, "user_id", "event_type", "ts",
            entry_type="signup", event_type="purchase",
            horizon_seconds=4 * 3600, bucket_seconds=3600,
        ).collect()
    }
    # t=1: n=6 d=2 -> S=2/3, gw = 2/(6*4); t=2: n=4 d=1 -> S=1/2,
    # gw += 1/(4*3)
    s1 = 1 - 2 / 6
    se1 = s1 * math.sqrt(2 / (6 * 4))
    s2 = s1 * (1 - 1 / 4)
    se2 = s2 * math.sqrt(2 / (6 * 4) + 1 / (4 * 3))
    assert out[1]["survival"] == pytest.approx(s1, abs=1e-6)
    assert out[1]["se"] == pytest.approx(se1, abs=1e-5)
    assert out[1]["lo"] == pytest.approx(max(0.0, s1 - 1.96 * se1), abs=1e-4)
    assert out[2]["survival"] == pytest.approx(s2, abs=1e-6)
    assert out[2]["se"] == pytest.approx(se2, abs=1e-5)
    assert out[2]["hi"] == pytest.approx(min(1.0, s2 + 1.96 * se2), abs=1e-4)


def test_cox_baseline_hazard_matches_hand_suffix(spark):
    from ups_crossref_etl_spark.operators.survival import (
        cox_baseline_hazard,
    )

    rows = [
        (1.0, 1, 0.5), (1.0, 0, -0.5), (2.0, 1, 0.0),
        (3.0, 1, 1.0), (3.0, 0, -1.0),
    ]
    df = spark.createDataFrame(rows, "t double, d int, x double")
    beta = 0.3
    out = {
        r["t"]: r
        for r in cox_baseline_hazard(df, "t", "d", "x", beta).collect()
    }
    # quantized reference
    per = {}
    for t, d, x in rows:
        p = per.setdefault(t, [0, 0])
        p[0] += round(math.exp(beta * x) * 1e6)
        p[1] += d
    times = sorted(per)
    h = 0
    for i, t in enumerate(times):
        s0q = sum(per[u][0] for u in times[i:])
        if per[t][1] == 0:
            continue
        h += round(per[t][1] / (s0q / 1e6) * 1e9)
        assert out[t]["s0"] == pytest.approx(s0q / 1e6, abs=1e-6)
        assert out[t]["h0"] == pytest.approx(h / 1e9, abs=1e-6)
        assert out[t]["n_events"] == per[t][1]


# --------------------------------------------------------------------------
# round-11c wave: corpus diagnostics + effect size + concordance
# --------------------------------------------------------------------------


def test_cohens_d_matches_reference(spark):
    from ups_crossref_etl_spark.operators.stats import cohens_d

    import statistics

    a = [float(v) for v in range(10, 30)]
    b = [float(v) + 5.5 for v in range(12, 35)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    out = cohens_d(df, "g", "v").collect()[0]
    ssa = sum((v - statistics.fmean(a)) ** 2 for v in a)
    ssb = sum((v - statistics.fmean(b)) ** 2 for v in b)
    dof = len(a) + len(b) - 2
    d = (statistics.fmean(b) - statistics.fmean(a)) / math.sqrt(
        (ssa + ssb) / dof
    )
    g = d * (1 - 3 / (4 * dof - 1))
    assert out["group_a"] == "a" and out["group_b"] == "b"
    assert out["d"] == pytest.approx(d, abs=1e-6)
    assert out["g"] == pytest.approx(g, abs=1e-6)


def test_concordance_bounded_matches_reference(spark):
    from ups_crossref_etl_spark.operators.stats import (
        concordance_bounded,
    )

    rows = [
        (1.0, 1, 0.9), (2.0, 1, 0.7), (2.5, 0, 0.7),
        (3.0, 1, 0.2), (4.0, 0, 0.1), (5.0, 0, 0.5),
    ]
    df = spark.createDataFrame(rows, "t double, d int, s double")
    out = concordance_bounded(df, "t", "d", "s").collect()[0]
    ncomp = nconc2 = 0
    for ti, di, si in rows:
        for tj, _, sj in rows:
            if ti < tj and di == 1:
                ncomp += 1
                nconc2 += 2 if si > sj else (1 if si == sj else 0)
    assert out["n_comparable"] == ncomp
    assert out["n_concordant_x2"] == nconc2
    assert out["c_index"] == pytest.approx(nconc2 / (2 * ncomp), abs=1e-6)
    assert out["c_index"] > 0.5  # descending score with time = good


def test_zipf_fit_recovers_power_law(spark):
    from ups_crossref_etl_spark.operators.text_analysis import zipf_fit

    # synthetic corpus with freq(token_r) ~ 120/r: slope ~ -1
    words = []
    for r in range(1, 41):
        words.extend([f"w{r:02d}"] * max(1, round(120 / r)))
    docs = [(i, " ".join(words[i::7])) for i in range(7)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = zipf_fit(df, "text", "doc_id", min_count=1).collect()[0]
    assert out["vocab_size"] == 40
    assert out["total_tokens"] == len(words)
    assert out["slope"] == pytest.approx(-1.0, abs=0.1)
    assert out["r2"] > 0.95


def _disp_bucket(doc_id, n_parts=10):
    """Pure-python mirror of sampling.hash_bucket(id, 'disp', n)."""
    import hashlib

    h = hashlib.md5(f"disp-{doc_id}".encode()).hexdigest()[:8]
    return int(h, 16) % n_parts


def _disp_reference(docs, n_parts=10, min_count=10):
    """Quantization-free DP reference over (id, text) pairs."""
    from collections import Counter, defaultdict

    cell = defaultdict(Counter)  # part -> token counts
    for i, text in docs:
        for t in text.split():
            cell[_disp_bucket(i, n_parts)][t] += 1
    part_tot = {p: sum(c.values()) for p, c in cell.items()}
    grand = sum(part_tot.values())
    tok_tot = Counter()
    for c in cell.values():
        tok_tot.update(c)
    out = {}
    for tok, tc in tok_tot.items():
        if tc < min_count:
            continue
        dp = 0.0
        for p in range(n_parts):
            v = cell[p][tok] / tc if p in cell else 0.0
            s = part_tot.get(p, 0) / grand
            dp += abs(v - s)
        out[tok] = dp / 2.0
    return out


def test_token_dispersion_even_vs_bursty(spark):
    from ups_crossref_etl_spark.operators.text_analysis import (
        token_dispersion,
    )

    # 'even' appears twice in every doc; 'burst' only in the docs
    # hash_bucket lands in part 0 (buckets come from the md5 'disp'
    # convention since ADVICE r11 — a plain id % n_parts is NULL on
    # string ids and silently emptied the joins)
    docs = []
    for i in range(40):
        text = "even even"
        if _disp_bucket(i) == 0:
            text += " burst" * 10
        docs.append((i, text))
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {
        r["token"]: r
        for r in token_dispersion(
            df, "text", "doc_id", n_parts=10, min_count=10
        ).collect()
    }
    ref = _disp_reference(docs)
    assert out["even"]["n_occurrences"] == 80
    assert out["even"]["dp"] == pytest.approx(ref["even"], abs=1e-6)
    assert out["burst"]["dp"] == pytest.approx(ref["burst"], abs=1e-6)
    # the bursty token clusters in few parts -> strictly higher DP
    assert out["burst"]["dp"] > out["even"]["dp"]


def test_token_dispersion_string_ids(spark):
    """ADVICE r11 regression: STRING document ids must bucket (the old
    id %% n_parts yielded NULL parts that dropped out of the equi-joins
    and returned an empty DP table)."""
    from ups_crossref_etl_spark.operators.text_analysis import (
        token_dispersion,
    )

    docs = [(f"doc-{i}", "alpha beta") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    rows = token_dispersion(
        df, "text", "doc_id", n_parts=4, min_count=5
    ).collect()
    ref = _disp_reference(docs, n_parts=4, min_count=5)
    got = {r["token"]: r["dp"] for r in rows}
    assert set(got) == {"alpha", "beta"}
    for tok, dp in got.items():
        assert dp == pytest.approx(ref[tok], abs=1e-6)


# --------------------------------------------------------------------------
# round-11d wave: keyness + Benford + Jonckheere
# --------------------------------------------------------------------------


def test_keyness_g2_flags_target_signature_token(spark):
    from ups_crossref_etl_spark.operators.text_analysis import keyness_g2
    from pyspark.sql import functions as F

    docs = []
    for i in range(40):
        text = "shared words appear here"
        if i % 4 == 0:
            text += " medical medical clinical"
        docs.append((i, text))
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = keyness_g2(
        df, "text", "doc_id", F.col("doc_id") % 4 == 0,
        min_count=5, top_n=10,
    ).collect()
    by_tok = {r["token"]: r for r in out}
    # target-only token tops the list with direction +1
    assert out[0]["token"] in ("medical", "clinical")
    assert by_tok["medical"]["direction"] == 1
    assert by_tok["medical"]["n_ref"] == 0
    assert by_tok["medical"]["g2"] > by_tok["shared"]["g2"]
    # shared tokens are (slightly) overused in the REFERENCE slice
    # relative to totals, so their direction is -1 and g2 small
    assert by_tok["shared"]["direction"] == -1


def test_keyness_g2_matches_hand_computation(spark):
    from ups_crossref_etl_spark.operators.text_analysis import keyness_g2
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "a a b"), (1, "a b b b"), (2, "a b"), (3, "b b")],
        "doc_id int, text string",
    )
    out = {
        r["token"]: r
        for r in keyness_g2(
            df, "text", "doc_id", F.col("doc_id") < 2,
            min_count=1, top_n=10,
        ).collect()
    }
    # target (docs 0,1): a=3 b=4; ref (docs 2,3): a=1 b=3
    tt, tr = 7, 4
    for tok, ct, cr in [("a", 3, 1), ("b", 4, 3)]:
        row = ct + cr
        g2q = 0
        if ct:
            g2q += round(2 * ct * math.log(ct / (tt * row / (tt + tr))) * 1e9)
        if cr:
            g2q += round(2 * cr * math.log(cr / (tr * row / (tt + tr))) * 1e9)
        assert out[tok]["g2"] == pytest.approx(g2q / 1e9, abs=1e-6)
        assert out[tok]["n_target"] == ct and out[tok]["n_ref"] == cr


def test_benford_screen_on_benford_data(spark):
    from ups_crossref_etl_spark.operators.stats import benford_screen

    # exponential spacing is Benford-convergent: v = 1.07^i
    rows = [(1.07**i,) for i in range(300)]
    df = spark.createDataFrame(rows, "v double")
    out = benford_screen(df, "v").collect()
    assert [r["digit"] for r in out] == list(range(1, 10))
    assert sum(r["n"] for r in out) == 300
    chi2 = sum(r["chi2_term"] for r in out)
    assert chi2 < 15.51  # chi2_8 at 5% — organic data passes
    # digit 1 dominates per Benford
    assert out[0]["obs_share"] == pytest.approx(0.301, abs=0.03)


def test_benford_screen_flags_uniform_data(spark):
    from ups_crossref_etl_spark.operators.stats import benford_screen

    # uniform [100, 1000): every first digit near-equal — wildly
    # non-Benford
    rows = [(100.0 + i,) for i in range(900)]
    df = spark.createDataFrame(rows, "v double")
    out = benford_screen(df, "v").collect()
    chi2 = sum(r["chi2_term"] for r in out)
    assert chi2 > 100.0


def test_jonckheere_matches_scipy_style_reference(spark):
    from ups_crossref_etl_spark.operators.stats import (
        jonckheere_terpstra,
    )

    rows = []
    vals = {
        "g1": [1.0, 2.0, 3.0, 2.5, 1.5, 2.0],
        "g2": [2.5, 3.5, 4.0, 3.0, 2.0, 4.5],
        "g3": [4.0, 5.0, 4.5, 6.0, 3.5, 5.5],
    }
    for g, vs in vals.items():
        rows.extend((g, v) for v in vs)
    df = spark.createDataFrame(rows, "g string, v double")
    out = jonckheere_terpstra(
        df, "g", "v", ["g1", "g2", "g3"]
    ).collect()[0]
    # hand J: sum over ordered pairs of (wins + half ties)
    order = ["g1", "g2", "g3"]
    j = 0.0
    for ai in range(3):
        for bi in range(ai + 1, 3):
            for x in vals[order[ai]]:
                for y in vals[order[bi]]:
                    j += 1.0 if x < y else (0.5 if x == y else 0.0)
    assert out["n"] == 18
    assert out["j_stat"] == pytest.approx(j, abs=0.01)
    # tie-corrected variance (Hollander & Wolfe)
    from collections import Counter

    allv = [v for vs in vals.values() for v in vs]
    n = len(allv)
    ngs = [len(vs) for vs in vals.values()]
    ties = Counter(allv).values()
    mean_j = (n * n - sum(g * g for g in ngs)) / 4
    var_j = (
        (n * (n - 1) * (2 * n + 5)
         - sum(g * (g - 1) * (2 * g + 5) for g in ngs)
         - sum(t * (t - 1) * (2 * t + 5) for t in ties)) / 72
        + (sum(g * (g - 1) * (g - 2) for g in ngs)
           * sum(t * (t - 1) * (t - 2) for t in ties))
        / (36 * n * (n - 1) * (n - 2))
        + (sum(g * (g - 1) for g in ngs)
           * sum(t * (t - 1) for t in ties)) / (8 * n * (n - 1))
    )
    z = (j - mean_j) / math.sqrt(var_j)
    assert out["z"] == pytest.approx(z, abs=1e-4)
    assert out["z"] > 3.0  # strongly increasing groups


# --------------------------------------------------------------------------
# hypothesis properties: the round-11 primitives vs pure-python references
# --------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=2, deadline=None)
@given(
    st.lists(
        st.integers(-1000, 1000), min_size=1, max_size=120, unique=True
    ).flatmap(
        lambda ks: st.tuples(
            st.just(ks),
            st.lists(
                st.integers(-(1 << 40), 1 << 40),
                min_size=len(ks), max_size=len(ks),
            ),
        )
    )
)
def test_ranged_suffix_min_property(spark, kw):
    """Suffix min through the range-partitioned fold == a right-to-left
    scan, for ANY signed weights and key spacing."""
    from ups_crossref_etl_spark.operators.stats import (
        _ranged_suffix_min,
    )

    ks, ws = kw
    vals = list(zip(ks, ws))
    df = spark.createDataFrame(vals, "k long, w long")
    out = {
        r["k"]: r["s"]
        for r in _ranged_suffix_min(df, "k", "w", "s").collect()
    }
    acc = 1 << 62
    ref = {}
    for k, w in sorted(vals, reverse=True):
        acc = min(acc, w)
        ref[k] = acc
    assert out == ref


@settings(max_examples=2, deadline=None)
@given(
    st.lists(
        st.integers(0, 10**9).map(lambda x: x / 1e9),
        min_size=1, max_size=80,
    )
)
def test_bh_adjust_property_vs_reference(spark, ps):
    """BH q-values match the quantized step-up reference for any
    p-list (ties included), are monotone in rank, and are capped at
    1."""
    from ups_crossref_etl_spark.operators.stats import bh_adjust

    rows = [(f"h{i:03d}", round(p, 9)) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, "k string, p double")
    out = {r["k"]: r for r in bh_adjust(df, "k", "p").collect()}
    m = len(rows)
    order = sorted(rows, key=lambda kv: (kv[1], kv[0]))
    c = [round(p * m / (r + 1) * 1e9) for r, (_, p) in enumerate(order)]
    suffix = c[:]
    for j in range(m - 2, -1, -1):
        suffix[j] = min(suffix[j], suffix[j + 1])
    for r, (k, _) in enumerate(order):
        assert out[k]["rank"] == r + 1
        assert out[k]["q_value"] == pytest.approx(
            min(suffix[r], 10**9) / 1e9, abs=1e-6
        )
    qs = [out[k]["q_value"] for k, _ in order]
    assert all(a <= b + 1e-12 for a, b in zip(qs, qs[1:]))
    assert all(q <= 1.0 for q in qs)


@settings(max_examples=2, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 6),            # time bucket
            st.integers(0, 1),            # event flag
            # |x| <= 1 keeps hypothesis's perfect-separation draws away
            # from the quantized-S0-underflow guard (needs beta.x < -14.5,
            # unreachable in 4 halved Newton steps at this range)
            st.integers(-4, 4).map(lambda x: x / 4.0),    # x0
            st.integers(-4, 4).map(lambda x: x / 4.0),    # x1
        ),
        min_size=6, max_size=50,
    )
)
def test_cox_multi_property_vs_reference(spark, raw):
    """cox_ph_multi matches the pure-python quantized Newton reference
    on arbitrary small duration tables (or both degenerate the same
    way)."""
    from ups_crossref_etl_spark.operators.survival import cox_ph_multi

    rows = [(float(t), d, x0, x1) for t, d, x0, x1 in raw]
    df = spark.createDataFrame(
        rows, "t double, d int, x0 double, x1 double"
    )
    fit = cox_ph_multi(df, "t", "d", ["x0", "x1"], iterations=4)
    ref_beta, ref_path = _cox_multi_reference(rows, iterations=4)
    assert fit["n"] == len(rows)
    assert fit["nll_path"][-1] == pytest.approx(ref_path[-1], abs=1e-6)
    assert fit["beta"][0] == pytest.approx(ref_beta[0], abs=1e-5)
    assert fit["beta"][1] == pytest.approx(ref_beta[1], abs=1e-5)
    assert all(
        a >= b - 1e-9
        for a, b in zip(fit["nll_path"], fit["nll_path"][1:])
    )
