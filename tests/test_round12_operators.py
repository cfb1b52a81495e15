"""Round-12 operator unit tests vs pure-python references: Schoenfeld
residuals, Aalen-Johansen competing-risks CIF (and later-wave ops)."""

from __future__ import annotations

import datetime as dt
import math

import pytest


# --------------------------------------------------------------------------
# schoenfeld_residuals
# --------------------------------------------------------------------------


def _schoenfeld_reference(rows, beta):
    """Quantized-arithmetic mirror of the operator: rows = (t, d, x)."""
    times = sorted({t for t, _, _ in rows})
    per = {t: [0, 0, 0, 0] for t in times}  # s0q, s1q, dd, sxq
    for t, d, x in rows:
        w = math.exp(beta * x)
        p = per[t]
        p[0] += round(w * 1e6)
        p[1] += round(w * x * 1e6)
        p[2] += d
        p[3] += round(d * x * 1e6)
    out = {}
    for i, t in enumerate(times):
        s0 = sum(per[u][0] for u in times[i:])
        s1 = sum(per[u][1] for u in times[i:])
        dd, sx = per[t][2], per[t][3]
        if dd > 0 and s0 > 0:
            out[t] = sx / 1e6 - dd * (s1 / s0)
    return out


def test_schoenfeld_residuals_match_reference(spark):
    from ups_crossref_etl_spark.operators.survival import (
        schoenfeld_residuals,
    )

    rows = [
        (1.0, 1, 0.5), (1.0, 0, -0.5), (2.0, 1, 0.0), (2.0, 1, 0.8),
        (3.0, 1, 1.0), (3.0, 0, -1.0), (4.0, 0, 0.3), (5.0, 1, -0.2),
    ]
    df = spark.createDataFrame(rows, "t double, d int, x double")
    got = {
        r["t"]: r
        for r in schoenfeld_residuals(df, "t", "d", "x", beta=0.3)
        .collect()
    }
    ref = _schoenfeld_reference(rows, 0.3)
    assert set(got) == set(ref)
    for t, want in ref.items():
        assert got[t]["residual"] == pytest.approx(want, abs=2e-6)
    # Breslow ties: t=2 has 2 events
    assert got[2.0]["n_events"] == 2


def test_schoenfeld_residuals_center_near_zero_under_ph(spark):
    """With x independent of time the residuals have no trend: their
    mean is near zero relative to their spread."""
    from ups_crossref_etl_spark.operators.survival import (
        schoenfeld_residuals,
    )

    rows = []
    for i in range(200):
        t = float(1 + (i * 7) % 50)
        x = ((i * 13) % 21) / 10.0 - 1.0
        rows.append((t, 1 if i % 3 else 0, x))
    df = spark.createDataFrame(rows, "t double, d int, x double")
    res = [
        r["residual"]
        for r in schoenfeld_residuals(df, "t", "d", "x", beta=0.0)
        .collect()
    ]
    assert len(res) > 10
    spread = max(res) - min(res)
    assert abs(sum(res) / len(res)) < spread


# --------------------------------------------------------------------------
# competing_risks_cif
# --------------------------------------------------------------------------


def _cif_reference(durations, n_causes=2):
    """durations = (cause, t) with cause 0 = censored. Returns
    {t: (n_risk, d_by_cause, cifs)} over all-cause event times."""
    times = sorted({t for _, t in durations})
    n = len(durations)
    s = 1.0
    cifs = [0.0] * n_causes
    out = {}
    at_risk = n
    for t in times:
        d_by = [
            sum(1 for c, u in durations if u == t and c == k + 1)
            for k in range(n_causes)
        ]
        leaving = sum(1 for _, u in durations if u == t)
        d = sum(d_by)
        if d > 0:
            for k in range(n_causes):
                cifs[k] += s * d_by[k] / at_risk
            out[t] = (at_risk, tuple(d_by), tuple(cifs))
            s *= 1.0 - d / at_risk
        at_risk -= leaving
    return out


def test_competing_risks_cif_matches_reference(spark):
    from ups_crossref_etl_spark.operators.survival import (
        competing_risks_cif,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 8 users: causes (1=purchase, 2=error) at various hours; 2 censored
    plan = [
        (0, "purchase", 1), (1, "error", 1), (2, "purchase", 2),
        (3, "error", 3), (4, "purchase", 3), (5, None, None),
        (6, "error", 2), (7, None, None),
    ]
    durs = []
    for u, typ, h in plan:
        rows.append((u, "signup", base))
        if typ is not None:
            rows.append((u, typ, base + dt.timedelta(hours=h)))
            durs.append((1 if typ == "purchase" else 2, h))
        else:
            durs.append((0, 4))  # horizon bucket
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    got = {
        r["t"]: r
        for r in competing_risks_cif(
            df, "user_id", "event_type", "ts",
            entry_type="signup", event_types=["purchase", "error"],
            horizon_seconds=4 * 3600, bucket_seconds=3600,
        ).collect()
    }
    ref = _cif_reference(durs)
    assert set(got) == set(ref)
    for t, (n_risk, d_by, cifs) in ref.items():
        assert got[t]["n_risk"] == n_risk
        assert got[t]["n_events_a"] == d_by[0]
        assert got[t]["n_events_b"] == d_by[1]
        assert got[t]["cif_a"] == pytest.approx(cifs[0], abs=2e-6)
        assert got[t]["cif_b"] == pytest.approx(cifs[1], abs=2e-6)
    # CIFs sum to 1 - S(t) at the last event time
    last = max(ref)
    s = 1.0
    for t in sorted(ref):
        n_risk, d_by, _ = ref[t]
        s *= 1.0 - sum(d_by) / n_risk
    assert got[last]["cif_a"] + got[last]["cif_b"] == pytest.approx(
        1.0 - s, abs=5e-6
    )


def test_competing_duration_tie_goes_to_earlier_type(spark):
    """Two competing events at the SAME microsecond: the earlier entry
    in event_types wins (deterministic, oracle-mirrored)."""
    from ups_crossref_etl_spark.operators.survival import (
        competing_duration_table,
    )

    base = dt.datetime(2024, 1, 1)
    hit = base + dt.timedelta(hours=1)
    rows = [
        (0, "signup", base), (0, "purchase", hit), (0, "error", hit),
        (1, "signup", base), (1, "error", hit),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    got = {
        r["_u"]: r
        for r in competing_duration_table(
            df, "user_id", "event_type", "ts",
            entry_type="signup", event_types=["purchase", "error"],
            horizon_seconds=4 * 3600, bucket_seconds=3600,
        ).collect()
    }
    assert got[0]["cause"] == 1  # purchase listed first wins the tie
    assert got[1]["cause"] == 2
    assert got[0]["t"] == 1 and got[1]["t"] == 1


# --------------------------------------------------------------------------
# brunner_munzel
# --------------------------------------------------------------------------


def _midranks(vals, universe):
    from collections import Counter

    cnt = Counter(universe)
    less, c = {}, 0
    for v in sorted(cnt):
        less[v] = c
        c += cnt[v]
    return [less[v] + (cnt[v] + 1) / 2 for v in vals]


def _bm_reference(xs, ys):
    """scipy.stats.brunnermunzel formula, pure python midranks."""
    allv = xs + ys
    rc_x = _midranks(xs, allv)
    rc_y = _midranks(ys, allv)
    r_x = _midranks(xs, xs)
    r_y = _midranks(ys, ys)
    nx, ny = len(xs), len(ys)
    mx, my = sum(rc_x) / nx, sum(rc_y) / ny
    sx = sum(
        (rc - r - mx + (nx + 1) / 2) ** 2 for rc, r in zip(rc_x, r_x)
    ) / (nx - 1)
    sy = sum(
        (rc - r - my + (ny + 1) / 2) ** 2 for rc, r in zip(rc_y, r_y)
    ) / (ny - 1)
    vtot = nx * sx + ny * sy
    w = nx * ny * (my - mx) / ((nx + ny) * math.sqrt(vtot))
    dfw = vtot ** 2 / (
        (nx * sx) ** 2 / (nx - 1) + (ny * sy) ** 2 / (ny - 1)
    )
    p = (my - (ny + 1) / 2) / nx
    return p, w, dfw


def test_brunner_munzel_matches_reference(spark):
    from ups_crossref_etl_spark.operators.stats import brunner_munzel

    xs = [1.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0, 4.0]
    ys = [3.0, 3.0, 4.0, 3.0, 1.0, 2.0, 3.0, 1.0, 1.0, 5.0, 4.0]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    out = brunner_munzel(df, "g", "v", "a", "b").collect()[0]
    p, w, dfw = _bm_reference(xs, ys)
    assert out["n_a"] == len(xs) and out["n_b"] == len(ys)
    assert out["p_hat"] == pytest.approx(p, abs=1e-6)
    assert out["w"] == pytest.approx(w, abs=1e-6)
    assert out["df_welch"] == pytest.approx(dfw, abs=1e-5)


def test_brunner_munzel_zero_variance_null(spark):
    from ups_crossref_etl_spark.operators.stats import brunner_munzel

    rows = [("a", 1.0)] * 5 + [("b", 1.0)] * 5
    df = spark.createDataFrame(rows, "g string, v double")
    out = brunner_munzel(df, "g", "v", "a", "b").collect()[0]
    assert out["p_hat"] == pytest.approx(0.5, abs=1e-9)
    assert out["w"] is None and out["df_welch"] is None


# --------------------------------------------------------------------------
# quade_test
# --------------------------------------------------------------------------


def _quade_reference(blocks, order):
    """Conover 1999 construction; blocks: list of dict treat->value."""
    k = len(order)
    n = len(blocks)
    rng = [max(b.values()) - min(b.values()) for b in blocks]
    q = _midranks(rng, rng)
    s = {}  # (i, j) -> S_ij
    for i, b in enumerate(blocks):
        vals = [b[t] for t in order]
        r = _midranks(vals, vals)
        for j in range(k):
            s[(i, j)] = q[i] * (r[j] - (k + 1) / 2)
    a2 = sum(v * v for v in s.values())
    sj = [sum(s[(i, j)] for i in range(n)) for j in range(k)]
    b2 = sum(v * v for v in sj) / n
    if a2 == b2:
        return None
    return (n - 1) * b2 / (a2 - b2)


def test_quade_matches_reference(spark):
    from ups_crossref_etl_spark.operators.stats import quade_test

    order = ["t1", "t2", "t3"]
    blocks = [
        {"t1": 1.0, "t2": 2.0, "t3": 3.5},
        {"t1": 2.0, "t2": 2.0, "t3": 2.1},
        {"t1": 5.0, "t2": 1.0, "t3": 3.0},
        {"t1": 1.0, "t2": 1.5, "t3": 4.0},
        {"t1": 2.5, "t2": 2.5, "t3": 2.5},
    ]
    rows = [
        (f"b{i}", t, v)
        for i, b in enumerate(blocks)
        for t, v in b.items()
    ]
    df = spark.createDataFrame(rows, "bk string, t string, v double")
    out = quade_test(df, "bk", "t", "v", order).collect()[0]
    want = _quade_reference(blocks, order)
    assert out["n_blocks"] == 5
    assert out["df1"] == 2 and out["df2"] == 8
    assert out["f_stat"] == pytest.approx(want, abs=1e-6)


def test_quade_incomplete_blocks_dropped_and_degenerate_null(spark):
    from ups_crossref_etl_spark.operators.stats import quade_test

    # one incomplete block (no t3) + two all-equal complete blocks
    rows = [
        ("b0", "t1", 9.0), ("b0", "t2", 1.0),
        ("b1", "t1", 2.0), ("b1", "t2", 2.0), ("b1", "t3", 2.0),
        ("b2", "t1", 3.0), ("b2", "t2", 3.0), ("b2", "t3", 3.0),
    ]
    df = spark.createDataFrame(rows, "bk string, t string, v double")
    out = quade_test(df, "bk", "t", "v", ["t1", "t2", "t3"]).collect()[0]
    assert out["n_blocks"] == 2  # b0 incomplete
    assert out["f_stat"] is None  # all-agree: A = B = 0


# --------------------------------------------------------------------------
# heaps_fit
# --------------------------------------------------------------------------


def test_heaps_fit_recovers_sublinear_growth(spark):
    from ups_crossref_etl_spark.operators.text_analysis import heaps_fit

    # vocabulary grows with sqrt of tokens by construction: doc i
    # introduces types up to ~sqrt scale
    docs = []
    for i in range(200):
        toks = ["w%d" % ((i * 37 + j * j) % 400) for j in range(20)]
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = heaps_fit(df, "text", "doc_id", n_points=10).collect()[0]
    assert out["n_points"] >= 5
    # bounded type inventory -> strongly sublinear growth
    assert 0.0 < out["beta"] < 0.9
    assert out["r2"] is None or out["r2"] > 0.5


def test_heaps_fit_matches_python_reference(spark):
    import hashlib

    from ups_crossref_etl_spark.operators.text_analysis import heaps_fit

    def bucket(i, n=10):
        h = hashlib.md5(f"heaps-{i}".encode()).hexdigest()[:8]
        return int(h, 16) % n

    docs = [(i, f"alpha beta w{i % 7} w{i % 13}") for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = heaps_fit(df, "text", "doc_id", n_points=10).collect()[0]
    # python mirror: cumulative mass + first-bucket type counts
    from collections import defaultdict

    mass = defaultdict(int)
    first = {}
    for i, text in docs:
        b = bucket(i)
        for tok in text.split():
            mass[b] += 1
            first[tok] = min(first.get(tok, 99), b)
    pts = []
    nn = vv = 0
    for b in range(10):
        nn += mass[b]
        vv += sum(1 for t, fb in first.items() if fb == b)
        if nn > 0 and vv > 0:
            pts.append((math.log(nn), math.log(vv)))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    logk = (sy - beta * sx) / n
    assert out["n_points"] == n
    assert out["beta"] == pytest.approx(beta, abs=1e-4)
    assert out["log_k"] == pytest.approx(logk, abs=1e-3)


# --------------------------------------------------------------------------
# log_odds_keyness
# --------------------------------------------------------------------------


def test_log_odds_keyness_matches_reference(spark):
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.text_analysis import (
        log_odds_keyness,
    )

    docs = []
    for i in range(40):
        text = "common filler words here"
        if i % 4 == 0:
            text += " signature" * 3
        docs.append((i, text))
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {
        r["token"]: r
        for r in log_odds_keyness(
            df, "text", "doc_id", F.col("doc_id") % 4 == 0,
            alpha0=100.0, min_count=5, top_n=10,
        ).collect()
    }
    # python mirror
    from collections import Counter

    tgt, ref = Counter(), Counter()
    for i, text in docs:
        (tgt if i % 4 == 0 else ref).update(text.split())
    vocab = {
        t
        for t in set(tgt) | set(ref)
        if tgt[t] + ref[t] >= 5
    }
    nt = sum(tgt[t] for t in vocab)
    nr = sum(ref[t] for t in vocab)
    for tok in vocab:
        yt, yr = tgt[tok], ref[tok]
        aw = 100.0 * (yt + yr) / (nt + nr)
        delta = math.log((yt + aw) / (nt + 100.0 - yt - aw)) - math.log(
            (yr + aw) / (nr + 100.0 - yr - aw)
        )
        sigma = math.sqrt(1.0 / (yt + aw) + 1.0 / (yr + aw))
        if tok in out:
            assert out[tok]["delta"] == pytest.approx(delta, abs=1e-6)
            assert out[tok]["z"] == pytest.approx(
                delta / sigma, abs=1e-6
            )
    # the planted signature token is the top |z| and positive
    top = max(out.values(), key=lambda r: abs(r["z"]))
    assert top["token"] == "signature" and top["z"] > 0


# --------------------------------------------------------------------------
# yule_k
# --------------------------------------------------------------------------


def test_yule_k_matches_hand_formula(spark):
    from ups_crossref_etl_spark.operators.text_analysis import yule_k

    docs = [(0, "a a a b b c"), (1, "a b c d")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = yule_k(df, "text").collect()[0]
    # tf: a=4, b=3, c=2, d=1 -> N=10, sum f^2 = 16+9+4+1 = 30
    assert out["vocab_size"] == 4
    assert out["total_tokens"] == 10
    assert out["yule_k"] == pytest.approx(
        1e4 * (30 - 10) / 100.0, abs=1e-6
    )


def test_yule_k_repetitive_beats_diverse(spark):
    from ups_crossref_etl_spark.operators.text_analysis import yule_k

    rep = spark.createDataFrame(
        [(0, "spam " * 50)], "doc_id int, text string"
    )
    div = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(50)))],
        "doc_id int, text string",
    )
    k_rep = yule_k(rep, "text").collect()[0]["yule_k"]
    k_div = yule_k(div, "text").collect()[0]["yule_k"]
    assert k_rep > k_div
    assert k_div == pytest.approx(0.0, abs=1e-6)  # all hapax


# --------------------------------------------------------------------------
# burrows_delta
# --------------------------------------------------------------------------


def test_burrows_delta_same_style_near_zero(spark):
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.text_analysis import (
        burrows_delta,
    )

    # groups 0/1 share a style; group 2 inverts the function-word mix
    docs = []
    for i in range(60):
        g = i % 3
        if g < 2:
            docs.append((i, "the of and " * 5 + "is was"))
        else:
            docs.append((i, "is was " * 8 + "the"))
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {
        (r["group_a"], r["group_b"]): r["delta"]
        for r in burrows_delta(
            df, "text", F.col("doc_id") % 3, top_m=5
        ).collect()
    }
    assert len(out) == 3
    assert out[("0", "1")] == pytest.approx(0.0, abs=1e-6)
    assert out[("0", "2")] > 1.0
    assert out[("1", "2")] > 1.0


def test_burrows_delta_matches_python_reference(spark):
    from collections import Counter

    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.text_analysis import (
        burrows_delta,
    )

    docs = [
        (0, "a a b c d"), (1, "a b b c"), (2, "c c d d a"),
        (3, "b d d a a a"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        (r["group_a"], r["group_b"]): r
        for r in burrows_delta(
            df, "text", F.col("doc_id") % 2, top_m=3
        ).collect()
    }
    # python mirror with pico-quantized relative frequencies
    cell = {}
    for i, text in docs:
        g = str(i % 2)
        cell.setdefault(g, Counter()).update(text.split())
    tot = Counter()
    for c in cell.values():
        tot.update(c)
    topm = sorted(tot, key=lambda t: (-tot[t], t))[:3]
    groups = sorted(cell)
    n_g = {g: sum(cell[g].values()) for g in groups}
    fq = {
        (g, t): round(cell[g][t] / n_g[g] * 1e12)
        for g in groups
        for t in topm
    }
    k = len(groups)
    z = {}
    for t in topm:
        s1 = sum(fq[(g, t)] for g in groups)
        s2 = sum(fq[(g, t)] ** 2 for g in groups)
        mu = s1 / k
        sd = math.sqrt(s2 / k - mu * mu)
        if sd > 0:
            for g in groups:
                z[(g, t)] = (fq[(g, t)] - mu) / sd
    terms = [
        round(abs(z[("0", t)] - z[("1", t)]) * 1e9)
        for t in topm
        if ("0", t) in z
    ]
    want = sum(terms) / 1e9 / len(terms)
    assert got[("0", "1")]["n_tokens"] == len(terms)
    assert got[("0", "1")]["delta"] == pytest.approx(want, abs=1e-6)


# --------------------------------------------------------------------------
# hurst_aggvar
# --------------------------------------------------------------------------


def test_hurst_white_noise_near_half(spark):
    from ups_crossref_etl_spark.operators.timeseries import hurst_aggvar

    # deterministic pseudo-noise: md5-derived iid-uniform values on a
    # 1-minute grid — no long-range structure, so H should sit near
    # 0.5. (A multiplicative-hash mod sequence does NOT work here:
    # it is low-discrepancy/anti-persistent, H -> 0.)
    import hashlib

    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            base + dt.timedelta(minutes=i),
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            / 2 ** 32,
        )
        for i in range(4096)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = hurst_aggvar(
        df, "ts", "value", base_seconds=3600, n_scales=5
    ).collect()[0]
    assert out["n_scales_used"] >= 4
    assert 0.2 < out["hurst"] < 0.75


def test_hurst_trending_series_high(spark):
    from ups_crossref_etl_spark.operators.timeseries import hurst_aggvar

    # strong linear trend = maximal persistence: bucket-mean variance
    # GROWS with width -> slope > 0 -> H > 1 boundary readout
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(minutes=i), float(i))
        for i in range(4096)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = hurst_aggvar(
        df, "ts", "value", base_seconds=3600, n_scales=5
    ).collect()[0]
    assert out["hurst"] > 0.9


# --------------------------------------------------------------------------
# scale-test family: ansari_bradley / mood_test / bartlett_test
# --------------------------------------------------------------------------


def _score_test_reference(xs, ys, g):
    """Exact conditional permutation moments for T = sum_{i in A} g(R_i)
    with midranks; g takes (midrank, N)."""
    allv = xs + ys
    n = len(allv)
    rc_x = _midranks(xs, allv)
    scores_all = [g(r, n) for r in _midranks(allv, allv)]
    t = sum(g(r, n) for r in rc_x)
    gbar = sum(scores_all) / n
    e = len(xs) * gbar
    var = (
        len(xs)
        * len(ys)
        * sum((s - gbar) ** 2 for s in scores_all)
        / (n * (n - 1))
    )
    return t, e, var


def test_ansari_bradley_matches_permutation_moments(spark):
    from ups_crossref_etl_spark.operators.stats import ansari_bradley

    xs = [1.0, 3.0, 3.0, 5.0, 7.0, 2.0, 6.0]
    ys = [2.0, 4.0, 4.0, 4.0, 6.0, 0.5, 8.0, 3.0]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    out = ansari_bradley(df, "g", "v", "a", "b").collect()[0]
    t, e, var = _score_test_reference(
        xs, ys, lambda r, n: min(r, n + 1 - r)
    )
    assert out["ab_stat"] == pytest.approx(t, abs=0.01)
    assert out["z"] == pytest.approx((t - e) / math.sqrt(var), abs=1e-6)


def test_mood_matches_permutation_moments(spark):
    from ups_crossref_etl_spark.operators.stats import mood_test

    xs = [1.0, 9.0, 2.0, 8.0, 1.5, 8.5]  # dispersed
    ys = [4.0, 5.0, 4.5, 5.5, 5.0]       # concentrated
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    out = mood_test(df, "g", "v", "a", "b").collect()[0]
    t, e, var = _score_test_reference(
        xs, ys, lambda r, n: (r - (n + 1) / 2) ** 2
    )
    assert out["mood_stat"] == pytest.approx(t, abs=0.01)
    assert out["z"] == pytest.approx((t - e) / math.sqrt(var), abs=1e-6)
    # dispersed group a -> tail-heavy scores -> positive z
    assert out["z"] > 0


def test_ansari_mood_opposite_polarity(spark):
    """Group a more dispersed: Ansari scores (mid-peaked) go LOW,
    Mood scores (tail-peaked) go HIGH."""
    from ups_crossref_etl_spark.operators.stats import (
        ansari_bradley,
        mood_test,
    )

    xs = [float(v) for v in (1, 20, 2, 19, 3, 18)]
    ys = [float(v) for v in (9, 10, 11, 12, 10)]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    za = ansari_bradley(df, "g", "v", "a", "b").collect()[0]["z"]
    zm = mood_test(df, "g", "v", "a", "b").collect()[0]["z"]
    assert za < 0 < zm


def test_bartlett_matches_hand_formula(spark):
    from ups_crossref_etl_spark.operators.stats import bartlett_test

    groups = {
        "g1": [1.0, 2.0, 3.0, 4.0, 5.0],
        "g2": [2.0, 2.5, 3.0, 3.5, 4.0, 3.2],
        "g3": [0.0, 5.0, 10.0, 2.0],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    out = bartlett_test(df, "g", "v").collect()[0]
    k = len(groups)
    n = sum(len(vs) for vs in groups.values())
    def var(vs):
        m = sum(vs) / len(vs)
        return sum((v - m) ** 2 for v in vs) / (len(vs) - 1)
    sp2 = sum((len(vs) - 1) * var(vs) for vs in groups.values()) / (
        n - k
    )
    t = (n - k) * math.log(sp2) - sum(
        (len(vs) - 1) * math.log(var(vs)) for vs in groups.values()
    )
    c = 1.0 + (
        sum(1.0 / (len(vs) - 1) for vs in groups.values())
        - 1.0 / (n - k)
    ) / (3.0 * (k - 1))
    assert out["k_groups"] == k and out["n"] == n and out["df"] == k - 1
    assert out["t_stat"] == pytest.approx(t / c, abs=1e-4)


def test_bartlett_zero_variance_group_null(spark):
    from ups_crossref_etl_spark.operators.stats import bartlett_test

    rows = [("a", 1.0)] * 4 + [("b", float(v)) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = bartlett_test(df, "g", "v").collect()[0]
    assert out["t_stat"] is None  # ln(0) reported loudly as NULL


# --------------------------------------------------------------------------
# fleiss_kappa / krippendorff_alpha_nominal / gumbel_block_maxima
# --------------------------------------------------------------------------


def test_fleiss_kappa_matches_hand_formula(spark):
    from ups_crossref_etl_spark.operators.agreement import fleiss_kappa

    # 4 units x 3 raters over 2 categories
    ratings = {
        "u1": ["a", "a", "a"],
        "u2": ["a", "a", "b"],
        "u3": ["b", "b", "b"],
        "u4": ["a", "b", "b"],
        "u5": ["a", "a"],  # incomplete -> dropped
    }
    rows = [(u, v) for u, vs in ratings.items() for v in vs]
    df = spark.createDataFrame(rows, "u string, v string")
    out = fleiss_kappa(df, "u", "v", n_raters=3).collect()[0]
    kept = {u: vs for u, vs in ratings.items() if len(vs) == 3}
    n = 3
    p_is = []
    from collections import Counter

    cat = Counter()
    for vs in kept.values():
        c = Counter(vs)
        cat.update(c)
        p_is.append(
            (sum(v * v for v in c.values()) - n) / (n * (n - 1))
        )
    p_bar = sum(p_is) / len(p_is)
    tot = sum(cat.values())
    p_e = sum((v / tot) ** 2 for v in cat.values())
    want = (p_bar - p_e) / (1 - p_e)
    assert out["n_units"] == 4
    assert out["p_bar"] == pytest.approx(p_bar, abs=1e-6)
    assert out["p_e"] == pytest.approx(p_e, abs=1e-6)
    assert out["kappa"] == pytest.approx(want, abs=1e-6)


def test_fleiss_kappa_single_category_null(spark):
    from ups_crossref_etl_spark.operators.agreement import fleiss_kappa

    rows = [(f"u{i}", "a") for i in range(4) for _ in range(2)]
    df = spark.createDataFrame(rows, "u string, v string")
    out = fleiss_kappa(df, "u", "v", n_raters=2).collect()[0]
    assert out["p_e"] == pytest.approx(1.0)
    assert out["kappa"] is None


def test_krippendorff_matches_hand_formula_with_missing(spark):
    from ups_crossref_etl_spark.operators.agreement import (
        krippendorff_alpha_nominal,
    )

    ratings = {
        "u1": ["a", "a", "a"],
        "u2": ["a", "b"],          # 2 raters only
        "u3": ["b", "b", "b"],
        "u4": ["b", "a", "b"],
        "u5": ["a"],               # single rating -> dropped
    }
    rows = [(u, v) for u, vs in ratings.items() for v in vs]
    df = spark.createDataFrame(rows, "u string, v string")
    out = krippendorff_alpha_nominal(df, "u", "v").collect()[0]
    from collections import Counter

    kept = {u: vs for u, vs in ratings.items() if len(vs) >= 2}
    d_o = 0.0
    cat = Counter()
    n = 0
    for vs in kept.values():
        m = len(vs)
        c = Counter(vs)
        cat.update(c)
        n += m
        d_o += (m * m - sum(v * v for v in c.values())) / (m - 1)
    d_e = (n * n - sum(v * v for v in cat.values())) / (n - 1)
    assert out["n_units"] == 4 and out["n_values"] == n
    assert out["alpha"] == pytest.approx(1 - d_o / d_e, abs=1e-6)


def test_krippendorff_perfect_agreement_is_one(spark):
    from ups_crossref_etl_spark.operators.agreement import (
        krippendorff_alpha_nominal,
    )

    rows = [
        (f"u{i}", "a" if i % 2 == 0 else "b")
        for i in range(10)
        for _ in range(3)
    ]
    df = spark.createDataFrame(rows, "u string, v string")
    out = krippendorff_alpha_nominal(df, "u", "v").collect()[0]
    assert out["alpha"] == pytest.approx(1.0)


def test_gumbel_block_maxima_matches_hand_mom(spark):
    import statistics

    from ups_crossref_etl_spark.operators.timeseries import (
        gumbel_block_maxima,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    maxima = []
    for day in range(30):
        mx = 0.0
        for j in range(24):
            v = float((day * 131 + j * 17) % 997) / 10.0
            mx = max(mx, v)
            rows.append(
                (base + dt.timedelta(days=day, hours=j), v)
            )
        maxima.append(round(mx * 1e6) / 1e6)
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = gumbel_block_maxima(
        df, "ts", "value", block_seconds=86400, return_periods=(30,)
    ).collect()[0]
    m = sum(maxima) / len(maxima)
    var = sum((x - m) ** 2 for x in maxima) / len(maxima)
    beta = math.sqrt(var) * math.sqrt(6.0) / math.pi
    mu = m - 0.5772156649015329 * beta
    rl30 = mu - beta * math.log(-math.log(1.0 - 1.0 / 30.0))
    assert out["n_blocks"] == 30
    assert out["mu"] == pytest.approx(mu, abs=1e-4)
    assert out["beta"] == pytest.approx(beta, abs=1e-4)
    assert out["rl_30"] == pytest.approx(rl30, abs=1e-3)
    # a return level extrapolates BEYOND the observed maxima
    assert out["rl_30"] > m
