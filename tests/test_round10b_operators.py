"""Round-10 second-wave operator tests: Jarque-Bera, Fisher's exact,
Brown-Forsythe (previously orphan), CMH, SRM, Calinski-Harabasz,
bounded silhouette, Misra-Gries summary, PACF (Durbin-Levinson)."""

from __future__ import annotations

import math

import pytest


# --------------------------------------------------------------------------
# jarque_bera
# --------------------------------------------------------------------------


def _jb_reference(xs):
    n = len(xs)
    mu = sum(xs) / n
    zq = [round((x - mu) * 1e4) for x in xs]
    m2 = sum(z * z for z in zq) / n / 1e8
    m3 = sum(z * z * z for z in zq) / n / 1e12
    m4 = sum(z * z * z * z for z in zq) / n / 1e16
    skew = m3 / m2**1.5
    exk = m4 / (m2 * m2) - 3.0
    jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
    return skew, exk, jb


def test_jarque_bera_matches_reference_moments(spark):
    from ups_crossref_etl_spark.operators.stats import jarque_bera

    xs = [1.0, 2.0, 2.5, 3.0, 3.5, 4.0, 10.0, 2.2, 2.8, 3.1]
    df = spark.createDataFrame([("g", x) for x in xs], ["g", "v"])
    row = jarque_bera(df, "g", "v").collect()[0]
    skew, exk, jb = _jb_reference(xs)
    assert row.n == 10
    assert row.skewness == pytest.approx(skew, abs=2e-6)
    assert row.ex_kurtosis == pytest.approx(exk, abs=2e-6)
    assert row.jb_stat == pytest.approx(jb, abs=2e-4)
    # the outlier-heavy sample is visibly non-normal
    assert row.jb_stat > 5.99


def test_jarque_bera_gaussian_ish_small_stat(spark):
    from ups_crossref_etl_spark.operators.stats import jarque_bera

    # symmetric, light-tailed values -> skew ~ 0, small JB
    xs = [-2.0, -1.0, -0.5, 0.0, 0.0, 0.5, 1.0, 2.0]
    df = spark.createDataFrame([("g", x) for x in xs], ["g", "v"])
    row = jarque_bera(df, "g", "v").collect()[0]
    assert row.skewness == pytest.approx(0.0, abs=1e-6)
    assert row.jb_stat < 5.99


def test_jarque_bera_degenerate_groups_null(spark):
    from ups_crossref_etl_spark.operators.stats import jarque_bera

    rows = [("tiny", 1.0), ("tiny", 2.0)] + [("flat", 7.0)] * 10
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r.g: r for r in jarque_bera(df, "g", "v").collect()}
    assert out["tiny"].jb_stat is None  # n < min_n
    assert out["flat"].jb_stat is None  # zero variance


# --------------------------------------------------------------------------
# fisher_exact
# --------------------------------------------------------------------------


def _fisher_reference(a, b, c, d):
    """Plain-python hypergeometric enumeration (scipy semantics)."""
    r1, r2, c1 = a + b, c + d, a + c
    n = a + b + c + d
    lf = [0.0]
    for i in range(1, n + 1):
        lf.append(lf[-1] + math.log(i))

    def lp(k):
        return (
            lf[r1] - lf[k] - lf[r1 - k]
            + lf[r2] - lf[c1 - k] - lf[r2 - c1 + k]
            - (lf[n] - lf[c1] - lf[n - c1])
        )

    kmin, kmax = max(0, c1 - r2), min(r1, c1)
    obs = lp(a)
    two = sum(math.exp(lp(k)) for k in range(kmin, kmax + 1) if lp(k) <= obs + 5e-7)
    left = sum(math.exp(lp(k)) for k in range(kmin, a + 1))
    right = sum(math.exp(lp(k)) for k in range(a, kmax + 1))
    return min(two, 1.0), min(left, 1.0), min(right, 1.0)


def test_fisher_exact_known_table(spark):
    from ups_crossref_etl_spark.operators.stats import fisher_exact

    # scipy.stats.fisher_exact([[1, 9], [11, 3]]) ~ p_two = 0.0027594
    rows = (
        [("A", True)] * 1 + [("A", False)] * 9
        + [("B", True)] * 11 + [("B", False)] * 3
    )
    df = spark.createDataFrame(rows, ["g", "f"])
    row = fisher_exact(df, "g", "f").collect()[0]
    assert (row.n11, row.n10, row.n21, row.n20) == (1, 9, 11, 3)
    p2, pl, pr = _fisher_reference(1, 9, 11, 3)
    assert row.p_two_sided == pytest.approx(p2, abs=2e-6)
    assert row.p_two_sided == pytest.approx(0.0027594, abs=1e-6)
    assert row.p_left == pytest.approx(pl, abs=2e-6)
    assert row.p_right == pytest.approx(pr, abs=2e-6)
    assert row.odds_ratio == pytest.approx((1 * 3) / (9 * 11), abs=1e-6)


def test_fisher_exact_balanced_table_p_one(spark):
    from ups_crossref_etl_spark.operators.stats import fisher_exact

    rows = (
        [("A", True)] * 5 + [("A", False)] * 5
        + [("B", True)] * 5 + [("B", False)] * 5
    )
    df = spark.createDataFrame(rows, ["g", "f"])
    row = fisher_exact(df, "g", "f").collect()[0]
    assert row.p_two_sided == pytest.approx(1.0, abs=1e-6)


def test_fisher_exact_zero_cell(spark):
    from ups_crossref_etl_spark.operators.stats import fisher_exact

    rows = [("A", False)] * 6 + [("B", True)] * 4 + [("B", False)] * 2
    df = spark.createDataFrame(rows, ["g", "f"])
    row = fisher_exact(df, "g", "f").collect()[0]
    p2, pl, pr = _fisher_reference(0, 6, 4, 2)
    assert row.p_two_sided == pytest.approx(p2, abs=2e-6)
    # a = 0 with b*c > 0: odds ratio is a plain 0.0, not NULL
    assert row.odds_ratio == pytest.approx(0.0, abs=1e-9)


# --------------------------------------------------------------------------
# brown_forsythe (orphan gated this round)
# --------------------------------------------------------------------------


def test_brown_forsythe_equal_spread_small_f(spark):
    from ups_crossref_etl_spark.operators.stats import brown_forsythe

    rows = [("a", float(x)) for x in [1, 2, 3, 4, 5]] + [
        ("b", float(x)) for x in [11, 12, 13, 14, 15]
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    row = brown_forsythe(df, "g", "v").collect()[0]
    # identical spreads around different medians -> F == 0
    assert row.f_stat == pytest.approx(0.0, abs=1e-9)
    assert row.n_groups == 2 and row.n == 10


def test_brown_forsythe_detects_spread_difference(spark):
    from ups_crossref_etl_spark.operators.stats import brown_forsythe

    rows = [("a", float(x)) for x in [5, 5, 5, 5, 5, 5]] + [
        ("b", float(x)) for x in [0, 1, 9, 10, 0, 10]
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    row = brown_forsythe(df, "g", "v").collect()[0]
    assert row.f_stat is not None and row.f_stat > 10.0


# --------------------------------------------------------------------------
# cmh_test
# --------------------------------------------------------------------------


def _cmh_reference(strata):
    """strata: list of (a, b, c, d) — quantized-term mirror of the op."""
    se = sv = sad = sbc = 0
    n = suma = k = 0
    for a, b, c, d in strata:
        ns = a + b + c + d
        if ns < 2:
            continue
        k += 1
        n += ns
        suma += a
        se += round((a + b) * (a + c) / ns * 1e6)
        sv += round((a + b) * (c + d) * (a + c) * (b + d) / (ns * ns * (ns - 1.0)) * 1e6)
        sad += round(a * d / ns * 1e9)
        sbc += round(b * c / ns * 1e9)
    diff = suma - se / 1e6
    stat = diff * diff / (sv / 1e6) if sv > 0 else None
    ormh = sad / sbc if sbc > 0 else None
    return k, n, suma, stat, ormh


def _cmh_rows(strata):
    rows = []
    for i, (a, b, c, d) in enumerate(strata):
        s = f"s{i}"
        rows += [(s, "A", True)] * a + [(s, "A", False)] * b
        rows += [(s, "B", True)] * c + [(s, "B", False)] * d
    return rows


def test_cmh_matches_reference(spark):
    from ups_crossref_etl_spark.operators.experiment import cmh_test

    strata = [(12, 8, 5, 15), (3, 17, 9, 11), (7, 7, 7, 7)]
    df = spark.createDataFrame(_cmh_rows(strata), ["s", "g", "f"])
    row = cmh_test(df, "s", "g", "f").collect()[0]
    k, n, suma, stat, ormh = _cmh_reference(strata)
    assert (row.n_strata, row.n, row.sum_a) == (k, n, suma)
    assert row.cmh_stat == pytest.approx(stat, abs=2e-6)
    assert row.or_mh == pytest.approx(ormh, abs=2e-6)


def test_cmh_no_association_within_strata(spark):
    from ups_crossref_etl_spark.operators.experiment import cmh_test

    # identical outcome rates within every stratum -> a == E, stat == 0
    strata = [(4, 4, 4, 4), (2, 6, 2, 6)]
    df = spark.createDataFrame(_cmh_rows(strata), ["s", "g", "f"])
    row = cmh_test(df, "s", "g", "f").collect()[0]
    assert row.cmh_stat == pytest.approx(0.0, abs=1e-6)
    assert row.or_mh == pytest.approx(1.0, abs=1e-6)


def test_cmh_skips_tiny_strata(spark):
    from ups_crossref_etl_spark.operators.experiment import cmh_test

    strata = [(6, 2, 2, 6)]
    rows = _cmh_rows(strata) + [("tiny", "A", True)]  # 1-row stratum
    df = spark.createDataFrame(rows, ["s", "g", "f"])
    row = cmh_test(df, "s", "g", "f").collect()[0]
    assert row.n_strata == 1 and row.n == 16


# --------------------------------------------------------------------------
# srm_check
# --------------------------------------------------------------------------


def test_srm_counts_distinct_units_and_flags(spark):
    from ups_crossref_etl_spark.operators.experiment import srm_check

    # duplicated unit rows must not inflate counts
    rows = [(u,) for u in range(200)] * 3
    df = spark.createDataFrame(rows, ["user_id"])
    row = srm_check(df, "user_id", seed="t").collect()[0]
    assert row.n_units == 200
    assert row.n_a + row.n_b == 200
    # a genuine 50/50 md5 split over 200 units is nowhere near the
    # p<0.001 alarm
    assert row.srm is False


def test_srm_fires_on_forced_imbalance(spark):
    from ups_crossref_etl_spark.operators.experiment import srm_check
    from ups_crossref_etl_spark.operators.sampling import hash_bucket
    from pyspark.sql import functions as F

    df = spark.range(4000).select(F.col("id").alias("u"))
    # drop 80% of arm-B units -> blatant SRM
    kept = df.filter(
        (hash_bucket(F.col("u"), "t2", 2) == 0)
        | (F.col("u") % 5 == 0)
    )
    row = srm_check(kept, "u", seed="t2").collect()[0]
    assert row.srm is True and row.chi2 > 100.0


# --------------------------------------------------------------------------
# calinski_harabasz
# --------------------------------------------------------------------------


def _ch_reference(points):
    """points: list of (label, [floats]) — quantized-term mirror."""
    from collections import defaultdict

    qs = [(l, [round(x * 1e6) for x in v]) for l, v in points]
    dims = len(qs[0][1])
    per = defaultdict(lambda: [0, [0] * dims, [0] * dims])  # n, s1, s2
    for l, q in qs:
        per[l][0] += 1
        for i, m in enumerate(q):
            per[l][1][i] += m
            per[l][2][i] += m * m
    g1 = [sum(per[l][1][i] for l in per) for i in range(dims)]
    gn = sum(per[l][0] for l in per)
    w = b = 0
    for l, (n, s1, s2) in per.items():
        for i in range(dims):
            w += round(s2[i] - s1[i] * s1[i] / n)
            cd = s1[i] / n - g1[i] / gn
            b += round(n * cd * cd)
    k = len(per)
    return (b / (k - 1)) / (w / (gn - k))


def test_calinski_harabasz_matches_reference(spark):
    from ups_crossref_etl_spark.operators.similarity import calinski_harabasz

    pts = [
        (0, [0.0, 0.1]), (0, [0.2, 0.0]), (0, [0.1, 0.1]),
        (1, [5.0, 5.1]), (1, [5.2, 4.9]), (1, [5.1, 5.0]),
        (2, [0.0, 9.0]), (2, [0.1, 9.2]),
    ]
    df = spark.createDataFrame(
        [(l, [float(x) for x in v]) for l, v in pts], ["label", "vec"]
    )
    row = calinski_harabasz(df, "vec", "label").collect()[0]
    assert row.n_vecs == 8 and row.n_clusters == 3
    assert row.ch_index == pytest.approx(_ch_reference(pts), rel=1e-6)
    # well-separated tight clusters -> huge CH
    assert row.ch_index > 100.0


def test_calinski_harabasz_single_cluster_null(spark):
    from ups_crossref_etl_spark.operators.similarity import calinski_harabasz

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [2.0, 1.0])], ["label", "vec"]
    )
    row = calinski_harabasz(df, "vec", "label").collect()[0]
    assert row.ch_index is None


# --------------------------------------------------------------------------
# silhouette_bounded
# --------------------------------------------------------------------------


def test_silhouette_well_separated_near_one(spark):
    from ups_crossref_etl_spark.operators.similarity import silhouette_bounded

    pts = [
        (1, 0, [0.0, 0.0]), (2, 0, [0.0, 0.1]),
        (3, 1, [10.0, 10.0]), (4, 1, [10.0, 10.1]),
    ]
    df = spark.createDataFrame(pts, ["id", "label", "vec"])
    out = {r.label: r for r in
           silhouette_bounded(df, "vec", "label", "id").collect()}
    assert out[0].n_points == 2 and out[1].n_points == 2
    assert out[0].mean_silhouette > 0.98
    assert out[1].mean_silhouette > 0.98


def test_silhouette_singleton_cluster_scores_zero(spark):
    from ups_crossref_etl_spark.operators.similarity import silhouette_bounded

    pts = [
        (1, 0, [0.0, 0.0]), (2, 0, [0.0, 0.2]),
        (3, 9, [50.0, 50.0]),  # singleton
    ]
    df = spark.createDataFrame(pts, ["id", "label", "vec"])
    out = {r.label: r for r in
           silhouette_bounded(df, "vec", "label", "id").collect()}
    assert out[9].mean_silhouette == pytest.approx(0.0, abs=1e-9)


def test_silhouette_interleaved_clusters_low(spark):
    from ups_crossref_etl_spark.operators.similarity import silhouette_bounded

    # two clusters shuffled together on a line -> silhouette ~ <= 0
    pts = [
        (1, 0, [0.0]), (2, 1, [1.0]), (3, 0, [2.0]), (4, 1, [3.0]),
        (5, 0, [4.0]), (6, 1, [5.0]),
    ]
    df = spark.createDataFrame(pts, ["id", "label", "vec"])
    out = silhouette_bounded(df, "vec", "label", "id").collect()
    assert all(r.mean_silhouette < 0.2 for r in out)


# --------------------------------------------------------------------------
# misra_gries_summary
# --------------------------------------------------------------------------


def test_misra_gries_bounds_hold_and_heavy_present(spark):
    from pyspark.sql import functions as F
    from ups_crossref_etl_spark.operators.sketches import misra_gries_summary

    # zipf-ish: value i appears (400 >> i) times
    rows = []
    for i, c in enumerate([400, 200, 100, 50, 25, 12, 6, 3] + [1] * 50):
        rows += [(f"v{i}",)] * c
    df = spark.createDataFrame(rows, ["x"]).repartition(7)
    k = 4
    n = len(rows)
    est = {r.x: r.est_count for r in
           misra_gries_summary(df, "x", k).collect()}
    true = {f"v{i}": c for i, c in
            enumerate([400, 200, 100, 50, 25, 12, 6, 3] + [1] * 50)}
    for v, e in est.items():
        assert e <= true[v], f"overestimate for {v}"
    for v, t in true.items():
        assert t - est.get(v, 0) <= n / (k + 1)
        if t > n / (k + 1):
            assert est.get(v, 0) > 0, f"heavy {v} missing"


def test_misra_gries_summary_small(spark):
    from ups_crossref_etl_spark.operators.sketches import misra_gries_summary

    df = spark.createDataFrame([("a",)] * 5 + [("b",)] * 2, ["x"])
    est = {r.x: r.est_count for r in
           misra_gries_summary(df, "x", 8).collect()}
    # k >= distinct values: exact counts survive every prune
    assert est == {"a": 5, "b": 2}


# --------------------------------------------------------------------------
# pacf_dl
# --------------------------------------------------------------------------


def _dl_reference(r):
    """Textbook Durbin-Levinson over acf dict {lag: r}."""
    out = {}
    phi = {}
    m = 0
    while (m + 1) in r:
        m += 1
    for step in range(1, m + 1):
        if step == 1:
            phi_mm = r[1]
        else:
            num, den = r[step], 1.0
            for j in range(1, step):
                num -= phi[j] * r[step - j]
                den -= phi[j] * r[j]
            if den == 0.0:
                break
            phi_mm = num / den
        phi = {j: phi[j] - phi_mm * phi[step - j] for j in range(1, step)}
        phi[step] = phi_mm
        out[step] = phi_mm
    return out


def test_pacf_ar1_cuts_off_after_lag1(spark):
    import datetime as dt
    from ups_crossref_etl_spark.operators.timeseries import acf, pacf_dl

    # deterministic AR(1)-flavored series (hash noise, phi = 0.7)
    x, xs = 0.0, []
    for t in range(120):
        noise = ((t * 2654435761) % 1000) / 1000.0 - 0.5
        x = 0.7 * x + noise
        xs.append(x)
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base + dt.timedelta(minutes=t), v) for t, v in enumerate(xs)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    got = {r.lag: r.pacf_val for r in
           pacf_dl(df, "k", "ts", "v", max_lag=3).collect()}
    rv = {r.lag: float(r.acf_val) for r in
          acf(df, "k", "ts", "v", 3, round_digits=12).collect()}
    ref = _dl_reference(rv)
    assert set(got) == {1, 2, 3}
    for lag in got:
        assert got[lag] == pytest.approx(round(ref[lag], 6), abs=1e-9)
    # AR(1): pacf_1 dominant, pacf_2/3 materially smaller
    assert abs(got[1]) > 0.3
    assert abs(got[2]) < abs(got[1]) and abs(got[3]) < abs(got[1])


def test_pacf_short_series_prefix_only(spark):
    import datetime as dt
    from ups_crossref_etl_spark.operators.timeseries import pacf_dl

    base = dt.datetime(2024, 1, 1)
    rows = [(1, base + dt.timedelta(minutes=t), float(v))
            for t, v in enumerate([1, 5, 2])]  # n=3 -> lags 1..2 only
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    got = {r.lag: r.pacf_val for r in
           pacf_dl(df, "k", "ts", "v", max_lag=3).collect()}
    assert set(got) == {1, 2}


# --------------------------------------------------------------------------
# wilcoxon_signed_rank
# --------------------------------------------------------------------------


def _wsr_reference(pairs):
    ds = [round((y - x) * 1e6) for x, y in pairs]
    nzd = [(abs(d), d > 0) for d in ds if d != 0]
    from collections import Counter

    cnt = Counter(a for a, _ in nzd)
    pos = Counter(a for a, p in nzd if p)
    mr, cum = {}, 0
    for a in sorted(cnt):
        mr[a] = cum + (cnt[a] + 1) / 2.0
        cum += cnt[a]
    nz = len(nzd)
    wp = sum(pos[a] * mr[a] for a in pos)
    ties = sum(t**3 - t for t in cnt.values())
    mean = nz * (nz + 1) / 4.0
    var = nz * (nz + 1) * (2.0 * nz + 1) / 24.0 - ties / 48.0
    z = (wp - mean) / math.sqrt(var) if nz >= 2 and var > 0 else None
    return len(ds), nz, wp, z


def test_wilcoxon_matches_reference_with_ties(spark):
    from ups_crossref_etl_spark.operators.stats import wilcoxon_signed_rank

    pairs = [
        (1.0, 2.0), (2.0, 3.0), (5.0, 4.0), (7.0, 7.0),  # one zero diff
        (3.0, 4.0), (8.0, 6.5), (2.0, 2.5), (9.0, 9.5),  # |d| ties
    ]
    df = spark.createDataFrame(pairs, ["x", "y"])
    row = wilcoxon_signed_rank(df, "x", "y").collect()[0]
    n_pairs, nz, wp, z = _wsr_reference(pairs)
    assert (row.n_pairs, row.n_nonzero) == (n_pairs, nz)
    assert row.w_plus == pytest.approx(wp, abs=1e-9)
    assert row.z == pytest.approx(z, abs=2e-6)


def test_wilcoxon_all_positive_diffs_extreme(spark):
    from ups_crossref_etl_spark.operators.stats import wilcoxon_signed_rank

    pairs = [(float(i), float(i) + 1.0 + 0.1 * i) for i in range(10)]
    df = spark.createDataFrame(pairs, ["x", "y"])
    row = wilcoxon_signed_rank(df, "x", "y").collect()[0]
    # W+ = full rank sum n(n+1)/2 = 55, z maximal positive
    assert row.w_plus == pytest.approx(55.0, abs=1e-9)
    assert row.z > 2.5


# --------------------------------------------------------------------------
# runs_test
# --------------------------------------------------------------------------


def test_runs_test_alternating_and_clustered(spark):
    from ups_crossref_etl_spark.operators.stats import runs_test

    # key "alt": perfectly alternating around the median -> max runs,
    # z > 0; key "clust": all lows then all highs -> 2 runs, z < 0
    rows = []
    for i in range(20):
        rows.append(("alt", i, 10.0 if i % 2 == 0 else 1.0))
    for i in range(20):
        rows.append(("clust", i, 1.0 if i < 10 else 10.0))
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    out = {r.k: r for r in runs_test(df, "k", ["o"], "v").collect()}
    assert out["alt"].n_runs == 20 and out["alt"].z > 3.0
    assert out["clust"].n_runs == 2 and out["clust"].z < -3.0
    assert out["alt"].n_above == 10 and out["alt"].n_below == 10


def test_runs_test_median_values_dropped(spark):
    from ups_crossref_etl_spark.operators.stats import runs_test

    rows = [("k", i, v) for i, v in
            enumerate([1.0, 5.0, 5.0, 5.0, 9.0])]  # median 5 dropped
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    row = runs_test(df, "k", ["o"], "v").collect()[0]
    assert row.n_above == 1 and row.n_below == 1 and row.n_runs == 2


# --------------------------------------------------------------------------
# durbin_watson
# --------------------------------------------------------------------------


def test_durbin_watson_alternating_residuals_near_four(spark):
    import datetime as dt
    from ups_crossref_etl_spark.operators.timeseries import durbin_watson

    base = dt.datetime(2024, 1, 1)
    # flat trend + perfectly alternating residuals -> DW ~ 4
    rows = [(1, base + dt.timedelta(minutes=i),
             5.0 + (1.0 if i % 2 == 0 else -1.0)) for i in range(40)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    row = durbin_watson(df, "k", "ts", "v").collect()[0]
    assert row.dw_stat == pytest.approx(4.0, abs=0.15)


def test_durbin_watson_smooth_trend_near_zero(spark):
    import datetime as dt
    from ups_crossref_etl_spark.operators.timeseries import durbin_watson

    base = dt.datetime(2024, 1, 1)
    # slow sine around a line: adjacent residuals nearly equal -> DW ~ 0
    rows = [(1, base + dt.timedelta(minutes=i),
             float(i) + 10.0 * math.sin(i / 20.0)) for i in range(60)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    row = durbin_watson(df, "k", "ts", "v").collect()[0]
    assert row.dw_stat is not None and row.dw_stat < 0.5


def test_durbin_watson_degenerate_time_dropped(spark):
    import datetime as dt
    from ups_crossref_etl_spark.operators.timeseries import durbin_watson

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, float(v)) for v in range(5)]  # zero time variance
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    assert durbin_watson(df, "k", "ts", "v").count() == 0


# --------------------------------------------------------------------------
# friedman_test
# --------------------------------------------------------------------------


def _friedman_reference(blocks):
    """blocks: list of per-block value lists (k treatments each)."""
    n = len(blocks)
    k = len(blocks[0])
    ranks = []
    for vals in blocks:
        r = []
        for v in vals:
            smaller = sum(1 for x in vals if x < v)
            ties = sum(1 for x in vals if x == v)
            r.append(smaller + (ties + 1) / 2.0)
        ranks.append(r)
    rj = [sum(ranks[i][j] for i in range(n)) for j in range(k)]
    a = sum(r * r for row in ranks for r in row)
    c = n * k * (k + 1) ** 2 / 4.0
    dev2 = sum((x - n * (k + 1) / 2.0) ** 2 for x in rj)
    q = (k - 1) * dev2 / (a - c)
    return q, q / (n * (k - 1))


def _friedman_rows(blocks, treatments):
    rows = []
    for i, vals in enumerate(blocks):
        for t, v in zip(treatments, vals):
            rows.append((f"b{i}", t, float(v)))
    return rows


def test_friedman_matches_reference_with_ties(spark):
    from ups_crossref_etl_spark.operators.stats import friedman_test

    blocks = [
        [1.0, 2.0, 3.0],
        [2.0, 2.0, 4.0],  # within-block tie
        [1.0, 3.0, 2.0],
        [1.5, 2.5, 3.5],
        [2.0, 1.0, 3.0],
    ]
    df = spark.createDataFrame(
        _friedman_rows(blocks, ["t1", "t2", "t3"]), ["b", "t", "v"]
    )
    row = friedman_test(df, "b", "t", "v").collect()[0]
    q, w = _friedman_reference(blocks)
    assert (row.n_blocks, row.k_treatments) == (5, 3)
    assert row.q_stat == pytest.approx(q, abs=2e-6)
    assert row.kendalls_w == pytest.approx(w, abs=2e-6)


def test_friedman_incomplete_blocks_excluded(spark):
    from ups_crossref_etl_spark.operators.stats import friedman_test

    rows = _friedman_rows([[1.0, 2.0], [2.0, 1.0], [1.0, 3.0]], ["a", "b"])
    rows.append(("lonely", "a", 9.0))  # missing treatment b -> excluded
    df = spark.createDataFrame(rows, ["b", "t", "v"])
    row = friedman_test(df, "b", "t", "v").collect()[0]
    assert row.n_blocks == 3


def test_friedman_perfect_concordance_w_one(spark):
    from ups_crossref_etl_spark.operators.stats import friedman_test

    # every block ranks treatments identically -> W == 1
    blocks = [[1.0, 2.0, 3.0, 4.0] for _ in range(6)]
    blocks = [[v + i for v in b] for i, b in enumerate(blocks)]
    df = spark.createDataFrame(
        _friedman_rows(blocks, ["a", "b", "c", "d"]), ["b", "t", "v"]
    )
    row = friedman_test(df, "b", "t", "v").collect()[0]
    assert row.kendalls_w == pytest.approx(1.0, abs=1e-6)


# --------------------------------------------------------------------------
# g_test
# --------------------------------------------------------------------------


def test_gtest_matches_reference(spark):
    from ups_crossref_etl_spark.operators.stats import g_test

    cells = {("a", "x"): 30, ("a", "y"): 10, ("b", "x"): 15, ("b", "y"): 25}
    rows = [(r, c) for (r, c), k in cells.items() for _ in range(k)]
    df = spark.createDataFrame(rows, ["r", "c"])
    row = g_test(df, "r", "c").collect()[0]
    n = sum(cells.values())
    rt = {"a": 40, "b": 40}
    ct = {"x": 45, "y": 35}
    g = sum(
        round(2.0 * o * math.log(o / (rt[r] * ct[c] / n)) * 1e9)
        for (r, c), o in cells.items()
    ) / 1e9
    assert (row.n, row.dof) == (80, 1)
    assert row.g_stat == pytest.approx(g, abs=2e-6)
    assert row.g_stat > 10.0  # strong association


def test_gtest_independent_table_near_zero(spark):
    from ups_crossref_etl_spark.operators.stats import g_test

    # perfectly proportional table -> G == 0
    rows = (
        [("a", "x")] * 20 + [("a", "y")] * 10
        + [("b", "x")] * 40 + [("b", "y")] * 20
    )
    df = spark.createDataFrame(rows, ["r", "c"])
    row = g_test(df, "r", "c").collect()[0]
    assert row.g_stat == pytest.approx(0.0, abs=1e-6)


# --------------------------------------------------------------------------
# knn_loo_bounded
# --------------------------------------------------------------------------


def test_knn_loo_separated_clusters_perfect(spark):
    from ups_crossref_etl_spark.operators.similarity import knn_loo_bounded

    pts = [
        (1, 0, [0.0, 0.0]), (2, 0, [0.1, 0.0]), (3, 0, [0.0, 0.1]),
        (4, 1, [9.0, 9.0]), (5, 1, [9.1, 9.0]),
    ]
    df = spark.createDataFrame(pts, ["id", "label", "vec"])
    out = {r.label: r for r in
           knn_loo_bounded(df, "vec", "label", "id").collect()}
    assert out[0].accuracy == pytest.approx(1.0)
    assert out[1].accuracy == pytest.approx(1.0)


def test_knn_loo_tie_breaks_on_smaller_id(spark):
    from ups_crossref_etl_spark.operators.similarity import knn_loo_bounded

    # point 3 is equidistant from 1 (label 0) and 5 (label 1);
    # the smaller neighbor id (1) must win -> hit for label 0
    pts = [
        (1, 0, [0.0]), (3, 0, [1.0]), (5, 1, [2.0]),
    ]
    df = spark.createDataFrame(pts, ["id", "label", "vec"])
    out = {r.label: r for r in
           knn_loo_bounded(df, "vec", "label", "id").collect()}
    assert out[0].n_points == 2
    # id=3: tie between 1 and 5 -> neighbor 1, same label -> correct
    # id=1: nearest is 3 (same label) -> correct
    assert out[0].n_correct == 2


# --------------------------------------------------------------------------
# hypothesis properties: the new inference ops vs pure-python references
# --------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=2, deadline=None)
@given(
    st.tuples(
        st.integers(0, 20), st.integers(0, 20),
        st.integers(0, 20), st.integers(0, 20),
    ).filter(lambda t: (t[0] + t[1]) > 0 and (t[2] + t[3]) > 0)
)
def test_fisher_exact_property_vs_reference(spark, cells):
    from ups_crossref_etl_spark.operators.stats import fisher_exact

    a, b, c, d = cells
    rows = (
        [("A", True)] * a + [("A", False)] * b
        + [("B", True)] * c + [("B", False)] * d
    )
    df = spark.createDataFrame(rows, "g string, f boolean")
    row = fisher_exact(df, "g", "f").collect()[0]
    p2, pl, pr = _fisher_reference(a, b, c, d)
    assert row.p_two_sided == pytest.approx(p2, abs=2e-6)
    assert row.p_left == pytest.approx(pl, abs=2e-6)
    assert row.p_right == pytest.approx(pr, abs=2e-6)
    # tails overlap at k = a, so they must cover at least 1
    assert row.p_left + row.p_right >= 1.0 - 1e-6
    assert 0.0 < row.p_two_sided <= 1.0


@settings(max_examples=2, deadline=None)
@given(
    st.lists(st.integers(0, 12), min_size=30, max_size=300),
    st.integers(2, 6),
    st.integers(1, 8),
)
def test_misra_gries_bounds_property(spark, vals, k, parts):
    from ups_crossref_etl_spark.operators.sketches import misra_gries_summary

    df = spark.createDataFrame(
        [(f"v{v}",) for v in vals], "x string"
    ).repartition(parts)
    est = {r.x: r.est_count for r in
           misra_gries_summary(df, "x", k).collect()}
    from collections import Counter

    true = Counter(f"v{v}" for v in vals)
    n = len(vals)
    for v, e in est.items():
        assert 0 < e <= true[v]
    for v, t in true.items():
        assert (t - est.get(v, 0)) * (k + 1) <= n
        if t * (k + 1) > n:
            assert est.get(v, 0) > 0


@settings(max_examples=2, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(-50, 50).map(lambda x: x / 4.0),
            min_size=3, max_size=3,
        ),
        min_size=2, max_size=12,
    )
)
def test_friedman_property_vs_reference(spark, blocks):
    from ups_crossref_etl_spark.operators.stats import friedman_test

    df = spark.createDataFrame(
        _friedman_rows(blocks, ["t1", "t2", "t3"]), ["b", "t", "v"]
    )
    row = friedman_test(df, "b", "t", "v").collect()[0]
    assert row.n_blocks == len(blocks) and row.k_treatments == 3
    n, k = len(blocks), 3
    # reference, guarding the all-ranks-tied degenerate case
    ranks = []
    for vals in blocks:
        ranks.append([
            sum(1 for x in vals if x < v)
            + (sum(1 for x in vals if x == v) + 1) / 2.0
            for v in vals
        ])
    a = sum(r * r for rr in ranks for r in rr)
    c = n * k * (k + 1) ** 2 / 4.0
    if a - c <= 0:
        assert row.q_stat is None
    else:
        rj = [sum(ranks[i][j] for i in range(n)) for j in range(k)]
        dev2 = sum((x - n * (k + 1) / 2.0) ** 2 for x in rj)
        q = (k - 1) * dev2 / (a - c)
        assert row.q_stat == pytest.approx(q, abs=2e-6)
        assert row.kendalls_w is not None
        assert -1e-9 <= row.kendalls_w <= 1.0 + 1e-9


@settings(max_examples=2, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-100, 100).map(lambda x: x / 8.0),
            st.integers(-100, 100).map(lambda x: x / 8.0),
        ),
        min_size=2, max_size=60,
    )
)
def test_wilcoxon_property_vs_reference(spark, pairs):
    from ups_crossref_etl_spark.operators.stats import wilcoxon_signed_rank

    df = spark.createDataFrame(pairs, "x double, y double")
    row = wilcoxon_signed_rank(df, "x", "y").collect()[0]
    n_pairs, nz, wp, z = _wsr_reference(pairs)
    assert (row.n_pairs, row.n_nonzero) == (n_pairs, nz)
    if nz:
        assert row.w_plus == pytest.approx(wp, abs=1e-9)
    if z is None:
        assert row.z is None
    else:
        assert row.z == pytest.approx(z, abs=2e-6)


@settings(max_examples=2, deadline=None)
@given(st.lists(st.integers(0, 9).map(float), min_size=4, max_size=80))
def test_runs_test_property_vs_reference(spark, vals):
    from ups_crossref_etl_spark.operators.stats import runs_test

    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    out = runs_test(df, "k", ["o"], "v").collect()
    # python reference: type-7 interpolated median, drop equals
    svals = sorted(vals)
    n = len(svals)
    if n % 2:
        med = svals[n // 2]
    else:
        med = (svals[n // 2 - 1] + svals[n // 2]) / 2.0
    signs = [v > med for v in vals if v != med]
    if not signs:
        assert out == []
        return
    runs = 1 + sum(1 for i in range(1, len(signs))
                   if signs[i] != signs[i - 1])
    row = out[0]
    assert row.n_runs == runs
    assert row.n_above == sum(signs)
    assert row.n_below == len(signs) - sum(signs)


# --------------------------------------------------------------------------
# cox_ph
# --------------------------------------------------------------------------


def _cox_reference(rows, iterations=8):
    """Plain-python Newton on the Breslow partial likelihood; same
    operation shapes as the operator (per-time sums, suffix risk sets)."""
    def stats(beta):
        # mirrors the operator's per-row micro-quantized integer sums
        times = sorted({t for t, _, _ in rows})
        per = {t: [0, 0, 0, 0, 0] for t in times}  # s0q s1q s2q d sxq
        for t, d, x in rows:
            w = math.exp(beta * x)
            p = per[t]
            p[0] += round(w * 1e6)
            p[1] += round(w * x * 1e6)
            p[2] += round(w * x * x * 1e6)
            p[3] += d
            p[4] += round(d * x * 1e6)
        nll = grad = hess = 0.0
        for i, t in enumerate(times):
            s0 = sum(per[u][0] for u in times[i:]) / 1e6
            s1 = sum(per[u][1] for u in times[i:]) / 1e6
            s2 = sum(per[u][2] for u in times[i:]) / 1e6
            d, sx = per[t][3], per[t][4] / 1e6
            if d == 0:
                continue
            nll -= beta * sx - d * math.log(s0)
            grad += sx - d * s1 / s0
            hess += d * (s2 / s0 - (s1 / s0) ** 2)
        return nll, grad, hess

    beta = 0.0
    nll, grad, hess = stats(beta)
    for _ in range(iterations):
        if hess <= 0:
            break
        step = grad / hess
        scale, accepted = 1.0, False
        for _ in range(10):
            trial = beta + scale * step
            tn, tg, th = stats(trial)
            if tn <= nll:
                beta, nll, grad, hess = trial, tn, tg, th
                accepted = True
                break
            scale *= 0.5
        if not accepted:
            break
        if abs(grad) < 1e-12:
            break
    return beta, nll


def test_cox_ph_recovers_positive_effect(spark):
    from ups_crossref_etl_spark.operators.survival import cox_ph

    # high-x subjects fail early, low-x late or censored -> beta > 0
    rows = []
    for i in range(30):
        x = 1.0 if i % 2 == 0 else -1.0
        if x > 0:
            rows.append((float(1 + i % 5), 1, x))
        else:
            rows.append((float(8 + i % 5), 1 if i % 4 else 0, x))
    df = spark.createDataFrame(rows, "t double, d int, x double")
    fit = cox_ph(df, "t", "d", "x", iterations=8)
    ref_beta, ref_nll = _cox_reference(rows)
    assert fit["n"] == 30
    assert fit["beta"] == pytest.approx(ref_beta, abs=1e-6)
    assert fit["nll_path"][-1] == pytest.approx(ref_nll, abs=1e-6)
    assert fit["beta"] > 0.5
    # monotone non-increasing path by construction
    assert all(
        a >= b - 1e-12
        for a, b in zip(fit["nll_path"], fit["nll_path"][1:])
    )


def test_cox_ph_null_covariate_beta_near_zero(spark):
    from ups_crossref_etl_spark.operators.survival import cox_ph

    # x independent of failure time -> beta ~ 0 and nll barely moves
    rows = [
        (float(1 + i % 7), 1 if i % 3 else 0, 1.0 if i % 2 else -1.0)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "t double, d int, x double")
    fit = cox_ph(df, "t", "d", "x", iterations=8)
    ref_beta, _ = _cox_reference(rows)
    assert fit["beta"] == pytest.approx(ref_beta, abs=1e-6)
    assert abs(fit["beta"]) < 0.5


def test_ranged_cumsum_signed_weights_regression(spark):
    """_ranged_exclusive_cumsum partition totals must be SUM(weights),
    not max(running sum) — with signed weights the running sum is not
    monotone and the max silently corrupts every later partition's
    offset (found via cox_ph's S1 risk sums at 8 shuffle partitions)."""
    from pyspark.sql import functions as F
    from ups_crossref_etl_spark.operators.stats import (
        _ranged_exclusive_cumsum,
    )

    vals = [(i, (3 if i % 2 == 0 else -3)) for i in range(1, 41)]
    df = spark.createDataFrame(vals, "k int, w long")
    out = {
        r.k: r.p
        for r in _ranged_exclusive_cumsum(df, "k", "w", "p").collect()
    }
    run = 0
    for k, w in vals:
        assert out[k] == run, f"prefix wrong at k={k}"
        run += w
