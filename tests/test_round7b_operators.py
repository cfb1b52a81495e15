"""Unit tests for the round-7 wave 3-8 operators: rank statistics,
uncertainty readouts, calibration/AP, corpus audits, ER blocking,
Procrustes, DP simulation, survival, conformal intervals."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ups_crossref_etl_spark.operators.evaluation import (
    lift_table,
    rank_biased_overlap,
)
from ups_crossref_etl_spark.operators.experiment import permutation_test
from ups_crossref_etl_spark.operators.similarity import cosine_pair_histogram
from ups_crossref_etl_spark.operators.stats import (
    gini_coefficient,
    jackknife_ratio_se,
    kendall_tau,
)
from ups_crossref_etl_spark.operators.text_analysis import ngram_novelty
from ups_crossref_etl_spark.operators.timeseries import seasonal_decompose


# ------------------------------------------------------------------ kendall


def test_kendall_perfect_monotone(spark):
    rows = [("g", i, float(i) ** 3) for i in range(8)]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    out = kendall_tau(df, "g", "x", "y").first()
    assert out["tau_b"] == 1.0
    assert out["concordant"] == 28 and out["discordant"] == 0


def test_kendall_reversed(spark):
    rows = [("g", i, float(-i)) for i in range(8)]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    assert kendall_tau(df, "g", "x", "y").first()["tau_b"] == -1.0


def test_kendall_ties_manual_parity(spark):
    # scipy.stats.kendalltau(x, y, variant='b') == 0.5443310539518174
    xs = [1, 2, 2, 3, 4, 5]
    ys = [1.0, 3.0, 2.0, 2.0, 4.0, 4.0]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x long, y double"
    )
    out = kendall_tau(df, "g", "x", "y").first()
    n = len(xs)
    c = d = n1 = n2 = 0
    for i in range(n):
        for j in range(i + 1, n):
            sx = (xs[j] > xs[i]) - (xs[j] < xs[i])
            sy = (ys[j] > ys[i]) - (ys[j] < ys[i])
            if sx == 0:
                n1 += 1
            if sy == 0:
                n2 += 1
            if sx != 0 and sy != 0:
                if sx == sy:
                    c += 1
                else:
                    d += 1
    n0 = n * (n - 1) // 2
    tau = (c - d) / math.sqrt((n0 - n1) * (n0 - n2))
    assert out["concordant"] == c and out["discordant"] == d
    assert abs(out["tau_b"] - round(tau, 6)) < 1e-12


def test_kendall_cap_bounds_pairs(spark):
    rows = [("g", i, float(i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    out = kendall_tau(df, "g", "x", "y", max_points_per_key=10).first()
    # stride = ceil(100/10) = 10 -> exactly 10 points kept
    assert out["n_points"] == 10
    # deterministic: same call twice gives identical tau
    out2 = kendall_tau(df, "g", "x", "y", max_points_per_key=10).first()
    assert out["tau_b"] == out2["tau_b"]


# -------------------------------------------------------------------- gini


def test_gini_equal_is_zero(spark):
    df = spark.createDataFrame(
        [("g", i, 100) for i in range(10)], "g string, id long, v long"
    )
    assert gini_coefficient(df, "g", "v", "id").first()["gini"] == 0.0


def test_gini_hand_case(spark):
    # values 0, v -> G = 2*(1*0 + 2*v)/(2*v) ... = 0.5 (max for n=2)
    df = spark.createDataFrame(
        [("g", 1, 0), ("g", 2, 500)], "g string, id long, v long"
    )
    out = gini_coefficient(df, "g", "v", "id").first()
    assert out["gini"] == 0.5 and out["total"] == 500 and out["n"] == 2


def test_gini_zero_total_guard(spark):
    df = spark.createDataFrame(
        [("g", 1, 0), ("g", 2, 0)], "g string, id long, v long"
    )
    assert gini_coefficient(df, "g", "v", "id").first()["gini"] == 0.0


# --------------------------------------------------------------- jackknife


def test_jackknife_manual_parity(spark):
    data = [("a", 10.0, 2.0), ("a", 20.0, 3.0), ("b", 5.0, 1.0),
            ("c", 40.0, 10.0), ("c", 10.0, 4.0)]
    df = spark.createDataFrame(data, "g string, num double, den double")
    out = jackknife_ratio_se(df, "g", "num", "den").first()
    sums = {}
    for g, n, d in data:
        sn, sd = sums.get(g, (0.0, 0.0))
        sums[g] = (sn + n, sd + d)
    tn = sum(v[0] for v in sums.values())
    td = sum(v[1] for v in sums.values())
    thetas = [
        round((tn - sn) / (td - sd) * 1e9) / 1e9 for sn, sd in sums.values()
    ]
    g = len(thetas)
    mean = sum(thetas) / g
    se = math.sqrt((g - 1) / g * sum((t - mean) ** 2 for t in thetas))
    assert out["n_groups"] == g
    assert abs(out["theta_hat"] - round(tn / td, 6)) < 1e-12
    assert abs(out["jackknife_se"] - se) < 1e-5


# ------------------------------------------------------------- permutation


def test_permutation_obvious_difference(spark):
    rows = [(i, "a", 100.0) for i in range(40)] + [
        (i + 1000, "b", 1.0) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = permutation_test(df, "id", "grp", "v", "a", "b", 100).first()
    assert out["n_a"] == 40 and out["n_b"] == 40
    assert out["t_obs"] == 99.0
    assert out["p_value"] <= 0.05  # relabeling can't reproduce a 99-gap


def test_permutation_deterministic(spark):
    rows = [(i, "a" if i % 2 else "b", float(i % 13)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    r1 = permutation_test(df, "id", "grp", "v", "a", "b", 50).first()
    r2 = permutation_test(df, "id", "grp", "v", "a", "b", 50).first()
    assert r1 == r2
    assert 0.0 < r1["p_value"] <= 1.0


# -------------------------------------------------------------------- lift


def test_lift_perfect_scorer(spark):
    # 100 rows, top-20 scores are exactly the positives
    rows = [(i, float(1000 - i), 1 if i < 20 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, s double, y int")
    out = {r["tile"]: r for r in lift_table(df, "s", "y", "id", 10).collect()}
    assert out[1]["n_pos"] == 10 and out[2]["n_pos"] == 10
    assert out[2]["capture"] == 1.0  # all positives inside top 2 deciles
    assert out[1]["lift"] == 5.0  # precision 1.0 over base rate 0.2
    assert out[10]["lift"] == 1.0 and out[10]["cum_n"] == 100


# --------------------------------------------------------------------- rbo


def test_rbo_identical_and_disjoint(spark):
    a = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "id long, rank long"
    )
    b = spark.createDataFrame(
        [(i + 100, i + 1) for i in range(50)], "id long, rank long"
    )
    same = rank_biased_overlap(a, a, "id", "rank", 50, 0.9).first()
    # identical truncated lists: RBO_d = 1 - p^d
    assert abs(same["rbo"] - (1 - 0.9**50)) < 1e-5
    assert same["n_overlap"] == 50
    disj = rank_biased_overlap(a, b, "id", "rank", 50, 0.9).first()
    assert disj["rbo"] == 0.0 and disj["n_overlap"] == 0


# ----------------------------------------------------------------- novelty


def test_ngram_novelty_extremes(spark):
    rows = [
        (0, "alpha beta gamma delta", True),
        (1, "alpha beta gamma delta", False),  # identical to ref -> 0.0
        (2, "zip zap zop quux quark", False),  # fully novel -> 1.0
        (3, "hi", False),  # short doc: one full-text gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_ref boolean")
    out = {r["doc_id"]: r for r in
           ngram_novelty(df, "text", "doc_id", "is_ref", k=3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["novelty"] == 0.0 and out[1]["n_grams"] == 2
    assert out[2]["novelty"] == 1.0
    assert out[3]["n_grams"] == 1 and out[3]["novelty"] == 1.0


# --------------------------------------------------------------- cosine hist


def test_cosine_histogram_extremes(spark):
    rows = [
        (1, [1.0, 0.0]), (2, [1.0, 0.0]),      # cos(1,2) = 1 -> bin 19
        (3, [0.0, 1.0]), (4, [0.0, -1.0]),     # cos(3,4) = -1 -> bin 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_pair_histogram(df, "vec_id", "embedding", offsets=[1], n_bins=20)
    got = {(r["bin"]): r["n_pairs"] for r in out.collect()}
    assert got[19] >= 1 and got[0] >= 1
    assert sum(got.values()) == 3  # pairs (1,2) (2,3) (3,4)


# ---------------------------------------------------------------- seasonal


def test_seasonal_constant_series_is_flat(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = [(t0 + timedelta(hours=h), 10.0) for h in range(24 * 5)]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = seasonal_decompose(df, "ts", "v", period=24, ma_window=25).collect()
    assert len(out) == 24
    assert all(r["seasonal_idx"] == 0.0 for r in out)


def test_seasonal_detects_hot_phase(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    # hour 0 of each day is 10x hotter
    rows = [
        (t0 + timedelta(hours=h), 100.0 if h % 24 == 0 else 10.0)
        for h in range(24 * 10)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = {r["phase"]: r["seasonal_idx"] for r in
           seasonal_decompose(df, "ts", "v", period=24, ma_window=25).collect()}
    assert out[0] == max(out.values()) and out[0] > 50
    assert all(v < 0 for p, v in out.items() if p not in (0, 12))


# ------------------------------------------------------------- decayed score


def test_decayed_score_halving(spark):
    from datetime import datetime

    from ups_crossref_etl_spark.operators.timeseries import decayed_score

    anchor = 1706745600  # 2024-02-01 00:00:00 UTC
    rows = [
        ("u", datetime(2024, 2, 1, 0, 0, 0), 8.0),    # dt=0    -> 8
        ("u", datetime(2024, 1, 31, 0, 0, 0), 8.0),   # dt=24h  -> 4
        ("u", datetime(2024, 1, 30, 0, 0, 0), 8.0),   # dt=48h  -> 2
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = decayed_score(df, "k", "ts", "v", 24.0, anchor).first()
    assert out["n_events"] == 3 and out["decayed_score"] == 14.0


# -------------------------------------------------------------- association


def test_association_independent_and_identical(spark):
    from ups_crossref_etl_spark.operators.association import (
        categorical_association,
    )

    # perfectly independent 2x2 with equal margins: MI = 0, chi2 = 0
    rows = [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    out = categorical_association(df, "a", "b").first()
    assert out["mi"] == 0.0 and out["chi2"] == 0.0
    assert out["nmi"] == 0.0 and out["cramers_v"] == 0.0
    # identical columns: MI = H(A), NMI = 1, V = 1
    rows2 = [("x", "x"), ("y", "y"), ("z", "z")] * 10
    df2 = spark.createDataFrame(rows2, "a string, b string")
    o2 = categorical_association(df2, "a", "b").first()
    import math

    assert abs(o2["mi"] - math.log(3)) < 1e-5
    assert o2["nmi"] == 1.0 and o2["cramers_v"] == 1.0
    assert o2["h_a"] == o2["h_b"]


def test_association_null_level(spark):
    from ups_crossref_etl_spark.operators.association import (
        categorical_association,
    )

    rows = [("x", "p"), (None, "q"), ("x", None), (None, None)]
    df = spark.createDataFrame(rows, "a string, b string")
    out = categorical_association(df, "a", "b").first()
    assert out["n_rows"] == 4 and out["n_cells"] == 4  # NULL is a level


# ----------------------------------------------------------- weighted median


def test_weighted_median_mass_pull(spark):
    from ups_crossref_etl_spark.operators.association import weighted_median

    # plain median of values is 3; weight pulls it to 1
    rows = [("g", 1, 1, 10), ("g", 2, 2, 1), ("g", 3, 3, 1),
            ("g", 4, 4, 1), ("g", 5, 5, 1)]
    df = spark.createDataFrame(rows, "g string, id long, v long, w long")
    out = weighted_median(df, "g", "v", "w", "id").first()
    assert out["weighted_median"] == 1 and out["total_weight"] == 14
    assert out["n"] == 5


def test_weighted_median_even_split_lower(spark):
    from ups_crossref_etl_spark.operators.association import weighted_median

    # W = 4, first row reaches 2*2 >= 4 -> lower median = 10
    rows = [("g", 1, 10, 2), ("g", 2, 20, 2)]
    df = spark.createDataFrame(rows, "g string, id long, v long, w long")
    assert weighted_median(df, "g", "v", "w", "id").first()[
        "weighted_median"
    ] == 10


# ---------------------------------------------------------------- isotonic


def test_isotonic_pools_violators(spark):
    from ups_crossref_etl_spark.operators.evaluation import isotonic_calibrate

    # 3 bins x 10 rows; rates in score order: 0.2, 0.6, 0.4 -> PAVA pools
    # the last two to 0.5
    rows = []
    i = 0
    for b, rate in [(0, 0.2), (1, 0.6), (2, 0.4)]:
        for j in range(10):
            rows.append((i, float(b * 10 + j), 1 if j < rate * 10 else 0))
            i += 1
    df = spark.createDataFrame(rows, "id long, s double, y int")
    out = {r["bin"]: r for r in
           isotonic_calibrate(df, "s", "y", "id", n_bins=3).collect()}
    assert out[1]["fitted"] == 0.2
    assert out[2]["fitted"] == 0.5 and out[3]["fitted"] == 0.5
    # monotone non-decreasing in score order
    fits = [out[b]["fitted"] for b in sorted(out)]
    assert fits == sorted(fits)


def test_isotonic_identity_when_monotone(spark):
    from ups_crossref_etl_spark.operators.evaluation import isotonic_calibrate

    rows = []
    i = 0
    for b, rate in [(0, 0.1), (1, 0.5), (2, 0.9)]:
        for j in range(10):
            rows.append((i, float(b * 10 + j), 1 if j < rate * 10 else 0))
            i += 1
    df = spark.createDataFrame(rows, "id long, s double, y int")
    for r in isotonic_calibrate(df, "s", "y", "id", n_bins=3).collect():
        assert r["fitted"] == r["rate"]


# --------------------------------------------------------------------- ap


def test_average_precision_extremes(spark):
    from ups_crossref_etl_spark.operators.evaluation import average_precision

    # perfect ranking: all positives first -> AP = 1
    rows = [(i, float(100 - i), 1 if i < 5 else 0) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, s double, y int")
    assert average_precision(df, "s", "y", "id").first()["ap"] == 1.0
    # worst ranking: positives last -> AP = small, computed by hand
    rows2 = [(i, float(100 - i), 1 if i >= 15 else 0) for i in range(20)]
    df2 = spark.createDataFrame(rows2, "id long, s double, y int")
    expect = sum((k + 1) / (15 + k + 1) for k in range(5)) / 5
    got = average_precision(df2, "s", "y", "id").first()["ap"]
    assert abs(got - expect) < 1e-6


# ------------------------------------------------------------ separability


def test_separability_clustered_vs_shuffled(spark):
    from ups_crossref_etl_spark.operators.similarity import (
        embedding_separability,
    )

    rows = []
    for i in range(40):
        base = 1.0 if i % 2 == 0 else -1.0
        jit = (i % 5) * 0.01
        rows.append((i, i % 2, [base + jit, -base + jit]))
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    tight = embedding_separability(df, "embedding", "label").first()
    assert tight["n_vecs"] == 40 and tight["n_labels"] == 2
    assert tight["fisher_ratio"] > 100  # clusters far apart, tiny within
    # random labels on the same vectors: between collapses
    df2 = df.withColumn("label", (F.col("vec_id") % 4 < 2).cast("long"))
    loose = embedding_separability(df2, "embedding", "label").first()
    assert loose["fisher_ratio"] < tight["fisher_ratio"] / 10


# ------------------------------------------------------------ nelson-aalen


def test_nelson_aalen_hand_case(spark):
    from datetime import datetime, timedelta

    from ups_crossref_etl_spark.operators.survival import nelson_aalen

    t0 = datetime(2024, 1, 1)
    rows = []
    # 4 users sign up at t0; users 0,1 purchase after 1h, user 2 after 2h,
    # user 3 never (censored at horizon)
    for u in range(4):
        rows.append((u, "signup", t0))
    rows += [
        (0, "purchase", t0 + timedelta(hours=1, minutes=10)),
        (1, "purchase", t0 + timedelta(hours=1, minutes=20)),
        (2, "purchase", t0 + timedelta(hours=2, minutes=30)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r["t"]: r for r in nelson_aalen(
        df, "user_id", "event_type", "ts",
        entry_type="signup", event_type="purchase",
        horizon_seconds=7 * 24 * 3600, bucket_seconds=3600,
    ).collect()}
    # t=1: 2 events of 4 at risk -> H = 0.5 ; t=2: 1 of 2 -> H = 1.0
    assert out[1]["n_risk"] == 4 and out[1]["n_events"] == 2
    assert out[1]["cum_hazard"] == 0.5
    assert out[2]["n_risk"] == 2 and out[2]["cum_hazard"] == 1.0


# ------------------------------------------------------------ vocab richness


def test_vocab_richness_hand_case(spark):
    from ups_crossref_etl_spark.operators.text_analysis import vocab_richness

    # tokens: a a a b b c d -> N=7, D=4, f1=2 (c,d), f2=1 (b)
    df = spark.createDataFrame([("a a a b b c d",)], "text string")
    out = vocab_richness(df, "text").first()
    assert out["n_tokens"] == 7 and out["n_distinct"] == 4
    assert out["f1"] == 2 and out["f2"] == 1
    assert out["chao1"] == 4.5  # 4 + 2*1/(2*2)
    import math

    assert math.isclose(out["coverage"], 1 - 2 / 7, abs_tol=1e-6)


# --------------------------------------------------------------------- qq


def test_qq_table_shifted_distribution(spark):
    from ups_crossref_etl_spark.operators.stats import qq_table

    rows = [("a", float(i)) for i in range(1, 101)] + [
        ("b", float(i + 10)) for i in range(1, 101)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = qq_table(df, "g", "v", "a", "b", n_quantiles=10).collect()
    assert len(out) == 9
    for r in out:
        assert r["diff"] == 10.0  # constant shift at every decile
        assert r["value_a"] == float(r["q"] * 10)  # decile of 1..100


# -------------------------------------------------------------- burstiness


def test_burstiness_regular_vs_bursty(spark):
    from datetime import datetime, timedelta

    from ups_crossref_etl_spark.operators.timeseries import interevent_stats

    t0 = datetime(2024, 1, 1)
    rows = [("reg", t0 + timedelta(seconds=60 * i), i) for i in range(20)]
    # bursty: 10 events in one second, then a huge gap, repeated
    k = 0
    for burst in range(4):
        for j in range(5):
            rows.append(
                ("bur", t0 + timedelta(seconds=burst * 10000 + j), 100 + k)
            )
            k += 1
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long")
    out = {r["k"]: r for r in
           interevent_stats(df, "k", "ts", "id").collect()}
    assert out["reg"]["burstiness"] == -1.0  # zero variance pulse
    assert out["reg"]["mean_gap_s"] == 60.0 and out["reg"]["cv"] == 0.0
    assert out["bur"]["burstiness"] > 0.3  # heavy-tailed gaps (0.395 here)


# ------------------------------------------------- sorted neighborhood


def test_sorted_neighborhood_budget_and_catch(spark):
    from ups_crossref_etl_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    rows = [(1, "smith john"), (2, "smith jon"), (3, "smith johnn"),
            (4, "zzz far away"), (5, "aaa start")]
    df = spark.createDataFrame(rows, "id long, name string")
    pairs = sorted_neighborhood_pairs(df, "name", "id", window=2).collect()
    # budget: at most n*window pairs
    assert len(pairs) <= 5 * 2
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # the three smith variants sort adjacently -> all caught within w=2
    assert (2, 1) in got or (1, 2) in got
    assert (1, 3) in got or (3, 1) in got


# --------------------------------------------------------------- dp noise


def test_dp_noisy_counts_reproducible_and_noisy(spark):
    from ups_crossref_etl_spark.operators.privacy import dp_noisy_counts

    rows = [(f"g{i % 3}",) for i in range(300)]
    df = spark.createDataFrame(rows, "g string")
    a = {r["g"]: r["noisy_count"] for r in
         dp_noisy_counts(df, "g", epsilon=1.0).collect()}
    b = {r["g"]: r["noisy_count"] for r in
         dp_noisy_counts(df, "g", epsilon=1.0).collect()}
    assert a == b  # seeded -> reproducible
    # noise is present but Laplace(1)-scale: within +-40 of 100 w.h.p.
    for v in a.values():
        assert v != 100.0 and abs(v - 100.0) < 40
    c = {r["g"]: r["noisy_count"] for r in
         dp_noisy_counts(df, "g", epsilon=1.0, seed="other").collect()}
    assert c != a  # different seed -> different draw
    # true counts must NOT appear in the schema
    assert dp_noisy_counts(df, "g").columns == ["g", "noisy_count"]


# -------------------------------------------------------------- procrustes


def test_procrustes_recovers_rotation(spark):
    import numpy as np

    from ups_crossref_etl_spark.operators.pca import (
        procrustes_apply,
        procrustes_fit,
    )

    rng = [
        [((i * 37 + j * 11) % 19 - 9) / 7.0 for j in range(6)]
        for i in range(50)
    ]
    # y = x @ P for a known permutation-with-signs P, plus a shift
    perm = [3, 0, 5, 1, 4, 2]
    signs = [1, -1, 1, 1, -1, 1]
    ys = [
        [signs[k] * row[perm[k]] + 0.25 for k in range(6)] for row in rng
    ]
    df = spark.createDataFrame(
        [(i, rng[i], ys[i]) for i in range(50)],
        "id long, x array<double>, y array<double>",
    )
    m = procrustes_fit(df, "x", "y")
    assert m.n == 50
    # rotation is orthogonal
    assert np.allclose(m.rotation @ m.rotation.T, np.eye(6), atol=1e-8)
    out = procrustes_apply(df, m, "x", "a").collect()
    for r in out:
        assert max(abs(p - q) for p, q in zip(r["a"], r["y"])) < 1e-8


# --------------------------------------------------------------------- did


def test_did_nets_out_preexisting_gap(spark):
    from datetime import datetime

    from ups_crossref_etl_spark.operators.experiment import did_readout
    from ups_crossref_etl_spark.operators.sampling import hash_bucket

    pre = datetime(2024, 1, 10)
    post = datetime(2024, 1, 20)
    # find which arm each user lands in, then build values so that arm B
    # carries a constant +5 level in BOTH periods and a true +2 lift post
    probe = spark.createDataFrame([(u,) for u in range(40)], "u long")
    arms = {
        r["u"]: r["bucket"]
        for r in probe.select(
            "u", hash_bucket(F.col("u"), "ab", 2)
        ).collect()
    }
    rows = []
    for u in range(40):
        lvl = 5.0 if arms[u] == 1 else 0.0
        lift = 2.0 if arms[u] == 1 else 0.0
        rows.append((u, pre, 10.0 + lvl))
        rows.append((u, post, 10.0 + lvl + lift))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = did_readout(
        df, "user_id", "ts", "value", split_ts="2024-01-16 00:00:00"
    ).first()
    assert out["n_users"] == 40
    # plain post diff would read ~7; DiD reads exactly the 2.0 lift
    assert out["did"] == 2.0
    assert out["post_b"] - out["post_a"] == 7.0


# ------------------------------------------------------------ mann-whitney


def test_mann_whitney_scipy_parity(spark):
    from ups_crossref_etl_spark.operators.stats import mann_whitney

    xs = [1.0, 2.0, 2.0, 4.0, 9.0]   # group a
    ys = [2.0, 3.0, 5.0, 5.0, 6.0, 8.0]  # group b
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    out = mann_whitney(df, "g", "v", "a", "b").first()
    # manual tie-aware U: count wins + half-ties over cross pairs
    u = sum(
        1.0 if x > y else (0.5 if x == y else 0.0) for x in xs for y in ys
    )
    assert out["u_a"] == u
    assert out["n_a"] == 5 and out["n_b"] == 6
    # cliff's delta from the same U
    assert abs(out["cliffs_delta"] - (2 * u / 30 - 1)) < 1e-6


def test_mann_whitney_shifted_distribution_sign(spark):
    from ups_crossref_etl_spark.operators.stats import mann_whitney

    rows = [("a", float(i)) for i in range(50)] + [
        ("b", float(i + 30)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = mann_whitney(df, "g", "v", "a", "b").first()
    assert out["z"] < -3  # a is stochastically smaller
    assert out["cliffs_delta"] < -0.5


# --------------------------------------------------------------- conformal


def test_conformal_coverage_guarantee(spark):
    from ups_crossref_etl_spark.operators.evaluation import conformal_interval

    rows = [
        (i, "g" + str(i % 3), float((i * 37) % 100)) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = conformal_interval(df, "g", "v", "id", alpha=0.1).first()
    assert out["n_cal"] + out["n_eval"] == 2000
    assert out["target"] == 0.9
    # exchangeable data: coverage concentrates near/above 1 - alpha
    assert out["coverage"] >= 0.85
    assert out["q_hat"] > 0


# --------------------------------------------------------------- interleave


def test_interleaved_order_round_robin(spark):
    from ups_crossref_etl_spark.operators.corpus import interleaved_order

    rows = [(i, "dom" + str(i % 4)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, dom string")
    out = interleaved_order(df, "id", "dom").collect()
    assert sorted(r["pos"] for r in out) == list(range(1, 41))
    # round-robin: every consecutive block of 4 positions holds 4 domains
    by_pos = {r["pos"]: r["dom"] for r in out}
    for block in range(10):
        doms = {by_pos[block * 4 + i] for i in range(1, 5)}
        assert len(doms) == 4
    # deterministic under re-run; different seed reshuffles
    again = interleaved_order(df, "id", "dom").collect()
    assert {(r["id"], r["pos"]) for r in again} == {
        (r["id"], r["pos"]) for r in out
    }
    other = interleaved_order(df, "id", "dom", seed="epoch2").collect()
    assert {(r["id"], r["pos"]) for r in other} != {
        (r["id"], r["pos"]) for r in out
    }


# -------------------------------------------------------------------- hits


def test_hits_star_graph(spark):
    from ups_crossref_etl_spark.operators.pagerank import hits

    # star: 1..4 all point at 5 -> 5 is the sole authority, 1..4 equal hubs
    edges = spark.createDataFrame(
        [(i, 5) for i in range(1, 5)], "src long, dst long"
    )
    out = {r["node"]: r for r in hits(edges, n_iter=2).collect()}
    assert out[5]["authority"] == 1.0 and out[5]["hub"] == 0.0
    for i in range(1, 5):
        assert out[i]["authority"] == 0.0
        assert out[i]["hub"] == 0.25


def test_hits_deterministic(spark):
    from ups_crossref_etl_spark.operators.pagerank import hits

    edges = spark.createDataFrame(
        [(i, (i * 7) % 11) for i in range(30) if i != (i * 7) % 11],
        "src long, dst long",
    )
    r1 = sorted(map(tuple, hits(edges, n_iter=3).collect()))
    r2 = sorted(map(tuple, hits(edges, n_iter=3).collect()))
    assert r1 == r2


# ---------------------------------------------------------- clustering coef


def test_clustering_coefficient_triangle_vs_path(spark):
    from ups_crossref_etl_spark.operators.graph import clustering_coefficient

    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    out = clustering_coefficient(tri).first()
    assert out["n_triangles"] == 1 and out["n_wedges"] == 3
    assert out["global_cc"] == 1.0
    path = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    p = clustering_coefficient(path).first()
    assert p["n_triangles"] == 0 and p["global_cc"] == 0.0
    assert p["n_wedges"] == 1


# ------------------------------------------------------------------ ols_xy


def test_ols_xy_exact_line(spark):
    from ups_crossref_etl_spark.operators.stats import ols_xy

    rows = [("g", float(x), 3.0 * x + 2.0) for x in range(10)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = ols_xy(df, "g", "x", "y").first()
    assert out["slope"] == 3.0 and out["intercept"] == 2.0
    assert out["r2"] == 1.0 and out["n_points"] == 10


def test_ols_xy_drops_degenerate(spark):
    from ups_crossref_etl_spark.operators.stats import ols_xy

    rows = [("g", 1.0, float(y)) for y in range(5)]  # zero x-variance
    df = spark.createDataFrame(rows, "g string, x double, y double")
    assert ols_xy(df, "g", "x", "y").count() == 0


# ------------------------------------------------------------- compression


def test_compression_ratio_orders_repetition(spark):
    from ups_crossref_etl_spark.operators.text_analysis import (
        compression_ratio,
    )

    import random

    rng = random.Random(7)
    words = ["alpha", "brick", "crane", "delta", "ember", "frost", "gleam"]
    prose = " ".join(rng.choice(words) + str(rng.randint(0, 999))
                     for _ in range(400))
    rows = [(1, "spam ham jam " * 300), (2, prose)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           compression_ratio(df, "text", "doc_id").collect()}
    assert out[1]["ratio"] < out[2]["ratio"]
    assert out[1]["ratio"] < 0.05  # pure repetition deflates to ~nothing
    for r in out.values():
        assert r["n_compressed"] < r["n_bytes"]
    # deterministic across runs (zlib level pinned)
    again = {r["doc_id"]: r["ratio"] for r in
             compression_ratio(df, "text", "doc_id").collect()}
    assert again == {k: v["ratio"] for k, v in out.items()}


# ------------------------------------------------------------ trimmed mean


def test_trimmed_mean_drops_outliers(spark):
    from ups_crossref_etl_spark.operators.stats import trimmed_mean

    vals = [1000.0] + [float(i) for i in range(10, 19)]  # one huge outlier
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    out = trimmed_mean(df, "g", "v", trim_frac=0.1).first()
    # n=10, k=1: drop min (10) and max (1000) -> mean of 11..18 = 14.5
    assert out["n"] == 10 and out["n_used"] == 8
    assert out["trimmed_mean"] == 14.5


# ------------------------------------------------------------- ks two-sample


def test_ks_two_sample_identical_and_shifted(spark):
    from ups_crossref_etl_spark.operators.stats import ks_two_sample_by_key

    same = [("k", True, float(i % 10)) for i in range(50)] + [
        ("k", False, float(i % 10)) for i in range(50)
    ]
    df = spark.createDataFrame(same, "k string, f boolean, v double")
    out = ks_two_sample_by_key(df, "k", "f", "v").first()
    assert out["ks_d"] == 0.0 and out["p_value"] == 1.0
    shifted = [("k", True, float(i)) for i in range(50)] + [
        ("k", False, float(i + 45)) for i in range(50)
    ]
    df2 = spark.createDataFrame(shifted, "k string, f boolean, v double")
    o2 = ks_two_sample_by_key(df2, "k", "f", "v").first()
    assert o2["ks_d"] == 0.9 and o2["p_value"] < 1e-6


# ---------------------------------------------------------------------- bh


def test_bh_fdr_stepup_rule(spark):
    from ups_crossref_etl_spark.operators.stats import bh_fdr

    # classic example: m=5, q=0.25; p=(.01,.04,.1,.12,.9)
    # thresholds: .05,.10,.15,.20,.25 -> largest k with p<=thr is k=4
    rows = [("a", 0.01), ("b", 0.04), ("c", 0.1), ("d", 0.12), ("e", 0.9)]
    df = spark.createDataFrame(rows, "k string, p double")
    out = {r["k"]: r for r in bh_fdr(df, "k", "p", q=0.25).collect()}
    assert [out[k]["rejected"] for k in "abcd"] == [True] * 4
    assert out["e"]["rejected"] is False
    # note c (p=.1 > its own threshold .15? no: .1 <= .15 ok) and d pull
    # in everything below rank 4 even though nothing changes for e
    assert out["d"]["p_rank"] == 4 and out["d"]["n_tests"] == 5
