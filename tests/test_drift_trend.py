"""Round-7 drift/trend operators: KS, chi-square, Mann–Kendall, ACF.

The gated queries pin oracle parity at sf0.01; these tests pin the
hand-checkable small-case semantics and the documented edge contracts
(undefined-statistic rows dropped, caps reproducible, known closed
forms).
"""

from __future__ import annotations

import math
from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ups_crossref_etl_spark.operators.stats import chisq_drift, ks_drift
from ups_crossref_etl_spark.operators.timeseries import acf, mann_kendall


def _ts(i: int) -> datetime:
    return datetime(2024, 1, 1, 0, i)


def test_ks_drift_identical_samples_zero_and_disjoint_one(spark):
    rows = []
    # group "same": both cohorts see the identical values -> D = 0
    for i in range(10):
        rows.append(Row(g="same", v=float(i % 5), b=i % 2))
    # group "split": cohort 0 sees {0..4}, cohort 1 sees {10..14} -> D = 1
    for i in range(10):
        rows.append(Row(g="split", v=float(i % 5 + (10 if i % 2 else 0)), b=i % 2))
    # group "only_a": single cohort -> dropped (D undefined)
    for i in range(4):
        rows.append(Row(g="only_a", v=float(i), b=0))
    df = spark.createDataFrame(rows)
    out = {r["g"]: r for r in ks_drift(df, "g", "v", F.col("b") == 1).collect()}
    assert set(out) == {"same", "split"}
    assert out["same"]["ks_stat"] == 0.0
    assert out["split"]["ks_stat"] == 1.0
    assert out["split"]["n_a"] == 5 and out["split"]["n_b"] == 5


def test_chisq_drift_identical_mix_is_zero(spark):
    rows = [Row(c=c, b=b) for c in ("x", "y", "z") for b in (0, 1) for _ in range(7)]
    out = chisq_drift(spark.createDataFrame(rows), "c", F.col("b") == 1).collect()
    assert len(out) == 1
    r = out[0]
    assert r["chi2"] == 0.0
    assert r["dof"] == 2 and r["n_cats"] == 3
    assert r["n_a"] == 21 and r["n_b"] == 21


def test_chisq_drift_matches_textbook_2x2(spark):
    # 2x2 table: a=[30 good, 10 bad], b=[20 good, 20 bad]
    rows = (
        [Row(c="good", b=0)] * 30
        + [Row(c="bad", b=0)] * 10
        + [Row(c="good", b=1)] * 20
        + [Row(c="bad", b=1)] * 20
    )
    r = chisq_drift(spark.createDataFrame(rows), "c", F.col("b") == 1).collect()[0]
    # chi2 = N(ad-bc)^2 / (r1 r2 c1 c2) = 80*(30*20-10*20)^2/(40*40*50*30)
    expected = 80 * (30 * 20 - 10 * 20) ** 2 / (40 * 40 * 50 * 30)
    assert r["chi2"] == pytest.approx(expected, abs=1e-4)


def test_mann_kendall_monotone_series(spark):
    # strictly increasing, no ties: S = n(n-1)/2, z = (S-1)/sqrt(var)
    n = 10
    df = spark.createDataFrame(
        [Row(k=1, ts=_ts(i), v=float(i)) for i in range(n)]
    )
    r = mann_kendall(df, "k", "ts", "v").collect()[0]
    s_exp = n * (n - 1) // 2
    var = n * (n - 1) * (2 * n + 5) / 18.0
    assert r["s_stat"] == s_exp
    assert r["z"] == pytest.approx((s_exp - 1) / math.sqrt(var), abs=1e-4)
    # strictly decreasing mirrors to -S
    df2 = spark.createDataFrame(
        [Row(k=1, ts=_ts(i), v=float(-i)) for i in range(n)]
    )
    r2 = mann_kendall(df2, "k", "ts", "v").collect()[0]
    assert r2["s_stat"] == -s_exp
    assert r2["z"] == pytest.approx(-(s_exp - 1) / math.sqrt(var), abs=1e-4)


def test_mann_kendall_all_ties_zero_variance(spark):
    # constant series: every pairwise sign is 0 AND the tie correction
    # wipes the variance -> z = 0 by the var<=0 guard, not NaN
    df = spark.createDataFrame([Row(k=1, ts=_ts(i), v=3.0) for i in range(6)])
    r = mann_kendall(df, "k", "ts", "v").collect()[0]
    assert r["s_stat"] == 0 and r["z"] == 0.0


def test_mann_kendall_cap_reproducible(spark):
    df = spark.createDataFrame(
        [Row(k=1, ts=_ts(i), v=float((i * 7) % 13)) for i in range(50)]
    )
    a = mann_kendall(df, "k", "ts", "v", max_points_per_key=10).collect()[0]
    b = mann_kendall(df, "k", "ts", "v", max_points_per_key=10).collect()[0]
    assert a == b
    assert a["n_points"] == 10


def test_acf_lag_structure_and_zero_variance_drop(spark):
    # period-2 alternating series: acf(1) ~ -1, acf(2) ~ +1 (biased
    # estimator shrinks toward 0 by (n-L)/n-ish factors, so just check
    # signs and ordering); constant series must be dropped entirely
    rows = [Row(k=1, ts=_ts(i), v=float(i % 2)) for i in range(20)]
    rows += [Row(k=2, ts=_ts(i), v=5.0) for i in range(20)]
    out = acf(spark.createDataFrame(rows), "k", "ts", "v", max_lag=2).collect()
    by = {(r["k"], r["lag"]): r["acf_val"] for r in out}
    assert set(k for k, _ in by) == {1}
    assert by[(1, 1)] < -0.8
    assert by[(1, 2)] > 0.8


def test_acf_white_noise_near_zero(spark):
    import random

    rnd = random.Random(7)
    rows = [Row(k=1, ts=_ts(i), v=rnd.gauss(0, 1)) for i in range(60)]
    out = acf(spark.createDataFrame(rows), "k", "ts", "v", max_lag=3).collect()
    for r in out:
        assert abs(r["acf_val"]) < 0.45


def test_holt_linear_hand_recursion(spark):
    import datetime as dt

    from ups_crossref_etl_spark.operators.timeseries import (
        holt_linear_smoothing,
    )

    base = dt.datetime(2024, 1, 1)
    ys = [10.0, 12.0, 13.0, 17.0, 16.0]
    rows = [
        (1, i, base + dt.timedelta(hours=i), y) for i, y in enumerate(ys)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = holt_linear_smoothing(
        df, "user_id", "ts", "value", "event_id", alpha=0.5, beta=0.25
    ).first()
    l, b = ys[0], ys[1] - ys[0]
    for y in ys[1:]:
        prev = l
        l = 0.5 * y + 0.5 * (l + b)
        b = 0.25 * (l - prev) + 0.75 * b
    assert out["n_points"] == 5
    assert out["level"] == round(l, 4)
    assert out["trend"] == round(b, 6)
    assert out["forecast_1"] == round(l + b, 4)


def test_holt_linear_tracks_ramp(spark):
    import datetime as dt

    from ups_crossref_etl_spark.operators.timeseries import (
        holt_linear_smoothing,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, i, base + dt.timedelta(hours=i), float(5 + 2 * i))
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = holt_linear_smoothing(
        df, "user_id", "ts", "value", "event_id"
    ).first()
    # on a pure linear ramp Holt converges to the true slope and the
    # forecast extrapolates one step ahead
    assert abs(out["trend"] - 2.0) < 0.05
    assert abs(out["forecast_1"] - (5 + 2 * 40)) < 0.5
