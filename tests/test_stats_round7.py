from __future__ import annotations

import math

from pyspark.sql import functions as F
from ups_crossref_etl_spark.operators.quality import BENFORD_P, benford_audit
from ups_crossref_etl_spark.operators.stats import spearman_corr


def test_spearman_perfect_monotone(spark):
    # y = x^3 is perfectly monotone: rho = 1 even though Pearson < 1
    rows = [("g", float(x), float(x) ** 3) for x in range(-5, 6)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = spearman_corr(df, "g", "x", "y").first()
    assert out["rho"] == 1.0 and out["n"] == 11


def test_spearman_reversed_and_ties(spark):
    rows = [
        ("g", 1.0, 9.0),
        ("g", 2.0, 7.0),
        ("g", 2.0, 7.0),  # tie on both sides
        ("g", 3.0, 5.0),
        ("g", 4.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = spearman_corr(df, "g", "x", "y").first()
    assert out["rho"] == -1.0


def test_spearman_scipy_parity(spark):
    rows = [
        ("g", 1.0, 2.0), ("g", 2.0, 1.0), ("g", 3.0, 4.0),
        ("g", 4.0, 3.0), ("g", 5.0, 5.0), ("g", 5.0, 2.5),
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = spearman_corr(df, "g", "x", "y").first()

    # reference: Pearson on fractional ranks
    def franks(vs):
        order = sorted(range(len(vs)), key=lambda i: vs[i])
        r = [0.0] * len(vs)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vs[order[j]] == vs[order[i]]:
                j += 1
            avg = (i + j + 1) / 2.0
            for k in range(i, j):
                r[order[k]] = avg
            i = j
        return r

    xs = [r[1] for r in rows]
    ys = [r[2] for r in rows]
    rx, ry = franks(xs), franks(ys)
    n = len(rx)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    rho = cov / math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    assert abs(out["rho"] - round(rho, 4)) <= 1e-9


def test_benford_constants_and_audit(spark):
    assert abs(sum(BENFORD_P) - 1.0) < 1e-12
    for d in range(1, 10):
        assert abs(BENFORD_P[d - 1] - math.log10(1 + 1 / d)) < 1e-15

    vals = [1.0, 19.5, 123.0, 0.5, None, -25.0, 999.0, 1000.1, 2.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    # 0.5 and None excluded; digits: 1,1,1,2,9,1,2 -> 1:4, 2:2, 9:1
    assert rows[1]["n_obs"] == 4
    assert rows[2]["n_obs"] == 2
    assert rows[9]["n_obs"] == 1
    assert set(rows) == {1, 2, 9}
    n = 7
    assert rows[1]["obs_frac"] == round(4 / n, 6)
    want_chi = round(
        (4 - n * BENFORD_P[0]) ** 2 / (n * BENFORD_P[0]), 4
    )
    assert rows[1]["chi2_term"] == want_chi
