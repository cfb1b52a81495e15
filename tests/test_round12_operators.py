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
