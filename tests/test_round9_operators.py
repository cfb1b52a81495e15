"""Round-9 operator tests: eccentricity, Ljung-Box, Page-Hinkley,
best-SSE changepoint, Wald SPRT, Jaro-Winkler, and the rewritten
sorted-neighborhood blocking (banded equi-join, no global window)."""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest


# --------------------------------------------------------------------------
# eccentricity
# --------------------------------------------------------------------------


def test_eccentricity_path_graph(spark):
    from ups_crossref_etl_spark.operators.centrality import eccentricity

    # path 1-2-3-4-5: ecc(1)=ecc(5)=4, ecc(2)=ecc(4)=3, ecc(3)=2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["src", "dst"]
    )
    out = {r.node: r for r in eccentricity(edges, directed=False).collect()}
    assert {n: out[n].eccentricity for n in sorted(out)} == {
        1: 4, 2: 3, 3: 2, 4: 3, 5: 4
    }
    assert all(out[n].n_reached == 4 for n in out)


def test_eccentricity_disconnected_component(spark):
    from ups_crossref_etl_spark.operators.centrality import eccentricity

    edges = spark.createDataFrame(
        [(1, 2), (3, 4)], ["src", "dst"]
    )
    out = {r.node: r for r in eccentricity(edges, directed=False).collect()}
    assert out[1].eccentricity == 1 and out[1].n_reached == 1
    assert out[3].eccentricity == 1 and out[3].n_reached == 1


# --------------------------------------------------------------------------
# ljung_box
# --------------------------------------------------------------------------


def test_ljung_box_structured_beats_white_noise(spark):
    from ups_crossref_etl_spark.operators.timeseries import ljung_box

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    # key 1: strong positive autocorrelation (slow ramp up/down)
    v1 = [1.0, 2, 3, 4, 5, 6, 5, 4, 3, 2, 1, 2, 3, 4, 5, 6]
    # key 2: alternating — strong NEGATIVE lag-1 acf; Q squares the
    # autocorrelations, so this is detected as non-white too
    v2 = [1.0, -1, 1, -1, 1, -1, 1, -1, 1, -1, 1, -1, 1, -1, 1, -1]
    # key 3: white noise (random.Random(11) uniforms) — small Q
    rng = random.Random(11)
    v3 = [rng.uniform(-1, 1) for _ in range(16)]
    for i, v in enumerate(v1):
        rows.append((1, t0 + dt.timedelta(minutes=i), float(v)))
    for i, v in enumerate(v2):
        rows.append((2, t0 + dt.timedelta(minutes=i), float(v)))
    for i, v in enumerate(v3):
        rows.append((3, t0 + dt.timedelta(minutes=i), float(v)))
    df = spark.createDataFrame(rows, ["k", "ts", "value"])
    out = {r.k: r for r in ljung_box(df, "k", "ts", "value", max_lag=3).collect()}
    assert out[1].n_points == 16 and out[1].n_lags == 3
    # hand check key 1 against the definition (Spark/DuckDB round
    # half-away-from-zero, unlike Python's banker's rounding)
    def rnd(x, d):
        s = -1.0 if x < 0 else 1.0
        return s * math.floor(abs(x) * 10**d + 0.5) / 10**d

    xs = v1
    n = len(xs)
    mean = sum(xs) / n
    den = sum((x - mean) ** 2 for x in xs)
    q = 0.0
    for lag in (1, 2, 3):
        r = rnd(
            sum(
                (xs[i] - mean) * (xs[i + lag] - mean)
                for i in range(n - lag)
            )
            / den,
            4,
        )
        q += rnd(r * r / (n - lag) * 1e12, 0) / 1e12
    assert out[1].q_stat == pytest.approx(rnd(n * (n + 2) * q, 4), abs=1e-9)
    # both structured series dominate the white-noise key; the
    # alternating one dominates everything (lag-1 acf near -1)
    assert out[2].q_stat > out[1].q_stat > out[3].q_stat
    assert out[3].q_stat < 5.0


# --------------------------------------------------------------------------
# page_hinkley
# --------------------------------------------------------------------------


def test_page_hinkley_detects_level_shift(spark):
    from ups_crossref_etl_spark.operators.timeseries import page_hinkley

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    v1 = [10.0, 10.1, 9.9, 10.0, 10.05, 30.0, 30.1, 29.9, 30.0, 30.1]
    v2 = [10.0, 10.2, 9.8, 10.1, 9.9, 10.0, 10.1, 9.9, 10.05, 9.95]
    for i, v in enumerate(v1):
        rows.append((1, t0 + dt.timedelta(minutes=i), i, v))
    for i, v in enumerate(v2):
        rows.append((2, t0 + dt.timedelta(minutes=i), i, v))
    df = spark.createDataFrame(rows, ["k", "ts", "eid", "value"])
    out = {
        r.k: r
        for r in page_hinkley(
            df, "k", "ts", "eid", "value", delta=0.05, threshold=2.0
        ).collect()
    }
    assert out[1].drifted and out[1].first_cross_n is not None
    # the shift happens at observation 6; detection can't precede it
    assert out[1].first_cross_n >= 6
    assert not out[2].drifted and out[2].first_cross_n is None
    assert out[2].ph_max < 2.0


# --------------------------------------------------------------------------
# best_sse_split
# --------------------------------------------------------------------------


def test_best_sse_split_finds_step(spark):
    from ups_crossref_etl_spark.operators.timeseries import best_sse_split

    t0 = dt.datetime(2026, 1, 1)
    vals = [5.0] * 6 + [15.0] * 4
    rows = [
        (1, t0 + dt.timedelta(minutes=i), i, v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "eid", "value"])
    r = best_sse_split(df, "k", "ts", "eid", "value", min_segment=2).collect()
    assert len(r) == 1
    row = r[0]
    assert row.split_pos == 6  # left = the six 5.0s
    assert row.mean_left == pytest.approx(5.0)
    assert row.mean_right == pytest.approx(15.0)
    # gain = n_l*n_r/n * (mu_l - mu_r)^2 = 6*4/10 * 100 = 240
    assert row.gain == pytest.approx(240.0, abs=1e-4)


def test_best_sse_split_negative_tail(spark):
    """Regression (r10): S must be the TRUE total, not max prefix sum.

    Series 10,10,10, -5,-5,-5 — the prefix sum peaks at 30 after row 3
    and then falls to 15. The old ``max(_sl)`` total would claim S=30,
    corrupting mean_right (-5 -> 0) and gain. Correct split: pos 3,
    means 10 / -5, gain = 3*3/6 * (10 - (-5))^2 = 337.5.
    """
    from ups_crossref_etl_spark.operators.timeseries import best_sse_split

    t0 = dt.datetime(2026, 1, 1)
    vals = [10.0, 10.0, 10.0, -5.0, -5.0, -5.0]
    rows = [
        (1, t0 + dt.timedelta(minutes=i), i, v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "eid", "value"])
    r = best_sse_split(df, "k", "ts", "eid", "value", min_segment=2).collect()
    assert len(r) == 1
    row = r[0]
    assert row.split_pos == 3
    assert row.mean_left == pytest.approx(10.0)
    assert row.mean_right == pytest.approx(-5.0)
    assert row.gain == pytest.approx(337.5, abs=1e-4)


def test_best_sse_split_short_series_dropped(spark):
    from ups_crossref_etl_spark.operators.timeseries import best_sse_split

    t0 = dt.datetime(2026, 1, 1)
    rows = [(1, t0 + dt.timedelta(minutes=i), i, float(i)) for i in range(3)]
    df = spark.createDataFrame(rows, ["k", "ts", "eid", "value"])
    assert (
        best_sse_split(df, "k", "ts", "eid", "value", min_segment=2).count()
        == 0
    )


# --------------------------------------------------------------------------
# sprt_decision
# --------------------------------------------------------------------------


def test_sprt_decides_h1_on_high_rate(spark):
    from ups_crossref_etl_spark.operators.experiment import sprt_decision

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    # key 'hot': 80% success -> accept H1 (p1=0.4) quickly
    for i in range(50):
        rows.append(("hot", t0 + dt.timedelta(minutes=i), i, i % 5 != 0))
    # key 'cold': 0% success -> accept H0
    for i in range(50):
        rows.append(("cold", t0 + dt.timedelta(minutes=i), i, False))
    df = spark.createDataFrame(rows, ["k", "ts", "eid", "succ"])
    out = {
        r.k: r
        for r in sprt_decision(
            df, "k", "ts", "eid", "succ", p0=0.3, p1=0.4, alpha=0.05, beta=0.2
        ).collect()
    }
    assert out["hot"].decision == "accept_h1"
    assert out["hot"].decided_at_n < 50
    assert out["cold"].decision == "accept_h0"
    # replay the hand recursion for 'hot' to pin decided_at_n
    w_s = round(math.log(0.4 / 0.3) * 1e9)
    w_f = round(math.log(0.6 / 0.7) * 1e9)
    a_n = round(math.log(0.8 / 0.05) * 1e9)
    llr, first = 0, None
    for i in range(50):
        llr += w_s if i % 5 != 0 else w_f
        if first is None and (llr >= a_n or llr <= round(math.log(0.2 / 0.95) * 1e9)):
            first = i + 1
    assert out["hot"].decided_at_n == first


# --------------------------------------------------------------------------
# jaro_winkler: parity with DuckDB + Spark round-trip
# --------------------------------------------------------------------------


def test_jaro_winkler_matches_duckdb_exactly():
    import duckdb

    from ups_crossref_etl_spark.operators.linkage import _jaro_winkler_py

    rng = random.Random(42)
    alphabet = "abcdefg "
    cases = [
        ("", ""), ("a", ""), ("", "a"), ("abc", "abc"),
        ("martha", "marhta"), ("DWAYNE", "DUANE"), ("CRATE", "TRACE"),
        ("ab", "ba"), ("aaapppp", "ap"), ("x", "xyzw"),
        ("ABC Corp", "ABC Corp."),
    ]
    for _ in range(300):
        s1 = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        s2 = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        cases.append((s1, s2))
    con = duckdb.connect()
    for s1, s2 in cases:
        expected = con.execute(
            "select jaro_winkler_similarity(?, ?)", [s1, s2]
        ).fetchone()[0]
        assert _jaro_winkler_py(s1, s2) == pytest.approx(
            expected, abs=1e-12
        ), (s1, s2)


def test_jaro_winkler_pairs_spark(spark):
    from ups_crossref_etl_spark.operators.linkage import jaro_winkler_pairs

    df = spark.createDataFrame(
        [(1, "martha", "marhta"), (2, "abc", None), (3, "same", "same")],
        ["pid", "a", "b"],
    )
    out = {r.pid: r.jw for r in jaro_winkler_pairs(df, "a", "b").collect()}
    assert out[1] == pytest.approx(0.9611111111111111)
    assert out[2] is None
    assert out[3] == 1.0


# --------------------------------------------------------------------------
# sorted_neighborhood_pairs: banded rewrite == brute-force window pairs
# --------------------------------------------------------------------------


def test_sorted_neighborhood_matches_bruteforce(spark):
    from ups_crossref_etl_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    rng = random.Random(7)
    rows = [
        (i, "".join(rng.choice("abcd") for _ in range(4))) for i in range(97)
    ]
    df = spark.createDataFrame(rows, ["id", "key"])
    for window in (1, 3):
        got = {
            (r.id_a, r.id_b, r.rank_distance)
            for r in sorted_neighborhood_pairs(
                df, "key", "id", window=window
            ).collect()
        }
        order = [i for i, _ in sorted(rows, key=lambda r: (r[1], r[0]))]
        expected = {
            (order[i], order[i + d], d)
            for i in range(len(order))
            for d in range(1, window + 1)
            if i + d < len(order)
        }
        assert got == expected


# --------------------------------------------------------------------------
# als_factorize
# --------------------------------------------------------------------------


def test_als_recovers_low_rank_structure(spark):
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.factorization import (
        als_factorize,
        als_rmse,
    )

    rows = []
    for u in range(30):
        for i in range(20):
            if (u * 7 + i * 3) % 4 == 0:
                r = (1 + u % 3) * (1 + i % 2) + 0.1 * ((u + i) % 5)
                rows.append((u, i, float(r)))
    df = spark.createDataFrame(rows, ["u", "i", "r"])
    uf, vf = als_factorize(df, "u", "i", "r", rank=4, reg=0.05, iterations=4)
    rmse = als_rmse(df, "u", "i", "r", uf, vf)
    gm = df.select(F.avg("r")).collect()[0][0]
    base = df.select(
        F.sqrt(F.avg((F.col("r") - gm) * (F.col("r") - gm)))
    ).collect()[0][0]
    # near-low-rank data: ALS should cut the baseline error in half+
    assert rmse < base * 0.5
    # factor tables cover every entity, rank-sized vectors
    assert uf.count() == 30 and vf.count() == 20
    assert len(uf.first()["factors"]) == 4


def test_als_more_iterations_do_not_hurt(spark):
    from ups_crossref_etl_spark.operators.factorization import (
        als_factorize,
        als_rmse,
    )

    rows = [
        (u, i, float(1 + (u * i) % 7))
        for u in range(15)
        for i in range(10)
        if (u + i) % 3 == 0
    ]
    df = spark.createDataFrame(rows, ["u", "i", "r"])
    rmses = []
    for iters in (1, 3):
        uf, vf = als_factorize(
            df, "u", "i", "r", rank=3, reg=0.1, iterations=iters
        )
        rmses.append(als_rmse(df, "u", "i", "r", uf, vf))
    assert rmses[1] <= rmses[0] * 1.001  # descent (tiny ulp slack)


def test_als_init_handles_string_and_negative_keys(spark):
    """Regression (r10): the init hash must not cast the key to bigint —
    string keys cast to NULL (all-NULL factor arrays, silently) and
    negative keys escaped the documented [0, scale) range via %."""
    from ups_crossref_etl_spark.operators.factorization import _init_factors

    ents = spark.createDataFrame(
        [("user_a",), ("user_b",), ("-9",)], ["k"]
    ).union(spark.createDataFrame([("éclair",)], ["k"]))
    out = _init_factors(ents, "k", rank=4, scale=0.1).collect()
    assert len(out) == 4
    for row in out:
        assert row._fac is not None and len(row._fac) == 4
        for x in row._fac:
            assert x is not None and 0.0 <= x < 0.1
    neg = spark.createDataFrame([(-5,), (-7,), (3,)], ["k"])
    for row in _init_factors(neg, "k", rank=3, scale=0.1).collect():
        for x in row._fac:
            assert x is not None and 0.0 <= x < 0.1


def test_als_validates_params(spark):
    from ups_crossref_etl_spark.operators.factorization import als_factorize

    df = spark.createDataFrame([(1, 1, 1.0)], ["u", "i", "r"])
    with pytest.raises(ValueError):
        als_factorize(df, "u", "i", "r", rank=0)
    with pytest.raises(ValueError):
        als_factorize(df, "u", "i", "r", iterations=0)


# --------------------------------------------------------------------------
# logreg_irls
# --------------------------------------------------------------------------


def test_logreg_recovers_planted_weights(spark):
    from ups_crossref_etl_spark.operators.classifier import (
        logreg_irls,
        logreg_score,
    )
    from ups_crossref_etl_spark.operators.evaluation import binary_auc

    rng = random.Random(5)
    rows = []
    for _ in range(400):
        x1, x2 = rng.uniform(-2, 2), rng.uniform(-2, 2)
        p = 1.0 / (1.0 + math.exp(-(1.5 * x1 - 2.0 * x2 + 0.3)))
        rows.append(([x1, x2], rng.random() < p))
    df = spark.createDataFrame(rows, "features array<double>, label boolean")
    model = logreg_irls(df, "features", "label", dim=2, reg=1e-3, iterations=8)
    w = model["weights"]
    # signs and rough magnitudes of the planted (0.3, 1.5, -2.0)
    assert w[1] > 0.8 and w[2] < -1.2
    # loss path non-increasing by construction
    lp = model["loss_path"]
    assert all(lp[i + 1] <= lp[i] for i in range(len(lp) - 1))
    assert model["iterations_run"] >= 2
    scored = logreg_score(df, "features", w)
    auc = binary_auc(scored, "score", "label").collect()[0]["auc"]
    assert auc > 0.85


def test_logreg_validates_params(spark):
    from ups_crossref_etl_spark.operators.classifier import logreg_irls

    df = spark.createDataFrame([([1.0], True)], "features array<double>, label boolean")
    with pytest.raises(ValueError):
        logreg_irls(df, "features", "label", dim=0)


# --------------------------------------------------------------------------
# codegree_pairs / rectangle_count
# --------------------------------------------------------------------------


def test_rectangle_count_square_and_k4(spark):
    from ups_crossref_etl_spark.operators.graph import rectangle_count

    # a single 4-cycle 1-2-3-4-1: exactly one rectangle
    square = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], ["src", "dst"]
    )
    r = rectangle_count(square).collect()[0]
    assert r.n_rectangles == 1 and r.sum_diag_squares == 2
    # K4: 3 distinct 4-cycles
    k4 = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
        ["src", "dst"],
    )
    r = rectangle_count(k4).collect()[0]
    assert r.n_rectangles == 3
    # capped run reports the raw diagonal census, NULL rectangles
    r = rectangle_count(k4, max_center_degree=2).collect()[0]
    assert r.n_rectangles is None


def test_codegree_pairs_values(spark):
    from ups_crossref_etl_spark.operators.graph import codegree_pairs

    # star 0-{1,2,3}: every leaf pair has codegree 1 (the hub)
    star = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], ["src", "dst"])
    out = {(r.u, r.v): r.codeg for r in codegree_pairs(star).collect()}
    assert out == {(1, 2): 1, (1, 3): 1, (2, 3): 1}


# --------------------------------------------------------------------------
# betweenness_pairs
# --------------------------------------------------------------------------


def test_betweenness_pairs_on_path(spark):
    from ups_crossref_etl_spark.operators.centrality import betweenness_pairs

    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["src", "dst"]
    )
    out = {
        r.node: r.n_through_pairs
        for r in betweenness_pairs(path, directed=False).collect()
    }
    # classic Freeman betweenness on a path (unique geodesics)
    assert out == {1: 0, 2: 3, 3: 4, 4: 3, 5: 0}


# --------------------------------------------------------------------------
# percent_rank_unique == percent_rank() OVER (ORDER BY value, id)
# --------------------------------------------------------------------------


def test_percent_rank_unique_matches_builtin(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.stats import percent_rank_unique

    rng = random.Random(13)
    rows = [(i, rng.randint(0, 20)) for i in range(157)]  # heavy ties
    df = spark.createDataFrame(rows, ["id", "v"])
    got = {
        r.id: r.score
        for r in percent_rank_unique(df, "v", "id", out_col="score").collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r.id: r.pr
        for r in df.select(
            "id", F.percent_rank().over(w).alias("pr")
        ).collect()
    }
    assert got == want  # bit-for-bit, not approx


def test_sprt_continue_when_evidence_insufficient(spark):
    from ups_crossref_etl_spark.operators.experiment import sprt_decision

    t0 = dt.datetime(2026, 1, 1)
    # 4 observations alternating: LLR oscillates inside the boundaries
    rows = [("k", t0 + dt.timedelta(minutes=i), i, i % 2 == 0) for i in range(4)]
    df = spark.createDataFrame(rows, ["k", "ts", "eid", "succ"])
    r = sprt_decision(
        df, "k", "ts", "eid", "succ", p0=0.3, p1=0.4, alpha=0.05, beta=0.2
    ).collect()[0]
    assert r.decision == "continue"
    assert r.decided_at_n is None
    assert r.n_obs == 4 and r.n_success == 2


def test_page_hinkley_ignores_null_values(spark):
    from ups_crossref_etl_spark.operators.timeseries import page_hinkley

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(minutes=0), 0, 10.0),
        (1, t0 + dt.timedelta(minutes=1), 1, None),
        (1, t0 + dt.timedelta(minutes=2), 2, 10.2),
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, eid int, value double")
    r = page_hinkley(df, "k", "ts", "eid", "value").collect()[0]
    assert r.n_points == 2  # NULL row excluded, not poisoned


def test_jaro_winkler_handles_unicode(spark):
    import duckdb

    from ups_crossref_etl_spark.operators.linkage import _jaro_winkler_py

    con = duckdb.connect()
    cases = [("café", "cafe"), ("Müller", "Mueller"), ("北京", "北京大学")]
    for a, b in cases:
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert _jaro_winkler_py(a, b) == pytest.approx(want, abs=1e-12), (a, b)


def test_best_sse_split_tie_breaks_to_smallest(spark):
    from ups_crossref_etl_spark.operators.timeseries import best_sse_split

    t0 = dt.datetime(2026, 1, 1)
    # constant series: every split has gain 0 -> smallest valid split wins
    rows = [(1, t0 + dt.timedelta(minutes=i), i, 7.0) for i in range(6)]
    df = spark.createDataFrame(rows, ["k", "ts", "eid", "value"])
    r = best_sse_split(df, "k", "ts", "eid", "value", min_segment=2).collect()[0]
    assert r.split_pos == 2 and r.gain == 0.0
