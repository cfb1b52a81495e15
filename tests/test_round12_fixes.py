"""Round-12 ADVICE-fix regressions: Greenwood band NULL contract,
Jonckheere decimal tie-term accumulation, the TF-IDF cap-resolution
sentinel, and hour-bucket NULL-ts parity."""

from __future__ import annotations

import datetime as dt

import pytest


# --------------------------------------------------------------------------
# greenwood_bands: lo/hi NULL exactly when se is (ADVICE r11 #1)
# --------------------------------------------------------------------------


def test_greenwood_bands_null_after_risk_set_exhausts(spark):
    """Once a bucket's events exhaust its risk set (d = n), survival
    pins to 0 and se is NULL by contract — lo/hi must be NULL too,
    not the greatest/least NULL-skipping artifacts lo=0.0/hi=1.0."""
    from ups_crossref_etl_spark.operators.survival import (
        greenwood_bands,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 3 users sign up; ALL purchase in hour 1 -> the t=1 bucket has
    # d=3 = n_risk=3: the risk set exhausts at the first event time
    for u in range(3):
        rows.append((u, "signup", base))
        rows.append((u, "purchase", base + dt.timedelta(hours=1)))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = greenwood_bands(
        df, "user_id", "event_type", "ts",
        entry_type="signup", event_type="purchase",
        horizon_seconds=4 * 3600, bucket_seconds=3600,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["survival"] == 0.0
    assert r["se"] is None
    assert r["lo"] is None
    assert r["hi"] is None


# --------------------------------------------------------------------------
# jonckheere_terpstra: tie terms survive >2^63 (decimal accumulation)
# --------------------------------------------------------------------------


def test_jonckheere_unchanged_by_decimal_refactor(spark):
    """The decimal(38,0) tie-term accumulation (ADVICE r11 #2) must be
    value-identical on small data — same J and z as the bigint path."""
    from ups_crossref_etl_spark.operators.stats import (
        jonckheere_terpstra,
    )

    rows = [("a", 1.0)] * 4 + [("b", 1.0)] * 3 + [("b", 2.0)] * 2 + [
        ("c", 2.0)
    ] * 3
    df = spark.createDataFrame(rows, "g string, v double")
    out = jonckheere_terpstra(df, "g", "v", ["a", "b", "c"]).collect()[0]
    # hand J over ordered pairs with half-ties:
    # (a,b): 4*(2 wins + 3 ties/2) = 4*3.5 = 14
    # (a,c): 4*3 = 12 ; (b,c): 3*3 + 2*(3 ties/2) = 9 + 3 = 12
    assert out["n"] == 12
    assert out["j_stat"] == pytest.approx(14 + 12 + 12.0, abs=0.01)
    assert out["z"] is not None


def test_jonckheere_decimal_tie_terms_do_not_wrap(spark):
    """A tie block of 1.7M rows sharing one value makes
    t*(t-1)*(2t+5) ~ 9.9e18 > 2^63: BIGINT would wrap silently
    (non-ANSI Spark) and flip the variance sign; decimal(38,0) keeps
    the z finite and positive-variance. Build the counts WITHOUT
    materializing 1.7M rows by checking the agg arithmetic directly on
    a pre-aggregated shape via the public API with replicated weights
    is infeasible — so assert on the observable: z stays non-NULL and
    matches the pure-python tie-corrected formula."""
    from ups_crossref_etl_spark.operators.stats import (
        jonckheere_terpstra,
    )

    # 3 groups, one shared heavy value per group pair + distinct tails.
    # Sizes stay test-cheap; the 2^63 wrap itself can't be reproduced
    # without 1.7M physical rows, so this pins the FORMULA against the
    # python reference (arbitrary-precision) — the decimal sums must
    # agree with exact-int math bit-for-bit after rounding.
    import math
    from collections import Counter

    vals = {
        "g1": [1.0] * 7 + [2.0] * 5,
        "g2": [2.0] * 6 + [3.0] * 6,
        "g3": [3.0] * 8 + [4.0] * 4,
    }
    rows = [(g, v) for g, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    out = jonckheere_terpstra(
        df, "g", "v", ["g1", "g2", "g3"]
    ).collect()[0]
    order = ["g1", "g2", "g3"]
    j = 0.0
    for ai in range(3):
        for bi in range(ai + 1, 3):
            for x in vals[order[ai]]:
                for y in vals[order[bi]]:
                    j += 1.0 if x < y else (0.5 if x == y else 0.0)
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
    assert out["j_stat"] == pytest.approx(j, abs=0.01)
    assert out["z"] == pytest.approx(z, abs=1e-4)


# --------------------------------------------------------------------------
# tfidf_knn_graph cap resolution (ADVICE r11 #4)
# --------------------------------------------------------------------------


def _cap_corpus(spark):
    # 'common' has df=3; rare tails are unshared
    return spark.createDataFrame(
        [
            (1, "common rare1"),
            (2, "common rare2"),
            (3, "common rare3"),
        ],
        "doc_id int, text string",
    )


def test_tfidf_default_absolute_cap_applies_without_any_cap(
    spark, monkeypatch
):
    from ups_crossref_etl_spark.operators import retrieval

    monkeypatch.setattr(retrieval, "_MAX_DF_DEFAULT", 2)
    out = retrieval.tfidf_knn_graph(
        _cap_corpus(spark), "text", "doc_id", k=2, ngram=1
    )
    # df('common')=3 > default cap 2 -> dropped -> no shared terms
    assert out.count() == 0


def test_tfidf_explicit_frac_not_tightened_by_default(spark, monkeypatch):
    """ADVICE r11: a caller passing ONLY max_df_frac gets exactly the
    fractional cap — the absolute default must NOT min() in."""
    from ups_crossref_etl_spark.operators import retrieval

    monkeypatch.setattr(retrieval, "_MAX_DF_DEFAULT", 2)
    out = retrieval.tfidf_knn_graph(
        _cap_corpus(spark), "text", "doc_id", k=2,
        max_df_frac=1.0, ngram=1,
    )
    # frac cap = 3 keeps 'common' (df=3); the patched default 2 would
    # have dropped it under the old min(default, frac) resolution
    assert out.count() == 6  # 3 docs x 2 neighbors


def test_tfidf_explicit_none_means_uncapped(spark, monkeypatch):
    from ups_crossref_etl_spark.operators import retrieval

    monkeypatch.setattr(retrieval, "_MAX_DF_DEFAULT", 2)
    out = retrieval.tfidf_knn_graph(
        _cap_corpus(spark), "text", "doc_id", k=2, max_df=None, ngram=1
    )
    assert out.count() == 6


def test_tfidf_both_explicit_caps_tighter_wins(spark):
    from ups_crossref_etl_spark.operators import retrieval

    out = retrieval.tfidf_knn_graph(
        _cap_corpus(spark), "text", "doc_id", k=2,
        max_df=2, max_df_frac=1.0, ngram=1,
    )
    assert out.count() == 0


# --------------------------------------------------------------------------
# hour-bucket gates: NULL ts filtered to match the oracle (ADVICE r11 #3)
# --------------------------------------------------------------------------


def test_hour_bucket_gates_drop_null_ts(spark, tmp_path):
    """q_events_jonckheere / q_events_page_trend bucket by hour(ts);
    a NULL ts must be filtered (oracle: ts IS NOT NULL), not silently
    routed to the 'evening' fallthrough bucket."""
    from ups_crossref_etl_spark.plans.round11_queries import (
        q_events_jonckheere,
        q_events_page_trend,
    )

    base = dt.datetime(2024, 1, 1, 20, 0)  # evening bucket
    rows = []
    for u in range(4):
        for h in (2, 10, 20):  # one event per bucket per user
            rows.append(
                (u, "click", dt.datetime(2024, 1, 1, h, 0),
                 float(10 * h + u))
            )
        # a NULL-ts row whose value would skew 'evening' if it leaked
        rows.append((u, "click", None, 99999.0))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/events.parquet")

    clean = df.filter(df.ts.isNotNull())
    sf2 = str(tmp_path / "clean")
    clean.write.parquet(f"{sf2}/events.parquet")

    got_j = q_events_jonckheere(spark, sf).collect()
    want_j = q_events_jonckheere(spark, sf2).collect()
    assert got_j == want_j

    got_p = q_events_page_trend(spark, sf).collect()
    want_p = q_events_page_trend(spark, sf2).collect()
    assert got_p == want_p


# --------------------------------------------------------------------------
# cox_ph_nested: shared prepared base (r11 verdict #3)
# --------------------------------------------------------------------------


def _cox_toy(spark):
    rows = [
        (1.0, 1, 0.5, 1.0), (1.0, 0, -0.5, 0.0), (2.0, 1, 0.0, 1.0),
        (3.0, 1, 1.0, 0.0), (3.0, 0, -1.0, 1.0), (4.0, 1, 0.3, 0.5),
        (5.0, 0, 0.8, -0.5), (6.0, 1, -0.2, 0.7),
    ]
    return spark.createDataFrame(rows, "t double, d int, x0 double, x1 double")


def test_cox_ph_nested_matches_independent_fits(spark):
    """cox_ph_nested must be numerically IDENTICAL to running cox_ph /
    cox_ph_multi independently — the shared base is a fixed-cost
    optimization, not a semantics change."""
    from ups_crossref_etl_spark.operators.survival import (
        cox_ph,
        cox_ph_multi,
        cox_ph_nested,
    )

    df = _cox_toy(spark)
    out = cox_ph_nested(
        df, "t", "d", ["x0", "x1"], ["x0"],
        iterations=3, tol=1e-4, nested_iterations=2,
    )
    multi = cox_ph_multi(df, "t", "d", ["x0", "x1"], iterations=3,
                         tol=1e-4)
    single = cox_ph(df, "t", "d", "x0", iterations=2, tol=1e-4)
    assert out["full"]["beta"] == multi["beta"]
    assert out["full"]["nll_path"] == multi["nll_path"]
    assert out["nested"]["beta"] == [single["beta"]]
    assert out["nested"]["nll_path"] == single["nll_path"]
    # superset fit cannot lose to its nested subset (same iterations
    # would guarantee it; descent-grade counts still satisfy it here)
    assert out["lr_stat"] >= -1e-9


def test_cox_ph_nested_single_checkpoint(spark, monkeypatch):
    """Both fits of cox_ph_nested run over ONE prepared subject table:
    exactly one localCheckpoint (vs two for independent fits)."""
    from pyspark.sql.classic.dataframe import DataFrame

    from ups_crossref_etl_spark.operators.survival import cox_ph_nested

    captured = []
    orig = DataFrame.localCheckpoint

    def spy(self, *a, **k):
        captured.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(DataFrame, "localCheckpoint", spy)
    cox_ph_nested(
        _cox_toy(spark), "t", "d", ["x0", "x1"], ["x0"],
        iterations=2, tol=1e-4, nested_iterations=1,
    )
    assert len(captured) == 1


def test_cox_ph_nested_rejects_non_subset(spark):
    from ups_crossref_etl_spark.operators.survival import cox_ph_nested

    with pytest.raises(ValueError, match="not in x_cols"):
        cox_ph_nested(
            _cox_toy(spark), "t", "d", ["x0"], ["x1"], iterations=1
        )
