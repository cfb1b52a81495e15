"""Unit tests for the round-7 wave-13 operators: Adamic-Adar link
prediction and Cohen's kappa inter-rater agreement."""

from __future__ import annotations

import math

from ups_crossref_etl_spark.operators.agreement import cohens_kappa
from ups_crossref_etl_spark.operators.graph import adamic_adar


# -------------------------------------------------------------- adamic-adar


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_adamic_adar_path_graph(spark):
    """Path 1-2-3: the only candidate is (1,3) via center 2 (deg 2)."""
    out = adamic_adar(_edges(spark, [(1, 2), (2, 3)]), top_n=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.u, r.v, r.common_neighbors) == (1, 3, 1)
    expected = round(round(1e9 / math.log(2.0)) / 1e9, 6)
    assert abs(r.aa_score - expected) < 1e-9


def test_adamic_adar_excludes_real_edges_and_sums_centers(spark):
    """Square 1-2-3-4-1 plus chord 1-3: (2,4) shares centers 1 and 3,
    but center degrees differ (1 and 3 have deg 3), and every real edge
    is excluded from the output."""
    g = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    out = adamic_adar(_edges(spark, g), top_n=10).collect()
    pairs = {(r.u, r.v) for r in out}
    assert pairs == {(2, 4)}
    r = out[0]
    assert r.common_neighbors == 2
    expected = round(2 * round(1e9 / math.log(3.0)) / 1e9, 6)
    assert abs(r.aa_score - expected) < 1e-9


def test_adamic_adar_max_degree_cap_drops_hub_centers(spark):
    """With max_degree=2 a star hub (deg 3) contributes no wedges."""
    star = [(0, 1), (0, 2), (0, 3)]
    assert adamic_adar(_edges(spark, star), top_n=10).count() == 3
    assert (
        adamic_adar(_edges(spark, star), top_n=10, max_degree=2).count() == 0
    )


def test_adamic_adar_no_cartesian(spark):
    df = adamic_adar(_edges(spark, [(1, 2), (2, 3), (3, 4)]), top_n=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------------- kappa


def test_kappa_textbook_two_class(spark):
    """Classic 2x2: 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no.
    po = 0.7, pe = 0.5*0.6 + 0.5*0.4 = 0.5, kappa = 0.4."""
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    r = cohens_kappa(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).collect()[0]
    assert (r.n, r.agree, r.n_categories) == (50, 35, 2)
    assert abs(r.po - 0.7) < 1e-9
    assert abs(r.pe - 0.5) < 1e-9
    assert abs(r.kappa - 0.4) < 1e-9


def test_kappa_null_rows_excluded(spark):
    rows = [("y", "y"), ("y", None), (None, "n"), ("n", "n")]
    r = cohens_kappa(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).collect()[0]
    assert r.n == 2 and r.agree == 2


def test_kappa_degenerate_constant_raters(spark):
    """Both raters constant and equal: pe = 1, convention kappa = 1."""
    rows = [("k", "k")] * 7
    r = cohens_kappa(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).collect()[0]
    assert r.pe == 1.0 and r.kappa == 1.0


def test_kappa_disjoint_label_sets(spark):
    """Raters that never use a shared label: agree = 0, pe = 0,
    kappa = po - 0 / 1 = 0; n_categories counts the union."""
    rows = [("a", "x"), ("b", "y"), ("a", "y")]
    r = cohens_kappa(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).collect()[0]
    assert (r.agree, r.pe, r.kappa, r.n_categories) == (0, 0.0, 0.0, 4)


# -------------------------------------------------------------- modularity


def test_modularity_two_cliques(spark):
    """Two triangles joined by one bridge edge, communities = cliques:
    m=7, intra=6, degrees 7 per side: Q = 6/7 - 2*(7/14)^2 = 5/14."""
    from ups_crossref_etl_spark.operators.graph import modularity

    edges = _edges(
        spark,
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
    )
    assign = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "b")],
        "node bigint, community string",
    )
    r = modularity(edges, assign).collect()[0]
    assert (r.n_communities, r.n_edges) == (2, 7)
    assert abs(r.modularity - round(6 / 7 - 2 * (7 / 14) ** 2, 6)) < 1e-9


def test_modularity_single_community_is_zero(spark):
    """Everything in one community: Q = m/m - (2m/2m)^2 = 0."""
    from ups_crossref_etl_spark.operators.graph import modularity

    edges = _edges(spark, [(1, 2), (2, 3)])
    assign = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x")], "node bigint, community string"
    )
    r = modularity(edges, assign).collect()[0]
    assert r.modularity == 0.0 and r.n_edges == 2


def test_modularity_empty_assignment(spark):
    from ups_crossref_etl_spark.operators.graph import modularity

    edges = _edges(spark, [(1, 2)])
    assign = spark.createDataFrame([], "node bigint, community string")
    r = modularity(edges, assign).collect()[0]
    assert (r.n_communities, r.n_edges, r.modularity) == (0, 0, 0.0)


# ------------------------------------------------- classification report


def test_classification_report_textbook(spark):
    """gold=[a,a,a,b,b], pred=[a,a,b,b,b]: P(a)=1, R(a)=2/3,
    P(b)=2/3, R(b)=1, f1 both 0.8; macro p = r = 5/6, macro f1 = 0.8."""
    from ups_crossref_etl_spark.operators.evaluation import (
        classification_report,
    )

    rows = [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "b")]
    out = {
        r.label: r
        for r in classification_report(
            spark.createDataFrame(rows, "g string, p string"), "g", "p"
        ).collect()
    }
    assert set(out) == {"a", "b", "__macro__"}
    assert out["a"].precision == 1.0
    assert abs(out["a"].recall - 0.666667) < 1e-9
    assert abs(out["b"].precision - 0.666667) < 1e-9
    assert out["b"].recall == 1.0
    assert abs(out["a"].f1 - 0.8) < 1e-9
    assert abs(out["__macro__"].precision - 0.833333) < 1e-6
    assert abs(out["__macro__"].f1 - 0.8) < 1e-6
    assert out["__macro__"].n_gold == 5 and out["__macro__"].tp == 4


def test_classification_report_never_predicted_label(spark):
    """A gold label the model never predicts: precision 0 (sklearn
    zero_division=0), recall 0, present in the table."""
    from ups_crossref_etl_spark.operators.evaluation import (
        classification_report,
    )

    rows = [("a", "b"), ("a", "b"), ("b", "b")]
    out = {
        r.label: r
        for r in classification_report(
            spark.createDataFrame(rows, "g string, p string"), "g", "p"
        ).collect()
    }
    assert out["a"].n_pred == 0
    assert out["a"].precision == 0.0 and out["a"].f1 == 0.0


# ------------------------------------------------------------ readability


def test_flesch_readability_counts(spark):
    from ups_crossref_etl_spark.operators.text_analysis import (
        flesch_readability,
    )

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "zzz"), (3, None)],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in flesch_readability(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (6, 2, 6)
    expected = round(206.835 - 1.015 * 6 / 2 - 84.6 * 6 / 6, 4)
    assert abs(r1.flesch - expected) < 1e-9
    # vowel-free text: 0 syllables, still scored (words > 0)
    assert out[2].n_syllables == 0 and out[2].flesch is not None


def test_flesch_readability_no_words_null_score(spark):
    from ups_crossref_etl_spark.operators.text_analysis import (
        flesch_readability,
    )

    df = spark.createDataFrame([(1, "123 456 ...")], "doc_id bigint, text string")
    r = flesch_readability(df, "doc_id", "text").collect()[0]
    assert r.n_words == 0 and r.flesch is None


# -------------------------------------------------------------------- ece


def test_ece_perfectly_calibrated_bins(spark):
    """Two bins where mean score equals pos rate exactly: ECE = 0.
    Scores 0.0 x2 (0 positives) and 1.0 x2 (2 positives)."""
    from ups_crossref_etl_spark.operators.evaluation import (
        expected_calibration_error,
    )

    rows = [(1, 0.0, 0), (2, 0.0, 0), (3, 1.0, 1), (4, 1.0, 1)]
    r = expected_calibration_error(
        spark.createDataFrame(rows, "id bigint, s double, y int"),
        "s", "y", "id", n_bins=2,
    ).collect()[0]
    assert (r.n, r.n_bins) == (4, 2)
    assert r.ece == 0.0 and r.max_ce == 0.0


def test_ece_known_gap(spark):
    """One bin, scores all 0.5, half positive -> gap 0; flip to all
    positive -> gap 0.5 and ece 0.5."""
    from ups_crossref_etl_spark.operators.evaluation import (
        expected_calibration_error,
    )

    rows = [(1, 0.5, 1), (2, 0.5, 1)]
    r = expected_calibration_error(
        spark.createDataFrame(rows, "id bigint, s double, y int"),
        "s", "y", "id", n_bins=1,
    ).collect()[0]
    assert abs(r.ece - 0.5) < 1e-9 and abs(r.max_ce - 0.5) < 1e-9


# ----------------------------------------------------------------- woe/iv


def test_woe_iv_hand_computed(spark):
    """Bucket x: 3 pos 1 neg; bucket y: 1 pos 3 neg; k=2, tp=tn=4.
    ps_x = 3.5/5, ns_x = 1.5/5 -> woe_x = ln(7/3)."""
    import math

    from ups_crossref_etl_spark.operators.stats import woe_iv

    rows = [("x", 1)] * 3 + [("x", 0)] + [("y", 1)] + [("y", 0)] * 3
    out = {
        r.bucket: r
        for r in woe_iv(
            spark.createDataFrame(rows, "b string, y int"), "b", "y"
        ).collect()
    }
    wx = math.log((3.5 / 5) / (1.5 / 5))
    assert abs(out["x"].woe - round(wx, 6)) < 1e-9
    assert abs(out["x"].iv_contrib - round((3.5 / 5 - 1.5 / 5) * wx, 6)) < 1e-9
    assert abs(out["y"].woe + round(wx, 6)) < 1e-9  # symmetric
    assert out["x"].n == 4 and out["x"].n_pos == 3 and out["x"].n_neg == 1


def test_woe_iv_single_class_bucket_finite(spark):
    from ups_crossref_etl_spark.operators.stats import woe_iv

    rows = [("a", 1), ("a", 1), ("b", 0)]
    out = woe_iv(
        spark.createDataFrame(rows, "b string, y int"), "b", "y"
    ).collect()
    assert all(r.woe is not None and abs(r.woe) < 100 for r in out)


# ------------------------------------------------------- blocking quality


def test_blocking_quality_counts(spark):
    """4 records -> 6 possible; candidates {(1,2),(3,4)}; truth
    {(1,2),(2,3)} -> covered 1, RR = 1 - 2/6, PC = 0.5."""
    from ups_crossref_etl_spark.operators.linkage import blocking_quality

    cand = spark.createDataFrame([(2, 1), (3, 4)], "a bigint, b bigint")
    truth = spark.createDataFrame([(1, 2), (2, 3)], "a bigint, b bigint")
    r = blocking_quality(cand, truth, n_records=4).collect()[0]
    assert (r.n_possible, r.n_candidates, r.n_truth, r.n_truth_covered) == (
        6, 2, 2, 1,
    )
    assert abs(r.reduction_ratio - round(1 - 2 / 6, 6)) < 1e-9
    assert r.pair_completeness == 0.5


def test_blocking_quality_empty_truth_pc_one(spark):
    from ups_crossref_etl_spark.operators.linkage import blocking_quality

    cand = spark.createDataFrame([(1, 2)], "a bigint, b bigint")
    truth = spark.createDataFrame([], "a bigint, b bigint")
    r = blocking_quality(cand, truth, n_records=3).collect()[0]
    assert r.n_truth == 0 and r.pair_completeness == 1.0


# ------------------------------------------------------------------ anova


def test_anova_hand_computed(spark):
    """Groups a=[1,2,3], b=[4,5,6]: means 2 and 5, grand 3.5.
    SSB = 3*(2-3.5)^2 + 3*(5-3.5)^2 = 13.5; SSW = 2+2 = 4.
    F = (13.5/1)/(4/4) = 13.5."""
    from ups_crossref_etl_spark.operators.stats import anova_oneway

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 4.0), ("b", 5.0), ("b", 6.0)]
    r = anova_oneway(
        spark.createDataFrame(rows, "g string, v double"), "g", "v"
    ).collect()[0]
    assert (r.n_groups, r.n, r.df_between, r.df_within) == (2, 6, 1, 4)
    assert abs(r.ss_between - 13.5) < 1e-6
    assert abs(r.ss_within - 4.0) < 1e-6
    assert abs(r.f_stat - 13.5) < 1e-5


def test_anova_degenerate_cases(spark):
    from ups_crossref_etl_spark.operators.stats import anova_oneway

    one_group = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "g string, v double"
    )
    assert anova_oneway(one_group, "g", "v").collect()[0].f_stat is None
    # zero within-group variance
    const = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)],
        "g string, v double",
    )
    assert anova_oneway(const, "g", "v").collect()[0].f_stat is None


# -------------------------------------------------------------- diversity


def test_diversity_uniform_vs_constant(spark):
    """4 distinct tokens once each: shannon = ln 4, simpson = 1/4,
    hill1 = 4, inv_simpson = 4. One token 4x: all concentration."""
    import math

    from ups_crossref_etl_spark.operators.text_analysis import (
        diversity_indices,
    )

    df = spark.createDataFrame(
        [("u", "aa bb cc dd"), ("k", "zz zz zz zz")],
        "source string, text string",
    )
    out = {r.grp: r for r in diversity_indices(df, "source", "text").collect()}
    u = out["u"]
    assert u.n_tokens == 4 and u.n_distinct == 4
    assert abs(u.shannon - round(math.log(4), 6)) < 1e-9
    assert abs(u.simpson - 0.25) < 1e-9
    assert abs(u.hill1 - 4.0) < 1e-5
    assert abs(u.inv_simpson - 4.0) < 1e-9
    k = out["k"]
    assert k.n_tokens == 4 and k.n_distinct == 1
    assert k.shannon == 0.0 and k.simpson == 1.0 and k.hill1 == 1.0


# ------------------------------------------------------------------- rmst


def _ts(s):
    from datetime import datetime

    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def test_rmst_hand_computed(spark):
    """2 users sign up at t0; one purchases after 2h (bucket 2), one
    never. KM: S = 0.5 at t=2. tau = 5 buckets.
    RMST = 1.0*2 + 0.5*(5-2) = 3.5 buckets."""
    from ups_crossref_etl_spark.operators.survival import rmst

    rows = [
        (1, "signup", _ts("2024-01-01 00:00:00")),
        (2, "signup", _ts("2024-01-01 00:00:00")),
        (1, "purchase", _ts("2024-01-01 02:30:00")),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")
    r = rmst(
        df, "user_id", "event_type", "ts",
        entry_type="signup", event_type="purchase",
        horizon_seconds=5 * 3600, bucket_seconds=3600,
    ).collect()[0]
    assert r.horizon_buckets == 5 and r.n_event_times == 1
    assert abs(r.rmst_buckets - 3.5) < 1e-9
    assert abs(r.rmst_seconds - 3.5 * 3600) < 1e-6


def test_rmst_no_events_equals_horizon(spark):
    from ups_crossref_etl_spark.operators.survival import rmst

    rows = [(1, "signup", _ts("2024-01-01 00:00:00"))]
    df = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")
    r = rmst(
        df, "user_id", "event_type", "ts",
        entry_type="signup", event_type="purchase",
        horizon_seconds=4 * 3600, bucket_seconds=3600,
    ).collect()[0]
    assert r.rmst_buckets == 4.0 and r.n_event_times == 0


# --------------------------------------------------------- funnel latency


def test_funnel_latency_percentiles(spark):
    """Three users complete a->b in 10s, 20s, 40s: p50 = 20s exactly;
    p90 interpolates between 20 and 40 at 0.8 -> 36s."""
    from ups_crossref_etl_spark.operators.funnel import funnel_latency

    rows = []
    for u, gap in [(1, 10), (2, 20), (3, 40)]:
        rows.append((u, "a", _ts("2024-01-01 00:00:00")))
        rows.append((u, "b", _ts(f"2024-01-01 00:00:{gap:02d}")))
    df = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")
    r = funnel_latency(df, "user_id", "event_type", "ts", ["a", "b"]).collect()[0]
    assert (r.step_idx, r.from_step, r.to_step, r.n_users) == (1, "a", "b", 3)
    assert abs(r.p50_seconds - 20.0) < 1e-9
    assert abs(r.p90_seconds - 36.0) < 1e-9


# ------------------------------------------------------------ item cosine


def test_item_cosine_hand_computed(spark):
    """Users 1,2 both take items (10,20); user 3 takes (10,30).
    n_10=3, n_20=2, n_30=1. co(10,20)=2 -> cos = 2/sqrt(6);
    co(10,30)=1 -> cos = 1/sqrt(3); co(20,30)=0 (absent)."""
    import math

    from ups_crossref_etl_spark.operators.recsys import (
        item_cosine_similarity,
    )

    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 30)]
    out = item_cosine_similarity(
        spark.createDataFrame(rows, "u bigint, i bigint"), "u", "i", top_n=10
    ).collect()
    by_pair = {(r.item_a, r.item_b): r for r in out}
    assert set(by_pair) == {(10, 20), (10, 30)}
    r = by_pair[(10, 20)]
    assert (r.n_a, r.n_b, r.cooccurrence) == (3, 2, 2)
    assert abs(r.cosine - round(round(2 / math.sqrt(6) * 1e9) / 1e9, 6)) < 1e-9
    # ordering: higher cosine first
    assert out[0].item_b == 20


def test_item_cosine_max_user_items_drops_power_user(spark):
    from ups_crossref_etl_spark.operators.recsys import (
        item_cosine_similarity,
    )

    rows = [(1, i) for i in range(10)] + [(2, 1), (2, 2)]
    out = item_cosine_similarity(
        spark.createDataFrame(rows, "u bigint, i bigint"),
        "u", "i", top_n=100, max_user_items=5,
    ).collect()
    # only user 2 survives -> single pair (1,2), degrees recomputed on
    # the surviving interactions only
    assert len(out) == 1
    assert (out[0].item_a, out[0].item_b, out[0].n_a, out[0].n_b) == (1, 2, 1, 1)


def test_item_cosine_dedups_interactions(spark):
    from ups_crossref_etl_spark.operators.recsys import (
        item_cosine_similarity,
    )

    rows = [(1, 10), (1, 10), (1, 20)]  # duplicate interaction
    out = item_cosine_similarity(
        spark.createDataFrame(rows, "u bigint, i bigint"), "u", "i", top_n=10
    ).collect()
    assert out[0].cooccurrence == 1 and out[0].n_a == 1


# ---------------------------------------------------------- source overlap


def test_source_token_overlap_exact_sets(spark):
    """A={a,b,c}, B={b,c,d}: jaccard 2/4, containment 2/3."""
    from ups_crossref_etl_spark.operators.text_analysis import (
        source_token_overlap,
    )

    df = spark.createDataFrame(
        [("A", "a b c"), ("B", "b c d"), ("C", "zz")],
        "source string, text string",
    )
    out = source_token_overlap(df, "source", "text").collect()
    pairs = {(r.src_a, r.src_b): r for r in out}
    assert set(pairs) == {("A", "B")}  # C shares nothing
    r = pairs[("A", "B")]
    assert (r.n_a, r.n_b, r.n_common) == (3, 3, 2)
    assert abs(r.jaccard - 0.5) < 1e-9
    assert abs(r.containment - round(2 / 3, 6)) < 1e-9


# ------------------------------------------------------------------- mode


def test_mode_by_tiebreak_smallest_value(spark):
    from ups_crossref_etl_spark.operators.stats import mode_by

    rows = [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c")]
    r = mode_by(
        spark.createDataFrame(rows, "grp string, v string"), "grp", "v"
    ).collect()[0]
    assert (r.mode, r.n) == ("a", 2)  # tie between a and b -> smallest


def test_mode_by_excludes_nulls(spark):
    from ups_crossref_etl_spark.operators.stats import mode_by

    rows = [("g", None), ("g", None), ("g", "x")]
    r = mode_by(
        spark.createDataFrame(rows, "grp string, v string"), "grp", "v"
    ).collect()[0]
    assert (r.mode, r.n) == ("x", 1)


# ------------------------------------------------------------------- twap


def test_twap_locf_hand_computed(spark):
    """Obs: v=10 at t=0s, v=20 at t=10s, end=20s.
    Area = 10*10 + 20*10 = 300, span 20 -> twap 15.
    Plain AVG would say 15 too; add v=100 at t=19s:
    area = 10*10 + 20*9 + 100*1 = 380 -> twap 19, AVG says 43.3."""
    from ups_crossref_etl_spark.operators.timeseries import (
        time_weighted_average,
    )

    rows = [
        (1, _ts("2024-01-01 00:00:00"), 10.0),
        (1, _ts("2024-01-01 00:00:10"), 20.0),
        (2, _ts("2024-01-01 00:00:00"), 10.0),
        (2, _ts("2024-01-01 00:00:10"), 20.0),
        (2, _ts("2024-01-01 00:00:19"), 100.0),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, v double")
    out = {
        r.key: r
        for r in time_weighted_average(
            df, "user_id", "ts", "v", end_ts="2024-01-01 00:00:20"
        ).collect()
    }
    assert out[1].n_obs == 2 and out[1].span_us == 20_000_000
    assert abs(out[1].twap - 15.0) < 1e-9
    assert abs(out[2].twap - 19.0) < 1e-9


def test_twap_excludes_after_end_and_nulls(spark):
    from ups_crossref_etl_spark.operators.timeseries import (
        time_weighted_average,
    )

    rows = [
        (1, _ts("2024-01-01 00:00:00"), 5.0),
        (1, _ts("2024-01-01 00:00:30"), 99.0),  # after end
        (1, _ts("2024-01-01 00:00:05"), None),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, v double")
    r = time_weighted_average(
        df, "user_id", "ts", "v", end_ts="2024-01-01 00:00:10"
    ).collect()[0]
    assert r.n_obs == 1 and abs(r.twap - 5.0) < 1e-9


# ---------------------------------------------------------- script profile


def test_script_profile_real_scripts(spark):
    from ups_crossref_etl_spark.operators.text_analysis import script_profile

    df = spark.createDataFrame(
        [
            (1, "hello world 123"),
            (2, "привет мир"),
            (3, "你好世界"),
            (4, "مرحبا بالعالم"),
            (5, "... 42 !!"),
            (6, "mixé café"),  # accented latin counts as latin
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in script_profile(df, "doc_id", "text").collect()}
    assert out[1].script == "latin" and out[1].n_latin == 10
    assert out[1].n_digit == 3
    assert out[2].script == "cyrillic" and out[2].n_cyrillic == 9
    assert out[3].script == "han" and out[3].n_han == 4
    assert out[4].script == "arabic"
    assert out[5].script == "none"
    assert out[6].script == "latin" and out[6].n_latin == 8


def test_script_profile_tie_prefers_latin(spark):
    from ups_crossref_etl_spark.operators.text_analysis import script_profile

    df = spark.createDataFrame([(1, "ab мы")], "doc_id bigint, text string")
    r = script_profile(df, "doc_id", "text").collect()[0]
    assert r.n_latin == 2 and r.n_cyrillic == 2 and r.script == "latin"


# ---------------------------------------------------------- davies-bouldin


def test_davies_bouldin_hand_computed(spark):
    """Two 1-d clusters: A = {0, 2} (c=1, s=1), B = {10, 12} (c=11,
    s=1): DB = (s_a+s_b)/d = 2/10 = 0.2 for both -> index 0.2."""
    from ups_crossref_etl_spark.operators.similarity import davies_bouldin

    rows = [
        ("a", [0.0]), ("a", [2.0]), ("b", [10.0]), ("b", [12.0]),
    ]
    df = spark.createDataFrame(rows, "label string, embedding array<double>")
    r = davies_bouldin(df, "embedding", "label").collect()[0]
    assert (r.n_vecs, r.n_clusters) == (4, 2)
    assert abs(r.db_index - 0.2) < 1e-6


def test_davies_bouldin_picks_worst_neighbor(spark):
    """Three clusters at 0, 1, 100 (all scatter 0.5 via {x-0.5, x+0.5}):
    for the far cluster the worst neighbor is the nearest one; the two
    near clusters pick each other (ratio 1/1), so
    DB = (1 + 1 + 1/99) / 3."""
    from ups_crossref_etl_spark.operators.similarity import davies_bouldin

    rows = []
    for lbl, c in [("a", 0.0), ("b", 1.0), ("c", 100.0)]:
        rows += [(lbl, [c - 0.5]), (lbl, [c + 0.5])]
    df = spark.createDataFrame(rows, "label string, embedding array<double>")
    r = davies_bouldin(df, "embedding", "label").collect()[0]
    expected = (1.0 + 1.0 + 1.0 / 99.0) / 3.0
    assert abs(r.db_index - expected) < 1e-5


def test_davies_bouldin_single_cluster_null(spark):
    from ups_crossref_etl_spark.operators.similarity import davies_bouldin

    df = spark.createDataFrame(
        [("a", [1.0]), ("a", [2.0])], "label string, embedding array<double>"
    )
    r = davies_bouldin(df, "embedding", "label").collect()[0]
    assert r.db_index is None


# ------------------------------------------------------------- winsorized


def test_winsorized_mean_clamps_tails(spark):
    """Values 1..10 with an outlier 1000 replacing 10; winsorizing at
    10/90 clamps it to the 90th percentile instead of dropping it."""
    from ups_crossref_etl_spark.operators.stats import winsorized_mean

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, v double"
    )
    r = winsorized_mean(df, "grp", "v", lower=0.1, upper=0.9).collect()[0]
    # cuts: quantile_cont(0.1) = 1.9, (0.9) = 107.8 over these values
    assert r.n == 10
    assert r.n_clamped_low == 1 and r.n_clamped_high == 1
    clamped = [max(min(v, r.hi_cut), r.lo_cut) for v in vals]
    assert abs(r.winsorized_mean - round(sum(clamped) / 10, 6)) < 1e-6


# ------------------------------------------------------------- rate ratio


def test_rate_ratio_hand_computed(spark):
    """a: 10 rows 2 events (0.2); b: 20 rows 8 events (0.4): RR 2.0,
    CI exp(ln 2 +- z sqrt(1/2 + 1/8))."""
    import math

    from ups_crossref_etl_spark.operators.experiment import rate_ratio

    rows = [("a", 1)] * 2 + [("a", 0)] * 8 + [("b", 1)] * 8 + [("b", 0)] * 12
    r = rate_ratio(
        spark.createDataFrame(rows, "g string, y int"), "g", "y"
    ).collect()[0]
    assert (r.group_a, r.group_b, r.n_a, r.n_b) == ("a", "b", 10, 20)
    assert (r.events_a, r.events_b) == (2, 8)
    assert abs(r.rate_ratio - 2.0) < 1e-9
    se = math.sqrt(1 / 2 + 1 / 8)
    assert abs(r.ci_lo - round(math.exp(math.log(2) - 1.959964 * se), 6)) < 1e-9
    assert abs(r.ci_hi - round(math.exp(math.log(2) + 1.959964 * se), 6)) < 1e-9


def test_rate_ratio_zero_events_null_ci(spark):
    from ups_crossref_etl_spark.operators.experiment import rate_ratio

    rows = [("a", 0)] * 5 + [("b", 1)] * 5
    r = rate_ratio(
        spark.createDataFrame(rows, "g string, y int"), "g", "y"
    ).collect()[0]
    assert r.rate_ratio is None and r.ci_lo is None


def test_rate_ratio_requires_two_groups(spark):
    from ups_crossref_etl_spark.operators.experiment import rate_ratio

    rows = [("a", 1)] * 3
    assert (
        rate_ratio(
            spark.createDataFrame(rows, "g string, y int"), "g", "y"
        ).count()
        == 0
    )


# ---------------------------------------------------------- sequence gaps


def test_sequence_gaps_finds_holes(spark):
    from ups_crossref_etl_spark.operators.quality import sequence_gaps

    df = spark.createDataFrame(
        [(1,), (2,), (5,), (6,), (10,), (2,), (None,)], "id bigint"
    )
    out = sequence_gaps(df, "id").collect()
    assert [(r.gap_start, r.gap_end, r.gap_len) for r in out] == [
        (3, 4, 2),
        (7, 9, 3),
    ]


def test_sequence_gaps_dense_is_empty(spark):
    from ups_crossref_etl_spark.operators.quality import sequence_gaps

    df = spark.createDataFrame([(i,) for i in range(5)], "id bigint")
    assert sequence_gaps(df, "id").count() == 0


# ---------------------------------------------------------------- welch t


def test_welch_t_hand_computed(spark):
    """a=[1,2,3] (mean 2, var 1), b=[4,6,8,10] (mean 7, var 20/3):
    se2 = 1/3 + 5/3 = 2, t = 5/sqrt(2),
    df = 4 / ((1/9)/2 + (25/9)/3)."""
    import math

    from ups_crossref_etl_spark.operators.stats import welch_t

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 4.0), ("b", 6.0), ("b", 8.0), ("b", 10.0)]
    r = welch_t(
        spark.createDataFrame(rows, "g string, v double"), "g", "v"
    ).collect()[0]
    assert (r.group_a, r.group_b, r.n_a, r.n_b) == ("a", "b", 3, 4)
    assert abs(r.mean_a - 2.0) < 1e-9 and abs(r.mean_b - 7.0) < 1e-9
    assert abs(r.var_a - 1.0) < 1e-6
    assert abs(r.var_b - round(20 / 3, 6)) < 1e-6
    sa2, sb2 = 1 / 3, (20 / 3) / 4
    t = 5 / math.sqrt(sa2 + sb2)
    dfw = (sa2 + sb2) ** 2 / (sa2**2 / 2 + sb2**2 / 3)
    assert abs(r.t_stat - round(t, 6)) < 1e-5
    assert abs(r.df_welch - round(dfw, 4)) < 1e-3


def test_welch_t_degenerate_null(spark):
    from ups_crossref_etl_spark.operators.stats import welch_t

    rows = [("a", 1.0), ("b", 2.0), ("b", 3.0)]  # group a has n=1
    r = welch_t(
        spark.createDataFrame(rows, "g string, v double"), "g", "v"
    ).collect()[0]
    assert r.t_stat is None and r.df_welch is None


# ---------------------------------------------------------------- mcnemar


def test_mcnemar_hand_computed(spark):
    """b=6 (a pos, b not), c=2: chi2 = 16/8 = 2."""
    from ups_crossref_etl_spark.operators.agreement import mcnemar

    rows = (
        [("p", "p")] * 10 + [("p", "o")] * 6 + [("o", "p")] * 2
        + [("o", "o")] * 5
    )
    r = mcnemar(
        spark.createDataFrame(rows, "a string, b string"), "a", "b", "p"
    ).collect()[0]
    assert (r.n, r.n_pos_a, r.n_pos_b) == (23, 16, 12)
    assert (r.b_discordant, r.c_discordant) == (6, 2)
    assert abs(r.chi2 - 2.0) < 1e-9


def test_mcnemar_no_disagreement_null(spark):
    from ups_crossref_etl_spark.operators.agreement import mcnemar

    rows = [("p", "p"), ("o", "o")]
    r = mcnemar(
        spark.createDataFrame(rows, "a string, b string"), "a", "b", "p"
    ).collect()[0]
    assert r.chi2 is None


# --------------------------------------------------------- hashed features


def test_hashed_features_deterministic_and_counts(spark):
    import hashlib

    from ups_crossref_etl_spark.operators.features import hashed_features

    df = spark.createDataFrame(
        [(1, "spark spark join"), (2, ""), (3, None)],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in hashed_features(df, "doc_id", "text", dim=8).collect()}
    assert set(out) == {1, 2}  # NULL text excluded, empty text kept
    r1 = out[1]
    assert r1.n_tokens == 3 and r1.n_nonzero in (1, 2)

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 8

    expect = {}
    for tok in ["spark", "spark", "join"]:
        expect[bucket(tok)] = expect.get(bucket(tok), 0) + 1
    expected_str = ",".join(f"{b}:{c}" for b, c in sorted(expect.items()))
    assert r1.features == expected_str
    assert out[2].n_tokens == 0 and out[2].features == ""


# -------------------------------------------------- closure / SCC


def test_transitive_closure_chain_and_cycle(spark):
    from ups_crossref_etl_spark.operators.graph import transitive_closure

    # chain 1->2->3 plus cycle 10<->11
    e = _edges(spark, [(1, 2), (2, 3), (10, 11), (11, 10)])
    pairs = {
        (r.src, r.dst) for r in transitive_closure(e, max_iter=10).collect()
    }
    assert pairs == {
        (1, 2), (2, 3), (1, 3),
        (10, 11), (11, 10), (10, 10), (11, 11),
    }


def test_transitive_closure_strict_raises_on_max_iter(spark):
    import pytest

    from ups_crossref_etl_spark.operators.graph import transitive_closure

    chain = _edges(spark, [(i, i + 1) for i in range(8)])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        transitive_closure(chain, max_iter=2, strict=True)


def test_scc_counterexample_graph(spark):
    """{2->1, 3->1, 2->3}: min-forward/min-backward labels tie nodes 2
    and 3, but true SCCs are all singletons — the operator must get
    this right."""
    from ups_crossref_etl_spark.operators.graph import (
        strongly_connected_components,
    )

    e = _edges(spark, [(2, 1), (3, 1), (2, 3)])
    out = {r.node: r.scc_id for r in strongly_connected_components(e).collect()}
    assert out == {1: 1, 2: 2, 3: 3}


def test_scc_cycle_plus_tail(spark):
    """1->2->3->1 cycle with tail 3->4: cycle shares an id, tail is a
    singleton."""
    from ups_crossref_etl_spark.operators.graph import (
        strongly_connected_components,
    )

    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    out = {r.node: r.scc_id for r in strongly_connected_components(e).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4}


def test_scc_two_cycles_bridged(spark):
    """Two 2-cycles joined by a one-way bridge stay separate SCCs."""
    from ups_crossref_etl_spark.operators.graph import (
        strongly_connected_components,
    )

    e = _edges(spark, [(1, 2), (2, 1), (3, 4), (4, 3), (2, 3)])
    out = {r.node: r.scc_id for r in strongly_connected_components(e).collect()}
    assert out == {1: 1, 2: 1, 3: 3, 4: 3}


# ------------------------------------------------------- label spreading


def test_spread_labels_nearest_seed_wins(spark):
    """Path 1-2-3-4-5 with seeds {1:'a', 5:'b'}: 2->a (dist 1),
    4->b (dist 1), 3 ties at dist 2 -> min label 'a'."""
    from ups_crossref_etl_spark.operators.graph import spread_labels

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = spark.createDataFrame(
        [(1, "a"), (5, "b")], "node bigint, label string"
    )
    out = {r.node: (r.label, r.dist) for r in spread_labels(e, seeds).collect()}
    assert out == {
        1: ("a", 0), 2: ("a", 1), 3: ("a", 2), 4: ("b", 1), 5: ("b", 0),
    }


def test_spread_labels_unreachable_absent(spark):
    from ups_crossref_etl_spark.operators.graph import spread_labels

    e = _edges(spark, [(1, 2), (10, 11)])  # two components, one seeded
    seeds = spark.createDataFrame([(1, "x")], "node bigint, label string")
    out = {r.node for r in spread_labels(e, seeds).collect()}
    assert out == {1, 2}


def test_spread_labels_strict_raises(spark):
    import pytest

    from ups_crossref_etl_spark.operators.graph import spread_labels

    chain = _edges(spark, [(i, i + 1) for i in range(6)])
    seeds = spark.createDataFrame([(0, "s")], "node bigint, label string")
    with pytest.raises(RuntimeError, match="still spreading"):
        spread_labels(chain, seeds, max_iter=2, strict=True)


# ----------------------------------------------------------------- ktruss


def test_ktruss_triangle_with_tail(spark):
    """Triangle 1-2-3 plus pendant edge 3-4: 3-truss = the triangle
    (each edge in 1 triangle), pendant dropped."""
    from ups_crossref_etl_spark.operators.graph import ktruss

    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    out = {(r.lo, r.hi): r.support for r in ktruss(e, k=3).collect()}
    assert out == {(1, 2): 1, (2, 3): 1, (1, 3): 1}


def test_ktruss_cascading_peel(spark):
    """Two triangles sharing edge 2-3 plus a 4th vertex closing K4 on
    {1,2,3,4}: k=4 keeps K4 (every edge in 2 triangles); adding a
    lone triangle {10,11,12} it gets peeled at k=4 (support 1)."""
    from ups_crossref_etl_spark.operators.graph import ktruss

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    lone = [(10, 11), (11, 12), (10, 12)]
    e = _edges(spark, k4 + lone)
    out = {(r.lo, r.hi) for r in ktruss(e, k=4).collect()}
    assert out == set(k4)
    sup = {(r.lo, r.hi): r.support for r in ktruss(e, k=4).collect()}
    assert all(v == 2 for v in sup.values())


def test_ktruss_k2_keeps_triangle_free_edges(spark):
    from ups_crossref_etl_spark.operators.graph import ktruss

    e = _edges(spark, [(1, 2), (3, 4)])
    out = {(r.lo, r.hi): r.support for r in ktruss(e, k=2).collect()}
    assert out == {(1, 2): 0, (3, 4): 0}


def test_ktruss_empty_result(spark):
    from ups_crossref_etl_spark.operators.graph import ktruss

    e = _edges(spark, [(1, 2), (2, 3)])  # no triangles at all
    assert ktruss(e, k=3).count() == 0


def test_ktruss_rejects_nonpositive_max_iter(spark):
    """max_iter < 1 must raise up-front (ADVICE r7: it previously fell
    through the loop and raised UnboundLocalError on ``surv``)."""
    import pytest

    from ups_crossref_etl_spark.operators.graph import ktruss

    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    with pytest.raises(ValueError, match="max_iter"):
        ktruss(e, k=3, max_iter=0)


# -------------------------------------------------- dense triangle count


def test_triangle_count_dense_matches_sparse(spark):
    """Dense bitset path and sparse degree-oriented wedge join agree on
    a graph mixing a clique, a pendant, and an isolated triangle."""
    from ups_crossref_etl_spark.operators.graph import (
        triangle_count,
        triangle_count_dense,
    )

    # K5 on 1-5 (10 triangles) + pendant 6 + triangle 7-8-9
    k5 = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    e = _edges(spark, k5 + [(5, 6), (7, 8), (8, 9), (7, 9)])
    assert triangle_count(e).first()["n_triangles"] == 11
    assert triangle_count_dense(e).first()["n_triangles"] == 11
    # auto-dispatch picks dense under the bound, sparse above it —
    # both exact, same answer
    assert triangle_count(e, dense_max_nodes=16).first()["n_triangles"] == 11
    assert triangle_count(e, dense_max_nodes=3).first()["n_triangles"] == 11


def test_triangle_count_dense_node_bound_raises(spark):
    import pytest

    from ups_crossref_etl_spark.operators.graph import triangle_count_dense

    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    with pytest.raises(ValueError, match="max_nodes"):
        triangle_count_dense(e, max_nodes=3)
