"""Round-7 hardening tests: the four ADVICE-flagged edge cases.

Each test pins a behavior that previously held only by accident of the
callers (bigint keys, no payload ties, pre-filtered NULLs):
- leakage_safe_split with STRING keys (singletons must not collapse),
- merge_cdc_state payload-level commutativity on (key, seq, op) ties,
- mad_outliers internal consistency under NULL values,
- skyline NULL/NaN criterion rows dropped (SQL dominance semantics).
"""

from __future__ import annotations

import math

from pyspark.sql import Row

from ups_crossref_etl_spark.operators.sampling import leakage_safe_split
from ups_crossref_etl_spark.operators.skyline import skyline
from ups_crossref_etl_spark.operators.stats import mad_outliers
from ups_crossref_etl_spark.streaming import events as se


def test_leakage_safe_split_string_keys_singletons_stay_distinct(spark):
    """Non-numeric string keys: every singleton is its OWN component (the
    old bigint-cast fallback turned them all into one NULL component)."""
    docs = spark.createDataFrame([Row(doc_id=f"doc-{i}") for i in range(60)])
    edges = spark.createDataFrame(
        [Row(src="doc-0", dst="doc-1"), Row(src="doc-1", dst="doc-2")]
    )
    out = leakage_safe_split(docs, edges, "doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 60
    comp = {by_id[f"doc-{i}"]["component"] for i in range(3)}
    assert comp == {"doc-0"}
    splits = {by_id[f"doc-{i}"]["split"] for i in range(3)}
    assert len(splits) == 1
    # singletons: component == own key, no NULL collapse, hash spreads
    singles = [r for r in out if r["doc_id"] not in {"doc-0", "doc-1", "doc-2"}]
    assert all(r["component"] == r["doc_id"] for r in singles)
    assert len({r["split"] for r in singles}) == 3


def _chg(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, v=v, op=op, seq=seq) for (k, v, op, seq) in rows]
    )


def test_merge_cdc_state_payload_tie_is_deterministic(spark):
    """Two DISTINCT payloads tying on (key, seq, op): the same full row
    must win regardless of batch arrival order, and regardless of whether
    the tie happens inside one batch or across the batch/state boundary."""
    a = _chg(spark, [(1, "payload-a", "U", 10)])
    b = _chg(spark, [(1, "payload-b", "U", 10)])

    def full(state):
        return sorted(tuple(r) for r in state.collect())

    ab = full(se.merge_cdc_state(se.merge_cdc_state(None, a, ["k"]), b, ["k"]))
    ba = full(se.merge_cdc_state(se.merge_cdc_state(None, b, ["k"]), a, ["k"]))
    one = full(se.merge_cdc_state(None, a.unionByName(b), ["k"]))
    assert ab == ba == one
    assert len(ab) == 1


def test_mad_outliers_null_values_excluded_from_n(spark):
    rows = [Row(k="a", v=float(v)) for v in [1, 2, 3, 4, 100]]
    rows += [Row(k="a", v=None)] * 5  # NULLs: not counted, not outliers
    rows += [Row(k="z", v=None)] * 3  # all-NULL group: absent from output
    got = {r["k"]: r for r in mad_outliers(spark.createDataFrame(rows), "k", "v").collect()}
    assert set(got) == {"a"}
    assert got["a"]["n"] == 5
    assert got["a"]["med"] == 3.0
    assert got["a"]["n_outliers"] == 1


def test_skyline_null_and_nan_criteria_rows_dropped(spark):
    rows = [
        Row(id=1, cost=1.0, size=1),
        Row(id=2, cost=2.0, size=5),
        Row(id=3, cost=None, size=9),          # NULL criterion -> dropped
        Row(id=4, cost=math.nan, size=99),     # NaN criterion -> dropped
        Row(id=5, cost=3.0, size=5),           # dominated by 2
    ]
    got = {r["id"] for r in
           skyline(spark.createDataFrame(rows),
                   minimize=["cost"], maximize=["size"]).collect()}
    assert got == {1, 2}


def _mega_mentions(spark, n):
    """One ORCID pasted onto n distinct names: every mention chains into a
    single identity component through the shared o:<orcid> node."""
    rows = [
        Row(
            DOI=f"10.1/{i:06d}",
            author_pos=1,
            NombreLimpio=f"Name {i:06d}",
            name_norm=f"name {i:06d}",
            orcid="0000-0001-0000-0000",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_resolve_authors_mega_component_one_identity_and_warn(spark):
    """A pathological mega-component (one ORCID chaining thousands of
    names) still resolves correctly — every mention maps to ONE author,
    the first in canonical (DOI, pos) order — and the size guard warns."""
    import warnings

    from ups_crossref_etl_spark.plans.entities import resolve_authors

    occ = _mega_mentions(spark, 3000)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        autores, mapping = resolve_authors(occ, max_component_mentions=1000)
        a = autores.collect()
        m = mapping.collect()
    assert any("chains" in str(w.message) for w in caught)
    assert len(a) == 1
    assert a[0]["NombreBusqueda"] == "name 000000"
    assert a[0]["Orcid"] == "0000-0001-0000-0000"
    assert len(m) == 3000 and len({r["AutorID"] for r in m}) == 1


def test_resolve_authors_mega_component_strict_raises(spark):
    import pytest

    from ups_crossref_etl_spark.plans.entities import resolve_authors

    occ = _mega_mentions(spark, 50)
    with pytest.raises(RuntimeError, match="chains 5[0-9] mentions"):
        resolve_authors(occ, max_component_mentions=10, strict=True)
    # default cap: no tripwire, resolution proceeds
    autores, _ = resolve_authors(occ)
    assert autores.count() == 1


def test_theil_sen_cap_bounds_pairs_on_mega_key(spark):
    """One key with a huge history: the cap must bound n_pairs at
    ~cap^2/2 and n_points at <= cap, while the slope on a clean linear
    series survives subsampling exactly."""
    import datetime

    from ups_crossref_etl_spark.operators.timeseries import theil_sen_trend

    base = datetime.datetime(2024, 1, 1)
    rows = [
        Row(k="hot", ts=base + datetime.timedelta(seconds=10 * i), v=2.5 * 10 * i)
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows)
    got = theil_sen_trend(df, "k", "ts", "v", max_points_per_key=40).collect()[0]
    assert got["n_points"] <= 40
    assert got["n_pairs"] <= 40 * 39 / 2
    assert got["slope"] == 2.5  # exact linear series: subsample-invariant
    full = theil_sen_trend(df, "k", "ts", "v").collect()[0]
    assert full["n_points"] == 2000 and full["slope"] == 2.5


# --------------------------------------------------------------------------
# Kneser-Ney bigram scoring
# --------------------------------------------------------------------------


def test_kneser_ney_hand_model(spark):
    import math

    from pyspark.sql import functions as F
    from ups_crossref_etl_spark.operators.text_analysis import kneser_ney_nll

    model = spark.createDataFrame(
        [(0, "a b a b a c")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    out = kneser_ney_nll(score, "text", "doc_id", model_df=model).first()
    # model: c(ab)=2 c(ba)=2 c(ac)=1; cl(a)=3 nl(a)=2; cl(b)=2 nl(b)=1;
    # nr = 1 for each of a,b,c; B=3, V=3 -> Pc = 2/6 for seen words
    pc = 2.0 / 6.0
    p_b_a = max(2 - 0.75, 0) / 3 + (0.75 * 2 / 3) * pc
    p_c_b = max(0 - 0.75, 0) / 2 + (0.75 * 1 / 2) * pc
    want = round((-math.log(p_b_a) - math.log(p_c_b)) / 2, 4)
    assert out["n_bigrams"] == 2
    assert abs(out["nll"] - want) < 1e-9


def test_kneser_ney_normalizes_over_vocab(spark):
    # sum over the model vocab of P(w2|w1) must be exactly 1 for a seen
    # context (Laplace-smoothed continuation sums to 1 over vocab)
    from ups_crossref_etl_spark.operators.text_analysis import kneser_ney_nll
    import math

    model_text = "a b a b a c"
    model = spark.createDataFrame(
        [(0, model_text)], "doc_id long, text string"
    )
    vocab = ["a", "b", "c"]
    probes = spark.createDataFrame(
        [(i + 1, f"a {w}") for i, w in enumerate(vocab)],
        "doc_id long, text string",
    )
    rows = kneser_ney_nll(
        probes, "text", "doc_id", model_df=model
    ).collect()
    total = sum(math.exp(-r["nll"]) for r in rows)
    assert abs(total - 1.0) < 1e-3  # nll is rounded 4dp per doc


# --------------------------------------------------------------------------
# TextRank keywords
# --------------------------------------------------------------------------


def test_textrank_hub_word_ranks_highest(spark):
    from ups_crossref_etl_spark.operators.text_analysis import (
        textrank_keywords,
    )

    # 'hub' co-occurs with everything; satellites only with the hub
    docs = [
        (1, "hub alpha hub beta hub gamma"),
        (2, "delta hub epsilon hub zeta"),
        (3, "hub alpha"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = textrank_keywords(df, "text", window=2, n_iter=5).collect()
    ranks = {r["word"]: r["rank"] for r in rows}
    assert max(ranks, key=ranks.get) == "hub"
    assert set(ranks) == {
        "hub", "alpha", "beta", "gamma", "delta", "epsilon", "zeta"
    }


def test_textrank_short_and_single_token_docs(spark):
    from ups_crossref_etl_spark.operators.text_analysis import (
        textrank_keywords,
    )

    df = spark.createDataFrame(
        [(1, "solo"), (2, "pair word"), (3, "")],
        "doc_id long, text string",
    )
    rows = textrank_keywords(df, "text", window=2, n_iter=2).collect()
    # only the 2-token doc contributes an edge
    assert {r["word"] for r in rows} == {"pair", "word"}


def test_hll_intersection_estimate_known_overlap(spark):
    from ups_crossref_etl_spark.operators.sketches import (
        hll_intersection_estimate,
    )

    # A = 0..999, B = 500..1499: |A∩B| = 500, |A∪B| = 1500
    rows = [(i, "a") for i in range(1000)] + [
        (i, "b") for i in range(500, 1500)
    ]
    df = spark.createDataFrame(rows, "v long, g string")
    est = hll_intersection_estimate(df, "v", "g", "a", "b", lg_k=12).first()
    assert abs(est["est_a"] - 1000) <= 50
    assert abs(est["est_b"] - 1000) <= 50
    assert abs(est["est_union"] - 1500) <= 75
    assert abs(est["est_intersection"] - 500) <= 100


def test_top_session_paths_hand_case(spark):
    import datetime as dt

    from ups_crossref_etl_spark.operators.paths import top_session_paths

    rows = [
        # user 1: a>b then (gap) c
        (1, 1, "a", 0), (1, 2, "b", 10), (1, 3, "c", 5000),
        # user 2: a>b
        (2, 4, "a", 0), (2, 5, "b", 30),
        # user 3: truncation: 5 events, cap at 3
        (3, 6, "x", 0), (3, 7, "y", 1), (3, 8, "z", 2),
        (3, 9, "q", 3), (3, 10, "r", 4),
    ]
    df = spark.createDataFrame(
        [
            (u, i, t, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
            for u, i, t, s in rows
        ],
        "user_id long, event_id long, event_type string, ts timestamp",
    )
    out = {
        r["path"]: (r["n_sessions"], r["rank"])
        for r in top_session_paths(
            df, "user_id", "ts", "event_type", "event_id",
            gap_seconds=60, max_events=3, k=10,
        ).collect()
    }
    assert out["a>b"] == (2, 1)
    assert out["c"][0] == 1
    assert out["x>y>z"][0] == 1
    assert "x>y>z>q>r" not in out


def test_quota_allocate_exact_and_fair(spark):
    from ups_crossref_etl_spark.operators.sampling import quota_allocate

    rows = (
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2 + [("d",)] * 1
    )
    df = spark.createDataFrame(rows, "g string")
    for total in (7, 10, 11, 137):
        out = {r["g"]: r["alloc"] for r in quota_allocate(df, "g", total).collect()}
        assert sum(out.values()) == total
        n = {"a": 5, "b": 3, "c": 2, "d": 1}
        for g, a in out.items():
            exact = total * n[g] / 11
            assert abs(a - exact) < 1, (total, g, a, exact)


def test_zipf_stats_on_exact_power_law(spark):
    from ups_crossref_etl_spark.operators.text_analysis import (
        zipf_power_law_stats,
    )

    # construct counts f(r) = 2^(12-r) -> ln f = ln(2^12) - r ln 2:
    # log-log is NOT linear, but Hill over a geometric tail is exact:
    # sum ln(f_i/f_11) = ln2 * sum (11-i) = 55 ln2 -> alpha = 1+10/(55 ln2)
    import math

    words = []
    for r in range(1, 13):
        words += [f"w{r:02d}"] * (2 ** (12 - r))
    df = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    out = zipf_power_law_stats(df, "text", hill_k=10).first()
    assert out["n_words"] == 12
    want_alpha = round(1 + 10 / (55 * math.log(2)), 4)
    assert abs(out["hill_alpha"] - want_alpha) <= 1e-9
    assert out["zipf_slope"] < 0
    assert 0 <= out["zipf_r2"] <= 1


def test_uniform_negative_sampling_contract(spark, sf_dir):
    from ups_crossref_etl_spark.operators.mining import (
        uniform_negative_sampling,
    )
    from ups_crossref_etl_spark.sources.lake import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    out = uniform_negative_sampling(emb, "vec_id", "label", k=4).collect()
    labels = {
        r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()
    }
    per_anchor = {}
    for r in out:
        assert r["neg_id"] != r["anchor_id"]
        assert r["neg_label"] != labels[r["anchor_id"]]
        assert labels[r["neg_id"]] == r["neg_label"]
        per_anchor.setdefault(r["anchor_id"], []).append(r["slot"])
    for a, slots in per_anchor.items():
        assert sorted(slots) == list(range(1, len(slots) + 1))
        assert len(slots) <= 4
    # deterministic across invocations
    again = uniform_negative_sampling(emb, "vec_id", "label", k=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_fd_audit_exact_and_violated(spark):
    from ups_crossref_etl_spark.operators.profile import fd_audit

    rows = [
        (1, "a", 10), (1, "a", 10), (2, "b", 20), (2, "b", 21),
        (3, None, 30), (3, "c", 30), (4, "d", None), (4, "d", 40),
    ]
    df = spark.createDataFrame(rows, "k long, s string, v int")
    out = {
        (r["lhs"], r["rhs"]): r
        for r in fd_audit(df, [("k", "s"), ("k", "v")]).collect()
    }
    ks = out[("k", "s")]
    # k=3 maps to {NULL, 'c'} -> violating (NULL is a value)
    assert ks["n_groups"] == 4 and ks["n_violating"] == 1
    assert ks["max_rhs_distinct"] == 2
    kv = out[("k", "v")]
    # k=2 -> {20,21}, k=4 -> {NULL,40}: 2 violations
    assert kv["n_violating"] == 2
    assert kv["violation_rate"] == 0.5


def test_mutual_top1_pairs_brute(spark):
    import numpy as np

    from ups_crossref_etl_spark.operators.similarity import mutual_top1_pairs

    rng = np.random.RandomState(3)
    x = rng.randn(30, 8)
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["id_a"], r["id_b"]) for r in mutual_top1_pairs(df).collect()
    }
    xd = np.array([np.asarray(x[i], dtype=np.float32) for i in range(30)],
                  dtype=np.float64)
    n = xd / np.linalg.norm(xd, axis=1, keepdims=True)
    cos = np.round(n @ n.T, 4)
    np.fill_diagonal(cos, -2)
    # argmax with (cos desc, id asc) tiebreak
    top = [min(np.flatnonzero(cos[i] == cos[i].max())) for i in range(30)]
    want = {
        tuple(sorted((i, top[i])))
        for i in range(30)
        if top[top[i]] == i
    }
    assert got == want and got  # mutual pairs exist in random data


def test_kaplan_meier_hand_case(spark):
    import datetime as dt

    from ups_crossref_etl_spark.operators.survival import kaplan_meier

    # 4 users enter; events at t=1h (u1), t=2h (u2); u3 censored at
    # horizon 4h; u4 converts OUTSIDE horizon -> censored
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, "signup", 0), (1, "purchase", 3700),
        (2, "signup", 0), (2, "purchase", 7300),
        (3, "signup", 0),
        (4, "signup", 0), (4, "purchase", 999999),
    ]
    df = spark.createDataFrame(
        [(u, t, base + dt.timedelta(seconds=s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )
    out = {
        r["t"]: r
        for r in kaplan_meier(
            df, "user_id", "event_type", "ts",
            "signup", "purchase", horizon_seconds=4 * 3600,
        ).collect()
    }
    # t=1: n_risk 4, d 1 -> S = 0.75 ; t=2: n_risk 3, d 1 -> S = 0.5
    assert out[1]["n_risk"] == 4 and out[1]["n_events"] == 1
    assert abs(out[1]["survival"] - 0.75) < 1e-9
    assert out[2]["n_risk"] == 3 and abs(out[2]["survival"] - 0.5) < 1e-9
    assert set(out) == {1, 2}


def test_kaplan_meier_all_convert_hits_zero(spark):
    import datetime as dt

    from ups_crossref_etl_spark.operators.survival import kaplan_meier

    base = dt.datetime(2024, 1, 1)
    rows = [(u, "signup", 0) for u in (1, 2)] + [
        (1, "purchase", 100), (2, "purchase", 200),
    ]
    df = spark.createDataFrame(
        [(u, t, base + dt.timedelta(seconds=s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )
    out = kaplan_meier(
        df, "user_id", "event_type", "ts",
        "signup", "purchase", horizon_seconds=3600,
        bucket_seconds=60,
    ).collect()
    last = max(out, key=lambda r: r["t"])
    assert last["survival"] == 0.0


def test_abc_classification_hand_case(spark):
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.stats import abc_classification

    # values 50, 30, 15, 5 -> cum shares 0.5, 0.8, 0.95, 1.0
    rows = [("k1", 50.0), ("k2", 30.0), ("k3", 15.0), ("k4", 5.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = {
        r["k"]: (r["cum_share"], r["abc_class"])
        for r in abc_classification(df, "k", F.col("v")).collect()
    }
    assert out["k1"] == (0.5, "A")
    assert out["k2"] == (0.8, "A")
    assert out["k3"] == (0.95, "B")
    assert out["k4"] == (1.0, "C")


def test_best_entropy_split_separable(spark):
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.evaluation import (
        best_entropy_split,
    )

    # perfectly separable at x <= 5
    rows = [(float(x), 1) for x in range(1, 6)] + [
        (float(x), 0) for x in range(6, 11)
    ]
    df = spark.createDataFrame(rows, "x double, y int")
    out = best_entropy_split(df, "x", F.col("y") == 1).first()
    assert out["threshold"] == 5.0
    import math

    assert abs(out["gain"] - round(math.log(2), 6)) < 1e-9
    assert out["n_left"] == 5 and out["pos_left"] == 5
    assert out["n_right"] == 5 and out["pos_right"] == 0


def test_best_entropy_split_matches_brute(spark):
    import math

    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.evaluation import (
        best_entropy_split,
    )

    rows = [(1.0, 1), (1.0, 0), (2.0, 1), (3.0, 0), (3.0, 0),
            (4.0, 1), (5.0, 0), (6.0, 1), (6.0, 1)]
    df = spark.createDataFrame(rows, "x double, y int")

    def H(p, n):
        if n == 0 or p in (0, n):
            return 0.0
        q = p / n
        return -q * math.log(q) - (1 - q) * math.log(1 - q)

    xs = sorted({r[0] for r in rows})
    tn, tp = len(rows), sum(r[1] for r in rows)
    best = None
    for t in xs:
        nl = sum(1 for r in rows if r[0] <= t)
        pl = sum(r[1] for r in rows if r[0] <= t)
        nr, pr = tn - nl, tp - pl
        if nr == 0:
            continue
        gain = round(
            H(tp, tn) - nl / tn * H(pl, nl) - nr / tn * H(pr, nr), 6
        )
        if best is None or gain > best[1]:
            best = (t, gain)
    out = best_entropy_split(df, "x", F.col("y") == 1).first()
    assert (out["threshold"], out["gain"]) == best


def test_ht_estimate_unbiased_shape(spark, sf_dir):
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.sampling import ht_estimate
    from ups_crossref_etl_spark.sources.lake import read_table

    d = read_table(spark, sf_dir, "documents")
    out = {
        r["source"]: r
        for r in ht_estimate(
            d, "source", "doc_id", "n_chars",
            rates={"src0": 0.2}, default_rate=0.5,
        ).collect()
    }
    true = {
        r["source"]: (r["n"], r["s"])
        for r in d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s"))
        .collect()
    }
    for src, r in out.items():
        n_true, s_true = true[src]
        # HT is an estimate: within a loose factor on small strata, and
        # n_hat = n_sampled / rate exactly
        rate = 0.2 if src == "src0" else 0.5
        assert abs(r["n_hat"] - r["n_sampled"] / rate) < 1e-6
        assert r["n_sampled"] <= n_true
        assert r["value_hat"] > 0


def test_ht_estimate_rate_one_is_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.sampling import ht_estimate
    from ups_crossref_etl_spark.sources.lake import read_table

    d = read_table(spark, sf_dir, "documents")
    out = {r["source"]: r for r in ht_estimate(
        d, "source", "doc_id", "n_chars", rates={}, default_rate=1.0
    ).collect()}
    true = {
        r["source"]: (r["n"], r["s"])
        for r in d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s"))
        .collect()
    }
    for src, (n_true, s_true) in true.items():
        assert out[src]["n_sampled"] == n_true
        assert out[src]["n_hat"] == float(n_true)
        assert out[src]["value_hat"] == float(s_true)


def test_cuped_reduces_variance_when_correlated(spark):
    import datetime as dt

    from ups_crossref_etl_spark.operators.experiment import cuped_readout

    base = dt.datetime(2024, 1, 1)
    cut = dt.datetime(2024, 1, 16)
    rows = []
    # user-level latent scale makes pre and post strongly correlated
    for u in range(1, 201):
        scale = 10.0 + (u * 7 % 50)
        rows.append((u, base + dt.timedelta(hours=u), scale))
        rows.append((u, cut + dt.timedelta(hours=u), scale + (u % 3)))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    out = cuped_readout(
        df, "user_id", "ts", "value", "2024-01-16 00:00:00"
    ).first()
    assert out["n_users"] == 200
    assert out["n_a"] + out["n_b"] == 200
    assert out["var_reduction"] > 0.5  # strong pre/post correlation
    # adjusted diff stays close to the raw diff (unbiasedness, roughly)
    assert abs(out["diff_cuped"] - out["diff_raw"]) < 5.0


def test_cuped_no_pre_signal_changes_nothing_much(spark):
    import datetime as dt

    from ups_crossref_etl_spark.operators.experiment import cuped_readout

    cut = dt.datetime(2024, 1, 16)
    rows = []
    for u in range(1, 101):
        # pre is a constant: var(X) within users is 0 across users? no -
        # make pre UNcorrelated with post instead
        rows.append((u, dt.datetime(2024, 1, 2), float((u * 13) % 7)))
        rows.append((u, cut, float((u * 29) % 11)))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    out = cuped_readout(
        df, "user_id", "ts", "value", "2024-01-16 00:00:00"
    ).first()
    assert out["var_reduction"] < 0.2


def test_rfm_segments_contract(spark, sf_dir):
    from ups_crossref_etl_spark.operators.stats import rfm_segments
    from ups_crossref_etl_spark.sources.lake import read_table

    o = read_table(spark, sf_dir, "orders")
    out = rfm_segments(o, "o_custkey", "o_orderdate", "o_totalprice")
    rows = out.collect()
    n_cust = o.select("o_custkey").distinct().count()
    assert len(rows) == n_cust
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["rfm_segment"] == f"{r['r_score']}{r['f_score']}{r['m_score']}"
        assert r["recency_days"] >= 0
    # someone is most recent: recency 0 exists and gets r_score 5
    best = [r for r in rows if r["recency_days"] == 0]
    assert best and all(r["r_score"] == 5 for r in best[:1])
