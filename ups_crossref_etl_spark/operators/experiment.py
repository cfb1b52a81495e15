"""CUPED — variance-reduced experiment readouts.

Extension layer — no counterpart in /root/reference. CUPED (Deng,
Xu, Kohavi & Walker 2013, "Improving the Sensitivity of Online
Controlled Experiments by Utilizing Pre-Experiment Data") is the
standard industrial upgrade to the plain A/B difference-of-means
(``q_events_ab_readout``): regress out each user's PRE-period metric
X from their experiment-period metric Y,

    Y* = Y − θ·(X − E[X]),   θ = cov(X, Y) / var(X),

which leaves the treatment-effect estimate unbiased (assignment is
independent of X) while shrinking its variance by the squared X-Y
correlation — often 30-50 % smaller confidence intervals for free.

Determinism contract: per-user X/Y are DECIMAL-exact sums of
nano-unit integers; θ comes from the five pooled sufficient statistics
(the groupwise_trend recipe — decimal sums, one double expression);
the adjusted means/variances accumulate each user's Y* term as
DECIMAL(38,12) before the per-arm aggregate. Output rounded.

Scale shape: one user-keyed aggregate over the events (the only
fact-sized shuffle), one 1-row pooled-moments aggregate, one map-side
Y* computation, one 2-key arm aggregate. Assignment is the md5 hash
bucket (operators/sampling.hash_bucket) — reproducible and
join-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket

__all__ = ["cuped_readout"]

_DEC = "decimal(38,12)"


def cuped_readout(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    split_ts: str,
    seed: str = "ab",
) -> DataFrame:
    """One-row CUPED readout: users are hash-assigned to arms A/B;
    X = user's value sum strictly before ``split_ts`` (ISO string),
    Y = sum at/after it (missing periods count 0 — every user with any
    event participates). Returns ``(n_users, n_a, n_b, theta,
    diff_raw, diff_cuped, var_reduction)`` where the diffs are B−A
    mean differences and ``var_reduction = 1 − var(Y*)/var(Y)``
    (pooled)."""
    ev = events.filter(F.col(value_col).isNotNull()).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.round(F.col(value_col).cast("double") * 1e9)
        .cast("bigint")
        .alias("_vn"),
    )
    cut = F.lit(split_ts).cast("timestamp_ntz")
    per_user = ev.groupBy("_u").agg(
        F.sum(F.when(F.col("_ts") < cut, F.col("_vn")).otherwise(0)).alias(
            "_xn"
        ),
        F.sum(
            F.when(F.col("_ts") >= cut, F.col("_vn")).otherwise(0)
        ).alias("_yn"),
    )
    arms = per_user.withColumn(
        "_arm", hash_bucket(F.col("_u"), seed, 2)
    )
    # nano-unit moments are INTEGERS: scale-0 decimals keep 38 integer
    # digits (a (38,12) product leaves only 14 and overflows on xn*yn)
    _D0 = "decimal(38,0)"
    mo = arms.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_xn").cast(_D0)).alias("_sx"),
        F.sum(F.col("_yn").cast(_D0)).alias("_sy"),
        F.sum(F.col("_xn").cast(_D0) * F.col("_yn").cast(_D0)).alias(
            "_sxy"
        ),
        F.sum(F.col("_xn").cast(_D0) * F.col("_xn").cast(_D0)).alias(
            "_sxx"
        ),
    )
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    mo = mo.select(
        "_n",
        ((n * sxy - sx * sy) / (n * sxx - sx * sx)).alias("_theta"),
        (sx / n).alias("_mx"),
    )
    adj = arms.crossJoin(F.broadcast(mo)).select(
        "_arm",
        (F.col("_yn").cast("double") / 1e9).alias("_y"),
        (
            (
                F.col("_yn").cast("double")
                - F.col("_theta")
                * (F.col("_xn").cast("double") - F.col("_mx"))
            )
            / 1e9
        ).alias("_ystar"),
        "_theta",
    )
    agg = adj.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.when(F.col("_arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("_arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.max("_theta").alias("_th"),
        *[
            F.sum(
                F.when(F.col("_arm") == arm, col).otherwise(F.lit(0.0)).cast(_DEC)
            ).alias(f"_s{name}{arm}")
            for arm in (0, 1)
            for name, col in (("y", F.col("_y")), ("z", F.col("_ystar")))
        ],
        F.sum(F.col("_y").cast(_DEC)).alias("_ty"),
        F.sum((F.col("_y") * F.col("_y")).cast(_DEC)).alias("_tyy"),
        F.sum(F.col("_ystar").cast(_DEC)).alias("_tz"),
        F.sum((F.col("_ystar") * F.col("_ystar")).cast(_DEC)).alias("_tzz"),
    )
    nu = F.col("n_users").cast("double")
    var_y = (
        F.col("_tyy").cast("double")
        - F.col("_ty").cast("double") * F.col("_ty").cast("double") / nu
    )
    var_z = (
        F.col("_tzz").cast("double")
        - F.col("_tz").cast("double") * F.col("_tz").cast("double") / nu
    )
    return agg.select(
        "n_users",
        "n_a",
        "n_b",
        (F.round(F.col("_th") / 1.0, 6) + F.lit(0.0)).alias("theta"),
        (
            F.round(
                F.col("_sy1").cast("double") / F.col("n_b")
                - F.col("_sy0").cast("double") / F.col("n_a"),
                4,
            )
            + F.lit(0.0)
        ).alias("diff_raw"),
        (
            F.round(
                F.col("_sz1").cast("double") / F.col("n_b")
                - F.col("_sz0").cast("double") / F.col("n_a"),
                4,
            )
            + F.lit(0.0)
        ).alias("diff_cuped"),
        (F.round(F.lit(1.0) - var_z / var_y, 4) + F.lit(0.0)).alias(
            "var_reduction"
        ),
    )


def permutation_test(
    df: DataFrame,
    id_col: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    n_permutations: int = 200,
    seed: str = "perm",
) -> DataFrame:
    """Hash-randomization test for a difference in means: one row
    ``(n_a, n_b, t_obs, n_extreme, p_value)``.

    The nonparametric significance readout that needs no normality
    assumption: re-assign every row's arm by an md5 coin b = 1..B and
    ask how often the random relabeling produces |mean_A − mean_B| at
    least as large as observed — p = (1 + #extreme) / (B + 1), the
    standard add-one Monte-Carlo estimator (Phipson & Smyth 2010).
    Relabeling is Bernoulli(1/2) per row keyed by
    md5(seed:id:replicate) — the same reproducible-coin recipe as
    ``bootstrap.poisson_bootstrap_means``, so the whole test is
    hash-exact across engines. Values lift to BIGINT nanos; every
    replicate mean is a ratio of exact integer sums rounded 6 dp, and
    the comparison happens on the rounded values on both sides.

    Scale shape: the replicate table is rows × B produced by one
    explode (map-only, no shuffle of text or arrays — just (b, coin,
    nano) triples), then ONE B-keyed aggregate with map-side combine.
    B is a constant (200), so the shuffle carries ≤ B·partitions
    pre-aggregated rows. The observed statistic is a 2-group aggregate
    of the same nano column.
    """
    base = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        F.col(id_col).cast("string").alias("_id"),
        (F.col(group_col) == F.lit(group_a)).alias("_is_a"),
        F.round(F.col(value_col).cast("double") * 1e9)
        .cast("bigint")
        .alias("_v"),
    ).filter(F.col("_v").isNotNull())
    obs = base.agg(
        F.sum(F.when(F.col("_is_a"), 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(~F.col("_is_a"), 1).otherwise(0)).cast("bigint").alias("n_b"),
        (
            F.round(
                F.sum(F.when(F.col("_is_a"), F.col("_v"))).cast("double")
                / F.sum(F.when(F.col("_is_a"), 1)).cast("double")
                / 1e9
                - F.sum(F.when(~F.col("_is_a"), F.col("_v"))).cast("double")
                / F.sum(F.when(~F.col("_is_a"), 1)).cast("double")
                / 1e9,
                6,
            )
            + 0.0
        ).alias("t_obs"),
    )
    # spread the base before the x B explode: a 1-split scan would run the
    # md5-per-replicate stage near-serial (same fix as poisson_bootstrap)
    reps = base.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    ).withColumn(
        "_b", F.explode(F.sequence(F.lit(1), F.lit(int(n_permutations))))
    )
    coin = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(seed), F.col("_id"), F.col("_b"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        % 2
        == 0
    )
    t_b = (
        reps.select("_b", coin.alias("_ca"), "_v")
        .groupBy("_b")
        .agg(
            (
                F.round(
                    F.sum(F.when(F.col("_ca"), F.col("_v"))).cast("double")
                    / F.sum(F.when(F.col("_ca"), 1)).cast("double")
                    / 1e9
                    - F.sum(F.when(~F.col("_ca"), F.col("_v"))).cast("double")
                    / F.sum(F.when(~F.col("_ca"), 1)).cast("double")
                    / 1e9,
                    6,
                )
                + 0.0
            ).alias("_t")
        )
    )
    extreme = t_b.crossJoin(F.broadcast(obs)).agg(
        F.sum(
            F.when(F.abs(F.col("_t")) >= F.abs(F.col("t_obs")), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_extreme")
    )
    return obs.crossJoin(F.broadcast(extreme)).select(
        "n_a",
        "n_b",
        "t_obs",
        "n_extreme",
        (
            F.round(
                (1 + F.col("n_extreme")).cast("double")
                / F.lit(float(n_permutations + 1)),
                6,
            )
            + 0.0
        ).alias("p_value"),
    )


def did_readout(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    split_ts: str,
    seed: str = "ab",
) -> DataFrame:
    """One-row difference-in-differences readout over hash-assigned
    arms: ``(n_users, n_a, n_b, pre_a, pre_b, post_a, post_b, did)``
    with did = (post_b - pre_b) - (post_a - pre_a) on per-user period
    means.

    The parallel-trends estimator that survives a level difference
    between arms existing BEFORE the change — where the plain post-
    period diff (``q_events_ab_readout``) would book a pre-existing gap
    as treatment effect, DiD nets it out against the pre-period gap.
    Same determinism recipe as :func:`cuped_readout`: per-user BIGINT
    nano sums (one user-keyed aggregate), md5 arm assignment
    (``sampling.hash_bucket``), then a 2-row arm aggregate; every mean
    is a ratio of exact integers and the final estimate is one rounded
    expression.
    """
    ev = events.filter(F.col(value_col).isNotNull()).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.round(F.col(value_col).cast("double") * 1e9)
        .cast("bigint")
        .alias("_vn"),
    )
    cut = F.lit(split_ts).cast("timestamp_ntz")
    per_user = ev.groupBy("_u").agg(
        F.sum(F.when(F.col("_ts") < cut, F.col("_vn")).otherwise(0)).alias("_xn"),
        F.sum(F.when(F.col("_ts") >= cut, F.col("_vn")).otherwise(0)).alias("_yn"),
    )
    arms = per_user.withColumn("_arm", hash_bucket(F.col("_u"), seed, 2))
    per_arm = arms.groupBy("_arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_xn").alias("_sx"),
        F.sum("_yn").alias("_sy"),
    )
    a = per_arm.filter(F.col("_arm") == 0).select(
        F.col("_n").alias("n_a"), F.col("_sx").alias("_sxa"),
        F.col("_sy").alias("_sya"),
    )
    b = per_arm.filter(F.col("_arm") == 1).select(
        F.col("_n").alias("n_b"), F.col("_sx").alias("_sxb"),
        F.col("_sy").alias("_syb"),
    )
    j = a.crossJoin(F.broadcast(b))
    pre_a = F.col("_sxa").cast("double") / F.col("n_a").cast("double") / 1e9
    pre_b = F.col("_sxb").cast("double") / F.col("n_b").cast("double") / 1e9
    post_a = F.col("_sya").cast("double") / F.col("n_a").cast("double") / 1e9
    post_b = F.col("_syb").cast("double") / F.col("n_b").cast("double") / 1e9
    return j.select(
        (F.col("n_a") + F.col("n_b")).cast("bigint").alias("n_users"),
        "n_a",
        "n_b",
        (F.round(pre_a, 6) + 0.0).alias("pre_a"),
        (F.round(pre_b, 6) + 0.0).alias("pre_b"),
        (F.round(post_a, 6) + 0.0).alias("post_a"),
        (F.round(post_b, 6) + 0.0).alias("post_b"),
        (F.round((post_b - pre_b) - (post_a - pre_a), 6) + 0.0).alias("did"),
    )


def rate_ratio(
    df: DataFrame,
    group_col: str,
    is_event_col: str,
    z: float = 1.959964,
) -> DataFrame:
    """Poisson rate ratio between exactly two cohorts: events per
    exposure row in each group, their ratio, and the standard
    log-scale Wald interval ``exp(ln RR +- z * sqrt(1/e_a + 1/e_b))``
    — the incident-rate readout (error rates, crash rates, defect
    rates) where a difference-in-means test is the wrong shape.

    ``group_col`` must take exactly 2 values (checked); rows are
    exposure units, ``is_event_col`` boolean/0-1 marks events. Groups
    order lexicographically: RR = rate(group_b) / rate(group_a) — the
    later-sorting group is the "treatment". Returns ONE row
    ``(group_a, group_b, n_a, n_b, events_a, events_b, rate_a,
    rate_b, rate_ratio, ci_lo, ci_hi)``; the ratio and CI are NULL
    when either side has zero events (log undefined).

    All counts exact BIGINT from one group aggregate; ratio/CI are
    one-shot double expressions. The z default is the 97.5% normal
    quantile to 6 dp — a fixed literal both engines share.
    """
    per = (
        df.select(
            F.col(group_col).cast("string").alias("_g"),
            F.col(is_event_col).cast("int").alias("_y"),
        )
        .filter(F.col("_g").isNotNull() & F.col("_y").isNotNull())
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.sum("_y").cast("bigint").alias("_e"),
        )
    )
    wide = per.agg(
        F.min("_g").alias("group_a"),
        F.max("_g").alias("group_b"),
        F.count(F.lit(1)).alias("_k"),
        F.min(F.struct("_g", "_n", "_e")).alias("_a"),
        F.max(F.struct("_g", "_n", "_e")).alias("_b"),
    ).filter(F.col("_k") == 2)
    na, ea = F.col("_a._n"), F.col("_a._e")
    nb, eb = F.col("_b._n"), F.col("_b._e")
    ra = ea / na.cast("double")
    rb = eb / nb.cast("double")
    ok = (ea > 0) & (eb > 0)
    lnrr = F.log(rb / ra)
    se = F.sqrt(1.0 / ea.cast("double") + 1.0 / eb.cast("double"))
    return wide.select(
        "group_a",
        "group_b",
        na.alias("n_a"),
        nb.alias("n_b"),
        ea.alias("events_a"),
        eb.alias("events_b"),
        (F.round(ra, 6) + 0.0).alias("rate_a"),
        (F.round(rb, 6) + 0.0).alias("rate_b"),
        (F.round(F.when(ok, rb / ra), 6) + 0.0).alias("rate_ratio"),
        (F.round(F.when(ok, F.exp(lnrr - z * se)), 6) + 0.0).alias("ci_lo"),
        (F.round(F.when(ok, F.exp(lnrr + z * se)), 6) + 0.0).alias("ci_hi"),
    )


def sprt_decision(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    success_col: str,
    p0: float = 0.1,
    p1: float = 0.2,
    alpha: float = 0.05,
    beta: float = 0.2,
) -> DataFrame:
    """Per-key Wald Sequential Probability Ratio Test (Wald 1945) over
    a time-ordered Bernoulli stream: accumulate the log-likelihood
    ratio ``LLR_t = sum_s [ x_s*ln(p1/p0) + (1-x_s)*ln((1-p1)/(1-p0)) ]``
    and stop at the FIRST crossing of the Wald boundaries
    ``A = ln((1-beta)/alpha)`` (accept H1: rate is p1) or
    ``B = ln(beta/(1-alpha))`` (accept H0: rate is p0) — the sequential
    test that reads out an experiment/canary the moment the evidence
    suffices instead of at a fixed horizon, with guaranteed error rates.

    Returns one row per key: ``(key, n_obs, n_success, decision,
    decided_at_n, llr_final)`` — ``decision`` is 'accept_h1' /
    'accept_h0' / 'continue' (no crossing within the observed stream),
    ``decided_at_n`` the 1-based observation index of the first
    crossing (NULL when 'continue'), ``llr_final`` the full-stream LLR.

    Scale shape: one per-key ranking window + one per-key running sum
    (both ``partitionBy(key)``) + one key-keyed reduction; no global
    windows, no driver state. Determinism: the two per-observation LLR
    terms and both boundaries are quantized to integer NANOS in Python
    (the same literals reach Spark and the SQL oracle), so every
    cumulative comparison is exact BIGINT arithmetic; llr_final rounds
    6 dp.
    """
    import math

    from pyspark.sql import Window

    w_succ = int(round(math.log(p1 / p0) * 1e9))
    w_fail = int(round(math.log((1.0 - p1) / (1.0 - p0)) * 1e9))
    a_n = int(round(math.log((1.0 - beta) / alpha) * 1e9))
    b_n = int(round(math.log(beta / (1.0 - alpha)) * 1e9))
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_t"),
        F.col(id_col).alias("_i"),
        F.col(success_col).cast("boolean").alias("_x"),
    ).filter(F.col("_k").isNotNull() & F.col("_x").isNotNull())
    wk = Window.partitionBy("_k").orderBy("_t", "_i")
    wcum = wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = base.select(
        "_k",
        F.col("_x"),
        F.row_number().over(wk).alias("_rn"),
        F.sum(
            F.when(F.col("_x"), F.lit(w_succ)).otherwise(F.lit(w_fail))
        )
        .over(wcum)
        .alias("_llr"),
    )
    crossed = F.when(F.col("_llr") >= a_n, F.lit(1)).when(
        F.col("_llr") <= b_n, F.lit(-1)
    )
    per = cum.groupBy(F.col("_k").alias(key_col)).agg(
        F.max("_rn").cast("bigint").alias("n_obs"),
        F.sum(F.when(F.col("_x"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_success"),
        F.min(F.when(crossed.isNotNull(), F.col("_rn")))
        .cast("bigint")
        .alias("decided_at_n"),
        F.min_by(crossed, F.when(crossed.isNotNull(), F.col("_rn"))).alias(
            "_dir"
        ),
        F.max_by(F.col("_llr"), F.col("_rn")).alias("_llr_last"),
    )
    return per.select(
        key_col,
        "n_obs",
        "n_success",
        F.when(F.col("decided_at_n").isNull(), F.lit("continue"))
        .when(F.col("_dir") == 1, F.lit("accept_h1"))
        .otherwise(F.lit("accept_h0"))
        .alias("decision"),
        "decided_at_n",
        (F.round(F.col("_llr_last") / 1e9, 6) + 0.0).alias("llr_final"),
    )


def srm_check(
    df: DataFrame,
    unit_col: str,
    seed: str = "srm",
    threshold_chi2: float = 10.8276,
) -> DataFrame:
    """Sample-ratio-mismatch check on a 50/50 hash split: chi-square
    goodness-of-fit of the per-ARM distinct-unit counts against the
    designed equal ratio. SRM is the first thing a broken assignment
    pipeline fails (lossy logging, biased triggering, bot filters
    applied per-arm) and invalidates every downstream readout; the
    industry-standard alarm is p < 0.001, i.e. chi2(1 df) > 10.8276
    (Fabijan et al. 2019, "Diagnosing Sample Ratio Mismatch").

    Returns ONE row ``(n_units, n_a, n_b, chi2, srm)``. Arms come from
    the same md5 ``hash_bucket`` primitive every experiment readout
    here uses, so this audits exactly the assignment the readouts
    consume. Determinism: counts are exact bigints; chi2 is one double
    expression over them.

    Shape: one distinct-unit aggregate (map-side combinable) + a 2-row
    pivot — one cheap pass at any log size.
    """
    units = (
        df.select(F.col(unit_col).alias("_u"))
        .filter(F.col("_u").isNotNull())
        .distinct()
        .select(
            F.when(hash_bucket(F.col("_u"), seed, 2) == 0, "A")
            .otherwise("B")
            .alias("_arm")
        )
    )
    t = units.groupBy().agg(
        F.sum((F.col("_arm") == "A").cast("bigint")).alias("n_a"),
        F.sum((F.col("_arm") == "B").cast("bigint")).alias("n_b"),
    )
    n = F.col("n_a") + F.col("n_b")
    e = n.cast("double") / F.lit(2.0)
    chi2 = (
        (F.col("n_a").cast("double") - e) * (F.col("n_a").cast("double") - e) / e
        + (F.col("n_b").cast("double") - e) * (F.col("n_b").cast("double") - e) / e
    )
    return t.select(
        n.cast("bigint").alias("n_units"),
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        (F.round(F.when(n > 0, chi2), 6) + 0.0).alias("chi2"),
        F.when(n > 0, chi2 > F.lit(threshold_chi2)).alias("srm"),
    )


def cmh_test(
    df: DataFrame,
    stratum_col: str,
    group_col: str,
    flag_col: str,
) -> DataFrame:
    """Cochran-Mantel-Haenszel test across K strata of 2x2
    [group x flag] tables: is there an association between arm and
    outcome CONTROLLING for the stratifier? The Simpson's-paradox-proof
    A/B readout — a confounder that shifts both assignment exposure
    and outcome rate flips naive pooled rates, while CMH compares
    within-stratum and pools the evidence (Mantel & Haenszel 1959).

    ``group_col`` must take exactly two values (min value = row 1,
    matching :func:`ups_crossref_etl_spark.operators.stats.fisher_exact`);
    ``flag_col`` is boolean. Strata with fewer than 2 rows are excluded
    (zero hypergeometric variance). No continuity correction — the
    plain CMH = (Σa − ΣE)²/ΣV form, documented so the oracle mirrors it.

    Returns ONE row ``(n_strata, n, sum_a, sum_e, cmh_stat, or_mh)``:
    the statistic (χ²₁ under H0) and the Mantel-Haenszel pooled odds
    ratio Σ(a·d/n)/Σ(b·c/n) (NULL when the denominator is 0).

    Determinism: per-stratum counts are exact bigints; E, V, and the
    odds-ratio terms quantize to integer micros/nanos before the
    cross-stratum sums, so both engines add exact integers; the final
    statistic is a one-shot double. Shape: one stratum-keyed aggregate
    (map-side combinable) over the facts, then stratum-count-sized
    math — linear at any log size, no window, no driver state.
    """
    base = df.select(
        F.col(stratum_col).cast("string").alias("_s"),
        F.col(group_col).cast("string").alias("_g"),
        F.col(flag_col).cast("boolean").alias("_f"),
    ).filter(
        F.col("_s").isNotNull() & F.col("_g").isNotNull() & F.col("_f").isNotNull()
    )
    lo = base.agg(F.min("_g").alias("_glo"))
    per = (
        base.join(F.broadcast(lo))
        .groupBy("_s")
        .agg(
            F.sum(((F.col("_g") == F.col("_glo")) & F.col("_f")).cast("bigint")).alias("_a"),
            F.sum(((F.col("_g") == F.col("_glo")) & ~F.col("_f")).cast("bigint")).alias("_b"),
            F.sum(((F.col("_g") != F.col("_glo")) & F.col("_f")).cast("bigint")).alias("_c"),
            F.sum(((F.col("_g") != F.col("_glo")) & ~F.col("_f")).cast("bigint")).alias("_d"),
        )
    )
    r1 = F.col("_a") + F.col("_b")
    r2 = F.col("_c") + F.col("_d")
    c1 = F.col("_a") + F.col("_c")
    c2 = F.col("_b") + F.col("_d")
    ns = r1 + r2
    nd = ns.cast("double")
    e = r1.cast("double") * c1.cast("double") / nd
    v = (
        r1.cast("double") * r2.cast("double") * c1.cast("double") * c2.cast("double")
        / (nd * nd * (nd - F.lit(1.0)))
    )
    terms = per.filter(ns >= 2).select(
        F.col("_a"),
        F.round(e * 1e6).cast("bigint").alias("_eq"),
        F.round(v * 1e6).cast("bigint").alias("_vq"),
        F.round(F.col("_a").cast("double") * F.col("_d").cast("double") / nd * 1e9)
        .cast("bigint")
        .alias("_adq"),
        F.round(F.col("_b").cast("double") * F.col("_c").cast("double") / nd * 1e9)
        .cast("bigint")
        .alias("_bcq"),
        ns.alias("_ns"),
    )
    tot = terms.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("_ns").cast("bigint").alias("n"),
        F.sum("_a").cast("bigint").alias("sum_a"),
        F.sum("_eq").alias("_se"),
        F.sum("_vq").alias("_sv"),
        F.sum("_adq").alias("_sad"),
        F.sum("_bcq").alias("_sbc"),
    )
    se = F.col("_se").cast("double") / 1e6
    sv = F.col("_sv").cast("double") / 1e6
    diff = F.col("sum_a").cast("double") - se
    stat = F.when(sv > 0.0, diff * diff / sv)
    ormh = F.when(
        F.col("_sbc") > 0,
        F.col("_sad").cast("double") / F.col("_sbc").cast("double"),
    )
    return tot.select(
        "n_strata",
        "n",
        "sum_a",
        (F.round(se, 6) + 0.0).alias("sum_e"),
        (F.round(stat, 6) + 0.0).alias("cmh_stat"),
        (F.round(ormh, 6) + 0.0).alias("or_mh"),
    )
