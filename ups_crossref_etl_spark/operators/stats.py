"""Distributed statistics: single-pass correlation matrices and robust
(median/MAD) outlier detection.

Profiling a 100 TB table means the statistics themselves must
distribute: a correlation matrix computed by ``df.stat.corr`` per pair
re-scans the table O(k²) times; the single-pass formulation here scans
ONCE for all pairs. Robust outlier flagging (median + MAD instead of
mean + stddev) is the standard guard against the heavy-tailed value
distributions that make z-scores useless — one extreme value drags the
mean and inflates the stddev, masking every other outlier; the median
and MAD have breakdown point 0.5.

Reference parity note: the reference pipeline (/root/reference,
rabarrazueta/ups-crossref-etl) computes only counts for its dashboard;
this is profiling extension surface, same family as
operators/profile.py and operators/evaluation.py.

Determinism contract: moment sums accumulate in DECIMAL (exact, order-
independent); the correlation itself is then one double expression over
exact sums, rounded 4 dp — both engines evaluate the identical
expression tree on identical rationals.

Scale shape:
- ``corr_matrix``: ONE aggregate over the table computing every
  Σx, Σx², Σxy (map-side combinable; shuffle = one row of k + k(k+1)/2
  decimals); the pairwise melt is row-local on that single row.
- ``mad_outliers``: two grouped exact-percentile aggregates (median,
  then median of |x−median|) plus a broadcast-back flag pass — three
  key-clustered shuffles of (key, value) pairs, no window. At 100 TB
  swap the exact percentile for ``approx_percentile`` (sketch,
  mergeable) — same contract as calibration bins' documented swap-in.
"""

from __future__ import annotations

import math
from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "corr_matrix",
    "mad_outliers",
    "loo_target_encode",
    "ks_drift",
    "chisq_drift",
    "spearman_corr",
    "abc_classification",
    "rfm_segments",
]

_DEC = "decimal(38,12)"


def corr_matrix(df: DataFrame, cols: list[str], round_digits: int = 4) -> DataFrame:
    """Pearson correlation for every unordered column pair in ONE scan.

    Returns ``(col_a, col_b, corr)`` for the k(k-1)/2 pairs (a < b in
    the given column order). Null rows are excluded up front so every
    moment sees the same row set (listwise deletion — the semantics of
    a correlation MATRIX, vs pairwise deletion which can produce a
    non-PSD matrix).
    """
    from ..sources.lake import spread_scan

    # r13: the per-row work here is k + k(k+1)/2 DECIMAL(38,12) casts,
    # multiplies and sum updates — BigDecimal arithmetic, the most
    # CPU-expensive map work in the battery — and a single-row-group
    # input runs all of it on one core (guide §2.5 input skew). The
    # spread is a no-op on multi-split inputs; the decimal sums are
    # exact and commutative, so the result is partition-invariant.
    d = spread_scan(df.na.drop(subset=cols).select(*cols))
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(_DEC)).alias(f"_s_{c}"))
    for a, b in combinations(cols, 2):
        aggs.append(
            F.sum((F.col(a).cast(_DEC) * F.col(b).cast(_DEC)).cast(_DEC)).alias(
                f"_p_{a}_{b}"
            )
        )
    for c in cols:
        aggs.append(
            F.sum((F.col(c).cast(_DEC) * F.col(c).cast(_DEC)).cast(_DEC)).alias(
                f"_p_{c}_{c}"
            )
        )
    m = d.agg(*aggs)

    def _r(a: str, b: str):
        n = F.col("_n").cast("double")
        sa, sb = F.col(f"_s_{a}").cast("double"), F.col(f"_s_{b}").cast("double")
        sab = F.col(f"_p_{a}_{b}").cast("double")
        saa, sbb = (
            F.col(f"_p_{a}_{a}").cast("double"),
            F.col(f"_p_{b}_{b}").cast("double"),
        )
        num = n * sab - sa * sb
        den = F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb)
        return F.round(num / F.nullif(den, F.lit(0.0)), round_digits)

    pairs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                _r(a, b).alias("corr"),
            )
            for a, b in combinations(cols, 2)
        ]
    )
    return (
        m.select(F.explode(pairs).alias("p"))
        .select("p.col_a", "p.col_b", "p.corr")
    )


def mad_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: float = 3.0,
    round_digits: int = 4,
) -> DataFrame:
    """Robust per-group outlier summary: flag rows where
    ``|x - median| > k * 1.4826 * MAD`` (1.4826 scales the MAD to the
    stddev of a normal, so ``k`` reads like a z-threshold).

    Returns per group: ``(key, n, med, mad, n_outliers)`` with
    ``med``/``mad`` rounded. Degenerate groups (MAD = 0: over half the
    values identical) flag any value different from the median — the
    standard convention, and the right one for data cleaning (a column
    that is 99% one constant should flag the exceptions).

    NULL ``value_col`` rows are dropped up front, so ``n`` counts the
    NON-NULL values the median/MAD are computed over — a NULL can be
    neither an outlier nor an inlier, and counting it in ``n`` would
    leave the summary internally inconsistent. Groups whose values are
    all NULL disappear from the output.
    """
    df = df.filter(F.col(value_col).isNotNull())
    med = df.groupBy(key_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med"),
        F.count(F.lit(1)).alias("n"),
    )
    j = df.join(med, key_col)
    dev = j.withColumn("_adev", F.abs(F.col(value_col) - F.col("_med")))
    mad = dev.groupBy(key_col, "_med", "n").agg(
        F.percentile("_adev", F.lit(0.5)).alias("_mad")
    )
    flagged = (
        dev.join(mad.select(key_col, "_mad"), key_col)
        .withColumn(
            "_out",
            F.when(
                F.col("_mad") > 0,
                F.col("_adev") > F.lit(k) * F.lit(1.4826) * F.col("_mad"),
            ).otherwise(F.col("_adev") > 0),
        )
        .groupBy(key_col)
        .agg(F.sum(F.col("_out").cast("long")).alias("n_outliers"))
    )
    return (
        mad.join(flagged, key_col)
        .select(
            key_col,
            F.col("n").cast("long").alias("n"),
            F.round("_med", round_digits).alias("med"),
            F.round("_mad", round_digits).alias("mad"),
            F.col("n_outliers").cast("long").alias("n_outliers"),
        )
    )


def loo_target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    prior_weight: float = 0.0,
    round_digits: int = 4,
) -> DataFrame:
    """Leave-one-out target encoding: replace a categorical with the mean
    of the target over the OTHER rows of its category —
    ``(Σ_cat - x_i) / (n_cat - 1)`` — the standard high-cardinality
    categorical encoding that a plain category-mean would leak (each
    row's own target inside its feature is train-time leakage that
    validates perfectly and generalizes terribly).

    With ``prior_weight`` w > 0 the encoding shrinks toward the global
    mean: ``(Σ_cat - x_i + w·μ) / (n_cat - 1 + w)`` — the smoothing that
    keeps 1-row categories from encoding to NULL/noise.

    Scale shape: ONE grouped aggregate over the category key (map-side
    combinable, category-sized output) broadcast-joined back, plus a
    1-row global aggregate; the leave-one-out arithmetic is row-local
    codegen. No window, no self-join. Sums accumulate in DECIMAL —
    exact and order-independent — and the single final division is the
    only double op, rounded.

    Returns ``df`` plus ``loo_enc`` (NULL for singleton categories when
    ``prior_weight=0`` — flag or smooth them, never silently zero).
    """
    sums = df.groupBy(cat_col).agg(
        F.sum(F.col(target_col).cast(_DEC)).alias("_cs"),
        F.count(F.lit(1)).alias("_cn"),
    )
    glob = df.agg(
        F.sum(F.col(target_col).cast(_DEC)).alias("_gs"),
        F.count(F.lit(1)).alias("_gn"),
    )
    out = df.join(F.broadcast(sums), cat_col).crossJoin(F.broadcast(glob))
    w = float(prior_weight)
    num = (
        F.col("_cs").cast("double")
        - F.col(target_col).cast("double")
        + F.lit(w) * (F.col("_gs").cast("double") / F.col("_gn").cast("double"))
    )
    den = (F.col("_cn") - F.lit(1)).cast("double") + F.lit(w)
    return out.withColumn(
        "loo_enc", F.round(num / F.nullif(den, F.lit(0.0)), round_digits)
    ).drop("_cs", "_cn", "_gs", "_gn")


def ks_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    is_right,
    round_digits: int = 4,
) -> DataFrame:
    """Per-group two-sample Kolmogorov–Smirnov statistic between the
    ``is_right`` slice (sample B) and its complement (sample A):
    ``D = max_x |F_A(x) − F_B(x)|`` — the classic distribution-drift
    monitor (per-feature train-vs-serve drift, this-week-vs-last-week
    telemetry). Complements ``psi`` (operators/timeseries) which needs a
    binning choice; KS is binning-free.

    Returns ``(group, n_a, n_b, ks_stat)``; groups missing either sample
    are dropped (D is undefined). ``ks_stat`` rounded, −0.0 folded.

    Scale shape: one groupBy collapses the table to DISTINCT
    (group, value) cells with per-sample counts, then ONE window per
    group ordered by value forms both ECDFs cumulatively — the window
    partition is a group's distinct values, never the raw rows; the max
    is a final grouped aggregate. No all-pairs, no driver state.
    ECDF ratios are exact-integer cumsums divided once per cell; the max
    over cells is order-independent, so the rounded statistic is
    engine-portable.
    """
    from pyspark.sql import Window as W

    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
        is_right.cast("int").alias("_b"),
    ).filter(F.col("_v").isNotNull() & F.col("_b").isNotNull())
    cells = base.groupBy("_g", "_v").agg(
        F.sum(1 - F.col("_b")).alias("_ca"),
        F.sum("_b").alias("_cb"),
    )
    w = W.partitionBy("_g").orderBy("_v")
    wg = W.partitionBy("_g")
    stepped = cells.select(
        "_g",
        F.sum("_ca").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("_cum_a"),
        F.sum("_cb").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("_cum_b"),
        F.sum("_ca").over(wg).alias("_na"),
        F.sum("_cb").over(wg).alias("_nb"),
    )
    return (
        stepped.filter((F.col("_na") > 0) & (F.col("_nb") > 0))
        .groupBy("_g")
        .agg(
            F.max("_na").cast("long").alias("n_a"),
            F.max("_nb").cast("long").alias("n_b"),
            (
                F.round(
                    F.max(
                        F.abs(
                            F.col("_cum_a") / F.col("_na")
                            - F.col("_cum_b") / F.col("_nb")
                        )
                    ),
                    round_digits,
                )
                + F.lit(0.0)
            ).alias("ks_stat"),
        )
        .select(F.col("_g").alias(group_col), "n_a", "n_b", "ks_stat")
    )


def chisq_drift(
    df: DataFrame,
    cat_col: str,
    is_right,
    round_digits: int = 4,
) -> DataFrame:
    """Chi-square homogeneity statistic between the categorical
    distribution of the ``is_right`` slice and its complement — the
    categorical twin of ``ks_drift`` (event-mix drift, label-shift
    audits). One row out: ``(n_a, n_b, n_cats, dof, chi2)``.

    Per-cell terms use the margin form ``(o·T − r·c)² / (T·r·c)``
    (T = grand total, r = row total, c = column total) evaluated in
    IEEE doubles — every factor is an exact small-integer-valued double
    and the op sequence is identical on both engines, so each term is
    bit-reproducible (the all-integer form would be exact but its square
    overflows even DECIMAL(38) once T ~ 1e12); terms are then CAST to
    DECIMAL(38,12) before summing — order-independent accumulation, the
    repo's standard portable-sum rule. Cells with an all-zero category
    margin cannot occur (a category exists only if observed).

    Scale shape: one groupBy to K category cells, margins from one
    aggregate over those K rows, the statistic from a second — the
    shuffle after the first aggregate carries K rows, never the corpus.
    """
    base = df.select(
        F.col(cat_col).alias("_c"),
        is_right.cast("int").alias("_b"),
    ).filter(F.col("_c").isNotNull() & F.col("_b").isNotNull())
    cells = base.groupBy("_c").agg(
        F.sum(1 - F.col("_b")).cast("long").alias("_oa"),
        F.sum("_b").cast("long").alias("_ob"),
    )
    tot = cells.select(
        F.sum("_oa").cast("long").alias("_na"),
        F.sum("_ob").cast("long").alias("_nb"),
        F.count(F.lit(1)).cast("long").alias("_k"),
    )
    j = cells.crossJoin(F.broadcast(tot))
    oa = F.col("_oa").cast("double")
    ob = F.col("_ob").cast("double")
    na = F.col("_na").cast("double")
    nb = F.col("_nb").cast("double")
    t_all = na + nb
    r_tot = oa + ob
    da = oa * t_all - r_tot * na
    db = ob * t_all - r_tot * nb
    term = da * da / (t_all * r_tot * na) + db * db / (t_all * r_tot * nb)
    return (
        j.select(
            "_na", "_nb", "_k",
            term.cast(_DEC).alias("_term"),
        )
        .groupBy("_na", "_nb", "_k")
        .agg(F.sum("_term").alias("_chi2"))
        .select(
            F.col("_na").alias("n_a"),
            F.col("_nb").alias("n_b"),
            F.col("_k").alias("n_cats"),
            (F.col("_k") - 1).cast("long").alias("dof"),
            (F.round(F.col("_chi2").cast("double"), round_digits) + F.lit(0.0)).alias(
                "chi2"
            ),
        )
    )


def spearman_corr(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Per-group Spearman rank correlation between two columns:
    ``(group, n, rho)`` — Pearson on FRACTIONAL (average) ranks, the
    tie-correct definition. Complements :func:`corr_matrix` (Pearson,
    linear) with the monotone-association measure quality pipelines
    use for "does score X order the same way as score Y".

    Exactness: average ranks are half-integers, so DOUBLED ranks
    (``2·avg_rank = 2·rank() + tie_count − 1``) are exact BIGINTs; the
    five sufficient statistics are exact integer sums (the doubling
    cancels in the correlation), and rho is one double expression over
    them — bit-reproducible across engines and partition orders, same
    policy as timeseries.groupwise_trend.

    Scale: two rank windows + one aggregate per group — three
    window/aggregate passes over the SAME group partitioning (one
    Exchange). NULL rows in either column are dropped (rank semantics
    require it). Groups need >= 2 rows and nonzero variance in both
    rank vectors (all-tied columns have undefined rho and are dropped).
    """
    from pyspark.sql import Window

    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
    )

    def dbl_rank(col):
        wr = Window.partitionBy("_g").orderBy(col)
        wt = Window.partitionBy("_g", col)
        return (
            F.lit(2) * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1
        ).cast("bigint")

    ranked = base.select(
        "_g", dbl_rank(F.col("_x")).alias("_rx"), dbl_rank(F.col("_y")).alias("_ry")
    )
    agg = ranked.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_rx").alias("_sx"),
        F.sum("_ry").alias("_sy"),
        F.sum(F.col("_rx") * F.col("_ry")).alias("_sxy"),
        F.sum(F.col("_rx") * F.col("_rx")).alias("_sxx"),
        F.sum(F.col("_ry") * F.col("_ry")).alias("_syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    rho = (n * sxy - sx * sy) / F.sqrt(dx * dy)
    return (
        agg.filter((F.col("n") >= 2) & (dx > 0) & (dy > 0))
        .select(
            F.col("_g").alias(group_col),
            F.col("n").cast("bigint").alias("n"),
            (F.round(rho, round_digits) + F.lit(0.0)).alias("rho"),
        )
    )


def abc_classification(
    df: DataFrame,
    key_col: str,
    value_expr,
    a_share: float = 0.8,
    b_share: float = 0.95,
) -> DataFrame:
    """ABC / Pareto contribution analysis: rank keys by total value,
    classify into A (keys covering the first ``a_share`` of cumulative
    value), B (up to ``b_share``), C (the tail) —
    ``(key, value, cum_share, abc_class)``. The inventory/revenue
    80-15-5 classification; in pipeline terms: which sources/domains
    carry the corpus, which are the long tail.

    Determinism: per-key values accumulate as DECIMAL(18,6) and round
    to 2 dp (the money recipe, plans/money.py); the cumulative share
    is a window sum of exact decimals divided once in double, rounded
    6 dp; ordering is (value DESC, key ASC) — total. One key-keyed
    aggregate + one window pass over the KEY table (key-cardinality-
    sized, not fact-sized)."""
    from pyspark.sql import Window

    per_key = df.groupBy(F.col(key_col)).agg(
        F.round(F.sum(value_expr.cast("decimal(18,6)")), 2).alias("_v")
    )
    w = Window.orderBy(F.col("_v").desc(), F.col(key_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = per_key.agg(F.sum("_v").alias("_tot"))
    cs = F.round(
        F.sum("_v").over(w).cast("double") / F.col("_tot").cast("double"),
        6,
    )
    return (
        per_key.crossJoin(F.broadcast(total))
        .withColumn("cum_share", cs + F.lit(0.0))
        .select(
            key_col,
            F.col("_v").cast("double").alias("value"),
            "cum_share",
            F.when(F.col("cum_share") <= a_share, "A")
            .when(F.col("cum_share") <= b_share, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )


def rfm_segments(
    orders: DataFrame,
    key_col: str,
    ts_col: str,
    amount_col: str,
    n_tiles: int = 5,
) -> DataFrame:
    """RFM segmentation: per key, Recency (days since last order,
    anchored at the data's max date so the result is a pure function
    of the input), Frequency (order count), Monetary (money-exact
    amount sum) — each scored 1..n_tiles by ntile with 5 = best, and
    the three digits concatenated into the classic segment label
    ('555' = recent+frequent+big): ``(key, recency_days, frequency,
    monetary, r_score, f_score, m_score, rfm_segment)``.

    Determinism: every ntile orders by (metric, key) — a total order,
    so bucket boundaries are engine-identical; recency is an exact
    integer day difference; monetary uses the DECIMAL money recipe.
    One key aggregate + three window passes over the KEY table."""
    from pyspark.sql import Window

    per_key = orders.groupBy(F.col(key_col)).agg(
        F.max(F.col(ts_col)).alias("_last"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.round(F.sum(F.col(amount_col).cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("monetary"),
    )
    anchor = per_key.agg(F.max("_last").alias("_anchor"))
    base = per_key.crossJoin(F.broadcast(anchor)).withColumn(
        "recency_days",
        F.datediff(F.col("_anchor"), F.col("_last")).cast("bigint"),
    )
    r = F.ntile(n_tiles).over(
        Window.orderBy(F.col("recency_days").asc(), F.col(key_col))
    )
    f = F.ntile(n_tiles).over(
        Window.orderBy(F.col("frequency").desc(), F.col(key_col))
    )
    m = F.ntile(n_tiles).over(
        Window.orderBy(F.col("monetary").desc(), F.col(key_col))
    )
    scored = base.select(
        key_col,
        "recency_days",
        "frequency",
        "monetary",
        (F.lit(n_tiles + 1) - r).cast("bigint").alias("r_score"),
        (F.lit(n_tiles + 1) - f).cast("bigint").alias("f_score"),
        (F.lit(n_tiles + 1) - m).cast("bigint").alias("m_score"),
    )
    return scored.withColumn(
        "rfm_segment",
        F.concat_ws(
            "", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ),
    )


def kendall_tau(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    max_points_per_key: int | None = None,
) -> DataFrame:
    """Per-key Kendall tau-b between ``x_col`` and ``y_col``:
    ``(key, n_points, concordant, discordant, tau_b)``.

    The rank correlation that, unlike Spearman (``spearman_corr``),
    handles ties exactly: tau_b = (C − D) / sqrt((n0 − n1)(n0 − n2))
    with n0 = all pairs, n1/n2 = x-tied / y-tied pairs. Pairs are
    enumerated ONCE via a row_number over (x, y) and a rn_b > rn_a
    self-join on the key — the same key-clustered quadratic shape as
    ``timeseries.theil_sen_trend``, and with the same measured escape
    hatch: ``max_points_per_key`` applies the identical deterministic
    stride rule (keep every ceil(n/cap)-th row of the sorted history),
    bounding any hot key at ~cap²/2 pairs. C, D, n1, n2 are exact
    integer counts, so tau_b is one double expression over integers,
    rounded 6 dp — hash-exact across engines.
    """
    from pyspark.sql import Window

    from ..functions.dates import epoch_seconds

    x_raw = F.col(x_col)
    if dict(df.dtypes).get(x_col, "").startswith("timestamp"):
        x_raw = epoch_seconds(x_raw)  # NTZ-safe; bare cast("long") is an analysis error
    pts = df.select(
        F.col(key_col).alias("_k"),
        x_raw.cast("bigint").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    w = Window.partitionBy("_k").orderBy("_x", "_y")
    pts = pts.select(
        "_k", "_x", "_y",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("_k")).alias("_nk"),
    )
    if max_points_per_key is not None:
        stride = F.ceil(F.col("_nk") / F.lit(int(max_points_per_key))).cast(
            "bigint"
        )
        pts = pts.filter((F.col("_rn") - 1) % stride == 0)
        pts = pts.select(
            "_k", "_x", "_y",
            F.row_number().over(w).alias("_rn"),
        )
    a, b = pts.alias("a"), pts.alias("b")
    pairs = a.join(
        b,
        (F.col("a._k") == F.col("b._k")) & (F.col("b._rn") > F.col("a._rn")),
    ).select(
        F.col("a._k").alias("_k"),
        (F.col("b._x") > F.col("a._x")).alias("_xgt"),
        (F.col("b._x") == F.col("a._x")).alias("_xeq"),
        F.signum(F.col("b._y") - F.col("a._y")).alias("_sy"),
    )
    agg = pairs.groupBy("_k").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n0"),
        F.sum(F.when(F.col("_xgt") & (F.col("_sy") > 0), 1).otherwise(0))
        .cast("bigint")
        .alias("concordant"),
        F.sum(F.when(F.col("_xgt") & (F.col("_sy") < 0), 1).otherwise(0))
        .cast("bigint")
        .alias("discordant"),
        F.sum(F.when(F.col("_xeq"), 1).otherwise(0)).cast("bigint").alias("_n1"),
        F.sum(F.when(F.col("_sy") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("_n2"),
    )
    n_pts = pts.groupBy("_k").agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
    denom = F.sqrt(
        (F.col("_n0") - F.col("_n1")).cast("double")
        * (F.col("_n0") - F.col("_n2")).cast("double")
    )
    return (
        agg.join(n_pts, "_k")
        .select(
            F.col("_k").alias(key_col),
            "n_points",
            "concordant",
            "discordant",
            (
                F.round(
                    (F.col("concordant") - F.col("discordant")).cast("double")
                    / denom,
                    6,
                )
                + 0.0
            ).alias("tau_b"),
        )
    )


def gini_coefficient(
    df: DataFrame, group_col: str, value_col: str, tiebreak_col: str
) -> DataFrame:
    """Per-group Gini concentration of a non-negative BIGINT measure:
    ``(group, n, total, gini)``.

    The corpus-curation diagnostic for "how skewed is this corpus
    toward a few heavy sources/customers/domains" — the numeric twin of
    ``zipf_power_law_stats``. Uses the sorted-rank closed form
    G = 2·Σ(i·xᵢ) / (n·Σx) − (n+1)/n over values sorted ASCENDING with
    a total-order tiebreak, so the rank weights are unambiguous; all
    accumulators are exact BIGINT products, the final expression is one
    double over integers, rounded 6 dp. ONE per-group window sort plus
    one aggregate — same shuffle budget as any ntile scoring pass.
    Callers pass the measure pre-scaled to integer units (cents,
    bytes); groups with total = 0 return gini = 0.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(tiebreak_col).asc()
    )
    ranked = df.select(
        F.col(group_col),
        F.col(value_col).cast("bigint").alias("_v"),
        F.row_number().over(w).cast("bigint").alias("_i"),
    )
    return ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_v").alias("total"),
        (
            F.round(
                F.when(
                    F.sum("_v") > 0,
                    (2.0 * F.sum(F.col("_i") * F.col("_v")))
                    / (
                        F.count(F.lit(1)).cast("double")
                        * F.sum("_v").cast("double")
                    )
                    - (F.count(F.lit(1)) + 1).cast("double")
                    / F.count(F.lit(1)).cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            )
            + 0.0
        ).alias("gini"),
    )


def jackknife_ratio_se(
    df: DataFrame, group_col: str, num_col: str, den_col: str
) -> DataFrame:
    """Delete-one-GROUP jackknife standard error for a ratio-of-sums
    statistic: one row ``(n_groups, theta_hat, jackknife_se)``.

    The standard uncertainty recipe when rows are dependent within
    natural clusters (a supplier's lineitems, a domain's documents):
    leave each whole group out, recompute θ₍ᵢ₎ = (S_num − sᵢ)/(S_den − tᵢ),
    and se² = (g−1)/g · Σ(θ₍ᵢ₎ − θ̄)². Shape is two cheap aggregates —
    per-group DECIMAL sums (one shuffle, map-side combinable) and a
    single-row total broadcast back — so it distributes to any number
    of rows; the θ₍ᵢ₎ column is g rows. Determinism: group sums are
    exact DECIMAL; each θ₍ᵢ₎ is rounded to 9 dp and lifted to BIGINT
    nanos, so the variance accumulates in exact integers and the final
    se is one double expression, rounded 6 dp.
    """
    per = df.groupBy(group_col).agg(
        F.sum(F.col(num_col).cast("decimal(28,6)")).alias("_sn"),
        F.sum(F.col(den_col).cast("decimal(28,6)")).alias("_sd"),
    )
    tot = per.agg(
        F.sum("_sn").alias("_tn"),
        F.sum("_sd").alias("_td"),
        F.count(F.lit(1)).cast("bigint").alias("_g"),
    )
    loo = per.crossJoin(F.broadcast(tot)).select(
        "_g",
        "_tn",
        "_td",
        F.round(
            (F.col("_tn") - F.col("_sn")).cast("double")
            / (F.col("_td") - F.col("_sd")).cast("double")
            * 1e9
        )
        .cast("bigint")
        .alias("_th_nano"),
    )
    th38 = F.col("_th_nano").cast("decimal(38,0)")
    return loo.groupBy("_g", "_tn", "_td").agg(
        F.sum("_th_nano").alias("_s1"),
        F.sum(th38 * th38).alias("_s2"),  # nano² overflows BIGINT; 38-digit decimal holds it
    ).select(
        F.col("_g").alias("n_groups"),
        (
            F.round(F.col("_tn").cast("double") / F.col("_td").cast("double"), 6)
            + 0.0
        ).alias("theta_hat"),
        (
            F.round(
                F.sqrt(
                    ((F.col("_g") - 1).cast("double") / F.col("_g").cast("double"))
                    * (
                        F.col("_s2").cast("double")
                        - F.col("_s1").cast("double")
                        * F.col("_s1").cast("double")
                        / F.col("_g").cast("double")
                    )
                )
                / 1e9,
                6,
            )
            + 0.0
        ).alias("jackknife_se"),
    )


def qq_table(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    n_quantiles: int = 10,
) -> DataFrame:
    """Quantile-quantile comparison of a value between two groups:
    one row per interior quantile ``(q, value_a, value_b, diff)`` with
    the LOWER empirical quantile (value at rank ceil(q*n/Q) — an actual
    data value, no interpolation).

    The distribution-shape companion to the KS gate (``ks_drift`` gives
    one max-gap number; the QQ table shows WHERE the distributions
    diverge — tails vs body). Rank selection is exact integer
    arithmetic over one per-group sort window, so the gate needs no
    float caveat at all; ``diff`` is one rounded subtraction. Two
    window passes clustered on the group key.
    """
    from pyspark.sql import Window

    base = df.filter(
        F.col(group_col).isin([group_a, group_b])
        & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"), F.col(value_col).cast("double").alias("_v")
    )
    w = Window.partitionBy("_g").orderBy("_v")
    ranked = base.select(
        "_g", "_v",
        F.row_number().over(w).cast("bigint").alias("_r"),
        F.count(F.lit(1)).over(Window.partitionBy("_g")).cast("bigint").alias("_n"),
    )
    spark = df.sparkSession
    qs = spark.range(1, n_quantiles).select(F.col("id").alias("q"))
    picked = ranked.join(
        F.broadcast(qs),
        F.col("_r")
        == F.floor(
            (F.col("q") * F.col("_n") + F.lit(n_quantiles - 1))
            / F.lit(n_quantiles)
        ),
    )
    a = picked.filter(F.col("_g") == group_a).select(
        "q", F.col("_v").alias("value_a")
    )
    b = picked.filter(F.col("_g") == group_b).select(
        "q", F.col("_v").alias("value_b")
    )
    return a.join(b, "q").select(
        F.col("q").cast("bigint").alias("q"),
        "value_a",
        "value_b",
        (F.round(F.col("value_b") - F.col("value_a"), 6) + 0.0).alias("diff"),
    )


def mann_whitney(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Mann-Whitney U rank-sum test between two groups, one row:
    ``(n_a, n_b, u_a, z, cliffs_delta)`` — the tie-corrected normal
    approximation z and the Cliff's delta effect size 2U/(na*nb) - 1.

    The nonparametric two-sample location test (the distribution-free
    sibling of the t-test, and the analytic complement to
    ``experiment.permutation_test``'s Monte-Carlo p): U_a counts, over
    all cross pairs, how often an A value beats a B value (ties half).
    Midranks come from the ``binary_auc`` scale trick — aggregate per
    DISTINCT value first (the only corpus-sized shuffle), then a
    RANGE-PARTITIONED exclusive prefix sum over the distinct-value
    table (``_ranged_exclusive_cumsum``, round 11 — a continuous metric
    makes the distinct table ~data-sized, which degenerated the old
    unpartitioned window to one partition exactly when scale mattered);
    per-value midranks are exact halves, so their sums are exact in
    doubles (no rounding below 2^52) and order-independent. The tie
    correction term sum(t^3 - t) is an exact integer aggregate.
    """
    base = df.filter(
        F.col(group_col).isin([group_a, group_b])
        & F.col(value_col).isNotNull()
    ).select(
        (F.col(group_col) == F.lit(group_a)).alias("_isa"),
        F.col(value_col).cast("double").alias("_v"),
    )
    per_v = base.groupBy("_v").agg(
        F.count(F.lit(1)).cast("bigint").alias("_t"),
        F.sum(F.when(F.col("_isa"), 1).otherwise(0)).cast("bigint").alias("_ta"),
    )
    # midrank = exclusive prefix of _t + (_t+1)/2, via the RANGE-
    # partitioned cumsum primitive — on continuous metrics the distinct-
    # value table is ~data-sized, so the old unpartitioned
    # Window.orderBy was a single-partition bottleneck exactly when it
    # mattered (r10 verdict; percent_rank_unique made the same move in
    # r10). _ta rides the same range pass as a second weight column so
    # nothing needs a join back.
    ranked = _ranged_exclusive_cumsum(
        per_v, "_v", ["_t", "_ta"], ["_off", "_offa"]
    ).select(
        "_t", "_ta",
        (
            F.col("_off").cast("double")
            + (F.col("_t") + 1).cast("double") / 2.0
        ).alias("_midrank"),
    )
    agg = ranked.agg(
        F.sum("_ta").cast("bigint").alias("n_a"),
        (F.sum("_t") - F.sum("_ta")).cast("bigint").alias("n_b"),
        F.sum(F.col("_ta") * F.col("_midrank")).alias("_ra"),
        F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t")).alias(
            "_ties"
        ),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = na + nb
    u_a = F.col("_ra") - na * (na + 1.0) / 2.0
    sigma = F.sqrt(
        (na * nb / 12.0)
        * ((n + 1.0) - F.col("_ties").cast("double") / (n * (n - 1.0)))
    )
    return agg.select(
        "n_a",
        "n_b",
        (F.round(u_a, 2) + 0.0).alias("u_a"),
        (F.round((u_a - na * nb / 2.0) / sigma, 6) + 0.0).alias("z"),
        (F.round(2.0 * u_a / (na * nb) - 1.0, 6) + 0.0).alias(
            "cliffs_delta"
        ),
    )


def ols_xy(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-group OLS of y on x for ARBITRARY numeric columns:
    ``(group, n_points, slope, intercept, r2)`` — the generic sibling of
    ``timeseries.groupwise_trend`` (which fixes x = time).

    The regression-as-sums trick: quantize both variables to integer
    micro-units, accumulate the five sufficient statistics in ONE
    map-side-combinable aggregate per group (the only shuffle), and
    derive slope/intercept/r2 as single double expressions over exact
    integers — engine-parity holds because both sides cast the same
    exact sums to double before the same expression tree. Groups with
    fewer than 2 points or zero x-variance drop (slope undefined).
    Powers log-log elasticities, calibration slopes, any per-segment
    fit — over a billion groups it stays exactly one shuffle.
    """
    x = F.round(F.col(x_col).cast("double") * scale).cast("bigint")
    y = F.round(F.col(y_col).cast("double") * scale).cast("bigint")
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )
    agg = base.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
    )
    n = F.col("n_points").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    return (
        agg.filter((F.col("n_points") >= 2) & (dx > 0))
        .select(
            F.col(group_col),
            "n_points",
            (F.round(cov / dx, 6) + 0.0).alias("slope"),
            (
                F.round((sy - cov / dx * sx) / n / F.lit(float(scale)), 6)
                + 0.0
            ).alias("intercept"),
            F.when(dy > 0, F.round((cov * cov) / (dx * dy), 4) + 0.0).alias(
                "r2"
            ),
        )
    )


def trimmed_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    trim_frac: float = 0.1,
) -> DataFrame:
    """Per-group symmetric trimmed mean: ``(group, n, n_used,
    trimmed_mean)`` — drop the lowest and highest floor(n*trim_frac)
    values by exact rank, average the middle.

    The robust location estimate between the mean (breakdown 0) and the
    median (throws away all magnitude information): the right summary
    for heavy-tailed latency/value columns where a handful of outliers
    move the mean but the bulk shape matters. Exact integer rank bounds
    over one per-group sort window; kept values accumulate as BIGINT
    nanos so the average is a single rounded division — no float
    accumulation, no interpolation.
    """
    from pyspark.sql import Window

    k = F.floor(F.col("_n") * F.lit(float(trim_frac))).cast("bigint")
    # row_number among TIED values is arbitrary, but ties share one _vn,
    # so the kept multiset (hence the sum) is partitioning-invariant
    w = Window.partitionBy(group_col).orderBy(F.col("_vn"))
    base = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col),
            F.round(F.col(value_col).cast("double") * 1e9)
            .cast("bigint")
            .alias("_vn"),
        )
        .withColumn(
            "_n",
            F.count(F.lit(1)).over(Window.partitionBy(group_col)),
        )
        .withColumn("_r", F.row_number().over(w))
    )
    kept = base.filter(
        (F.col("_r") > k) & (F.col("_r") <= F.col("_n") - k)
    )
    return kept.groupBy(group_col).agg(
        F.max("_n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_used"),
        (
            F.round(
                F.sum("_vn").cast("double")
                / F.count(F.lit(1)).cast("double")
                / 1e9,
                6,
            )
            + 0.0
        ).alias("trimmed_mean"),
    )


def ks_two_sample_by_key(
    df: DataFrame,
    key_col: str,
    flag_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key two-sample Kolmogorov-Smirnov distance between the rows
    where ``flag_col`` is true and those where it is false:
    ``(key, n_a, n_b, ks_d, p_value)`` with the asymptotic tail bound
    p = min(1, 2*exp(-2*D^2*n_a*n_b/(n_a+n_b))).

    The per-key drift screen run over MANY keys at once (every user /
    domain / shard) — feed the p-values to :func:`bh_fdr` for
    multiplicity control instead of eyeballing 10k raw tests. Tie-safe:
    counts aggregate per DISTINCT (key, value) first, so the empirical
    CDFs step after all tied rows — one grouped aggregate plus one
    key-clustered cumulative window over the distinct-value table; D is
    a max of exact rational differences evaluated in double (identical
    operands on both engines), p one rounded expression.
    """
    from pyspark.sql import Window

    per_v = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(key_col).alias("_k"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .agg(
            F.sum(F.when(F.col(flag_col), 1).otherwise(0))
            .cast("bigint")
            .alias("_c1"),
            F.sum(F.when(F.col(flag_col), 0).otherwise(1))
            .cast("bigint")
            .alias("_c2"),
        )
    )
    w = Window.partitionBy("_k").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wk = Window.partitionBy("_k")
    cum = per_v.select(
        "_k",
        F.sum("_c1").over(w).alias("_f1"),
        F.sum("_c2").over(w).alias("_f2"),
        F.sum("_c1").over(wk).alias("_n1"),
        F.sum("_c2").over(wk).alias("_n2"),
    )
    d = (
        cum.filter((F.col("_n1") > 0) & (F.col("_n2") > 0))
        .groupBy("_k", "_n1", "_n2")
        .agg(
            F.max(
                F.abs(
                    F.col("_f1").cast("double") / F.col("_n1").cast("double")
                    - F.col("_f2").cast("double") / F.col("_n2").cast("double")
                )
            ).alias("_d")
        )
    )
    na = F.col("_n1").cast("double")
    nb = F.col("_n2").cast("double")
    p = F.least(
        F.lit(1.0),
        2.0 * F.exp(-2.0 * F.col("_d") * F.col("_d") * na * nb / (na + nb)),
    )
    return d.select(
        F.col("_k").alias(key_col),
        F.col("_n1").cast("bigint").alias("n_a"),
        F.col("_n2").cast("bigint").alias("n_b"),
        (F.round(F.col("_d"), 6) + 0.0).alias("ks_d"),
        (F.round(p, 6) + 0.0).alias("p_value"),
    )


def bh_fdr(
    df: DataFrame, key_col: str, p_col: str, q: float = 0.05
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over a battery of tests:
    ``(key, p, p_rank, n_tests, threshold, rejected)``.

    THE multiplicity correction for key-level screening — running 10k
    per-key drift tests at alpha=.05 would flag ~500 false keys; BH
    guarantees the expected false-discovery FRACTION stays <= q.
    Step-up rule: sort p ascending, find the largest k with
    p_(k) <= k/m * q, reject ranks 1..k. Implemented as one sort window
    (rank + tiebreak on the key so ties are deterministic) and one
    running suffix max (rejected iff ANY rank >= own rank satisfies the
    inequality — the step-up look-ahead as a window, no loop).
    Thresholds k/m*q are exact rationals evaluated identically on both
    engines.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col(p_col).asc(), F.col(key_col).asc())
    ranked = df.select(
        F.col(key_col),
        F.col(p_col).cast("double").alias("p"),
        F.row_number().over(w).cast("bigint").alias("p_rank"),
        F.count(F.lit(1))
        .over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .cast("bigint")
        .alias("n_tests"),
    )
    thresh = (
        F.col("p_rank").cast("double")
        / F.col("n_tests").cast("double")
        * F.lit(float(q))
    )
    ok = (F.col("p") <= thresh).cast("int")
    wsuf = Window.orderBy(F.col("p_rank").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return ranked.select(
        key_col,
        "p",
        "p_rank",
        "n_tests",
        (F.round(thresh, 6) + 0.0).alias("threshold"),
        (F.max(ok).over(wsuf) == 1).alias("rejected"),
    )


def woe_iv(df: DataFrame, bucket_col: str, label_col: str) -> DataFrame:
    """Weight of Evidence / Information Value per feature bucket — the
    classic credit-scoring feature screen (Siddiqi 2006), here the
    "does this categorical explain the binary outcome?" triage for any
    pipeline feature (source vs is-duplicate, priority vs lateness).

    Per bucket ``b``: ``woe = ln(pos_share_b / neg_share_b)`` with
    Laplace 0.5 smoothing on every cell (so single-class buckets stay
    finite), ``iv_contrib = (pos_share_b - neg_share_b) * woe``; total
    IV is the sum of contributions (<0.02 useless, >0.3 strong, by the
    usual rule of thumb). Rows where bucket or label is NULL are
    excluded.

    Output: one row per bucket ordered by bucket —
    ``(bucket, n, n_pos, n_neg, woe, iv_contrib)``; counts exact
    BIGINT, woe/iv_contrib one-shot double expressions over those
    integers (rounded 6 dp), so the table is engine-exact. Shape: one
    corpus scan to a bucket-keyed aggregate; everything after is
    bucket-count-sized.
    """
    base = df.select(
        F.col(bucket_col).cast("string").alias("bucket"),
        F.col(label_col).cast("int").alias("_y"),
    ).filter(F.col("bucket").isNotNull() & F.col("_y").isNotNull())
    per = base.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_y").cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("_y")).cast("bigint").alias("n_neg"),
    )
    tot = per.agg(
        F.sum("n_pos").cast("bigint").alias("_tp"),
        F.sum("n_neg").cast("bigint").alias("_tn"),
        F.count(F.lit(1)).cast("bigint").alias("_k"),
    )
    j = per.crossJoin(F.broadcast(tot))
    ps = (F.col("n_pos") + 0.5) / (F.col("_tp") + 0.5 * F.col("_k"))
    ns = (F.col("n_neg") + 0.5) / (F.col("_tn") + 0.5 * F.col("_k"))
    woe = F.log(ps / ns)
    return j.select(
        "bucket",
        "n",
        "n_pos",
        "n_neg",
        (F.round(woe, 6) + 0.0).alias("woe"),
        (F.round((ps - ns) * woe, 6) + 0.0).alias("iv_contrib"),
    ).orderBy("bucket")


def anova_oneway(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """One-way ANOVA: does the group mean differ across levels more
    than within-group noise explains? Returns ONE row ``(n_groups, n,
    df_between, df_within, ss_between, ss_within, f_stat)`` — the
    omnibus complement to the pairwise tests here (Mann-Whitney,
    permutation): one screen across ALL levels at once instead of
    k(k-1)/2 pairwise comparisons.

    NULL group/value rows are excluded. ``f_stat`` is NULL when the
    design is degenerate (fewer than 2 groups, no within-group df, or
    zero within-group variance).

    Determinism: per-group ``(n, sum v, sum v^2)`` accumulate in
    DECIMAL(38,12) (exact, order-free — the corr_matrix convention);
    each group's ``S_g^2/n_g`` between-groups term quantizes to
    integer MICROS before the cross-group sum, so both engines add
    exact integers; SS/F are one-shot double expressions at the end.
    Shape: one corpus scan to a group-keyed aggregate, then
    group-count-sized math.
    """
    base = df.select(
        F.col(group_col).cast("string").alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_g").isNotNull() & F.col("_v").isNotNull())
    per = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(F.col("_v").cast(_DEC)).alias("_s"),
        F.sum(
            (F.col("_v").cast(_DEC) * F.col("_v").cast(_DEC)).cast(_DEC)
        ).alias("_q"),
    )
    term_micros = F.round(
        F.col("_s").cast("double")
        * F.col("_s").cast("double")
        / F.col("_n").cast("double")
        * 1e6
    ).cast("bigint")
    tot = per.select("_n", "_s", "_q", term_micros.alias("_tm")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("_n").cast("bigint").alias("n"),
        F.sum("_s").alias("_st"),
        F.sum("_q").alias("_qt"),
        F.sum("_tm").alias("_a"),
    )
    a = F.col("_a") / 1e6
    ssb = a - F.col("_st").cast("double") * F.col("_st").cast("double") / F.col(
        "n"
    ).cast("double")
    ssw = F.col("_qt").cast("double") - a
    dfb = F.col("n_groups") - 1
    dfw = F.col("n") - F.col("n_groups")
    f = F.when(
        (dfb > 0) & (dfw > 0) & (ssw > 0.0),
        (ssb / dfb.cast("double")) / (ssw / dfw.cast("double")),
    )
    return tot.select(
        "n_groups",
        "n",
        dfb.cast("bigint").alias("df_between"),
        dfw.cast("bigint").alias("df_within"),
        (F.round(ssb, 4) + 0.0).alias("ss_between"),
        (F.round(ssw, 4) + 0.0).alias("ss_within"),
        (F.round(f, 6) + 0.0).alias("f_stat"),
    )


def mode_by(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Most frequent value per group with a deterministic tiebreak
    (highest count, then smallest value) — the categorical "typical
    value" aggregate SQL's MODE() leaves tie-undefined. Returns
    ``(group, mode, n)`` ordered by group; NULL values are excluded
    (a missing value is not a candidate mode).

    Shape: one (group, value) count aggregate (map-side combinable),
    then a group-keyed struct-min argmax — two shuffles total, no
    window over raw rows.
    """
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"), F.col(value_col).alias("_v")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    )
    best = counts.groupBy("grp").agg(
        F.min(F.struct((-F.col("_c")).alias("_nc"), F.col("_v"))).alias("_b")
    )
    return best.select(
        "grp",
        F.col("_b._v").alias("mode"),
        (-F.col("_b._nc")).cast("bigint").alias("n"),
    ).orderBy("grp")


def winsorized_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Winsorized mean per group: values below the ``lower`` quantile
    are CLAMPED up to it and values above ``upper`` clamped down
    (:func:`trimmed_mean`'s sibling — trimming drops the tails,
    winsorizing keeps the rows but caps their influence, the right
    call when the tails are real-but-noisy rather than junk).

    Returns ``(group, n, n_clamped_low, n_clamped_high, lo_cut,
    hi_cut, winsorized_mean)`` per group, ordered by group; NULL
    values excluded. Cuts are the exact interpolated quantiles
    (``F.percentile`` — the q_percentiles convention).

    Determinism: values and cuts quantize to integer 1e-4 units; the
    clamped sum is an exact BIGINT aggregate with one final division.
    Shape: one group-keyed percentile aggregate (broadcast back as
    two per-group columns via an equi-join) + one group aggregate.
    """
    base = df.select(
        F.col(group_col).alias("grp"),
        F.round(F.col(value_col).cast("double") * 1e4)
        .cast("bigint")
        .alias("_vq"),
    ).filter(F.col("_vq").isNotNull())
    from ..sources.lake import spread_scan

    # r13: spread a single-row-group scan (integer-quantized values,
    # exact percentiles and BIGINT sums — layout-invariant) and
    # materialize once: ``base`` feeds the cuts aggregate AND the
    # clamp join, so the scan otherwise executes twice
    base = spread_scan(base).localCheckpoint(eager=False)
    cuts = base.groupBy("grp").agg(
        F.round(F.percentile("_vq", F.lit(float(lower))))
        .cast("bigint")
        .alias("_lo"),
        F.round(F.percentile("_vq", F.lit(float(upper))))
        .cast("bigint")
        .alias("_hi"),
    )
    j = base.join(cuts, "grp")
    clamped = F.greatest(F.least(F.col("_vq"), F.col("_hi")), F.col("_lo"))
    return (
        j.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((F.col("_vq") < F.col("_lo")).cast("long"))
            .cast("bigint")
            .alias("n_clamped_low"),
            F.sum((F.col("_vq") > F.col("_hi")).cast("long"))
            .cast("bigint")
            .alias("n_clamped_high"),
            (F.round(F.max("_lo") / 1e4, 4) + 0.0).alias("lo_cut"),
            (F.round(F.max("_hi") / 1e4, 4) + 0.0).alias("hi_cut"),
            (
                F.round(
                    F.sum(clamped) / F.count(F.lit(1)).cast("double") / 1e4,
                    6,
                )
                + 0.0
            ).alias("winsorized_mean"),
        )
        .orderBy("grp")
    )


def kruskal_wallis(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Kruskal-Wallis H rank test across k groups, one row: ``(n, k,
    h, h_corrected)`` — the k-sample generalization of
    :func:`mann_whitney` (distribution-free one-way "ANOVA on ranks"),
    with the tie-corrected statistic ``H / (1 - sum(t^3 - t) /
    (N^3 - N))``.

    Scale shape (the ``binary_auc`` / ``mann_whitney`` trick): the only
    corpus-sized shuffle is the aggregate to DISTINCT values — per
    value a total count and per-(value, group) counts — then ONE
    cumulative window over the distinct-value table assigns exact
    midranks, and a value-keyed join + group-keyed sum produces the
    per-group rank sums. No global per-row ranking window ever runs.

    Determinism: midranks are exact halves (k + (t+1)/2), so their
    count-weighted sums are exact in doubles below 2^52 and
    order-independent; the tie term is an exact BIGINT aggregate; H is
    a one-shot double expression, rounded 6 dp.
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(group_col).cast("string").alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_g").isNotNull() & F.col("_v").isNotNull())
    per_v = base.groupBy("_v").agg(
        F.count(F.lit(1)).cast("bigint").alias("_t")
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    midranks = per_v.select(
        "_v",
        "_t",
        (
            F.coalesce(F.sum("_t").over(w), F.lit(0)).cast("double")
            + (F.col("_t") + 1).cast("double") / 2.0
        ).alias("_midrank"),
    )
    per_vg = base.groupBy("_v", "_g").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    per_g = (
        per_vg.join(midranks.select("_v", "_midrank"), "_v")
        .groupBy("_g")
        .agg(
            F.sum("_c").cast("bigint").alias("_n"),
            F.sum(F.col("_c") * F.col("_midrank")).alias("_r"),
        )
    )
    ties = midranks.agg(
        F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t"))
        .cast("bigint")
        .alias("_ties")
    )
    # each group's R^2/n term rounds to BIGINT before the k-row sum, so
    # no double accumulation order can differ cross-engine
    agg = per_g.agg(
        F.sum("_n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(
            F.round(
                F.col("_r") * F.col("_r") / F.col("_n").cast("double")
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("_rr"),
    ).crossJoin(F.broadcast(ties))
    nn = F.col("n").cast("double")
    h = 12.0 / (nn * (nn + 1.0)) * F.col("_rr") - 3.0 * (nn + 1.0)
    corr = 1.0 - F.col("_ties").cast("double") / (nn * nn * nn - nn)
    ok = (F.col("n") > 1) & (F.col("k") > 1)
    return agg.select(
        "n",
        "k",
        (F.round(F.when(ok, h), 6) + 0.0).alias("h"),
        (
            F.round(F.when(ok & (corr > 0.0), h / corr), 6) + 0.0
        ).alias("h_corrected"),
    )


def cochran_armitage(
    df: DataFrame, score_col: str, flag_col: str
) -> DataFrame:
    """Cochran-Armitage trend test: is a binary outcome's rate
    monotonically associated with an ORDINAL exposure score? One row:
    ``(n, n_pos, k_levels, z_trend)`` with

    ``z = sum(w_i * (r_i - n_i * pbar)) / sqrt(pbar * (1 - pbar) *
    (sum(w_i^2 n_i) - (sum(w_i n_i))^2 / N))``

    over exposure levels i with score w_i, level size n_i, level
    positives r_i, and overall rate pbar — the dose-response
    complement to :func:`woe_iv` (which ignores level ORDER) and the
    2xk refinement of a chi-square independence test (which spends
    k-1 df where the trend test spends 1).

    Plan shape: one level-keyed aggregate (level count is tiny), then
    a single-row reduction — every sum over exact BIGINT counts, the z
    a one-shot double, rounded 6 dp. NULL z when the variance term is
    0 (all one level, or rate 0/1 everywhere).
    """
    base = df.select(
        F.col(score_col).cast("double").alias("_w"),
        F.when(F.col(flag_col).cast("boolean"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("_y"),
    ).filter(F.col("_w").isNotNull())
    per = base.groupBy("_w").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_y").cast("bigint").alias("_r"),
    )
    agg = per.agg(
        F.sum("_n").cast("bigint").alias("n"),
        F.sum("_r").cast("bigint").alias("n_pos"),
        F.count(F.lit(1)).cast("bigint").alias("k_levels"),
        F.sum(F.col("_w") * F.col("_r").cast("double")).alias("_wr"),
        F.sum(F.col("_w") * F.col("_n").cast("double")).alias("_wn"),
        F.sum(F.col("_w") * F.col("_w") * F.col("_n").cast("double")).alias(
            "_wwn"
        ),
    )
    nn = F.col("n").cast("double")
    pbar = F.col("n_pos").cast("double") / nn
    num = F.col("_wr") - pbar * F.col("_wn")
    var = pbar * (1.0 - pbar) * (
        F.col("_wwn") - F.col("_wn") * F.col("_wn") / nn
    )
    return agg.select(
        "n",
        "n_pos",
        "k_levels",
        (
            F.round(F.when(var > 0.0, num / F.sqrt(var)), 6) + 0.0
        ).alias("z_trend"),
    )


def welch_t(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Welch's unequal-variance t readout between exactly two groups:
    means, sample variances, the t statistic, and the
    Welch-Satterthwaite degrees of freedom — the parametric complement
    to :func:`anova_oneway` (k groups) and the Mann-Whitney rank test
    (distribution-free): the default two-sample mean comparison when
    variances differ.

    Groups order lexicographically; ``t`` is mean_b - mean_a over the
    pooled-unequal SE (positive = later-sorting group higher). Returns
    ONE row ``(group_a, group_b, n_a, n_b, mean_a, mean_b, var_a,
    var_b, t_stat, df_welch)``; t/df NULL when either group has < 2
    rows or both variances are 0.

    Determinism: per-group (n, sum, sum-of-squares) accumulate in
    DECIMAL(38,12) (exact, order-free — the corr_matrix convention);
    every output is a one-shot double over those exact moments.
    """
    base = df.select(
        F.col(group_col).cast("string").alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_g").isNotNull() & F.col("_v").isNotNull())
    per = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(F.col("_v").cast(_DEC)).alias("_s"),
        F.sum(
            (F.col("_v").cast(_DEC) * F.col("_v").cast(_DEC)).cast(_DEC)
        ).alias("_q"),
    )
    wide = per.agg(
        F.count(F.lit(1)).alias("_k"),
        F.min(F.struct("_g", "_n", "_s", "_q")).alias("_a"),
        F.max(F.struct("_g", "_n", "_s", "_q")).alias("_b"),
    ).filter(F.col("_k") == 2)

    def moments(side):
        n = F.col(f"_{side}._n")
        s = F.col(f"_{side}._s").cast("double")
        q = F.col(f"_{side}._q").cast("double")
        mean = s / n.cast("double")
        # sample variance via the sum-of-squares identity
        var = F.when(
            n > 1, (q - s * s / n.cast("double")) / (n - 1).cast("double")
        )
        return n, mean, var

    na, ma, va = moments("a")
    nb, mb, vb = moments("b")
    sea2 = va / na.cast("double")
    seb2 = vb / nb.cast("double")
    ok = (na > 1) & (nb > 1) & (sea2 + seb2 > 0.0)
    t = (mb - ma) / F.sqrt(sea2 + seb2)
    dfw = (sea2 + seb2) * (sea2 + seb2) / (
        sea2 * sea2 / (na - 1).cast("double")
        + seb2 * seb2 / (nb - 1).cast("double")
    )
    return wide.select(
        F.col("_a._g").alias("group_a"),
        F.col("_b._g").alias("group_b"),
        na.alias("n_a"),
        nb.alias("n_b"),
        (F.round(ma, 6) + 0.0).alias("mean_a"),
        (F.round(mb, 6) + 0.0).alias("mean_b"),
        (F.round(va, 6) + 0.0).alias("var_a"),
        (F.round(vb, 6) + 0.0).alias("var_b"),
        (F.round(F.when(ok, t), 6) + 0.0).alias("t_stat"),
        (F.round(F.when(ok, dfw), 4) + 0.0).alias("df_welch"),
    )


def brown_forsythe(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Brown-Forsythe test (Levene's test with group MEDIAN centers):
    do the k groups have equal SPREAD? Runs a one-way ANOVA on the
    absolute deviations ``z = |v - median(group)|`` — the
    heteroscedasticity screen that should PRECEDE a plain ANOVA (whose
    equal-variance assumption it checks), robust to non-normality
    where the original mean-centered Levene is not.

    Returns ONE row ``(n_groups, n, df_between, df_within, f_stat)``
    (NULL f when degenerate — the :func:`anova_oneway` conventions).

    Shape: one grouped exact-percentile aggregate for the medians
    (group-count-sized; the 100 TB swap-in is ``approx_percentile``,
    same contract as ``mad_outliers``), one broadcastable join back,
    then the :func:`anova_oneway` moment machinery on ``z`` (exact
    DECIMAL sums, micro-quantized between-group terms).
    """
    base = df.select(
        F.col(group_col).cast("string").alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_g").isNotNull() & F.col("_v").isNotNull())
    med = base.groupBy("_g").agg(
        F.percentile("_v", F.lit(0.5)).alias("_m")
    )
    z = base.join(F.broadcast(med), "_g").select(
        "_g", F.abs(F.col("_v") - F.col("_m")).alias("_z")
    )
    out = anova_oneway(z, "_g", "_z")
    return out.select(
        "n_groups", "n", "df_between", "df_within", "f_stat"
    )


def _ranged_exclusive_cumsum(
    per_v: DataFrame,
    order_col: str,
    weight_col: str | list[str],
    out_col: str | list[str],
    totals_out: dict | None = None,
    prepartitioned: bool = False,
    cache_pool: list | None = None,
) -> DataFrame:
    """Exclusive prefix sum(s) of ``weight_col`` in ``order_col`` order
    with NO unpartitioned WindowExec: ``repartitionByRange`` on the
    (distinct) order key + per-partition running sums + one
    <= num_partitions-row driver collect of partition totals folded back
    as broadcast offsets — the same distributed-total-order construction
    as ``linkage.sorted_neighborhood_pairs``. The input is
    localCheckpointed so the collected offsets can never drift from a
    re-sampled RangePartitioner on recompute. Requires ``order_col``
    values distinct. Accepts parallel lists of weight/out columns (all
    prefix sums share the single range pass); the output keeps the
    order column and every weight column, nothing else. Pass
    ``totals_out`` (a dict) to ALSO receive the
    grand total per weight column — already known from the offset fold,
    so callers needing suffix sums (total − exclusive prefix) pay zero
    extra jobs.

    ``prepartitioned=True`` (round 11, for iterative callers like
    ``survival.cox_ph`` that run MANY prefix passes over the same
    ordered key set): the input already carries a ``_pid`` column with
    range semantics — every row of one ``order_col`` value under one
    pid, pids ascending with the order key, ``_pid`` MATERIALIZED
    upstream (a localCheckpointed ``repartitionByRange`` +
    ``spark_partition_id()``). The primitive then skips its own range
    shuffle AND the checkpoint: the per-pass boundary re-sample and
    materialization were ~half of cox's fixed cost, and determinism
    still holds because the offsets derive from exact integer sums
    grouped on the frozen upstream pid assignment (nothing re-samples
    on recompute). To ALSO avoid recomputing the running-sum chain in
    the caller's downstream action (the totals collect is one job, the
    caller's reduction another), pass ``cache_pool`` (a list): the
    running-sum frame is ``persist()``-ed — populated by the totals
    job, read for free by the caller's — and appended to the pool; the
    CALLER unpersists everything in the pool once its action is done.
    """
    from pyspark.sql import Window

    wcols = [weight_col] if isinstance(weight_col, str) else list(weight_col)
    ocols = [out_col] if isinstance(out_col, str) else list(out_col)
    assert len(wcols) == len(ocols)
    spark = per_v.sparkSession
    try:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_parts = 32
    wrun = (
        Window.partitionBy("_pid")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if prepartitioned:
        assert "_pid" in per_v.columns, (
            "prepartitioned=True requires a materialized _pid column"
        )
        ranked = per_v
    else:
        ranked = per_v.repartitionByRange(
            n_parts, F.col(order_col).asc()
        ).withColumn("_pid", F.spark_partition_id())
    for w in wcols:
        ranked = ranked.withColumn(f"_lsum_{w}", F.sum(w).over(wrun))
    if not prepartitioned and totals_out is None:
        # r14: ZERO standalone jobs on this path. The partition-offset
        # fold moves IN-PLAN: a <= n_parts-row per-pid aggregate + an
        # exclusive running sum over those rows (a bounded
        # unpartitioned window) broadcast-joined back. The checkpoint
        # stays — measured fact: range exchanges are NEVER reused by
        # the planner (hash exchanges are), so without it the two
        # consumers would each execute their own range shuffle with an
        # independent RangePartitioner sample and the pid assignments
        # could drift — but it is LAZY: the caller's single action
        # materializes it while building the broadcast (every offset
        # aggregates every partition, so no consumer can observe a
        # partial store). Offsets are the same exact bigint sums the
        # driver fold produced. Remaining cost: one plan-to-RDD
        # compile (~0.3-0.5 s driver-side) that localCheckpoint pays
        # even when lazy.
        ranked = ranked.localCheckpoint(eager=False)
        from pyspark.sql import Window as _W

        woff = _W.orderBy("_pid").rowsBetween(_W.unboundedPreceding, -1)
        off_df = ranked.groupBy("_pid").agg(
            *[F.sum(w).alias(f"_tot_{w}") for w in wcols]
        ).select(
            "_pid",
            *[
                F.coalesce(F.sum(f"_tot_{w}").over(woff), F.lit(0))
                .cast("bigint")
                .alias(f"_poff_{w}")
                for w in wcols
            ],
        )
        return ranked.join(F.broadcast(off_df), "_pid").select(
            order_col,
            *wcols,
            *[
                (F.col(f"_poff_{w}") + F.col(f"_lsum_{w}") - F.col(w))
                .cast("bigint")
                .alias(o)
                for w, o in zip(wcols, ocols)
            ],
        )
    if not prepartitioned:
        # totals_out path: the grand total must reach the driver, and
        # the collected offsets must stay consistent with the pid
        # assignment the CALLER's later action sees — exchange reuse
        # cannot span actions, so this path keeps the (lazy)
        # checkpoint; the totals collect materializes it.
        ranked = ranked.localCheckpoint(eager=False)
    elif cache_pool is not None:
        ranked = ranked.persist()
        cache_pool.append(ranked)
    # partition total = SUM of the weights, never max(running sum):
    # for signed weights (cox_ph's S1 risk sums) the running sum is not
    # monotone, so its max is NOT the partition total — the same
    # max-of-prefix trap the r9 advice caught in best_sse_split
    totals = ranked.groupBy("_pid").agg(
        *[F.sum(w).alias(f"_tot_{w}") for w in wcols]
    ).collect()
    acc = {w: 0 for w in wcols}
    offsets = []
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((int(r["_pid"]), *[acc[w] for w in wcols]))
        for w in wcols:
            acc[w] += int(r[f"_tot_{w}"])
    if totals_out is not None:
        totals_out.update({w: int(acc[w]) for w in wcols})
    schema = "_pid int, " + ", ".join(f"_poff_{w} bigint" for w in wcols)
    off_df = spark.createDataFrame(
        offsets or [tuple([0] + [0] * len(wcols))], schema
    )
    return ranked.join(F.broadcast(off_df), "_pid").select(
        order_col,
        *wcols,
        *[
            (F.col(f"_poff_{w}") + F.col(f"_lsum_{w}") - F.col(w))
            .cast("bigint")
            .alias(o)
            for w, o in zip(wcols, ocols)
        ],
    )


def percent_rank_unique(
    df: DataFrame,
    value_col: str,
    id_col: str,
    out_col: str = "score",
) -> DataFrame:
    """Distributed ``percent_rank() OVER (ORDER BY value, id)`` for a
    UNIQUE (value, id) key — without the global per-row ranking window
    (`WindowExec: No Partition Defined` moves the whole table to one
    partition). Same decomposition as :func:`kruskal_wallis`'s
    midranks: per-value counts, a RANGE-PARTITIONED exclusive prefix
    sum over the distinct-value table for offsets (so a near-unique /
    continuous value column — where the distinct table is table-sized —
    never degenerates to a single-partition window either), then a
    value-PARTITIONED row_number for the within-value position;
    ``(rank - 1) / (n - 1)`` reproduces percent_rank bit-for-bit
    (n > 1; single-row input scores 0.0 like percent_rank does).

    Appends ``out_col`` (double); other columns pass through.
    """
    from pyspark.sql import Window

    per_v = df.groupBy(F.col(value_col).alias("_v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_t")
    )
    # r14: n = Σ_t folds in from the cumsum primitive's output (its
    # internal checkpoint) — the standalone df.count() job re-executed
    # the caller's whole upstream once per run just to embed the
    # denominator as a literal. Same exact integer, same double.
    pre = _ranged_exclusive_cumsum(per_v, "_v", "_t", "_off")
    offs = pre.select("_v", "_off")
    nrow = pre.agg(
        F.when(F.sum("_t") > 1, (F.sum("_t") - 1).cast("double"))
        .otherwise(F.lit(1.0))
        .alias("_denom")
    )
    wr = Window.partitionBy(value_col).orderBy(id_col)
    return (
        df.join(offs, df[value_col] == offs["_v"])
        .crossJoin(F.broadcast(nrow))
        .withColumn("_r", F.row_number().over(wr))
        .withColumn(
            out_col,
            (F.col("_off") + F.col("_r") - F.lit(1)).cast("double")
            / F.col("_denom"),
        )
        .drop("_v", "_off", "_r", "_denom")
    )


def eb_shrunk_means(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Empirical-Bayes (James-Stein) shrinkage of per-group means toward
    the grand mean, one row per group: ``(group, n, mean,
    shrunk_mean)`` — the estimator to publish when many groups have few
    observations (per-domain quality scores, per-author averages,
    per-seller ratings): raw small-n means are mostly noise, and the
    one-way random-effects model shrinks each toward the grand mean by
    exactly how little its sample size earns.

    Method of moments (unbalanced one-way ANOVA): within-group variance
    ``σ² = SS_w/(N-k)``, between-group mean square ``MS_b =
    SS_b/(k-1)``, effective group size ``n0 = (N - Σn_g²/N)/(k-1)``,
    signal variance ``τ² = max(0, (MS_b - σ²)/n0)``; each group's
    posterior weight is ``B_g = τ²/(τ² + σ²/n_g)`` and ``shrunk =
    μ + B_g (mean_g - μ)``. τ² = 0 (no real between-group signal)
    collapses every group to the grand mean; n_g → ∞ recovers the raw
    mean. Degenerate inputs (k < 2 or N <= k) return NULL shrunk_mean.

    Shape: ONE grouped aggregate + one broadcast of the 1-row global
    moment table — nothing corpus-sized after the first groupBy.
    Determinism: values quantize to integer micros; per-row squares
    accumulate in DECIMAL(38,0) (exact); the per-group ``s²/n`` terms
    quantize to integer micros before their global sum, so every
    cross-row aggregate is exact and only the final per-group B and
    shrunk mean are (deterministic, single-expression) doubles.
    """
    base = df.select(
        F.col(group_col).alias("_g"),
        F.round(F.col(value_col).cast("double") * 1e6)
        .cast("bigint")
        .alias("_vu"),
    ).filter(F.col("_g").isNotNull() & F.col("_vu").isNotNull())
    per = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_vu").cast("bigint").alias("_s"),
        F.sum(F.col("_vu").cast("decimal(38,0)") * F.col("_vu")).alias("_ssq"),
    )
    sval = F.col("_s").cast("double") / F.lit(1e6)
    glob = per.agg(
        F.sum("_n").cast("bigint").alias("_N"),
        F.count(F.lit(1)).cast("bigint").alias("_k"),
        F.sum("_s").cast("bigint").alias("_S"),
        F.sum("_ssq").cast("decimal(38,0)").alias("_SSQ"),
        # micro-quantized s²/n terms can exceed bigint on high-valued
        # columns (orders totalprice: ~4e19 per group) — accumulate in
        # DECIMAL(38,0), still exact integers
        F.sum(
            F.round(sval * sval / F.col("_n").cast("double") * F.lit(1e6))
            .cast("decimal(38,0)")
        ).alias("_t1m"),
        F.sum(F.col("_n") * F.col("_n")).cast("bigint").alias("_n2"),
    )
    N = F.col("_N").cast("double")
    k = F.col("_k").cast("double")
    mu = F.col("_S").cast("double") / F.lit(1e6) / N
    ssq_val = F.col("_SSQ").cast("double") / F.lit(1e12)
    t1 = F.col("_t1m").cast("double") / F.lit(1e6)
    ok = (F.col("_k") >= 2) & (F.col("_N") > F.col("_k"))
    sigma2 = (ssq_val - t1) / (N - k)
    s_val = F.col("_S").cast("double") / F.lit(1e6)
    msb = (t1 - s_val * s_val / N) / (k - 1)
    n0 = (N - F.col("_n2").cast("double") / N) / (k - 1)
    tau2 = F.greatest(F.lit(0.0), (msb - sigma2) / n0)
    g = glob.select(
        F.when(ok, mu).alias("_mu"),
        F.when(ok, sigma2).alias("_sigma2"),
        F.when(ok, tau2).alias("_tau2"),
    )
    mean_g = F.col("_s").cast("double") / F.lit(1e6) / F.col("_n").cast("double")
    b = F.col("_tau2") / (
        F.col("_tau2") + F.col("_sigma2") / F.col("_n").cast("double")
    )
    return per.crossJoin(F.broadcast(g)).select(
        F.col("_g").alias(group_col),
        F.col("_n").alias("n"),
        (F.round(mean_g, 6) + 0.0).alias("mean"),
        (
            F.round(
                F.col("_mu")
                + F.when(
                    F.col("_tau2") > 0, b * (mean_g - F.col("_mu"))
                ).otherwise(F.lit(0.0)),
                6,
            )
            + 0.0
        ).alias("shrunk_mean"),
    )


def distribution_distance(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Three two-sample distribution distances between ``group_a`` and
    ``group_b``'s empirical value distributions, ONE row: ``(n_a, n_b,
    n_values, w1_distance, ks_stat, cvm_stat)``.

    - ``w1_distance``: 1-D Wasserstein (earth mover's) distance
      ``∫|F_a(v) - F_b(v)| dv`` — the magnitude-aware drift number PSI
      and KS can't give (it reports HOW FAR mass moved in value units,
      not just that it moved). The 1-D closed form over the pooled
      distinct values (Ramdas et al. 2017).
    - ``ks_stat``: Kolmogorov-Smirnov ``sup|F_a - F_b|``.
    - ``cvm_stat``: Cramér-von Mises criterion in its pooled-weight form
      ``Σ_v (F_a(v) - F_b(v))² · (c_a(v)+c_b(v)) / (n_a+n_b)`` —
      integral of the squared CDF gap against the pooled empirical
      measure, the tail-sensitive companion to KS's single sup.

    Scale shape: one groupBy to per-value counts, ONE range-partitioned
    prefix-sum pass for both groups' CDFs (``_ranged_exclusive_cumsum``
    — no unpartitioned window even when the value column is continuous
    and the distinct table is data-sized), then an equi-self-join on
    global rank (rank+1 = rank) for the consecutive-value gaps the W1
    integral needs — lead() without a global window. Determinism:
    values quantize to integer micros; every per-value term quantizes
    to integer picos BEFORE its sum so cross-engine accumulation order
    can't wiggle a hash; final stats round 6 dp.
    """
    base = df.select(
        F.col(group_col).cast("string").alias("_g"),
        F.round(F.col(value_col).cast("double") * 1e6)
        .cast("bigint")
        .alias("_vu"),
    ).filter(F.col("_g").isin(group_a, group_b) & F.col("_vu").isNotNull())
    per_v = base.groupBy("_vu").agg(
        F.sum(F.when(F.col("_g") == group_a, 1).otherwise(0))
        .cast("bigint")
        .alias("_ca"),
        F.sum(F.when(F.col("_g") == group_b, 1).otherwise(0))
        .cast("bigint")
        .alias("_cb"),
    ).withColumn("_one", F.lit(1).cast("bigint"))
    ranked = _ranged_exclusive_cumsum(
        per_v, "_vu", ["_one", "_ca", "_cb"], ["_rn0", "_xa", "_xb"]
    )
    tot = per_v.agg(
        F.sum("_ca").cast("bigint").alias("_na"),
        F.sum("_cb").cast("bigint").alias("_nb"),
        F.count(F.lit(1)).cast("bigint").alias("_nv"),
    )
    cur = ranked.select(
        F.col("_rn0").alias("_rn"),
        "_vu",
        "_ca",
        "_cb",
        (F.col("_xa") + F.col("_ca")).alias("_ia"),
        (F.col("_xb") + F.col("_cb")).alias("_ib"),
    )
    nxt = ranked.select(
        (F.col("_rn0") - F.lit(1)).alias("_rn"), F.col("_vu").alias("_vnext")
    )
    joined = cur.join(nxt, "_rn", "left").crossJoin(F.broadcast(tot))
    # try_divide: an empty group (n = 0) must flow NULL into the terms
    # (the ok-guard below then NULLs the outputs) instead of raising
    # ANSI DIVIDE_BY_ZERO inside the per-value expressions
    fa = F.try_divide(F.col("_ia").cast("double"), F.col("_na").cast("double"))
    fb = F.try_divide(F.col("_ib").cast("double"), F.col("_nb").cast("double"))
    diff = fa - fb
    gap = (F.col("_vnext") - F.col("_vu")).cast("double") / F.lit(1e6)
    w1_t = F.round(F.abs(diff) * gap * F.lit(1e12)).cast("bigint")
    ks_t = F.round(F.abs(diff) * F.lit(1e12)).cast("bigint")
    cvm_t = F.round(
        diff * diff * (F.col("_ca") + F.col("_cb")).cast("double") * F.lit(1e12)
    ).cast("bigint")
    agg = joined.agg(
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.max("_nv").alias("n_values"),
        F.sum(F.when(F.col("_vnext").isNotNull(), w1_t)).alias("_w1p"),
        F.max(ks_t).alias("_ksp"),
        F.sum(cvm_t).alias("_cvmp"),
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return agg.select(
        "n_a",
        "n_b",
        "n_values",
        (
            F.round(
                F.when(ok, F.coalesce(F.col("_w1p"), F.lit(0)) / F.lit(1e12)),
                6,
            )
            + 0.0
        ).alias("w1_distance"),
        (F.round(F.when(ok, F.col("_ksp") / F.lit(1e12)), 6) + 0.0).alias(
            "ks_stat"
        ),
        (
            F.round(
                F.when(
                    ok,
                    F.col("_cvmp")
                    / (F.col("n_a") + F.col("n_b")).cast("double")
                    / F.lit(1e12),
                ),
                6,
            )
            + 0.0
        ).alias("cvm_stat"),
    )


def jarque_bera(
    df: DataFrame, group_col: str, value_col: str, min_n: int = 8
) -> DataFrame:
    """Jarque-Bera normality screen per group: sample skewness, excess
    kurtosis, and the JB statistic ``n/6 · (S² + K²/4)`` (asymptotically
    χ²₂ under normality; JB > 5.99 rejects at 5%). The moment-based
    "is this metric even close to Gaussian?" check that should precede
    every t/z-based readout in the battery (Welch, CUPED, A/B) — heavy
    tails inflate JB long before they show in a mean.

    Returns one row per group ``(group_col, n, skewness, ex_kurtosis,
    jb_stat)``; groups with ``n < min_n`` or zero variance report NULL
    statistics (moments undefined / unstable).

    Determinism: two-pass central moments — pass 1 takes the exact
    DECIMAL(38,12) sum for the group mean (one double division); pass 2
    quantizes each deviation to integer 1e-4 units (``round(z·1e4)``)
    and accumulates z², z³, z⁴ as exact DECIMAL(38,0) integer sums, so
    both engines aggregate identical integers in any order and the
    final skew/kurtosis are one-shot double expressions over exact
    sums. The 1e-4 grid bounds z⁴ at ~1e26 per row — ~1e12 rows per
    group before the 38-digit accumulator saturates. Shape: two
    group-keyed map-side-combinable aggregates joined by group (the
    broadcast is the group table, never the data) — no window, no
    driver state, linear at any corpus size.
    """
    base = df.select(
        F.col(group_col).cast("string").alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_g").isNotNull() & F.col("_v").isNotNull())
    means = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        (
            F.sum(F.col("_v").cast(_DEC)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_mean"),
    )
    zq = (
        base.join(F.broadcast(means), "_g")
        .select(
            "_g",
            "_n",
            F.round((F.col("_v") - F.col("_mean")) * 1e4)
            .cast("decimal(38,0)")
            .alias("_z"),
        )
    )
    # _n rides along so the moment pass closes the plan without a
    # second join back to the means table (one fewer corpus scan)
    mom = zq.groupBy("_g").agg(
        F.max("_n").alias("_n"),
        F.sum((F.col("_z") * F.col("_z")).cast("decimal(38,0)")).alias("_s2"),
        F.sum(
            (
                (F.col("_z") * F.col("_z")).cast("decimal(38,0)") * F.col("_z")
            ).cast("decimal(38,0)")
        ).alias("_s3"),
        F.sum(
            (
                (F.col("_z") * F.col("_z")).cast("decimal(38,0)")
                * (F.col("_z") * F.col("_z")).cast("decimal(38,0)")
            ).cast("decimal(38,0)")
        ).alias("_s4"),
    )
    j = mom
    n = F.col("_n").cast("double")
    m2 = F.col("_s2").cast("double") / n / 1e8
    m3 = F.col("_s3").cast("double") / n / 1e12
    m4 = F.col("_s4").cast("double") / n / 1e16
    ok = (F.col("_n") >= F.lit(min_n)) & (m2 > 0.0)
    skew = m3 / F.pow(m2, F.lit(1.5))
    exk = m4 / (m2 * m2) - F.lit(3.0)
    jb = n / F.lit(6.0) * (skew * skew + exk * exk / F.lit(4.0))
    return j.select(
        F.col("_g").alias(group_col),
        F.col("_n").alias("n"),
        (F.round(F.when(ok, skew), 6) + 0.0).alias("skewness"),
        (F.round(F.when(ok, exk), 6) + 0.0).alias("ex_kurtosis"),
        (F.round(F.when(ok, jb), 4) + 0.0).alias("jb_stat"),
    )


def _log_fact(x):
    """Exact-order log-factorial column: ``ln(x!) = Σ_{i=2..x} ln i``
    (0 for x <= 1). A per-row fold over ``sequence(2, x)`` — bounded by
    the fisher_exact contract (margins of a SMALL 2×2), never
    data-sized. The oracle twin is ``lgamma(x + 1)``; both are within
    ~1e-9 of ln Γ, eight orders below the 1e-6 output grid."""
    return F.when(x <= 1, F.lit(0.0)).otherwise(
        F.aggregate(
            F.sequence(F.lit(2).cast("bigint"), x.cast("bigint")),
            F.lit(0.0),
            lambda acc, i: acc + F.log(i.cast("double")),
        )
    )


def fisher_exact(df: DataFrame, group_col: str, flag_col: str) -> DataFrame:
    """Fisher's exact test on the 2×2 table ``group × flag`` — the
    small-sample conditional test the asymptotic χ² screens
    (chisq_drift, cmh_test) can't replace when any cell is tiny.
    ``group_col`` must take exactly two values (sorted order defines
    rows); ``flag_col`` is boolean. Returns ONE row ``(n, n11, n10,
    n21, n20, odds_ratio, p_two_sided, p_left, p_right)`` —
    hypergeometric tail probabilities, two-sided by the standard
    sum-of-≤-observed-probability rule (scipy convention; the
    equal-probability tolerance is widened to 5e-7 in log space so the
    oracle's lgamma-vs-sum-of-ln gap, ~1e-8, can never flip a mirror
    term's inclusion).

    SCALE CONTRACT: exact enumeration is for SMALL tables — the
    support is ``min(row1, col1)`` wide and each point costs a
    log-factorial fold, so callers pass a bounded cohort (the gate
    uses ``event_id <= 2000``); at corpus scale the χ²/CMH asymptotics
    are the right tool and this is the calibration check beside them.
    Shape: one aggregate to a single 4-count row, then a one-row
    explode of the support — driver never sees data.
    """
    # counts: a = (g1, true), b = (g1, false), c = (g2, true), d = (g2, false)
    # where g1 = min(group) — the sorted-order row convention
    base = df.select(
        F.col(group_col).cast("string").alias("_g"),
        F.col(flag_col).cast("boolean").alias("_f"),
    ).filter(F.col("_g").isNotNull() & F.col("_f").isNotNull())
    lo = base.agg(F.min("_g").alias("_glo")).select("_glo")
    t = base.join(F.broadcast(lo)).groupBy().agg(
        F.sum(((F.col("_g") == F.col("_glo")) & F.col("_f")).cast("bigint")).alias("_a"),
        F.sum(((F.col("_g") == F.col("_glo")) & ~F.col("_f")).cast("bigint")).alias("_b"),
        F.sum(((F.col("_g") != F.col("_glo")) & F.col("_f")).cast("bigint")).alias("_c"),
        F.sum(((F.col("_g") != F.col("_glo")) & ~F.col("_f")).cast("bigint")).alias("_d"),
    )
    r1 = F.col("_a") + F.col("_b")
    r2 = F.col("_c") + F.col("_d")
    c1 = F.col("_a") + F.col("_c")
    c2 = F.col("_b") + F.col("_d")
    nn = r1 + r2
    m = t.select(
        "_a", "_b", "_c", "_d",
        r1.alias("_r1"), r2.alias("_r2"), c1.alias("_c1"), c2.alias("_c2"),
        nn.alias("_nn"),
        F.greatest(F.lit(0).cast("bigint"), c1 - r2).alias("_kmin"),
        F.least(r1, c1).alias("_kmax"),
        (_log_fact(r1) + _log_fact(r2) - _log_fact(nn) + _log_fact(c1) + _log_fact(c2)).alias("_lconst"),
    )
    ks = m.select(
        "*",
        F.explode(F.sequence(F.col("_kmin"), F.col("_kmax"))).alias("_k"),
    )
    lp = (
        F.col("_lconst")
        - _log_fact(F.col("_k"))
        - _log_fact(F.col("_r1") - F.col("_k"))
        - _log_fact(F.col("_c1") - F.col("_k"))
        - _log_fact(F.col("_r2") - F.col("_c1") + F.col("_k"))
    )
    scored = ks.select("*", lp.alias("_lp"))
    obs = scored.filter(F.col("_k") == F.col("_a")).select(
        F.col("_lp").alias("_lpobs")
    )
    fin = (
        scored.join(F.broadcast(obs))
        .groupBy("_a", "_b", "_c", "_d", "_nn")
        .agg(
            F.sum(
                F.when(F.col("_lp") <= F.col("_lpobs") + F.lit(5e-7), F.exp("_lp")).otherwise(F.lit(0.0))
            ).alias("_ptwo"),
            F.sum(
                F.when(F.col("_k") <= F.col("_a"), F.exp("_lp")).otherwise(F.lit(0.0))
            ).alias("_pleft"),
            F.sum(
                F.when(F.col("_k") >= F.col("_a"), F.exp("_lp")).otherwise(F.lit(0.0))
            ).alias("_pright"),
        )
    )
    orat = F.when(
        (F.col("_b") * F.col("_c")) > 0,
        F.col("_a").cast("double")
        * F.col("_d").cast("double")
        / (F.col("_b").cast("double") * F.col("_c").cast("double")),
    )
    return fin.select(
        F.col("_nn").alias("n"),
        F.col("_a").alias("n11"),
        F.col("_b").alias("n10"),
        F.col("_c").alias("n21"),
        F.col("_d").alias("n20"),
        (F.round(orat, 6) + 0.0).alias("odds_ratio"),
        (F.round(F.least(F.col("_ptwo"), F.lit(1.0)), 6) + 0.0).alias("p_two_sided"),
        (F.round(F.least(F.col("_pleft"), F.lit(1.0)), 6) + 0.0).alias("p_left"),
        (F.round(F.least(F.col("_pright"), F.lit(1.0)), 6) + 0.0).alias("p_right"),
    )


def wilcoxon_signed_rank(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Wilcoxon signed-rank test over PAIRED measurements (one row per
    unit, columns x and y): the nonparametric paired-location test —
    the within-unit complement of :func:`mann_whitney` (unpaired), and
    the robust alternative to a paired t-test for pre/post readouts.
    Zero differences are dropped (Wilcoxon's convention), |d| ties get
    midranks with the standard tie-corrected normal approximation
    (variance term − Σ(t³−t)/48).

    Returns ONE row ``(n_pairs, n_nonzero, w_plus, z)``; ``z`` is NULL
    when fewer than 2 nonzero differences or zero variance.

    Determinism: differences quantize to integer micro-units, midranks
    come from the :func:`mann_whitney` distinct-value trick — aggregate
    per distinct |d| (the only unit-count-sized shuffle), then a
    RANGE-PARTITIONED exclusive prefix sum over the distinct-|d| table
    (``_ranged_exclusive_cumsum``, round 11: on continuous paired
    metrics the micro-quantized differences are near-unique, so the
    distinct table is ~n rows and the old unpartitioned window was a
    single-partition bottleneck precisely at corpus scale); midranks
    are exact halves, tie terms exact integers.
    """
    d = df.select(
        F.round(
            (F.col(y_col).cast("double") - F.col(x_col).cast("double"))
            * 1e6
        )
        .cast("bigint")
        .alias("_d")
    ).filter(F.col("_d").isNotNull())
    # r14: the zero-difference group RIDES the range pass instead of a
    # standalone d.count() job (which re-executed the whole upstream
    # once per run purely to embed n_pairs as a literal). |d| = 0 is the
    # smallest key, so it takes offset 0 and inflates every nonzero
    # offset by the zero count zc; the midrank correction subtracts it
    # back EXACTLY in the final aggregate:
    #   Σ _tp·(_off − zc + (_t+1)/2)  =  S1 − zc·S2
    # with S1/S2 plain sums over nonzero rows — counts and half-integer
    # midranks, all exact below 2^52, so w_plus is bit-identical.
    nz = d.select(
        F.abs(F.col("_d")).alias("_a"),
        (F.col("_d") > 0).alias("_pos"),
    )
    per_v = nz.groupBy("_a").agg(
        F.count(F.lit(1)).cast("bigint").alias("_t"),
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).cast("bigint").alias("_tp"),
    )
    # exclusive prefix of _t via the range-partitioned primitive (no
    # unpartitioned window even with near-unique |d|); _tp rides the
    # same range pass as a second weight column
    pre = _ranged_exclusive_cumsum(
        per_v, "_a", ["_t", "_tp"], ["_off", "_offp"]
    )
    is_nz = F.col("_a") != 0
    midrank_raw = (
        F.col("_off").cast("double")
        + (F.col("_t") + 1).cast("double") / 2.0
    )
    agg = pre.agg(
        F.coalesce(F.sum(F.when(~is_nz, F.col("_t"))), F.lit(0))
        .cast("bigint")
        .alias("_zc"),
        F.coalesce(F.sum(F.when(is_nz, F.col("_t"))), F.lit(0))
        .cast("bigint")
        .alias("n_nonzero"),
        F.sum(F.when(is_nz, F.col("_tp") * midrank_raw)).alias("_s1"),
        F.sum(F.when(is_nz, F.col("_tp"))).cast("bigint").alias("_s2"),
        F.sum(
            F.when(
                is_nz,
                F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t"),
            )
        ).alias("_ties"),
    )
    wp = F.col("_s1") - (F.col("_zc") * F.col("_s2")).cast("double")
    nn = F.col("n_nonzero").cast("double")
    mean = nn * (nn + 1.0) / 4.0
    var = nn * (nn + 1.0) * (2.0 * nn + 1.0) / 24.0 - F.col(
        "_ties"
    ).cast("double") / 48.0
    z = F.when(
        (F.col("n_nonzero") >= 2) & (var > 0.0),
        (wp - mean) / F.sqrt(var),
    )
    return agg.select(
        (F.col("n_nonzero") + F.col("_zc")).cast("bigint").alias("n_pairs"),
        "n_nonzero",
        (F.round(wp, 2) + 0.0).alias("w_plus"),
        (F.round(z, 6) + 0.0).alias("z"),
    )


def runs_test(
    df: DataFrame, key_col: str, order_cols: list[str], value_col: str
) -> DataFrame:
    """Wald-Wolfowitz runs test per key: is the above/below-median sign
    sequence of the ordered series RANDOM, or does it cluster (too few
    runs — trend/regime persistence) or alternate (too many — negative
    serial correlation)? The distribution-free randomness screen beside
    the parametric serial-correlation diagnostics (acf, Ljung-Box,
    Durbin-Watson). Values equal to the key median are dropped
    (standard convention).

    Returns ``(key, n_above, n_below, n_runs, z)`` with the normal
    approximation ``z = (R - μ)/σ``, ``μ = 2·n1·n2/(n1+n2) + 1``;
    ``z`` is NULL when either side is empty or σ² is 0.

    Determinism: the sign sequence orders by the caller's total-order
    columns (equal (order, value) rows are sign-identical, so any
    residual tie order cannot move a run boundary); medians are exact
    grouped percentiles (``approx_percentile`` is the 100 TB swap-in,
    the mad_outliers contract). Shape: one grouped percentile, a
    broadcast-back sign pass, one per-key window lag, one keyed
    aggregate — all key-partitioned, no global window.
    """
    from pyspark.sql import Window as W

    base = df.select(
        F.col(key_col).alias("_k"),
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols)],
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    med = base.groupBy("_k").agg(
        F.percentile("_v", F.lit(0.5)).alias("_m")
    )
    signed = (
        base.join(F.broadcast(med), "_k")
        .filter(F.col("_v") != F.col("_m"))
        .select(
            "_k",
            *[f"_o{i}" for i in range(len(order_cols))],
            "_v",
            (F.col("_v") > F.col("_m")).alias("_s"),
        )
    )
    w = W.partitionBy("_k").orderBy(
        *[f"_o{i}" for i in range(len(order_cols))], "_v"
    )
    stepped = signed.select(
        "_k", "_s",
        F.lag("_s").over(w).alias("_prev"),
    )
    agg = stepped.groupBy("_k").agg(
        F.sum(F.col("_s").cast("bigint")).alias("n_above"),
        F.sum((~F.col("_s")).cast("bigint")).alias("n_below"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("_prev").isNotNull()
                    & (F.col("_s") != F.col("_prev")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("n_runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    n = n1 + n2
    mu = 2.0 * n1 * n2 / n + 1.0
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / (n * n * (n - 1.0))
    )
    z = F.when(
        (F.col("n_above") > 0) & (F.col("n_below") > 0) & (var > 0.0),
        (F.col("n_runs").cast("double") - mu) / F.sqrt(var),
    )
    return agg.select(
        F.col("_k").alias(key_col),
        "n_above",
        "n_below",
        "n_runs",
        (F.round(z, 6) + 0.0).alias("z"),
    )


def friedman_test(
    df: DataFrame, block_col: str, treatment_col: str, value_col: str
) -> DataFrame:
    """Friedman test over COMPLETE blocks: do the k treatments differ
    when every block (e.g. user) contributes one measurement per
    treatment? The repeated-measures complement of
    :func:`kruskal_wallis` (independent groups) — blocking removes
    between-block level differences the KW test would count as noise.
    Blocks missing any treatment are excluded (classic complete-block
    design); ties within a block get midranks, and the statistic is the
    tie-corrected form ``Q = (k−1)·Σ_j(R_j − n(k+1)/2)² / (A − C)``
    with ``A = Σ r²``, ``C = nk(k+1)²/4`` (χ²_{k−1} under H0). Also
    reports Kendall's W = Q/(n(k−1)) — the [0,1] concordance effect
    size.

    Returns ONE row ``(n_blocks, k_treatments, q_stat, kendalls_w)``;
    NULL statistics when fewer than 2 complete blocks, fewer than 2
    treatments, or A = C (all ranks tied everywhere).

    Determinism: per-(block, treatment) means come from exact DECIMAL
    sums divided once; within-block midranks are exact halves from a
    k-row window (rank + (ties−1)/2); rank sums and Σr² are exact in
    doubles (halves below 2^52). Shape: one (block, treatment)-keyed
    aggregate over the facts, a tiny distinct-treatment count, one
    block-partitioned k-row window, two block/treatment-keyed
    aggregates — no global window, no driver state.
    """
    from pyspark.sql import Window as W

    base = df.select(
        F.col(block_col).cast("string").alias("_b"),
        F.col(treatment_col).cast("string").alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(
        F.col("_b").isNotNull() & F.col("_t").isNotNull() & F.col("_v").isNotNull()
    )
    # r14: one action, one upstream execution. cell (block×treatment-
    # sized) is lazily checkpointed — it feeds the completeness filter,
    # the rank pass, and the two tiny scalar aggregates below, which
    # previously ran as 2 standalone count() jobs (k_all, n_blocks) +
    # a final plan that re-executed the cell subtree 4 more times.
    cell = base.groupBy("_b", "_t").agg(
        (
            F.sum(F.col("_v").cast(_DEC)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_m")
    ).localCheckpoint(eager=False)
    # distinct treatments of cell == distinct treatments of base (every
    # base row lands in exactly one cell), read from the checkpoint
    kt = cell.select("_t").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("_kall")
    )
    complete = (
        cell.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_nt"))
        .join(F.broadcast(kt), F.col("_nt") == F.col("_kall"))
        .select("_b")
    )
    cc = cell.join(complete, "_b")
    rk = cc.select(
        "_b", "_t",
        (
            F.rank().over(W.partitionBy("_b").orderBy("_m")).cast("double")
            + (
                F.count(F.lit(1))
                .over(W.partitionBy("_b", "_m"))
                .cast("double")
                - 1.0
            )
            / 2.0
        ).alias("_r"),
    )
    nb = complete.agg(F.count(F.lit(1)).cast("bigint").alias("_nb"))
    # Σr² rides the per-treatment pass (exact: _r are halves, _r²
    # quarter-units — partial-then-total regrouping cannot round)
    per_t = rk.groupBy("_t").agg(
        F.sum("_r").alias("_rj"),
        F.sum(F.col("_r") * F.col("_r")).alias("_aj"),
    )
    dev = F.col("_rj") - F.col("_nb").cast("double") * (
        F.col("_kall").cast("double") + 1.0
    ) / 2.0
    j = (
        per_t.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(kt))
        .groupBy()
        .agg(
            F.coalesce(F.max("_nb"), F.lit(0)).cast("bigint").alias("n_blocks"),
            F.count(F.lit(1)).cast("bigint").alias("k_treatments"),
            F.sum(dev * dev).alias("_dev2"),
            F.sum("_aj").alias("_a"),
        )
    )
    n = F.col("n_blocks").cast("double")
    k = F.col("k_treatments").cast("double")
    c = n * k * (k + 1.0) * (k + 1.0) / 4.0
    ok = (
        (F.col("n_blocks") >= 2)
        & (F.col("k_treatments") >= 2)
        & (F.col("_a") - c > 0.0)
    )
    q = (k - 1.0) * F.col("_dev2") / (F.col("_a") - c)
    return j.select(
        "n_blocks",
        "k_treatments",
        (F.round(F.when(ok, q), 6) + 0.0).alias("q_stat"),
        (F.round(F.when(ok, q / (n * (k - 1.0))), 6) + 0.0).alias(
            "kendalls_w"
        ),
    )


def g_test(df: DataFrame, row_col: str, col_col: str) -> DataFrame:
    """G-test (likelihood-ratio) of independence on the observed
    ``row × col`` contingency table: ``G = 2·Σ O·ln(O/E)`` with
    ``E = rowtot·coltot/n`` — the χ²'s twin that is additive across
    partitions of the table and better behaved for small expected
    counts; under H0 it is χ² with (r−1)(c−1) df. Only OBSERVED cells
    contribute (O = 0 terms vanish analytically, so the structural-
    zero pitfall of grouped contingency math never engages).

    Returns ONE row ``(n, n_row_levels, n_col_levels, dof, g_stat)``.

    Determinism: cell/margin counts are exact bigints; each cell's
    ``2·O·ln(O/E)`` quantizes to integer NANOS before the cross-cell
    sum (the MI-cell convention), so both engines add exact integers;
    the statistic is one double at the end. Shape: one cell-keyed
    aggregate (map-side combinable) + two margin aggregates joined
    back — margins are level-count-sized, never data-sized.
    """
    base = df.select(
        F.col(row_col).cast("string").alias("_r"),
        F.col(col_col).cast("string").alias("_c"),
    ).filter(F.col("_r").isNotNull() & F.col("_c").isNotNull())
    cells = base.groupBy("_r", "_c").agg(
        F.count(F.lit(1)).cast("bigint").alias("_o")
    )
    rmar = cells.groupBy("_r").agg(F.sum("_o").cast("bigint").alias("_rt"))
    cmar = cells.groupBy("_c").agg(F.sum("_o").cast("bigint").alias("_ct"))
    tot = cells.agg(F.sum("_o").cast("bigint").alias("_n"))
    term = (
        2.0
        * F.col("_o").cast("double")
        * F.log(
            F.col("_o").cast("double")
            / (
                F.col("_rt").cast("double")
                * F.col("_ct").cast("double")
                / F.col("_n").cast("double")
            )
        )
    )
    scored = (
        cells.join(F.broadcast(rmar), "_r")
        .join(F.broadcast(cmar), "_c")
        .join(F.broadcast(tot))
        .select(
            "_r", "_c",
            F.col("_o"),
            F.col("_n"),
            F.round(term * 1e9).cast("bigint").alias("_tq"),
        )
    )
    out = scored.groupBy("_n").agg(
        F.countDistinct("_r").cast("bigint").alias("n_row_levels"),
        F.countDistinct("_c").cast("bigint").alias("n_col_levels"),
        F.sum("_tq").alias("_g"),
    )
    return out.select(
        F.col("_n").alias("n"),
        "n_row_levels",
        "n_col_levels",
        (
            (F.col("n_row_levels") - 1) * (F.col("n_col_levels") - 1)
        ).cast("bigint").alias("dof"),
        (F.round(F.col("_g").cast("double") / 1e9, 6) + 0.0).alias(
            "g_stat"
        ),
    )


def cronbach_alpha(df: DataFrame, item_cols: list[str]) -> DataFrame:
    """Cronbach's alpha internal-consistency reliability over k parallel
    numeric item columns (Cronbach 1951): ``α = k/(k−1) · (1 − Σσ²_i /
    σ²_total)`` with population variances of each item and of the
    per-row item sum — the standard "do these k signals measure one
    construct?" screen before averaging quality sub-scores, rater
    columns, or metric batteries into a composite.

    Rows with any NULL item are dropped (listwise, the classical
    definition). Returns ONE row ``(n, k_items, sum_item_var,
    total_var, alpha)``; NULL alpha when n < 2, k < 2, or zero total
    variance.

    Determinism: each item quantizes to integer micro-units; per-item
    and total (s1, s2) accumulate as exact DECIMAL(38,0) integer sums
    (the jarque_bera recipe), so both engines add identical integers
    and every variance is a one-shot double. Shape: ONE map-side-
    combinable global aggregate of 2k+2 integer columns — no shuffle
    beyond the 1-row reduce, linear at any corpus size.
    """
    k = len(item_cols)
    if k < 2:
        raise ValueError("cronbach_alpha: need >= 2 item columns")
    cond = F.lit(True)
    for c in item_cols:
        cond = cond & F.col(c).isNotNull()
    qs = [
        F.round(F.col(c).cast("double") * 1e6).cast("bigint").alias(f"_q{i}")
        for i, c in enumerate(item_cols)
    ]
    from ..sources.lake import spread_scan

    # r13: exact integer/decimal sums — layout-invariant; spread a
    # single-row-group scan (guide §2.5; no-op on multi-split inputs)
    base = spread_scan(df.filter(cond).select(*qs))
    tot = F.lit(0).cast("bigint")
    for i in range(k):
        tot = tot + F.col(f"_q{i}")
    base = base.withColumn("_qt", tot)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for nm in [f"_q{i}" for i in range(k)] + ["_qt"]:
        aggs.append(F.sum(F.col(nm).cast("decimal(38,0)")).alias(f"_s1{nm}"))
        aggs.append(
            F.sum(
                (F.col(nm).cast("decimal(38,0)") * F.col(nm))
                .cast("decimal(38,0)")
            ).alias(f"_s2{nm}")
        )
    agg = base.agg(*aggs)
    n = F.col("_n").cast("double")

    def pvar(nm):
        s1 = F.col(f"_s1{nm}").cast("double")
        s2 = F.col(f"_s2{nm}").cast("double")
        return (s2 - s1 * s1 / n) / n / 1e12

    item_var = F.lit(0.0)
    for i in range(k):
        item_var = item_var + pvar(f"_q{i}")
    total_var = pvar("_qt")
    ok = (F.col("_n") >= 2) & (total_var > 0.0)
    alpha = (
        F.lit(float(k)) / F.lit(float(k - 1))
        * (F.lit(1.0) - item_var / total_var)
    )
    return agg.select(
        F.col("_n").alias("n"),
        F.lit(k).cast("bigint").alias("k_items"),
        (F.round(item_var, 6) + 0.0).alias("sum_item_var"),
        (F.round(total_var, 6) + 0.0).alias("total_var"),
        (F.round(F.when(ok, alpha), 6) + 0.0).alias("alpha"),
    )


def partial_corr(
    df: DataFrame, x_col: str, y_col: str, z_col: str
) -> DataFrame:
    """First-order partial correlation of x and y CONTROLLING for z:
    ``r_xy·z = (r_xy − r_xz·r_yz) / √((1−r²_xz)(1−r²_yz))`` — the
    "does the x–y association survive removing the confounder?" readout
    beside :func:`corr_matrix` (raw Pearson) — e.g. quality-score vs
    engagement controlling for document length.

    Returns ONE row ``(n, r_xy, r_xz, r_yz, partial_r)``; NULL partial
    when n < 3 or either controlled correlation is ±1 (degenerate
    denominator).

    Determinism: all three variables quantize to integer micro-units;
    the 3 sums + 3 squares + 3 cross-products accumulate as exact
    DECIMAL(38,0) (one map-side-combinable aggregate — the ols_xy
    sufficient-statistics trick widened to 3 variables); every r is a
    one-shot double over exact integers.
    """
    q = lambda c, nm: (  # noqa: E731
        F.round(F.col(c).cast("double") * 1e6).cast("bigint").alias(nm)
    )
    base = df.filter(
        F.col(x_col).isNotNull()
        & F.col(y_col).isNotNull()
        & F.col(z_col).isNotNull()
    ).select(q(x_col, "_x"), q(y_col, "_y"), q(z_col, "_z"))
    from ..sources.lake import spread_scan

    # r13: decimal(38,0) moment sums are exact/commutative — spread a
    # single-row-group scan so the per-row BigDecimal work parallelizes
    # (guide §2.5; no-op on multi-split inputs; same as corr_matrix)
    base = spread_scan(base)
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    agg = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(dec(F.col("_x"))).alias("_sx"),
        F.sum(dec(F.col("_y"))).alias("_sy"),
        F.sum(dec(F.col("_z"))).alias("_sz"),
        F.sum(dec(dec(F.col("_x")) * F.col("_x"))).alias("_sxx"),
        F.sum(dec(dec(F.col("_y")) * F.col("_y"))).alias("_syy"),
        F.sum(dec(dec(F.col("_z")) * F.col("_z"))).alias("_szz"),
        F.sum(dec(dec(F.col("_x")) * F.col("_y"))).alias("_sxy"),
        F.sum(dec(dec(F.col("_x")) * F.col("_z"))).alias("_sxz"),
        F.sum(dec(dec(F.col("_y")) * F.col("_z"))).alias("_syz"),
    )
    n = F.col("_n").cast("double")

    def r_of(sab, sa, sb, saa, sbb):
        cov = n * F.col(sab).cast("double") - F.col(sa).cast(
            "double"
        ) * F.col(sb).cast("double")
        da = n * F.col(saa).cast("double") - F.col(sa).cast(
            "double"
        ) * F.col(sa).cast("double")
        db = n * F.col(sbb).cast("double") - F.col(sb).cast(
            "double"
        ) * F.col(sb).cast("double")
        return F.when((da > 0) & (db > 0), cov / F.sqrt(da * db))

    rxy = r_of("_sxy", "_sx", "_sy", "_sxx", "_syy")
    rxz = r_of("_sxz", "_sx", "_sz", "_sxx", "_szz")
    ryz = r_of("_syz", "_sy", "_sz", "_syy", "_szz")
    den = (F.lit(1.0) - rxz * rxz) * (F.lit(1.0) - ryz * ryz)
    ok = (F.col("_n") >= 3) & (den > 0.0)
    pr = (rxy - rxz * ryz) / F.sqrt(den)
    return agg.select(
        F.col("_n").alias("n"),
        (F.round(rxy, 6) + 0.0).alias("r_xy"),
        (F.round(rxz, 6) + 0.0).alias("r_xz"),
        (F.round(ryz, 6) + 0.0).alias("r_yz"),
        (F.round(F.when(ok, pr), 6) + 0.0).alias("partial_r"),
    )


def grubbs_test(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Grubbs' maximum-normed-residual statistic per group (Grubbs
    1950): ``G = max_i |x_i − x̄| / s`` with the SAMPLE standard
    deviation — the classical single-outlier screen beside the
    robust :func:`mad_outliers` (which flags many; Grubbs asks "is the
    single most extreme point surprising for a Gaussian?"). Compare G
    against the t-based critical value for the caller's n and α.

    Returns per group ``(group_col, n, mean, sd, g_stat)``; NULL
    g_stat when n < 3 or zero variance.

    Determinism: pass 1 takes exact DECIMAL sums for mean/sd; pass 2
    quantizes each |deviation| to integer micro-units and takes the
    integer MAX (order-free); G is a one-shot double. Shape: two
    group-keyed map-side-combinable aggregates joined on the group —
    the jarque_bera two-pass recipe, no window, linear at any size.
    """
    base = df.select(
        F.col(group_col).cast("string").alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_g").isNotNull() & F.col("_v").isNotNull())
    mo = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(F.col("_v").cast(_DEC)).alias("_s1"),
        F.sum(
            (F.col("_v").cast(_DEC) * F.col("_v").cast(_DEC)).cast(_DEC)
        ).alias("_s2"),
    )
    n = F.col("_n").cast("double")
    mean = F.col("_s1").cast("double") / n
    var = F.when(
        F.col("_n") > 1,
        (
            F.col("_s2").cast("double")
            - F.col("_s1").cast("double")
            * F.col("_s1").cast("double")
            / n
        )
        / (n - 1.0),
    )
    mom = mo.select(
        "_g", "_n",
        mean.alias("_mean"),
        F.sqrt(var).alias("_sd"),
    )
    dev = (
        base.join(F.broadcast(mom), "_g")
        .groupBy("_g")
        .agg(
            F.max(
                F.round(F.abs(F.col("_v") - F.col("_mean")) * 1e6)
                .cast("bigint")
            ).alias("_maxdev"),
            F.max("_n").alias("_n"),
            F.max("_mean").alias("_mean"),
            F.max("_sd").alias("_sd"),
        )
    )
    ok = (F.col("_n") >= 3) & (F.col("_sd") > 0.0)
    g = F.col("_maxdev").cast("double") / 1e6 / F.col("_sd")
    return dev.select(
        F.col("_g").alias(group_col),
        F.col("_n").alias("n"),
        (F.round(F.col("_mean"), 6) + 0.0).alias("mean"),
        (F.round(F.col("_sd"), 6) + 0.0).alias("sd"),
        (F.round(F.when(ok, g), 6) + 0.0).alias("g_stat"),
    )


def cochran_q(
    df: DataFrame,
    subject_col: str,
    treatment_col: str,
    outcome_col: str,
) -> DataFrame:
    """Cochran's Q test over COMPLETE blocks of BINARY outcomes: do the
    k treatments have equal success rates when every subject is
    measured under all k? The k-treatment generalization of McNemar
    (``agreement.mcnemar``, k = 2) and the binary sibling of
    :func:`friedman_test`: ``Q = (k−1)(k·ΣG_j² − T²) / (k·T − ΣL_i²)``
    with ``G_j`` the per-treatment success totals, ``L_i`` the
    per-subject success totals, ``T = ΣG = ΣL`` (χ²_{k−1} under H0).

    Subjects missing any treatment are excluded (complete-block);
    duplicate (subject, treatment) measurements reduce by MAX (any
    success counts — deterministic). Returns ONE row ``(n_subjects,
    k_treatments, q_stat)``; NULL when < 2 complete subjects, k < 2,
    or a degenerate denominator (all-0/all-1 rows only).

    Determinism: every term is an exact integer aggregate — the
    statistic is a one-shot double ratio of exact integers. Shape: one
    (subject, treatment) aggregate, a per-subject completeness filter,
    one per-treatment and one per-subject aggregate — all keyed,
    map-side-combinable, no windows.
    """
    base = df.select(
        F.col(subject_col).cast("string").alias("_s"),
        F.col(treatment_col).cast("string").alias("_t"),
        F.col(outcome_col).cast("boolean").cast("int").alias("_y"),
    ).filter(
        F.col("_s").isNotNull()
        & F.col("_t").isNotNull()
        & F.col("_y").isNotNull()
    )
    # r14: no standalone distinct-count job — cell is lazily
    # checkpointed (it feeds the completeness filter and the treatment
    # totals) and the treatment count folds in as a broadcast 1-row
    # join condition (distinct _t of cell == distinct _t of base).
    cell = base.groupBy("_s", "_t").agg(F.max("_y").alias("_y")) \
        .localCheckpoint(eager=False)
    kt = cell.select("_t").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("_kall")
    )
    rows = (
        cell.groupBy("_s")
        .agg(
            F.count(F.lit(1)).alias("_nt"),
            F.sum("_y").cast("bigint").alias("_li"),
        )
        .join(F.broadcast(kt), F.col("_nt") == F.col("_kall"))
    )
    complete = rows.select("_s")
    gj = (
        cell.join(complete, "_s")
        .groupBy("_t")
        .agg(F.sum("_y").cast("bigint").alias("_gj"))
    )
    top = gj.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_treatments"),
        F.sum("_gj").cast("bigint").alias("_tt"),
        F.sum(F.col("_gj") * F.col("_gj")).cast("bigint").alias("_g2"),
    )
    bot = rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_subjects"),
        F.sum(F.col("_li") * F.col("_li")).cast("bigint").alias("_l2"),
    )
    j = top.join(bot)
    k = F.col("k_treatments").cast("double")
    t = F.col("_tt").cast("double")
    den = k * t - F.col("_l2").cast("double")
    ok = (
        (F.col("n_subjects") >= 2)
        & (F.col("k_treatments") >= 2)
        & (den > 0.0)
    )
    q = (
        (k - 1.0)
        * (k * F.col("_g2").cast("double") - t * t)
        / den
    )
    return j.select(
        "n_subjects",
        "k_treatments",
        (F.round(F.when(ok, q), 6) + 0.0).alias("q_stat"),
    )


def page_trend(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    treatment_order: list[str],
) -> DataFrame:
    """Page's L trend test over COMPLETE blocks (Page 1963): are the k
    treatments ORDERED as hypothesized (monotone trend), rather than
    merely unequal (:func:`friedman_test`)? ``L = Σ_j j·R_j`` over the
    caller's hypothesized treatment order, with ``R_j`` the rank sum of
    treatment j across blocks; the normal approximation uses
    ``E[L] = n·k(k+1)²/4`` and ``Var[L] = n·k²(k+1)(k²−1)/144``
    (exact under no ties; midranks make z slightly conservative, the
    standard practice).

    Returns ONE row ``(n_blocks, k_treatments, l_stat, z)``; NULL z
    when < 2 complete blocks or k < 3 (trend needs 3 points).
    Treatments outside ``treatment_order`` are ignored.

    Determinism and shape: identical to friedman_test — exact DECIMAL
    cell means, within-block k-row midrank windows, keyed aggregates;
    the ordinal weights join from a broadcast literal table.
    """
    from pyspark.sql import Window as W

    k = len(treatment_order)
    spark = df.sparkSession
    base = df.select(
        F.col(block_col).cast("string").alias("_b"),
        F.col(treatment_col).cast("string").alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(
        F.col("_b").isNotNull()
        & F.col("_t").isin(list(treatment_order))
        & F.col("_v").isNotNull()
    )
    # r14: no standalone n_blocks count() job — cell lazily
    # checkpointed (feeds completeness + ranks), the complete-block
    # count folds in as a broadcast 1-row crossJoin, and the moment
    # formulae move from Python floats to identical column arithmetic
    # (n·k(k+1)²/4 etc. are products of exact small-int doubles — no
    # rounding either way).
    cell = base.groupBy("_b", "_t").agg(
        (
            F.sum(F.col("_v").cast(_DEC)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_m")
    ).localCheckpoint(eager=False)
    complete = (
        cell.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_nt"))
        .filter(F.col("_nt") == k)
        .select("_b")
    )
    cc = cell.join(complete, "_b")
    rk = cc.select(
        "_b", "_t",
        (
            F.rank().over(W.partitionBy("_b").orderBy("_m")).cast("double")
            + (
                F.count(F.lit(1))
                .over(W.partitionBy("_b", "_m"))
                .cast("double")
                - 1.0
            )
            / 2.0
        ).alias("_r"),
    )
    ordw = spark.createDataFrame(
        [(t, i + 1) for i, t in enumerate(treatment_order)],
        "_t string, _j int",
    )
    nb = complete.agg(F.count(F.lit(1)).cast("bigint").alias("_nb"))
    agg = (
        rk.join(F.broadcast(ordw), "_t")
        .agg(
            F.sum(F.col("_j").cast("double") * F.col("_r")).alias("_l")
        )
        .crossJoin(F.broadcast(nb))
    )
    kd = float(k)
    nd = F.col("_nb").cast("double")
    mean_l = nd * kd * (kd + 1.0) ** 2 / 4.0
    var_l = nd * kd * kd * (kd + 1.0) * (kd * kd - 1.0) / 144.0
    z = F.when(
        (F.col("_nb") >= 2) & F.lit(k >= 3) & (var_l > 0.0),
        (F.col("_l") - mean_l) / F.sqrt(var_l),
    )
    return agg.select(
        F.col("_nb").alias("n_blocks"),
        F.lit(k).cast("bigint").alias("k_treatments"),
        (F.round(F.col("_l"), 2) + 0.0).alias("l_stat"),
        (F.round(z, 6) + 0.0).alias("z"),
    )


def _ranged_suffix_min(
    per_v: DataFrame,
    order_col: str,
    weight_col: str,
    out_col: str,
) -> DataFrame:
    """Inclusive SUFFIX minimum of ``weight_col`` in ``order_col``
    order with NO unpartitioned WindowExec — the running-min mirror of
    :func:`_ranged_exclusive_cumsum`: ``repartitionByRange`` ascending
    on the (distinct) order key, per-partition running min from the
    RIGHT (a descending-order window inside each range), an IN-PLAN
    <= num_partitions-row partition-minima fold broadcast back (r14 —
    zero standalone jobs), and ``suffix = least(local_suffix,
    offset)``. Requires ``order_col`` distinct and ``weight_col``
    integer (BIGINT) — quantize doubles first. Powers
    :func:`bh_adjust`'s step-up sweep; min is associative/commutative
    so the fold is exact.
    """
    from pyspark.sql import Window

    spark = per_v.sparkSession
    try:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_parts = 32
    wrun = (
        Window.partitionBy("_pid")
        .orderBy(F.col(order_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = (
        per_v.repartitionByRange(n_parts, F.col(order_col).asc())
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_lmin", F.min(weight_col).over(wrun))
        .localCheckpoint(eager=False)
    )
    # r14: partition-minima fold moved IN-PLAN (the cumsum primitive's
    # change, mirrored): per-pid minima + an EXCLUSIVE running min over
    # descending pid (partition i's offset = min over all LATER
    # partitions; the last partition gets the sentinel) — a bounded
    # <= n_parts-row window, broadcast-joined back. Same exact integers
    # as the driver fold; zero standalone jobs; the LAZY checkpoint is
    # materialized by the broadcast build and keeps the two consumers
    # on one frozen pid assignment (range exchanges are never reused
    # by the planner — see the cumsum primitive).
    sentinel = (1 << 62)
    woff = Window.orderBy(F.col("_pid").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off_df = ranked.groupBy("_pid").agg(
        F.min(weight_col).alias("_m")
    ).select(
        "_pid",
        F.coalesce(F.min("_m").over(woff), F.lit(sentinel))
        .cast("bigint")
        .alias("_soff"),
    )
    return ranked.join(F.broadcast(off_df), "_pid").select(
        order_col,
        weight_col,
        F.least(F.col("_lmin"), F.col("_soff"))
        .cast("bigint")
        .alias(out_col),
    )


def bh_adjust(
    df: DataFrame,
    key_col: str,
    p_col: str,
    out_col: str = "q_value",
) -> DataFrame:
    """Benjamini-Hochberg FDR-adjusted q-values over a table of
    per-hypothesis p-values (Benjamini & Hochberg 1995): ``q_(i) =
    min_{j >= i} (p_(j) · m / j)`` capped at 1 — THE multiplicity
    correction to run before reading thousands of per-segment /
    per-metric test readouts from this battery (Welch, MW, chi²,
    log-rank, ...) as discoveries: at q <= α the expected fraction of
    false discoveries is α.

    Returns ``(key_col, p_value, rank, q_value)`` with ``rank`` the
    1-based position in the (p, key) total order (key breaks p ties —
    tied p's get adjacent ranks and identical q after the suffix-min
    sweep smooths them).

    Determinism and shape — NO global per-row window at any step:
    ranks come from a range-partitioned exclusive count over the
    distinct-p table + a p-partitioned row_number (the
    percent_rank_unique construction); the step-up sweep quantizes
    ``p·m/rank`` to integer nanos and takes a range-partitioned SUFFIX
    MIN (:func:`_ranged_suffix_min` — per-partition running min +
    a partition-minima fold, exact because min is associative). Both
    engines sweep identical integers, so q is hash-exact.
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(p_col).cast("double").alias("_p"),
    ).filter(F.col("_p").isNotNull())
    per_p = base.groupBy("_p").agg(
        F.count(F.lit(1)).cast("bigint").alias("_t")
    )
    # r14: m = Σ_t folds in from the cumsum primitive's OUTPUT (its
    # internal checkpoint — no re-execution of base, no standalone
    # count() job); same exact integer as base.count(), cast to the
    # same double.
    pre = _ranged_exclusive_cumsum(per_p, "_p", "_t", "_off")
    offs = pre.select("_p", "_off")
    mrow = pre.agg(F.sum("_t").cast("bigint").alias("_m"))
    wr = Window.partitionBy("_p").orderBy("_k")
    ranked = (
        base.join(offs, "_p")
        .crossJoin(F.broadcast(mrow))
        .withColumn("_rank", F.col("_off") + F.row_number().over(wr))
        .select(
            "_k", "_p", "_rank",
            F.round(
                F.col("_p") * F.col("_m").cast("double")
                / F.col("_rank").cast("double")
                * 1e9
            )
            .cast("bigint")
            .alias("_cq"),
        )
    ).localCheckpoint(eager=False)
    sw = _ranged_suffix_min(
        ranked.select("_rank", "_cq"), "_rank", "_cq", "_sq"
    )
    return (
        ranked.join(sw.select("_rank", "_sq"), "_rank")
        .select(
            F.col("_k").alias(key_col),
            (F.round(F.col("_p"), 6) + 0.0).alias("p_value"),
            F.col("_rank").cast("bigint").alias("rank"),
            (
                F.round(
                    F.least(F.col("_sq"), F.lit(1_000_000_000)).cast(
                        "double"
                    )
                    / 1e9,
                    6,
                )
                + 0.0
            ).alias(out_col),
        )
    )


def cohens_d(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Standardized mean difference between exactly two groups: Cohen's
    d over the pooled sample SD, plus the small-sample-corrected
    Hedges' g (``g = J·d``, ``J = 1 − 3/(4·df − 1)``, df = n_a+n_b−2)
    — the effect SIZE companion to :func:`welch_t`'s significance
    readout: a t-test on a 100M-row cohort flags differences nobody
    should act on; d says whether the difference is worth anything.

    Groups order lexicographically; positive d = later-sorting group
    higher (the welch_t sign convention). Returns ONE row ``(group_a,
    group_b, n_a, n_b, mean_a, mean_b, d, g)``; d/g NULL when either
    group has < 2 rows or the pooled variance is 0.

    Determinism and shape: identical to welch_t — per-group
    DECIMAL(38,12) moment sums in one keyed map-side-combinable
    aggregate, min/max struct pivot to one row, one-shot doubles.
    """
    base = df.select(
        F.col(group_col).cast("string").alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_g").isNotNull() & F.col("_v").isNotNull())
    per = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(F.col("_v").cast(_DEC)).alias("_s"),
        F.sum(
            (F.col("_v").cast(_DEC) * F.col("_v").cast(_DEC)).cast(_DEC)
        ).alias("_q"),
    )
    wide = per.agg(
        F.count(F.lit(1)).alias("_k"),
        F.min(F.struct("_g", "_n", "_s", "_q")).alias("_a"),
        F.max(F.struct("_g", "_n", "_s", "_q")).alias("_b"),
    ).filter(F.col("_k") == 2)

    def moments(side):
        n = F.col(f"_{side}._n")
        s = F.col(f"_{side}._s").cast("double")
        q = F.col(f"_{side}._q").cast("double")
        mean = s / n.cast("double")
        ss = q - s * s / n.cast("double")  # centered sum of squares
        return n, mean, ss

    na, ma, ssa = moments("a")
    nb, mb, ssb = moments("b")
    dof = (na + nb - 2).cast("double")
    pooled_var = (ssa + ssb) / dof
    ok = (na > 1) & (nb > 1) & (pooled_var > 0.0)
    d = (mb - ma) / F.sqrt(pooled_var)
    j = F.lit(1.0) - F.lit(3.0) / (4.0 * dof - 1.0)
    return wide.select(
        F.col("_a._g").alias("group_a"),
        F.col("_b._g").alias("group_b"),
        na.alias("n_a"),
        nb.alias("n_b"),
        (F.round(ma, 6) + 0.0).alias("mean_a"),
        (F.round(mb, 6) + 0.0).alias("mean_b"),
        (F.round(F.when(ok, d), 6) + 0.0).alias("d"),
        (F.round(F.when(ok, d * j), 6) + 0.0).alias("g"),
    )


def concordance_bounded(
    durations: DataFrame,
    time_col: str,
    event_col: str,
    score_col: str,
) -> DataFrame:
    """EXACT Harrell's concordance index over a pre-bounded subject
    slice: among comparable pairs (i fails before j is last seen:
    ``t_i < t_j`` and ``d_i = 1``), the fraction where the risk score
    ranks them correctly (``score_i > score_j``; score ties count ½) —
    THE discrimination metric for a fitted :func:`cox_ph` risk score
    (C = 0.5 random, 1.0 perfect).

    SCALE CONTRACT: all-pairs is quadratic BY DESIGN — the caller
    passes an absolutely bounded slice (the gate uses ``_u < 400``,
    ≤400 subjects at ANY scale factor), exactly the bounded-subgraph
    pattern of silhouette_bounded / q_graph_transitivity_exact. The
    operational full-corpus discrimination readout is
    ``binary_auc`` on a horizon label; this is the censoring-aware
    exact twin.

    Returns ONE row ``(n_comparable, n_concordant_x2, c_index)`` —
    concordant pairs are counted in half-units (×2: tie = 1, win = 2)
    so the count is an exact integer and C one rounded division.
    """
    a = durations.select(
        F.col(time_col).cast("double").alias("_ta"),
        F.col(event_col).cast("int").alias("_da"),
        F.col(score_col).cast("double").alias("_sa"),
    )
    b = durations.select(
        F.col(time_col).cast("double").alias("_tb"),
        F.col(score_col).cast("double").alias("_sb"),
    )
    pairs = a.join(b, F.col("_ta") < F.col("_tb")).filter(
        F.col("_da") == 1
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_comparable"),
        F.sum(
            F.when(F.col("_sa") > F.col("_sb"), 2)
            .when(F.col("_sa") == F.col("_sb"), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_concordant_x2"),
    )
    ok = F.col("n_comparable") > 0
    return agg.select(
        "n_comparable",
        "n_concordant_x2",
        (
            F.round(
                F.when(
                    ok,
                    F.col("n_concordant_x2").cast("double")
                    / (2.0 * F.col("n_comparable").cast("double")),
                ),
                6,
            )
            + 0.0
        ).alias("c_index"),
    )


def benford_screen(
    df: DataFrame, value_col: str
) -> DataFrame:
    """Benford's-law first-digit screen (Benford 1938; Nigrini's fraud
    audit): compare the leading-digit distribution of a positive
    numeric column against ``P(d) = log10(1 + 1/d)`` — the standard
    "does this column look organically generated?" data-quality check
    for amounts, counts, and durations (fabricated or truncated data
    rarely matches).

    Returns 9 rows ``(digit, n, obs_share, benford_p, chi2_term)``
    ascending by digit — ``Σ chi2_term`` is the χ²₈ statistic (the
    caller's one-liner); zero/negative/NULL values are excluded.

    Determinism: digit extraction is string-based (first char of the
    non-scientific decimal rendering with sign/zeros/dot stripped —
    engine-portable, no log10 edge cases at powers of ten); shares and
    χ² terms are one-shot doubles over exact counts. Shape: one
    map-side-combinable 9-group aggregate — linear, no shuffle beyond
    9 rows.
    """
    # format_number-free digit grab: cast through DECIMAL(38,12) to
    # guarantee plain (non-scientific) rendering on both engines, strip
    # leading zeros/dot, take the first char
    s = F.regexp_replace(
        F.abs(F.col(value_col).cast("decimal(38,12)")).cast("string"),
        r"^[0.]*",
        "",
    )
    digit = F.substring(s, 1, 1).cast("int")
    base = df.filter(
        F.col(value_col).isNotNull()
        & (F.col(value_col).cast("double") > 0.0)
    ).select(digit.alias("_d"))
    per = base.filter(F.col("_d").between(1, 9)).groupBy("_d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = per.agg(F.sum("n").cast("bigint").alias("_n"))
    nn = F.col("_n").cast("double")
    p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("_d").cast("double"))
    obs = F.col("n").cast("double") / nn
    chi2 = nn * (obs - p) * (obs - p) / p
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("_d").cast("bigint").alias("digit"),
            "n",
            (F.round(obs, 6) + 0.0).alias("obs_share"),
            (F.round(p, 6) + 0.0).alias("benford_p"),
            (F.round(chi2, 6) + 0.0).alias("chi2_term"),
        )
        .orderBy("digit")
    )


def jonckheere_terpstra(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_order: list[str],
) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED alternative across k
    INDEPENDENT groups (Jonckheere 1954): are the group locations
    monotone along the caller's hypothesized order — the independent-
    groups counterpart of :func:`page_trend` (blocked) and the trend-
    aware upgrade of :func:`kruskal_wallis` (which only asks
    "different?"). ``J = Σ_{a<b} U_ab`` over ordered group pairs, ties
    counting ½; the normal approximation uses the tie-corrected
    variance (Hollander & Wolfe).

    Returns ONE row ``(n, k_groups, j_stat, z)``; z NULL when k < 3,
    n < 2, or zero variance. Groups outside ``group_order`` are
    ignored.

    Determinism and scale shape — NO pairwise data join: aggregate per
    DISTINCT value into k per-group count columns (one corpus-keyed
    shuffle), run ONE range-partitioned exclusive-prefix pass over the
    distinct-value table with all k columns as parallel weights
    (``_ranged_exclusive_cumsum``), and reduce ``Σ_v Σ_{a<b}
    c_b(v)·(2·C_a(<v) + c_a(v))`` in exact half-units — J in ×2 units
    is an exact integer however the data partitions. Tie/group-size
    correction terms are exact integer aggregates. k is bounded small
    (it is the caller's hypothesis list).
    """
    k = len(group_order)
    if k < 2:
        raise ValueError("jonckheere_terpstra: need >= 2 ordered groups")
    base = df.select(
        F.col(group_col).cast("string").alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_g").isin(list(group_order)) & F.col("_v").isNotNull())
    aggs = [
        F.sum(F.when(F.col("_g") == g, 1).otherwise(0))
        .cast("bigint")
        .alias(f"_c{i}")
        for i, g in enumerate(group_order)
    ]
    per_v = base.groupBy("_v").agg(*aggs)
    cnames = [f"_c{i}" for i in range(k)]
    pre = _ranged_exclusive_cumsum(
        per_v, "_v", cnames, [f"_p{i}" for i in range(k)]
    )
    # J in x2 half-units: for each ordered pair a<b and distinct value
    # v, c_b(v) beats the 2*C_a(<v) below it and half-ties the c_a(v)
    # at it
    j2 = F.lit(0).cast("decimal(38,0)")
    for a in range(k):
        for b in range(a + 1, k):
            j2 = j2 + F.col(f"_c{b}").cast("decimal(38,0)") * (
                2 * F.col(f"_p{a}") + F.col(f"_c{a}")
            ).cast("decimal(38,0)")
    tie_t = F.lit(0).cast("bigint")
    for i in range(k):
        tie_t = tie_t + F.col(f"_c{i}")
    # cubic/quadratic tie terms accumulate in decimal(38,0): a single
    # value shared by ~1.66M+ rows makes t*(t-1)*(2t+5) exceed 2^63,
    # which BIGINT wraps silently in non-ANSI Spark while the DuckDB
    # oracle (HUGEINT) stays exact — the calinski_harabasz/jarque_bera
    # overflow class (ADVICE r11)
    tie_d = tie_t.cast("decimal(38,0)")
    red = pre.agg(
        F.sum(j2.cast("decimal(38,0)")).cast("decimal(38,0)")
        .alias("_j2"),
        F.sum(tie_t).cast("bigint").alias("_n"),
        *[F.sum(F.col(c)).cast("bigint").alias(f"_n{i}")
          for i, c in enumerate(cnames)],
        F.sum(tie_d * (tie_d - 1) * (2 * tie_d + 5))
        .cast("decimal(38,0)").alias("_t1"),
        F.sum(tie_d * (tie_d - 1) * (tie_d - 2))
        .cast("decimal(38,0)").alias("_t2"),
        F.sum(tie_d * (tie_d - 1)).cast("decimal(38,0)").alias("_t3"),
    ).collect()[0]
    n = int(red["_n"] or 0)
    ngs = [int(red[f"_n{i}"] or 0) for i in range(k)]
    j2 = int(red["_j2"] or 0)
    # exact integer components; EVERY double expression (j, mean, var,
    # z) is evaluated by Spark from integer literals and rounded with
    # F.round (HALF_UP — the repo/oracle convention; Python round() is
    # banker's, the pacf ADVICE-r10 trap). Integer literals go through
    # _xlit: Python ints are arbitrary-precision, but F.lit overflows
    # past 2^63 — cubic terms in n ride a Decimal literal instead
    # (exact int → double cast is identical in both engines).
    from decimal import Decimal

    def _xlit(v: int):
        if -(2 ** 63) <= v < 2 ** 63:
            return F.lit(v)
        return F.lit(Decimal(v))

    g1 = sum(g * (g - 1) * (2 * g + 5) for g in ngs)
    g2i = sum(g * (g - 1) * (g - 2) for g in ngs)
    g3 = sum(g * (g - 1) for g in ngs)
    sumsq = sum(g * g for g in ngs)
    t1, t2, t3 = (
        int(red["_t1"] or 0), int(red["_t2"] or 0), int(red["_t3"] or 0)
    )
    spark = df.sparkSession
    jd = _xlit(j2).cast("double") / 2.0
    if n < 3 or k < 3:
        return spark.range(1).select(
            F.lit(n).cast("bigint").alias("n"),
            F.lit(k).cast("bigint").alias("k_groups"),
            (F.round(jd, 2) + 0.0).alias("j_stat"),
            F.lit(None).cast("double").alias("z"),
        )
    mean_j = _xlit(n * n - sumsq).cast("double") / 4.0
    var_j = (
        _xlit(n * (n - 1) * (2 * n + 5) - g1 - t1).cast("double") / 72.0
        + _xlit(g2i).cast("double")
        * _xlit(t2).cast("double")
        / F.lit(36.0 * n * (n - 1) * (n - 2))
        + _xlit(g3).cast("double")
        * _xlit(t3).cast("double")
        / F.lit(8.0 * n * (n - 1))
    )
    z = F.when(var_j > 0.0, (jd - mean_j) / F.sqrt(var_j))
    return spark.range(1).select(
        F.lit(n).cast("bigint").alias("n"),
        F.lit(k).cast("bigint").alias("k_groups"),
        (F.round(jd, 2) + 0.0).alias("j_stat"),
        (F.round(z, 6) + 0.0).alias("z"),
    )


def brunner_munzel(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Brunner-Munzel generalized Wilcoxon test (Brunner & Munzel
    2000): tests ``P(A < B) + ½P(A = B) = ½`` WITHOUT the
    equal-variance/shape assumption Mann-Whitney needs for a location
    reading — the rank-test analog of Welch's t, and the correct
    default when the two groups' dispersions differ (where
    :func:`mann_whitney` conflates location with scale). Returns ONE
    row ``(n_a, n_b, p_hat, w, df_welch)``: the stochastic-superiority
    estimate ``p̂ = P(A < B) + ½P(A = B)``, the studentized statistic
    W (compare to t with Welch-like df), and that df.

    Distributed shape — the :func:`mann_whitney` recipe extended with
    WITHIN-group midranks at zero extra passes: per DISTINCT value the
    combined midrank is ``off + (t+1)/2`` and the within-a midrank is
    ``offa + (ta+1)/2``, both from the SAME range-partitioned
    exclusive-prefix pass (``_t``/``_ta`` as parallel weights), so the
    per-value rank differences are pure integers in ×2 half-units:
    ``2(R−R_a) = 2(off−offa) + (t−ta)`` and ``2(R−R_b) = 2·offa +
    ta``. Their weighted first/second moments accumulate in
    DECIMAL(38,0) (the jonckheere overflow lesson applied at birth);
    every output is a one-shot double over those exact integers,
    mirrored token-for-token.
    """
    base = df.filter(
        F.col(group_col).isin([group_a, group_b])
        & F.col(value_col).isNotNull()
    ).select(
        (F.col(group_col) == F.lit(group_a)).alias("_isa"),
        F.col(value_col).cast("double").alias("_v"),
    )
    per_v = base.groupBy("_v").agg(
        F.count(F.lit(1)).cast("bigint").alias("_t"),
        F.sum(F.when(F.col("_isa"), 1).otherwise(0))
        .cast("bigint")
        .alias("_ta"),
    )
    pre = _ranged_exclusive_cumsum(
        per_v, "_v", ["_t", "_ta"], ["_off", "_offa"]
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tb = F.col("_t") - F.col("_ta")
    r2c = 2 * F.col("_off") + F.col("_t") + 1  # 2 x combined midrank
    da2 = 2 * (F.col("_off") - F.col("_offa")) + tb  # 2(R - R_a)
    db2 = 2 * F.col("_offa") + F.col("_ta")  # 2(R - R_b)
    agg = pre.agg(
        F.sum("_ta").cast("bigint").alias("n_a"),
        F.sum(tb).cast("bigint").alias("n_b"),
        F.sum(dec(F.col("_ta")) * dec(r2c)).cast("decimal(38,0)")
        .alias("_ra2"),
        F.sum(dec(tb) * dec(r2c)).cast("decimal(38,0)").alias("_rb2"),
        F.sum(dec(F.col("_ta")) * dec(da2)).cast("decimal(38,0)")
        .alias("_sa1"),
        F.sum(dec(F.col("_ta")) * dec(da2) * dec(da2))
        .cast("decimal(38,0)")
        .alias("_sa2"),
        F.sum(dec(tb) * dec(db2)).cast("decimal(38,0)").alias("_sb1"),
        F.sum(dec(tb) * dec(db2) * dec(db2))
        .cast("decimal(38,0)")
        .alias("_sb2"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ra_bar = F.col("_ra2").cast("double") / 2.0 / na
    rb_bar = F.col("_rb2").cast("double") / 2.0 / nb
    da_bar = F.col("_sa1").cast("double") / 2.0 / na
    db_bar = F.col("_sb1").cast("double") / 2.0 / nb
    sa2 = (
        F.col("_sa2").cast("double") / 4.0 - na * da_bar * da_bar
    ) / (na - 1.0)
    sb2 = (
        F.col("_sb2").cast("double") / 4.0 - nb * db_bar * db_bar
    ) / (nb - 1.0)
    vtot = na * sa2 + nb * sb2
    w = F.when(
        (F.col("n_a") > 1) & (F.col("n_b") > 1) & (vtot > 0.0),
        na * nb * (rb_bar - ra_bar) / ((na + nb) * F.sqrt(vtot)),
    )
    dfw = F.when(
        (F.col("n_a") > 1) & (F.col("n_b") > 1) & (vtot > 0.0),
        vtot * vtot
        / (
            (na * sa2) * (na * sa2) / (na - 1.0)
            + (nb * sb2) * (nb * sb2) / (nb - 1.0)
        ),
    )
    p_hat = F.when(
        F.col("n_a") > 0, (rb_bar - (nb + 1.0) / 2.0) / na
    )
    return agg.select(
        "n_a",
        "n_b",
        (F.round(p_hat, 6) + 0.0).alias("p_hat"),
        (F.round(w, 6) + 0.0).alias("w"),
        (F.round(dfw, 6) + 0.0).alias("df_welch"),
    )


def quade_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    treatment_order: list[str],
) -> DataFrame:
    """Quade test over COMPLETE blocks (Quade 1979): the Friedman
    family member that WEIGHTS each block by the rank of its RANGE, so
    blocks where treatments actually differ dominate — markedly more
    powerful than :func:`friedman_test` at small k (Conover 1999
    recommends it for k ≤ 4; Friedman wins as k grows). ``S_ij =
    Q_i·(r_ij − (k+1)/2)`` with ``r_ij`` within-block midranks and
    ``Q_i`` the across-blocks midrank of block i's range; ``F = (n−1)B
    / (A − B)`` with ``A = Σ S_ij²``, ``B = (1/n)·Σ_j S_j²`` on
    ``(k−1, (n−1)(k−1))`` df.

    Returns ONE row ``(n_blocks, k_treatments, f_stat, df1, df2)``;
    f_stat NULL when < 2 complete blocks or A = B (all-agree
    degenerate).

    Determinism and shape: exact DECIMAL cell means (friedman/page
    recipe); within-block midranks are k-row windows; the block-range
    midranks come from ONE range-partitioned exclusive-prefix pass
    over the distinct-range table (blocks are corpus-sized — no global
    window); S_ij lives in exact ×4 quarter-units so A and B
    accumulate as DECIMAL(38,0) integers and F is one mirrored double
    ``(n−1)·ΣS_j² / (n·ΣS_ij² − ΣS_j²)``.
    """
    from pyspark.sql import Window as W

    k = len(treatment_order)
    if k < 2:
        raise ValueError("quade_test: need >= 2 treatments")
    base = df.select(
        F.col(block_col).cast("string").alias("_b"),
        F.col(treatment_col).cast("string").alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(
        F.col("_b").isNotNull()
        & F.col("_t").isin(list(treatment_order))
        & F.col("_v").isNotNull()
    )
    # r14: cell and cc lazily checkpointed — cc feeds BOTH the midrank
    # pass and the block-range pass (previously the whole cell⋈complete
    # subtree executed once per consumer), and the complete-block count
    # folds in as a broadcast 1-row crossJoin instead of a standalone
    # count() job.
    cell = base.groupBy("_b", "_t").agg(
        (
            F.sum(F.col("_v").cast(_DEC)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_m")
    ).localCheckpoint(eager=False)
    complete = (
        cell.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_nt"))
        .filter(F.col("_nt") == k)
        .select("_b")
    )
    cc = cell.join(complete, "_b").localCheckpoint(eager=False)
    # within-block midranks in x2 half-units: 2*rank + ties - 1
    rk = cc.select(
        "_b",
        "_t",
        "_m",
        (
            2 * F.rank().over(W.partitionBy("_b").orderBy("_m"))
            + F.count(F.lit(1)).over(W.partitionBy("_b", "_m"))
            - 1
        ).cast("bigint").alias("_r2"),
    )
    rng = cc.groupBy("_b").agg(
        (F.max("_m") - F.min("_m")).alias("_rng")
    )
    per_r = rng.groupBy("_rng").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    qoff = _ranged_exclusive_cumsum(per_r, "_rng", "_c", "_qoff")
    qrk = rng.join(qoff, "_rng").select(
        "_b",
        (2 * F.col("_qoff") + F.col("_c") + 1)
        .cast("bigint")
        .alias("_q2"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s4 = dec(F.col("_q2")) * dec(F.col("_r2") - F.lit(k + 1))
    scored = rk.join(qrk, "_b").select(
        "_t", s4.cast("decimal(38,0)").alias("_s4")
    )
    # r14: A = Σ S_ij² rides the per-treatment pass (DECIMAL(38,0)
    # partial-then-total regrouping of exact integers — cannot round),
    # so ONE grouped aggregate replaces the two scored-subtree
    # consumers; n_blocks folds in as a broadcast 1-row crossJoin.
    nb = complete.agg(F.count(F.lit(1)).cast("bigint").alias("_nb"))
    per_j = scored.groupBy("_t").agg(
        F.sum("_s4").cast("decimal(38,0)").alias("_sj4"),
        F.sum(dec(F.col("_s4")) * dec(F.col("_s4")))
        .cast("decimal(38,0)")
        .alias("_aj16"),
    )
    joined = per_j.agg(
        F.sum(F.col("_aj16")).cast("decimal(38,0)").alias("_a16"),
        F.sum(dec(F.col("_sj4")) * dec(F.col("_sj4")))
        .cast("decimal(38,0)")
        .alias("_b16"),
    ).crossJoin(F.broadcast(nb))
    nd = F.col("_nb").cast("double")
    a16d = F.col("_a16").cast("double")
    b16d = F.col("_b16").cast("double")
    denom = nd * a16d - b16d
    f_stat = F.when(
        (F.col("_nb") >= 2) & (denom > 0.0),
        (nd - 1.0) * b16d / denom,
    )
    return joined.select(
        F.col("_nb").alias("n_blocks"),
        F.lit(k).cast("bigint").alias("k_treatments"),
        (F.round(f_stat, 6) + 0.0).alias("f_stat"),
        F.lit(k - 1).cast("bigint").alias("df1"),
        ((F.col("_nb") - 1) * F.lit(k - 1)).cast("bigint").alias("df2"),
    )


def _two_sample_rank_score_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    score2_fn,
    stat_name: str,
) -> DataFrame:
    """Shared engine for two-sample LINEAR RANK SCORE tests (Hájek):
    ``T = Σ_{i∈A} g(R_i)`` with midranks, judged against the exact
    conditional permutation moments ``E[T] = n_a·ḡ`` and ``Var[T] =
    n_a·n_b·Σ(g_i−ḡ)² / (N(N−1))`` — the construction behind
    Ansari-Bradley, Mood, and every other scores test; Wilcoxon is
    ``g(R) = R`` (kept separate in :func:`mann_whitney` for its
    U/Cliff's-delta outputs). ``score2_fn(r2, n)`` must return the
    score in EXACT ×2 half-units from the ×2 midrank column ``r2``
    (itself integer: ``2·off + t + 1``) — integer scores make every
    moment an exact DECIMAL aggregate, so z is one mirrored double.

    Shape: per-distinct-value group counts (the only corpus-sized
    shuffle) → ONE range-partitioned exclusive-prefix pass → 1-row
    reduction. Ties need no correction term: midrank scores feed the
    permutation variance directly (Hollander & Wolfe's conditional
    treatment).
    """
    base = df.filter(
        F.col(group_col).isin([group_a, group_b])
        & F.col(value_col).isNotNull()
    ).select(
        (F.col(group_col) == F.lit(group_a)).alias("_isa"),
        F.col(value_col).cast("double").alias("_v"),
    )
    per_v = base.groupBy("_v").agg(
        F.count(F.lit(1)).cast("bigint").alias("_t"),
        F.sum(F.when(F.col("_isa"), 1).otherwise(0))
        .cast("bigint")
        .alias("_ta"),
    )
    tots: dict = {}
    pre = _ranged_exclusive_cumsum(
        per_v, "_v", ["_t", "_ta"], ["_off", "_offa"], totals_out=tots
    )
    n_total = int(tots["_t"])
    r2 = 2 * F.col("_off") + F.col("_t") + 1
    g2 = score2_fn(r2, n_total)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = pre.agg(
        F.sum("_ta").cast("bigint").alias("n_a"),
        F.sum(F.col("_t") - F.col("_ta")).cast("bigint").alias("n_b"),
        F.sum(dec(F.col("_ta")) * dec(g2)).cast("decimal(38,0)")
        .alias("_t2"),
        F.sum(dec(F.col("_t")) * dec(g2)).cast("decimal(38,0)")
        .alias("_g1"),
        F.sum(dec(F.col("_t")) * dec(g2) * dec(g2))
        .cast("decimal(38,0)")
        .alias("_g2s"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nn = na + nb
    t_stat = F.col("_t2").cast("double") / 2.0
    e_stat = na * F.col("_g1").cast("double") / 2.0 / nn
    var_stat = (
        na
        * nb
        * (
            F.col("_g2s").cast("double")
            - F.col("_g1").cast("double")
            * F.col("_g1").cast("double")
            / nn
        )
        / (4.0 * nn * (nn - 1.0))
    )
    z = F.when(var_stat > 0.0, (t_stat - e_stat) / F.sqrt(var_stat))
    return agg.select(
        "n_a",
        "n_b",
        (F.round(t_stat, 2) + 0.0).alias(stat_name),
        (F.round(z, 6) + 0.0).alias("z"),
    )


def ansari_bradley(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Ansari-Bradley two-sample SCALE test (Ansari & Bradley 1960):
    score each observation by its distance from the rank extremes,
    ``g(R) = min(R, N+1−R)`` — small scores at both tails, large in
    the middle — and test whether group A's scores sum higher
    (A more concentrated) or lower (A more dispersed) than chance.
    The rank-based "do the groups differ in SPREAD?" companion to
    :func:`mann_whitney`'s location question and
    :func:`brunner_munzel`'s stochastic-superiority question —
    location tests read identical when only the variance moved; this
    is the screen that catches it. Assumes roughly equal medians (the
    textbook caveat; pair with :func:`mood_test` which shares it).

    Returns ONE row ``(n_a, n_b, ab_stat, z)`` with z from the exact
    conditional permutation moments (midrank-tie treatment). Shape:
    the shared rank-score engine — one corpus-keyed distinct-value
    aggregate + one ranged prefix pass.
    """
    return _two_sample_rank_score_test(
        df, group_col, value_col, group_a, group_b,
        lambda r2, n: F.least(r2, F.lit(2 * (n + 1)) - r2),
        "ab_stat",
    )


def mood_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Mood two-sample SCALE test (Mood 1954): scores are squared
    deviations from the central rank, ``g(R) = (R − (N+1)/2)²`` —
    large in the tails — so a HIGH group-A sum means A is more
    dispersed (note the opposite polarity to :func:`ansari_bradley`,
    whose scores peak in the middle; the pair agreeing is the robust
    scale readout). Same exact conditional permutation moments, same
    one-ranged-pass shape via the shared rank-score engine.

    Returns ONE row ``(n_a, n_b, mood_stat, z)``. ``mood_stat`` is
    reported in the natural (R−(N+1)/2)² units; with midranks the
    per-value score is a multiple of ¼, carried exactly (the engine's
    ×2 contract squares to ×4; the extra factor folds into the
    statistic scale, and z is scale-invariant).
    """
    # g(R) = (R-(N+1)/2)^2 = (r2 - (N+1))^2 / 4; in the engine's x2
    # half-units: g2 = 2*g = (r2-(N+1))^2 / 2 — NOT integer when
    # r2-(N+1) is odd, so pass 2*(r2-(N+1))^2 (x4 units) and divide
    # the reported statistic by 4 afterwards? Simpler: report T in
    # g2 = (r2-(N+1))^2 units (x4 the natural score): z is invariant
    # to the scale factor, and ab_stat-style outputs document units.
    out = _two_sample_rank_score_test(
        df, group_col, value_col, group_a, group_b,
        lambda r2, n: (r2 - F.lit(n + 1)) * (r2 - F.lit(n + 1)),
        "_m4",
    )
    # _m4 is T in x4 quarter-units x the engine's /2 half-unit fold:
    # engine reports sum(g2)/2 where g2 = (r2-(N+1))^2 = 4g, so _m4 =
    # 2*T_natural; halve for the textbook statistic
    return out.select(
        "n_a",
        "n_b",
        (F.round(F.col("_m4") / 2.0, 2) + 0.0).alias("mood_stat"),
        "z",
    )


def bartlett_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Bartlett's test of equal variances across k groups (Bartlett
    1937): ``T = [(N−k)·ln(S_p²) − Σ(n_i−1)·ln(S_i²)] / C`` with the
    usual correction ``C = 1 + (Σ1/(n_i−1) − 1/(N−k)) / (3(k−1))``,
    chi-square on k−1 df under normality — the PARAMETRIC
    equal-variance gate (most powerful when normality holds; the
    repo's :func:`levene_test` is the robust fallback, and
    :func:`ansari_bradley`/:func:`mood_test` the rank pair). Groups
    with < 2 values are dropped (their variance is undefined).

    Returns ONE row ``(k_groups, n, t_stat, df)``; t NULL when k < 2
    or any kept group has zero variance (ln undefined — report NULL
    loudly rather than a clamped fiction).

    Determinism: per-group moments accumulate as micro-quantized
    integers in DECIMAL(38,0) (the welch_t recipe), so every S_i² is
    an identical double in both engines; each ``(n_i−1)·ln(S_i²)``
    term quantizes to integer nanos before the k-row sum (cross-row
    double-sum rule). Shape: one group-keyed moment aggregate + one
    k-row reduction.
    """
    base = df.select(
        F.col(group_col).cast("string").alias("_g"),
        F.round(F.col(value_col).cast("double") * 1e6)
        .cast("bigint")
        .alias("_vq"),
    ).filter(F.col("_g").isNotNull() & F.col("_vq").isNotNull())
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per_g = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(dec(F.col("_vq"))).cast("decimal(38,0)").alias("_s1"),
        F.sum(dec(F.col("_vq")) * dec(F.col("_vq")))
        .cast("decimal(38,0)")
        .alias("_s2"),
    ).filter(F.col("_n") >= 2)
    nd = F.col("_n").cast("double")
    # unbiased per-group variance in natural units (micro-quant /1e12)
    s2 = (
        (
            F.col("_s2").cast("double")
            - F.col("_s1").cast("double")
            * F.col("_s1").cast("double")
            / nd
        )
        / (nd - 1.0)
        / 1e12
    )
    # per-group one-shot double terms, nano-quantized BEFORE the k-row
    # sums (cross-row double-sum rule): the (n-1)ln(S^2) pieces, the
    # 1/(n-1) correction pieces, and the within-group SS pieces
    # (s2 - s1^2/n in natural units)
    ssw_g = (
        F.col("_s2").cast("double")
        - F.col("_s1").cast("double")
        * F.col("_s1").cast("double")
        / nd
    ) / 1e12
    terms = per_g.select(
        "_n",
        s2.alias("_var"),
        F.round((nd - 1.0) * F.log(s2) * 1e9).cast("bigint").alias(
            "_lnq"
        ),
        F.round(1.0 / (nd - 1.0) * 1e12).cast("bigint").alias("_invq"),
        # the SS piece rides DECIMAL(38,0): nano-quantized within-group
        # SS of a wide-range metric exceeds 2^63 (measured 1.8e22 on
        # lineitem prices at sf0.01)
        F.round(ssw_g * 1e9).cast("decimal(38,0)").alias("_sswq"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
        F.sum("_n").cast("bigint").alias("n"),
        F.sum(dec(F.col("_sswq"))).cast("decimal(38,0)").alias("_ssw"),
        F.sum("_lnq").cast("bigint").alias("_lnsum"),
        F.sum("_invq").cast("bigint").alias("_invsum"),
        F.sum((F.col("_var") <= 0.0).cast("int")).cast("bigint")
        .alias("_degenerate"),
    )
    kd = F.col("k_groups").cast("double")
    ndt = F.col("n").cast("double")
    sp2 = F.col("_ssw").cast("double") / 1e9 / (ndt - kd)
    c_corr = 1.0 + (
        F.col("_invsum").cast("double") / 1e12 - 1.0 / (ndt - kd)
    ) / (3.0 * (kd - 1.0))
    t_stat = (
        (ndt - kd) * F.log(sp2)
        - F.col("_lnsum").cast("double") / 1e9
    ) / c_corr
    ok = (
        (F.col("k_groups") >= 2)
        & (F.col("_degenerate") == 0)
        & (sp2 > 0.0)
    )
    return agg.select(
        "k_groups",
        "n",
        (F.round(F.when(ok, t_stat), 6) + 0.0).alias("t_stat"),
        (F.col("k_groups") - 1).cast("bigint").alias("df"),
    )
