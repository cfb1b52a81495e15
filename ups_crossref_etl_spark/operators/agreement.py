"""Inter-rater agreement: Cohen's kappa over two labeling columns.

A training-data pipeline that mixes labelers — two heuristic quality
gates, a model judge vs. a rule, an old vs. new classifier version —
needs to know whether they AGREE beyond chance before either label is
trusted as ground truth. Raw percent agreement is inflated whenever the
label distribution is skewed (two raters that both say "keep" 95% of
the time agree 90.25% by luck alone); Cohen's kappa (Cohen 1960)
subtracts exactly that chance floor: ``kappa = (po - pe) / (1 - pe)``
with ``po`` the observed agreement and ``pe`` the agreement expected
from the two raters' marginal label distributions.

Reference parity note: no counterpart in /root/reference — labeling-
audit extension surface, same family as operators/evaluation.py.

Scale shape: one groupBy over the (label_a, label_b) confusion cell —
cardinality = |labels|², tiny regardless of corpus size — then
label-keyed marginal aggregates over that cell table. The corpus is
scanned once; everything after the first aggregate is
confusion-matrix-sized. Every count is an exact BIGINT; ``po``, ``pe``
and ``kappa`` are one-shot double expressions over those integers, so
the result is bit-reproducible and gateable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cohens_kappa",
    "mcnemar",
    "fleiss_kappa",
    "krippendorff_alpha_nominal",
]


def cohens_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's kappa between two label columns on the same rows.

    Rows where either label is NULL are excluded (an unrated item says
    nothing about agreement). Returns ONE row:
    ``(n, n_categories, agree, po, pe, kappa)`` — counts exact BIGINT,
    ratios rounded to 6 dp. Degenerate case ``pe = 1`` (both raters
    constant and equal) reports ``kappa = 1.0`` when ``po = 1`` else
    ``0.0``; the standard convention for a chance-saturated table.

    Multi-class by construction: categories are the union of distinct
    labels either rater used; ``pe`` only receives mass from labels
    BOTH raters used (the inner marginal join — a label one rater never
    emits has zero chance-agreement mass, as in the textbook formula).
    """
    pairs = df.select(
        F.col(a_col).cast("string").alias("_a"),
        F.col(b_col).cast("string").alias("_b"),
    ).filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
    # the confusion-cell table is |labels|^2-sized and fans out into four
    # downstream aggregates — checkpoint it so the corpus scans once
    cells = (
        pairs.groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint()
    )
    tot = cells.agg(
        F.sum("_c").cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("_a") == F.col("_b"), F.col("_c")).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("agree"),
    )
    ma = cells.groupBy("_a").agg(F.sum("_c").alias("_ma"))
    mb = cells.groupBy("_b").agg(F.sum("_c").alias("_mb"))
    # chance mass: sum over labels both raters used of marg_a * marg_b
    pe_num = (
        ma.join(mb, ma["_a"] == mb["_b"])
        .agg(
            F.coalesce(F.sum(F.col("_ma") * F.col("_mb")), F.lit(0))
            .cast("bigint")
            .alias("pe_num")
        )
    )
    ncat = (
        cells.select(F.col("_a").alias("_l"))
        .union(cells.select(F.col("_b").alias("_l")))
        .agg(F.countDistinct("_l").cast("bigint").alias("n_categories"))
    )
    n = F.col("n").cast("double")
    po = F.col("agree") / n
    pe = F.col("pe_num") / (n * n)
    kappa = F.when(
        pe >= 1.0, F.when(po >= 1.0, F.lit(1.0)).otherwise(F.lit(0.0))
    ).otherwise((po - pe) / (F.lit(1.0) - pe))
    return (
        tot.crossJoin(pe_num)
        .crossJoin(ncat)
        .select(
            "n",
            "n_categories",
            "agree",
            (F.round(po, 6) + 0.0).alias("po"),
            (F.round(pe, 6) + 0.0).alias("pe"),
            (F.round(kappa, 6) + 0.0).alias("kappa"),
        )
    )


def mcnemar(
    df: DataFrame, a_col: str, b_col: str, positive: str
) -> DataFrame:
    """McNemar's test for paired binary raters (McNemar 1947): given
    two labelers on the SAME rows, is the disagreement symmetric, or
    is one systematically stricter? :func:`cohens_kappa` says how much
    they agree; this says which way they disagree — the statistic is
    computed only from the discordant cells ``b`` (A positive, B not)
    and ``c`` (A not, B positive): ``chi2 = (b - c)^2 / (b + c)``
    (without continuity correction — the exact cross-engine form).

    Labels are binarized by equality to ``positive`` (cast to string);
    NULL-labeled rows are excluded. Returns ONE row ``(n, n_pos_a,
    n_pos_b, b_discordant, c_discordant, chi2)``; chi2 NULL when there
    is no disagreement at all (b + c = 0).

    Shape: one corpus scan to four exact BIGINT cells; chi2 is a
    one-shot double.
    """
    pos = F.lit(positive)
    pairs = df.select(
        (F.col(a_col).cast("string") == pos).alias("_pa"),
        (F.col(b_col).cast("string") == pos).alias("_pb"),
    ).filter(F.col("_pa").isNotNull() & F.col("_pb").isNotNull())
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("_pa").cast("long")).cast("bigint").alias("n_pos_a"),
        F.sum(F.col("_pb").cast("long")).cast("bigint").alias("n_pos_b"),
        F.sum((F.col("_pa") & ~F.col("_pb")).cast("long"))
        .cast("bigint")
        .alias("b_discordant"),
        F.sum((~F.col("_pa") & F.col("_pb")).cast("long"))
        .cast("bigint")
        .alias("c_discordant"),
    )
    b, c = F.col("b_discordant"), F.col("c_discordant")
    chi2 = F.when(
        b + c > 0,
        (b - c).cast("double") * (b - c) / (b + c).cast("double"),
    )
    return agg.select(
        "n", "n_pos_a", "n_pos_b", "b_discordant", "c_discordant",
        (F.round(chi2, 6) + 0.0).alias("chi2"),
    )


def fleiss_kappa(
    df: DataFrame,
    unit_col: str,
    value_col: str,
    n_raters: int,
) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971): chance-corrected agreement among a
    FIXED number of raters per unit — the multi-rater generalization of
    :func:`cohens_kappa` (which wants exactly two NAMED raters; Fleiss
    only needs each unit rated ``n_raters`` times by anyone). The
    labeling-pool audit: three quality gates / redundant annotators /
    an ensemble of judges voting per document. Units with a rating
    count ≠ ``n_raters`` are dropped (the complete-blocks convention).

    ``P_i = (Σ_k n_ik² − n)/(n(n−1))`` per unit, ``κ = (P̄ − P_e)/(1 −
    P_e)`` with ``P_e = Σ_k p_k²`` from the pooled category shares.

    Returns ONE row ``(n_units, n_raters, k_categories, p_bar, p_e,
    kappa)``; kappa NULL when P_e = 1 (a single category — agreement
    is undefined, not perfect).

    Determinism: with n fixed, ``Σ_i P_i = (Σ_i Σ_k n_ik² − N·n) /
    (n(n−1))`` is EXACT integer arithmetic (the squared cell counts
    accumulate in DECIMAL(38,0)); P_e's category shares are exact
    count ratios; every output is a one-shot mirrored double. Shape:
    one (unit, value) count aggregate (the only corpus-sized shuffle),
    one unit-keyed reduction, one category-keyed reduction.
    """
    if n_raters < 2:
        raise ValueError("fleiss_kappa: need n_raters >= 2")
    base = df.select(
        F.col(unit_col).cast("string").alias("_u"),
        F.col(value_col).cast("string").alias("_v"),
    ).filter(F.col("_u").isNotNull() & F.col("_v").isNotNull())
    cell = base.groupBy("_u", "_v").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    per_u = cell.groupBy("_u").agg(
        F.sum("_c").cast("bigint").alias("_m"),
        F.sum(
            F.col("_c").cast("decimal(38,0)")
            * F.col("_c").cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("_s2"),
    ).filter(F.col("_m") == n_raters)
    kept = cell.join(per_u.select("_u"), "_u")
    cat = kept.groupBy("_v").agg(
        F.sum("_c").cast("bigint").alias("_nk")
    )
    ua = per_u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum("_s2").cast("decimal(38,0)").alias("_ss2"),
    )
    ca = cat.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_categories"),
        F.sum("_nk").cast("bigint").alias("_ntot"),
        F.sum(
            F.col("_nk").cast("decimal(38,0)")
            * F.col("_nk").cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("_nk2"),
    )
    j = ua.crossJoin(F.broadcast(ca))
    nu = F.col("n_units").cast("double")
    nr = F.lit(float(n_raters))
    p_bar = (
        F.col("_ss2").cast("double") - nu * nr
    ) / (nu * nr * (nr - 1.0))
    p_e = F.col("_nk2").cast("double") / (
        F.col("_ntot").cast("double") * F.col("_ntot").cast("double")
    )
    kappa = F.when(p_e < 1.0, (p_bar - p_e) / (1.0 - p_e))
    return j.select(
        "n_units",
        F.lit(n_raters).cast("bigint").alias("n_raters"),
        "k_categories",
        (F.round(p_bar, 6) + 0.0).alias("p_bar"),
        (F.round(p_e, 6) + 0.0).alias("p_e"),
        (F.round(kappa, 6) + 0.0).alias("kappa"),
    )


def krippendorff_alpha_nominal(
    df: DataFrame,
    unit_col: str,
    value_col: str,
) -> DataFrame:
    """Krippendorff's alpha for NOMINAL data (Krippendorff 2004): the
    agreement coefficient that tolerates MISSING ratings — any number
    of raters per unit, units with a single rating simply drop — which
    is the real shape of pooled human/model labeling efforts (Fleiss
    wants a fixed panel; Cohen wants two named raters). ``α = 1 −
    D_o/D_e`` over the coincidence construction: within a unit with
    ``m_u ≥ 2`` ratings every ordered pair coincides with weight
    ``1/(m_u−1)``, so the observed disagreement mass is ``Σ_u (m_u² −
    Σ_c n_uc²)/(m_u−1)`` and the expected mass is ``(n² − Σ_c n_c²)
    /(n−1)`` from the pooled totals.

    Returns ONE row ``(n_units, n_values, k_categories, alpha)``;
    alpha NULL when D_e = 0 (one category overall).

    Determinism: cell counts are exact ints; each unit's disagreement
    mass is ONE double over its exact integers, quantized to integer
    nanos BEFORE the unit sum (m_u varies, so the sum is not globally
    rational — the cross-row double-sum rule); D_e is a one-shot
    double over global integer totals; α is mirrored token-for-token.
    Shape: one (unit, value) count aggregate, one unit-keyed
    reduction, one category-keyed reduction — linear, no windows.
    """
    base = df.select(
        F.col(unit_col).cast("string").alias("_u"),
        F.col(value_col).cast("string").alias("_v"),
    ).filter(F.col("_u").isNotNull() & F.col("_v").isNotNull())
    cell = base.groupBy("_u", "_v").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    per_u = cell.groupBy("_u").agg(
        F.sum("_c").cast("bigint").alias("_m"),
        F.sum(
            F.col("_c").cast("decimal(38,0)")
            * F.col("_c").cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("_s2"),
    ).filter(F.col("_m") >= 2)
    md = F.col("_m").cast("double")
    dq = F.round(
        (md * md - F.col("_s2").cast("double")) / (md - 1.0) * 1e9
    ).cast("bigint")
    ua = per_u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum("_m").cast("bigint").alias("_ntot"),
        F.sum(dq).cast("bigint").alias("_doq"),
    )
    kept = cell.join(per_u.select("_u"), "_u")
    ca = kept.groupBy("_v").agg(
        F.sum("_c").cast("bigint").alias("_nk")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("k_categories"),
        F.sum(
            F.col("_nk").cast("decimal(38,0)")
            * F.col("_nk").cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("_nk2"),
    )
    j = ua.crossJoin(F.broadcast(ca))
    nt = F.col("_ntot").cast("double")
    d_o = F.col("_doq").cast("double") / 1e9
    d_e = (nt * nt - F.col("_nk2").cast("double")) / (nt - 1.0)
    alpha = F.when(d_e > 0.0, 1.0 - d_o / d_e)
    return j.select(
        "n_units",
        F.col("_ntot").alias("n_values"),
        "k_categories",
        (F.round(alpha, 6) + 0.0).alias("alpha"),
    )
