"""Categorical association and weighted order statistics.

Extension layer (no counterpart in /root/reference, whose analytics are
plain counts — ``rabarrazueta/ups-crossref-etl`` main.py dashboard
section): the profiling questions a curation pipeline asks before
trusting a column as a stratification / mixing key — "does source
predict language" (association strength), "what is the volume-weighted
typical value" (weighted median).

Determinism contract (module-wide): every per-cell double term is
quantized to BIGINT picos BEFORE any sum, so cross-engine accumulation
is exact integer addition; final outputs are single rounded double
expressions. Scale shape: one fact-sized key-clustered aggregate each;
everything downstream is cells-sized / group-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["categorical_association", "weighted_median"]


def _pico(c):
    """Quantize a double term to BIGINT picos (exact-sum discipline)."""
    return F.round(c * 1e12).cast("bigint")


def categorical_association(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Association strength between two categorical columns, one row:
    ``(n_rows, n_cells, mi, h_a, h_b, nmi, chi2, cramers_v)``.

    Mutual information MI = sum p(a,b) * ln(p(a,b)/(p(a)p(b))) in nats
    with its normalized form NMI = MI/sqrt(H(A)*H(B)), plus Pearson
    chi-square and Cramer's V = sqrt(chi2/(N*min(r-1, c-1))) — the two
    standard effect-size scales from ONE contingency table.

    Shape: one (a, b) groupBy over the facts (the only fact-sized
    shuffle, map-side combinable), margins by re-aggregating the cell
    table (cells-sized), broadcast joins back, single-row reduction.
    NULL categories become their own level via a sentinel. Degenerate
    single-level columns report nmi = cramers_v = 0.
    """
    cells = (
        df.select(
            F.coalesce(F.col(a_col).cast("string"), F.lit(" null")).alias("_a"),
            F.coalesce(F.col(b_col).cast("string"), F.lit(" null")).alias("_b"),
        )
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_nab"))
    )
    ma = cells.groupBy("_a").agg(F.sum("_nab").alias("_na"))
    mb = cells.groupBy("_b").agg(F.sum("_nab").alias("_nb"))
    tot = cells.agg(
        F.sum("_nab").alias("_n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.countDistinct("_a").cast("bigint").alias("_r"),
        F.countDistinct("_b").cast("bigint").alias("_c"),
    )
    j = (
        cells.join(F.broadcast(ma), "_a")
        .join(F.broadcast(mb), "_b")
        .crossJoin(F.broadcast(tot))
    )
    n = F.col("_n").cast("double")
    nab = F.col("_nab").cast("double")
    na = F.col("_na").cast("double")
    nb = F.col("_nb").cast("double")
    e = na * nb / n
    mi_term = (nab / n) * F.log(n * nab / (na * nb))
    # chi2 over ALL r*c cells (including structural zeros absent from the
    # observed-cell table) via the identity sum (nab-e)^2/e = sum nab^2/e - N:
    # zero cells contribute nothing to nab^2/e, so summing observed cells
    # and subtracting N is exact.
    chi_term = nab * nab / e
    acc = j.groupBy("_n", "n_cells", "_r", "_c").agg(
        F.sum(_pico(mi_term)).alias("_mi"),
        F.sum(_pico(chi_term)).alias("_chi"),
    )
    ha = ma.crossJoin(F.broadcast(tot.select(F.col("_n").alias("_nt")))).agg(
        F.sum(
            _pico(
                -(F.col("_na").cast("double") / F.col("_nt").cast("double"))
                * F.log(
                    F.col("_na").cast("double") / F.col("_nt").cast("double")
                )
            )
        ).alias("_ha")
    )
    hb = mb.crossJoin(F.broadcast(tot.select(F.col("_n").alias("_nt")))).agg(
        F.sum(
            _pico(
                -(F.col("_nb").cast("double") / F.col("_nt").cast("double"))
                * F.log(
                    F.col("_nb").cast("double") / F.col("_nt").cast("double")
                )
            )
        ).alias("_hb")
    )
    out = acc.crossJoin(F.broadcast(ha)).crossJoin(F.broadcast(hb))
    mi_d = F.col("_mi").cast("double") / 1e12
    ha_d = F.col("_ha").cast("double") / 1e12
    hb_d = F.col("_hb").cast("double") / 1e12
    # greatest(.., 0): pico quantization can leave a ~1e-13 negative residue
    # when the true chi2 is exactly 0 — clamp before the sqrt
    chi_d = F.greatest(
        F.col("_chi").cast("double") / 1e12 - F.col("_n").cast("double"),
        F.lit(0.0),
    )
    dof = F.least(F.col("_r") - 1, F.col("_c") - 1).cast("double")
    return out.select(
        F.col("_n").cast("bigint").alias("n_rows"),
        "n_cells",
        (F.round(mi_d, 6) + 0.0).alias("mi"),
        (F.round(ha_d, 6) + 0.0).alias("h_a"),
        (F.round(hb_d, 6) + 0.0).alias("h_b"),
        (
            F.round(
                F.when(
                    (F.col("_ha") > 0) & (F.col("_hb") > 0),
                    mi_d / F.sqrt(ha_d * hb_d),
                ).otherwise(F.lit(0.0)),
                6,
            )
            + 0.0
        ).alias("nmi"),
        (F.round(chi_d, 6) + 0.0).alias("chi2"),
        (
            F.round(
                F.when(
                    dof > 0,
                    F.sqrt(chi_d / (F.col("_n").cast("double") * dof)),
                ).otherwise(F.lit(0.0)),
                6,
            )
            + 0.0
        ).alias("cramers_v"),
    )


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-group LOWER weighted median of an integer-unit value:
    ``(group, n, total_weight, weighted_median)`` — the smallest value v
    (sorted with a total-order tiebreak) whose cumulative weight reaches
    half the group's total (2*cumw >= W).

    The volume-weighted "typical" statistic (price per unit weighted by
    quantity, latency weighted by traffic) a plain median gets wrong
    when rows carry unequal mass. Lower-median semantics avoid
    interpolation entirely — the result is an actual data value, so the
    gate is exact with NO float caveat: weights cumulate as BIGINT in
    one per-group window, the pick is one filtered min. Two window
    passes + one aggregate, all clustered on the group key.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(tiebreak_col).asc()
    )
    cum = df.select(
        F.col(group_col),
        F.col(value_col).cast("bigint").alias("_v"),
        F.sum(F.col(weight_col).cast("bigint")).over(w).alias("_cw"),
        F.sum(F.col(weight_col).cast("bigint"))
        .over(Window.partitionBy(group_col))
        .alias("_tw"),
    )
    return (
        cum.filter(2 * F.col("_cw") >= F.col("_tw"))
        .groupBy(group_col)
        .agg(
            F.min("_v").alias("weighted_median"),
            F.max("_tw").alias("total_weight"),
        )
        .join(
            df.groupBy(group_col).agg(
                F.count(F.lit(1)).cast("bigint").alias("n")
            ),
            group_col,
        )
        .select(group_col, "n", "total_weight", "weighted_median")
    )
