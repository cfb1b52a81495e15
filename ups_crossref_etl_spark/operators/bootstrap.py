"""Poisson bootstrap — one-pass resampling confidence intervals.

Extension layer — no counterpart in /root/reference. The
training-pipeline use: error bars on corpus statistics (mean quality
score, mean doc length, A/B deltas) at 100 TB, where the classical
bootstrap (draw n rows with replacement, B times) is impossible — you
cannot materialize B resamples of the corpus. The Poisson bootstrap
(Hanley & MacGibbon 2006; the standard large-scale variant) replaces
multinomial resampling with an independent Poisson(1) count per (row,
replicate): for n large the resample composition converges to the
multinomial one, and independence across rows makes the whole thing a
single map + aggregate.

Determinism contract (what lets the gate hash-match a DuckDB twin):
- The Poisson(1) draw for (row, b) is a pure function of
  ``md5(seed || ':' || id || ':' || b)`` — first 8 hex chars as a
  uint32, mapped through INTEGER thresholds ``floor(CDF_j * 2^32)``
  (the same engine-portable md5 trick as operators/sampling.py).
  Weights are truncated at 9 (P[X > 9] < 1.1e-7 — one phantom row per
  ~10M (row, replicate) pairs; both engines truncate identically so
  parity is unaffected).
- Replicate means are computed over INTEGER nano-units
  (``round(value * 1e9)`` as BIGINT) so the per-replicate sums are
  exact integers — no float-addition-order divergence between engines.
- CI endpoints are exact ORDER STATISTICS of the B replicate means
  (caller picks B so ``alpha * (B - 1)`` is integral, e.g. B = 201 for
  2.5 / 97.5 %) — no interpolation scheme to disagree on.

Scale shape: ``explode(1..B)`` multiplies rows CPU-side only — hash
partial aggregation collapses them map-side, so the shuffle carries at
most B × numPartitions partial sums (two BIGINTs each), never B × n
rows. The final order-statistic ranks B rows. One scan, one tiny
shuffle, regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "POISSON1_THRESHOLDS",
    "poisson_weight_expr",
    "poisson_bootstrap_means",
    "poisson_bootstrap_mean_ci",
]

#: floor(P[Poisson(1) <= j] * 2^32) for j = 0..8; a uint32 hash below
#: THRESHOLDS[j] means the weight is <= j. Hardcoded (not recomputed)
#: so the Spark side and every oracle SQL literal share one source.
POISSON1_THRESHOLDS = [
    1580030168,
    3160060337,
    3950075421,
    4213413783,
    4279248373,
    4292415291,
    4294609777,
    4294923276,
    4294962463,
]


def poisson_weight_expr(h32: Column) -> Column:
    """Poisson(1) weight (0..9) from a uint32 hash column: the number
    of CDF thresholds at or below the hash."""
    w = F.lit(9)
    for j in range(len(POISSON1_THRESHOLDS) - 1, -1, -1):
        w = F.when(h32 < F.lit(POISSON1_THRESHOLDS[j]), F.lit(j)).otherwise(w)
    return w


def poisson_weight_sql(hash_sql: str) -> str:
    """DuckDB CASE expression mirroring :func:`poisson_weight_expr`."""
    lines = [
        f"WHEN {hash_sql} < {t} THEN {j}"
        for j, t in enumerate(POISSON1_THRESHOLDS)
    ]
    return "CASE " + " ".join(lines) + " ELSE 9 END"


def poisson_bootstrap_means(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_replicates: int,
    seed: str = "boot",
) -> DataFrame:
    """``(b, mean)`` for replicates b = 1..n_replicates; ``mean`` is the
    Poisson-weighted mean of ``value_col`` rounded to 6 dp (computed
    over exact integer nano-units). NULL values are excluded."""
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(id_col).cast("string").alias("_id"),
        F.round(F.col(value_col).cast("double") * 1e9)
        .cast("bigint")
        .alias("_v_nano"),
    )
    # the replicate explode multiplies rows x B BEFORE any shuffle — if the
    # scan arrived as 1-2 parquet splits (typical at small file sizes) the
    # whole md5-per-replicate stage would run near-serial; spread the BASE
    # first (cheap: pre-explode row count) so the x B work uses every core
    base = base.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    reps = base.withColumn(
        "b", F.explode(F.sequence(F.lit(1), F.lit(int(n_replicates))))
    )
    h32 = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", F.lit(seed), F.col("_id"), F.col("b"))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = poisson_weight_expr(h32)
    return (
        reps.select("b", (w * F.col("_v_nano")).alias("_wv"), w.alias("_w"))
        .groupBy("b")
        .agg(F.sum("_wv").alias("_swv"), F.sum("_w").alias("_sw"))
        .select(
            "b",
            (
                F.round(F.col("_swv") / (F.col("_sw") * 1e9), 6) + 0.0
            ).alias("mean"),
        )
    )


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_replicates: int = 201,
    alpha: float = 0.05,
    seed: str = "boot",
) -> DataFrame:
    """One-row percentile-bootstrap CI for the mean of ``value_col``:
    ``(n_rows, n_replicates, sample_mean, boot_mean, ci_lo, ci_hi,
    covers_sample_mean)``. CI endpoints are the exact order statistics
    at ranks ``floor/ceil(alpha/2 * (B-1)) + 1`` — pick B so those are
    integral (the default 201 makes 2.5 % rank 6 and 97.5 % rank 196
    exactly)."""
    from pyspark.sql import Window

    b_count = int(n_replicates)
    lo_rank = int(round(alpha / 2.0 * (b_count - 1))) + 1
    hi_rank = int(round((1.0 - alpha / 2.0) * (b_count - 1))) + 1

    means = poisson_bootstrap_means(
        df, value_col, id_col, b_count, seed=seed
    ).withColumn(
        "_rk", F.row_number().over(Window.orderBy("mean", "b"))
    )
    # boot_mean over exact micro-units (means are 6 dp, so integral)
    magg = means.agg(
        F.count(F.lit(1)).alias("_nb"),
        F.round(
            F.sum(F.round(F.col("mean") * 1e6).cast("bigint"))
            / (F.count(F.lit(1)) * 1e6),
            6,
        ).alias("boot_mean"),
        F.max(F.when(F.col("_rk") == lo_rank, F.col("mean"))).alias("ci_lo"),
        F.max(F.when(F.col("_rk") == hi_rank, F.col("mean"))).alias("ci_hi"),
    )
    samp = (
        df.filter(F.col(value_col).isNotNull())
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (
                F.round(
                    F.sum(
                        F.round(F.col(value_col).cast("double") * 1e9).cast(
                            "bigint"
                        )
                    )
                    / (F.count(F.lit(1)) * 1e9),
                    6,
                )
                + 0.0
            ).alias("sample_mean"),
        )
    )
    return samp.crossJoin(magg).select(
        "n_rows",
        F.col("_nb").cast("bigint").alias("n_replicates"),
        "sample_mean",
        (F.col("boot_mean") + 0.0).alias("boot_mean"),
        (F.col("ci_lo") + 0.0).alias("ci_lo"),
        (F.col("ci_hi") + 0.0).alias("ci_hi"),
        (
            (F.col("sample_mean") >= F.col("ci_lo"))
            & (F.col("sample_mean") <= F.col("ci_hi"))
        ).alias("covers_sample_mean"),
    )
