"""Skew mitigation utilities.

AQE's skew-join handling (enabled in ``session.get_spark``) covers
sort-merge join skew automatically. These helpers cover the cases AQE
doesn't: skewed *aggregations* and broadcast-infeasible skewed joins.

- ``salted_agg``: two-phase aggregate — groupBy (key, salt) partial, then
  groupBy key final. Turns one hot key's single reducer into
  ``num_salts`` parallel reducers. Works for any algebraic aggregate
  (sum/count/min/max); the caller supplies both phases.
- ``salt_join``: replicate the small side ``num_salts`` times with an
  explicit salt column and salt the large side randomly-but-
  deterministically (hash of a unique column), so one hot join key
  spreads across ``num_salts`` tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str, num_salts: int = 16) -> DataFrame:
    """Deterministic salt in [0, num_salts): pmod(xxhash64(unique_col)).
    Deterministic (not rand()) so retries/resumes see the same salt."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(num_salts)))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    unique_col: str,
    partial_aggs: list[Column],
    final_aggs: list[Column],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``partial_aggs`` run per (key, salt); ``final_aggs`` combine the
    partials per key (e.g. partial ``sum(x) as s`` → final ``sum(s)``)."""
    salted = with_salt(df, unique_col, num_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salt_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    unique_col: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the large side, replicate the small side
    across every salt value, join on (key, salt). Small side grows
    ``num_salts``× — use only when it's small enough to replicate but too
    big (or the join type wrong) for a broadcast."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    large_salted = with_salt(large, unique_col, num_salts)
    return large_salted.join(small_rep, [key, "_salt"], how).drop("_salt")


def key_skew_stats(
    df: DataFrame, key_col: str, round_digits: int = 2
) -> DataFrame:
    """Skew diagnostics for a prospective shuffle key: one row with
    ``(n_keys, total_rows, max_cnt, avg_cnt, p99_cnt, skew_factor)``.

    The pre-flight check for any 100 TB groupBy/join: ``skew_factor``
    (max key count / mean key count) tells you whether the hottest
    partition will straggle — a factor over ~20 is the signal to reach
    for :func:`salted_agg` / :func:`salt_join` or AQE skew splitting,
    BEFORE burning a cluster-day discovering it empirically.

    Execution shape: one map-side-combinable count per key, then a
    single-row global aggregate over the (small) key-count table.
    ``p99_cnt`` uses Spark's exact ``percentile`` (linear interpolation
    at rank ``(n-1)*p`` — same contract as DuckDB ``quantile_cont``);
    exactness over the key-count table is cheap because that table is
    |keys|-sized, not |rows|-sized.
    """
    cnts = df.groupBy(F.col(key_col)).agg(F.count(F.lit(1)).alias("_c"))
    return cnts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("_c").alias("total_rows"),
        F.max("_c").alias("max_cnt"),
        F.round(F.avg("_c"), round_digits).alias("avg_cnt"),
        F.round(F.percentile("_c", F.lit(0.99)), round_digits).alias("p99_cnt"),
        F.round(
            F.max("_c") / F.avg("_c"), round_digits
        ).alias("skew_factor"),
    )


def hot_keys(df: DataFrame, key: str, min_count: int) -> DataFrame:
    """Exact heavy-hitter key set: keys with ≥ ``min_count`` rows. One
    map-side-combinable count shuffle carrying (key, count) only. The
    result is bounded by total_rows / min_count keys — broadcastable by
    construction. At 100 TB, swap in a sampled or stats-backed estimate
    (sketches.heavy_hitters) with the same output contract."""
    return (
        df.groupBy(F.col(key))
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select(key)
    )


def hybrid_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    min_hot_count: int = 100_000,
    how: str = "inner",
    hot: DataFrame | None = None,
) -> DataFrame:
    """Hot/cold hybrid equi-join — the skew strategy for joins where the
    dim side is too big to broadcast WHOLE but the slice matching the
    hot keys is tiny (the usual case: few heavy-hitter keys).

    Split the fact by heavy-hitter membership: hot fact rows join the
    hot dim SLICE via broadcast hash join — the skewed rows never
    shuffle, so no reducer receives the hot key's mountain; the cold
    remainder takes the normal shuffled equi-join over now-uniform
    keys. Each fact row lands in exactly one branch, so the union
    equals the plain join row-for-row (the gate query's oracle IS the
    plain join). Supports ``inner`` and ``left`` (fact-preserving)
    joins — for right/full the dim split would also need the hot set
    applied on the preserved side.

    ``hot``: optionally a precomputed heavy-hitter key set (e.g. from
    yesterday's stats) to skip the counting pass.

    Complements (not replaces) AQE skew splitting: AQE splits oversized
    partitions of a sort-merge join AFTER shuffling them; this operator
    keeps hot rows out of the shuffle entirely and pairs them with a
    broadcast build, which also works when the cold side picks a
    different strategy."""
    if how not in ("inner", "left"):
        raise ValueError(f"hybrid_skew_join supports inner/left, got {how!r}")
    if hot is None:
        hot = hot_keys(fact, key, min_hot_count)
    hot_b = F.broadcast(hot)
    fact_hot = fact.join(hot_b, key, "left_semi")
    fact_cold = fact.join(hot_b, key, "left_anti")
    dim_hot = dim.join(hot_b, key, "left_semi")
    out_hot = fact_hot.join(F.broadcast(dim_hot), key, how)
    out_cold = fact_cold.join(dim, key, how)
    return out_hot.unionByName(out_cold)


def join_cardinality_preflight(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    top: int = 10,
) -> DataFrame:
    """Pre-flight a join before paying its shuffle: the EXACT output
    cardinality and the keys that dominate it, from two key-histogram
    aggregates — each a tiny fraction of the join's own cost.

    ``|A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k)`` — the classic identity; the
    per-key products are also exactly the join's skew profile (one key
    contributing 10⁹ of 10⁹·⁵ output rows means salting or a hot/cold
    split BEFORE launching, not an OOM'd stage retry after). At 100 TB
    this check is the difference between discovering a runaway
    many-to-many join in a 2-minute aggregate and discovering it three
    hours into a 10-hour stage.

    Returns one summary row per dominating key (rank <= ``top``, total
    tiebreak) plus a rank-0 TOTAL row: ``(rank, key_repr, out_rows,
    frac)`` with ``frac`` the key's share of the total output, 4dp.

    Scale shape: one map-side-combinable count aggregate per side, an
    inner join of the two key histograms (distinct-key-sized), a
    TakeOrdered top-k — nothing touches a full-width row.
    """
    from pyspark.sql.window import Window

    kr = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    la = left.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_ca"))
    rb = right.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_cb"))
    prod = la.join(rb, key_cols).select(
        kr.alias("key_repr"), (F.col("_ca") * F.col("_cb")).alias("out_rows")
    )
    total = prod.agg(F.sum("out_rows").alias("_tot"))
    topk = (
        prod.crossJoin(F.broadcast(total))
        .select(
            "key_repr",
            F.col("out_rows").cast("long").alias("out_rows"),
            F.round(F.col("out_rows") / F.col("_tot"), 4).alias("frac"),
        )
        .orderBy(F.desc("out_rows"), F.asc("key_repr"))
        .limit(top)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("out_rows"), F.asc("key_repr")))
            .cast("long"),
        )
    )
    tot_row = total.select(
        F.lit(0).cast("long").alias("rank"),
        F.lit("__TOTAL__").alias("key_repr"),
        F.col("_tot").cast("long").alias("out_rows"),
        F.lit(1.0).alias("frac"),
    )
    return tot_row.unionByName(topk.select("rank", "key_repr", "out_rows", "frac"))
