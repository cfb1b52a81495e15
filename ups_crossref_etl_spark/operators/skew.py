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
