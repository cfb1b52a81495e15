"""Time-series regularization: resample an irregular event stream onto a
fixed grid with forward fill.

Extension layer. The sensor/metrics companion to the streaming windowed
aggregates in ``streaming/events.py``: downstream consumers (feature
stores, charting, drift monitors) want one row per (key, grid step),
not raw irregular events.

Semantics:
- Buckets: ``floor(epoch(ts) / step) * step`` — every observation maps
  to the grid point at-or-before it; the per-bucket value is the
  rounded MEAN of the bucket's observations (deterministic under any
  row order, unlike last-in-bucket which ties on equal timestamps).
- Grid: per key, every step from the key's first bucket to its last
  (no extrapolation beyond either end).
- Fill: empty buckets take the most recent earlier bucket's value
  (forward fill); ``filled`` flags synthesized rows.

Execution shape: per-key bounds and per-bucket means are two map-side-
combinable aggregates on the same key; the grid is ``sequence`` +
``explode`` (row-local generation, no driver loop — a 10-year hourly
grid is 87 k rows per key generated executor-side); the forward fill is
one ``last(ignorenulls)`` window per key ordered by grid time. All
stages cluster on the key column — one logical repartition end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    round_digits: int = 4,
) -> DataFrame:
    """``(key_col, bucket_ts, value, filled)`` — one row per key per
    ``step_seconds`` between the key's first and last observation."""
    if step_seconds <= 0:
        raise ValueError("resample_ffill: step_seconds must be positive")
    step = F.lit(step_seconds)
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / step) * step
    ).alias("_b")
    obs = (
        df.select(F.col(key_col).alias("_k"), bucket, F.col(value_col).alias("_v"))
        .groupBy("_k", "_b")
        .agg(F.round(F.avg("_v"), round_digits).alias("_bv"))
    )
    grid = (
        obs.groupBy("_k")
        .agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"))
        .select(
            "_k",
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), step)
            ).alias("_b"),
        )
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["_k", "_b"], "left")
        .select(
            F.col("_k").alias(key_col),
            F.timestamp_seconds(F.col("_b")).alias("bucket_ts"),
            F.last("_bv", ignorenulls=True).over(w).alias("value"),
            F.col("_bv").isNull().alias("filled"),
        )
    )
