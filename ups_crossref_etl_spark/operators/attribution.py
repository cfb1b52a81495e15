"""Multi-touch conversion attribution (first / last / linear).

Extension layer — no counterpart in /root/reference. The event-log
use: credit each conversion's value to the touch events (clicks,
views) that preceded it inside a lookback window — the standard
marketing-attribution triple:

- ``first_touch``: 100 % to the EARLIEST touch in the window;
- ``last_touch``: 100 % to the LATEST touch before the conversion;
- ``linear``: value / n_touches to every touch occurrence.

Conversions with no touch in the window receive no attribution row
(they are "unattributed" — callers count them by difference).

Spark-first shape — NOT a conversions×touches interval join. One
per-user RANGE window (``rangeBetween(-lookback_us, -1)`` over epoch
micros — strict precedence, tie-exact) computes, at each conversion
row: the earliest/latest preceding touch (min/max over a
``struct(ts, type)`` — lexicographic, deterministic tie on type) and
the per-type touch counts. ONE shuffle (the user sort); the touch
multiplicity never materializes as join fanout.

Determinism contract: linear credit is accumulated as
``CAST(value / n_touches AS DECIMAL(38,12)) * cnt_type`` — exactly the
decimal a per-touch-row oracle sums ``cnt_type`` times, so engine
parity is exact (a ``value * cnt / n`` double would NOT match a summed
``value / n``). Credited sums are decimal-accumulated, rounded 2 dp.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["attribute_conversions"]


def attribute_conversions(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    value_col: str,
    conversion_type: str,
    touch_types: Sequence[str],
    lookback_seconds: int,
) -> DataFrame:
    """``(model, touch_type, n_conversions, credited_value)`` for the
    three attribution models; ``n_conversions`` counts conversions in
    which the touch type received any credit."""
    gap_us = int(lookback_seconds) * 1_000_000
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(value_col).cast("double").alias("_v"),
    )
    is_touch = F.col("_t").isin(list(touch_types))
    w = Window.partitionBy("_u").orderBy("_us").rangeBetween(-gap_us, -1)

    touch_struct = F.when(
        is_touch, F.struct(F.col("_us").alias("u"), F.col("_t").alias("t"))
    )
    cols = [
        F.min(touch_struct).over(w).alias("_first"),
        F.max(touch_struct).over(w).alias("_last"),
    ]
    for i, t in enumerate(touch_types):
        cols.append(
            F.count(F.when(F.col("_t") == F.lit(t), 1)).over(w).alias(f"_c{i}")
        )
    conv = (
        ev.select("*", *cols)
        .filter(
            (F.col("_t") == F.lit(conversion_type))
            & F.col("_v").isNotNull()
        )
        .withColumn(
            "_nt", sum(F.col(f"_c{i}") for i in range(len(touch_types)))
        )
        .filter(F.col("_nt") > 0)
    )

    first = (
        conv.groupBy(F.col("_first.t").alias("touch_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
            F.round(F.sum(F.col("_v").cast("decimal(38,12)")), 2)
            .cast("double")
            .alias("credited_value"),
        )
        .select(F.lit("first_touch").alias("model"), "*")
    )
    last = (
        conv.groupBy(F.col("_last.t").alias("touch_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
            F.round(F.sum(F.col("_v").cast("decimal(38,12)")), 2)
            .cast("double")
            .alias("credited_value"),
        )
        .select(F.lit("last_touch").alias("model"), "*")
    )

    # linear: per type, decimal(value/n) * cnt — bit-equal to a
    # per-touch-row sum of decimal(value/n)
    share = (F.col("_v") / F.col("_nt")).cast("decimal(38,12)")
    lin_parts = []
    for i, t in enumerate(touch_types):
        lin_parts.append(
            conv.filter(F.col(f"_c{i}") > 0)
            .select(
                F.lit(t).alias("touch_type"),
                (share * F.col(f"_c{i}")).alias("_credit"),
            )
            .groupBy("touch_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
                F.round(F.sum("_credit"), 2)
                .cast("double")
                .alias("credited_value"),
            )
            .select(F.lit("linear").alias("model"), "*")
        )
    out = first.unionByName(last)
    for p in lin_parts:
        out = out.unionByName(p)
    return out
