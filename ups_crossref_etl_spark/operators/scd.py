"""Slowly-changing-dimension (SCD type 2) interval rebuild from a log.

Extension layer (no reference counterpart, but the same warehouse shape as
the reference's monotone upsert rebuilds — K5/K6 in SURVEY §2.2 keep only
the latest state; this operator keeps the full validity history).

Given an append-only attribute log ``(key, ts, attr)``, collapse
consecutive runs of the same attribute value into validity intervals
``[valid_from, valid_to)`` with ``valid_to IS NULL`` marking the current
row — the standard dimension-history rebuild.

Scale shape: every window and the run aggregate partition by ``key``, so
the whole plan runs on ONE exchange — the ``groupBy(key, run)`` is
satisfied by the window's hash partitioning on ``key`` (grouping keys are
a superset of the partitioning keys), and the final ``lead`` window reuses
it again. Per-key data must fit a task (dimension histories are
thousands of rows, not billions — the usual SCD regime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def intervals_from_log(
    df: DataFrame, key_col: str, attr_col: str, ts_col: str
) -> DataFrame:
    """Rebuild SCD2 intervals: ``(key, attr, valid_from, valid_to,
    is_current, n_events)``.

    ``n_events`` counts the log rows collapsed into each interval. Change
    detection uses null-safe comparison (``IS DISTINCT FROM``), so a null
    attribute value is a state like any other. Ordering within a key is by
    ``ts_col`` alone — the caller guarantees (key, ts) uniqueness, as an
    event log that double-books a timestamp has no well-defined history.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    chg = F.when(
        F.lag(attr_col).over(w).eqNullSafe(F.col(attr_col)), F.lit(0)
    ).otherwise(F.lit(1))
    runs = df.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col),
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("_run"),
    )
    grouped = runs.groupBy(key_col, "_run").agg(
        F.min(attr_col).alias(attr_col),  # constant within a run
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from")
    out = grouped.select(
        F.col(key_col),
        F.col(attr_col),
        F.col("valid_from"),
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.col("n_events"),
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())


def lookup_asof(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str = "attr",
) -> DataFrame:
    """Join fact rows to the SCD2 dimension VERSION valid at each fact's
    timestamp — the point-in-time lookup that makes type-2 history
    useful (training-data labeling at event time, "what segment was
    this customer in when they ordered", audit reconstruction). A
    latest-state join silently time-travels future attribute values
    onto past facts; this join cannot.

    ``dim`` rows carry ``(key, attr, valid_from, valid_to)`` with NULL
    ``valid_to`` marking the current version
    (``intervals_from_log``'s output shape). Match rule:
    ``valid_from <= ts AND (valid_to IS NULL OR ts < valid_to)`` —
    half-open, so a fact exactly at a version boundary takes the NEW
    version, and versions never double-match. Facts before the key's
    first version get NULL (left join — surface them, don't drop).

    Scale shape: ONE key-keyed equi-join (the interval predicates ride
    along as join filters; per-key version counts are change-bounded,
    so the filter fan-out is small); no window, no range-join explosion
    — the key equality does the partitioning work.
    """
    d = dim.select(
        F.col(key_col).alias("_k"),
        F.col(attr_col).alias("_attr"),
        F.col("valid_from").alias("_vf"),
        F.col("valid_to").alias("_vt"),
    )
    cond = (
        (facts[ts_col] >= d["_vf"])
        & (d["_vt"].isNull() | (facts[ts_col] < d["_vt"]))
        & (facts[key_col] == d["_k"])
    )
    return facts.join(d, cond, "left").select(
        *facts.columns, F.col("_attr").alias(f"{attr_col}_asof")
    )
