"""Clickstream path mining — top event-type paths per session.

Extension layer — no counterpart in /root/reference. The event-log
use: "what do users actually DO, in order?" — sessionize, render each
session's first N event types as a path string, count paths, rank the
most common. The per-transition view already exists
(``timeseries``/transition matrix, Markov backtest); this is the
whole-trajectory view those marginals can't reconstruct.

Determinism: sessions cut on exact epoch-MICROS gaps (no
second-truncation boundary band); within-session order is
(ts, event_id) — total, since event_id is unique; path strings are
built by sorting the collected (ts, event_id, type) structs, not by
collection order; the top-k is a rank over (count DESC, path ASC) —
a total order, never a bare LIMIT.

Scale shape: one per-user window pass (sessionize = lag + running
sum over the SAME sort), one groupBy(session) building bounded path
strings (length capped at ``max_events`` types — long sessions
truncate, so the aggregate state is bounded), one path-keyed count,
and a rank over the path-count table (path-cardinality-sized, not
corpus-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["top_session_paths"]


def top_session_paths(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    gap_seconds: int = 1800,
    max_events: int = 8,
    k: int = 20,
) -> DataFrame:
    """``(path, n_sessions, rank)`` for the ``k`` most common session
    paths (ties in count broken by path string; sessions longer than
    ``max_events`` contribute their prefix)."""
    gap_us = int(gap_seconds) * 1_000_000
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("_id"),
        F.col(type_col).alias("_t"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    )
    w = Window.partitionBy("_u").orderBy("_us", "_id")
    new_s = F.when(
        F.lag("_us").over(w).isNull()
        | (F.col("_us") - F.lag("_us").over(w) > gap_us),
        1,
    ).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.withColumn("_sid", F.sum(new_s).over(wc))
    rn = F.row_number().over(
        Window.partitionBy("_u", "_sid").orderBy("_us", "_id")
    )
    paths = (
        sess.withColumn("_rn", rn)
        .filter(F.col("_rn") <= max_events)
        .groupBy("_u", "_sid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_us", "_id", "_t"))
                    ),
                    lambda s: s.getField("_t"),
                ),
                ">",
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
    )
    ranked = paths.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("n_sessions").desc(), F.col("path"))
        ).cast("bigint"),
    )
    return ranked.filter(F.col("rank") <= k)
