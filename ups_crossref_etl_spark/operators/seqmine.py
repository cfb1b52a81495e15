"""Sequential pattern support — GSP-style gap-constrained sequences.

Extension layer — no counterpart in /root/reference. The pipeline use:
behavioral patterns over an event log ("signup → view → purchase, each
step within 6 h") — funnel generalized to EVERY type combination at
once, the counting core of GSP (Srikant & Agrawal 1996, "Mining
Sequential Patterns: Generalizations and Performance Improvements",
whose max-gap constraint is the one implemented here).

Semantics: user u supports the k-pattern (t1, …, tk) iff there exist
events e1 < e2 < … < ek of u (STRICT timestamp order) with
``0 < ts(e_{i+1}) - ts(e_i) <= max_gap`` for every step. Support =
number of distinct supporting users.

Spark-first shape — this is NOT a self-join chain. One window pass per
pattern length:

- Stage 1: for every event row and every candidate first-type ``a``, a
  RANGE-frame window over epoch-micros (``rangeBetween(-gap_us, -1)``)
  marks whether some ``a``-event ended within the gap strictly before
  the row. The ``-1`` upper bound makes strictness exact even under
  timestamp ties — no "last event wins" approximation.
- Stage 2 reuses the SAME partitioning and ordering (Catalyst plans one
  Exchange + one Sort with two Window operators) to mark rows preceded
  by a stage-1-qualified ``b``-row within the gap.
- Final aggregation: ``count(DISTINCT user)`` per pattern over the
  flag columns — T^k pattern columns with T = |declared type set|
  (bounded, e.g. 5 event types → 125 triples), unpivoted via a
  ``stack`` so the result is relational.

Scale: ONE shuffle (the per-user window sort) regardless of k; the
flag computation is whole-stage codegen over T^(k-1) window
expressions sharing a frame; no event-to-event join ever materializes
— contrast the naive k-way self-join whose intermediate is
|events|^k / |users|^(k-1). Skewed users cost a wide sort partition,
not a blow-up.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sequential_support"]


def sequential_support(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    types: Sequence[str],
    max_gap_seconds: int,
    k: int = 2,
    min_support: int = 1,
) -> DataFrame:
    """Support counts for every length-``k`` pattern over ``types``:
    ``(t1, …, tk, n_users)`` with ``n_users >= min_support``. ``k`` is
    2 or 3."""
    if k not in (2, 3):
        raise ValueError("k must be 2 or 3")
    gap_us = int(max_gap_seconds) * 1_000_000
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    )
    w = (
        Window.partitionBy("_u")
        .orderBy("_us")
        .rangeBetween(-gap_us, -1)
    )
    # Stage 1: _p1_<a> = some a-event strictly before, within the gap.
    stage1 = ev.select(
        "*",
        *[
            F.max(F.when(F.col("_t") == F.lit(a), 1)).over(w).alias(f"_p1_{i}")
            for i, a in enumerate(types)
        ],
    )
    if k == 2:
        flags = stage1
        combos = [((i,), f"_p1_{i}") for i in range(len(types))]
    else:
        # Stage 2: _p2_<a>_<b> = some b-event with _p1_<a> set, strictly
        # before, within the gap (same window spec — one sort).
        flags = stage1.select(
            "*",
            *[
                F.max(
                    F.when(
                        (F.col("_t") == F.lit(b))
                        & (F.col(f"_p1_{i}") == 1),
                        1,
                    )
                )
                .over(w)
                .alias(f"_p2_{i}_{j}")
                for i, _a in enumerate(types)
                for j, b in enumerate(types)
            ],
        )
        combos = [
            ((i, j), f"_p2_{i}_{j}")
            for i in range(len(types))
            for j in range(len(types))
        ]

    # Unpivot: one row per (pattern, user) that supports it, then count
    # distinct users per pattern.
    pattern_cols = []
    for prefix_idx, flag in combos:
        for last_j, last_t in enumerate(types):
            names = [types[i] for i in prefix_idx] + [last_t]
            cond = (F.col("_t") == F.lit(last_t)) & (F.col(flag) == 1)
            pattern_cols.append(
                F.when(cond, F.lit(" ".join(names))).alias(
                    "_pat_%s_%d" % ("_".join(map(str, prefix_idx)), last_j)
                )
            )
    exploded = (
        flags.select("_u", F.array(*pattern_cols).alias("_pats"))
        .select("_u", F.explode("_pats").alias("_pat"))
        .filter(F.col("_pat").isNotNull())
    )
    agg = exploded.groupBy("_pat").agg(
        F.count_distinct("_u").cast("bigint").alias("n_users")
    )
    parts = F.split(F.col("_pat"), " ")
    names = ["t1", "t2", "t3"][:k]
    return agg.select(
        *[parts.getItem(i).alias(n) for i, n in enumerate(names)],
        "n_users",
    ).filter(F.col("n_users") >= F.lit(int(min_support)))
