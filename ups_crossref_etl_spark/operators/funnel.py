"""Ordered-funnel analysis over an event log.

Extension layer (no reference counterpart; the reference's only event
notion is its per-run audit log). Answers "how many users performed
step₁, then step₂ after it, then step₃ after that …" — the standard
product-analytics funnel, and the same sequence-pattern shape as
SQL MATCH_RECOGNIZE's simplest case.

Semantics (strict temporal chaining, earliest-completion greedy):
``t₁(u) = min ts of step₁ events of u``; ``tᵢ(u) = min ts of stepᵢ
events of u with ts > tᵢ₋₁(u)`` (strictly after — simultaneous events
do not satisfy "then"). With ``max_span`` set, every tᵢ must also lie
within ``t₁ + max_span``. Earliest-completion is the standard greedy
resolution and is optimal here: taking the minimum feasible tᵢ never
excludes a user who could complete the funnel with a later choice.

Execution shape: one filtered scan per step (isin literal → pushdown),
each reduced to ``(user, min ts)`` — map-side partial agg, then k−1
joins that are ALL co-partitioned on the user key (every groupBy and
join uses it), so at 100 TB the whole funnel costs one logical
repartition by user regardless of k. No windows over full event
history, no per-user event collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_users(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
    max_span_seconds: int | None = None,
) -> DataFrame:
    """Per-user funnel completion times: ``(user, t1 … tk)`` with NULL
    from the first step the user never (validly) reached."""
    if len(steps) < 2:
        raise ValueError("funnel_users: need at least 2 steps")
    u = F.col(user_col)
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(u.alias("user"))
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            u.alias("user"), F.col(ts_col).alias("_ts")
        )
        cond = F.col("_ts") > F.col(f"t{i - 1}")
        if max_span_seconds is not None:
            cond = cond & (
                F.col("_ts")
                <= F.col("t1") + F.expr(f"INTERVAL {max_span_seconds} SECOND")
            )
        cur = (
            cur.join(nxt, "user", "left")
            .withColumn("_ok", F.when(cond, F.col("_ts")))
            .groupBy(*[F.col(c) for c in cur.columns])
            .agg(F.min("_ok").alias(f"t{i}"))
        )
    return cur


def funnel_counts(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
    max_span_seconds: int | None = None,
) -> DataFrame:
    """The funnel report: ``(step_idx, step, n_users)`` — users whose
    chain reached step i (monotonically non-increasing down the rows)."""
    per_user = funnel_users(
        events, user_col, type_col, ts_col, steps, max_span_seconds
    )
    counts = per_user.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"n{i}").alias("n_users"),
            )
            for i, s in enumerate(steps, start=1)
        ]
    )
    return (
        counts.select(F.explode(rows).alias("r"))
        .select("r.step_idx", "r.step", "r.n_users")
    )


def funnel_latency(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
    max_span_seconds: int | None = None,
) -> DataFrame:
    """Time-to-convert between consecutive funnel steps: for every
    user whose chain reached step i+1 (:func:`funnel_users`
    semantics), the step latency ``t_{i+1} - t_i`` — reported as
    ``(step_idx, from_step, to_step, n_users, p50_seconds,
    p90_seconds)``. The counts answer "where do users drop off";
    this answers "where do they stall".

    Determinism: latencies convert to exact integer MICROSECONDS per
    user before the exact interpolated percentile (``F.percentile`` —
    even-count midpoints are then exact halves on every engine, the
    q_percentiles convention), divided back to seconds and rounded
    6 dp. Shape: the per-user funnel table (k user-keyed aggregates)
    then one tiny percentile aggregate per step pair.
    """
    per_user = funnel_users(
        events, user_col, type_col, ts_col, steps, max_span_seconds
    )
    out = None
    for i in range(1, len(steps)):
        a, b = f"t{i}", f"t{i + 1}"
        lat = per_user.filter(F.col(b).isNotNull()).select(
            (
                F.unix_micros(F.col(b).cast("timestamp"))
                - F.unix_micros(F.col(a).cast("timestamp"))
            ).alias("_us")
        )
        row = lat.agg(
            F.lit(i).cast("bigint").alias("step_idx"),
            F.lit(steps[i - 1]).alias("from_step"),
            F.lit(steps[i]).alias("to_step"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            (
                F.round(F.percentile("_us", F.lit(0.5)) / 1e6, 6) + 0.0
            ).alias("p50_seconds"),
            (
                F.round(F.percentile("_us", F.lit(0.9)) / 1e6, 6) + 0.0
            ).alias("p90_seconds"),
        )
        out = row if out is None else out.unionByName(row)
    return out
