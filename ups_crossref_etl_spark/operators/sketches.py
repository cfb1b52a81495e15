"""Heavy hitters (frequent items) — exact answers at sketch cost.

Extension layer. The training-pipeline use: find domains / languages /
boilerplate values that dominate a 100 TB corpus without paying a full
``groupBy`` over a high-cardinality column.

Two-pass design (Misra-Gries-style candidates, then exact verify):

1. **Candidate pass** — ``mapInPandas`` over the value column; per Arrow
   batch, an exact vectorized ``value_counts`` keeps items with batch
   count > n_batch/k. Pigeonhole: any item with GLOBAL frequency > n/k
   must exceed n_b/k in at least one batch (n = Σ n_b), so the candidate
   union has NO false negatives; at most k items per batch qualify, so
   candidates ≤ k·n_batches — kilobytes, never data-sized.
2. **Exact pass** — broadcast the distinct candidates, semi-join the
   corpus (map-side hash join, zero shuffle of non-candidate rows),
   ``groupBy`` the survivors, keep ``count·k > n``.

The result is EXACTLY the set ``{v : freq(v) > n/k}`` with exact counts
— not an approximation — which is why the gate query hash-matches a
plain ``GROUP BY … HAVING`` oracle. The sketch only changes the cost:
the full-column groupBy (shuffle ∝ distinct values) becomes a map-only
candidate scan plus a groupBy over candidate-matching rows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(df: DataFrame, value_col: str, k: int) -> DataFrame:
    """All values occurring in strictly more than ``n/k`` of the rows
    (≤ k−1 of them by pigeonhole), with exact counts:
    ``(value_col, n_occurrences)``. NULLs are ignored.
    """
    if k < 2:
        raise ValueError("heavy_hitters: k must be >= 2")
    vals = df.select(F.col(value_col).alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    schema = vals.schema

    def candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            vc = b["_v"].value_counts()
            keep = vc[vc > len(b) / k]
            yield pd.DataFrame({"_v": keep.index})

    cand = vals.mapInPandas(candidates, schema=schema).distinct()
    total = vals.count()
    return (
        vals.join(F.broadcast(cand), "_v")
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") * k > F.lit(total))
        .select(F.col("_v").alias(value_col), "n_occurrences")
    )


# --------------------------------------------------------------------------
# Mergeable HLL sketch tables (Datasketches, Spark-native since 3.5)
# --------------------------------------------------------------------------


def hll_sketch_table(
    df: DataFrame, value_col: str, group_cols: list[str], lg_k: int = 12
) -> DataFrame:
    """Per-group distinct-count SKETCH table: ``group_cols + (sketch
    binary, est bigint)``.

    This is the incremental-analytics primitive exact distinct counts
    can't give you: ``count_distinct`` does not decompose (yesterday's
    count + today's count ≠ total), so a daily exact rollup rescans ALL
    history. A Datasketches HLL sketch DOES decompose — persist this
    table per partition/day (the sketch is a few KB binary per group at
    ``lg_k=12``), and any coarser grain or longer window is a
    ``hll_union_agg`` over the stored sketches (``hll_rollup``), never a
    rescan. One map-side-combinable groupBy; estimate error ~1.6%/√2^lg_k
    (~2.5% at lg_k=12), deterministic for fixed input.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(value_col, F.lit(lg_k))
        ).alias("est"),
    )


def hll_rollup(
    sketch_df: DataFrame, rollup_cols: list[str], sketch_col: str = "sketch"
) -> DataFrame:
    """Roll a sketch table to a coarser grain WITHOUT touching base data:
    ``rollup_cols + (sketch binary, est bigint)``. Input sketches must
    share ``lg_k`` (Datasketches unions to the smaller lg_k otherwise —
    silently coarser error). The union agg is map-side combinable; the
    shuffle carries one small binary per input group, so rolling a year
    of daily sketches moves days×groups KB-rows, not the corpus.
    """
    return sketch_df.groupBy(*rollup_cols).agg(
        F.hll_union_agg(sketch_col).alias("sketch"),
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("est"),
    )


# --------------------------------------------------------------------------
# Count-Min sketch (deterministic md5 hash family — oracle-replicable)
# --------------------------------------------------------------------------


def _cms_slot(value_col, d: int, width: int):
    """Row d's slot for a value: md5_60 of ``d ':' value`` mod width —
    the same engine-independent hash family as operators/membership."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(str(d)), F.lit(":"), value_col)), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )


def cms_build(
    df: DataFrame, value_col: str, width: int = 1024, depth: int = 3
) -> DataFrame:
    """Count-Min frequency sketch: ``(d, slot, cnt)`` — at most
    ``depth × width`` rows regardless of corpus size, i.e. always
    broadcastable. One explode (``depth`` rows per input row, row-local
    codegen hashing) + one map-side-combinable groupBy. Estimates
    OVERCOUNT only (collisions add, never subtract): est ≥ true always,
    est ≤ true + 2n/width with probability 1 − 2^−depth — the classic
    CM guarantee. Deterministic hash family (md5_60, as
    ``membership.bloom_build``), so the sketch — and every estimate
    including collision noise — is engine-independent and exactly
    oracle-checkable, unlike a murmur/seed-dependent implementation.
    """
    rows = df.select(F.col(value_col).alias("_v")).filter(F.col("_v").isNotNull())
    slots = rows.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_slot(F.col("_v").cast("string"), d, width).alias(
                            "slot"
                        ),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_s")
    )
    return (
        slots.select(F.col("_s.d").alias("d"), F.col("_s.slot").alias("slot"))
        .groupBy("d", "slot")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(
    df: DataFrame,
    value_col: str,
    cms: DataFrame,
    width: int = 1024,
    depth: int = 3,
    out_col: str = "est_count",
) -> DataFrame:
    """Frequency estimate per input row: ``(value_col, out_col)``.
    Row-local hash positions → broadcast left join against the sketch
    (≤ depth×width rows) → min over the depth rows. A slot the sketch
    never touched has count 0. ``width``/``depth`` must match the build
    (they define the hash family). The only probe-sized shuffle is the
    final value-keyed min-groupBy, partial-agged map-side.
    """
    pos = df.select(F.col(value_col).alias("_v")).select(
        "_v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_slot(F.col("_v").cast("string"), d, width).alias(
                            "slot"
                        ),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_s"),
    ).select("_v", F.col("_s.d").alias("d"), F.col("_s.slot").alias("slot"))
    hit = pos.join(F.broadcast(cms), ["d", "slot"], "left").select(
        "_v", F.coalesce(F.col("cnt"), F.lit(0)).alias("_c")
    )
    return hit.groupBy("_v").agg(F.min("_c").alias(out_col)).select(
        F.col("_v").alias(value_col), out_col
    )


def hll_intersection_estimate(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    lg_k: int = 12,
) -> DataFrame:
    """Estimated distinct-value overlap between two groups by
    inclusion-exclusion over HLL sketches:
    ``|A ∩ B| ≈ est(A) + est(B) − est(A ∪ B)`` — the set operation HLL
    cannot do natively (it only unions), done the standard way. One row:
    ``(est_a, est_b, est_union, est_intersection)``.

    Error caveat (why the gate is a bound, not a hash): the
    inclusion-exclusion difference inherits the ABSOLUTE errors of
    three estimates, so its RELATIVE error scales with
    ``|A ∪ B| / |A ∩ B|`` — fine for substantially overlapping sets,
    useless for near-disjoint ones; consumers needing small-overlap
    precision should use exact semi-join counts instead.

    Scale: two sketch aggregations sharing one scan (conditional agg),
    KB of state, zero data shuffles beyond the sketch partials.
    """
    v = F.col(value_col)
    g = F.col(group_col)
    row = df.filter(g.isin([group_a, group_b])).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.when(g == group_a, v), F.lit(lg_k))
        ).alias("est_a"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.when(g == group_b, v), F.lit(lg_k))
        ).alias("est_b"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(v, F.lit(lg_k))
        ).alias("est_union"),
    )
    return row.select(
        "est_a",
        "est_b",
        "est_union",
        (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
            "est_intersection"
        ),
    )


def misra_gries_summary(df: DataFrame, value_col: str, k: int) -> DataFrame:
    """ONE-pass mergeable Misra-Gries frequency summary: at most ``k``
    ``(value, est_count)`` rows per partition, merged by summing
    estimates, with the classic deterministic guarantee

        est(v) <= true(v)   and   true(v) - est(v) <= n / (k + 1)

    (Misra & Gries 1982; mergeability per Agarwal et al. 2012,
    "Mergeable Summaries"). The complement of :func:`heavy_hitters`,
    which re-scans to EXACT counts: use this when a second pass is
    unaffordable (a stream, an expensive source scan) and a bounded
    underestimate suffices. Every value with true frequency > n/(k+1)
    is guaranteed present.

    NOTE the reported rows and estimates depend on partition/batch
    layout (any valid MG summary does); only the BOUNDS are
    deterministic — which is exactly what the gate query checks, the
    ``*_bound`` contract pattern.

    Shape: one ``mapInPandas`` scan keeping <= k counters per
    partition (per Arrow batch: one vectorized ``value_counts`` merged
    into the counter dict, then one (k+1)-th-largest subtraction — no
    per-row Python), then a groupBy over <= k·partitions candidate
    rows. Summary size is kilobytes at any corpus size.
    """
    if k < 1:
        raise ValueError("misra_gries_summary: k must be >= 1")
    vals = df.select(F.col(value_col).cast("string").alias("_v")).filter(
        F.col("_v").isNotNull()
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for b in batches:
            if len(b) == 0:
                continue
            for v, c in b["_v"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                # subtract the (k+1)-th largest estimate from everything;
                # drops at least len-k counters, total decrement across
                # the run is <= n_partition/(k+1)
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    v: c - cut for v, c in counters.items() if c - cut > 0
                }
        yield pd.DataFrame(
            {"_v": list(counters.keys()),
             "_est": list(counters.values())}
        )

    cand = vals.mapInPandas(summarize, schema="_v string, _est long")
    return (
        cand.groupBy("_v")
        .agg(F.sum("_est").cast("bigint").alias("est_count"))
        .select(F.col("_v").alias(value_col), "est_count")
    )
