"""Range (interval) join — "find right rows within [left.ts - before,
left.ts + after]" per key. Spark plans a raw inequality join as
BroadcastNestedLoop or cartesian; the scalable shape is bucketization:

1. Bucket both sides by ``floor(ts / bucket)`` where ``bucket`` ≥ the
   window span.
2. Left rows join right buckets {b-1, b, b+1} (explode 3 bucket keys on
   the left — bounded replication, not a cross join).
3. Equi-join on (key, bucket), then apply the exact range predicate.

Cost: one shuffle on (key, bucket) and ≤3× left-side replication,
independent of data size — vs O(n·m) for the naive plan. Used by the
``q_events_range_join`` gate query (oracle: DuckDB inequality join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dates import epoch_seconds


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    on: str,
    before_s: int,
    after_s: int,
    how: str = "inner",
) -> DataFrame:
    """Rows (l, r) with same ``by`` key and
    ``l.on - before_s <= r.on <= l.on + after_s``.

    ``how``: ``inner`` or ``left``. The bucketization explodes each left
    row into 3 bucket keys, so a naive outer join would triplicate
    unmatched left rows and a post-join ``filter`` would drop their
    null-extended rows; ``left`` is therefore implemented as the inner
    bucketized join plus an anti-join restore of unmatched left rows
    (each appearing exactly once, right columns null). Other outer modes
    raise — the explode asymmetry makes them structurally incorrect here.

    Column collisions: right-side columns get an ``r_`` prefix (except the
    join key). Timestamps compared at second granularity via epoch.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"range_join supports how='inner' or 'left', got {how!r}: the "
            "3x left bucket explode cannot express right/full outer modes"
        )
    span = max(before_s, after_s)
    bucket = max(span, 1)

    l_epoch = epoch_seconds(on)
    r = right
    for c in right.columns:
        if c != by:
            r = r.withColumnRenamed(c, f"r_{c}")
    r_epoch = epoch_seconds(f"r_{on}")

    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.array(
                (l_epoch / bucket).cast("long") - 1,
                (l_epoch / bucket).cast("long"),
                (l_epoch / bucket).cast("long") + 1,
            )
        ),
    )
    rb = r.withColumn("_bucket", (r_epoch / bucket).cast("long"))
    cond = (r_epoch >= l_epoch - before_s) & (r_epoch <= l_epoch + after_s)
    inner = lb.join(rb, [by, "_bucket"], "inner").filter(cond).drop("_bucket")
    if how == "inner":
        return inner
    # Outer restore without row ids: a left row's match status depends only
    # on its column values, so identical left rows share it. Anti-join the
    # original left against the distinct matched left-value tuples with
    # null-safe equality (plain column equi-join would fail to eliminate
    # matched rows containing nulls and duplicate them into the output).
    # left_anti preserves left-side multiplicity, and — unlike a
    # monotonically_increasing_id branch — every term here is deterministic
    # under recomputation, so no rows can be dropped or duplicated when a
    # stage is retried on a cluster.
    matched_vals = inner.select(*left.columns).distinct()
    anti_cond = None
    for c in left.columns:
        clause = left[c].eqNullSafe(matched_vals[c])
        anti_cond = clause if anti_cond is None else (anti_cond & clause)
    unmatched = left.join(matched_vals, anti_cond, "left_anti")
    for c in rb.columns:
        if c not in (by, "_bucket"):
            unmatched = unmatched.withColumn(c, F.lit(None).cast(rb.schema[c].dataType))
    return inner.unionByName(unmatched)
