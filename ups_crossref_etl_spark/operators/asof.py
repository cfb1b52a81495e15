"""As-of join — Spark has no native one (guide: OLAP patterns).

Implementation: the union-tag trick, not a per-group ``merge_asof``:
tag right rows 0 / left rows 1, union, then one window sorted by
(key, ts, tag) carries the last right value forward onto each left row
(``last_value(..., ignorenulls)``). Cost = one shuffle on the key — the
same partitioning a plain join would need — and no Python. This is the
scalable shape; ``applyInPandas``+``merge_asof`` would move every byte
through Arrow and serialize per group.

Semantics: for each left row, the most recent right row with
``right.ts <= left.ts`` (strict ``<`` optional) within the same key.
Right rows that tie on ts with a left row sort before it (tag order), so
``<=`` holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    strict: bool = False,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row + the latest preceding right values.

    ``on``: ordering column (timestamp); ``by``: equi-key; ``right_cols``:
    columns carried from the right side (suffixed).
    """
    lcols = left.columns
    tag_left, tag_right = (1, 0) if not strict else (0, 1)
    l_t = left.withColumn("_tag", F.lit(tag_left))
    for c in right_cols:
        l_t = l_t.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    r_t = right.select(
        F.col(by),
        F.col(on),
        F.lit(tag_right).alias("_tag"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    for c in lcols:
        if c not in (by, on) and c not in r_t.columns:
            r_t = r_t.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_t.unionByName(r_t, allowMissingColumns=True)

    # Tiebreak: when multiple right rows share the same (by, on), ordering
    # by (on, _tag) alone leaves their relative order partition-dependent
    # and last() would pick an arbitrary one. Appending the carried value
    # columns pins it: the row with the greatest value tuple wins,
    # deterministically. (Left rows hold nulls there; nulls sort first
    # under asc, and left-row relative order is irrelevant — each left row
    # is its own output row and ignorenulls skips other left rows.)
    w = (
        Window.partitionBy(by)
        .orderBy(on, "_tag", *[f"{c}{suffix}" for c in right_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in lcols],
        "_tag",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return filled.filter(F.col("_tag") == tag_left).drop("_tag")
