"""Snapshot diff — classify row-level changes between two table versions.

Lakehouse table maintenance needs the inverse of CDC apply
(``operators/cdc.apply_changes`` turns a change batch into a new
snapshot): given two SNAPSHOTS of the same keyed table, recover the
change set — which keys were inserted, deleted, or updated, and for
updates, WHICH columns changed. This backs incremental re-processing
("only re-embed the docs whose text changed"), audit ("what did the
last ingest touch?"), and snapshot-equality verification beyond the
order-insensitive digest (``operators/profile.table_digest`` says THAT
two snapshots differ; ``snapshot_diff`` says WHERE).

Reference parity note: the reference pipeline (/root/reference,
rabarrazueta/ups-crossref-etl) re-runs its SQLite upserts blind — it
has no change accounting; this operator is lakehouse extension surface,
same family as operators/cdc.py and operators/profile.py.

Scale shape (100 TB):
- ONE key-keyed full-outer hash join is the only corpus shuffle; both
  sides are pre-filterable (snapshot pruning / partition predicates
  push below the join);
- change classification and the changed-column set are row-local
  codegen (null-safe ``<=>`` comparisons + an array filter) — no
  per-column shuffles, no unpivot;
- the common case (unchanged row) can be dropped BEFORE any downstream
  consumer sees it (``include_unchanged=False``), so the diff output is
  proportional to the churn, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two snapshots of a keyed table.

    Returns one row per key present in either snapshot:
    ``(key, op, changed_cols)`` where ``op`` is ``I`` (insert: key only
    in ``new``), ``D`` (delete: key only in ``old``), ``U`` (update: in
    both, at least one compared column differs) or — only when
    ``include_unchanged=True`` — ``N`` (no change). ``changed_cols`` is
    the comma-joined sorted list of differing column names (empty for
    I/D/N): null→value and value→null count as changes, null→null does
    not (null-safe ``<=>`` semantics on both engines).

    ``compare_cols`` defaults to every shared non-key column. Keys are
    assumed unique per snapshot (pre-aggregate otherwise — same contract
    as ``cdc.apply_changes``).
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c != key_col]

    o = old.select(
        F.col(key_col).alias("_k"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(key_col).alias("_k"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, "_k", "full_outer")

    # Null-safe per-column inequality; BOTH-present rows only.
    diff_names = F.filter(
        F.array(
            *[
                F.when(
                    ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                ).otherwise(F.lit(None))
                for c in sorted(compare_cols)
            ]
        ),
        lambda x: x.isNotNull(),
    )
    op = (
        F.when(F.col("_in_old").isNull(), F.lit("I"))
        .when(F.col("_in_new").isNull(), F.lit("D"))
        .when(F.size(diff_names) > 0, F.lit("U"))
        .otherwise(F.lit("N"))
    )
    out = j.select(
        F.col("_k").alias(key_col),
        op.alias("op"),
        F.when(op == "U", F.array_join(diff_names, ","))
        .otherwise(F.lit(""))
        .alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.filter(F.col("op") != "N")
    return out
