"""CDC merge: apply a change batch (insert/update/delete with sequence
numbers) to a snapshot — the lakehouse MERGE INTO, expressed as pure
DataFrame ops.

Extension layer, generalizing the reference's per-row upsert loops
(author/affiliation/catalog upserts,
/root/reference/src/barrazueta_pipeline_etl_crossref.py — INSERT OR
REPLACE / UPDATE ... WHERE id=?) to set-based batch application:
the reference applies one change at a time through SQLite; at 100 TB a
day's CDC stream must be applied in ONE join pass.

Semantics (Debezium/DLT-APPLY-CHANGES-style):
- ``changes`` carries the full row image, an op column (``I``/``U``/``D``)
  and a monotonically increasing sequence column; per key, the change
  with the highest sequence wins (ties broken by op ascending — 'D'
  sorts first, so a delete deterministically wins an exact seq tie).
- Winner ``D`` → key dropped from the result; winner ``I``/``U`` → the
  change's row image replaces (or inserts) the snapshot row.
- Snapshot keys never touched by the batch pass through unchanged.

Execution shape: the last-writer window runs over the CHANGE BATCH only
(day-sized, not corpus-sized), one shuffle on key; the snapshot pays a
single key-keyed left-anti join (broadcast when the winner set is small)
plus a union — the snapshot is never window-scanned or re-sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply ``changes`` to ``snapshot`` → the next snapshot, with the
    snapshot's column set. ``changes`` must contain every snapshot
    column plus ``op_col`` and ``seq_col``."""
    missing = set(snapshot.columns) - set(changes.columns)
    if missing:
        raise ValueError(f"apply_changes: changes missing columns {sorted(missing)}")
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).asc()
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    upserts = latest.filter(F.col(op_col) != "D").select(*snapshot.columns)
    untouched = snapshot.join(
        latest.select(*key_cols), key_cols, "left_anti"
    )
    return untouched.unionByName(upserts)


def vacuum_tombstones(
    state: DataFrame,
    horizon_seq: int,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Retention compaction for a versioned CDC state table
    (``streaming/events.merge_cdc_state`` keeps delete rows as
    tombstones so stale lower-seq updates can never resurrect a key):
    drop tombstones with ``seq < horizon_seq``.

    The horizon encodes the maximum disorder the pipeline can still
    deliver — once every source guarantees nothing older than
    ``horizon_seq`` will arrive, a tombstone below it can no longer
    lose an LWW comparison to anything, so removing it is safe; above
    the horizon it must stay. Live rows are never touched. This is the
    retention policy the merge's docstring defers to — the same
    contract as Delta/Iceberg VACUUM vs time travel.

    Row-local filter — zero shuffles; run it piggybacked on any state
    rewrite.
    """
    return state.filter(
        (F.col(op_col) != "D") | (F.col(seq_col) >= F.lit(horizon_seq))
    )
