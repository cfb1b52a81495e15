"""Incremental materialized-view maintenance: apply a signed change batch
to a pre-aggregated MV WITHOUT rescanning the base relation.

This is the lakehouse pattern a 100 TB rollup lives by — the base table is
petabytes, but a day's delta is gigabytes: re-aggregating the base per
refresh is the scale-killer, so the MV refresh must touch only (a) the
delta and (b) the MV itself (both ≪ base). COUNT/SUM (and anything derived
from them row-locally — AVG = sum/count) are **self-maintainable** under
inserts AND deletes: aggregate the delta with a sign (+1 insert, −1
delete), then merge per key. MIN/MAX are not (a delete of the current min
needs the base); they need the monotone-only path (``plans/ingest``'s K6
shape) or periodic full refresh.

Reference parity: the reference ETL recomputes its dashboard tables from
scratch each run (rabarrazueta/ups-crossref-etl run loop); this operator
is the incremental generalization its A6-A8 rollups would need at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: exact accumulation type — see plans/money.py: decimal addition is
#: order-independent, so MV-path sums (base-agg + delta-agg) land on the
#: same bits as a full recompute, which is exactly the invariant an
#: incremental refresh must preserve (and what the oracle checks).
_DEC = "decimal(18,6)"


def aggregate_signed(delta: DataFrame, keys: list[str], sum_cols: list[str],
                     op_col: str = "op") -> DataFrame:
    """One aggregate over the change batch: per key, the signed row-count
    delta and signed sums (op 'I' → +1, 'D' → −1). Map-side combinable;
    the shuffle carries one row per touched key."""
    sign = F.when(F.col(op_col) == "D", F.lit(-1)).otherwise(F.lit(1))
    return delta.groupBy(*keys).agg(
        F.sum(sign).alias("_dn"),
        *[
            F.sum(sign.cast(_DEC) * F.col(c).cast(_DEC)).alias(f"_ds_{c}")
            for c in sum_cols
        ],
    )


def incremental_mv_apply(
    mv: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
    op_col: str = "op",
) -> DataFrame:
    """Merge a change batch into a COUNT/SUM materialized view.

    ``mv``: (keys..., count_col, sum_<c> DECIMAL for each c). ``delta``:
    raw change rows (keys..., sum_cols..., op 'I'/'D' — a delete carries
    the full old row image, the CDC convention of ``operators/cdc``).

    Plan shape: ONE aggregate over the delta, then ONE full-outer
    equi-join against the MV on the view key — the base relation never
    appears. Keys vanishing to zero rows drop out; keys the delta never
    touched pass through unchanged (at the storage layer that makes the
    rewrite delta-partition-prunable when the MV is key-partitioned).
    Deletes that underflow a key below zero raise no error here — the
    caller owns CDC consistency (cdc.apply_changes dedups by seq first).
    """
    d = aggregate_signed(delta, keys, sum_cols, op_col)
    merged = mv.alias("m").join(d.alias("d"), keys, "full_outer")
    new_n = F.coalesce(F.col(f"m.{count_col}"), F.lit(0)) + F.coalesce(
        F.col("d._dn"), F.lit(0)
    )
    out_cols = [F.col(k) for k in keys] + [new_n.alias(count_col)]
    for c in sum_cols:
        out_cols.append(
            (
                F.coalesce(F.col(f"m.sum_{c}"), F.lit(0).cast(_DEC))
                + F.coalesce(F.col(f"d._ds_{c}"), F.lit(0).cast(_DEC))
            ).alias(f"sum_{c}")
        )
    return merged.select(*out_cols).filter(F.col(count_col) > 0)


def build_mv(base: DataFrame, keys: list[str], sum_cols: list[str],
             count_col: str = "n_rows") -> DataFrame:
    """The initial (one-time) MV materialization: one aggregate over the
    base. Paid once; every refresh afterwards is incremental_mv_apply."""
    return base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(F.col(c).cast(_DEC)).alias(f"sum_{c}") for c in sum_cols],
    )
