"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

Extension layer — the data-layout side of the 100 TB story. Range
partitioning on ONE column gives pruning on that column only; writing
files clustered by the Z-order interleave of two (or more) dimension
keys gives every dimension locality, so min/max file statistics prune
scans filtered on EITHER dimension. This is the technique behind
Delta/Iceberg ``OPTIMIZE ZORDER BY`` — here expressed as plain Spark:
a codegen bit-interleave expression plus ``repartitionByRange`` on the
resulting key.

Everything is integer bit arithmetic (``shiftright``/``shiftleft``/
``&``/``|``) — whole-stage-codegen JVM expressions, no UDF, and exactly
reproducible in ANSI SQL for the oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton interleave of the low ``bits`` of two non-negative ints:
    bit *i* of ``x`` lands at position ``2i``, bit *i* of ``y`` at
    ``2i+1``. Values are clamped into ``[0, 2^bits)`` first so outliers
    can't scatter the curve."""
    cap = F.lit((1 << bits) - 1)
    xc = F.least(F.greatest(x.cast("bigint"), F.lit(0)), cap)
    yc = F.least(F.greatest(y.cast("bigint"), F.lit(0)), cap)
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(
            F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_key_sql(x_expr: str, y_expr: str, bits: int = 8) -> str:
    """The identical interleave as an ANSI-SQL expression string (used by
    the DuckDB oracle so both engines compute the same key)."""
    xc = f"LEAST(GREATEST(CAST({x_expr} AS BIGINT), 0), {(1 << bits) - 1})"
    yc = f"LEAST(GREATEST(CAST({y_expr} AS BIGINT), 0), {(1 << bits) - 1})"
    parts = []
    for i in range(bits):
        parts.append(f"((({xc} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({yc} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(parts) + ")"


def repartition_by_zorder(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster the DataFrame along the Z-curve: compute the interleave
    key and ``repartitionByRange`` on it, so each output file covers a
    compact 2-D tile and its per-file min/max stats prune on either
    dimension. The write-side half of the layout story — pair with a
    parquet write; the key column is dropped before handing back."""
    keyed = df.withColumn("_zk", zorder_key(F.col(x_col), F.col(y_col), bits))
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(n, "_zk").drop("_zk")


def zorder_tile_stats(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 8,
    tile_shift: int = 8,
) -> DataFrame:
    """Data-skipping evidence for the Z-layout: group rows by Z-curve
    tile (key >> ``tile_shift`` — contiguous curve segments, i.e. what
    a range-partitioned file would hold) and emit each tile's row count
    and x/y bounding box. Tight per-tile boxes == effective min/max
    pruning on both dimensions; a non-clustered layout gives every
    "file" the full value range. One map-side-combinable groupBy on a
    derived integer — the audit costs one scan."""
    zk = zorder_key(x, y, bits)
    return (
        df.select(
            F.shiftright(zk, tile_shift).alias("tile"),
            x.cast("bigint").alias("_x"),
            y.cast("bigint").alias("_y"),
        )
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_x").alias("x_min"),
            F.max("_x").alias("x_max"),
            F.min("_y").alias("y_min"),
            F.max("_y").alias("y_max"),
        )
    )


def file_pruning_stats(
    path: str, col: str, lo, hi
) -> dict:
    """Measure how effective a parquet layout's min/max file statistics
    are for a range predicate ``lo <= col <= hi``: read every file's
    footer (column chunk min/max — metadata only, zero data IO) and
    count the files the scan could SKIP because their range cannot
    intersect the predicate. This is the number Z-order / sort /
    partition layout decisions exist to move — "we clustered by X" is a
    claim; ``files_skipped / files_total`` is the measurement, and the
    same arithmetic the engine's own PushedFilters row-group pruning
    performs at scan time.

    Driver-side footer walk (pyarrow) — footers are KBs; at lake scale
    run the same logic over the table manifest instead of listing.
    Returns ``{files_total, files_skipped, files_scanned, skip_frac}``.
    """
    import os

    import pyarrow.parquet as pq

    total = skipped = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            total += 1
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            fmin = fmax = None
            all_groups_have_stats = md.num_row_groups > 0
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                got = False
                for ci in range(row_group.num_columns):
                    c = row_group.column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        if s.has_min_max:
                            got = True
                            fmin = s.min if fmin is None else min(fmin, s.min)
                            fmax = s.max if fmax is None else max(fmax, s.max)
                if not got:
                    # ANY stats-less row group could hold matching rows:
                    # the whole file must scan (never skip blindly)
                    all_groups_have_stats = False
            if (
                all_groups_have_stats
                and fmin is not None
                and (fmax < lo or fmin > hi)
            ):
                skipped += 1
    return {
        "files_total": total,
        "files_skipped": skipped,
        "files_scanned": total - skipped,
        "skip_frac": round(skipped / total, 4) if total else 0.0,
    }
