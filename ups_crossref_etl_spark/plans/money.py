"""Exact money aggregation for oracle-comparable results.

``round(sum(double), 2)`` is nondeterministic at scale: money data is
decimal-quantized, so group sums routinely land exactly on the .005
rounding boundary, and double-accumulation order (which Spark/DuckDB/AQE
never guarantee) flips the last cent. Fix: cast each term to DECIMAL before
summing — decimal addition is exact and order-independent, so both engines
produce bit-identical sums; the final round+cast back to double is then a
pure function. The per-row double→decimal cast is deterministic because
the inputs (parquet doubles) and per-row arithmetic (IEEE) are identical
on both sides.

SQL twin of ``dsum``:  CAST(round(sum(CAST(x AS DECIMAL(18,6))), 2) AS DOUBLE)
SQL twin of ``davg``:  round(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(x), 4)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DECIMAL(18,6): stays long-backed in both engines (precision ≤ 18), ~4×
# faster than an Int128-backed width, and still exact — every money term
# here is a product of ≤3 two-decimal values, so its true quantum is
# ≥ 1e-6 and the double→decimal(…,6) cast is lossless.
DEC = "decimal(18,6)"


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent money sum, rounded to ``scale`` and returned as
    double (matches the SQL twin in the module docstring)."""
    return F.round(F.sum(col.cast(DEC)), scale).cast("double")


def davg(col: Column, scale: int = 4) -> Column:
    """Deterministic mean: exact decimal sum → double → divide by count.
    Every step is a pure function of the input multiset."""
    return F.round(
        F.sum(col.cast(DEC)).cast("double") / F.count(col), scale
    )
