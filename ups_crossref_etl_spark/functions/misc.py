"""F11-F15 (SURVEY.md §2.6): coercions, defaults, sede classification,
timestamps, run-param JSON."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def try_long(col: Column) -> Column:
    """F11: ``pd.to_numeric(errors='coerce')`` → ``try_cast`` (invalid → null)."""
    return col.try_cast("bigint")


def default_zero(col: Column) -> Column:
    """F12: ``it.get(k, 0)`` → null-to-0."""
    return F.coalesce(col, F.lit(0))


def classify_sede(aff_norm: Column, is_ups: Column) -> Column:
    """F13 (:631-637): ordered city-keyword first-match, default 4 (Otra);
    only meaningful when the affiliation is UPS, else null."""
    sede = (
        F.when(aff_norm.contains("cuenca"), F.lit(1))
        .when(aff_norm.contains("quito"), F.lit(2))
        .when(aff_norm.contains("guayaquil"), F.lit(3))
        .otherwise(F.lit(4))
    )
    return F.when(is_ups, sede)


def now_str() -> Column:
    """F14: ``time.strftime('%Y-%m-%d %H:%M:%S')`` (:550,735)."""
    return F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss")


def params_json(**cols: Column) -> Column:
    """F15: ``json.dumps({...})`` of run params (:553)."""
    return F.to_json(F.struct(*[c.alias(k) for k, c in cols.items()]))
