"""F4 ``extract_year_any`` (:125-138) and F5 ``extract_date_iso`` (:153-164).

Priority over CrossRef date fields: published_online → published_print →
issued → created; first field with a *valid* year (1600..2100) wins.
F5 builds ``YYYY-MM-DD`` with month/day defaulted to 1 — kept as a STRING
column for oracle hash parity, with a DateType twin for analytics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DATE_PRIORITY = ("published_online", "published_print", "issued", "created")


def epoch_seconds(col: Column | str) -> Column:
    """Seconds-since-epoch for TIMESTAMP **or** TIMESTAMP_NTZ columns.

    ``unix_timestamp`` accepts both; for NTZ it interprets the wall clock
    in the session time zone, which this engine pins to UTC
    (``session.py``) — exactly DuckDB's ``epoch()`` on its naive
    TIMESTAMP, so oracles stay comparable. A bare ``.cast("long")`` is an
    analysis error on NTZ (CAST_WITHOUT_SUGGESTION), which is how the
    round-4 testdata regeneration (events.ts nanos → micros/
    isAdjustedToUTC=false) broke the event-time operators. Every epoch
    extraction must route through here, never ``.cast("long")``.
    """
    c = col if isinstance(col, Column) else F.col(col)
    return F.unix_timestamp(c)


def _ymd(struct_col: Column) -> tuple[Column, Column, Column]:
    parts = struct_col.getField("date_parts")
    # try_element_at: [[y]], [[y,m]], [[y,m,d]] all occur (ANSI mode would
    # throw on the short forms with plain element_at)
    first = F.try_element_at(parts, F.lit(1))
    y = F.try_element_at(first, F.lit(1))
    m = F.try_element_at(first, F.lit(2))
    d = F.try_element_at(first, F.lit(3))
    valid_y = F.when(y.between(1600, 2100), y)  # P5 sanity window (:136,162)
    return valid_y, m, d


def extract_year_any(df_or_cols, cols: tuple[str, ...] = DATE_PRIORITY) -> Column:
    """F4: first valid year across the priority fields, else null."""
    if isinstance(df_or_cols, DataFrame):
        struct_cols = [df_or_cols[c] for c in cols]
    else:
        struct_cols = list(df_or_cols)
    return F.coalesce(*[_ymd(c)[0] for c in struct_cols])


def extract_date_iso(df_or_cols, cols: tuple[str, ...] = DATE_PRIORITY) -> Column:
    """F5: 'YYYY-MM-DD' from the first field with a valid year; m/d → 1."""
    if isinstance(df_or_cols, DataFrame):
        struct_cols = [df_or_cols[c] for c in cols]
    else:
        struct_cols = list(df_or_cols)

    def iso(c: Column) -> Column:
        y, m, d = _ymd(c)
        dt = F.make_date(y, F.coalesce(m, F.lit(1)), F.coalesce(d, F.lit(1)))
        return F.when(y.isNotNull(), F.date_format(dt, "yyyy-MM-dd"))

    return F.coalesce(*[iso(c) for c in struct_cols])
