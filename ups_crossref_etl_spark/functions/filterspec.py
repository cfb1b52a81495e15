"""Declarative filter-spec compiler: JSON-able dicts → Catalyst columns.

Curation pipelines don't hardcode their filters — release configs do
("keep lang in [en, es], quality >= 0.7, NOT source like 'spam%'"), and
the config must be reviewable, diffable, and engine-agnostic. This
compiles a nested spec into ONE pyspark Column expression, so the
entire config-driven filter stays inside whole-stage codegen and pushes
down to the parquet scan like any hand-written predicate — the
alternative (a Python row predicate over the config) forfeits pushdown
and codegen in one stroke.

Reference parity note: generalizes the reference pipeline's hardcoded
WHERE clauses (/root/reference, rabarrazueta/ups-crossref-etl — fixed
filter strings per query) into data: the filter is a value, not code.

Spec grammar (one operator per dict):
    {"and": [spec, ...]}        {"or": [spec, ...]}       {"not": spec}
    {"col": c, "op": "eq"|"ne"|"lt"|"le"|"gt"|"ge", "value": v}
    {"col": c, "op": "in", "value": [v, ...]}
    {"col": c, "op": "like", "value": "pat%"}
    {"col": c, "op": "rlike", "value": "^regex$"}
    {"col": c, "op": "between", "value": [lo, hi]}   (inclusive)
    {"col": c, "op": "null"} / {"col": c, "op": "notnull"}
Unknown operators raise — a config typo must fail loudly at compile
time, not silently keep everything.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["compile_filter"]

_BINOPS = {
    "eq": lambda c, v: c == v,
    "ne": lambda c, v: c != v,
    "lt": lambda c, v: c < v,
    "le": lambda c, v: c <= v,
    "gt": lambda c, v: c > v,
    "ge": lambda c, v: c >= v,
}


def compile_filter(spec: dict) -> Column:
    """Compile a filter spec to one boolean Column (see module doc)."""
    if not isinstance(spec, dict):
        raise ValueError(f"filter spec must be a dict, got {type(spec).__name__}")
    if "and" in spec:
        parts = [compile_filter(s) for s in spec["and"]]
        if not parts:
            raise ValueError("empty 'and' list")
        out = parts[0]
        for p in parts[1:]:
            out = out & p
        return out
    if "or" in spec:
        parts = [compile_filter(s) for s in spec["or"]]
        if not parts:
            raise ValueError("empty 'or' list")
        out = parts[0]
        for p in parts[1:]:
            out = out | p
        return out
    if "not" in spec:
        return ~compile_filter(spec["not"])

    col, op = spec.get("col"), spec.get("op")
    if not col or not op:
        raise ValueError(f"leaf spec needs 'col' and 'op': {spec!r}")
    c = F.col(col)
    if op in _BINOPS:
        return _BINOPS[op](c, F.lit(spec["value"]))
    if op == "in":
        return c.isin(list(spec["value"]))
    if op == "like":
        return c.like(spec["value"])
    if op == "rlike":
        return c.rlike(spec["value"])
    if op == "between":
        lo, hi = spec["value"]
        return c.between(F.lit(lo), F.lit(hi))
    if op == "null":
        return c.isNull()
    if op == "notnull":
        return c.isNotNull()
    raise ValueError(f"unknown filter op {op!r} in {spec!r}")
