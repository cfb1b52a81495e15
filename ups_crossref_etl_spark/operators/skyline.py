"""Distributed skyline (Pareto frontier) query.

Multi-criteria selection without a scoring function: keep every row not
DOMINATED by another (dominated = another row is at least as good on
every criterion and strictly better on one). The catalog question
"cheapest-largest parts", the curation question "shortest docs with the
highest quality score" — any time two objectives trade off and
collapsing them to a weighted score would beg the question.

Reference parity note: no counterpart in /root/reference (a
SQLite/pandas bibliometric ETL) — analytics extension surface, same
family as operators/stats.py.

Scale shape — the classic two-phase distributed skyline:
1. LOCAL phase: each partition computes its own skyline inside an
   Arrow-batched ``mapInPandas`` kernel (O(n·|local skyline|) with a
   sort-based sweep). Dominance is transitive, so any row dominated
   locally is dominated globally — partitions prune independently,
   and the shuffle carries only local-skyline survivors (for real
   data distributions a tiny fraction of the input).
2. GLOBAL phase: the survivor union is re-checked with the same kernel
   on ONE partition. Survivor counts are skyline-sized, not
   input-sized; if a pathological distribution made the union large,
   phase 1 can be iterated with a repartition in between (same kernel,
   no new code) — documented, not needed at any tested SF.

Determinism: the skyline SET is unique (duplicate points dominate each
other non-strictly, so both survive); no ordering, no tie-break needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["skyline"]


def _local_skyline(pdf: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    """Sort-sweep skyline, all criteria MINIMIZED: sort by (c0, c1, ...)
    ascending, then keep a row iff no kept row dominates it. Sorting
    guarantees a dominator always precedes its victim, so one pass over
    the sorted frame with a kept-list suffices."""
    if pdf.empty:
        return pdf
    s = pdf.sort_values(cols, kind="mergesort").reset_index(drop=True)
    vals = s[cols].to_numpy(dtype=np.float64)
    kept_idx: list[int] = []
    kept_vals: list[np.ndarray] = []
    for i in range(len(s)):
        v = vals[i]
        dominated = False
        for kv in kept_vals:
            if (kv <= v).all() and (kv < v).any():
                dominated = True
                break
        if not dominated:
            kept_idx.append(i)
            kept_vals.append(v)
    return s.iloc[kept_idx]


def skyline(
    df: DataFrame,
    minimize: list[str] | None = None,
    maximize: list[str] | None = None,
) -> DataFrame:
    """Rows on the Pareto frontier of the given criteria. ``maximize``
    columns are negated internally so the kernel minimizes everything;
    output rows keep their original values and all other columns.

    Rows with a NULL or NaN criterion value are DROPPED up front: in the
    float64 kernel they would become NaN, which never dominates and is
    never dominated, so they would silently survive every frontier —
    diverging from the SQL NOT-EXISTS dominance semantics this operator
    mirrors. Dropping matches SQL, where a NULL comparison keeps the row
    out of both sides of the dominance predicate."""
    minimize = list(minimize or [])
    maximize = list(maximize or [])
    if not minimize and not maximize:
        raise ValueError("skyline: need at least one criterion")
    from pyspark.sql import functions as F

    neg = [f"_neg_{c}" for c in maximize]
    work = df
    for c in minimize + maximize:
        v = F.col(c).cast("double")
        work = work.filter(v.isNotNull() & ~F.isnan(v))
    for c, n in zip(maximize, neg):
        work = work.withColumn(n, -F.col(c).cast("double"))
    crit = minimize + neg
    schema = work.schema

    def kernel(it):
        chunks = [pdf for pdf in it if not pdf.empty]
        if not chunks:
            return
        yield _local_skyline(pd.concat(chunks, ignore_index=True), crit)

    # materialize phase 1 before the single-partition pass: coalesce(1)
    # is a NARROW dependency, so without the checkpoint the one global
    # task would execute every local kernel itself, serially
    local = work.mapInPandas(kernel, schema=schema).localCheckpoint()
    glob = local.coalesce(1).mapInPandas(kernel, schema=schema)
    return glob.drop(*neg)
