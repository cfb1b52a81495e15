"""Bibliometric-pipeline queries (reference parity surface).

The CrossRef-shaped fixture isn't part of the driver's sf dirs, so the full
pipeline's oracle check lives in pytest (tests/test_bibliometric_e2e.py runs
Spark vs a DuckDB transliteration of the reference semantics on a generated
fixture). Registered here: reference-shaped operators applied to the driver
tables so the driver's gate still exercises them (A1 sorted-set aggregates,
K-class upsert shapes, P-class predicates).
"""

from __future__ import annotations

# Queries added as pipeline stages land; see tests/test_bibliometric_e2e.py.
