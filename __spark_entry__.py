"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the engine's operator surface for the driver's
DuckDB correctness gate (CORRECTNESS_r{N}.json). Registry lives in
``ups_crossref_etl_spark.plans.registry``; this file is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ups_crossref_etl_spark.plans.registry import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: TPC-H Q1-shaped pricing summary —
    filter pushdown + wide aggregate, the engine's bread and butter."""
    specs = load_all()
    return specs["q1_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver-gated queries: every entry here has a DuckDB oracle in
    ``oracle_sql()``. Approximate/hash-seeded operational twins
    (``gate=False`` in the registry) stay out — their quality is pinned
    by oracle-checked ``*_bound``/``*_exact`` contract queries plus
    pytest; they remain first-class surface via bench.py and
    tools/dump_plans.py, which read the full registry."""
    return {name: spec.fn for name, spec in load_all().items() if spec.gate}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
