"""Institutional catalog: CSV scan (S4), seed rows (K1), and the K7
upsert (reference ``integrate_ups_catalog_and_label_affiliations``
:405-430 — temp table + correlated UPDATE + NOT-EXISTS INSERT becomes one
``new ∪ (old ⟵anti⟶ new)`` overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import catalog_csv_schema

# Reference seed (data/ups_institucional.csv; FIXTURES.md §2)
SEED_ROWS = [
    (1, "Sede Cuenca", "Ciencias de la Vida", "cuenca;azuay"),
    (2, "Sede Quito", "Ingenierías y Arquitectura", "quito;pichincha"),
    (3, "Sede Guayaquil", "Ciencias Sociales y Humanas", "guayaquil;guayas"),
    (4, "Otra", "No definida", ""),
]


def seed_catalog(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(SEED_ROWS, schema=catalog_csv_schema)


def read_catalog_csv(spark: SparkSession, path: str) -> DataFrame:
    """S4: header CSV with declared schema (never inferSchema in prod)."""
    return spark.read.option("header", True).schema(catalog_csv_schema).csv(path)


def upsert_catalog(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """K7: incoming rows win on SedeID; existing rows without a match
    survive. (MERGE INTO once a Delta-like format is added; this is the
    format-agnostic equivalent.)"""
    keep_old = existing.join(incoming, "SedeID", "left_anti")
    return incoming.unionByName(keep_old)
