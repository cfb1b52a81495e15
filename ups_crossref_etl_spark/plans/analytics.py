"""EP4 — the Superset-equivalent analytics layer over ``vista_analisis``.

A6/A7/A8 dashboard aggregates + the dashboard's filter parameters
(year range, Tipo, Sede, Area — docs §2.3-2.4), plus SQL view
registration so everything is reachable via ``spark.sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def register_views(spark: SparkSession, vista: DataFrame) -> None:
    """Register vista_analisis + exploded helper views for the
    multi-valued '; '-joined columns."""
    vista.createOrReplaceTempView("vista_analisis")
    for col, view in (
        ("PaisesCodigo", "vista_paises"),
        ("Areas", "vista_areas"),
        ("Sedes", "vista_sedes"),
        ("Autores", "vista_autores"),
    ):
        vista.select(
            "DOI",
            "Anio",
            "Tipo",
            F.explode(F.split(F.col(col), "; ")).alias("valor"),
        ).filter(F.col("valor") != "").createOrReplaceTempView(view)


def apply_dashboard_filters(
    vista: DataFrame,
    year_from: int | None = None,
    year_to: int | None = None,
    tipo: str | None = None,
    sede: str | None = None,
    area: str | None = None,
) -> DataFrame:
    """Dashboard filter parity (docs §2.4 fig. 10): time range, type,
    sede membership, area membership. Sede/Area filter on the multi-valued
    columns with set-contains semantics."""
    out = vista
    if year_from is not None:
        out = out.filter(F.col("Anio") >= year_from)
    if year_to is not None:
        out = out.filter(F.col("Anio") <= year_to)
    if tipo is not None:
        out = out.filter(F.col("Tipo") == tipo)
    if sede is not None:
        out = out.filter(F.array_contains(F.split("Sedes", "; "), sede))
    if area is not None:
        out = out.filter(F.array_contains(F.split("Areas", "; "), area))
    return out


def publications_per_year(vista: DataFrame) -> DataFrame:
    """A6: chart 'Publicaciones por Año' (:dashboard chart 1)."""
    return (
        vista.filter(F.col("Anio").isNotNull())
        .groupBy("Anio")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("Anio")
    )


def publications_per_country(vista: DataFrame) -> DataFrame:
    """A7: works per collaborating country (non-EC), un-nested from the
    multi-valued PaisesCodigo column (dashboard chart 2)."""
    return (
        vista.select(F.explode(F.split("PaisesCodigo", "; ")).alias("cc"))
        .filter((F.col("cc") != "") & (F.col("cc") != "EC"))
        .groupBy("cc")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def publications_per_area(vista: DataFrame) -> DataFrame:
    """A8: works per knowledge area, un-nested from Areas (chart 3)."""
    return (
        vista.select(F.explode(F.split("Areas", "; ")).alias("area"))
        .filter(F.col("area") != "")
        .groupBy("area")
        .agg(F.count(F.lit(1)).alias("n"))
    )
