"""EP3 — cleanup + flat analytics view (reference
``pandas_cleanup_and_flatview`` :445-533, transliterated to DataFrames).

Stages: renormalize (F1/F3 twins, F11 coercion) → dropDuplicates (A3) →
referential-integrity semi-joins (P9/J9) → enrichment join chain (J1) →
groupBy(DOI) sorted-set aggregates (A1/A2) → ``vista_analisis`` (K8).

Scale: the J1 chain broadcasts autores/afiliaciones/sedes when small; at
100 TB the OAA fact shuffles once on DOI for the A1 group-back — the same
key the J2 join needs, so Catalyst reuses the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import functions as fx


def clean_tables(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """The ``*_clean`` stage (:472-495): renormalize, coerce, dedup,
    integrity-filter. Our ingest already normalizes, so renormalization is
    an idempotence guarantee, not a correction."""
    obras = (
        tables["obras"]
        .select(
            fx.standardize_doi(F.col("DOI")).alias("DOI"),
            fx.norm_text_nfc(F.col("Titulo")).alias("Titulo"),
            F.col("Anio").cast("int").alias("Anio"),
            fx.norm_text_nfc(F.col("Revista")).alias("Revista"),
            fx.norm_text_nfc(F.col("Editorial")).alias("Editorial"),
            F.col("Tipo"),
            fx.try_long(F.col("Citas").cast("string")).alias("Citas"),
            fx.try_long(F.col("Referencias").cast("string")).alias("Referencias"),
            F.col("FechaPublicacion"),
        )
        .dropDuplicates(["DOI"])
    )
    autores = tables["autores"].dropDuplicates(["AutorID"])
    afiliaciones = tables["afiliaciones"].dropDuplicates(["AfiliacionID"])
    oaa = tables["obra_autor_afiliacion"].dropDuplicates(["DOI", "AutorID", "AfiliacionID"])
    temas = tables["obra_tema"].dropDuplicates(["DOI", "Tema"])

    # P9/J9 referential integrity — semi-joins, never collected sets (:491-495)
    oaa = (
        oaa.join(obras.select("DOI"), "DOI", "left_semi")
        .join(autores.select("AutorID"), "AutorID", "left_semi")
        .join(afiliaciones.select("AfiliacionID"), "AfiliacionID", "left_semi")
    )
    temas = temas.join(obras.select("DOI"), "DOI", "left_semi")

    return {
        "obras_clean": obras,
        "autores_clean": autores,
        "afiliaciones_clean": afiliaciones,
        "obra_autor_afiliacion_clean": oaa,
        "obra_tema_clean": temas,
    }


def build_vista_analisis(
    clean: dict[str, DataFrame], sedes_areas: DataFrame
) -> DataFrame:
    """J1 chain + A1/A2 aggregates → the denormalized analytics table
    (:505-531). Multi-valued columns are '; '-joined sorted sets — set
    semantics and codepoint sort are load-bearing for oracle hashing."""
    oaa = clean["obra_autor_afiliacion_clean"]
    autores = clean["autores_clean"].select("AutorID", "NombreLimpio")
    afi = clean["afiliaciones_clean"].select(
        "AfiliacionID", "CadenaLiteral", "SedeID", "CountryCode", "CountryName", "EsUPS"
    )
    sedes = sedes_areas.select("SedeID", "Sede", "AreaAcademica")

    joined = (
        oaa.join(F.broadcast(autores), "AutorID", "left")
        .join(F.broadcast(afi), "AfiliacionID", "left")
        .join(F.broadcast(sedes), "SedeID", "left")
    )

    def sset(col: str, alias: str) -> F.Column:
        return F.array_join(
            F.array_sort(F.collect_set(col)), "; "
        ).alias(alias)

    flat = joined.groupBy("DOI").agg(
        sset("NombreLimpio", "Autores"),
        sset("CadenaLiteral", "Afiliaciones"),
        sset("Sede", "Sedes"),
        sset("AreaAcademica", "Areas"),
        sset("CountryName", "Paises"),
        sset("CountryCode", "PaisesCodigo"),
        F.max("EsUPS").alias("UPS_Flag"),
    )

    temas_g = clean["obra_tema_clean"].groupBy("DOI").agg(sset("Tema", "Temas"))

    return (
        clean["obras_clean"]
        .join(flat, "DOI", "left")  # J2
        .join(temas_g, "DOI", "left")  # J3
        .withColumn("Temas", F.coalesce("Temas", F.lit("")))  # :529 missing → ''
    )
