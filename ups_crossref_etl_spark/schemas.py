"""Every StructType the engine touches.

Schema-on-read of the reference's ingest JSON becomes schema-declared here
(SURVEY.md §1.1; reference access pattern at
``src/barrazueta_pipeline_etl_crossref.py:125-138,591-706``). Missing JSON
fields surface as nulls, preserving the reference's ``.get()`` semantics.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Ingest side: CrossRef-shaped works (FIXTURES.md §1)
# --------------------------------------------------------------------------

date_parts_schema = T.StructType(
    [T.StructField("date_parts", T.ArrayType(T.ArrayType(T.IntegerType())))]
)

author_schema = T.StructType(
    [
        T.StructField("given", T.StringType()),
        T.StructField("family", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("ORCID", T.StringType()),
        T.StructField("sequence", T.StringType()),
        T.StructField(
            "affiliation",
            T.ArrayType(T.StructType([T.StructField("name", T.StringType())])),
        ),
    ]
)

works_raw_schema = T.StructType(
    [
        T.StructField("doi", T.StringType()),
        T.StructField("title", T.ArrayType(T.StringType())),
        T.StructField("container_title", T.ArrayType(T.StringType())),
        T.StructField("publisher", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("is_referenced_by_count", T.IntegerType()),
        T.StructField("reference_count", T.IntegerType()),
        T.StructField("subject", T.ArrayType(T.StringType())),
        T.StructField("author", T.ArrayType(author_schema)),
        T.StructField("published_online", date_parts_schema),
        T.StructField("published_print", date_parts_schema),
        T.StructField("issued", date_parts_schema),
        T.StructField("created", date_parts_schema),
    ]
)

# --------------------------------------------------------------------------
# Store side: relational tables (SURVEY.md §1.2; reference DDL :208-309)
# --------------------------------------------------------------------------

sedes_areas_schema = T.StructType(
    [
        T.StructField("SedeID", T.IntegerType(), False),
        T.StructField("Sede", T.StringType()),
        T.StructField("AreaAcademica", T.StringType()),
    ]
)

catalog_csv_schema = T.StructType(
    [
        T.StructField("SedeID", T.IntegerType(), False),
        T.StructField("Sede", T.StringType()),
        T.StructField("AreaAcademica", T.StringType()),
        T.StructField("PalabrasClave", T.StringType()),
    ]
)

obras_schema = T.StructType(
    [
        T.StructField("DOI", T.StringType(), False),
        T.StructField("Titulo", T.StringType()),
        T.StructField("Anio", T.IntegerType()),
        T.StructField("Revista", T.StringType()),
        T.StructField("Editorial", T.StringType()),
        T.StructField("Tipo", T.StringType()),
        T.StructField("Citas", T.LongType()),
        T.StructField("Referencias", T.LongType()),
        T.StructField("FechaPublicacion", T.StringType()),
    ]
)

autores_schema = T.StructType(
    [
        T.StructField("AutorID", T.LongType(), False),
        T.StructField("NombreLimpio", T.StringType()),
        T.StructField("NombreBusqueda", T.StringType()),
        T.StructField("Orcid", T.StringType()),
    ]
)

afiliaciones_schema = T.StructType(
    [
        T.StructField("AfiliacionID", T.LongType(), False),
        T.StructField("CadenaLiteral", T.StringType()),
        T.StructField("AfiliacionBusqueda", T.StringType()),
        T.StructField("SedeID", T.IntegerType()),
        T.StructField("CountryCode", T.StringType()),
        T.StructField("CountryName", T.StringType()),
        T.StructField("EsUPS", T.IntegerType()),
    ]
)

obra_autor_afiliacion_schema = T.StructType(
    [
        T.StructField("DOI", T.StringType(), False),
        T.StructField("AutorID", T.LongType(), False),
        T.StructField("AfiliacionID", T.LongType(), False),
        T.StructField("AutorSecuencia", T.StringType()),
    ]
)

obra_tema_schema = T.StructType(
    [
        T.StructField("DOI", T.StringType(), False),
        T.StructField("Tema", T.StringType(), False),
    ]
)

runs_schema = T.StructType(
    [
        T.StructField("RunID", T.LongType(), False),
        T.StructField("StartedAt", T.StringType()),
        T.StructField("EndedAt", T.StringType()),
        T.StructField("Query", T.StringType()),
        T.StructField("CursorInicio", T.StringType()),
        T.StructField("CursorFin", T.StringType()),
        T.StructField("RowsIngested", T.LongType()),
        T.StructField("Notes", T.StringType()),
    ]
)

# --------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md / FIXTURES.md §5)
# --------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

events_schema = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

documents_schema = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

embeddings_schema = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

# Multimodal assets: opaque payload + typed metadata (engine extension —
# no reference counterpart; columnar plumbing for image/audio/video blobs).
media_schema = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("mime_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("meta_json", T.StringType()),
    ]
)
