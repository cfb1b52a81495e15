"""Re-export: the fixture lives in the package (see plans/bibliometric_queries)."""

from ups_crossref_etl_spark.fixtures import UPS, make_works  # noqa: F401
