"""ups_crossref_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL (rabarrazueta/ups-crossref-etl:
``src/barrazueta_pipeline_etl_crossref.py``), extended with the operators a
large-scale LLM training-data pipeline needs (dedup, similarity search,
text analysis, multimodal plumbing) and designed for 100 TB-scale execution:

- Declarative DataFrame/SQL plans (Catalyst optimizes: pushdown, pruning,
  join strategy, AQE).
- No row-at-a-time Python UDFs in hot paths; Arrow-vectorized pandas_udfs
  only where the JVM genuinely lacks the primitive (Unicode NFC/NFKD).
- Broadcast hints for dimension tables, partition-aware writes, map-side
  partial aggregation everywhere.
"""

__version__ = "0.1.0"
