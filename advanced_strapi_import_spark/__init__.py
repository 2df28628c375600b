"""advanced_strapi_import_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the data-processing capabilities of the
``dataorchestration/advanced-strapi-import`` reference (a schema-driven
CSV<->table ETL engine: typed validation, FK-resolution joins, nested
component types, upsert, media pattern-matching, denormalizing export),
built Spark-first: every operator is a lazy DataFrame plan optimized by
Catalyst, never a per-row loop.

Layout:
  schema.py      content-type registry (JSON-ish schemas -> StructType + metadata)
  session.py     tuned SparkSession builder
  sources/       csv / parquet-table / zip-media sources
  operators/     validate, resolve (FK cascade), components, upsert, media,
                 export, dedup, similarity, text analysis
  functions/     scalar function library (casts, string helpers, mime map)
  plans/         the query catalog consumed by __spark_entry__.py
  streaming/     structured-streaming ingest path (beyond-parity)
"""

__version__ = "0.1.0"
