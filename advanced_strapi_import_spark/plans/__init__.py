"""Query catalog: every operator from SURVEY.md §2 exposed as a named
(spark_fn, oracle_sql) pair consumed by __spark_entry__.py."""

from advanced_strapi_import_spark.plans.registry import QUERIES, QuerySpec, query

__all__ = ["QUERIES", "QuerySpec", "query"]
