"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query DataFrame at sf0.001 (smoke check)
queries()      -> {name: fn(spark, sf_dir) -> DataFrame} per SURVEY.md §2 op
oracle_sql()   -> {name: DuckDB-runnable ANSI SQL} matching each query

Both maps are generated from the single-source registry in
advanced_strapi_import_spark.plans — aliases are guaranteed consistent.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from advanced_strapi_import_spark.session import tune  # noqa: E402
from advanced_strapi_import_spark.plans.registry import QUERIES  # noqa: E402
# importing plan modules populates QUERIES
import advanced_strapi_import_spark.plans.all  # noqa: E402,F401

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune(spark)
    return QUERIES["q1_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in QUERIES.items():
        # bind tune() so driver-provided sessions get AQE/UTC knobs
        def run(spark: SparkSession, sf_dir: str, _fn=spec.fn) -> DataFrame:
            tune(spark)
            return _fn(spark, sf_dir)

        out[name] = run
    return out


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}
