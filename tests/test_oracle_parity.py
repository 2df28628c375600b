"""Run every registered query against its DuckDB oracle at sf0.001 —
the same gate the driver applies at sf0.01 (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

import advanced_strapi_import_spark.plans.all  # noqa: F401
from advanced_strapi_import_spark.plans.registry import QUERIES

from conftest import SF_TEST
from oracle_utils import compare_query


def _specs():
    return [pytest.param(s, id=name) for name, s in QUERIES.items() if s.oracle]


@pytest.mark.parametrize("spec", _specs())
def test_matches_oracle(spark, duck, spec):
    problems = compare_query(spark, duck, spec, SF_TEST)
    assert not problems, "; ".join(problems)


def _rows_only_specs():
    return [pytest.param(s, id=name) for name, s in QUERIES.items() if not s.oracle]


@pytest.mark.parametrize("spec", _rows_only_specs())
def test_rows_only_queries_run(spark, spec):
    df = spec.fn(spark, SF_TEST)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
