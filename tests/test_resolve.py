"""Unit tests for the FK cascade resolver (J1-J4), mirroring
tests/services/csv-import.test.js:194-230 and :297-366."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_strapi_import_spark.operators import resolve as R
from fixtures_ct import COUNTRIES, REGISTRY

COUNTRY = REGISTRY.get("country")
COMPANY = REGISTRY.get("company")
USERS = REGISTRY.get("users")


def _countries(spark):
    return spark.createDataFrame(COUNTRIES, "id long, name string, code string")


def _vals(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], f"{R.VALUE_COL} string")


def resolved_map(spark, vals, **kw):
    out = R.resolve_values(_vals(spark, vals), _countries(spark), COUNTRY, REGISTRY, **kw)
    return {r[R.VALUE_COL]: r[R.RESOLVED_COL] for r in out.collect()}


def test_cascade_exact_name_case_insensitive(spark):
    m = resolved_map(spark, ["india", "CHINA", "nowhere"])
    assert m == {"india": 1, "CHINA": 3}


def test_cascade_numeric_id(spark):
    m = resolved_map(spark, ["2", "99"])
    assert m == {"2": 2}


def test_cascade_contains_fallback(spark):
    # no exact match; 'nited Stat' is contained in 'United States'
    m = resolved_map(spark, ["nited Stat"])
    assert m == {"nited Stat": 2}


def test_cascade_search_field(spark):
    m = resolved_map(spark, ["in", "US"], search_field="code")
    # exact $eqi on code: IN -> 1, US -> 2 (not USA id 4 via name)
    assert m == {"in": 1, "US": 2}


def test_precedence_id_beats_name_contains(spark):
    # value '1' is numeric -> id arm (rank before contains arm)
    m = resolved_map(spark, ["1"])
    assert m == {"1": 1}


def test_search_field_contains_beats_lower_exact(spark):
    # Reference strategy order (csv-import.js findRelatedEntity):
    # searchField $eqi, searchField $containsi, id, common-field $eqi.
    # Value '5' misses code-exact, HITS code-contains ('X5Y' contains
    # '5') and also hits the lower-precedence id arm (id=5). The
    # contains hit must win — the old all-exact-arms anti-join would
    # never generate it.
    dim = spark.createDataFrame(
        [(1, "Aland", "X5Y"), (5, "Five", "FV")],
        "id long, name string, code string",
    )
    out = R.resolve_values(
        _vals(spark, ["5"]), dim, COUNTRY, REGISTRY, search_field="code"
    )
    m = {r[R.VALUE_COL]: r[R.RESOLVED_COL] for r in out.collect()}
    assert m == {"5": 1}


def test_scalar_relation_resolution(spark):
    df = spark.createDataFrame(
        [(1, "Acme", "India"), (2, "Belco", "usa"), (3, "Cori", "Atlantis")],
        "__row long, name string, country string",
    )
    out = R.resolve_relation(
        df, "country", COMPANY, _countries(spark), COUNTRY, REGISTRY
    )
    got = {r["name"]: r["country"] for r in out.collect()}
    # miss -> null (reference drops the key: csv-import.js:471)
    assert got == {"Acme": 1, "Belco": 4, "Cori": None}


def test_multi_relation_resolution(spark):
    df = spark.createDataFrame(
        [(1, "A", "India, China"), (2, "B", "India,nowhere"), (3, "C", "zzz")],
        "__row long, name string, tags string",
    )
    out = R.resolve_relation(
        df, "tags", USERS, _countries(spark), COUNTRY, REGISTRY
    )
    got = {r["name"]: r["tags"] for r in out.collect()}
    assert got["A"] == [1, 3]      # input order preserved
    assert got["B"] == [1]         # miss dropped
    assert got["C"] is None        # all missed -> field dropped


def test_dot_notation_precedence(spark):
    df = spark.createDataFrame(
        [(1, "Acme", "ignored", "CN")],
        "__row long, name string, country string, __dot__country__code string",
    )
    out = R.resolve_relation(
        df, "country", COMPANY, _countries(spark), COUNTRY, REGISTRY,
        search_field="code", dot_col="__dot__country__code",
    )
    assert out.collect()[0]["country"] == 3
