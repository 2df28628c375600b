"""Property-based tests (hypothesis): the cast expressions match a
Python reference implementation of the JS semantics they mirror
(/root/reference/server/services/csv-import.js:127-197) on arbitrary
inputs, not just the fixtures. Each property evaluates ONE Spark job
per generated batch (lists of strings), keeping runtime sane."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from advanced_strapi_import_spark.functions import casts as C

# printable-ish text with plenty of digit/sign/space collisions
TXT = st.text(
    alphabet=st.sampled_from(list("0123456789+-. eEyYnNtTfFaloObBxX/,_")),
    max_size=12,
)
BATCH = st.lists(TXT, min_size=1, max_size=200)

SETTINGS = dict(max_examples=5, deadline=None)


def _eval(spark, values, col_expr):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["out"] for r in df.select(col_expr.alias("out")).collect()]


def _js_parse_int(s: str):
    m = re.match(r"^\s*([+-]?\d+)", s)
    if not m:
        return None
    return int(m.group(1))


@given(BATCH)
@settings(**SETTINGS)
def test_parse_int_matches_js_semantics(spark, batch):
    batch = [s for s in batch if (v := _js_parse_int(s)) is None or abs(v) < 2**62]
    if not batch:
        return
    got = _eval(spark, batch, C.parse_int(F.col("v")))
    want = [_js_parse_int(s) for s in batch]
    assert got == want


@given(BATCH)
@settings(**SETTINGS)
def test_parse_bool_six_literals_only(spark, batch):
    got = _eval(spark, batch, C.parse_bool(F.col("v")))
    for s, g in zip(batch, got):
        low = s.lower()
        if low in ("true", "1", "yes"):
            assert g is True
        elif low in ("false", "0", "no"):
            assert g is False
        else:
            assert g is None


@given(BATCH)
@settings(**SETTINGS)
def test_is_numeric_accepts_only_python_parseable(spark, batch):
    got = _eval(spark, batch, C.is_numeric(F.col("v")))
    for s, g in zip(batch, got):
        if g:
            # acceptance implies a real numeric literal with a leading digit
            float(s.strip())
            assert re.match(r"^\s*[+-]?\d", s)


@given(BATCH)
@settings(**SETTINGS)
def test_split_trim_matches_js(spark, batch):
    # guard against Spark's split-on-regex: comma is literal here
    got = _eval(spark, batch, C.split_trim(F.col("v")))
    want = [[t.strip() for t in s.split(",")] for s in batch]
    assert got == want
