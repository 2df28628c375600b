"""Unit tests for component construction (J5/A3) incl. the
relation-inside-component cascade, and export flatten round-trips
(F20) — mirroring FIXTURES.md §5 (challan/do_quantity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_strapi_import_spark.operators import components as CMP
from advanced_strapi_import_spark.operators import export as X
from advanced_strapi_import_spark.schema import Attribute, ContentType
from fixtures_ct import COUNTRIES, REGISTRY

ADDRESS = REGISTRY.components["address"]
DO_CT = ContentType(
    uid="test.do",
    attributes={
        "do_number": Attribute(type="string"),
        "quantity": Attribute(type="float"),
    },
)


def test_ragged_pivot_pads_null(spark):
    # sample-with-components.csv: "DO-1,DO-2" with "100.5" -> second
    # struct has null quantity (A3)
    df = spark.createDataFrame(
        [("CH001", "DO-1", "100.5"), ("CH003", "DO-3,DO-4", "150.25,75.5"),
         ("CH005", "DO-5", "1.5,2.5,bad")],
        "challan string, dos string, qtys string",
    )
    out = CMP.build_repeatable_component(
        df, "do_quantity", DO_CT, {"do_number": "dos", "quantity": "qtys"}
    )
    got = {r["challan"]: r["do_quantity"] for r in out.collect()}
    assert [tuple(s) for s in got["CH003"]] == [("DO-3", 150.25), ("DO-4", 75.5)]
    assert [tuple(s) for s in got["CH001"]] == [("DO-1", 100.5)]
    # ragged: 3 qtys vs 1 do -> 3 structs, do_number null past end,
    # unparseable qty -> null (csv-import.js:774-803 coerce-to-null)
    assert [tuple(s) for s in got["CH005"]] == [
        ("DO-5", 1.5), (None, 2.5), (None, None)
    ]


def test_relation_inside_component_resolves(spark):
    countries = spark.createDataFrame(COUNTRIES, "id long, name string, code string")
    df = spark.createDataFrame(
        [("A", "MG Road,Other St", "India,china"), ("B", "Main", "nowhere")],
        "name string, streets string, countries string",
    )
    out = CMP.build_repeatable_component(
        df, "addresses", ADDRESS,
        {"street": "streets", "country": "countries"},
        registry=REGISTRY, targets={"country": countries},
    )
    got = {r["name"]: [tuple(s) for s in r["addresses"]] for r in out.collect()}
    # J5: tokens resolved through the same cascade; misses null
    assert got["A"] == [("MG Road", 1), ("Other St", 3)]
    assert got["B"] == [("Main", None)]


def test_single_component_and_flatten_roundtrip(spark):
    df = spark.createDataFrame(
        [("A", "MG Road", "Pune")], "name string, `addr.street` string, `addr.city` string"
    )
    built = CMP.build_single_component(
        df, "addr", ADDRESS, {"street": "addr.street", "city": "addr.city"}
    )
    assert built.select("addr.street").collect()[0][0] == "MG Road"
    flat = X.flatten_single_component(built, "addr")
    assert set(flat.columns) == {"name", "addr.street", "addr.city"}


def test_flatten_repeatable_one_based_columns(spark):
    df = spark.createDataFrame(
        [("CH001", "DO-1,DO-2", "1.5,2.5"), ("CH002", "DO-9", "9.0")],
        "challan string, dos string, qtys string",
    )
    built = CMP.build_repeatable_component(
        df, "dq", DO_CT, {"do_number": "dos", "quantity": "qtys"}
    )
    flat = X.flatten_repeatable_component(built, "dq")
    # F20: 1-based `field.{i}.key` columns sized to the max array length
    assert "dq.1.do_number" in flat.columns and "dq.2.quantity" in flat.columns
    got = {r["challan"]: r for r in flat.collect()}
    assert got["CH001"]["dq.2.do_number"] == "DO-2"
    assert got["CH002"]["dq.2.do_number"] is None
