"""Unit tests for the validation engine (P1-P6), mirroring the
reference's service tests (tests/services/csv-import.test.js:36-192)."""

from __future__ import annotations

from advanced_strapi_import_spark.operators import validate as V
from fixtures_ct import REGISTRY

USERS = REGISTRY.get("users")
COMPANY = REGISTRY.get("company")


def _users_df(spark, rows):
    return spark.createDataFrame(
        rows, "name string, email string, age string, isActive string, joined string, status string, score string"
    )


def test_header_mapping_plain_and_dot():
    m = V.parse_header_mapping(
        ["name", "country", "country.code", "bogus", "name.x"], COMPANY, REGISTRY
    )
    assert m["name"].is_valid and m["name"].field == "name"
    assert m["country"].is_valid and not m["country"].is_dot_notation
    cc = m["country.code"]
    assert cc.is_valid and cc.is_dot_notation and cc.relation_field == "code"
    assert not m["bogus"].is_valid
    assert not m["name.x"].is_valid  # name is not relation/component


def test_schema_errors_and_warnings():
    m = V.parse_header_mapping(["email", "junk"], USERS, REGISTRY)
    errs, warns = V.schema_errors(["email", "junk"], USERS, m)
    assert any("name" in e for e in errs)          # required not mapped
    assert any("junk" in w for w in warns)         # unknown ignored


def test_relation_target_uniqueness():
    m = V.parse_header_mapping(["country.code", "country.name"], COMPANY, REGISTRY)
    errs = V.validate_relation_target_uniqueness(m, COMPANY, REGISTRY)
    # code is unique:true -> ok; name is not unique -> error
    assert any('"name"' in e and "unique" in e for e in errs)
    assert not any('"code"' in e for e in errs)


def test_casts_and_error_channel(spark):
    rows = [
        ("John", "john@example.com", "30", "true", "2023-12-25", "active", "1.5"),
        ("Ann", "ann@example.com", "28", "yes", "12/25/2023", "pending", ".5"),
        ("Bo", "bad-email", "thirty", "maybe", "not-a-date", "bogus", "x"),
        ("", "e@x.com", "1", "0", "", "", ""),
    ]
    res = V.validate_df(_users_df(spark, rows), USERS, REGISTRY)
    valid = {r["name"]: r for r in res.valid.collect()}
    assert set(valid) == {"John", "Ann"}
    assert valid["John"]["age"] == 30 and valid["John"]["isActive"] is True
    assert valid["John"]["joined"] == "2023-12-25T00:00:00.000Z"
    assert valid["Ann"]["joined"] == "2023-12-25T00:00:00.000Z"
    assert valid["Ann"]["isActive"] is True and valid["Ann"]["score"] == 0.5

    inv = {r[V.ROW_COL]: list(r[V.ERRORS_COL]) for r in res.invalid.collect()}
    assert set(inv) == {3, 4}
    assert 'Row 3: "email" must be a valid email' in inv[3]
    assert 'Row 3: "age" must be a number' in inv[3]
    assert 'Row 3: "isActive" must be true/false, 1/0, or yes/no' in inv[3]
    assert 'Row 3: "joined" must be a valid date' in inv[3]
    assert 'Row 3: "status" must be one of: active, inactive, pending' in inv[3]
    assert 'Row 3: "score" must be a decimal number' in inv[3]
    assert inv[4] == ['Row 4: Required field "name" is missing']


def test_parseint_leading_digits_js_semantics(spark):
    # JS parseInt('12abc') === 12 (csv-import.js:130)
    rows = [("A", "a@b.co", "12abc", "1", "", "", "")]
    res = V.validate_df(_users_df(spark, rows), USERS, REGISTRY)
    assert res.valid.collect()[0]["age"] == 12


def test_default_applied_when_empty(spark):
    df = spark.createDataFrame([("Acme", "")], "name string, active string")
    res = V.validate_df(df, COMPANY, REGISTRY)
    row = res.valid.collect()[0]
    assert row["active"] is True  # schema default


def test_per_file_row_numbering(spark):
    # scale mode: number rows per input file so the window parallelizes
    rows = [
        ("John", "j@x.com", "1", "1", "", "", "", "f1"),
        ("Jane", "", "bad", "1", "", "", "", "f1"),
        ("Kim", "k@x.com", "2", "1", "", "", "", "f2"),
        ("", "z@x.com", "3", "1", "", "", "", "f2"),
    ]
    df = spark.createDataFrame(
        rows,
        "name string, email string, age string, isActive string, "
        "joined string, status string, score string, src string",
    )
    res = V.validate_df(
        df, USERS, REGISTRY, order_by=["name"], row_number_partition="src"
    )
    inv = {tuple(r[V.ERRORS_COL]) for r in res.invalid.collect()}
    # numbering restarts per src file: f1 -> Jane(1), John(2); f2 -> ""(1), Kim(2)
    assert ('Row 1: "age" must be a number',) in inv
    assert ('Row 1: Required field "name" is missing',) in inv


def test_dot_notation_passthrough(spark):
    df = spark.createDataFrame(
        [("Acme", "IN", "2000")], "name string, `country.code` string, established string"
    )
    res = V.validate_df(df, COMPANY, REGISTRY)
    row = res.valid.collect()[0]
    assert row["__dot__country__code"] == "IN"
    assert row["established"] == 2000


def test_falsy_default_does_not_satisfy_required(spark):
    # JS falsiness parity (csv-import.js:198 `required && !attribute.default`):
    # default False / 0 / '' must NOT suppress the required error.
    from advanced_strapi_import_spark.schema import Registry

    reg = Registry.from_dict({
        "contentTypes": {
            "t": {
                "uid": "api::t.t",
                "attributes": {
                    "name": {"type": "string", "required": True},
                    "flag": {"type": "boolean", "required": True, "default": False},
                    "kind": {"type": "string", "required": True, "default": "x"},
                },
            }
        },
        "components": {},
    })
    df = spark.createDataFrame([("A", "", "")], "name string, flag string, kind string")
    res = V.validate_df(df, reg.get("t"), reg)
    errs = [e for r in res.invalid.collect() for e in r[V.ERRORS_COL]]
    assert any('Required field "flag" is missing' in e for e in errs)
    # truthy default still satisfies the requirement
    assert not any('"kind"' in e for e in errs)
