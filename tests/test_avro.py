"""Pure-Python Avro OCF codec + avro_py DataSource: round trips on
both codecs and union orders, CROSS-VALIDATION against the Apache Avro
Java reference reader on Spark's classpath, and the registered-format
read path."""

from __future__ import annotations

import pytest

from advanced_strapi_import_spark.sources import avro_ocf as A

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": ["null", "double"]},
        {"name": "flag", "type": "boolean"},
        {"name": "blob", "type": "bytes"},
        {"name": "alt", "type": ["int", "null"]},  # reversed union order
    ],
}
ROWS = [
    {"id": 1, "name": "alpha", "score": 1.5, "flag": True,
     "blob": b"\x00\xff", "alt": 7},
    {"id": -2, "name": "βeta", "score": None, "flag": False,
     "blob": b"", "alt": None},
    {"id": 2 ** 40, "name": "", "score": -0.25, "flag": True,
     "blob": b"xyz", "alt": -1},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip(tmp_path, codec):
    p = str(tmp_path / f"t_{codec}.avro")
    A.write_ocf(p, SCHEMA, ROWS, codec=codec, block_records=2)
    assert list(A.iter_ocf(open(p, "rb").read())) == ROWS


def test_rejects_bad_magic_and_complex_schema(tmp_path):
    with pytest.raises(ValueError, match="bad magic"):
        list(A.iter_ocf(b"NOPE" + b"x" * 64))
    nested = {"type": "record", "name": "n", "fields": [
        {"name": "a", "type": {"type": "array", "items": "long"}}]}
    with pytest.raises(ValueError, match="unsupported field type"):
        A.write_ocf(str(tmp_path / "x.avro"), nested, [])


def test_java_reference_reads_our_files(spark, tmp_path):
    """The Apache Avro JAVA implementation (avro-*.jar on Spark's
    classpath) must read our pure-Python OCF verbatim — this is the
    spec-validity proof, independent of our own decoder."""
    p = str(tmp_path / "xval.avro")
    A.write_ocf(p, SCHEMA, ROWS, codec="deflate", block_records=1)
    jvm = spark._jvm
    fr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = []
    while fr.hasNext():
        got.append(fr.next())
    fr.close()
    assert len(got) == len(ROWS)
    assert got[0].get("id") == 1 and str(got[0].get("name")) == "alpha"
    assert got[1].get("score") is None
    assert str(got[1].get("name")) == "βeta"
    assert got[2].get("id") == 2 ** 40 and got[2].get("alt") == -1


def test_datasource_read(spark, tmp_path):
    from pyspark.sql import functions as F

    from advanced_strapi_import_spark.sources.avro_datasource import (
        register_avro_datasource,
    )

    register_avro_datasource(spark)
    for i, codec in enumerate(["null", "deflate"]):
        A.write_ocf(
            str(tmp_path / f"part{i}.avro"), SCHEMA,
            [dict(r, id=r["id"] + 1000 * i) for r in ROWS], codec=codec,
        )
    df = (
        spark.read.format("avro_py")
        .option("path", str(tmp_path) + "/*.avro")
        .load()
    )
    assert df.count() == 6
    assert df.rdd.getNumPartitions() == 2  # one per file
    assert [f.name for f in df.schema.fields] == [
        "id", "name", "score", "flag", "blob", "alt",
    ]
    assert df.schema["score"].nullable and not df.schema["id"].nullable
    got = {r["id"]: r for r in df.collect()}
    assert got[1]["name"] == "alpha" and got[1]["alt"] == 7
    assert got[-2]["score"] is None
    assert bytes(got[2 ** 40 + 1000]["blob"]) == b"xyz"
    # predicates/projection compose downstream like any scan
    assert (
        df.filter(F.col("flag")).select("name").count() == 4
    )


def test_datasource_write_roundtrip(spark, tmp_path):
    """Sink half: df.write.format('avro_py') stages + publishes OCF
    part files with a _SUCCESS manifest; the Java reference reader and
    our own reader both read the published data back."""
    import json
    import os

    from advanced_strapi_import_spark.sources.avro_datasource import (
        register_avro_datasource,
    )

    register_avro_datasource(spark)
    out = str(tmp_path / "sink")
    src = spark.range(100).selectExpr(
        "id",
        "CAST(id AS STRING) AS name",
        "CASE WHEN id % 3 = 0 THEN NULL"
        " ELSE CAST(id AS DOUBLE) / 4 END AS score",
    ).repartition(3)
    src.write.format("avro_py").option("path", out).mode("append").save()
    names = sorted(os.listdir(out))
    parts = [n for n in names if n.startswith("part-") and n.endswith(".avro")]
    assert parts and "_SUCCESS" in names
    assert not [n for n in names if n.startswith(".staged-")]
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert sum(e["n_rows"] for e in manifest["files"]) == 100

    back = (
        spark.read.format("avro_py")
        .option("path", out + "/part-*.avro")
        .load()
    )
    got = {r["id"]: r for r in back.collect()}
    assert len(got) == 100
    assert got[3]["score"] is None and got[4]["score"] == 1.0
    assert got[7]["name"] == "7"

    # Java reference cross-check on a published part file
    jvm = spark._jvm
    fr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(os.path.join(out, parts[0])),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    n = 0
    while fr.hasNext():
        fr.next()
        n += 1
    fr.close()
    assert n == manifest["files"][0]["n_rows"]


def test_datasource_write_empty_and_append(spark, tmp_path):
    """Empty partitions publish header-only part files (0 blocks) that
    read back as zero rows; append mode accumulates part files."""
    import os

    from advanced_strapi_import_spark.sources.avro_datasource import (
        register_avro_datasource,
    )

    register_avro_datasource(spark)
    out = str(tmp_path / "sink2")
    empty = spark.range(0).selectExpr("id")
    empty.write.format("avro_py").option("path", out).mode("append").save()
    spark.range(5).selectExpr("id").write.format("avro_py").option(
        "path", out
    ).mode("append").save()
    back = (
        spark.read.format("avro_py").option("path", out + "/part-*.avro").load()
    )
    assert sorted(r["id"] for r in back.collect()) == [0, 1, 2, 3, 4]
    assert len([n for n in os.listdir(out) if n.startswith("part-")]) >= 2
