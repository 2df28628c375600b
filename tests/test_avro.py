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
    # maps/enums/fixed/logical types AND multi-branch unions are
    # supported since round 9; named-type references remain the loud
    # subset boundary
    bad = {"type": "record", "name": "n", "fields": [
        {"name": "a", "type": "sometype"}]}
    with pytest.raises(ValueError, match="unsupported type 'sometype'"):
        A.write_ocf(str(tmp_path / "x.avro"), bad, [])


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


def test_datasource_splits_large_file_on_sync_markers(spark, tmp_path):
    """A single multi-block OCF file fans out to >1 input partition
    under a small target_partition_bytes: each split resyncs on the
    16-byte sync marker and reads exactly the blocks whose start falls
    in its byte range — rows identical to the one-partition read."""
    from advanced_strapi_import_spark.sources.avro_datasource import (
        register_avro_datasource,
    )

    register_avro_datasource(spark)
    rows = [
        {"id": i, "name": f"row-{i:06d}" * 3, "score": float(i) / 8,
         "flag": i % 2 == 0, "blob": bytes([i % 256] * 16), "alt": i % 100}
        for i in range(5000)
    ]
    p = str(tmp_path / "big.avro")
    A.write_ocf(p, SCHEMA, rows, codec="null", block_records=100)
    import os

    size = os.path.getsize(p)
    df = (
        spark.read.format("avro_py")
        .option("path", p)
        .option("target_partition_bytes", str(size // 7))
        .load()
    )
    # 6 or 7 depending on how the header bytes round: >1 is the point
    assert df.rdd.getNumPartitions() in (6, 7)
    got = sorted(r["id"] for r in df.collect())
    assert got == list(range(5000))  # no dropped or doubled blocks
    one = (
        spark.read.format("avro_py").option("path", p).load()
    )
    assert one.rdd.getNumPartitions() == 1
    assert sorted(
        tuple(r) for r in df.collect()
    ) == sorted(tuple(r) for r in one.collect())


def test_datasource_projects_reordered_file_headers(spark, tmp_path):
    """Files sharing fields in DIFFERENT header orders read back with
    consistent columns: rows are projected into the planned schema's
    field order, not each file's own (the round-8 ADVICE fix)."""
    from advanced_strapi_import_spark.sources.avro_datasource import (
        register_avro_datasource,
    )

    register_avro_datasource(spark)
    s_ab = {"type": "record", "name": "t", "fields": [
        {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}
    s_ba = {"type": "record", "name": "t", "fields": [
        {"name": "b", "type": "string"}, {"name": "a", "type": "long"}]}
    A.write_ocf(str(tmp_path / "f0.avro"), s_ab,
                [{"a": 1, "b": "one"}, {"a": 2, "b": "two"}])
    A.write_ocf(str(tmp_path / "f1.avro"), s_ba,
                [{"a": 3, "b": "three"}, {"a": 4, "b": "four"}])
    df = (
        spark.read.format("avro_py")
        .option("path", str(tmp_path) + "/*.avro")
        .load()
    )
    got = {r["a"]: r["b"] for r in df.collect()}
    assert got == {1: "one", 2: "two", 3: "three", 4: "four"}


def test_datasource_errors_on_missing_planned_field(spark, tmp_path):
    from advanced_strapi_import_spark.sources.avro_datasource import (
        register_avro_datasource,
    )

    register_avro_datasource(spark)
    s_ab = {"type": "record", "name": "t", "fields": [
        {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}
    s_a = {"type": "record", "name": "t", "fields": [
        {"name": "a", "type": "long"}]}
    A.write_ocf(str(tmp_path / "f0.avro"), s_ab, [{"a": 1, "b": "x"}])
    A.write_ocf(str(tmp_path / "f1.avro"), s_a, [{"a": 2}])
    df = (
        spark.read.format("avro_py")
        .option("path", str(tmp_path) + "/*.avro")
        .load()
    )
    with pytest.raises(Exception, match="lacks planned field"):
        df.collect()


def test_append_merges_success_manifest(spark, tmp_path):
    """Append commits merge the prior _SUCCESS manifest instead of
    rewriting it with only the latest job's files (round-8 ADVICE):
    the manifest row count must equal the directory's readable rows."""
    import json
    import os

    from advanced_strapi_import_spark.sources.avro_datasource import (
        register_avro_datasource,
    )

    register_avro_datasource(spark)
    out = str(tmp_path / "sink3")
    for lo, hi in [(0, 10), (10, 30), (30, 35)]:
        spark.range(lo, hi).selectExpr("id").coalesce(2).write.format(
            "avro_py"
        ).option("path", out).mode("append").save()
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    files = [e["file"] for e in manifest["files"]]
    on_disk = sorted(
        n for n in os.listdir(out)
        if n.startswith("part-") and n.endswith(".avro")
    )
    assert sorted(files) == on_disk  # every published file listed
    assert sum(e["n_rows"] for e in manifest["files"]) == 35
    back = (
        spark.read.format("avro_py").option("path", out + "/part-*.avro").load()
    )
    assert sorted(r["id"] for r in back.collect()) == list(range(35))


NESTED_SCHEMA = {
    "type": "record", "name": "doc", "fields": [
        {"name": "id", "type": "long"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "meta", "type": {"type": "record", "name": "meta_rec",
            "fields": [
                {"name": "w", "type": "int"},
                {"name": "h", "type": ["null", "int"]},
            ]}},
        {"name": "scores",
         "type": ["null", {"type": "array", "items": ["null", "double"]}]},
    ],
}
NESTED_ROWS = [
    {"id": 1, "tags": ["a", "b"], "meta": {"w": 3, "h": 4},
     "scores": [1.5, None, -0.25]},
    {"id": 2, "tags": [], "meta": {"w": 0, "h": None}, "scores": None},
    {"id": 3, "tags": ["μ"], "meta": {"w": -7, "h": 0}, "scores": []},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_nested_roundtrip(tmp_path, codec):
    p = str(tmp_path / f"n_{codec}.avro")
    A.write_ocf(p, NESTED_SCHEMA, NESTED_ROWS, codec=codec, block_records=2)
    assert list(A.iter_ocf(open(p, "rb").read())) == NESTED_ROWS


def test_java_reference_reads_nested(spark, tmp_path):
    """Spec-validity proof for the round-8 nested subset: the Apache
    Avro Java reader must decode our nested records and arrays."""
    p = str(tmp_path / "nested_xval.avro")
    A.write_ocf(p, NESTED_SCHEMA, NESTED_ROWS, codec="deflate")
    jvm = spark._jvm
    fr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = []
    while fr.hasNext():
        got.append(fr.next())
    fr.close()
    assert len(got) == 3
    assert got[0].get("meta").get("w") == 3
    assert got[0].get("meta").get("h") == 4
    assert [str(x) for x in got[0].get("tags")] == ["a", "b"]
    assert list(got[0].get("scores"))[1] is None
    assert got[1].get("scores") is None and got[1].get("meta").get("h") is None


def test_datasource_reads_nested(spark, tmp_path):
    from pyspark.sql import functions as F

    from advanced_strapi_import_spark.sources.avro_datasource import (
        register_avro_datasource,
    )

    register_avro_datasource(spark)
    p = str(tmp_path / "nested_ds.avro")
    A.write_ocf(p, NESTED_SCHEMA, NESTED_ROWS)
    df = spark.read.format("avro_py").option("path", p).load()
    assert df.schema["meta"].dataType.typeName() == "struct"
    assert df.schema["tags"].dataType.typeName() == "array"
    assert df.schema["scores"].nullable
    got = {r["id"]: r for r in df.collect()}
    assert got[1]["meta"]["w"] == 3 and got[1]["meta"]["h"] == 4
    assert got[2]["meta"]["h"] is None and got[2]["scores"] is None
    assert list(got[1]["tags"]) == ["a", "b"]
    # nested columns compose with Spark expressions like any scan
    assert df.select(F.col("meta.w")).filter("meta.w > 0").count() == 1


def test_datasource_writes_nested_and_java_reads(spark, tmp_path):
    import os

    from advanced_strapi_import_spark.sources.avro_datasource import (
        register_avro_datasource,
    )

    register_avro_datasource(spark)
    out = str(tmp_path / "nested_sink")
    src = spark.range(6).selectExpr(
        "id",
        "named_struct('w', CAST(id AS INT),"
        " 'h', CASE WHEN id % 2 = 0 THEN CAST(id*2 AS INT) END) AS meta",
        "array(CAST(id AS STRING), 'x') AS tags",
    ).coalesce(1)
    src.write.format("avro_py").option("path", out).mode("overwrite").save()
    back = (
        spark.read.format("avro_py").option("path", out + "/part-*.avro").load()
    )
    got = {r["id"]: r for r in back.collect()}
    assert got[2]["meta"]["h"] == 4 and got[3]["meta"]["h"] is None
    assert list(got[5]["tags"]) == ["5", "x"]
    # Java reference cross-check
    part = [n for n in os.listdir(out) if n.startswith("part-")][0]
    jvm = spark._jvm
    fr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(os.path.join(out, part)),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    n = 0
    while fr.hasNext():
        rec = fr.next()
        n += 1
    fr.close()
    assert n == 6


def test_still_rejects_multibranch_unions_and_named_refs(tmp_path):
    bad_ref = {"type": "record", "name": "n", "fields": [
        {"name": "a", "type": {"type": "record", "name": "r", "fields": [
            {"name": "x", "type": "long"}]}},
        {"name": "b", "type": "r"}]}  # named-type reference
    with pytest.raises(ValueError, match="'b' has unsupported type 'r'"):
        A.write_ocf(str(tmp_path / "x.avro"), bad_ref, [])


# ---------------------------------------------------------------------------
# round 9: maps / enums / fixed / logical types
# ---------------------------------------------------------------------------
LOGICAL_SCHEMA = {
    "type": "record", "name": "lake", "fields": [
        {"name": "id", "type": "long"},
        {"name": "amount", "type": {
            "type": "bytes", "logicalType": "decimal",
            "precision": 18, "scale": 2}},
        {"name": "big", "type": ["null", {
            "type": "fixed", "name": "bigdec", "size": 16,
            "logicalType": "decimal", "precision": 38, "scale": 4}]},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {
            "type": "long", "logicalType": "timestamp-micros"}},
        {"name": "ts_ms", "type": ["null", {
            "type": "long", "logicalType": "timestamp-millis"}]},
        {"name": "lts", "type": {
            "type": "long", "logicalType": "local-timestamp-micros"}},
        {"name": "labels", "type": {"type": "map", "values": "long"}},
        {"name": "color", "type": {
            "type": "enum", "name": "col",
            "symbols": ["RED", "GREEN", "BLUE"]}},
        {"name": "digest", "type": {
            "type": "fixed", "name": "md5ish", "size": 4}},
        {"name": "t_us", "type": {
            "type": "long", "logicalType": "time-micros"}},  # unknown->long
    ],
}


def _logical_rows():
    import datetime as dt
    from decimal import Decimal

    utc = dt.timezone.utc
    return [
        {"id": 1, "amount": Decimal("1234.56"),
         "big": Decimal("-99999999999999999999999999999999.0001"),
         "d": dt.date(2026, 8, 16),
         "ts": dt.datetime(2026, 8, 16, 12, 34, 56, 789012, tzinfo=utc),
         "ts_ms": dt.datetime(2001, 2, 3, 4, 5, 6, 7000, tzinfo=utc),
         "lts": dt.datetime(1999, 12, 31, 23, 59, 59, 999999),
         "labels": {"a": 1, "b": -2},
         "color": "GREEN", "digest": b"\x01\x02\x03\x04",
         "t_us": 86_399_000_000},
        {"id": 2, "amount": Decimal("-0.01"), "big": None,
         "d": dt.date(1969, 7, 20),  # pre-epoch: negative days
         "ts": dt.datetime(1960, 1, 1, 0, 0, 0, 1, tzinfo=utc),
         "ts_ms": None,
         "lts": dt.datetime(1970, 1, 1),
         "labels": {}, "color": "RED", "digest": b"\xff\xfe\xfd\xfc",
         "t_us": 0},
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_logical_roundtrip(tmp_path, codec):
    p = str(tmp_path / f"lg_{codec}.avro")
    rows = _logical_rows()
    A.write_ocf(p, LOGICAL_SCHEMA, rows, codec=codec, block_records=1)
    assert list(A.iter_ocf(open(p, "rb").read())) == rows


def test_unknown_logical_type_falls_back_to_underlying(tmp_path):
    """Per the Avro spec an unknown/invalid logicalType is ignored:
    time-micros reads as its long; a decimal with missing precision
    reads as raw bytes."""
    s = {"type": "record", "name": "t", "fields": [
        {"name": "t_us", "type": {
            "type": "long", "logicalType": "time-micros"}},
        {"name": "maldec", "type": {
            "type": "bytes", "logicalType": "decimal"}},  # no precision
    ]}
    p = str(tmp_path / "u.avro")
    A.write_ocf(p, s, [{"t_us": 123, "maldec": b"\x07"}])
    assert list(A.iter_ocf(open(p, "rb").read())) == [
        {"t_us": 123, "maldec": b"\x07"}]


def test_java_reference_reads_logical(spark, tmp_path):
    """Spec-validity proof for the round-9 subset: the Apache Avro
    Java reader decodes our maps/enums/fixed and the logical types'
    underlying values (GenericDatumReader without registered
    conversions surfaces decimal as ByteBuffer, date as int, etc. —
    so we check the UNDERLYING encodings match spec)."""
    p = str(tmp_path / "lg_xval.avro")
    A.write_ocf(p, LOGICAL_SCHEMA, _logical_rows(), codec="deflate")
    jvm = spark._jvm
    fr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = []
    while fr.hasNext():
        got.append(fr.next())
    fr.close()
    assert len(got) == 2
    r0 = got[0]
    assert str(r0.get("color")) == "GREEN"
    # Avro Java surfaces map keys as org.apache.avro.util.Utf8
    labels = {
        str(e.getKey()): e.getValue()
        for e in r0.get("labels").entrySet().toArray()
    }
    assert labels == {"a": 1, "b": -2}
    # decimal(18,2) 1234.56 -> unscaled 123456 big-endian
    amt = r0.get("amount")
    raw = bytes([amt.get(i) % 256 for i in range(amt.remaining())])
    assert int.from_bytes(raw, "big", signed=True) == 123456
    # date 2026-08-16 = 20681 days since epoch
    assert r0.get("d") == 20681
    assert got[1].get("d") == -165  # 1969-07-20
    assert got[1].get("big") is None
    assert got[1].get("t_us") == 0 and r0.get("t_us") == 86_399_000_000


def test_datasource_reads_logical_types(spark, tmp_path):
    """avro_py maps the round-9 subset onto Spark types: decimal(p,s)
    -> DecimalType, date -> DateType, timestamp-micros/millis ->
    TimestampType, local-* -> TimestampNTZType, map -> MapType, enum
    -> string, fixed -> binary, unknown logical -> underlying."""
    import datetime as dt
    from decimal import Decimal

    from advanced_strapi_import_spark.sources.avro_datasource import (
        register_avro_datasource,
    )

    register_avro_datasource(spark)
    p = str(tmp_path / "lg_ds.avro")
    A.write_ocf(p, LOGICAL_SCHEMA, _logical_rows())
    df = spark.read.format("avro_py").option("path", p).load()
    t = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert t["amount"] == "decimal(18,2)"
    assert t["big"] == "decimal(38,4)"
    assert t["d"] == "date" and t["ts"] == "timestamp"
    assert t["lts"] == "timestamp_ntz"
    assert t["labels"] == "map<string,bigint>"
    assert t["color"] == "string" and t["digest"] == "binary"
    assert t["t_us"] == "bigint"  # unknown logical: underlying long
    got = {r["id"]: r for r in df.collect()}
    assert got[1]["amount"] == Decimal("1234.56")
    assert got[1]["big"] == Decimal(
        "-99999999999999999999999999999999.0001")
    assert got[2]["big"] is None
    assert got[1]["d"] == dt.date(2026, 8, 16)
    assert got[2]["d"] == dt.date(1969, 7, 20)
    # session tz is UTC, so the aware micros surface verbatim
    assert got[1]["ts"] == dt.datetime(2026, 8, 16, 12, 34, 56, 789012)
    assert got[2]["ts_ms"] is None
    assert got[1]["lts"] == dt.datetime(1999, 12, 31, 23, 59, 59, 999999)
    assert dict(got[1]["labels"]) == {"a": 1, "b": -2}
    assert got[1]["color"] == "GREEN"
    assert bytes(got[1]["digest"]) == b"\x01\x02\x03\x04"


def test_datasource_writes_logical_types_roundtrip(spark, tmp_path):
    """Sink half: DecimalType/DateType/TimestampType/MapType columns
    write as Avro logical types and read back value-identical; the
    Java reference reader accepts the published file."""
    import os

    from advanced_strapi_import_spark.sources.avro_datasource import (
        register_avro_datasource,
    )

    register_avro_datasource(spark)
    out = str(tmp_path / "lg_sink")
    src = spark.range(4).selectExpr(
        "id",
        "CAST(CAST(id AS DECIMAL(12,3)) / 8 AS DECIMAL(12,3)) AS amt",
        "date_add(DATE'2020-01-01', CAST(id AS INT)) AS d",
        "timestamp_micros(1000000 * id + id) AS ts",
        "map('k', id, 'k2', id * 2) AS m",
    ).coalesce(1)
    src.write.format("avro_py").option("path", out).mode("overwrite").save()
    back = (
        spark.read.format("avro_py").option("path", out + "/part-*.avro")
        .load()
    )
    tb = {f.name: f.dataType.simpleString() for f in back.schema.fields}
    assert tb["amt"] == "decimal(12,3)" and tb["d"] == "date"
    assert tb["ts"] == "timestamp" and tb["m"] == "map<string,bigint>"
    a = sorted(src.collect(), key=lambda r: r["id"])
    b = sorted(back.collect(), key=lambda r: r["id"])
    for ra, rb in zip(a, b):
        assert (ra["id"], ra["amt"], ra["d"], ra["ts"]) == (
            rb["id"], rb["amt"], rb["d"], rb["ts"])
        assert dict(ra["m"]) == dict(rb["m"])
    part = [n for n in os.listdir(out) if n.startswith("part-")][0]
    jvm = spark._jvm
    fr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(os.path.join(out, part)),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    n = 0
    while fr.hasNext():
        fr.next()
        n += 1
    fr.close()
    assert n == 4


def test_split_resync_rejects_false_sync_in_payload(spark, tmp_path):
    """Round-9 ADVICE fix: a payload byte-string that CONTAINS the
    16-byte sync marker must not fool a byte-range split into
    starting mid-block. Write with a known deterministic marker,
    embed it inside bytes values, split small — row set must equal
    the one-partition read."""
    from advanced_strapi_import_spark.sources.avro_datasource import (
        register_avro_datasource,
    )

    register_avro_datasource(spark)
    sync = bytes(range(16))
    s = {"type": "record", "name": "t", "fields": [
        {"name": "id", "type": "long"},
        {"name": "blob", "type": "bytes"}]}
    rows = [
        {"id": i, "blob": (b"pad" * 11) + sync + bytes([i % 256] * 40)}
        for i in range(2000)
    ]
    p = str(tmp_path / "trap.avro")
    A.write_ocf(p, s, rows, codec="null", block_records=50, sync=sync)
    import os

    size = os.path.getsize(p)
    df = (
        spark.read.format("avro_py")
        .option("path", p)
        .option("target_partition_bytes", str(size // 5))
        .load()
    )
    assert df.rdd.getNumPartitions() >= 4
    assert sorted(r["id"] for r in df.collect()) == list(range(2000))


def test_split_resync_accepts_empty_block(spark, tmp_path):
    """Round-10 ADVICE fix: an n_rec == 0 block is LEGAL per the OCF
    spec (a writer may flush an empty block). The 2-hop chain validator
    used to reject any candidate whose chain passes through one — so a
    TRUE block start directly BEFORE an empty block failed resync and
    its rows silently vanished from byte-range reads. Splice an empty
    block (zero-count, zero-size, sync) between real blocks and assert
    a multi-split read still returns every row."""
    from advanced_strapi_import_spark.sources.avro_datasource import (
        register_avro_datasource,
    )

    register_avro_datasource(spark)
    sync = bytes(range(16, 32))
    s = {"type": "record", "name": "t", "fields": [
        {"name": "id", "type": "long"},
        {"name": "pad", "type": "string"}]}
    rows = [{"id": i, "pad": "x" * 120} for i in range(300)]
    p = str(tmp_path / "empties.avro")
    A.write_ocf(p, s, rows, codec="null", block_records=50, sync=sync)
    data = open(p, "rb").read()
    _, _, _, header_pos = A.read_ocf_header(data)
    # walk to the end of the SECOND block's sync and splice the empty
    # block there: candidates at block 2 now chain through it
    r = A._Reader(data, header_pos)
    for _ in range(2):
        r.long()
        size = r.long()
        r.raw(size)
        r.raw(16)
    cut = r.pos
    empty = b"\x00\x00" + sync  # n_rec=0, size=0, no payload, sync
    spliced = data[:cut] + empty + data[cut:]
    p2 = str(tmp_path / "spliced.avro")
    with open(p2, "wb") as f:
        f.write(spliced)
    # sequential read sees all rows and no phantom
    assert sum(1 for _ in A.iter_ocf(spliced)) == 300
    # split read: ~10 splits put one split start INSIDE block 0 with
    # block 1 (whose 2-hop chain passes through the spliced empty
    # block) as its resync candidate — the exact geometry where the
    # old n_rec<=0 rejection dropped block 1's 50 rows
    df = (
        spark.read.format("avro_py")
        .option("path", p2)
        .option("target_partition_bytes", str(len(spliced) // 10))
        .load()
    )
    assert df.rdd.getNumPartitions() >= 4
    assert sorted(x["id"] for x in df.collect()) == list(range(300))


def test_datasource_errors_on_type_mismatched_field(spark, tmp_path):
    """Same-NAME is not enough: a file whose field has a different
    type than the planned schema must error loudly, not feed mistyped
    values into the column (round-8 review fix)."""
    from advanced_strapi_import_spark.sources.avro_datasource import (
        register_avro_datasource,
    )

    register_avro_datasource(spark)
    s_long = {"type": "record", "name": "t", "fields": [
        {"name": "a", "type": "long"}]}
    s_str = {"type": "record", "name": "t", "fields": [
        {"name": "a", "type": "string"}]}
    A.write_ocf(str(tmp_path / "f0.avro"), s_long, [{"a": 1}])
    A.write_ocf(str(tmp_path / "f1.avro"), s_str, [{"a": "x"}])
    df = (
        spark.read.format("avro_py")
        .option("path", str(tmp_path) + "/*.avro")
        .load()
    )
    with pytest.raises(Exception, match="has type string, planned bigint"):
        df.collect()


def test_write_rejects_none_for_required_array_and_record(tmp_path):
    """None for a NON-nullable array/record field raises like a None
    primitive does — never a silent empty-array/empty-record encode."""
    s_arr = {"type": "record", "name": "t", "fields": [
        {"name": "tags", "type": {"type": "array", "items": "string"}}]}
    with pytest.raises(TypeError, match="non-nullable array"):
        A.write_ocf(str(tmp_path / "a.avro"), s_arr, [{}])
    s_rec = {"type": "record", "name": "t", "fields": [
        {"name": "m", "type": {"type": "record", "name": "mr", "fields": [
            {"name": "x", "type": "long"}]}}]}
    with pytest.raises(TypeError, match="non-nullable record"):
        A.write_ocf(str(tmp_path / "r.avro"), s_rec, [{}])
    # the nullable forms still accept None
    s_ok = {"type": "record", "name": "t", "fields": [
        {"name": "tags", "type": ["null", {"type": "array",
                                           "items": "string"}]}]}
    p = str(tmp_path / "ok.avro")
    A.write_ocf(p, s_ok, [{}])
    assert list(A.iter_ocf(open(p, "rb").read())) == [{"tags": None}]


# ---------------------------------------------------------------------------
# round 9: general multi-branch unions
# ---------------------------------------------------------------------------
UNION_SCHEMA = {
    "type": "record", "name": "u", "fields": [
        {"name": "id", "type": "long"},
        {"name": "num", "type": ["int", "long"]},          # -> long
        {"name": "fp", "type": ["null", "float", "double"]},  # -> double?
        {"name": "v", "type": ["null", "string", "long",
                               {"type": "array", "items": "long"}]},
    ],
}


def test_multibranch_union_roundtrip(tmp_path):
    """General unions read back with the spark-avro conventions:
    {int,long} promotes, {null,float,double} promotes nullable, mixed
    branches surface as memberN dicts; writes take explicit
    (branch_index, value) tuples."""
    rows_in = [
        {"id": 1, "num": (0, 7), "fp": (2, 1.5), "v": (1, "hello")},
        {"id": 2, "num": (1, 2**40), "fp": None, "v": (2, -9)},
        {"id": 3, "num": 5, "fp": (1, 0.25), "v": (3, [1, 2, 3])},
        {"id": 4, "num": (0, -1), "fp": (2, -0.5), "v": None},
    ]
    p = str(tmp_path / "u.avro")
    A.write_ocf(p, UNION_SCHEMA, rows_in, block_records=2)
    got = list(A.iter_ocf(open(p, "rb").read()))
    assert [g["num"] for g in got] == [7, 2**40, 5, -1]
    assert got[1]["fp"] is None and got[0]["fp"] == 1.5
    # float branch decodes float32 0.25 exactly
    assert got[2]["fp"] == 0.25
    assert got[0]["v"] == {"member0": "hello", "member1": None,
                           "member2": None}
    assert got[1]["v"] == {"member0": None, "member1": -9,
                           "member2": None}
    assert got[2]["v"]["member2"] == [1, 2, 3]
    assert got[3]["v"] is None


def test_java_reference_reads_multibranch_union(spark, tmp_path):
    p = str(tmp_path / "u_xval.avro")
    A.write_ocf(p, UNION_SCHEMA, [
        {"id": 1, "num": (1, 99), "fp": (2, 2.5), "v": (1, "xyz")},
        {"id": 2, "num": (0, 3), "fp": None, "v": (2, 11)},
    ], codec="deflate")
    jvm = spark._jvm
    fr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = []
    while fr.hasNext():
        got.append(fr.next())
    fr.close()
    assert got[0].get("num") == 99 and got[1].get("num") == 3
    assert got[0].get("fp") == 2.5 and got[1].get("fp") is None
    assert str(got[0].get("v")) == "xyz" and got[1].get("v") == 11


def test_datasource_reads_multibranch_union(spark, tmp_path):
    from advanced_strapi_import_spark.sources.avro_datasource import (
        register_avro_datasource,
    )

    register_avro_datasource(spark)
    p = str(tmp_path / "u_ds.avro")
    A.write_ocf(p, UNION_SCHEMA, [
        {"id": 1, "num": (0, 7), "fp": (2, 1.5), "v": (1, "hi")},
        {"id": 2, "num": (1, 2**40), "fp": None, "v": (3, [4, 5])},
        {"id": 3, "num": (0, -2), "fp": (1, 0.5), "v": None},
    ])
    df = spark.read.format("avro_py").option("path", p).load()
    t = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert t["num"] == "bigint"
    assert t["fp"] == "double" and df.schema["fp"].nullable
    assert t["v"].startswith("struct<member0:string,member1:bigint,")
    got = {r["id"]: r for r in df.collect()}
    assert got[1]["num"] == 7 and got[2]["num"] == 2**40
    assert got[2]["fp"] is None and got[3]["fp"] == 0.5
    assert got[1]["v"]["member0"] == "hi"
    assert list(got[2]["v"]["member2"]) == [4, 5]
    assert got[3]["v"] is None
    # struct members compose with Spark expressions
    assert df.filter("v.member1 IS NOT NULL").count() == 0


def test_reader_corrupt_streams_raise_valueerror_only(tmp_path):
    """Deterministic truncation + bit-flip fuzz over the OCF reader
    (round 9): corrupt bytes must either decode or raise ValueError —
    never a bare struct/zlib/Index/Key/Type error. Split readers and
    the stats-style callers rely on this contract to classify rows as
    bad data instead of crashing the task."""
    from decimal import Decimal

    schema = {"type": "record", "name": "t", "fields": [
        {"name": "id", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": 10, "scale": 2}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "e", "type": {"type": "enum", "name": "c",
                               "symbols": ["A", "B"]}},
    ]}
    rows = [{"id": i, "s": f"x{i}" if i % 3 else None,
             "d": Decimal(i) / 4, "m": {"k": i}, "e": "AB"[i % 2]}
            for i in range(200)]
    p = str(tmp_path / "fz.avro")
    A.write_ocf(p, schema, rows, codec="deflate", block_records=50)
    blob = open(p, "rb").read()
    n = len(blob)
    cases = [blob[:c] for c in range(1, n, max(1, n // 60))]
    for pos in range(0, n, max(1, n // 90)):
        b = bytearray(blob)
        b[pos] ^= 0x5A
        cases.append(bytes(b))
    for c in cases:
        try:
            list(A.iter_ocf(bytes(c)))
        except ValueError:
            pass


def test_columnar_block_encoder_byte_identical_to_row_encoder(tmp_path):
    """Round-11 codegen block ENCODER (write-side twin of the round-10
    decoder): write_ocf_columns must produce BYTE-IDENTICAL files to
    write_ocf for the same values and sync marker, across every node
    kind — inlined prims/unions/arrays/maps/dates AND the
    closure-fallback kinds (decimal, timestamp, enum, fixed,
    multi-branch union)."""
    import datetime
    from decimal import Decimal

    schema = {
        "type": "record",
        "name": "wide",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": ["null", "double"]},
            {"name": "ratio", "type": "float"},
            {"name": "flag", "type": "boolean"},
            {"name": "blob", "type": "bytes"},
            {"name": "alt", "type": ["int", "null"]},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "m", "type": {"type": "map", "values": ["null", "long"]}},
            {"name": "dec", "type": {"type": "bytes",
                                     "logicalType": "decimal",
                                     "precision": 14, "scale": 2}},
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
            {"name": "en", "type": {"type": "enum", "name": "e",
                                    "symbols": ["A", "B", "C"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "f8",
                                    "size": 4}},
            {"name": "u", "type": ["string", "long", "null"]},
        ],
    }
    utc = datetime.timezone.utc
    rows = [
        {"id": 1, "name": "alpha", "score": 1.5, "ratio": 0.25,
         "flag": True, "blob": b"\x00\xff", "alt": 7,
         "tags": ["x", "yy"], "m": {"a": 1, "b": None},
         "dec": Decimal("123.45"), "d": datetime.date(1992, 3, 4),
         "ts": datetime.datetime(2001, 2, 3, 4, 5, 6, 789, tzinfo=utc),
         "en": "B", "fx": b"\x01\x02\x03\x04", "u": (0, "str-branch")},
        {"id": -(2 ** 40), "name": "βeta", "score": None, "ratio": -2.0,
         "flag": False, "blob": b"", "alt": None,
         "tags": [], "m": {},
         "dec": Decimal("-0.01"), "d": datetime.date(1969, 12, 31),
         "ts": datetime.datetime(1960, 1, 1, tzinfo=utc),
         "en": "A", "fx": b"\xff\xfe\xfd\xfc", "u": (1, 42)},
        {"id": 0, "name": "", "score": -0.25, "ratio": 3.5,
         "flag": True, "blob": b"xyz", "alt": -1,
         "tags": ["only"], "m": {"k": 9},
         "dec": Decimal("0.00"), "d": datetime.date(2030, 1, 1),
         "ts": datetime.datetime(1999, 12, 31, 23, 59, 59, tzinfo=utc),
         "en": "C", "fx": b"\x00\x00\x00\x00", "u": (2, None)},
    ]
    names = [f["name"] for f in schema["fields"]]
    cols = [[r[n] for r in rows] for n in names]
    sync = b"S" * 16
    p_row = str(tmp_path / "row.avro")
    p_col = str(tmp_path / "col.avro")
    for codec in ("null", "deflate"):
        A.write_ocf(p_row, schema, rows, codec=codec, block_records=2,
                    sync=sync)
        A.write_ocf_columns(p_col, schema, cols, len(rows), codec=codec,
                            block_records=2, sync=sync)
        rb = open(p_row, "rb").read()
        cb = open(p_col, "rb").read()
        assert rb == cb, f"codec {codec}: byte drift"
        # decode sanity (multi-branch unions decode to member dicts,
        # so compare everything except 'u' to the input rows)
        got = list(A.iter_ocf(cb))
        want = [{k: v for k, v in r.items() if k != "u"} for r in rows]
        assert [{k: v for k, v in g.items() if k != "u"} for g in got] == want

    # empty frame: header-only file, still readable
    A.write_ocf_columns(p_col, schema, [[] for _ in names], 0, sync=sync)
    assert list(A.iter_ocf(open(p_col, "rb").read())) == []


def test_block_encoder_high_precision_decimal_exact():
    """Regression (round-12 ADVICE): the block encoder's bytes-backed
    decimal fast path ran scaleb under the ambient 28-digit context, so
    a 38-digit Decimal (Spark's max precision) was silently ROUNDED
    before encoding — and still passed the integrality guard. The fast
    path must be byte-identical to the reference closure at full
    precision, and still reject genuine scale mismatches."""
    from decimal import Context, Decimal

    node = ("decimal", 38, 2, None)
    enc_row = A.compile_encoder(node)
    blk = A.compile_block_encoder([("d", node)])

    cases = [
        Decimal("123456789012345678901234567890123456.78"),
        Decimal("-99999999999999999999999999999999999999").scaleb(
            -2, Context(prec=100)
        ),
        Decimal("0.01"),
        Decimal("1E+2"),  # positive-exponent coefficient shift
    ]
    for v in cases:
        b_row = bytearray()
        enc_row(b_row, v)
        b_blk = bytearray()
        blk(b_blk, [[v]], 0, 1)
        assert bytes(b_row) == bytes(b_blk), f"byte drift for {v}"

    with pytest.raises(ValueError, match="does not fit decimal scale"):
        blk(bytearray(), [[Decimal("1.234")]], 0, 1)
    # >28-digit value that does NOT fit the scale must raise, not round
    with pytest.raises(ValueError, match="does not fit decimal scale"):
        blk(
            bytearray(),
            [[Decimal("123456789012345678901234567890123456.789")]],
            0,
            1,
        )
