"""Spark 4 Python DataSource for ZIP archives: registration, member
parallelism, planning-time filter pushdown, content on demand."""

from __future__ import annotations

import zipfile

import pytest
from pyspark.sql import functions as F

from advanced_strapi_import_spark.sources.zip_datasource import (
    ZipReader,
    register_zip_datasource,
)


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    p = tmp_path_factory.mktemp("zipds") / "upload.zip"
    with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as zf:
        for i in range(10):
            zf.writestr(f"images/img_{i}.png", b"\x89PNG" + bytes([i]) * 20)
        for i in range(5):
            zf.writestr(f"docs/doc_{i}.txt", f"document {i}".encode())
        zf.writestr("root.csv", b"a,b\n1,2\n")
    return str(p)


def test_zipfile_format_reads_all_members(spark, archive):
    register_zip_datasource(spark)
    df = spark.read.format("zipfile").option("path", archive).load()
    rows = df.collect()
    assert len(rows) == 16
    assert {r.folder for r in rows} == {"images", "docs", ""}
    # metadata-only scan: content stays null unless asked for
    assert all(r.content is None for r in rows)
    assert all(r.size > 0 for r in rows)


def test_zipfile_content_on_demand(spark, archive):
    register_zip_datasource(spark)
    df = (
        spark.read.format("zipfile")
        .option("path", archive)
        .option("includeContent", "true")
        .load()
        .filter(F.col("entry_path") == "docs/doc_3.txt")
    )
    [row] = df.collect()
    assert bytes(row.content) == b"document 3"


def test_zipfile_filter_pushdown_prunes_partitions(spark, archive):
    register_zip_datasource(spark)
    df = (
        spark.read.format("zipfile")
        .option("path", archive)
        .option("membersPerSplit", "4")
        .load()
        .filter(F.col("entry_path").startswith("images/"))
    )
    assert df.count() == 10
    # planning-level check: the reader prunes members before
    # partitioning, so only ceil(10/4)=3 splits exist vs 4 unfiltered
    from pyspark.sql.datasource import StringStartsWith

    r = ZipReader({"path": archive, "membersPerSplit": "4"})
    leftover = list(
        r.pushFilters([StringStartsWith(("entry_path",), "images/")])
    )
    assert leftover == []
    parts = r.partitions()
    assert len(parts) == 3
    assert all(n.startswith("images/") for p in parts for n in p.names)


def test_zipfile_member_range_parallelism(spark, archive):
    register_zip_datasource(spark)
    df = (
        spark.read.format("zipfile")
        .option("path", archive)
        .option("membersPerSplit", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # ceil(16/4) member ranges
    assert df.count() == 16
