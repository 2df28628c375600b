"""ORC / XML / text / binaryFile sources: round trips, pushdown
plan assertions, and the binaryFile -> pixel-decode ingestion bridge."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from advanced_strapi_import_spark.operators import multimodal as MM
from advanced_strapi_import_spark.sources import formats as FMT


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    p = str(tmp_path / "t.orc")
    src = spark.range(1000).selectExpr(
        "id", "id % 7 AS k", "CAST(id * 2 AS DOUBLE) AS v"
    )
    FMT.write_orc(src, p)
    back = FMT.read_orc(spark, p)
    assert back.count() == 1000
    assert [f.name for f in back.schema.fields] == ["id", "k", "v"]
    filtered = back.filter(F.col("k") == 3).select("id")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # filter must reach the ORC stripe reader, projection must prune v
    assert "PushedFilters: [" in plan and "k" in plan.split("PushedFilters")[1][:80]
    assert filtered.count() == len([i for i in range(1000) if i % 7 == 3])


def test_xml_roundtrip_nested(spark, tmp_path):
    p = str(tmp_path / "cat")
    src = spark.createDataFrame(
        [(1, "alpha", ["x", "y"]), (2, "beta", ["z"])],
        "id long, name string, tags array<string>",
    )
    FMT.write_xml(src, p, row_tag="item", root_tag="catalog")
    back = FMT.read_xml(spark, p, row_tag="item")
    rows = {r["id"]: r for r in back.collect()}
    assert rows[1]["name"] == "alpha" and list(rows[1]["tags"]) == ["x", "y"]
    assert rows[2]["name"] == "beta" and list(rows[2]["tags"]) == ["z"]


def test_xml_attributes(spark, tmp_path):
    f = tmp_path / "a.xml"
    f.write_text(
        "<rows><row id=\"7\"><v>hi</v></row>"
        "<row id=\"8\"><v>lo</v></row></rows>"
    )
    back = FMT.read_xml(spark, str(f), row_tag="row")
    got = sorted((r["_id"], r["v"]) for r in back.collect())
    assert got == [(7, "hi"), (8, "lo")]


def test_text_line_and_wholefile(spark, tmp_path):
    f = tmp_path / "doc.txt"
    f.write_text("line one\nline two\nline three\n")
    lines = FMT.read_text(spark, str(f))
    assert lines.count() == 3
    whole = FMT.read_text(spark, str(f), whole_file=True)
    assert whole.count() == 1
    assert "line two" in whole.collect()[0]["value"]


def test_binary_files_to_pixel_stats(spark, tmp_path):
    """End-to-end ingestion bridge: files on disk -> binaryFile scan ->
    REAL pixel decode -> exact stats."""
    vals = np.array([[9, 77]], dtype=np.int64)
    gray = np.kron(vals, np.ones((8, 8), dtype=np.int64))
    (tmp_path / "a.jpg").write_bytes(MM.jpeg_encode_gray(gray))
    px = ((np.arange(4)[:, None, None] * 3 + np.arange(5)[None, :, None]
           + np.arange(3)[None, None, :] * 11) % 256).astype(np.uint8)
    (tmp_path / "b.png").write_bytes(MM.png_encode_pixels(px.reshape(4, 15)))
    (tmp_path / "skip.txt").write_text("not an image")

    files = FMT.read_binary_files(spark, str(tmp_path), glob="*.{jpg,png}")
    assert files.count() == 2
    keyed = files.select(
        F.monotonically_increasing_id().alias("doc_id"),
        "content",
        F.element_at(F.split("path", "/"), -1).alias("fname"),
    )
    stats = MM.image_pixel_stats(keyed, binary_col="content")
    byfmt = {r["format"]: r for r in stats.collect()}
    assert byfmt["JPEG"]["sum_c0"] == 64 * (9 + 77)
    assert byfmt["PNG"]["n_vals"] == 4 * 5 * 3


def test_binary_files_glob_prunes(spark, tmp_path):
    (tmp_path / "x.bin").write_bytes(b"\x00" * 8)
    (tmp_path / "y.dat").write_bytes(b"\x01" * 8)
    only = FMT.read_binary_files(spark, str(tmp_path), glob="*.bin")
    assert [os.path.basename(r["path"]) for r in only.collect()] == ["x.bin"]
