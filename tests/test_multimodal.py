"""Multimodal plumbing tests: Arrow mapInPandas stages run with real
binary columns; the decode stub is deterministic; unimplemented codec
paths fail loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from advanced_strapi_import_spark.operators import multimodal as MM


def _bin_df(spark):
    return spark.createDataFrame(
        [(1, b"\x00" * 10), (2, b"\xff" * 300), (3, None)],
        "doc_id long, content binary",
    )


def test_decode_image_meta_stub(spark):
    out = MM.decode_image_meta(_bin_df(spark))
    got = {r["doc_id"]: r["image_meta"] for r in out.collect()}
    # deterministic fake dims derived from content length
    assert got[1]["width"] == 11 and got[1]["format"] == "fake"
    assert got[2]["width"] == 301
    assert got[3]["width"] == 1  # null payload -> length 0


def test_byte_histogram_shapes(spark):
    out = MM.byte_histogram(_bin_df(spark)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) == 16 for v in by_doc.values())
    d1 = {r["bucket"]: r["count"] for r in by_doc[1]}
    assert d1[0] == 10 and sum(d1.values()) == 10      # all zero bytes
    d2 = {r["bucket"]: r["count"] for r in by_doc[2]}
    assert d2[15] == 300                                # all 0xff bytes
    assert all(r["n_bytes"] == 0 for r in by_doc[3])    # null payload


def test_codec_paths_fail_loudly(spark):
    df = _bin_df(spark)
    with pytest.raises(NotImplementedError):
        MM.resize_images(df, 224, 224)
    with pytest.raises(NotImplementedError):
        MM.sample_frames(df, 10)
