"""Content-defined chunking: reconstruction, determinism, and the
edit-realignment property that motivates CDC over fixed segments."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_strapi_import_spark.operators import text as TX

BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "a long tune about content defined chunking and rolling hashes "
    "that realign after a local edit instead of shifting every block "
) * 6


def _chunks(spark, rows):
    df = spark.createDataFrame(rows, "id long, text string")
    out = (
        TX.cdc_chunks(df, "text", "id")
        .groupBy("id")
        .agg(F.collect_list("chunk").alias("cs"))
        .collect()
    )
    return {r["id"]: r["cs"] for r in out}


def test_reconstruction_and_short_docs(spark):
    rows = [(1, BASE), (2, "tiny"), (3, ""), (4, "exactly8"), (5, "x" * 9)]
    got = _chunks(spark, rows)
    assert "".join(got[1]) == BASE
    assert got[2] == ["tiny"]
    assert 3 not in got  # empty text -> zero chunks (filtered)
    assert got[4] == ["exactly8"]  # below window+1: single chunk
    assert "".join(got[5]) == "x" * 9
    assert len(got[1]) > 3  # long doc actually gets cut


def test_determinism(spark):
    a = _chunks(spark, [(1, BASE)])
    b = _chunks(spark, [(1, BASE)])
    assert a == b


def test_edit_realignment(spark):
    """A single-char insertion near the head changes a bounded prefix
    of chunks; every chunk after the next content-defined boundary is
    IDENTICAL — the property fixed-size segmentation lacks."""
    edited = BASE[:10] + "Z" + BASE[10:]
    got = _chunks(spark, [(1, BASE), (2, edited)])
    base_set, edit_set = set(got[1]), set(got[2])
    shared = base_set & edit_set
    # everything but the edited head chunk(s) re-aligns
    assert len(shared) >= len(base_set) - 2
    # and the tail chunks match exactly in order
    assert got[1][-3:] == got[2][-3:]
