"""JSONL source/sink: PERMISSIVE parse, corrupt-line quarantine,
round-trip fidelity."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_strapi_import_spark.sources.json_source import (
    jsonl_scan,
    jsonl_scan_split,
    write_jsonl,
)


def test_jsonl_scan_split_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"id": 1, "text": "alpha"}\n'
        "this is not json\n"
        '{"id": 2, "text": "beta"}\n'
        '{"id": 3 "text": "missing comma"}\n'
    )
    good, bad = jsonl_scan_split(spark, str(p), "id long, text string")
    assert sorted(r["id"] for r in good.collect()) == [1, 2]
    assert bad.count() == 2
    assert "missing comma" in "".join(r["_corrupt_record"] for r in bad.collect())
    assert good.columns == ["id", "text"]


def test_jsonl_scan_without_schema_infers(spark, tmp_path):
    p = tmp_path / "d.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    df = jsonl_scan(spark, str(p))
    assert df.count() == 2 and set(df.columns) == {"a", "b"}


def test_jsonl_round_trip_with_batching(spark, tmp_path):
    import glob

    src = spark.range(30).select(
        F.col("id"), F.concat(F.lit("doc-"), F.col("id")).alias("text")
    )
    out = str(tmp_path / "out")
    write_jsonl(src.repartition(1), out, max_records_per_file=10)
    parts = glob.glob(out + "/part-*")
    assert len(parts) >= 3  # batch-size knob respected
    good, bad = jsonl_scan_split(spark, out, "id long, text string")
    assert bad.count() == 0
    assert sorted(r["id"] for r in good.collect()) == list(range(30))
