"""Streaming Python DataSource (jsonltail): offset management, partial
trailing lines, replay determinism, incremental batches."""

from __future__ import annotations

import json

import pytest

from advanced_strapi_import_spark.sources.jsonl_stream_datasource import (
    JsonlTailReader,
    register_jsonl_tail,
)


def _write(path, records, partial: str | None = None):
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
        if partial is not None:
            f.write(partial)  # no trailing newline: writer mid-append


def test_reader_offsets_and_partial_lines(tmp_path):
    p = str(tmp_path / "feed.jsonl")
    _write(p, [{"msg": "a"}, {"msg": "b"}], partial='{"msg": "tr')
    r = JsonlTailReader({"path": p, "field": "msg"})
    start = r.initialOffset()
    rows, end = r.read(start)
    rows = list(rows)
    # the partial trailing line is NOT exposed
    assert [x[2] for x in rows] == ["a", "b"]
    # finishing the line makes it visible from the committed offset
    with open(p, "a") as f:
        f.write('uncated"}\n')
    rows2, end2 = r.read(end)
    assert [x[2] for x in list(rows2)] == ["truncated"]
    assert end2["pos"] > end["pos"]


def test_reader_replay_is_exact(tmp_path):
    p = str(tmp_path / "feed.jsonl")
    _write(p, [{"msg": f"m{i}"} for i in range(10)])
    r = JsonlTailReader({"path": p})
    rows, end = r.read(r.initialOffset())
    first = list(rows)
    replay = list(r.readBetweenOffsets(r.initialOffset(), end))
    assert first == replay  # byte-range replay: exactly-once on recovery


def test_stream_end_to_end(spark, tmp_path):
    p = str(tmp_path / "feed.jsonl")
    _write(p, [{"msg": f"m{i}", "n": i} for i in range(25)])
    register_jsonl_tail(spark)
    stream = (
        spark.readStream.format("jsonltail")
        .option("path", p)
        .option("field", "msg")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("jsonltail_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM jsonltail_t ORDER BY offset").collect()
    assert len(out) == 25
    assert out[0].value == "m0" and out[-1].value == "m24"
    # offsets are the real byte positions of each line
    assert out[0].offset == 0
    assert all(b.offset > a.offset for a, b in zip(out, out[1:]))


def test_jsonl_atomic_writer_roundtrip(spark, tmp_path):
    """Two-phase commit: committed dir has part-* + _SUCCESS manifest,
    no staged leftovers; rows round-trip through spark.read.json."""
    import json
    import os

    from advanced_strapi_import_spark.sources.jsonl_sink_datasource import (
        register_jsonl_sink_datasource,
    )

    register_jsonl_sink_datasource(spark)
    out = str(tmp_path / "sink")
    df = spark.range(100).selectExpr(
        "id",
        "concat('name-', id) AS name",
        "CAST(id * 1.5 AS DOUBLE) AS score",
    )
    df.write.format("jsonl_atomic").option("path", out).mode(
        "append"
    ).save()
    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    assert all(not n.startswith(".staged-") for n in names)
    parts = [n for n in names if n.startswith("part-")]
    assert parts
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert sum(e["n_rows"] for e in manifest["files"]) == 100
    assert {e["file"] for e in manifest["files"]} == set(parts)
    back = spark.read.json(os.path.join(out, "part-*.jsonl"))
    assert back.count() == 100
    got = {(r.id, r.name, r.score) for r in back.collect()}
    want = {(r.id, r.name, r.score) for r in df.collect()}
    assert got == want


def test_jsonl_atomic_writer_overwrite(spark, tmp_path):
    import os

    from advanced_strapi_import_spark.sources.jsonl_sink_datasource import (
        register_jsonl_sink_datasource,
    )

    register_jsonl_sink_datasource(spark)
    out = str(tmp_path / "sink_ow")
    spark.range(10).write.format("jsonl_atomic").option("path", out).mode(
        "append"
    ).save()
    spark.range(3).write.format("jsonl_atomic").option("path", out).mode(
        "overwrite"
    ).save()
    back = spark.read.json(os.path.join(out, "part-*.jsonl"))
    assert back.count() == 3
