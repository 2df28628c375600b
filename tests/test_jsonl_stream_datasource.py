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
