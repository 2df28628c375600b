"""Registered Spark 4 streaming Python DataSource: offset-managed JSONL
tail.

``spark.readStream.format("jsonltail")`` follows a growing JSONL file
with BYTE-OFFSET exactly-once semantics: each micro-batch covers the
byte range [start, end) of complete lines appended since the last
batch, the offset dict is checkpointed by Spark, and replay of a range
(``readBetweenOffsets``) re-reads exactly those bytes — so a crashed
query resumes without loss or duplication. Partial trailing lines (a
writer mid-append) are left for the next batch: the end offset only
advances past the last ``\\n``.

This is the streaming face of the JSONL source (sources/json_source.py
covers batch + corrupt-line quarantine; reference surface: the CSV/file
ingest of /root/reference/server/services/csv-import.js re-expressed
for append-only logs). Built on SimpleDataSourceStreamReader — the
driver-side read is the documented fit for control-plane-scale tails
(config feeds, manifests, DLQs); a partitioned DataSourceStreamReader
is the path for firehose volumes.

Usage::

    register_jsonl_tail(spark)
    stream = (spark.readStream.format("jsonltail")
              .option("path", "/var/log/feed.jsonl")
              .option("field", "msg")
              .load())
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def _schema() -> StructType:
    return StructType(
        [
            StructField("offset", LongType()),
            StructField("line", StringType()),
            StructField("value", StringType()),
        ]
    )


class JsonlTailReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonltail source requires .option('path', ...)")
        self.field = options.get("field")
        self.max_bytes = int(options.get("maxBytesPerBatch", str(1 << 24)))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _complete_range(self, start: int) -> int:
        """Largest end <= start+max_bytes such that file[start:end] ends
        on a newline — never exposes a partially-written trailing line."""
        try:
            size = os.path.getsize(self.path)
        except OSError:
            return start
        end = min(size, start + self.max_bytes)
        if end <= start:
            return start
        with open(self.path, "rb") as f:
            f.seek(start)
            chunk = f.read(end - start)
        last_nl = chunk.rfind(b"\n")
        if last_nl < 0:
            return start
        return start + last_nl + 1

    def _rows(self, start: int, end: int) -> Iterator[tuple]:
        if end <= start:
            return
        with open(self.path, "rb") as f:
            f.seek(start)
            data = f.read(end - start)
        pos = start
        for raw in data.split(b"\n"):
            if raw:
                line = raw.decode("utf-8", errors="replace")
                val = None
                if self.field:
                    try:
                        val = json.loads(line).get(self.field)
                        if val is not None:
                            val = str(val)
                    except (json.JSONDecodeError, AttributeError):
                        val = None
                yield (pos, line, val)
            pos += len(raw) + 1

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        s = int(start["pos"])
        e = self._complete_range(s)
        # a LIST, not a generator: the batch is shipped to executors via
        # pickle (SimpleDataSourceStreamReader contract — driver-side
        # read for control-plane-scale tails)
        return list(self._rows(s, e)), {"pos": e}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return list(self._rows(int(start["pos"]), int(end["pos"])))

    def commit(self, end: dict) -> None:
        pass  # source is an immutable append-only file; nothing to ack


class JsonlTailDataSource(DataSource):
    """``spark.readStream.format("jsonltail")`` — byte-offset-managed
    JSONL tail with exactly-once replay."""

    @classmethod
    def name(cls) -> str:
        return "jsonltail"

    def schema(self) -> StructType:
        return _schema()

    def simpleStreamReader(self, schema: StructType) -> JsonlTailReader:
        return JsonlTailReader(self.options)


def register_jsonl_tail(spark) -> None:
    spark.dataSource.register(JsonlTailDataSource)
