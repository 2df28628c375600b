"""Python DataSource WRITER (Spark 4 API): an atomic JSONL sink.

Completes the custom-DataSource surface next to the batch reader
(``zip_datasource``) and the streaming reader
(``jsonl_stream_datasource``): ``df.write.format("jsonl_atomic")
.option("path", ...).mode("append"|"overwrite").save()``.

The write path implements the full two-phase commit protocol the API
exposes — the part a CSV/parquet user never sees but every sink author
must get right:

- each TASK writes its rows to a UUID-named ``.staged-*.jsonl`` file
  (invisible to readers: the glob for committed data is
  ``part-*.jsonl``), then returns the staged name + row count as its
  :class:`WriterCommitMessage`;
- ``commit()`` runs on the DRIVER only after EVERY task succeeded and
  renames each staged file to its final ``part-<n>-<uuid>.jsonl`` name
  plus writes a ``_SUCCESS`` manifest (JSON: files + row counts) —
  rename-within-directory is atomic on POSIX, so readers see either
  none or all of a task's rows;
- ``abort()`` (and ``commit()``, for earlier crashed runs) reaps every
  unpublished ``.staged-*`` file by prefix glob — including files of
  tasks that died MID-write and therefore never returned a commit
  message — so a crashed job leaves the directory exactly as it found
  it (single-writer contract, like FileOutputCommitter's temporary-dir
  cleanup).

This mirrors Hadoop's FileOutputCommitter v1 semantics at 1/100th the
surface: at real scale the rename step becomes a metastore/manifest
swap (Iceberg/Delta commit), same two-phase shape. Speculative or
retried tasks are safe: every attempt stages under a fresh UUID and
only the attempts whose messages reach ``commit()`` are published.

JSON encoding notes: keys follow the input schema order; values go
through ``json.dumps`` with ``default=str`` so timestamps/decimals
serialize deterministically; binary columns are not supported (the
reference sink is CSV/JSONL-shaped text).

SHARED-FILESYSTEM CONTRACT (single-node / NFS only): ``write()`` stages
files via local ``os.open`` on EXECUTORS while ``commit()`` renames
them on the DRIVER — correct here because local[N] shares one
filesystem, and on any deployment where ``path`` is a shared POSIX
mount. On a multi-node cluster with executor-local disks the staged
files would be invisible to the driver and ``os.rename`` would fail;
there the staging target must itself be the shared store (HDFS/S3
object-put + manifest swap), which is exactly the Iceberg/Delta commit
shape noted above. This sits beside the existing single-writer
contract: one concurrent committer per directory.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class _StagedFile(WriterCommitMessage):
    staged_name: str
    n_rows: int


class JsonlAtomicWriter(DataSourceWriter):
    def __init__(self, options, schema: StructType, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_atomic requires option('path', ...)")
        self.fields = schema.fieldNames()
        self.overwrite = overwrite

    # -- executor side ----------------------------------------------------
    def write(self, iterator: Iterator) -> _StagedFile:
        os.makedirs(self.path, exist_ok=True)
        staged = f".staged-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, staged), "w") as f:
            for row in iterator:
                rec = {k: row[i] for i, k in enumerate(self.fields)}
                f.write(json.dumps(rec, default=str) + "\n")
                n += 1
        return _StagedFile(staged_name=staged, n_rows=n)

    # -- driver side -------------------------------------------------------
    def commit(self, messages) -> None:
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("part-") or name == "_SUCCESS":
                    os.remove(os.path.join(self.path, name))
        manifest = []
        published = set()
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = f"part-{i:05d}-{uuid.uuid4().hex}.jsonl"
            os.rename(
                os.path.join(self.path, m.staged_name),
                os.path.join(self.path, final),
            )
            manifest.append({"file": final, "n_rows": m.n_rows})
            published.add(m.staged_name)
        # reap orphaned staged files: a task that crashed MID-write (or
        # a prior aborted run) never returned a commit message, so its
        # .staged-* file is referenced nowhere — single-writer contract,
        # like FileOutputCommitter's temporary-dir cleanup
        self._reap_staged(keep=published)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"files": manifest}, f)

    def abort(self, messages) -> None:
        # messages only cover tasks that RETURNED; glob the staged
        # prefix so mid-write crashes leave nothing behind either
        self._reap_staged(keep=set())

    def _reap_staged(self, *, keep: set) -> None:
        try:
            names = os.listdir(self.path)
        except OSError:
            return
        for name in names:
            if name.startswith(".staged-") and name not in keep:
                try:
                    os.remove(os.path.join(self.path, name))
                except OSError:
                    pass


class JsonlAtomicDataSource(DataSource):
    """``df.write.format("jsonl_atomic")`` — two-phase-commit JSONL."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_atomic"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlAtomicWriter:
        return JsonlAtomicWriter(self.options, schema, overwrite)


def register_jsonl_sink_datasource(spark) -> None:
    """Idempotently register the jsonl_atomic format on this session."""
    spark.dataSource.register(JsonlAtomicDataSource)
