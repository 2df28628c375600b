"""Registered Spark 4 Python DataSource for Avro Object Container
Files — `spark.read.format("avro_py")`.

The environment ships Avro core jars but not the `spark-avro`
datasource module, so Spark's built-in `format("avro")` cannot plan
(verified in tests). This source fills the gap with the pure-Python
OCF codec in :mod:`avro_ocf` — whose output the Apache Avro JAVA
reference implementation on Spark's own classpath reads back verbatim
(cross-validated in ``tests/test_avro.py``), so the wire format is
spec-real, not a private dialect.

Shape:
  - planning: the first file's header (magic + metadata map) is read
    once to derive the Spark schema — data blocks are not touched;
  - partitions: one per file (OCF files are the unit of parallelism in
    practice; a single huge file would split on sync markers — the
    documented extension point);
  - schema mapping: long/int -> LongType/IntegerType, float/double,
    boolean, string, bytes -> BinaryType; ``["null", T]`` unions mark
    the field nullable. Nested/complex schemas raise at planning time
    (the avro_ocf subset boundary).

Usage::

    register_avro_datasource(spark)
    df = spark.read.format("avro_py").option("path", "/data/*.avro").load()
"""

from __future__ import annotations

from collections.abc import Iterator

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SPARK_TYPES = {
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "string": StringType(),
    "bytes": BinaryType(),
}


def _spark_schema_from_avro(schema: dict) -> StructType:
    from advanced_strapi_import_spark.sources.avro_ocf import _check_schema

    fields = []
    for name, t, null_idx in _check_schema(schema):
        if t == "null":
            raise ValueError("avro_py: plain-null fields have no Spark type")
        fields.append(
            StructField(name, _SPARK_TYPES[t], nullable=null_idx is not None)
        )
    return StructType(fields)


class AvroFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class AvroReader(DataSourceReader):
    def __init__(self, options):
        import glob as globmod
        import os

        path = options.get("path")
        if not path:
            raise ValueError("avro_py source requires .option('path', ...)")
        if os.path.isdir(path):
            path = os.path.join(path, "*.avro")
        self.files = sorted(globmod.glob(path))
        if not self.files:
            raise ValueError(f"avro_py: no files match {path}")

    def partitions(self) -> list[AvroFilePartition]:
        return [AvroFilePartition(p) for p in self.files]

    def read(self, partition: AvroFilePartition) -> Iterator[tuple]:
        from advanced_strapi_import_spark.sources.avro_ocf import (
            _check_schema,
            iter_ocf,
            read_ocf_header,
        )

        with open(partition.path, "rb") as f:
            data = f.read()
        schema, _, _, _ = read_ocf_header(data)
        names = [n for n, _, _ in _check_schema(schema)]
        for row in iter_ocf(data):
            yield tuple(row[n] for n in names)


class AvroDataSource(DataSource):
    """``spark.read.format("avro_py")`` — pure-Python Avro OCF scan,
    file-parallel, header-only planning."""

    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self) -> StructType:
        import glob as globmod
        import os

        from advanced_strapi_import_spark.sources.avro_ocf import (
            read_ocf_header,
        )

        path = self.options.get("path")
        if not path:
            raise ValueError("avro_py source requires .option('path', ...)")
        if os.path.isdir(path):
            path = os.path.join(path, "*.avro")
        files = sorted(globmod.glob(path))
        if not files:
            raise ValueError(f"avro_py: no files match {path}")
        with open(files[0], "rb") as f:
            head = f.read(1 << 20)  # header is tiny; 1 MB covers any schema
        schema, _, _, _ = read_ocf_header(head)
        return _spark_schema_from_avro(schema)

    def reader(self, schema: StructType) -> AvroReader:
        return AvroReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> AvroAtomicWriter:
        return AvroAtomicWriter(self.options, schema, overwrite)


def register_avro_datasource(spark) -> None:
    """Idempotently register the avro_py format on this session."""
    spark.dataSource.register(AvroDataSource)


# ---------------------------------------------------------------------------
# writer half: df.write.format("avro_py") — atomic OCF sink
# ---------------------------------------------------------------------------
_AVRO_TYPES = {
    "boolean": "boolean",
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
}


def _avro_schema_from_spark(schema: StructType, name: str = "row") -> dict:
    fields = []
    for f in schema.fields:
        t = f.dataType.typeName()
        if t not in _AVRO_TYPES:
            raise ValueError(
                f"avro_py sink: unsupported Spark type {t!r} for field"
                f" {f.name!r} (primitive subset — see avro_ocf)"
            )
        at = _AVRO_TYPES[t]
        fields.append(
            {"name": f.name, "type": ["null", at] if f.nullable else at}
        )
    return {"type": "record", "name": name, "fields": fields}


@dataclass
class _StagedAvro(WriterCommitMessage):
    staged_name: str
    n_rows: int


class AvroAtomicWriter(DataSourceWriter):
    """Two-phase-commit OCF sink (the jsonl_atomic protocol with an
    Avro payload): tasks stage ``.staged-*.avro`` files, the driver
    publishes them as ``part-*.avro`` plus a ``_SUCCESS`` manifest and
    reaps orphans. Same SHARED-FILESYSTEM (single-node/NFS) contract
    as jsonl_atomic — on executor-local disks the staging target must
    be the shared store itself."""

    def __init__(self, options, schema: StructType, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("avro_py sink requires option('path', ...)")
        self.schema = schema
        self.avro_schema = _avro_schema_from_spark(schema)
        self.overwrite = overwrite
        self.codec = options.get("codec", "deflate")

    # -- executor side ----------------------------------------------------
    def write(self, iterator):
        import os
        import uuid

        from advanced_strapi_import_spark.sources.avro_ocf import write_ocf

        os.makedirs(self.path, exist_ok=True)
        names = self.schema.fieldNames()
        rows = [
            {k: row[i] for i, k in enumerate(names)} for row in iterator
        ]
        staged = f".staged-{uuid.uuid4().hex}.avro"
        write_ocf(
            os.path.join(self.path, staged),
            self.avro_schema,
            rows,
            codec=self.codec,
        )
        return _StagedAvro(staged_name=staged, n_rows=len(rows))

    # -- driver side -------------------------------------------------------
    def commit(self, messages) -> None:
        import glob as globmod
        import json
        import os
        import uuid

        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("part-") or name == "_SUCCESS":
                    os.remove(os.path.join(self.path, name))
        manifest = []
        published = set()
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = f"part-{i:05d}-{uuid.uuid4().hex}.avro"
            os.rename(
                os.path.join(self.path, m.staged_name),
                os.path.join(self.path, final),
            )
            manifest.append({"file": final, "n_rows": m.n_rows})
            published.add(m.staged_name)
        for p in globmod.glob(os.path.join(self.path, ".staged-*.avro")):
            if os.path.basename(p) not in published:
                os.remove(p)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"files": manifest}, f)

    def abort(self, messages) -> None:
        import glob as globmod
        import os

        for p in globmod.glob(os.path.join(self.path, ".staged-*.avro")):
            try:
                os.remove(p)
            except OSError:
                pass
