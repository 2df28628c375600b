"""Registered Spark 4 Python DataSource for ZIP archives.

``zip_source.py`` parallelizes ACROSS archives (binaryFile -> one task
per zip, reference parity for extractAndUploadZip,
/root/reference/server/services/csv-import.js:808-926). This module
covers the opposite shape: ONE large archive whose members must fan out
across the cluster — `spark.read.format("zipfile")` plans one input
partition per member *range* from the central directory (read once at
planning time, no decompression), so a 100 GB upload archive scans with
full parallelism instead of serializing on one task.

Spark-native surface (DataSource V2 Python API):
  - partition planning: central-directory slice per ``membersPerSplit``
    members; each task opens the archive independently (zip members are
    independently compressed, so range reads need no coordination);
  - filter pushdown: StringStartsWith/StringEndsWith/StringContains/
    EqualTo on ``entry_path`` prune members at PLANNING time — a
    ``.filter(col("entry_path").startswith("images/"))`` never even
    schedules the other folders' members;
  - projection economy: ``content`` is decompressed only when the
    option ``includeContent=true`` asks for it (metadata listings stay
    central-directory-only).

Usage::

    register_zip_datasource(spark)
    df = (spark.read.format("zipfile")
          .option("path", "/data/upload.zip")
          .option("includeContent", "true")
          .load())
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

def _schema() -> StructType:
    from pyspark.sql.types import BinaryType

    return StructType(
        [
            StructField("entry_path", StringType()),
            StructField("name", StringType()),
            StructField("folder", StringType()),
            StructField("size", LongType()),
            StructField("compressed_size", LongType()),
            StructField("content", BinaryType()),
        ]
    )


class ZipMemberRange(InputPartition):
    def __init__(self, zip_path: str, names: list[str], include_content: bool):
        self.zip_path = zip_path
        self.names = names
        self.include_content = include_content


class ZipReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("zipfile source requires .option('path', ...)")
        self.members_per_split = int(options.get("membersPerSplit", "256"))
        self.include_content = (
            str(options.get("includeContent", "false")).lower() == "true"
        )
        self._name_preds: list = []

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        """Accept entry_path string predicates; they prune members at
        planning time against the central directory. Everything else is
        left for Spark to evaluate."""
        remaining = []
        for f in filters:
            if isinstance(
                f, (StringStartsWith, StringEndsWith, StringContains, EqualTo)
            ) and tuple(f.attribute) == ("entry_path",):
                self._name_preds.append(f)
            else:
                remaining.append(f)
        return remaining

    def _keep(self, name: str) -> bool:
        for f in self._name_preds:
            if isinstance(f, StringStartsWith) and not name.startswith(f.value):
                return False
            if isinstance(f, StringEndsWith) and not name.endswith(f.value):
                return False
            if isinstance(f, StringContains) and f.value not in name:
                return False
            if isinstance(f, EqualTo) and name != f.value:
                return False
        return True

    def partitions(self) -> list[ZipMemberRange]:
        import zipfile

        with zipfile.ZipFile(self.path) as zf:
            names = [
                i.filename
                for i in zf.infolist()
                if not i.is_dir() and self._keep(i.filename)
            ]
        chunks = [
            names[i : i + self.members_per_split]
            for i in range(0, len(names), self.members_per_split)
        ] or [[]]
        return [
            ZipMemberRange(self.path, chunk, self.include_content)
            for chunk in chunks
        ]

    def read(self, partition: ZipMemberRange) -> Iterator[tuple]:
        import zipfile

        if not partition.names:
            return
        with zipfile.ZipFile(partition.zip_path) as zf:
            for name in partition.names:
                info = zf.getinfo(name)
                folder = name.rsplit("/", 1)[0] if "/" in name else ""
                base = name.rsplit("/", 1)[-1]
                content = zf.read(name) if partition.include_content else None
                yield (
                    name,
                    base,
                    folder,
                    info.file_size,
                    info.compress_size,
                    content,
                )


class ZipDataSource(DataSource):
    """``spark.read.format("zipfile")`` — member-range-parallel ZIP scan
    with planning-time entry_path filter pushdown."""

    @classmethod
    def name(cls) -> str:
        return "zipfile"

    def schema(self) -> StructType:
        return _schema()

    def reader(self, schema: StructType) -> ZipReader:
        return ZipReader(self.options)


def register_zip_datasource(spark) -> None:
    """Idempotently register the zipfile format on this session (and
    enable Python-source filter pushdown, off by default in Spark 4)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ZipDataSource)
