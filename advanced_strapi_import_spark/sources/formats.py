"""Additional Spark-native source/sink formats: ORC, XML, text,
binaryFile.

The reference ingests CSV and ZIP archives only
(`/root/reference/server/services/csv-import.js:35` and the zip
routing neighbors); a 100 TB lake is never that uniform. These are
deliberately THIN wrappers over Spark's built-in datasources — the
point is contract documentation + tested behavior, not re-plumbing:

- ORC: the second columnar format next to parquet. Predicate pushdown
  and column pruning work exactly as for parquet (ORC carries min/max
  zone maps per stripe); `tests/test_formats.py` plan-asserts the
  pushed filter so a regression in the scan path is caught, not
  assumed.
- XML (native in Spark 4.0, the merged spark-xml): `rowTag` selects
  the repeating element; attributes surface as `_attr` columns and
  nested elements as structs. Schema inference samples the input —
  pass an explicit schema in production for stable plans.
- text: one row per line (or one row per FILE with `wholetext` — the
  document-ingestion mode that pairs with the corpus operators).
- binaryFile: (path, modificationTime, length, content) per file —
  the ingestion bridge INTO the multimodal column operators: read a
  directory of images as binary rows, then hand `content` straight to
  image_pixel_stats / sniff_media_meta. Supports pathGlobFilter and
  partition-dir discovery; files stream as splits, never through the
  driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """ORC sink (snappy default). Column order is preserved; nested
    struct/array/map types round-trip like parquet."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — filters/projection push into the stripe reader the
    same way parquet pushdown works (min/max zone maps per stripe)."""
    return spark.read.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    *,
    row_tag: str,
    schema=None,
) -> DataFrame:
    """XML scan via Spark 4's native `xml` datasource. ``row_tag`` is
    the repeating record element; nested elements become structs,
    repeated ones arrays, attributes `_name` fields. Without
    ``schema`` the reader samples the files to infer one — fine
    interactively, pass a schema for production-stable plans."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame, path: str, *, row_tag: str, root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink (one <row_tag> element per row under <root_tag>)."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )


def read_text(
    spark: SparkSession, path: str, *, whole_file: bool = False
) -> DataFrame:
    """Text scan: one row per line, or one row per FILE with
    ``whole_file=True`` (column `value`) — the raw-document ingestion
    mode feeding the corpus/text operators."""
    return spark.read.text(path, wholetext=whole_file)


def read_binary_files(
    spark: SparkSession, path: str, *, glob: str | None = None
) -> DataFrame:
    """binaryFile scan: (path, modificationTime, length, content) per
    file — the bridge from an object-store directory of media files
    into the multimodal binary-column operators. ``glob`` maps to
    pathGlobFilter (server-side file pruning, no driver listing of
    excluded files)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
