"""JSONL (newline-delimited JSON) source and sink.

The reference ingests CSV only (server/services/csv-import.js); JSONL
is the de-facto interchange format for training corpora, so the engine
carries it as a first-class source/sink with the same posture as the
CSV path: PERMISSIVE parse, bad records quarantined instead of failing
the job, typing deferred to the validation operator when the caller
wants reference semantics.

Scale: a JSONL file splits on line boundaries, so a single 1 TB file
still parallelizes (unlike multiline JSON, which is one-record-per-file
and deliberately not offered here); compressed inputs split per file.
The corrupt-record channel is a column, not a driver-side list — bad
lines stay distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def jsonl_scan(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """PERMISSIVE JSONL read. With ``schema`` the scan never pays the
    inference pass (at scale always pass one — inference reads the data
    twice); without it, Spark samples to infer. Malformed lines land in
    ``_corrupt_record`` with every schema field NULL."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    )
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        # the corrupt channel must exist in the schema to be populated
        if CORRUPT_COL not in schema.fieldNames():
            schema = schema.add(CORRUPT_COL, T.StringType())
        reader = reader.schema(schema)
    return reader.json(path)


def jsonl_scan_split(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> tuple[DataFrame, DataFrame]:
    """(good, bad): one line-oriented text scan parsed with
    ``from_json`` — the quarantine-channel variant of :func:`jsonl_scan`.

    Why not filter the raw JSON scan's ``_corrupt_record``? Spark
    disallows queries whose referenced columns prune down to only the
    corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — any count or
    select over the bad side trips it, and the sanctioned workaround
    (cache the scan) is exactly what a 100 TB input cannot do. A text
    scan splits on the same line boundaries and ``from_json`` carries
    its own corrupt channel, so both sides stay lazy and distributed;
    ``bad`` is (raw_line) for requeue/inspection."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COL not in schema.fieldNames():
        schema = schema.add(CORRUPT_COL, T.StringType())
    parsed = spark.read.text(path).select(
        F.from_json(
            F.col("value"), schema, {"columnNameOfCorruptRecord": CORRUPT_COL}
        ).alias("__r"),
        F.col("value"),
    )
    flag = F.col(f"__r.{CORRUPT_COL}")
    # blank/whitespace-only lines parse to a null struct whose corrupt
    # field is ALSO null — from_json('') raises nothing — so they would
    # land on the good side as spurious all-null rows; route them to
    # the quarantine channel with the genuinely corrupt lines
    blank = F.trim(F.col("value")) == ""
    good = parsed.filter(flag.isNull() & ~blank).select("__r.*").drop(CORRUPT_COL)
    bad = parsed.filter(flag.isNotNull() | blank).select(
        F.col("value").alias(CORRUPT_COL)
    )
    return good, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    max_records_per_file: int | None = None,
    compression: str | None = None,
) -> None:
    """JSONL sink. ``max_records_per_file`` is the same batch-size knob
    the CSV import maps from the reference (csv-import.js:363);
    ``compression`` ('gzip'/'zstd'/...) trades scan splittability for
    size — at corpus scale prefer many moderate files over few huge
    compressed ones."""
    writer = df.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
