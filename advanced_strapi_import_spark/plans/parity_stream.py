"""Streaming + multimodal queries through the driver contract.

`stream_events_hourly` actually runs a Structured Streaming plan
(availableNow trigger, memory sink) and is checked against the SAME
DuckDB oracle as the batch hourly aggregate — proving the streaming
face computes the batch answer. `multimodal_byte_histogram` drives the
Arrow-batched mapInPandas feature extractor against a pure-SQL oracle
(documents are ASCII, so byte == char histogram).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from advanced_strapi_import_spark.operators.multimodal import byte_histogram
from advanced_strapi_import_spark.plans.registry import load, query
from advanced_strapi_import_spark.streaming import ingest as ST


@query(
    "stream_events_hourly",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, count(*) AS n, round(sum(value), 2) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    doc="Structured Streaming (availableNow) watermarked tumbling-window "
        "aggregate — drained stream equals the batch/DuckDB answer.",
)
def stream_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ST.read_events_stream(spark, sf_dir)
    return ST.run_available_now(ST.hourly_agg(stream))


@query(
    "multimodal_byte_histogram",
    oracle="""
WITH b AS (
  SELECT doc_id, text, length(text) AS n_bytes,
         unnest(range(0, 16)) AS bucket
  FROM documents)
SELECT doc_id,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(bucket AS INTEGER) AS bucket,
       CAST(len(list_filter(regexp_extract_all(text, '.'),
                c -> ascii(c) // 16 = bucket)) AS BIGINT) AS count
FROM b
""",
    doc="Multimodal plumbing: binary column (utf-8 encoded text) -> "
        "Arrow-batched mapInPandas byte-histogram feature extraction.",
)
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    return byte_histogram(d)
