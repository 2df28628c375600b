"""Bucketed table storage — the shuffle-elimination path for repeated
fact-fact joins and aggregations on a stable key.

The reference has no storage layout notion (its store is a row DB);
this is the Spark-native answer to "the same big join runs every day":
write both sides bucketed by the join key once, and every subsequent
join/groupBy on that key reads pre-partitioned data — the exchange
disappears from the plan entirely (verified by
tests/test_bucketed.py, which asserts on the physical plan).

Scale notes (SCALE.md "Upsert / MERGE", "What was deliberately
avoided"): at 100 TB the bucket count should put one bucket at
~128-512 MB per file; bucket pruning applies on equality filters over
the bucket key. Bucketing pins a layout — worth it only for keys hot
enough to amortize the up-front shuffle, which is exactly the upsert
key / FK-join case this engine hits every import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    *,
    buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and by default sorted) managed
    table. Sorting within buckets lets sort-merge joins skip the sort
    as well as the shuffle (the plan degenerates to a zip-merge over
    co-located files)."""
    writer = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)


def bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back; Catalyst picks up the bucket spec
    from the catalog, so downstream joins/aggs on the bucket key plan
    without an Exchange."""
    return spark.table(table_name)


def exchanges_in_plan(df: DataFrame) -> int:
    """Count Exchange operators in the physical plan (test/audit
    helper — the number that bucketing is supposed to drive to zero)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    *,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Time-series layout: hive-partition by day of ``ts_col`` and sort
    rows by the timestamp inside each file.

    This is the scan-side half of the 100 TB story that bucketing
    doesn't cover: a time-range filter prunes whole partition
    directories BEFORE listing files (PartitionFilters in the scan
    node), and the in-file ordering gives parquet min/max zone maps a
    monotone column, so even intra-day range predicates skip row
    groups. repartitionByRange on (day, ts) lines file boundaries up
    with the sort order instead of hashing days across writers."""
    from pyspark.sql import functions as F

    staged = (
        df.withColumn("__day", F.date_format(F.date_trunc("day", ts_col), "yyyy-MM-dd"))
        .repartitionByRange(F.col("__day"), F.col(ts_col))
        .sortWithinPartitions("__day", ts_col)
    )
    writer = staged.write.mode(mode).partitionBy("__day")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def read_time_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the day-partitioned layout back; day-range predicates on
    ``__day`` become PartitionFilters (no file listing outside the
    range)."""
    return spark.read.parquet(path)
