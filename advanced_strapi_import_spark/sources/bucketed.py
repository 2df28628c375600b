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


def morton_key(a, b, *, bits: int = 16):
    """Z-order (Morton) key: interleave the low ``bits`` bits of two
    non-negative integer columns — pure JVM bit arithmetic (shifts,
    masks, bitwise or), exact and codegen-friendly. Columns should be
    rank- or range-normalized into [0, 2^bits) first so both dimensions
    get equal weight."""
    from pyspark.sql import functions as F

    key = F.lit(0).cast("long")
    av = a.cast("long")
    bv = b.cast("long")
    for i in range(bits):
        key = (
            key
            .bitwiseOR(av.bitwiseAND(F.lit(1 << i)).cast("long") * F.lit(1 << i))
            .bitwiseOR(bv.bitwiseAND(F.lit(1 << i)).cast("long") * F.lit(1 << (i + 1)))
        )
    return key


def write_zordered(
    df, path: str, col_a: str, col_b: str, *, bits: int = 12,
    n_files: int = 16, mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet layout: rows sort by the Morton
    interleave of two range-normalized columns, so file-level min/max
    zone maps stay TIGHT on BOTH columns at once — a single-column sort
    gives perfect pruning on that column and none on the other; Z-order
    gives roughly sqrt-grade pruning on each. The standard layout for
    two-dimensional selective scans (e.g. (customer, date) or
    (key, ts)) at 100 TB, here with exact integer normalization:
    each column maps to its 2^bits range via (x - min) * (2^bits - 1)
    / (max - min) computed from a 1-row bounds aggregate (broadcast).

    repartitionByRange(morton) aligns FILE boundaries with the curve,
    which is what turns the clustering into actual file skipping."""
    from pyspark.sql import functions as F

    lo_a, hi_a, lo_b, hi_b = "__loa", "__hia", "__lob", "__hib"
    bounds = df.agg(
        F.min(col_a).cast("double").alias(lo_a),
        F.max(col_a).cast("double").alias(hi_a),
        F.min(col_b).cast("double").alias(lo_b),
        F.max(col_b).cast("double").alias(hi_b),
    )
    top = (1 << bits) - 1
    j = df.crossJoin(F.broadcast(bounds))
    norm_a = F.floor(
        (F.col(col_a).cast("double") - F.col(lo_a))
        * top
        / F.greatest(F.col(hi_a) - F.col(lo_a), F.lit(1e-12))
    ).cast("long")
    norm_b = F.floor(
        (F.col(col_b).cast("double") - F.col(lo_b))
        * top
        / F.greatest(F.col(hi_b) - F.col(lo_b), F.lit(1e-12))
    ).cast("long")
    staged = (
        j.withColumn("__z", morton_key(norm_a, norm_b, bits=bits))
        .drop(lo_a, hi_a, lo_b, hi_b)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    staged.write.mode(mode).parquet(path)


def file_zone_maps(spark, path: str, *cols: str):
    """Per-file (min, max) of ``cols`` — the zone maps a reader prunes
    with. Reads only parquet footers' worth of data (metadata columns
    via input_file_name + per-file agg)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path).withColumn(
        "__file", F.input_file_name()
    )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy("__file").agg(*aggs)
