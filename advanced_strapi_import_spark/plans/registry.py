"""Single-source registry of engine queries.

Each entry pairs a PySpark plan builder with the ANSI-SQL oracle that
DuckDB runs on the same parquet tables (driver contract, see
__spark_entry__.py). Keeping both in one place guarantees the column
names/aliases stay in sync — the driver's compare hashes values after
sorting columns by name.

Conventions (to make the value-hash deterministic across engines):
  - every double-valued aggregate is round(x, 2) on BOTH sides;
  - timestamps in outputs are formatted to 'yyyy-MM-dd HH:mm:ss' strings;
  - any LIMIT is preceded by a deterministic ORDER BY;
  - DuckDB sum(int) returns HUGEINT -> oracle casts to BIGINT to match
    Spark's sum(long) -> long.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = ""):
    """Decorator registering a (spark_fn, oracle_sql) pair.

    Invoking a registered query first releases the PREVIOUS query's
    run-scoped persists (see caching.py): harnesses that never call
    release_tracked — the round driver runs ~100 queries in one
    session — would otherwise accumulate every per-query persisted
    frame in storage memory. Worst case for a pipeline composing two
    registry queries is a recompute, never a wrong result."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        import functools

        from advanced_strapi_import_spark import caching

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            caching.release_tracked()
            return fn(spark, sf_dir)

        QUERIES[name] = QuerySpec(name=name, fn=wrapped, oracle=oracle, doc=doc)
        return fn

    return deco


# Lazy-scan memo: spark.read.parquet costs ~100-140 ms per call on the
# driver (file listing + footer schema probe + py4j), and the suite
# makes hundreds of load() calls. The memo holds the UNEXECUTED scan
# DataFrame only — no data, no results; every execution still reads
# the parquet — so it is plan-object reuse, not caching. Keyed on
# (applicationId, path, mtime_ns, size): a stopped session or a
# rewritten file can never serve a stale plan/schema.
_SCAN_MEMO: dict = {}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Parquet table scan (SURVEY §2.1 S3). Column pruning + predicate
    pushdown are delegated to Catalyst — callers filter/select lazily."""
    import os

    path = f"{sf_dir}/{table}.parquet"
    import stat as _stat

    try:
        st = os.stat(path)
    except OSError:
        st = None
    if st is None or not _stat.S_ISREG(st.st_mode):
        # globs / directory tables / races: no memo — a directory's
        # mtime misses nested rewrites, so only single-file tables
        # (all the driver testdata) take the fast path
        return spark.read.parquet(path)
    key = (spark.sparkContext.applicationId, path, st.st_mtime_ns, st.st_size)
    if table == "events":
        # the events scan plan depends on a session conf (nanosAsLong
        # changes how a TIMESTAMP(NANOS) column reads) — fold the live
        # conf value into the key so a load() issued before load_events
        # sets the conf can never poison the memo with a plan built
        # under the wrong setting (r12 VERDICT hardening)
        try:
            key += (spark.conf.get(
                "spark.sql.legacy.parquet.nanosAsLong", None
            ),)
        except Exception:
            key += (None,)
    hit = _SCAN_MEMO.get(key)
    if hit is None:
        if len(_SCAN_MEMO) >= 256:
            _SCAN_MEMO.clear()
        hit = _SCAN_MEMO[key] = spark.read.parquet(path)
    return hit


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the cluster's default parallelism —
    placed between a scan and a compute-bound stage when the scan's
    split count is below the core count.

    The test tables are single-row-group parquet files, so Spark's
    byte-range file splitting yields ONE input partition and every
    per-row-heavy expression (md5-per-shingle, stopword scans, regexp
    casts) serializes on one core. At 100 TB a table is thousands of
    splits and this is a no-op decision — but the operator is still the
    standard fix whenever scan parallelism < cores (few huge gzip/row
    files, small dimension feeding a heavy UDF). The shuffle moves only
    the scan's projected columns, priced far below the compute it
    unlocks; do NOT use it in front of cheap scans or aggregations —
    those are bounded by the shuffle it would add."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def normalize_ts(df: DataFrame, ts_type) -> DataFrame:
    """Normalize the events ``ts`` column to a session-tz TIMESTAMP
    whatever the physical parquet encoding — the ONE place both the
    batch scan (load_events) and the file-source stream
    (streaming.ingest.read_events_stream) share, so a new shipped
    encoding is handled once for both faces:

    - TIMESTAMP(NANOS): Spark reads only as long (nanosAsLong conf);
      convert ns -> us (truncating division, same as DuckDB's cast).
    - timestamp[us] without tz: infers as TIMESTAMP_NTZ, which some
      builtins (``unix_micros``) reject; cast to timestamp_ltz (UTC
      session tz, wall-clock preserved exactly)."""
    from pyspark.sql import functions as F, types as T

    if isinstance(ts_type, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def sessionize(events: DataFrame, *, gap_seconds: int = 1800) -> DataFrame:
    """Append a per-user gap-based session id column ``sid`` (1-based,
    increasing with time): a new session starts when the gap to the
    previous event exceeds ``gap_seconds``.

    ONE definition of the sessionization used by the batch
    sessionizer, sequential-rule mining, and any future session-scoped
    query — the 30-minute gap and the TIMESTAMP_NTZ-vs-LTZ cast
    workaround (parquet timestamp[us] infers NTZ, which unix_micros
    rejects; casting to timestamp_ltz under the UTC session tz is
    value-preserving) must not fork per query. Two windows over one
    user-hash partitioning; no joins."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    prev = F.unix_micros(F.lag("ts").over(w).cast("timestamp_ltz"))
    gap = us - prev
    return events.withColumn(
        "sid",
        F.sum(
            F.when(
                gap.isNull() | (gap > gap_seconds * 1_000_000), 1
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events scan with ts normalization (see :func:`normalize_ts`)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the conf above is set before the first scan-plan creation, so the
    # memoized plan (load) is always built under nanosAsLong; no plan
    # path reads the events table except through here
    df = load(spark, sf_dir, "events")
    return normalize_ts(df, df.schema["ts"].dataType)
