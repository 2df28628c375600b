"""Data-quality / catalog-maintenance queries: column statistics
(ANALYZE-shape), referential-integrity audit, snapshot diff (CDC
census), and OHLC time-series downsampling.

These are the table-health operations a 100 TB lakehouse runs
continuously: stats feed the CBO and zone maps, the FK audit and the
snapshot diff gate ingest promotion, the OHLC bars are the canonical
rollup-hypertable downsample. Every query has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from advanced_strapi_import_spark.plans.registry import load, load_events, query

TS_FMT = "yyyy-MM-dd HH:mm:ss"


# ---------------------------------------------------------------------------
# column statistics (one aggregation pass, ANALYZE TABLE shape)
# ---------------------------------------------------------------------------
_STATS_COLS = [
    # (name, kind) — kind picks which min/max slot the column fills
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _stats_oracle() -> str:
    parts = []
    for name, kind in _STATS_COLS:
        if kind == "num":
            mn, mx = f"round(min({name}), 2)", f"round(max({name}), 2)"
            ms, xs = "NULL", "NULL"
        elif kind == "ts":
            mn, mx = "NULL", "NULL"
            ms = f"strftime(min({name}), '%Y-%m-%d %H:%M:%S')"
            xs = f"strftime(max({name}), '%Y-%m-%d %H:%M:%S')"
        else:
            mn, mx = "NULL", "NULL"
            ms, xs = f"min({name})", f"max({name})"
        parts.append(
            f"SELECT '{name}' AS col_name,\n"
            f"       CAST(count(*) FILTER ({name} IS NULL) AS BIGINT) AS n_nulls,\n"
            f"       CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,\n"
            f"       CAST({mn} AS DOUBLE) AS min_num,\n"
            f"       CAST({mx} AS DOUBLE) AS max_num,\n"
            f"       CAST({ms} AS VARCHAR) AS min_str,\n"
            f"       CAST({xs} AS VARCHAR) AS max_str\n"
            f"FROM orders"
        )
    return "\nUNION ALL\n".join(parts)


@query(
    "table_column_stats",
    oracle=_stats_oracle(),
    doc="Per-column table statistics over orders: null count, distinct "
        "count, typed min/max (numerics rounded, timestamps formatted) "
        "— the ANALYZE TABLE output that feeds the CBO, zone maps, and "
        "data-quality dashboards. The Spark side computes ALL columns' "
        "aggregates in ONE pass over the table (single agg row, "
        "exploded to one row per column afterwards) — never one scan "
        "per column like the oracle's UNION ALL.",
)
def table_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.plans.registry import fan_out

    # 9 exact countDistincts -> one Expand replicating every row ~10x;
    # that map-heavy stage serializes on the single-split test scan
    o = fan_out(load(spark, sf_dir, "orders"))
    aggs = []
    for name, kind in _STATS_COLS:
        c = F.col(name)
        aggs.append(F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("long")
                    .alias(f"__nn_{name}"))
        aggs.append(F.countDistinct(c).cast("long").alias(f"__nd_{name}"))
        if kind == "num":
            aggs.append(F.round(F.min(c), 2).cast("double").alias(f"__mn_{name}"))
            aggs.append(F.round(F.max(c), 2).cast("double").alias(f"__mx_{name}"))
        elif kind == "ts":
            aggs.append(F.date_format(F.min(c), TS_FMT).alias(f"__ms_{name}"))
            aggs.append(F.date_format(F.max(c), TS_FMT).alias(f"__xs_{name}"))
        else:
            aggs.append(F.min(c).alias(f"__ms_{name}"))
            aggs.append(F.max(c).alias(f"__xs_{name}"))
    one = o.agg(*aggs)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    rows = []
    for name, kind in _STATS_COLS:
        rows.append(F.struct(
            F.lit(name).alias("col_name"),
            F.col(f"__nn_{name}").alias("n_nulls"),
            F.col(f"__nd_{name}").alias("n_distinct"),
            (F.col(f"__mn_{name}") if kind == "num" else null_d).alias("min_num"),
            (F.col(f"__mx_{name}") if kind == "num" else null_d).alias("max_num"),
            (F.col(f"__ms_{name}") if kind != "num" else null_s).alias("min_str"),
            (F.col(f"__xs_{name}") if kind != "num" else null_s).alias("max_str"),
        ))
    return one.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


# ---------------------------------------------------------------------------
# referential-integrity audit
# ---------------------------------------------------------------------------
_FK_RELS = [
    # (tag, child, fk, parent, pk)
    ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
]


def _fk_oracle() -> str:
    parts = []
    for tag, child, fk, parent, pk in _FK_RELS:
        parts.append(f"""
SELECT '{tag}' AS relationship,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (c.{fk} IS NULL) AS BIGINT) AS n_null_fk,
       CAST(count(*) FILTER (c.{fk} IS NOT NULL AND p.{pk} IS NULL)
            AS BIGINT) AS n_orphans,
       CAST(count(*) FILTER (c.{fk} IS NOT NULL AND p.{pk} IS NULL)
            * 1000000 // count(*) AS BIGINT) AS orphan_ppm
FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
  ON c.{fk} = p.{pk}""")
    return "\nUNION ALL".join(parts)


@query(
    "fk_integrity_check",
    oracle=_fk_oracle(),
    doc="Referential-integrity audit across the star schema's five FK "
        "relationships: row count, null-FK count, orphan count (FK set "
        "but no parent), orphan ppm. Each relationship is one "
        "broadcast-left-join against the DISTINCT parent keys (never "
        "the parent rows); the five audits union into a 5-row report. "
        "This is the ingest-promotion gate a lakehouse runs per batch.",
)
def fk_integrity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for tag, child, fk, parent, pk in _FK_RELS:
        c = load(spark, sf_dir, child)
        p = load(spark, sf_dir, parent).select(pk).distinct()
        j = c.join(F.broadcast(p), c[fk] == p[pk], "left")
        orphan = F.when(c[fk].isNotNull() & p[pk].isNull(), 1).otherwise(0)
        rep = j.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(c[fk].isNull(), 1).otherwise(0)).cast("long")
             .alias("n_null_fk"),
            F.sum(orphan).cast("long").alias("n_orphans"),
        ).select(
            F.lit(tag).alias("relationship"),
            "n_rows", "n_null_fk", "n_orphans",
            F.expr("n_orphans * 1000000 div n_rows").cast("long")
             .alias("orphan_ppm"),
        )
        out = rep if out is None else out.unionByName(rep)
    return out


# ---------------------------------------------------------------------------
# snapshot diff (CDC census between two table versions)
# ---------------------------------------------------------------------------
@query(
    "snapshot_diff",
    oracle="""
WITH v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 13 = 0 THEN round(o_totalprice + 1, 2)
              ELSE round(o_totalprice, 2) END AS o_totalprice
  FROM orders WHERE o_orderkey % 17 <> 0
  UNION ALL
  SELECT o_orderkey + 8000000, round(o_totalprice, 2)
  FROM orders WHERE o_orderkey % 19 = 0),
v1 AS (SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders),
d AS (
  SELECT CASE WHEN v1.o_orderkey IS NULL THEN 'added'
              WHEN v2.o_orderkey IS NULL THEN 'removed'
              WHEN v1.o_totalprice <> v2.o_totalprice THEN 'changed'
              ELSE 'unchanged' END AS status,
         coalesce(v2.o_totalprice, 0) - coalesce(v1.o_totalprice, 0) AS delta
  FROM v1 FULL OUTER JOIN v2 USING (o_orderkey))
SELECT status, CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(delta), 2) AS price_delta
FROM d GROUP BY status
""",
    doc="Snapshot diff between two versions of orders (v2 synthesized: "
        "every 17th key deleted, every 13th price bumped, every 19th "
        "key re-inserted under a new id): per-status row census and "
        "net price delta — the CDC reconciliation report for a "
        "table-format time-travel pair. One full-outer join on the "
        "primary key (both sides hash-partitioned once), then a "
        "4-group aggregate.",
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    v1 = o.select("o_orderkey", F.round("o_totalprice", 2).alias("p"))
    v2 = (
        o.filter(F.col("o_orderkey") % 17 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 13 == 0,
                   F.round(F.col("o_totalprice") + 1, 2))
            .otherwise(F.round("o_totalprice", 2)).alias("p"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 19 == 0).select(
                (F.col("o_orderkey") + 8000000).alias("o_orderkey"),
                F.round("o_totalprice", 2).alias("p"),
            )
        )
    )
    j = v1.alias("a").join(v2.alias("b"), "o_orderkey", "full_outer")
    status = (
        F.when(F.col("a.p").isNull(), "added")
        .when(F.col("b.p").isNull(), "removed")
        .when(F.col("a.p") != F.col("b.p"), "changed")
        .otherwise("unchanged")
    )
    delta = F.coalesce(F.col("b.p"), F.lit(0.0)) - F.coalesce(F.col("a.p"), F.lit(0.0))
    return (
        j.select(status.alias("status"), delta.alias("delta"))
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(F.sum("delta"), 2).alias("price_delta"),
        )
    )


# ---------------------------------------------------------------------------
# OHLC downsampling (rollup-hypertable shape)
# ---------------------------------------------------------------------------
@query(
    "events_ohlc_bars",
    oracle="""
WITH b AS (
  SELECT event_type,
         strftime(ts - to_microseconds(epoch_us(ts) % 300000000),
                  '%Y-%m-%d %H:%M:%S') AS bar_start,
         ts, event_id, value
  FROM events),
w AS (
  SELECT event_type, bar_start, value,
         first_value(value) OVER win AS open,
         last_value(value) OVER
           (PARTITION BY event_type, bar_start ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS close
  FROM b
  WINDOW win AS (PARTITION BY event_type, bar_start ORDER BY ts, event_id))
SELECT event_type, bar_start,
       round(max(open), 2) AS open,
       round(max(close), 2) AS close,
       round(min(value), 2) AS low,
       round(max(value), 2) AS high,
       CAST(count(*) AS BIGINT) AS n
FROM w GROUP BY event_type, bar_start
""",
    doc="OHLC 5-minute bars per event type: open/close via "
        "deterministic (ts, event_id)-ordered first/last inside the "
        "bar, low/high/count as plain aggregates — the continuous- "
        "aggregate downsample every time-series store materializes. "
        "One shuffle on (type, bar); at 100 TB the bars land in a "
        "time-partitioned table and late data upserts per bar.",
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_events(spark, sf_dir)
    bar = F.date_format(
        F.timestamp_micros(
            F.unix_micros("ts") - F.unix_micros("ts") % 300000000
        ),
        TS_FMT,
    )
    b = e.select("event_type", bar.alias("bar_start"), "ts", "event_id", "value")
    win = Window.partitionBy("event_type", "bar_start").orderBy("ts", "event_id")
    full = win.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w = b.select(
        "event_type", "bar_start", "value",
        F.first("value").over(win).alias("open"),
        F.last("value").over(full).alias("close"),
    )
    return w.groupBy("event_type", "bar_start").agg(
        F.round(F.max("open"), 2).alias("open"),
        F.round(F.max("close"), 2).alias("close"),
        F.round(F.min("value"), 2).alias("low"),
        F.round(F.max("value"), 2).alias("high"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@query(
    "table_expectations",
    oracle="""
WITH agg AS (
  SELECT count(*) AS n_rows,
         count(*) FILTER (o_orderkey IS NULL) AS key_nulls,
         count(*) - count(DISTINCT o_orderkey) AS key_dupes,
         count(*) FILTER (o_totalprice IS NULL OR o_totalprice <= 0)
           AS nonpos_price,
         count(*) FILTER (o_orderdate IS NULL
                          OR o_orderdate < TIMESTAMP '1992-01-01'
                          OR o_orderdate >= TIMESTAMP '1999-01-01')
           AS date_out_of_range,
         count(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P'))
           AS bad_status,
         count(*) FILTER (o_custkey IS NULL) AS custkey_nulls
  FROM orders)
SELECT e.check_name, e.violations,
       e.violations = 0 AS passed,
       CAST(a.n_rows AS BIGINT) AS n_rows
FROM agg a CROSS JOIN (
  SELECT 'orderkey_not_null' AS check_name,
         CAST(key_nulls AS BIGINT) AS violations FROM agg
  UNION ALL SELECT 'orderkey_unique', CAST(key_dupes AS BIGINT) FROM agg
  UNION ALL SELECT 'totalprice_positive', CAST(nonpos_price AS BIGINT) FROM agg
  UNION ALL SELECT 'orderdate_in_range', CAST(date_out_of_range AS BIGINT) FROM agg
  UNION ALL SELECT 'status_accepted_values', CAST(bad_status AS BIGINT) FROM agg
  UNION ALL SELECT 'custkey_not_null', CAST(custkey_nulls AS BIGINT) FROM agg
) e
""",
    doc="Declarative data-expectations audit (dbt-test / "
        "Great-Expectations shape) over orders: not-null, uniqueness, "
        "value-range, accepted-values and FK-presence checks compiled "
        "into ONE aggregation pass over the table (conditional "
        "count_if per check + one count-distinct for uniqueness), then "
        "unpivoted to a row per check. At 100 TB every additional "
        "expectation is one more map-side counter on the same scan — "
        "cost is O(checks) per row, never O(checks) scans; the "
        "uniqueness check is the only shuffle (count-distinct on the "
        "key) and swaps for approx_count_distinct drift gating when "
        "exactness isn't required.",
)
def table_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    lo = F.lit("1992-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1999-01-01 00:00:00").cast("timestamp")
    agg = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_if(F.col("o_orderkey").isNull()).alias("__c0"),
        (
            F.count(F.lit(1)) - F.countDistinct("o_orderkey")
        ).alias("__c1"),
        F.count_if(
            F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)
        ).alias("__c2"),
        F.count_if(
            F.col("o_orderdate").isNull()
            | (F.col("o_orderdate") < lo)
            | (F.col("o_orderdate") >= hi)
        ).alias("__c3"),
        F.count_if(
            ~F.col("o_orderstatus").isin("O", "F", "P")
        ).alias("__c4"),
        F.count_if(F.col("o_custkey").isNull()).alias("__c5"),
    )
    checks = [
        ("orderkey_not_null", "__c0"),
        ("orderkey_unique", "__c1"),
        ("totalprice_positive", "__c2"),
        ("orderdate_in_range", "__c3"),
        ("status_accepted_values", "__c4"),
        ("custkey_not_null", "__c5"),
    ]
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(c).cast("long").alias("violations"),
            )
            for name, c in checks
        ]
    )
    return (
        agg.select("n_rows", F.explode(pairs).alias("e"))
        .select(
            F.col("e.check_name").alias("check_name"),
            F.col("e.violations").alias("violations"),
            (F.col("e.violations") == 0).alias("passed"),
            "n_rows",
        )
    )


@query(
    "customer_k_anonymity",
    oracle="""
WITH q AS (
  SELECT c_nationkey AS nk, c_mktsegment AS seg,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket
  FROM customer),
g AS (
  SELECT nk, seg, bal_bucket, count(*) AS n FROM q
  GROUP BY nk, seg, bal_bucket)
SELECT nk, seg, bal_bucket,
       CAST(n AS BIGINT) AS n,
       n >= 5 AS k_anonymous
FROM g
""",
    doc="k-anonymity audit over quasi-identifiers (nation, segment, "
        "balance bucket): equivalence-class sizes plus the k>=5 flag — "
        "the privacy-release gate run before exporting user-derived "
        "training data; small classes are the re-identification risk "
        "and get suppressed/generalized downstream. One shuffle on the "
        "QI tuple; classes, not rows, come back.",
)
def customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    q = c.select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
    )
    return (
        q.groupBy("nk", "seg", "bal_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("k_anonymous", F.col("n") >= 5)
    )


@query(
    "events_decayed_topk",
    oracle="""
WITH mx AS (
  SELECT CAST(date_trunc('day', max(ts)) AS DATE) AS max_day FROM events),
w AS (
  SELECT event_type, user_id,
         CAST(sum(CAST(1000000 AS BIGINT) >> least(
           datediff('day', CAST(date_trunc('day', ts) AS DATE),
                    (SELECT max_day FROM mx)), 40)) AS BIGINT) AS decayed
  FROM events
  GROUP BY event_type, user_id),
r AS (
  SELECT event_type, user_id, decayed,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY decayed DESC, user_id) AS rnk
  FROM w)
SELECT event_type, user_id, decayed, CAST(rnk AS INT) AS rnk
FROM r WHERE rnk <= 10
""",
    doc="Freshness-weighted engagement: per (type, user) activity "
        "decayed by half per day of age — weight 1000000 >> age_days, "
        "INTEGER bit-shift so every engine agrees exactly — then "
        "top-10 users per type. The recency-biased popularity rollup "
        "feeding samplers/dashboards; one (type,user) shuffle plus a "
        "type-partitioned rank.",
)
def events_decayed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_events(spark, sf_dir)
    mx = e.agg(F.max(F.to_date(F.date_trunc("day", "ts"))).alias("max_day"))
    # SQL >> (unlike the python shiftright wrapper) takes a column shift.
    # The base MUST be BIGINT: Java int shifts mask the count to 5 bits,
    # so an INT 1000000 >> 32 silently returns 1000000 — ages past 31
    # days would get FULL weight instead of ~zero (long shifts mask to 6
    # bits, correct through the 40-day cap; DuckDB agrees on bigint).
    weight = F.expr(
        "CAST(1000000 AS BIGINT) >> "
        "least(datediff(max_day, to_date(date_trunc('day', ts))), 40)"
    )
    w = (
        e.crossJoin(F.broadcast(mx))
        .groupBy("event_type", "user_id")
        .agg(F.sum(weight).cast("long").alias("decayed"))
    )
    win = Window.partitionBy("event_type").orderBy(
        F.col("decayed").desc(), F.col("user_id")
    )
    return (
        w.withColumn("rnk", F.row_number().over(win).cast("int"))
        .filter(F.col("rnk") <= 10)
    )
