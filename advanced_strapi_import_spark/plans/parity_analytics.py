"""General analytical queries: multi-join TPC-H shapes, JSON
extraction, and sketch aggregates — the engine's "any query a reference
user could want next" surface. Multi-way join ordering, partial aggs
and broadcast selection are Catalyst's job; these queries verify the
results and `tools/explain_audit.py` verifies the plans."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from advanced_strapi_import_spark.caching import persist_tracked
from advanced_strapi_import_spark.plans.registry import fan_out, load, load_events, query


@query(
    "q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3 shape: selective dim filter -> two joins -> agg -> "
        "top-10. Broadcast of filtered customer, partial aggs map-side.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
    doc="TPC-H Q5 shape: 6-table star join with a co-nation constraint; "
        "dims broadcast, one shuffle for the final agg.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    return (
        r.join(n, n["n_regionkey"] == r["r_regionkey"])
        .join(c, c["c_nationkey"] == n["n_nationkey"])
        .join(o, o["o_custkey"] == c["c_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(
            s,
            (s["s_suppkey"] == l["l_suppkey"])
            & (s["s_nationkey"] == n["n_nationkey"]),
        )
        .groupBy(n["n_name"].alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "events_json_extract",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
""",
    doc="JSON property extraction (schema §1 `json` type) aggregated "
        "per event type — get_json_object stays JVM-side.",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "events_approx_users",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS within_bound
FROM events
GROUP BY event_type
""",
    doc="approx_count_distinct (HLL sketch) per event type — the "
        "constant-memory cardinality path for 100 TB. Value-checked: the "
        "exact distinct count must hash-match the oracle and the HLL "
        "estimate must land within 3x the configured rsd (|approx-exact|/"
        "exact <= 0.06, emitted as a boolean the oracle pins to TRUE).",
)
def events_approx_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("__approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("__approx") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.06
            ).alias("within_bound"),
        )
    )


@query(
    "events_cube_counts",
    oracle="""
SELECT event_type, user_id % 10 AS user_bucket,
       GROUPING(event_type, user_id % 10) AS gid,
       count(*) AS n
FROM events
GROUP BY CUBE(event_type, user_id % 10)
""",
    doc="CUBE over (event_type, user bucket) with grouping_id — "
        "multi-dimensional subtotal lattice in one pass (Spark expands "
        "to a single shuffle with grouping-set replication; exact "
        "integer counts are hash-stable across engines).",
)
def events_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).withColumn(
        "user_bucket", F.col("user_id") % 10
    )
    return (
        e.cube("event_type", "user_bucket")
        .agg(
            F.grouping_id("event_type", "user_bucket").alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("event_type", "user_bucket", "gid", "n")
    )


@query(
    "events_value_quantiles",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 2) AS p50,
       round(quantile_cont(value, 0.9), 2) AS p90,
       round(quantile_cont(value, 0.99), 2) AS p99
FROM events
GROUP BY event_type
""",
    doc="Exact linear-interpolation percentiles per group (Spark "
        "`percentile` == DuckDB `quantile_cont`): the latency-SLO "
        "query shape. At 100 TB swap for approx_percentile "
        "(t-digest) — same plan shape, bounded memory.",
)
def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 2).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 2).alias("p99"),
    )


@query(
    "custkey_set_ops",
    oracle="""
SELECT 'both' AS tag, k FROM (
  SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT
  SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '5-LOW')
UNION ALL
SELECT 'urgent_only' AS tag, k FROM (
  SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
  EXCEPT
  SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '5-LOW')
""",
    doc="Set operations the reference never had (SURVEY §2.6): INTERSECT "
        "and EXCEPT (both hash-based left-semi/anti under Catalyst) "
        "tagged and unioned in one result.",
)
def custkey_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("k")
    )
    both = urgent.intersect(low).select(F.lit("both").alias("tag"), "k")
    # subtract = set EXCEPT (exceptAll would be multiset difference and
    # leave keys whose urgent multiplicity exceeds their low multiplicity)
    only = urgent.distinct().subtract(low).select(
        F.lit("urgent_only").alias("tag"), "k"
    )
    return both.unionByName(only)


@query(
    "events_grouping_sets",
    oracle="""
SELECT event_type, user_id % 10 AS user_bucket,
       GROUPING(event_type, user_id % 10) AS gid,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events
GROUP BY GROUPING SETS ((event_type), (user_id % 10))
""",
    doc="Explicit GROUPING SETS — two independent groupings in one "
        "pass/shuffle (completes the lattice trio with rollup and "
        "cube elsewhere in the catalog).",
)
def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).withColumn("user_bucket", F.col("user_id") % 10)
    return (
        e.groupingSets(
            [["event_type"], ["user_bucket"]], "event_type", "user_bucket"
        )
        .agg(
            F.grouping_id("event_type", "user_bucket").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select("event_type", "user_bucket", "gid", "n", "total_value")
    )


@query(
    "events_multi_distinct",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS users,
       count(DISTINCT CAST(date_trunc('day', ts) AS DATE)) AS active_days,
       count(*) AS n
FROM events
GROUP BY event_type
""",
    doc="Multiple DISTINCT aggregates in one GROUP BY — Catalyst plans "
        "this as one Expand (row replication per distinct column) plus "
        "a two-level aggregate, not two scans.",
)
def events_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users"),
        F.countDistinct(F.to_date(F.date_trunc("day", "ts"))).alias("active_days"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "events_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.ts) AS c_ts FROM events e
  JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(e.ts) AS p_ts FROM events e
  JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_view_click_purchase
""",
    doc="Ordered conversion funnel (view -> later click -> later "
        "purchase per user): each stage is a per-user min-timestamp "
        "aggregate semi-gated by the previous stage. Three shuffles on "
        "user_id (one per stage), each stage's output shrinks — the "
        "standard sequential-funnel shape that window-only rewrites "
        "get wrong when stages interleave.",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.caching import persist_tracked

    ev = load_events(spark, sf_dir)
    # each stage feeds BOTH its own count and the next stage's gate —
    # persist the tiny per-user aggregates so the events scan + stage
    # shuffle run once per stage, not once per consumer
    v = persist_tracked(
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = persist_tracked(
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    counts = [
        v.agg(F.count(F.lit(1)).alias("n_view")),
        c.agg(F.count(F.lit(1)).alias("n_view_click")),
        p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")),
    ]
    out = counts[0]
    for df in counts[1:]:
        out = out.crossJoin(df)  # 1x1 scalar joins
    return out


@query(
    "events_anomaly_zscore",
    oracle="""
WITH daily AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         count(*) AS n
  FROM events GROUP BY event_type, date_trunc('day', ts)),
stats AS (
  SELECT event_type, day, n,
         avg(n) OVER (PARTITION BY event_type) AS mu,
         stddev(n) OVER (PARTITION BY event_type) AS sigma
  FROM daily)
SELECT event_type, day, CAST(n AS BIGINT) AS n,
       round((n - mu) / sigma, 4) AS zscore,
       (abs((n - mu) / sigma) > 2.0) AS is_anomaly
FROM stats
""",
    doc="Daily-count anomaly detection per event type: z-score against "
        "the type's own daily distribution (sample stddev both "
        "engines), |z| > 2 flagged — two shuffles (daily agg + "
        "per-type window), both on low-cardinality keys.",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_events(spark, sf_dir)
    daily = (
        e.groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type")
    z = (F.col("n") - F.avg("n").over(w)) / F.stddev("n").over(w)
    return daily.select(
        "event_type", "day", F.col("n").cast("long").alias("n"),
        F.round(z, 4).alias("zscore"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


@query(
    "events_scd2_history",
    oracle="""
WITH changes AS (
  SELECT user_id, ts, value
  FROM events WHERE event_type = 'purchase'),
versioned AS (
  SELECT user_id,
         strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS effective_from,
         strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts),
                  '%Y-%m-%d %H:%M:%S.%f') AS effective_to,
         round(value, 2) AS value,
         (lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL)
           AS is_current
  FROM changes)
SELECT user_id, effective_from, effective_to, value, is_current
FROM versioned
""",
    doc="SCD2 history build: each change event becomes a versioned row "
        "with [effective_from, effective_to) validity and an is_current "
        "flag — lead() over (user, ts), one shuffle on the key; the "
        "standard warehouse pattern for dimension history at any "
        "scale.",
)
def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts")
    nxt = F.lead("ts").over(w)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return e.select(
        "user_id",
        F.date_format("ts", fmt).alias("effective_from"),
        F.date_format(nxt, fmt).alias("effective_to"),
        F.round("value", 2).alias("value"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "events_key_skew_stats",
    oracle="""
WITH per_key AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n_keys
  FROM per_key)
SELECT p.user_id, p.n,
       CAST(p.n * 1000000 // t.total AS BIGINT) AS share_ppm,
       CAST(p.n * t.n_keys * 100 // t.total AS BIGINT) AS x_uniform_pct,
       CAST(row_number() OVER (ORDER BY p.n DESC, p.user_id) AS INT) AS rnk
FROM per_key p CROSS JOIN tot t
ORDER BY p.n DESC, p.user_id LIMIT 10
""",
    doc="Skew diagnosis: the 10 heaviest grouping keys with their share "
        "(ppm) and multiple-of-uniform-share (pct, exact integer math) "
        "— the observability that decides when an aggregation/join "
        "needs salting or AQE skew handling. One count shuffle plus a "
        "1-row broadcast of the totals.",
)
def events_key_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_events(spark, sf_dir)
    per_key = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = per_key.agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    w = Window.orderBy(F.col("n").desc(), "user_id")
    return (
        per_key.join(F.broadcast(tot))
        .select(
            "user_id", "n",
            F.expr("(n * 1000000) div total").alias("share_ppm"),
            F.expr("(n * n_keys * 100) div total").alias("x_uniform_pct"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .orderBy(F.col("n").desc(), "user_id")
        .limit(10)
    )


@query(
    "events_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events),
m AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type)
SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // sum(n) OVER () AS BIGINT) AS share_ppm
FROM m
""",
    doc="Markov transition matrix over per-user event sequences: "
        "lag(event_type) within the (user_id, ts) window, then a "
        "global count per (prev, next). One shuffle on user_id (the "
        "window), one on the tiny matrix key; the share window runs "
        "over the |types|^2-row result, not the events. The standard "
        "product-analytics path model.",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    m = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = Window.partitionBy()
    return m.select(
        "prev_type", "next_type", "n",
        F.expr("n * 1000000").cast("long").alias("__num"),
        F.sum("n").over(tot).alias("__tot"),
    ).select(
        "prev_type", "next_type", "n",
        F.expr("__num div __tot").cast("long").alias("share_ppm"),
    )


@query(
    "events_median_mad",
    oracle="""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type),
dev AS (
  SELECT e.event_type, abs(e.value - med.med) AS adev, med.med AS med
  FROM events e JOIN med USING (event_type)),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY event_type)
SELECT dev.event_type,
       round(max(dev.med), 2) AS med,
       round(max(mad.mad), 2) AS mad,
       CAST(sum(CASE WHEN dev.adev > 3 * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
""",
    doc="Robust outlier detection per event type: median + MAD "
        "(median absolute deviation) and the count of points beyond "
        "3*MAD — immune to the outliers that wreck mean/stddev "
        "z-scores. Exact interpolated medians (Spark `percentile` == "
        "DuckDB `quantile_cont`; median picks/averages two sorted "
        "elements — IEEE-exact, no transcendental drift). Two grouped "
        "median passes + a broadcast join of the 5-row stats; at "
        "100 TB swap percentile for approx_percentile, same shape.",
)
def events_median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("adev"),
        "med",
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 2).alias("med"),
            F.round(F.max("mad"), 2).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


@query(
    "events_watermark_drops",
    oracle="""
WITH a AS (
  SELECT event_type, event_id, ts,
         max(ts) OVER (PARTITION BY event_type ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS hwm
  FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (hwm IS NOT NULL AND
              epoch_us(ts) < epoch_us(hwm) - 1800000000) AS BIGINT) AS n_late,
       CAST(count(*) FILTER (hwm IS NOT NULL AND
              epoch_us(ts) < epoch_us(hwm) - 1800000000)
            * 1000000 // count(*) AS BIGINT) AS late_ppm
FROM a GROUP BY event_type
""",
    doc="Watermark-drop audit (batch twin of streaming late-data "
        "semantics): arrival order is event_id within each event_type "
        "'partition' (the per-Kafka-partition watermark model); an "
        "event is LATE when its ts trails the partition's running-max "
        "ts by over 30 minutes at arrival. Emits the per-partition "
        "late census — the query you run before choosing a watermark "
        "delay, because it prices exactly how much data each candidate "
        "threshold would drop. One shuffle on the partition key; the "
        "running max is a bounded window, no self-join.",
)
def events_watermark_drops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("event_type").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    a = e.select(
        "event_type", "ts",
        F.max("ts").over(w).alias("hwm"),
    )
    late = F.when(
        F.col("hwm").isNotNull()
        & (F.unix_micros("ts") < F.unix_micros("hwm") - 1_800_000_000),
        1,
    ).otherwise(0)
    return (
        a.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(late).cast("long").alias("n_late"),
        )
        .select(
            "event_type", "n_events", "n_late",
            F.expr("n_late * 1000000 div n_events").cast("long")
             .alias("late_ppm"),
        )
    )


@query(
    "user_rfm_segments",
    oracle="""
WITH p AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
hi AS (SELECT max(ts) AS now_ts FROM p),
base AS (
  SELECT user_id,
         CAST((epoch_us(hi.now_ts) - epoch_us(max(ts))) // 86400000000
              AS BIGINT) AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         round(sum(value), 2) AS monetary
  FROM p CROSS JOIN hi GROUP BY user_id, hi.now_ts),
scored AS (
  SELECT user_id, recency_days, frequency, monetary,
         CAST(ntile(5) OVER (ORDER BY recency_days, user_id) AS INT) AS r,
         CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS INT) AS f,
         CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id) AS INT) AS m
  FROM base)
SELECT user_id, recency_days, frequency, monetary, r, f, m,
       CAST(r * 100 + f * 10 + m AS INT) AS rfm
FROM scored
""",
    doc="RFM segmentation over purchase events: per-user recency "
        "(days since last purchase vs corpus max), frequency, monetary "
        "sum, each quintiled with ntile(5) (deterministic total order "
        "with user_id tie-break), combined into the classic 3-digit "
        "RFM code. The ntile windows rank the per-user aggregate "
        "(dim-sized, not event-sized); at 100 TB replace exact ntile "
        "with approx_percentile quintile boundaries broadcast back — "
        "same output contract.",
)
def user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_events(spark, sf_dir)
    p = e.filter(F.col("event_type") == "purchase")
    hi = p.agg(F.max("ts").alias("now_ts"))
    base = (
        p.join(F.broadcast(hi))
        .groupBy("user_id", "now_ts")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
        .select(
            "user_id",
            F.expr(
                "(unix_micros(now_ts) - unix_micros(last_ts)) div 86400000000"
            ).cast("long").alias("recency_days"),
            "frequency", "monetary",
        )
    )
    r_w = Window.orderBy("recency_days", "user_id")
    f_w = Window.orderBy(F.col("frequency").desc(), "user_id")
    m_w = Window.orderBy(F.col("monetary").desc(), "user_id")
    scored = base.select(
        "user_id", "recency_days", "frequency", "monetary",
        F.ntile(5).over(r_w).cast("int").alias("r"),
        F.ntile(5).over(f_w).cast("int").alias("f"),
        F.ntile(5).over(m_w).cast("int").alias("m"),
    )
    return scored.withColumn(
        "rfm", (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).cast("int")
    )


@query(
    "orders_pareto",
    oracle="""
WITH rev AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY o_custkey),
tot AS (SELECT sum(revenue) AS total FROM rev),
deciled AS (
  SELECT o_custkey, revenue,
         CAST(ntile(10) OVER (ORDER BY revenue DESC, o_custkey) AS INT)
           AS decile
  FROM rev)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(revenue), 2) AS revenue,
       CAST(floor(sum(revenue) / tot.total * 1000000) AS BIGINT) AS share_ppm
FROM deciled CROSS JOIN tot
GROUP BY decile, tot.total
""",
    doc="Pareto / concentration analysis: customers deciled by total "
        "order revenue (ntile over the customer-dim aggregate, "
        "deterministic tie-break), per-decile customer count, revenue "
        "and ppm share of the whole book — the 80/20 query. The "
        "decile window ranks the aggregated dim, never the fact "
        "table; the total is a 1-row broadcast.",
)
def orders_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    tot = rev.agg(F.sum("revenue").alias("total"))
    w = Window.orderBy(F.col("revenue").desc(), "o_custkey")
    deciled = rev.select(
        "o_custkey", "revenue", F.ntile(10).over(w).cast("int").alias("decile")
    )
    return (
        deciled.join(F.broadcast(tot))
        .groupBy("decile", "total")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum("revenue"), 2).alias("revenue"),
        )
        .select(
            "decile", "n_customers", "revenue",
            # try_divide: an all-zero-revenue slice has total = 0 —
            # DuckDB yields NULL; Spark ANSI errors even on doubles
            F.floor(F.try_divide("revenue", "total") * 1_000_000)
             .cast("long").alias("share_ppm"),
        )
    )


@query(
    "events_path_topk",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type, 1) OVER w AS p1,
         lag(event_type, 2) OVER w AS p2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
paths AS (
  SELECT p2 || '>' || p1 || '>' || event_type AS path, count(*) AS n
  FROM seq WHERE p2 IS NOT NULL
  GROUP BY p2 || '>' || p1 || '>' || event_type)
SELECT path, CAST(n AS BIGINT) AS n,
       CAST(row_number() OVER (ORDER BY n DESC, path) AS INT) AS rnk
FROM paths
ORDER BY n DESC, path LIMIT 10
""",
    doc="Sequential-pattern mining lite: top-10 3-step event-type "
        "paths across user journeys — double lag() in the per-user "
        "window, grouped path counts, 2-phase top-k. One shuffle on "
        "user_id, one on the (|types|^3-bounded) path key.",
)
def events_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    paths = seq.select(
        F.concat_ws(">", "p2", "p1", "event_type").alias("path")
    ).groupBy("path").agg(F.count(F.lit(1)).cast("long").alias("n"))
    rw = Window.orderBy(F.col("n").desc(), "path")
    return (
        paths.orderBy(F.col("n").desc(), "path").limit(10)
        .withColumn("rnk", F.row_number().over(rw).cast("int"))
    )


@query(
    "customer_order_gaps",
    oracle="""
WITH g AS (
  SELECT o_custkey,
         (epoch_us(o_orderdate)
          - epoch_us(lag(o_orderdate) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)))
         // 86400000000 AS gap_days
  FROM orders)
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_days) AS BIGINT) AS min_gap,
       CAST(max(gap_days) AS BIGINT) AS max_gap,
       CAST(sum(gap_days) // count(*) AS BIGINT) AS mean_gap_days
FROM g WHERE gap_days IS NOT NULL
GROUP BY o_custkey
""",
    doc="Inter-arrival analysis: per-customer order-gap stats "
        "(min/max/floor-mean days between consecutive orders) — the "
        "churn-risk feature. lag() in the per-customer window with "
        "(date, key) tie-break, integer day arithmetic for exact "
        "cross-engine hashes; one shuffle on the customer key.",
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    )
    g = o.select(
        "o_custkey",
        F.expr(
            "(unix_micros(o_orderdate)"
            " - unix_micros(lag(o_orderdate) over"
            "   (partition by o_custkey order by o_orderdate, o_orderkey)))"
            " div 86400000000"
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return g.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap_days").cast("long").alias("min_gap"),
        F.max("gap_days").cast("long").alias("max_gap"),
        F.expr("sum(gap_days) div count(*)").cast("long")
         .alias("mean_gap_days"),
    )


@query(
    "events_dow_hour_heatmap",
    oracle="""
SELECT CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS INT) AS dow,
       CAST((epoch_us(ts) % 86400000000) // 3600000000 AS INT) AS hour,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS users
FROM events
GROUP BY 1, 2
""",
    doc="Seasonality heatmap: day-of-week x hour-of-day activity "
        "matrix. dow/hour derive from raw epoch arithmetic "
        "((days+4)%7, 0=Sunday) instead of engine calendar functions — "
        "Spark's dayofweek is 1-based-Sunday, DuckDB's dow 0-based, "
        "and both depend on session calendars; integer epoch math is "
        "identical everywhere. One shuffle to the 168-cell matrix.",
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return (
        e.select(
            F.expr("(unix_micros(ts) div 86400000000 + 4) % 7").cast("int")
             .alias("dow"),
            F.expr("(unix_micros(ts) % 86400000000) div 3600000000")
             .cast("int").alias("hour"),
            "user_id",
        )
        .groupBy("dow", "hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("users"),
        )
    )


@query(
    "basket_part_pairs",
    oracle="""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n_ord AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM li),
part_n AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_orders
  FROM li GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_pair
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey)
SELECT part_a, part_b, CAST(n_pair AS BIGINT) AS n_pair,
       CAST(n_pair * n_ord.n * 1000000
            // (pa.n_orders * pb.n_orders) AS BIGINT) AS lift_ppm
FROM pairs
JOIN part_n pa ON pa.l_partkey = part_a
JOIN part_n pb ON pb.l_partkey = part_b
CROSS JOIN n_ord
WHERE n_pair >= 2
ORDER BY n_pair DESC, part_a, part_b LIMIT 20
""",
    doc="Market-basket affinity: part pairs co-ordered in the same "
        "order, with integer-ppm lift (observed co-rate over "
        "independence). The pair generator is an equi-join on the "
        "ORDER key (baskets are small — pairs per order is "
        "O(lines^2) with lines~4, never a catalog cross join); a "
        "support floor prunes before the lift join, and the output is "
        "a 2-phase top-20. The association-rules shape for "
        "recommender candidate generation. Exact-integer headroom: "
        "n_pair * n_baskets * 1e6 must stay under 2^63, i.e. "
        "n_baskets <~ 3e6 per analysis window — at 100 TB run the "
        "analysis per time window (standard market-basket practice) "
        "or lift the multiplier into DECIMAL(38,0) (see SCALE.md "
        "'Integer-ppm headroom bounds').",
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey").distinct()
    )
    from advanced_strapi_import_spark.caching import persist_tracked

    li = persist_tracked(li)
    n_ord = li.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n")
    )
    part_n = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "k")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= 2)
    )
    pa = part_n.select(F.col("l_partkey").alias("part_a"),
                       F.col("n_orders").alias("na"))
    pb = part_n.select(F.col("l_partkey").alias("part_b"),
                       F.col("n_orders").alias("nb"))
    return (
        pairs.join(pa, "part_a").join(pb, "part_b")
        .join(F.broadcast(n_ord))
        .select(
            "part_a", "part_b", "n_pair",
            F.expr("n_pair * n * 1000000 div (na * nb)").cast("long")
             .alias("lift_ppm"),
        )
        .orderBy(F.col("n_pair").desc(), "part_a", "part_b")
        .limit(20)
    )


@query(
    "events_dau_wau",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 86400000000 AS day
  FROM events),
days AS (SELECT DISTINCT day FROM ud),
dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
wau AS (
  SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
  FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
  GROUP BY d.day)
SELECT CAST(dau.day AS BIGINT) AS day, dau.dau, wau.wau,
       CAST(dau.dau * 1000000 // wau.wau AS BIGINT) AS stickiness_ppm
FROM dau JOIN wau ON dau.day = wau.day
""",
    doc="DAU / trailing-7-day WAU / stickiness per day: the "
        "engagement time series. The fact table collapses to DISTINCT "
        "(user, day) FIRST (the only event-sized pass); the trailing "
        "window is then a day-spine range join over the tiny user-day "
        "table. At 100 TB the user-day table is the materialized "
        "daily-activity rollup every analytics store keeps anyway.",
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.caching import persist_tracked

    e = load_events(spark, sf_dir)
    ud = persist_tracked(
        e.select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        ).distinct()
    )
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    u = ud.select(F.col("user_id"), F.col("day").alias("uday"))
    wau = (
        days.join(
            u,
            (F.col("uday") >= F.col("day") - 6) & (F.col("uday") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            F.col("day").cast("long").alias("day"), "dau", "wau",
            F.expr("dau * 1000000 div wau").cast("long")
             .alias("stickiness_ppm"),
        )
    )


@query(
    "events_sliding_distinct",
    oracle="""
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(count(DISTINCT user_id) AS BIGINT) AS users
FROM (
  SELECT user_id,
         unnest(generate_series(date_trunc('hour', ts) - INTERVAL 5 HOUR,
                                date_trunc('hour', ts),
                                INTERVAL 1 HOUR)) AS ws
  FROM events)
GROUP BY ws
""",
    doc="Sliding-window distinct users: 6-hour windows advancing "
        "hourly via F.window(slide) — Spark expands each event into "
        "its 6 covering windows map-side, then one shuffle on the "
        "window key. At 100 TB the count-distinct swaps for "
        "approx_count_distinct or the persisted-HLL rollup "
        "(events_hll_weekly_merge) with identical plan shape; the "
        "window expansion itself stays map-local.",
)
def events_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "6 hours", "1 hour").alias("w"))
        .agg(F.countDistinct("user_id").alias("users"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "users",
        )
    )


@query(
    "customer_cohort_ltv",
    oracle="""
WITH first AS (
  SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS cohort
  FROM orders GROUP BY o_custkey)
SELECT strftime(f.cohort, '%Y-%m') AS cohort,
       CAST(datediff('month', f.cohort,
                     date_trunc('month', o.o_orderdate)) AS INT)
         AS month_offset,
       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS active_customers,
       round(sum(o.o_totalprice), 2) AS revenue
FROM orders o JOIN first f USING (o_custkey)
GROUP BY 1, 2
""",
    doc="Cohort lifetime-value matrix: customers grouped by month of "
        "first order, revenue and active counts per month offset. The "
        "first-order dimension is an aggregate of the fact itself; "
        "AQE broadcasts it back (post-agg side is |customers|, far "
        "smaller than the order fact), so the fact shuffles once on "
        "the final (cohort, offset) key.",
)
def customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("__cohort")
    )
    j = o.join(first, "o_custkey")
    return (
        j.groupBy(
            F.date_format("__cohort", "yyyy-MM").alias("cohort"),
            F.months_between(
                F.date_trunc("month", "o_orderdate"), F.col("__cohort")
            ).cast("int").alias("month_offset"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("active_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "events_gap_fill",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         count(*) AS n, sum(value) AS v
  FROM events GROUP BY event_type, date_trunc('hour', ts)),
bounds AS (
  SELECT min(date_trunc('hour', ts)) AS lo, max(date_trunc('hour', ts)) AS hi
  FROM events),
grid AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series(
      (SELECT lo FROM bounds), (SELECT hi FROM bounds),
      INTERVAL 1 HOUR)) AS h) g)
SELECT g.event_type, strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(coalesce(hourly.n, 0) AS BIGINT) AS n,
       round(coalesce(hourly.v, 0), 2) AS v
FROM grid g LEFT JOIN hourly USING (event_type, h)
""",
    doc="Time-series gap fill: the hourly rollup is densified to a "
        "complete (event_type x hour) grid so downstream ML sees "
        "explicit zeros, not missing rows. The grid is generated from "
        "a 1-row min/max bound via sequence+explode and cross-joined "
        "with the distinct-type dimension — both broadcast-sized "
        "(|types| * |hours|), never the fact; the fact aggregates once "
        "on (type, hour) and left-joins INTO the grid. At 100 TB the "
        "grid stays tiny (time range x cardinality), so densification "
        "is free relative to the rollup shuffle.",
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("value").alias("__v"),
    )
    bounds = e.agg(
        F.min(F.date_trunc("hour", "ts")).alias("lo"),
        F.max(F.date_trunc("hour", "ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    types = e.select("event_type").distinct()
    grid = types.crossJoin(hours)
    return grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.coalesce("__n", F.lit(0)).cast("long").alias("n"),
        F.round(F.coalesce("__v", F.lit(0)), 2).alias("v"),
    )


@query(
    "orders_yoy_growth",
    oracle="""
WITH yearly AS (
  SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS yr,
         sum(o.o_totalprice) AS rev
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name, year(o.o_orderdate))
SELECT nation, yr, round(rev, 2) AS revenue,
       CASE WHEN lag(rev_c) OVER (PARTITION BY nation ORDER BY yr) IS NULL
            THEN NULL
            ELSE CAST((rev_c - lag(rev_c) OVER (PARTITION BY nation ORDER BY yr))
                      * 10000 // lag(rev_c) OVER (PARTITION BY nation ORDER BY yr)
                 AS BIGINT)
       END AS growth_bps
FROM (SELECT nation, yr, rev,
             CAST(round(rev * 100) AS BIGINT) AS rev_c FROM yearly) y
""",
    doc="Year-over-year growth per nation: yearly revenue rollup, then "
        "lag() within each nation's year series — the window runs over "
        "the |nations| x |years| aggregate (tiny), never the fact. "
        "Growth is integer basis points (floor division) so both "
        "engines hash identically. Customer->nation dims broadcast "
        "into the orders fact; one shuffle on the rollup key.",
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    # customer is fact-scaled (1/10 of orders) — no broadcast hint, AQE
    # decides; nation is a true constant-size dim
    yearly = (
        o.join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(F.sum("o_totalprice").alias("__rev"))
    )
    # growth in exact integer cents: double floor/'//' differ by 1 ulp
    # at bucket boundaries across engines; (cents diff * 10000) div cents
    # is pure BIGINT arithmetic (both engines truncate toward zero)
    prev = F.lag("__rev_c").over(Window.partitionBy("nation").orderBy("yr"))
    return yearly.select(
        "nation", "yr", F.round("__rev", 2).alias("revenue"),
        F.round(F.col("__rev") * 100).cast("long").alias("__rev_c"),
    ).withColumn("__prev", prev).select(
        "nation",
        "yr",
        "revenue",
        F.when(F.col("__prev").isNull(), F.lit(None).cast("long"))
        .otherwise(
            F.expr("(__rev_c - __prev) * 10000 div __prev").cast("long")
        )
        .alias("growth_bps"),
    )


@query(
    "events_funnel_windowed",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.ts) AS c_ts, min(v.v_ts) AS v_ts FROM events e
  JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click'
    AND e.ts > v.v_ts AND e.ts <= v.v_ts + INTERVAL 24 HOUR
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(e.ts) AS p_ts, min(c.c_ts) AS c_ts FROM events e
  JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts > c.c_ts AND e.ts <= c.c_ts + INTERVAL 24 HOUR
  GROUP BY e.user_id)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_24h,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_24h,
       CAST((SELECT coalesce(sum(epoch_us(c_ts) - epoch_us(v_ts)), 0)
                    // 1000000 // greatest(count(*), 1) FROM c)
            AS BIGINT) AS click_delay_s_mean,
       CAST((SELECT coalesce(sum(epoch_us(p_ts) - epoch_us(c_ts)), 0)
                    // 1000000 // greatest(count(*), 1) FROM p)
            AS BIGINT) AS purchase_delay_s_mean
""",
    doc="Time-bounded conversion funnel: view -> click within 24h -> "
        "purchase within 24h of the click, plus mean stage delays "
        "(integer seconds, truncating div in a fixed order so both "
        "engines agree). Same three per-user min-ts shuffles as the "
        "unbounded funnel — the window bound is a filter on the "
        "already-joined stage rows, not an extra join; delay sums ride "
        "the same aggregates.",
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    day = F.expr("INTERVAL 24 HOURS")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("v_ts")) & (F.col("ts") <= F.col("v_ts") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"), F.min("v_ts").alias("v_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "c_ts"), "user_id")
        .filter((F.col("ts") > F.col("c_ts")) & (F.col("ts") <= F.col("c_ts") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"), F.min("c_ts").alias("c_ts"))
    )

    def mean_delay(df: DataFrame, a: str, b: str, out: str) -> DataFrame:
        return df.agg(
            F.expr(
                f"CAST(coalesce(sum(unix_micros({a}) - unix_micros({b})), 0)"
                f" div 1000000 div greatest(count(*), 1) AS BIGINT)"
            ).alias(out)
        )

    return (
        v.agg(F.count(F.lit(1)).cast("long").alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).cast("long").alias("n_click_24h")))
        .crossJoin(p.agg(F.count(F.lit(1)).cast("long").alias("n_purchase_24h")))
        .crossJoin(mean_delay(c, "c_ts", "v_ts", "click_delay_s_mean"))
        .crossJoin(mean_delay(p, "p_ts", "c_ts", "purchase_delay_s_mean"))
    )


@query(
    "orders_backlog_series",
    oracle="""
WITH close AS (
  SELECT l_orderkey AS okey, max(l_shipdate) AS close_ts
  FROM lineitem GROUP BY l_orderkey),
deltas AS (
  SELECT date_trunc('day', o.o_orderdate) AS day, 1 AS delta
  FROM orders o
  UNION ALL
  SELECT date_trunc('day', c.close_ts), -1
  FROM orders o JOIN close c ON c.okey = o.o_orderkey),
daily AS (
  SELECT day, CAST(sum(delta) AS BIGINT) AS net FROM deltas GROUP BY day)
SELECT strftime(day, '%Y-%m-%d') AS day, net,
       CAST(sum(net) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS open_orders
FROM daily
""",
    doc="Order-backlog time series (interval state accounting): each "
        "order contributes +1 at placement and -1 at its last shipment "
        "day; the daily net deltas cumulative-sum into the open-order "
        "count. The +/-1 encoding turns interval overlap counting into "
        "one groupBy(day) plus a window over the |days|-sized series — "
        "the fact is touched twice map-side (order scan, per-order max "
        "shipdate), never joined to a calendar. The global cumsum runs "
        "over ~2,500 aggregated rows, not the fact.",
)
def orders_backlog_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    close = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.max("l_shipdate").alias("close_ts")
    )
    opens = o.select(
        F.date_trunc("day", "o_orderdate").alias("day"),
        F.lit(1).alias("delta"),
    )
    closes = (
        o.join(close, close.okey == o.o_orderkey)
        .select(
            F.date_trunc("day", "close_ts").alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    daily = (
        opens.unionByName(closes)
        .groupBy("day")
        .agg(F.sum("delta").cast("long").alias("net"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "net",
        F.sum("net").over(w).cast("long").alias("open_orders"),
    )


@query(
    "events_changepoint",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         count(*) AS cnt
  FROM events GROUP BY event_type, date_trunc('day', ts)),
tot AS (
  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n_days
  FROM daily GROUP BY event_type),
cum AS (
  SELECT d.event_type, d.day, t.total, t.n_days,
         CAST(row_number() OVER (PARTITION BY d.event_type ORDER BY d.day)
              AS BIGINT) AS k,
         CAST(sum(d.cnt) OVER (PARTITION BY d.event_type ORDER BY d.day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS s
  FROM daily d JOIN tot t USING (event_type)),
stat AS (
  SELECT event_type, day, abs(n_days * s - k * total) AS m,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(n_days * s - k * total) DESC, day)
           AS rnk
  FROM cum)
SELECT event_type,
       strftime(day, '%Y-%m-%d') AS change_day,
       CAST(m AS BIGINT) AS max_stat
FROM stat WHERE rnk = 1
""",
    doc="CUSUM changepoint detection over per-type daily event counts: "
        "the scaled statistic M_k = |N*S_k - k*T| (exact BIGINT — no "
        "float mean) peaks at the most likely level-shift day. One "
        "shuffle for the daily rollup; the cumulative/argmax windows "
        "run per type over |days| aggregated rows. Ties break to the "
        "earliest day (min_by on (-m, day)).",
)
def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = daily.groupBy("event_type").agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    cum = daily.join(tot, "event_type").select(
        "event_type",
        "day",
        "total",
        "n_days",
        F.row_number().over(wo).cast("long").alias("k"),
        F.sum("cnt").over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("s"),
    )
    stat = cum.select(
        "event_type",
        "day",
        F.abs(F.col("n_days") * F.col("s") - F.col("k") * F.col("total"))
        .alias("m"),
    )
    wr = Window.partitionBy("event_type").orderBy(F.col("m").desc(), "day")
    return (
        stat.withColumn("__rnk", F.row_number().over(wr))
        .filter(F.col("__rnk") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("change_day"),
            F.col("m").cast("long").alias("max_stat"),
        )
    )


@query(
    "events_forecast_backtest",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS cnt
  FROM events GROUP BY event_type, date_trunc('day', ts)),
pred AS (
  SELECT event_type, day, cnt,
         lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY day) AS yhat
  FROM daily)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days_scored,
       CAST(sum(abs(cnt - yhat)) AS BIGINT) AS abs_err_sum,
       CAST(sum(abs(cnt - yhat)) * 1000000 // sum(cnt) AS BIGINT)
         AS wape_ppm
FROM pred WHERE yhat IS NOT NULL
GROUP BY event_type
""",
    doc="Seasonal-naive forecast backtest: predict each day's per-type "
        "event count with the count 7 days earlier (the baseline every "
        "real forecasting model must beat), then score WAPE in integer "
        "ppm. One rollup shuffle; the lag window runs over |days| "
        "aggregated rows per type. The eval harness shape for any "
        "demand/traffic forecasting pipeline on the engine.",
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("day")
    pred = daily.withColumn("yhat", F.lag("cnt", 7).over(w)).filter(
        F.col("yhat").isNotNull()
    )
    return (
        pred.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days_scored"),
            F.sum(F.abs(F.col("cnt") - F.col("yhat")))
            .cast("long")
            .alias("abs_err_sum"),
            F.sum("cnt").alias("__tot"),
        )
        .select(
            "event_type",
            "n_days_scored",
            "abs_err_sum",
            F.expr("abs_err_sum * 1000000 div __tot")
            .cast("long")
            .alias("wape_ppm"),
        )
    )


@query(
    "events_variant_extract",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       CAST(count(*) FILTER (CAST(json_extract_string(props, '$.k')
                                  AS BIGINT) >= 50) AS BIGINT) AS n_high
FROM events GROUP BY event_type
""",
    doc="Semi-structured access via Spark 4 VARIANT: props parses ONCE "
        "to the binary variant encoding (parse_json), then typed "
        "variant_get paths extract without re-tokenizing JSON per "
        "access — the modern lakehouse path for schema-on-read columns "
        "at 100 TB (variant decode is columnar and ~an order cheaper "
        "than repeated string JSON parsing when several paths are "
        "read). Same answers as the get_json_object twin "
        "(events_json_extract) — by construction, verified by the "
        "shared oracle shape.",
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    v = e.withColumn("__v", F.parse_json("props"))
    k = F.variant_get(F.col("__v"), "$.k", "long")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.count_if(k >= 50).alias("n_high"),
    )


@query(
    "events_ab_test",
    oracle="""
WITH assign AS (
  SELECT DISTINCT user_id, user_id % 2 AS grp FROM events),
conv AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'purchase' AND value > 200),
g AS (
  SELECT a.grp,
         count(*) AS n_users,
         sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS n_conv
  FROM assign a LEFT JOIN conv c ON c.user_id = a.user_id
  GROUP BY a.grp),
wide AS (
  SELECT
    max(CASE WHEN grp = 0 THEN n_users END) AS na,
    max(CASE WHEN grp = 0 THEN n_conv END) AS ca,
    max(CASE WHEN grp = 1 THEN n_users END) AS nb,
    max(CASE WHEN grp = 1 THEN n_conv END) AS cb
  FROM g)
SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
       CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
       CAST(ca * 1000000 // na AS BIGINT) AS rate_a_ppm,
       CAST(cb * 1000000 // nb AS BIGINT) AS rate_b_ppm,
       round((CAST(cb AS DOUBLE)/nb - CAST(ca AS DOUBLE)/na)
             / sqrt((CAST(ca+cb AS DOUBLE)/(na+nb))
                    * (1 - CAST(ca+cb AS DOUBLE)/(na+nb))
                    * (1.0/na + 1.0/nb)), 2) AS z_score,
       abs((CAST(cb AS DOUBLE)/nb - CAST(ca AS DOUBLE)/na)
           / sqrt((CAST(ca+cb AS DOUBLE)/(na+nb))
                  * (1 - CAST(ca+cb AS DOUBLE)/(na+nb))
                  * (1.0/na + 1.0/nb))) > 1.96 AS significant
FROM wide
""",
    doc="A/B experiment readout: deterministic hash assignment "
        "(user_id parity — in production the md5 hash_split), per-arm "
        "user-level conversion (a high-value purchase), and the pooled "
        "two-proportion z-test (rounded 2dp; the +/-1.96 significance "
        "gate computed on the unrounded value identically in both "
        "engines). Two shuffles on user_id (assignment, conversion "
        "semi-join), then a 2-row pivot — experiment analysis never "
        "touches more than the per-user rollup.",
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    assign = e.select("user_id").distinct().withColumn(
        "grp", F.col("user_id") % 2
    )
    conv = (
        e.filter((F.col("event_type") == "purchase") & (F.col("value") > 200))
        .select("user_id")
        .distinct()
        .withColumn("__c", F.lit(1))
    )
    g = (
        assign.join(conv, "user_id", "left")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.coalesce("__c", F.lit(0))).alias("n_conv"),
        )
    )
    wide = g.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n_users"))).alias("na"),
        F.max(F.when(F.col("grp") == 0, F.col("n_conv"))).alias("ca"),
        F.max(F.when(F.col("grp") == 1, F.col("n_users"))).alias("nb"),
        F.max(F.when(F.col("grp") == 1, F.col("n_conv"))).alias("cb"),
    )
    pa = F.col("ca").cast("double") / F.col("na")
    pb = F.col("cb").cast("double") / F.col("nb")
    pp = (F.col("ca") + F.col("cb")).cast("double") / (
        F.col("na") + F.col("nb")
    )
    # try_divide: a degenerate slice with zero conversions in BOTH arms
    # (or 100% in both) makes the pooled variance 0 — DuckDB's x/0 is
    # NULL; Spark ANSI hard-errors even on DOUBLE division (verified)
    z = F.try_divide(
        pb - pa,
        F.sqrt(pp * (1 - pp) * (1.0 / F.col("na") + 1.0 / F.col("nb"))),
    )
    return wide.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("ca").cast("long").alias("conv_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("cb").cast("long").alias("conv_b"),
        F.expr("ca * 1000000 div na").cast("long").alias("rate_a_ppm"),
        F.expr("cb * 1000000 div nb").cast("long").alias("rate_b_ppm"),
        F.round(z, 2).alias("z_score"),
        (F.abs(z) > 1.96).alias("significant"),
    )


@query(
    "events_value_psi",
    oracle="""
WITH b AS (
  SELECT event_type, value,
         least(CAST(floor(value / 50.0) AS INT), 9) AS bucket,
         epoch_us(ts) AS ts_us,
         (SELECT min(epoch_us(ts))
                 + (max(epoch_us(ts)) - min(epoch_us(ts))) // 2
          FROM events) AS mid_us
  FROM events),
halves AS (
  SELECT event_type, bucket,
         count(*) FILTER (ts_us <= mid_us) AS n_ref,
         count(*) FILTER (ts_us > mid_us) AS n_cur
  FROM b GROUP BY event_type, bucket),
tot AS (
  SELECT event_type,
         CAST(sum(n_ref) AS BIGINT) AS t_ref,
         CAST(sum(n_cur) AS BIGINT) AS t_cur
  FROM halves GROUP BY event_type)
SELECT h.event_type,
       round(sum(
         ((n_cur + 1.0) / (t_cur + 10) - (n_ref + 1.0) / (t_ref + 10))
         * ln(((n_cur + 1.0) / (t_cur + 10))
              / ((n_ref + 1.0) / (t_ref + 10)))), 4) AS psi,
       round(sum(
         ((n_cur + 1.0) / (t_cur + 10) - (n_ref + 1.0) / (t_ref + 10))
         * ln(((n_cur + 1.0) / (t_cur + 10))
              / ((n_ref + 1.0) / (t_ref + 10)))), 4) > 0.2 AS drifted
FROM halves h JOIN tot USING (event_type)
GROUP BY h.event_type
""",
    doc="Population-stability-index drift monitor: events split at the "
        "time midpoint into reference/current halves, value bucketed "
        "into 10 fixed-width bins, PSI with add-one smoothing "
        "(Laplace over the 10 bins) so empty bins stay finite; "
        "psi > 0.2 is the conventional drift alarm. One shuffle on "
        "(type, bucket) — the model-monitoring primitive that gates "
        "retraining at 100 TB, computed on aggregates only.",
)
def events_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    mid = e.agg(
        F.expr(
            "min(unix_micros(ts)) + "
            "(max(unix_micros(ts)) - min(unix_micros(ts))) div 2"
        ).alias("mid_us")
    )
    b = e.crossJoin(F.broadcast(mid)).select(
        "event_type",
        F.least(F.floor(F.col("value") / 50.0).cast("int"), F.lit(9)).alias(
            "bucket"
        ),
        (us <= F.col("mid_us")).alias("__is_ref"),
    )
    halves = b.groupBy("event_type", "bucket").agg(
        F.count_if(F.col("__is_ref")).alias("n_ref"),
        F.count_if(~F.col("__is_ref")).alias("n_cur"),
    )
    tot = halves.groupBy("event_type").agg(
        F.sum("n_ref").cast("long").alias("t_ref"),
        F.sum("n_cur").cast("long").alias("t_cur"),
    )
    p_cur = (F.col("n_cur") + 1.0) / (F.col("t_cur") + 10)
    p_ref = (F.col("n_ref") + 1.0) / (F.col("t_ref") + 10)
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (
        halves.join(tot, "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.sum(term), 4).alias("psi"),
            (F.round(F.sum(term), 4) > 0.2).alias("drifted"),
        )
    )


# ---------------------------------------------------------------------------
# approximate quantiles with an exactness audit
# ---------------------------------------------------------------------------
@query(
    "events_approx_quantiles",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 2) AS p50,
       round(quantile_cont(value, 0.9), 2) AS p90,
       round(quantile_cont(value, 0.99), 2) AS p99,
       TRUE AS approx_ok
FROM events GROUP BY event_type
""",
    doc="Per-type value quantiles, both arms in one pass: EXACT "
        "interpolated percentiles (the verification arm — requires "
        "per-group value materialization, fine at audit scale) and "
        "approx_percentile over a quantile sketch (the 100 TB arm: "
        "mergeable, bounded memory, map-side partials). approx_ok is "
        "a RANK-window bound: each sketch value must land between the "
        "exact q±0.02 percentiles — valid at any N (a value-relative "
        "tolerance breaks at tiny N, where the sketch returns an "
        "actual order statistic but exact interpolates between two). "
        "The oracle emits literal TRUE, so a sketch regression "
        "value-fails the gate.",
)
def events_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    qs = [0.5, 0.9, 0.99]
    los = [max(0.0, q - 0.02) for q in qs]
    his = [min(1.0, q + 0.02) for q in qs]

    def arr(vals: list) -> str:
        return "array(" + ", ".join(str(v) for v in vals) + ")"

    agg = e.groupBy("event_type").agg(
        F.expr(f"percentile(value, {arr(qs)})").alias("__ex"),
        F.expr(f"percentile(value, {arr(los)})").alias("__lo"),
        F.expr(f"percentile(value, {arr(his)})").alias("__hi"),
        F.expr(f"approx_percentile(value, {arr(qs)}, 10000)").alias("__ap"),
    )
    within = F.forall(
        F.zip_with(
            F.zip_with("__lo", "__ap", lambda lo, ap: ap >= lo),
            F.zip_with("__hi", "__ap", lambda hi, ap: ap <= hi),
            lambda a, b: a & b,
        ),
        lambda ok: ok,
    )
    return agg.select(
        "event_type",
        F.round(F.col("__ex")[0], 2).alias("p50"),
        F.round(F.col("__ex")[1], 2).alias("p90"),
        F.round(F.col("__ex")[2], 2).alias("p99"),
        within.alias("approx_ok"),
    )


@query(
    "events_hist_width_bucket",
    oracle="""
WITH b AS (
  SELECT CASE WHEN value < 0 THEN 0
              WHEN value >= 500 THEN 21
              ELSE CAST(floor(value / 25.0) AS BIGINT) + 1 END AS bucket
  FROM events)
SELECT bucket,
       CASE WHEN bucket = 0 THEN NULL
            ELSE round((bucket - 1) * 25.0, 2) END AS lo,
       CASE WHEN bucket = 21 THEN NULL ELSE round(bucket * 25.0, 2) END AS hi,
       CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY bucket
""",
    doc="Equi-width histogram of event values via width_bucket (20 "
        "buckets over [0, 500), under/overflow buckets 0 and 21 — the "
        "SQL-standard binning the reference's dashboards would chart). "
        "Spark evaluates the builtin width_bucket; the oracle uses the "
        "arithmetic definition (DuckDB lacks the function). The "
        "per-bucket rollup is one map-side-combined shuffle of at most "
        "22 groups — histogram cost is scan-bound at any scale.",
)
def events_hist_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    b = e.select(
        F.width_bucket(
            F.col("value"), F.lit(0.0), F.lit(500.0), F.lit(20)
        ).alias("bucket")
    )
    return (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "bucket",
            F.when(F.col("bucket") != 0, F.round((F.col("bucket") - 1) * 25.0, 2))
            .alias("lo"),
            F.when(F.col("bucket") != 21, F.round(F.col("bucket") * 25.0, 2))
            .alias("hi"),
            "n",
        )
    )


@query(
    "events_dp_noise_counts",
    oracle="""
WITH c AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events
  GROUP BY event_type),
u AS (
  SELECT event_type, n,
         (((n % 2147483647) * 2654435761 + 12345) % 999999 + 1)
             / 1000001.0 - 0.5 AS u
  FROM c)
SELECT event_type, n,
       round(CASE WHEN u >= 0 THEN -ln(1 - 2 * u)
                  ELSE ln(1 + 2 * u) END, 4) AS noise,
       round(n + CASE WHEN u >= 0 THEN -ln(1 - 2 * u)
                      ELSE ln(1 + 2 * u) END, 4) AS noisy_n
FROM u
""",
    doc="Differentially-private release shape for per-type counts: "
        "Laplace(1/eps) noise, eps=1, via inverse-CDF "
        "noise = -sign(u) * ln(1 - 2|u|) on a uniform u in (-0.5, "
        "0.5). The uniform here is a DETERMINISTIC Knuth-hash of the "
        "count (pre-reduced mod 2^31-1 so the product can never "
        "overflow BIGINT under ANSI mode) so both engines — and "
        "reruns — agree exactly; a production release swaps the seeded "
        "hash for a calibrated RNG, everything else is this plan. The "
        "modulus maps into 1..999999 so 1-2|u| is bounded away from 0 "
        "and ln never sees a zero. Aggregation is a handful of "
        "groups; noise is per-group scalar math — free at any scale.",
)
def events_dp_noise_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    u = (
        ((F.col("n") % 2147483647) * 2654435761 + 12345) % 999999 + 1
    ) / 1000001.0 - 0.5
    noise = F.when(u >= 0, -F.log(1 - 2 * u)).otherwise(F.log(1 + 2 * u))
    return c.select(
        "event_type",
        "n",
        F.round(noise, 4).alias("noise"),
        F.round(F.col("n") + noise, 4).alias("noisy_n"),
    )


@query(
    "customer_t_closeness",
    oracle="""
WITH q AS (
  SELECT c_nationkey AS nk, c_mktsegment AS seg,
         CAST(floor(c_acctbal / 2000) AS BIGINT) AS sens
  FROM customer),
cell AS (SELECT nk, seg, sens, CAST(count(*) AS BIGINT) AS n
         FROM q GROUP BY nk, seg, sens),
grp AS (SELECT nk, seg, CAST(count(*) AS BIGINT) AS ng FROM q GROUP BY nk, seg),
gl AS (SELECT sens, CAST(count(*) AS BIGINT) AS nb FROM q GROUP BY sens),
tot AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM q),
grid AS (
  SELECT g.nk, g.seg, g.ng, b.sens, b.nb, COALESCE(c.n, 0) AS n
  FROM grp g CROSS JOIN gl b
  LEFT JOIN cell c ON c.nk = g.nk AND c.seg = g.seg AND c.sens = b.sens)
SELECT nk, seg, CAST(max(ng) AS BIGINT) AS n_rows,
       round(sum(abs(n * t.nt - nb * ng)) / (2.0 * max(ng) * max(t.nt)), 6)
           AS tvd,
       sum(abs(n * t.nt - nb * ng)) / (2.0 * max(ng) * max(t.nt)) <= 0.2
           AS t_close
FROM grid CROSS JOIN tot t
GROUP BY nk, seg
""",
    doc="t-closeness audit (variational-distance form) completing the "
        "k-anonymity / l-diversity privacy trio: per QI class "
        "(nation, segment), the total-variation distance between the "
        "class's sensitive-attribute (balance-bucket) distribution and "
        "the global one, flagged against t=0.2. The inner |p_g - p| "
        "sum is computed on the integer cross-product lattice "
        "|n*N - nb*ng| — exact BIGINT arithmetic, one final division — "
        "so both engines agree bit-exactly and the t flag cannot "
        "float-flip. Class and bucket marginals are tiny aggregates; "
        "the class x bucket grid is a broadcast cross of two "
        "dimension-sized frames, never touching row-level data twice.",
)
def customer_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("sens"),
    )
    cell = q.groupBy("nk", "seg", "sens").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    grp = q.groupBy("nk", "seg").agg(
        F.count(F.lit(1)).cast("long").alias("ng")
    )
    glob = q.groupBy("sens").agg(F.count(F.lit(1)).cast("long").alias("nb"))
    tot = q.agg(F.count(F.lit(1)).cast("long").alias("nt"))
    grid = (
        grp.crossJoin(F.broadcast(glob))
        .join(cell, ["nk", "seg", "sens"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    dist = F.sum(
        F.abs(F.col("n") * F.col("nt") - F.col("nb") * F.col("ng"))
    ) / (2.0 * F.max("ng") * F.max("nt"))
    return grid.groupBy("nk", "seg").agg(
        F.max("ng").cast("long").alias("n_rows"),
        F.round(dist, 6).alias("tvd"),
        (dist <= 0.2).alias("t_close"),
    )


@query(
    "events_chi_square_independence",
    oracle="""
WITH o AS (
  SELECT event_type, CAST(dayofweek(ts) + 1 AS INT) AS dow,
         CAST(count(*) AS BIGINT) AS obs
  FROM events GROUP BY 1, 2),
rt AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS row_n FROM o GROUP BY 1),
ct AS (SELECT dow, CAST(sum(obs) AS BIGINT) AS col_n FROM o GROUP BY 1),
n AS (SELECT CAST(sum(obs) AS BIGINT) AS total FROM o),
cells AS (
  SELECT o.event_type, o.dow, o.obs,
         rt.row_n * ct.col_n / (n.total * 1.0) AS expected
  FROM o JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN n)
SELECT event_type, dow, obs,
       round(expected, 4) AS expected,
       round((obs - expected) / sqrt(expected), 4) AS std_resid,
       round(sum((obs - expected) * (obs - expected) / expected)
                 OVER (), 4) AS chi2_total
FROM cells
""",
    doc="Chi-square test of independence on the event_type x "
        "day-of-week contingency table: per-cell observed, expected "
        "(row x col / N — the integer product is exact, one double "
        "division), standardized residual, and the chi-square "
        "statistic repeated per row via an unbounded window over the "
        "aggregated cells. Residuals localize WHICH (type, weekday) "
        "drives the dependence — the seasonality screen run before "
        "trusting a day-partitioned sample. The raw table reduces to "
        "<=7 x types cells in one shuffle; marginals and the window "
        "run on the tiny cell frame. Expected counts are never zero "
        "(marginals of observed cells are positive by construction), "
        "so the divisions cannot hit ANSI /0.",
)
def events_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = (
        load_events(spark, sf_dir)
        .groupBy("event_type", F.dayofweek("ts").cast("int").alias("dow"))
        .agg(F.count(F.lit(1)).cast("long").alias("obs"))
    )
    rt = o.groupBy("event_type").agg(F.sum("obs").cast("long").alias("row_n"))
    ct = o.groupBy("dow").agg(F.sum("obs").cast("long").alias("col_n"))
    n = o.agg(F.sum("obs").cast("long").alias("total"))
    cells = (
        o.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "expected", F.col("row_n") * F.col("col_n") / (F.col("total") * 1.0)
        )
    )
    chi_cell = (F.col("obs") - F.col("expected")) ** 2 / F.col("expected")
    return cells.select(
        "event_type",
        "dow",
        "obs",
        F.round("expected", 4).alias("expected"),
        F.round(
            (F.col("obs") - F.col("expected")) / F.sqrt("expected"), 4
        ).alias("std_resid"),
        F.round(
            F.sum(chi_cell).over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
            4,
        ).alias("chi2_total"),
    )


@query(
    "orders_theil_sen_trend",
    oracle="""
WITH monthly AS (
  SELECT c.c_nationkey AS nk,
         (CAST(year(o.o_orderdate) AS BIGINT) - 1992) * 12
             + month(o.o_orderdate) - 1 AS m,
         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2),
slopes AS (
  SELECT a.nk,
         (b.cents - a.cents) / ((b.m - a.m) * 100.0) AS slope
  FROM monthly a JOIN monthly b ON a.nk = b.nk AND b.m > a.m),
med AS (
  SELECT nk, quantile_cont(slope, 0.5) AS ts_slope,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM slopes GROUP BY nk),
resid AS (
  SELECT m.nk,
         quantile_cont(m.cents / 100.0 - med.ts_slope * m.m, 0.5)
             AS ts_intercept
  FROM monthly m JOIN med ON med.nk = m.nk
  GROUP BY m.nk)
SELECT med.nk, med.n_pairs,
       round(med.ts_slope, 4) + 0.0 AS ts_slope,
       round(r.ts_intercept, 4) + 0.0 AS ts_intercept
FROM med JOIN resid r ON r.nk = med.nk
""",
    doc="Theil-Sen robust trend per nation: the median of all "
        "pairwise slopes of the MONTHLY revenue series (dollars per "
        "month), plus the median-residual intercept — the "
        "outlier-proof regression used on noisy business series where "
        "one blowout month wrecks least squares. Quadratic in SERIES "
        "LENGTH, not row count: the fact table first collapses to "
        "<= 84 monthly points per nation (one shuffle), so the "
        "pairwise self-join is ~3.5k rows per nation regardless of "
        "data scale. Month totals are fixed-pointed to cents "
        "(exact), each slope is one correctly-rounded division of "
        "exact integers, and both engines interpolate the median "
        "with the same (1-f)*lo + f*hi rule over identical sorted "
        "multisets, so the rounded outputs agree bit-for-bit.",
)
def orders_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    monthly = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            o.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            (
                (F.year("o_orderdate").cast("long") - 1992) * 12
                + F.month("o_orderdate")
                - 1
            ).alias("m"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    from advanced_strapi_import_spark.caching import persist_tracked

    monthly = persist_tracked(monthly)
    a = monthly.select("nk", F.col("m").alias("__ma"), F.col("cents").alias("__ca"))
    b = monthly.select("nk", F.col("m").alias("__mb"), F.col("cents").alias("__cb"))
    # the monthly frame is <= 84 points x 25 nations — broadcast the
    # probe side so the pairwise join never sort-merges
    slopes = (
        a.join(F.broadcast(b), "nk")
        .filter(F.col("__mb") > F.col("__ma"))
        .select(
            "nk",
            (
                (F.col("__cb") - F.col("__ca"))
                / ((F.col("__mb") - F.col("__ma")) * 100.0)
            ).alias("slope"),
        )
    )
    med = slopes.groupBy("nk").agg(
        F.expr("percentile(slope, 0.5)").alias("ts_slope"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    resid = (
        monthly.join(F.broadcast(med.select("nk", "ts_slope")), "nk")
        .groupBy("nk")
        .agg(
            F.expr(
                "percentile(cents / 100.0 - ts_slope * m, 0.5)"
            ).alias("ts_intercept")
        )
    )
    return (
        med.join(F.broadcast(resid), "nk")
        .select(
            "nk",
            "n_pairs",
            # + 0.0: a near-flat series' median slope can round to
            # IEEE -0.0 in DuckDB (sign-preserving) but +0.0 in Spark
            (F.round("ts_slope", 4) + 0.0).alias("ts_slope"),
            (F.round("ts_intercept", 4) + 0.0).alias("ts_intercept"),
        )
    )


@query(
    "part_brand_herfindahl",
    oracle="""
WITH b AS (
  SELECT p_type, p_brand, CAST(count(*) AS BIGINT) AS n
  FROM part GROUP BY p_type, p_brand),
t AS (SELECT p_type, CAST(sum(n) AS BIGINT) AS tot FROM b GROUP BY p_type)
SELECT b.p_type,
       CAST(count(*) AS BIGINT) AS n_brands,
       CAST(max(t.tot) AS BIGINT) AS n_parts,
       CAST(sum((b.n * 1000000 // t.tot) * (b.n * 1000000 // t.tot))
            // 1000000 AS BIGINT) AS hhi_ppm
FROM b JOIN t USING (p_type)
GROUP BY b.p_type
""",
    doc="Herfindahl-Hirschman concentration index per part type: the "
        "sum of squared brand market shares (ppm), the standard "
        "concentration screen (10000+ ppm-of-ppm = monopolized "
        "category; diversity floors for training-data sources use the "
        "same statistic). Shares are integer ppm with floor division "
        "— all arithmetic exact BIGINT in both engines (share <= 1e6, "
        "square <= 1e12, brand count bounded). Two small aggregations "
        "reusing one partitioning; nothing touches row-level data "
        "twice.",
)
def part_brand_herfindahl(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = load(spark, sf_dir, "part").groupBy("p_type", "p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = b.groupBy("p_type").agg(F.sum("n").cast("long").alias("tot"))
    return (
        b.join(F.broadcast(t), "p_type")
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_brands"),
            F.max("tot").cast("long").alias("n_parts"),
            F.expr("CAST(sum((n * 1000000 div tot) * (n * 1000000 div tot))"
                   " div 1000000 AS BIGINT)").alias("hhi_ppm"),
        )
    )


@query(
    "events_user_lorenz_gini",
    oracle="""
WITH x AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, user_id),
r AS (
  SELECT event_type, n,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY n, user_id) AS BIGINT) AS rnk
  FROM x)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(n) AS BIGINT) AS total_events,
       CAST((2 * sum(rnk * n) - (count(*) + 1) * sum(n)) * 1000000
            // (count(*) * sum(n)) AS BIGINT) AS gini_ppm
FROM r GROUP BY event_type
""",
    doc="Gini coefficient of per-user activity per event type (the "
        "Lorenz-curve inequality summary — 0 ppm = perfectly even "
        "engagement, ~1e6 = one whale): computed from the rank "
        "formula G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over "
        "users ranked ascending, all integer arithmetic with one ppm "
        "floor division — exact in both engines. The rank window is "
        "partitioned by event type (no global sort); headroom: the "
        "ppm numerator multiplies sum(rank*x) ~ n_users * "
        "total_events by 1e6, so the exact-BIGINT bound is "
        "n_users * total_events < ~9.2e12 (2^63 / 1e6) per type — "
        "beyond that, drop the 1e6 into the final division or widen "
        "to DECIMAL(38,0) (DuckDB already sums in HUGEINT).",
)
def events_user_lorenz_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    x = (
        load_events(spark, sf_dir)
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("n", "user_id")
    r = x.select(
        "event_type", "n", F.row_number().over(w).cast("long").alias("rnk")
    )
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n").cast("long").alias("total_events"),
        F.expr(
            "CAST((2 * sum(rnk * n) - (count(1) + 1) * sum(n)) * 1000000"
            " div (count(1) * sum(n)) AS BIGINT)"
        ).alias("gini_ppm"),
    )


@query(
    "events_mutual_information",
    oracle="""
WITH o AS (
  SELECT event_type, CAST(user_id % 10 AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS obs
  FROM events GROUP BY 1, 2),
rt AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS row_n FROM o GROUP BY 1),
ct AS (SELECT bucket, CAST(sum(obs) AS BIGINT) AS col_n FROM o GROUP BY 1),
n AS (SELECT CAST(sum(obs) AS BIGINT) AS total FROM o)
SELECT o.event_type, o.bucket, o.obs,
       round((o.obs * 1.0 / n.total)
             * log2((o.obs * 1.0 * n.total) / (rt.row_n * 1.0 * ct.col_n)),
             6) + 0.0 AS mi_term_bits,
       round(sum((o.obs * 1.0 / n.total)
             * log2((o.obs * 1.0 * n.total) / (rt.row_n * 1.0 * ct.col_n)))
                 OVER (), 6) + 0.0 AS mi_bits
FROM o
JOIN rt USING (event_type) JOIN ct USING (bucket) CROSS JOIN n
""",
    doc="Mutual information (bits) between event type and user-id "
        "bucket — the information-gain screen feature selection and "
        "leakage detection run on categorical pairs (complements the "
        "chi-square test: MI measures dependence STRENGTH on an "
        "interpretable scale). Per-cell terms p(x,y) log2(p(x,y)/"
        "(p(x)p(y))) come from exact integer counts via one double "
        "expression written identically in both engines (+ 0.0 "
        "normalizes a rounded -0.0 on independent-ish cells); the "
        "total rides an unbounded window over the tiny cell frame. "
        "Only observed cells contribute (obs > 0 by construction, so "
        "no log(0); absent cells contribute 0 to MI by definition).",
)
def events_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = (
        load_events(spark, sf_dir)
        .groupBy(
            "event_type", (F.col("user_id") % 10).cast("long").alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("obs"))
    )
    rt = o.groupBy("event_type").agg(F.sum("obs").cast("long").alias("row_n"))
    ct = o.groupBy("bucket").agg(F.sum("obs").cast("long").alias("col_n"))
    n = o.agg(F.sum("obs").cast("long").alias("total"))
    term = (F.col("obs") * 1.0 / F.col("total")) * F.log2(
        (F.col("obs") * 1.0 * F.col("total"))
        / (F.col("row_n") * 1.0 * F.col("col_n"))
    )
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        o.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "bucket")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "bucket",
            "obs",
            (F.round(term, 6) + 0.0).alias("mi_term_bits"),
            # + 0.0: near-independent pairs sum to a tiny negative MI
            # that rounds to -0.0 in DuckDB but +0.0 in Spark
            (F.round(F.sum(term).over(w), 6) + 0.0).alias("mi_bits"),
        )
    )


@query(
    "orders_seasonal_index",
    oracle="""
WITH m AS (
  SELECT (CAST(year(o_orderdate) AS BIGINT) - 1992) * 12
             + month(o_orderdate) - 1 AS ym,
         CAST(month(o_orderdate) AS INT) AS moy,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2),
per_moy AS (
  SELECT moy, CAST(count(*) AS BIGINT) AS n_months,
         CAST(sum(cents) AS BIGINT) AS cents
  FROM m GROUP BY moy),
tot AS (
  SELECT CAST(sum(n_months) AS BIGINT) AS n_all,
         CAST(sum(cents) AS BIGINT) AS c_all
  FROM per_moy)
SELECT p.moy, p.n_months,
       round(p.cents / 100.0, 2) AS revenue,
       CAST(p.cents * t.n_all * 100 // (p.n_months * t.c_all) AS BIGINT)
           AS seasonal_index_pct
FROM per_moy p CROSS JOIN tot t
""",
    doc="Ratio-to-overall seasonal index per calendar month: average "
        "month-of-year revenue over all years vs the all-months "
        "average, as an integer percent via cross-multiplication "
        "(sum_m * n_all * 100 div (n_m * sum_all) — no intermediate "
        "float averages, exact BIGINT in both engines; headroom: "
        "cents * months * 100 must stay under 2^63, fine to ~1e15 "
        "total cents). The classic deseasonalization prefactor; 100 "
        "means an average month, 120 a +20% month. Two tiny "
        "aggregations over the 84-row monthly frame.",
)
def orders_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        (
            (F.year("o_orderdate").cast("long") - 1992) * 12
            + F.month("o_orderdate")
            - 1
        ).alias("ym"),
        F.month("o_orderdate").cast("int").alias("moy"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("cents")
    )
    per_moy = m.groupBy("moy").agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.sum("cents").cast("long").alias("cents"),
    )
    # totals derive from the 12-row per_moy frame (sum of per-month
    # month-counts/cents equals the all-months totals) — aggregating m
    # again would re-scan orders
    tot = per_moy.agg(
        F.sum("n_months").cast("long").alias("n_all"),
        F.sum("cents").cast("long").alias("c_all"),
    )
    return per_moy.crossJoin(F.broadcast(tot)).select(
        "moy",
        "n_months",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.expr("CAST(cents * n_all * 100 div (n_months * c_all) AS BIGINT)")
        .alias("seasonal_index_pct"),
    )


@query(
    "events_sequential_rules",
    oracle="""
WITH s AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                      > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
seq AS (
  SELECT user_id, ts, event_id, event_type,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM s),
bg AS (
  SELECT lag(event_type) OVER w2 AS a, event_type AS b
  FROM seq
  WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY ts, event_id)),
b2 AS (SELECT a, b FROM bg WHERE a IS NOT NULL),
cab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM b2 GROUP BY a, b),
ca AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY a),
cb AS (SELECT b, CAST(sum(c_ab) AS BIGINT) AS c_b FROM cab GROUP BY b),
tt AS (SELECT CAST(sum(c_ab) AS BIGINT) AS total FROM cab)
SELECT cab.a, cab.b, cab.c_ab,
       CAST(cab.c_ab * 1000000 // tt.total AS BIGINT) AS support_ppm,
       CAST(cab.c_ab * 1000000 // ca.c_a AS BIGINT) AS confidence_ppm,
       CAST(cab.c_ab * tt.total * 1000000
            // (ca.c_a * cb.c_b) AS BIGINT) AS lift_ppm
FROM cab JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN tt
WHERE cab.c_ab >= 10
""",
    doc="Sequential rule mining over sessionized event streams: "
        "within-session consecutive (A -> B) transitions with "
        "support, confidence and lift in exact integer ppm (floor "
        "division, identical BIGINT math both engines; headroom: the "
        "lift numerator c_ab * total * 1e6 is exact while c_ab * total "
        "< ~9.2e12 — at larger streams drop the 1e6 into the final "
        "division or widen to DECIMAL(38,0); Spark would wrap "
        "silently off ANSI while DuckDB errors, so the bound is a "
        "parity line, not just overflow). The next-action model behind "
        "recommendation triggers and funnel-repair analysis; the "
        "sessionize+lag windows reuse one user-hash partitioning and "
        "the rule frame is types^2 rows joined against broadcast "
        "marginals.",
)
def events_sequential_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from advanced_strapi_import_spark.caching import persist_tracked
    from advanced_strapi_import_spark.plans.registry import sessionize

    seq = sessionize(load_events(spark, sf_dir))
    w2 = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    bg = seq.select(
        F.lag("event_type").over(w2).alias("a"),
        F.col("event_type").alias("b"),
    ).filter(F.col("a").isNotNull())
    # persisted: cab feeds the marginals, the total AND the final
    # select — unpersisted, the two sessionize windows re-run per
    # consumer
    cab = persist_tracked(
        bg.groupBy("a", "b").agg(
            F.count(F.lit(1)).cast("long").alias("c_ab")
        )
    )
    ca = cab.groupBy("a").agg(F.sum("c_ab").cast("long").alias("c_a"))
    cb = cab.groupBy("b").agg(F.sum("c_ab").cast("long").alias("c_b"))
    tt = cab.agg(F.sum("c_ab").cast("long").alias("total"))
    return (
        cab.filter(F.col("c_ab") >= 10)
        .join(F.broadcast(ca), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(tt))
        .select(
            "a",
            "b",
            "c_ab",
            F.expr("CAST(c_ab * 1000000 div total AS BIGINT)").alias(
                "support_ppm"
            ),
            F.expr("CAST(c_ab * 1000000 div c_a AS BIGINT)").alias(
                "confidence_ppm"
            ),
            F.expr(
                "CAST(c_ab * total * 1000000 div (c_a * c_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


@query(
    "events_entropy_rate",
    oracle="""
WITH o AS (
  SELECT user_id, ts, event_id, event_type FROM events),
tr AS (
  SELECT lag(event_type) OVER w AS a, event_type AS b
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
t2 AS (SELECT a, b FROM tr WHERE a IS NOT NULL),
cab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM t2 GROUP BY a, b),
ca AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY a),
tt AS (SELECT CAST(sum(c_ab) AS BIGINT) AS total FROM cab),
h AS (
  SELECT cab.a, ca.c_a,
         -sum((cab.c_ab * 1.0 / ca.c_a)
              * log2(cab.c_ab * 1.0 / ca.c_a)) AS h_a
  FROM cab JOIN ca USING (a) GROUP BY cab.a, ca.c_a)
SELECT h.a AS state,
       CAST(h.c_a * 1000000 // tt.total AS BIGINT) AS p_state_ppm,
       round(h.h_a, 6) + 0.0 AS h_bits,
       round(sum((h.c_a * 1.0 / tt.total) * h.h_a) OVER (), 6) + 0.0
           AS entropy_rate_bits
FROM h CROSS JOIN tt
""",
    doc="Entropy rate of the per-user event-type Markov chain: "
        "per-state conditional entropy H(next | state) and the "
        "chain's entropy rate sum_i p(i) H(.|i) — how predictable "
        "user behavior is, the information-theoretic counterpart of "
        "the transition matrix (low rate = deterministic funnels, "
        "high = exploratory traffic). All probabilities are exact "
        "count ratios evaluated in one double expression per "
        "transition cell; per-state sums run over <= |types| "
        "identically-built terms and the rate rides a window over "
        "the tiny state frame (+ 0.0 guards the rounded -0.0 when a "
        "state is perfectly predictable). One lag window + one "
        "types^2 aggregation.",
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = e.select(
        F.lag("event_type").over(w).alias("a"),
        F.col("event_type").alias("b"),
    ).filter(F.col("a").isNotNull())
    from advanced_strapi_import_spark.caching import persist_tracked

    # persisted: cab feeds the marginal, the total and the entropy agg
    # — unpersisted, the user-partition lag window re-runs per consumer
    cab = persist_tracked(
        tr.groupBy("a", "b").agg(
            F.count(F.lit(1)).cast("long").alias("c_ab")
        )
    )
    ca = cab.groupBy("a").agg(F.sum("c_ab").cast("long").alias("c_a"))
    tt = ca.agg(F.sum("c_a").cast("long").alias("total"))
    p = F.col("c_ab") * 1.0 / F.col("c_a")
    h = (
        cab.join(F.broadcast(ca), "a")
        .groupBy("a", "c_a")
        .agg((-F.sum(p * F.log2(p))).alias("h_a"))
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return h.crossJoin(F.broadcast(tt)).select(
        F.col("a").alias("state"),
        F.expr("CAST(c_a * 1000000 div total AS BIGINT)").alias(
            "p_state_ppm"
        ),
        (F.round("h_a", 6) + 0.0).alias("h_bits"),
        (
            F.round(
                F.sum((F.col("c_a") * 1.0 / F.col("total")) * F.col("h_a"))
                .over(wall),
                6,
            )
            + 0.0
        ).alias("entropy_rate_bits"),
    )


# ---------------------------------------------------------------------------
# Markov stationary distribution, 2 exact fixed-point power steps (round 5)
# ---------------------------------------------------------------------------
@query(
    "events_stationary_distribution",
    oracle="""
WITH o AS (
  SELECT user_id, ts, event_id, event_type FROM events),
tr AS (
  SELECT lag(event_type) OVER w AS a, event_type AS b
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
t2 AS (SELECT a, b FROM tr WHERE a IS NOT NULL),
cab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM t2 GROUP BY a, b),
ca AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY a),
ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ca),
x0 AS (SELECT a, CAST(1000000 // ns.n AS BIGINT) AS x FROM ca CROSS JOIN ns),
x1 AS (
  SELECT cab.b AS a, CAST(sum(x0.x * cab.c_ab // ca.c_a) AS BIGINT) AS x
  FROM cab JOIN x0 USING (a) JOIN ca USING (a) GROUP BY cab.b),
x2 AS (
  SELECT cab.b AS a, CAST(sum(x1.x * cab.c_ab // ca.c_a) AS BIGINT) AS x
  FROM cab JOIN x1 USING (a) JOIN ca USING (a) GROUP BY cab.b),
tt AS (SELECT CAST(sum(c_ab) AS BIGINT) AS total FROM cab)
SELECT x2.a AS state,
       x2.x AS stationary_ppm,
       CAST(ca.c_a * 1000000 // tt.total AS BIGINT) AS empirical_ppm,
       abs(x2.x - ca.c_a * 1000000 // tt.total) AS drift_ppm
FROM x2 JOIN ca USING (a) CROSS JOIN tt
""",
    doc="Stationary distribution of the per-user event-type Markov "
        "chain via two EXACT fixed-point power steps from uniform "
        "(pi_{k+1} = pi_k P), compared against the empirical state "
        "frequencies — fast drift-to-empirical means the chain mixes "
        "quickly and per-state models are safe to fit on marginal "
        "counts; slow drift flags sticky funnels. Every step keeps "
        "ppm mass in BIGINT: term = x_a * c_ab div c_a (all positive, "
        "Spark div paired with DuckDB // — truncation-identical), so "
        "the iteration is engine-exact; at most |states| ppm of mass "
        "truncates per step (documented, deterministic). Scale shape: "
        "the chain lives on the types^2 transition aggregate; steps "
        "are joins over <= |types|^2 rows — the fact table is touched "
        "once by the lag window, same as events_entropy_rate.",
)
def events_stationary_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window
    from advanced_strapi_import_spark.caching import persist_tracked

    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = e.select(
        F.lag("event_type").over(w).alias("a"),
        F.col("event_type").alias("b"),
    ).filter(F.col("a").isNotNull())
    cab = persist_tracked(
        tr.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    )
    ca = persist_tracked(
        cab.groupBy("a").agg(F.sum("c_ab").cast("long").alias("c_a"))
    )
    ns = ca.agg(F.count(F.lit(1)).cast("long").alias("n"))
    x0 = ca.crossJoin(F.broadcast(ns)).select(
        "a", F.expr("CAST(1000000 div n AS BIGINT)").alias("x")
    )

    def _step(x: DataFrame) -> DataFrame:
        return (
            cab.join(F.broadcast(x), "a")
            .join(F.broadcast(ca), "a")
            .groupBy(F.col("b").alias("__b"))
            .agg(
                F.sum(F.expr("x * c_ab div c_a")).cast("long").alias("x")
            )
            .select(F.col("__b").alias("a"), "x")
        )

    x2 = _step(_step(x0))
    tt = cab.agg(F.sum("c_ab").cast("long").alias("total"))
    return (
        x2.join(F.broadcast(ca), "a")
        .crossJoin(F.broadcast(tt))
        .select(
            F.col("a").alias("state"),
            F.col("x").alias("stationary_ppm"),
            F.expr("CAST(c_a * 1000000 div total AS BIGINT)").alias(
                "empirical_ppm"
            ),
            F.abs(
                F.col("x") - F.expr("c_a * 1000000 div total")
            ).cast("long").alias("drift_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# per-dimension embedding statistics, exact fixed point (round 5)
# ---------------------------------------------------------------------------
@query(
    "embedding_dim_stats",
    oracle="""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS xq
  FROM embeddings),
expl AS (
  SELECT CAST(generate_subscripts(xq, 1) - 1 AS INT) AS dim,
         unnest(xq) AS v
  FROM q)
SELECT dim,
       CAST(count(*) AS BIGINT) AS n,
       CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
           AS mean_micro,
       CAST(floor(CAST(sum(v * v)::HUGEINT * count(*)
                       - sum(v)::HUGEINT * sum(v) AS DOUBLE)
                  / (count(*) * count(*)) / 1000000 + 0.5) AS BIGINT)
           AS var_micro
FROM expl GROUP BY dim
""",
    doc="Per-dimension embedding mean/variance — the drift monitor run "
        "before trusting an embedding column (a dimension whose mean "
        "wanders or variance collapses flags an encoder regression or "
        "a normalization bug). Embeddings fixed-point to 1e-6 BIGINT "
        "(same discipline as embedding_power_iteration), so sum and "
        "sum-of-squares are exact integer accumulations; variance "
        "comes from the integer identity n*sum(v^2) - sum(v)^2 over "
        "n^2 (one double division on exact inputs), mean/var "
        "half-up-floored in micro units. Scale shape: posexplode is "
        "row-local; the only shuffle is a 64-group partial-aggregated "
        "reduce — per-dimension stats cost one pass regardless of "
        "corpus size. Integer headroom: sum(v) stays BIGINT (exact to "
        "~9e12 rows at |v|<=1e6), but n*sum(v^2) reaches 2^63 at only "
        "n~3e3 worst-case (n~2e4 for unit-norm vectors), so the "
        "squared accumulator runs in DECIMAL(38,0) — exact to ~1e13 "
        "rows per dimension — mirrored by HUGEINT in the oracle; the "
        "final cast-to-double of the same exact integer rounds "
        "identically in both engines.",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load(spark, sf_dir, "embeddings"))
    q = emb.select(
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * 1000000 + 0.5).cast(
                    "long"
                ),
            )
        ).alias("dim", "v")
    )
    g = q.groupBy(F.col("dim").cast("int").alias("dim")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("s"),
        # DECIMAL(38,0) accumulator: n * sum(v^2) overflows BIGINT at
        # only ~3e3 worst-case rows per dim (ANSI would throw, not
        # wrap) — see headroom note in the doc
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("ss"),
    )
    num = (
        F.col("ss") * F.col("n")
        - F.col("s").cast("decimal(38,0)") * F.col("s")
    )
    return g.select(
        "dim",
        "n",
        F.floor(F.col("s").cast("double") / F.col("n") + 0.5)
        .cast("long")
        .alias("mean_micro"),
        F.floor(
            num.cast("double") / (F.col("n") * F.col("n")) / 1000000 + 0.5
        )
        .cast("long")
        .alias("var_micro"),
    )


# ---------------------------------------------------------------------------
# approx_top_k sketch aggregate (round 5) — new built-in in Spark 4.0
# ---------------------------------------------------------------------------
@query(
    "events_approx_top_k",
    oracle="""
SELECT event_type AS item, CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY event_type
""",
    doc="approx_top_k(expr, k) — Spark 4.0's frequent-items sketch "
        "aggregate (internal space-saving buffer, mergeable partials): "
        "top event types with counts, exploded back to rows. The "
        "sketch is EXACT whenever the tracked-item budget "
        "(maxItemsTracked, default 10000) covers the column's distinct "
        "count — true here (5 types) and for any bounded-vocabulary "
        "column at 100 TB, which is what makes an exact oracle fair; "
        "above the budget it degrades gracefully to approximate heavy "
        "hitters where a groupBy-count would need the full shuffle "
        "(the CMS top-k query covers that regime with error bounds). "
        "k exceeds the distinct count so result membership is total "
        "and tie order cannot matter.",
)
def events_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    tk = e.agg(F.expr("approx_top_k(event_type, 10)").alias("tk"))
    return tk.select(F.explode("tk").alias("x")).select(
        F.col("x.item").alias("item"),
        F.col("x.count").cast("long").alias("cnt"),
    )


# ---------------------------------------------------------------------------
# time-weighted average value per user (round 5)
# ---------------------------------------------------------------------------
@query(
    "events_twap",
    oracle="""
WITH o AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
seg AS (
  SELECT user_id, cents,
         (epoch_us(lead(ts) OVER w) - epoch_us(ts)) // 1000000 AS dur
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
agg AS (
  SELECT user_id,
         CAST(sum(cents * dur) AS BIGINT) AS wsum,
         CAST(sum(dur) AS BIGINT) AS tspan,
         CAST(count(*) AS BIGINT) AS n_segments
  FROM seg WHERE dur IS NOT NULL GROUP BY user_id
  HAVING sum(dur) > 0)
SELECT user_id, n_segments, tspan,
       floor(CAST(wsum AS DOUBLE) / tspan / 100 * 100 + 0.5) / 100 AS twap
FROM agg
""",
    doc="Time-weighted average value per user (TWAP — the fair average "
        "for irregularly-sampled series, where a plain avg() "
        "overweights bursty periods): each observation holds until the "
        "next one (step interpolation), weighted by its duration. "
        "Values fixed-point to BIGINT cents and durations to whole "
        "seconds, so the weighted sum is exact and order-free; one "
        "double division at the end, half-up at 2 decimals mirrored "
        "in the oracle. Users whose observations all share one "
        "timestamp have zero span and are excluded (HAVING span > 0 — "
        "the alternative is an ANSI divide-by-zero). One user-"
        "partitioned lead window + one per-user aggregate; the window "
        "partitioning is reused by the groupBy — single shuffle.",
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.select(
        "user_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        (
            (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts"))
            / F.lit(1000000)
        ).cast("long").alias("dur"),
    ).filter(F.col("dur").isNotNull())
    agg = (
        seg.groupBy("user_id")
        .agg(
            F.sum(F.col("cents") * F.col("dur")).cast("long").alias("wsum"),
            F.sum("dur").cast("long").alias("tspan"),
            F.count(F.lit(1)).cast("long").alias("n_segments"),
        )
        .filter(F.col("tspan") > 0)
    )
    return agg.select(
        "user_id",
        "n_segments",
        "tspan",
        (
            F.floor(
                F.col("wsum").cast("double") / F.col("tspan") / 100 * 100
                + 0.5
            )
            / 100
        ).alias("twap"),
    )


# ---------------------------------------------------------------------------
# rank family trio (round 5)
# ---------------------------------------------------------------------------
@query(
    "events_rank_trio",
    oracle="""
WITH day_totals AS (
  SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2)
SELECT event_type, day, n,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT) AS pr_ppm,
       CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT) AS cd_ppm
FROM day_totals
WINDOW w AS (PARTITION BY event_type ORDER BY n, day)
""",
    doc="The SQL rank family side by side — rank (gapped), dense_rank, "
        "percent_rank ((rnk-1)/(n-1)) and cume_dist (peers-inclusive "
        "share) — over per-type daily volumes, the reference every "
        "'which days were busiest' report reaches for. Both percent "
        "columns are exact rational functions of integer ranks, "
        "half-up-floored to ppm so the engines cannot drift. The "
        "window partitions by type over the (type, day) DOMAIN "
        "aggregate (facts collapse first), so the sort is bounded by "
        "days, not events — the single-partition trap this catalog "
        "avoids everywhere.",
)
def events_rank_trio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_events(spark, sf_dir)
    dt = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").cast("long").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("event_type").orderBy("n", "day")
    return dt.select(
        "event_type",
        "day",
        "n",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.floor(F.percent_rank().over(w) * 1000000 + 0.5)
        .cast("long")
        .alias("pr_ppm"),
        F.floor(F.cume_dist().over(w) * 1000000 + 0.5)
        .cast("long")
        .alias("cd_ppm"),
    )


# ---------------------------------------------------------------------------
# A/B sample-ratio-mismatch guardrail (round 5)
# ---------------------------------------------------------------------------
@query(
    "events_ab_srm_check",
    oracle="""
WITH users AS (SELECT DISTINCT user_id FROM events),
counts AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS a2,
         CAST(sum(CASE WHEN user_id % 10 < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS a10
  FROM users),
checks AS (
  SELECT 'mod2_vs_50' AS arm, a2 AS oa, n, CAST(0.5 AS DOUBLE) AS pa
  FROM counts
  UNION ALL
  SELECT 'mod10_vs_30', a10, n, CAST(0.3 AS DOUBLE) FROM counts
  UNION ALL
  SELECT 'mod10_vs_50', a10, n, CAST(0.5 AS DOUBLE) FROM counts)
SELECT arm, oa AS n_a, n - oa AS n_b,
       CAST(floor(((oa - n * pa) * (oa - n * pa) / (n * pa)
                   + ((n - oa) - n * (1 - pa)) * ((n - oa) - n * (1 - pa))
                     / (n * (1 - pa))) * 1000 + 0.5) AS BIGINT)
           AS chi2_milli,
       (((oa - n * pa) * (oa - n * pa) / (n * pa)
         + ((n - oa) - n * (1 - pa)) * ((n - oa) - n * (1 - pa))
           / (n * (1 - pa)))) <= 3.841 AS srm_ok
FROM checks
""",
    doc="Sample-ratio-mismatch guardrail — the FIRST check run on any "
        "A/B test before reading its metrics (a split that deviates "
        "from its intended ratio means broken assignment, and every "
        "downstream metric is garbage): 1-df chi-square of observed "
        "group sizes against the intended ratio, flagged at the 5% "
        "critical value (3.841). Three arms on the same user set: the "
        "mod-2 split checked against its intended 50/50 (passes), a "
        "30% mod-10 split against its intended 30/70 (passes), and "
        "the SAME 30% split mis-specified as 50/50 — the detector "
        "must FIRE (srm_ok = false), which keeps this query honest "
        "about actually detecting mismatch rather than rubber-"
        "stamping. All counts are exact; the chi-square is one "
        "double expression on identical integers in both engines, "
        "fixed-pointed to milli for display. One distinct-user "
        "aggregate, three scalar projections — facts touched once.",
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    counts = e.select("user_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("a2"),
        F.sum(F.when(F.col("user_id") % 10 < 3, 1).otherwise(0))
        .cast("long")
        .alias("a10"),
    )
    arms = None
    for arm, col, pa in (
        ("mod2_vs_50", "a2", 0.5),
        ("mod10_vs_30", "a10", 0.3),
        ("mod10_vs_50", "a10", 0.5),
    ):
        oa = F.col(col)
        ob = F.col("n") - oa
        ea = F.col("n") * F.lit(pa)
        # 1 - pa computed here and `1 - pa` in the oracle SQL are the
        # same IEEE subtraction on the same double literal
        eb = F.col("n") * F.lit(1 - pa)
        chi2 = (oa - ea) * (oa - ea) / ea + (ob - eb) * (ob - eb) / eb
        one = counts.select(
            F.lit(arm).alias("arm"),
            oa.alias("n_a"),
            ob.alias("n_b"),
            F.floor(chi2 * 1000 + 0.5).cast("long").alias("chi2_milli"),
            (chi2 <= 3.841).alias("srm_ok"),
        )
        arms = one if arms is None else arms.unionByName(one)
    return arms


# ---------------------------------------------------------------------------
# model evaluation: exact tie-aware AUC + calibration bins (round 6)
# ---------------------------------------------------------------------------
@query(
    "events_model_auc",
    oracle="""
WITH s AS (
  SELECT value, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS np
  FROM events GROUP BY value),
c AS (
  SELECT np, n,
         CAST(sum(n) OVER (ORDER BY value) AS BIGINT) AS cum_end
  FROM s),
a AS (
  SELECT CAST(sum(np * (2 * cum_end - n + 1)) AS BIGINT) AS s2,
         CAST(sum(np) AS BIGINT) AS npos,
         CAST(sum(n) AS BIGINT) AS ntot
  FROM c),
b AS (
  SELECT npos, ntot,
         s2 - npos * (npos + 1) AS x,
         greatest(2 * npos * (ntot - npos), 1) AS d
  FROM a)
SELECT npos, ntot - npos AS nneg,
       CAST(x // d * 1000000
            + (x % d) * 1000 // d * 1000
            + ((x % d) * 1000 % d) * 1000 // d AS BIGINT) AS auc_ppm
FROM b
""",
    doc="EXACT tie-aware ROC AUC ('is value predictive of purchase?') "
        "via the Mann-Whitney rank-sum identity, fully distributed: "
        "scores collapse to (value, n, n_pos) — |distinct scores| "
        "rows — and the global tie-group rank bounds come from "
        "skew.distributed_cumsum (range repartition + partition-local "
        "running sums + broadcast offsets), so NO single-partition "
        "window touches a data-sized frame at any point. Tie handling "
        "is the textbook average-rank: a tie group spanning global "
        "ranks [lo, hi] contributes (lo + hi) per positive in DOUBLED "
        "units, so 2U = sum(np * (2*cum_end - n + 1)) - npos*(npos+1) "
        "stays exactly integer; auc_ppm = 2U * 1e6 div (2*npos*nneg). "
        "Overflow headroom: s2 <= npos * 2 * ntot ~ 2e18 at 1e9 rows "
        "and the ppm step uses the chained-remainder identity (never "
        "forms 2U*1e6), so the whole query is BIGINT-exact to ~1.9e8 "
        "balanced events; beyond that widen the ppm step to "
        "HUGEINT/DECIMAL(38,0). The oracle mirrors with a plain window (DuckDB "
        "runs single-node; the distributed recipe is the Spark side's "
        "point).",
)
def events_model_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.operators import skew as SK

    e = load_events(spark, sf_dir)
    s = e.groupBy("value").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("np"),
    )
    c = SK.distributed_cumsum(s, ["value"], "n", out_col="cum_end")
    a = c.agg(
        F.sum(F.expr("np * (2 * cum_end - n + 1)")).cast("long").alias("s2"),
        F.sum("np").cast("long").alias("npos"),
        F.sum("n").cast("long").alias("ntot"),
    )
    return a.select(
        "npos",
        (F.col("ntot") - F.col("npos")).alias("nneg"),
        # chained-remainder exact ppm: floor(x*1e6/d) = (x div d)*1e6
        # + (x%d * 1000 div d)*1000 + ((x%d * 1000) % d)*1000 div d —
        # algebraically identical but never forms x*1e6 (which would
        # overflow BIGINT at ~3e6 balanced events); exact while
        # d*1000 < 2^63, i.e. ~1.9e8 events balanced. greatest(...,1):
        # degenerate single-class data would hit ANSI DIVIDE_BY_ZERO in
        # Spark vs NULL in DuckDB; guarded, both emit 0 (x is 0 there).
        F.expr(
            "CAST((s2 - npos * (npos + 1)) "
            "div greatest(2 * npos * (ntot - npos), 1) * 1000000 "
            "+ ((s2 - npos * (npos + 1)) "
            "   % greatest(2 * npos * (ntot - npos), 1)) * 1000 "
            "  div greatest(2 * npos * (ntot - npos), 1) * 1000 "
            "+ (((s2 - npos * (npos + 1)) "
            "    % greatest(2 * npos * (ntot - npos), 1)) * 1000 "
            "   % greatest(2 * npos * (ntot - npos), 1)) * 1000 "
            "  div greatest(2 * npos * (ntot - npos), 1) AS BIGINT)"
        ).alias("auc_ppm"),
    )


@query(
    "events_score_calibration",
    oracle="""
WITH c AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events),
m AS (SELECT CAST(max(cents) AS BIGINT) AS maxc FROM c),
b AS (
  SELECT least(9, (cents * 10) // (maxc + 1)) AS bin, cents, pos
  FROM c CROSS JOIN m)
SELECT CAST(bin AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents,
       CAST(sum(pos) * 1000000 // count(*) AS BIGINT) AS pos_rate_ppm
FROM b GROUP BY bin
""",
    doc="Calibration / reliability bins for the value-predicts-purchase "
        "model read: scores land in 10 equal-width bins over [0, max] "
        "and each bin reports its exact mean score and positive rate — "
        "the companion read to events_model_auc (AUC says the ranking "
        "is good; calibration says the magnitudes are honest). Numeric "
        "discipline: the 2-decimal value column is fixed-pointed to "
        "BIGINT cents (floor(x*100+0.5), identical IEEE ops both "
        "engines) so bin assignment ((cents*10) div (maxc+1)) and both "
        "per-bin means are pure integer arithmetic — no float "
        "summation-order hazard. The max-cents scalar is a broadcast "
        "over a plain parquet scan (no shared persisted chain, so no "
        "broadcast-race exposure); one low-cardinality groupBy ends "
        "the plan.",
)
def events_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    c = e.select(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    m = c.agg(F.max("cents").alias("maxc"))
    b = c.crossJoin(F.broadcast(m)).select(
        F.least(F.lit(9), F.expr("(cents * 10) div (maxc + 1)")).alias("bin"),
        "cents",
        "pos",
    )
    return b.groupBy(F.col("bin").cast("int").alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(sum(cents) div count(1) AS BIGINT)").alias("mean_cents"),
        F.expr("CAST(sum(pos) * 1000000 div count(1) AS BIGINT)").alias(
            "pos_rate_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# weekly retention cohort matrix (round 6)
# ---------------------------------------------------------------------------
@query(
    "events_retention_cohorts",
    oracle="""
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
coh AS (SELECT user_id, min(w) AS cw FROM uw GROUP BY user_id),
act AS (
  SELECT c.cw, CAST(date_diff('day', c.cw, u.w) // 7 AS INT) AS week_offset
  FROM uw u JOIN coh c USING (user_id)),
sz AS (SELECT cw, CAST(count(*) AS BIGINT) AS cohort_size
       FROM coh GROUP BY cw)
SELECT strftime(a.cw, '%Y-%m-%d') AS cohort_week, a.week_offset,
       CAST(count(*) AS BIGINT) AS n_active, s.cohort_size,
       CAST(count(*) * 1000000 // s.cohort_size AS BIGINT)
           AS retention_ppm
FROM act a JOIN sz s USING (cw)
GROUP BY a.cw, a.week_offset, s.cohort_size
""",
    doc="Weekly retention cohort matrix — the product-analytics staple: "
        "users cohorted by the ISO week of their FIRST event, each "
        "(cohort, week-offset) cell counting users active that week, "
        "as an exact ppm share of the cohort. The heavy input "
        "collapses IMMEDIATELY to distinct (user, week) rows — at "
        "100 TB that first distinct is the only event-sized shuffle; "
        "cohort assignment, the offset join and the matrix aggregate "
        "all run on |users x active-weeks| rows, hash-partitioned by "
        "user. Week truncation is Monday-based in both engines and the "
        "offset is integer floor-division of aligned day differences, "
        "so every cell is bit-exact.",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    uw = e.select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    ).distinct()
    coh = uw.groupBy("user_id").agg(F.min("w").alias("cw"))
    act = uw.join(coh, "user_id").select(
        "cw",
        F.expr("CAST(datediff(w, cw) div 7 AS INT)").alias("week_offset"),
    )
    sz = coh.groupBy("cw").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        act.groupBy("cw", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(sz, "cw")
        .select(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.expr("CAST(n_active * 1000000 div cohort_size AS BIGINT)")
            .alias("retention_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# robust (median/MAD) anomaly days (round 6)
# ---------------------------------------------------------------------------
@query(
    "events_anomaly_robust_z",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, date_trunc('day', ts)),
med AS (
  SELECT event_type, quantile_cont(n, 0.5) AS med
  FROM daily GROUP BY event_type),
dev AS (
  SELECT d.event_type, d.day, d.n, m.med, abs(d.n - m.med) AS ad
  FROM daily d JOIN med m USING (event_type)),
mad AS (
  SELECT event_type, quantile_cont(ad, 0.5) AS mad
  FROM dev GROUP BY event_type)
SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.n,
       CAST(2 * (d.n - d.med) AS BIGINT) AS dev_x2,
       CAST(4 * m.mad AS BIGINT) AS mad_x4,
       6745 * 2 * abs(CAST(2 * (d.n - d.med) AS BIGINT))
         >= 35000 * CAST(4 * m.mad AS BIGINT) AS is_anomaly
FROM dev d JOIN mad m USING (event_type)
""",
    doc="Robust anomaly detection on daily event volumes: per-type "
        "median and MAD (median absolute deviation) replace mean/std "
        "— one broken day cannot drag the baseline the way it drags a "
        "z-score — and a day is anomalous when the modified z-score "
        "0.6745*|x-med|/MAD >= 3.5 (Iglewicz-Hoaglin). Numeric "
        "discipline: medians of BIGINT counts land on exact halves "
        "and MADs on exact quarters, so dev_x2 = 2*(x-med) and mad_x4 "
        "= 4*MAD are exactly-integral doubles (cast identically in "
        "both engines despite their different inexact-cast rules) and "
        "the threshold test becomes pure BIGINT: 6745*2*|dev_x2| >= "
        "35000*mad_x4 — the same inequality scaled by 4, no float "
        "compare at the decision boundary. The heavy input collapses "
        "to |types x days| rows in one partial-agg shuffle; "
        "medians/MADs aggregate per type over domain-sized groups.",
)
def events_anomaly_robust_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("med")
    )
    dev = daily.join(med, "event_type").withColumn(
        "ad", F.abs(F.col("n") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    return dev.join(mad, "event_type").select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        (2 * (F.col("n") - F.col("med"))).cast("long").alias("dev_x2"),
        (4 * F.col("mad")).cast("long").alias("mad_x4"),
        F.expr(
            "6745 * 2 * abs(CAST(2 * (n - med) AS BIGINT)) "
            ">= 35000 * CAST(4 * mad AS BIGINT)"
        ).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# distributed exact WEIGHTED percentiles (round 6)
# ---------------------------------------------------------------------------
@query(
    "lineitem_weighted_percentiles",
    oracle="""
WITH s AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1),
c AS (
  SELECT cents, CAST(sum(w) OVER (ORDER BY cents) AS BIGINT) AS cw FROM s),
t AS (SELECT CAST(max(cw) AS BIGINT) AS tw FROM c),
qs(q_ppm) AS (VALUES (500000::BIGINT), (900000::BIGINT), (990000::BIGINT))
SELECT q.q_ppm, t.tw AS total_weight,
       CAST(min(CASE WHEN c.cw * 1000000 >= t.tw * q.q_ppm
                     THEN c.cents END) AS BIGINT) AS value_cents
FROM c CROSS JOIN t CROSS JOIN qs q
GROUP BY q.q_ppm, t.tw
""",
    doc="Exact QUANTITY-WEIGHTED price percentiles (p50/p90/p99), fully "
        "distributed: prices collapse to (cents, total-quantity) rows, "
        "skew.distributed_cumsum produces the global weighted running "
        "total without a single-partition window, and each percentile "
        "is the smallest value whose cumulative weight reaches "
        "ceil(q*W) — evaluated as the pure-integer inequality "
        "cw*1e6 >= W*q (no ceil, no float), all three quantiles in ONE "
        "conditional aggregate unpivoted to rows. This is the exact "
        "form of what percentile_approx(weighted) cannot even express; "
        "at 100 TB the only data-sized motion is the groupBy(cents) "
        "partial agg and one range shuffle. Quantities are integral "
        "doubles so their BIGINT cast agrees across engines (round-vs-"
        "truncate moot); prices fixed-point to cents (floor(x*100+.5)). "
        "Overflow: cw*1e6 <= W*1e6 ~ 2.5e16 at 1e9 rows — inside "
        "BIGINT.",
)
def lineitem_weighted_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from advanced_strapi_import_spark.operators import skew as SK

    li = load(spark, sf_dir, "lineitem")
    s = li.groupBy(
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("cents")
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("w"))
    c = SK.distributed_cumsum(s, ["cents"], "w", out_col="cw")
    # c's underlying range-partitioned frame is already materialized by
    # the cumsum's offsets collect, so this scalar broadcast reads cache
    # (no unmaterialized-chain broadcast race)
    tw = c.agg(F.max("cw").cast("long").alias("tw"))
    qs = (500000, 900000, 990000)
    agg = c.crossJoin(F.broadcast(tw)).agg(
        F.max("tw").alias("__tw"),
        *[
            F.min(
                F.when(
                    F.col("cw") * 1000000 >= F.col("tw") * q, F.col("cents")
                )
            )
            .cast("long")
            .alias(f"__v{q}")
            for q in qs
        ],
    )
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).cast("long").alias("q_ppm"),
                        F.col("__tw").alias("total_weight"),
                        F.col(f"__v{q}").alias("value_cents"),
                    )
                    for q in qs
                ]
            )
        ).alias("a")
    ).select("a.q_ppm", "a.total_weight", "a.value_cents")


# ---------------------------------------------------------------------------
# deterministic Poisson bootstrap CI (round 6)
# ---------------------------------------------------------------------------
@query(
    "events_bootstrap_ci",
    oracle="""
WITH m AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         b.b,
         ((event_id % 2147483647) * 2654435761 + b.b * 40503 + 7)
           % 1000000 AS h
  FROM events CROSS JOIN (SELECT unnest(range(0, 32)) AS b) b),
w AS (
  SELECT b, cents,
         CASE WHEN h < 367879 THEN 0
              WHEN h < 735759 THEN 1
              WHEN h < 919699 THEN 2
              WHEN h < 981012 THEN 3
              ELSE 4 END AS mult
  FROM m),
reps AS (
  SELECT b,
         CAST(sum(mult * cents) // greatest(sum(mult), 1) AS BIGINT)
             AS mean_cents
  FROM w GROUP BY b),
rr AS (
  SELECT mean_cents,
         row_number() OVER (ORDER BY mean_cents, b) AS rn
  FROM reps)
SELECT CAST(count(*) AS BIGINT) AS n_replicates,
       CAST(min(mean_cents) AS BIGINT) AS lo,
       CAST(max(mean_cents) AS BIGINT) AS hi,
       CAST(max(CASE WHEN rn = 2 THEN mean_cents END) AS BIGINT) AS ci_lo,
       CAST(max(CASE WHEN rn = 31 THEN mean_cents END) AS BIGINT) AS ci_hi
FROM rr
""",
    doc="Poisson bootstrap confidence interval for the mean event "
        "value — THE distributed bootstrap: classic resampling needs "
        "n draws from n rows (a global shuffle per replicate), but "
        "Binomial(n, 1/n) -> Poisson(1), so each row independently "
        "decides its own multiplicity in each of 32 replicates and a "
        "replicate mean is one weighted aggregate; no row ever moves. "
        "Multiplicities are DETERMINISTIC (Knuth-hash of event_id x "
        "replicate mapped through exact integer Poisson(1) cdf "
        "thresholds out of 1e6 — the embedding_triplets pre-reduction "
        "bounds the product under 2^63), values fixed-point to cents, "
        "each replicate mean is floor-integer — so all 32 means are "
        "bit-exact across engines; the CI bounds are NEAREST-RANK "
        "order statistics (2nd and 31st of 32), not interpolated "
        "quantiles — interpolation at fraction .775 floors apart "
        "across engines (formula-order IEEE), which 3-SF parity "
        "caught at sf0.001. Scale: the 32x "
        "explode is map-local; the only shuffle is 32 groups of "
        "partials.",
)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    m = e.select(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
        F.col("event_id"),
    ).select(
        "cents",
        "b",
        F.expr(
            "((event_id % 2147483647) * 2654435761 + b * 40503 + 7) "
            "% 1000000"
        ).alias("h"),
    )
    mult = (
        F.when(F.col("h") < 367879, 0)
        .when(F.col("h") < 735759, 1)
        .when(F.col("h") < 919699, 2)
        .when(F.col("h") < 981012, 3)
        .otherwise(4)
    )
    reps = (
        m.select("b", "cents", mult.alias("mult"))
        .groupBy("b")
        .agg(
            F.expr(
                "CAST(sum(mult * cents) div greatest(sum(mult), 1)"
                " AS BIGINT)"
            ).alias("mean_cents")
        )
    )
    from pyspark.sql import Window

    # nearest-rank CI bounds (2nd / 31st of 32) — exact order statistics
    # on BIGINT replicate means; interpolated quantiles at fraction
    # .775 floor apart across engines (formula-order IEEE difference),
    # which a 3-SF parity run caught
    rr = reps.withColumn(
        "rn", F.row_number().over(Window.orderBy("mean_cents", "b"))
    )
    return rr.agg(
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
        F.min("mean_cents").cast("long").alias("lo"),
        F.max("mean_cents").cast("long").alias("hi"),
        F.max(F.when(F.col("rn") == 2, F.col("mean_cents")))
        .cast("long")
        .alias("ci_lo"),
        F.max(F.when(F.col("rn") == 31, F.col("mean_cents")))
        .cast("long")
        .alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B readout (round 6)
# ---------------------------------------------------------------------------
@query(
    "events_cuped_adjustment",
    oracle="""
WITH u AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(sum(CASE WHEN ts <  TIMESTAMP '2024-01-15 00:00:00'
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY user_id),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(x::HUGEINT * x) AS sxx, sum(x::HUGEINT * y) AS sxy,
         sum(y::HUGEINT * y) AS syy
  FROM u),
th AS (
  SELECT n, sx, sy,
         CAST(n::HUGEINT * sxy - sx::HUGEINT * sy AS DOUBLE)
           / CAST(n::HUGEINT * sxx - sx::HUGEINT * sx AS DOUBLE) AS theta,
         CAST(n::HUGEINT * sxy - sx::HUGEINT * sy AS DOUBLE)
           * CAST(n::HUGEINT * sxy - sx::HUGEINT * sy AS DOUBLE)
           / CAST(n::HUGEINT * sxx - sx::HUGEINT * sx AS DOUBLE)
           / CAST(n::HUGEINT * syy - sy::HUGEINT * sy AS DOUBLE) AS rho2
  FROM m),
arm AS (
  SELECT u.arm, CAST(count(*) AS BIGINT) AS na,
         CAST(sum(u.x) AS BIGINT) AS sxa, CAST(sum(u.y) AS BIGINT) AS sya
  FROM u GROUP BY u.arm)
SELECT a.arm, a.na AS n_users,
       floor((a.sya * 1.0 / a.na) * 100 + 0.5) / 100 AS mean_post,
       floor(((a.sya - th.theta * (a.sxa - a.na * (th.sx * 1.0 / th.n)))
              / a.na) * 100 + 0.5) / 100 AS mean_cuped,
       CAST(floor(th.rho2 * 1000000) AS BIGINT) AS var_reduction_ppm,
       floor(th.theta * 10000 + 0.5) / 10000 AS theta
FROM arm a CROSS JOIN th
""",
    doc="CUPED variance-reduced experiment readout — the industry-"
        "standard pre-period covariate adjustment: per user, pre-period "
        "(days 1-14) spend x and post-period y in BIGINT cents; theta "
        "= cov(x,y)/var(x) from EXACT integer moments (HUGEINT/"
        "DECIMAL(38,0) cross-products — the dim_stats discipline), "
        "then each arm reports raw vs CUPED-adjusted post means (from "
        "the identity mean(y - theta*(x - mu_x)) = (Sy - theta*(Sx - "
        "n*mu_x))/n over exact integer arm sums — no order-dependent "
        "float reduction anywhere), plus "
        "the theoretical variance-reduction rho^2 = cov^2/(var_x var_y)"
        " in ppm (the fraction of variance the adjustment removes — "
        "here arms are user_id parity, so rho^2 is the whole story: "
        "same decision, tighter CI, smaller/faster experiments). Float "
        "enters only AFTER the exact integer moments, as the identical "
        "expression sequence in both engines, with half-up cent/1e-4 "
        "guards at the output. Scale: one per-user aggregate (the only "
        "event-sized shuffle), one 1-row moment frame broadcast back "
        "onto |users| rows, one per-arm aggregate.",
)
def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    u = persist_tracked(
        e.groupBy("user_id").agg(
            F.sum(F.when(F.col("ts") < cut, cents).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("ts") >= cut, cents).otherwise(0))
            .cast("long")
            .alias("y"),
        )
        .select((F.col("user_id") % 2).alias("arm"), "x", "y")
    )
    u.count()  # the moment scalar below must not race the per-arm scan
    dec = "decimal(38,0)"
    m = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
    )
    cov_n = (
        F.col("sxy") * F.col("n") - F.col("sx").cast(dec) * F.col("sy")
    ).cast("double")
    varx_n = (
        F.col("sxx") * F.col("n") - F.col("sx").cast(dec) * F.col("sx")
    ).cast("double")
    vary_n = (
        F.col("syy") * F.col("n") - F.col("sy").cast(dec) * F.col("sy")
    ).cast("double")
    # try_divide: a zero-variance pre or post period (degenerate data)
    # must yield NULL like DuckDB's x/0, not an ANSI DIVIDE_BY_ZERO
    th = m.select(
        "n", "sx",
        F.try_divide(cov_n, varx_n).alias("theta"),
        F.try_divide(F.try_divide(cov_n * cov_n, varx_n), vary_n).alias(
            "rho2"
        ),
    )
    # per-arm sums stay EXACT integers; the CUPED-adjusted mean uses
    # the identity mean(y - theta*(x - mu_x)) = (Sy - theta*(Sx -
    # n*mu_x))/n so float enters only as ONE fixed expression over
    # exact sums in both engines — a per-row double sum would reduce
    # in partition-dependent order and could flip the cent guard
    arm = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("na"),
        F.sum("x").cast("long").alias("sxa"),
        F.sum("y").cast("long").alias("sya"),
    )
    j = arm.crossJoin(F.broadcast(th))
    cuped_mean = (
        F.col("sya")
        - F.col("theta")
        * (F.col("sxa") - F.col("na") * (F.col("sx") * 1.0 / F.col("n")))
    ) / F.col("na")
    return j.select(
        "arm",
        F.col("na").alias("n_users"),
        (F.floor((F.col("sya") * 1.0 / F.col("na")) * 100 + 0.5) / 100)
        .alias("mean_post"),
        (F.floor(cuped_mean * 100 + 0.5) / 100).alias("mean_cuped"),
        F.floor(F.col("rho2") * 1000000).cast("long")
        .alias("var_reduction_ppm"),
        (F.floor(F.col("theta") * 10000 + 0.5) / 10000).alias("theta"),
    )


@query(
    "events_attribution",
    oracle="""
WITH hist AS (
  SELECT event_id, user_id, ts, event_type, value,
         max(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lc,
         max(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv
  FROM events),
att AS (
  SELECT CASE
           WHEN lc IS NOT NULL AND lc >= ts - INTERVAL 24 HOUR
                AND (lv IS NULL OR lc >= lv) THEN 'click'
           WHEN lv IS NOT NULL AND lv >= ts - INTERVAL 24 HOUR THEN 'view'
           ELSE 'none'
         END AS channel,
         user_id, value
  FROM hist WHERE event_type = 'purchase')
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_buyers,
       round(sum(value), 2) AS total_value
FROM att GROUP BY channel
""",
    doc="Last-touch marketing attribution: each purchase is credited to "
        "the user's most recent PRIOR click or view within a 24-hour "
        "lookback (click wins ties at equal timestamps — the "
        "deterministic tie-break both engines share via lc >= lv), "
        "else 'none'. The carry of the last click/view timestamp is "
        "max-over-preceding-rows on ONE (user, ts, event_id) window "
        "partitioning — no self-join of events to events, which is the "
        "naive quadratic formulation; at 100 TB this is a single "
        "user-hash shuffle and the window state per user is two "
        "timestamps. Purchase rollup by attributed channel: counts, "
        "distinct buyers, revenue.",
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lc = F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w)
    lv = F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    hist = e.select(
        "event_id", "user_id", "ts", "event_type", "value",
        lc.alias("lc"), lv.alias("lv"),
    )
    cutoff = F.col("ts") - F.expr("INTERVAL 24 HOURS")
    channel = (
        F.when(
            F.col("lc").isNotNull()
            & (F.col("lc") >= cutoff)
            & (F.col("lv").isNull() | (F.col("lc") >= F.col("lv"))),
            "click",
        )
        .when(F.col("lv").isNotNull() & (F.col("lv") >= cutoff), "view")
        .otherwise("none")
    )
    return (
        hist.filter(F.col("event_type") == "purchase")
        .select(channel.alias("channel"), "user_id", "value")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.countDistinct("user_id").cast("long").alias("n_buyers"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "events_sprt_ab",
    oracle="""
WITH trials AS (
  SELECT user_id % 2 AS arm, ts, event_id,
         CASE WHEN event_type = 'click' THEN 200670 ELSE -200671 END AS inc
  FROM events WHERE event_type IN ('click', 'view')),
cum AS (
  SELECT arm,
         sum(inc) OVER (PARTITION BY arm ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS llr,
         row_number() OVER (PARTITION BY arm ORDER BY ts, event_id) AS n
  FROM trials)
SELECT CAST(arm AS BIGINT) AS arm,
       CAST(max(n) AS BIGINT) AS n_trials,
       CAST(max(CASE WHEN n = (SELECT max(n2.n) FROM cum n2
                               WHERE n2.arm = cum.arm)
                     THEN llr END) AS BIGINT) AS final_llr_micro,
       CAST(min(CASE WHEN llr >= 2944439 THEN n END) AS BIGINT)
         AS first_upper_n,
       CAST(min(CASE WHEN llr <= -2944439 THEN n END) AS BIGINT)
         AS first_lower_n,
       CASE
         WHEN min(CASE WHEN llr >= 2944439 THEN n END) IS NOT NULL
              AND (min(CASE WHEN llr <= -2944439 THEN n END) IS NULL
                   OR min(CASE WHEN llr >= 2944439 THEN n END)
                      < min(CASE WHEN llr <= -2944439 THEN n END))
           THEN 'accept_h1'
         WHEN min(CASE WHEN llr <= -2944439 THEN n END) IS NOT NULL
           THEN 'accept_h0'
         ELSE 'continue'
       END AS decision
FROM cum GROUP BY arm
""",
    doc="Wald's Sequential Probability Ratio Test over the click/view "
        "conversion stream, per A/B arm (user hash): each trial adds a "
        "CONSTANT log-likelihood increment (H1 p=0.55 vs H0 p=0.45; "
        "the micro-nat literals 200670/-200671 are precomputed, so "
        "neither engine evaluates ln at query time) and the test stops "
        "at the first crossing of +-ln((1-b)/a) ~ +-2944439 micro-nats "
        "(a=b=0.05). The running LLR and the trial index both come "
        "from ONE skew.distributed_cumsum call (multi-column form: one "
        "range repartition, one offsets collect, one window pass — "
        "never a single-partition window over the event stream). "
        "Readout per arm: trial count, final LLR, first "
        "boundary-crossing trial on each side, and the SPRT decision. "
        "At 100 TB this is a linear per-arm scan — the sequential "
        "analysis shape that cannot be expressed as a plain aggregate.",
)
def events_sprt_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.operators import skew as SK

    e = load_events(spark, sf_dir)
    trials = (
        e.filter(F.col("event_type").isin("click", "view"))
        .select(
            (F.col("user_id") % 2).cast("long").alias("arm"),
            "ts",
            "event_id",
            F.when(F.col("event_type") == "click", 200670)
            .otherwise(-200671)
            .cast("long")
            .alias("inc"),
            F.lit(1).cast("long").alias("one"),
        )
    )
    U, L = 2944439, -2944439
    arms = []
    for a in (0, 1):
        cum = SK.distributed_cumsum(
            trials.filter(F.col("arm") == a),
            ["ts", "event_id"],
            ["inc", "one"],
            out_col=["llr", "n"],
        )
        arms.append(
            cum.groupBy("arm").agg(
                F.max("n").cast("long").alias("n_trials"),
                F.max_by("llr", "n").cast("long").alias("final_llr_micro"),
                F.min(F.when(F.col("llr") >= U, F.col("n")))
                .cast("long")
                .alias("first_upper_n"),
                F.min(F.when(F.col("llr") <= L, F.col("n")))
                .cast("long")
                .alias("first_lower_n"),
            )
        )
    both = arms[0].unionByName(arms[1])
    up, lo = F.col("first_upper_n"), F.col("first_lower_n")
    decision = (
        F.when(up.isNotNull() & (lo.isNull() | (up < lo)), "accept_h1")
        .when(lo.isNotNull(), "accept_h0")
        .otherwise("continue")
    )
    return both.select(
        "arm", "n_trials", "final_llr_micro", "first_upper_n",
        "first_lower_n", decision.alias("decision"),
    )


@query(
    "lineitem_mann_whitney",
    oracle="""
WITH vals AS (
  SELECT l_quantity AS v,
         CAST(count(*) AS BIGINT) AS c,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS ca
  FROM lineitem GROUP BY l_quantity),
ranked AS (
  SELECT v, c, ca,
         sum(c) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM vals),
agg AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na,
         CAST(sum(c - ca) AS BIGINT) AS nb,
         CAST(sum(ca * (2 * cum - c + 1)) AS BIGINT) AS r2a,
         CAST(sum(c * c * c - c) AS BIGINT) AS ties
  FROM ranked)
SELECT na AS n_a, nb AS n_b,
       CAST(r2a - na * (na + 1) AS BIGINT) AS u2_a,
       ties AS tie_term,
       CASE WHEN na > 0 AND nb > 0 AND na + nb > 1 THEN
         CASE WHEN (na * 1.0 * nb / 12)
                   * ((na + nb + 1)
                      - ties * 1.0
                        / ((na + nb) * 1.0 * (na + nb - 1))) > 0
              THEN round((r2a - na * (na + 1) - na * 1.0 * nb)
                         / (2 * sqrt((na * 1.0 * nb / 12)
                                     * ((na + nb + 1)
                                        - ties * 1.0
                                          / ((na + nb) * 1.0
                                             * (na + nb - 1))))),
                         4) + 0.0
         END
       END AS z
FROM agg
""",
    doc="Mann-Whitney U rank-sum test (returned lineitems vs the rest "
        "on l_quantity), EXACT under heavy ties: quantities collapse "
        "to their 50-value domain first, tie-averaged ranks are kept "
        "integral via the 2x trick (rank2 = 2*cumcount - c + 1, so "
        "U2 = 2U stays BIGINT), and the normal-approximation z uses "
        "the standard tie-corrected variance — every precursor "
        "(n_a, n_b, U2, sum(t^3 - t)) is an exact integer, the one "
        "double expression is built in the same multiply order in "
        "both engines. Scale shape: one groupBy collapses the fact "
        "table to |value domain| rows (~50), so the ranking window "
        "runs on a domain-sized frame — never a data-sized sort; "
        "a continuous metric would first quantize to a bounded grid "
        "exactly like lineitem_price_deciles.",
)
def lineitem_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    vals = li.groupBy(F.col("l_quantity").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("ca"),
    )
    # domain-sized frame (50 distinct quantities): the single-partition
    # window is bounded by the VALUE DOMAIN, not the data
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ranked = vals.withColumn("cum", F.sum("c").over(w))
    agg = ranked.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum(F.col("c") - F.col("ca")).cast("long").alias("nb"),
        F.sum(F.col("ca") * (2 * F.col("cum") - F.col("c") + 1))
        .cast("long")
        .alias("r2a"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("ties"),
    )
    na, nb, r2a, ties = (F.col(c) for c in ("na", "nb", "r2a", "ties"))
    n = na + nb
    # degenerate-data guard, NESTED so no division ever evaluates on
    # the degenerate branch (ANSI errors even inside a composite
    # boolean): outer case gates n > 1 before var's /(n*(n-1)) exists,
    # inner case gates var > 0 (all-tied sample) before the z division
    var = (na * 1.0 * nb / 12) * (
        (n + 1) - ties * 1.0 / (n * 1.0 * (n - 1))
    )
    z = F.when(
        (na > 0) & (nb > 0) & (n > 1),
        F.when(
            var > 0,
            F.round(
                (r2a - na * (na + 1) - na * 1.0 * nb) / (2 * F.sqrt(var)),
                4,
            )
            + 0.0,
        ),
    )
    return agg.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        (r2a - na * (na + 1)).cast("long").alias("u2_a"),
        ties.alias("tie_term"),
        z.alias("z"),
    )


@query(
    "lineitem_ks_two_sample",
    oracle="""
WITH vals AS (
  SELECT l_quantity AS v,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS ca,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END)
              AS BIGINT) AS cb
  FROM lineitem GROUP BY l_quantity),
ranked AS (
  SELECT v,
         sum(ca) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_a,
         sum(cb) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_b
  FROM vals),
tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
  FROM vals),
d AS (
  SELECT max(abs(cum_a * tot.nb - cum_b * tot.na)) AS d2,
         max(tot.na) AS na, max(tot.nb) AS nb
  FROM ranked CROSS JOIN tot)
SELECT na AS n_a, nb AS n_b,
       CAST(d2 AS BIGINT) AS d_cross,
       CASE WHEN na > 0 AND nb > 0
            THEN CAST(d2 * 1000000 // (na * nb) AS BIGINT) END
         AS ks_ppm
FROM d
""",
    doc="Two-sample Kolmogorov-Smirnov statistic (returned lineitems vs "
        "the rest on l_quantity), EXACT with zero floating point: the "
        "ECDF difference |F_A(v) - F_B(v)| cross-multiplies to "
        "|cumA*nB - cumB*nA| — a BIGINT per domain value — and the "
        "statistic reports as exact ppm via integer division. "
        "Complements lineitem_mann_whitney (rank-shift test) with the "
        "max-distance test over the SAME domain-collapse shape: the "
        "fact table's only shuffle is the ~50-row per-value count "
        "groupBy, the ECDF window runs on the value domain, and the "
        "degenerate empty-group case NULLs rather than divides. This "
        "is the distribution-drift gate run between training-data "
        "snapshots.",
)
def lineitem_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    vals = li.groupBy(F.col("l_quantity").alias("v")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("l_returnflag") == "R", 0).otherwise(1))
        .cast("long")
        .alias("cb"),
    )
    # domain-sized frame (~50 distinct quantities): window bounded by
    # the value domain, not the data (lineitem_mann_whitney pattern)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ranked = vals.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    tot = vals.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    d = ranked.crossJoin(F.broadcast(tot)).agg(
        F.max(
            F.abs(
                F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na")
            )
        ).alias("d2"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
    )
    ks = F.when(
        (F.col("na") > 0) & (F.col("nb") > 0),
        F.expr("CAST(d2 * 1000000 div (na * nb) AS BIGINT)"),
    )
    return d.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("d2").cast("long").alias("d_cross"),
        ks.alias("ks_ppm"),
    )


# ---------------------------------------------------------------------------
# exact-integer OLS regression metrics (round 7)
# ---------------------------------------------------------------------------
@query(
    "lineitem_regression_metrics",
    oracle="""
WITH b AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
  FROM lineitem),
g AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM b GROUP BY l_returnflag),
m AS (
  SELECT l_returnflag, n, sx, sy,
         sxy * n - CAST(sx AS HUGEINT) * sy AS num,
         greatest(sxx * n - CAST(sx AS HUGEINT) * sx, 1) AS denx,
         greatest(syy * n - CAST(sy AS HUGEINT) * sy, 1) AS deny
  FROM g)
SELECT l_returnflag, n,
       CAST(num * 1000000 // denx AS BIGINT) AS slope_micro,
       CAST((CAST(sy AS HUGEINT) * 1000000 - (num * 1000000 // denx) * sx)
            // (CAST(n AS HUGEINT) * 1000000) AS BIGINT) AS intercept_cents,
       CAST((num * 1000000 // denx) * num // deny AS BIGINT) AS r2_ppm
FROM m
""",
    doc="Per-group OLS regression read (price-cents on quantity by "
        "returnflag): slope in micro-cents/unit, intercept in cents, "
        "and R^2 in ppm — ZERO floating point. Inputs fixed-point to "
        "BIGINT (quantity integral, price half-up cents); the five "
        "co-moment sums run as one partial-aggregated groupBy with the "
        "squared accumulators in DECIMAL(38,0) (sum(y^2) alone passes "
        "2^63 at ~1e5 rows; the embedding_dim_stats discipline), so "
        "slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) evaluates as exact "
        "integral division and R^2 composes the two exact quotients "
        "((num*1e6 div denx) * num div deny = 1e6*num^2/(denx*deny) "
        "up to the shared floor both engines apply identically). "
        "Degenerate guard: a group with a single distinct x (denx=0) "
        "reports the greatest(...,1) fallback instead of ANSI "
        "DIVIDE_BY_ZERO. One scan, one 3-group reduce — the "
        "feature-vs-target screen run before fitting anything bigger; "
        "at 100 TB the plan is unchanged (co-moments are mergeable "
        "partials; DECIMAL(38,0) holds sum(y^2) to ~1e9 rows per "
        "group at price<=1e7 cents).",
)
def lineitem_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    b = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("y"),
    )
    g = b.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    m = g.select(
        "l_returnflag", "n", "sx", "sy",
        (F.col("sxy") * F.col("n")
         - F.col("sx").cast("decimal(38,0)") * F.col("sy")).alias("num"),
        F.greatest(
            F.col("sxx") * F.col("n")
            - F.col("sx").cast("decimal(38,0)") * F.col("sx"),
            F.lit(1).cast("decimal(38,0)"),
        ).alias("denx"),
        F.greatest(
            F.col("syy") * F.col("n")
            - F.col("sy").cast("decimal(38,0)") * F.col("sy"),
            F.lit(1).cast("decimal(38,0)"),
        ).alias("deny"),
    )
    return m.select(
        "l_returnflag",
        "n",
        F.expr("CAST(num * 1000000 div denx AS BIGINT)").alias("slope_micro"),
        F.expr(
            "CAST((CAST(sy AS DECIMAL(38,0)) * 1000000"
            "      - (num * 1000000 div denx) * sx)"
            "     div (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)"
        ).alias("intercept_cents"),
        F.expr(
            "CAST((num * 1000000 div denx) * num div deny AS BIGINT)"
        ).alias("r2_ppm"),
    )


# ---------------------------------------------------------------------------
# pairwise Pearson correlation matrix (round 7)
# ---------------------------------------------------------------------------
_CORR_VARS = [("qty", "units"), ("price", "cents"), ("disc", "bp"), ("tax", "bp")]
_CORR_PAIRS = [
    (a, b)
    for i, (a, _) in enumerate(_CORR_VARS)
    for (b, _) in _CORR_VARS[i + 1:]
]


def _corr_arm_sql(a: str, b: str) -> str:
    num = f"(s_{a}{b} * n - CAST(s_{a} AS HUGEINT) * s_{b})"
    dena = f"greatest(s_{a}{a} * n - CAST(s_{a} AS HUGEINT) * s_{a}, 1)"
    denb = f"greatest(s_{b}{b} * n - CAST(s_{b} AS HUGEINT) * s_{b}, 1)"
    return (
        f"SELECT '{a}' AS var_a, '{b}' AS var_b, n, "
        f"round(CAST({num} AS DOUBLE) / "
        f"(sqrt(CAST({dena} AS DOUBLE)) * sqrt(CAST({denb} AS DOUBLE))), 4) "
        f"AS corr FROM g"
    )


@query(
    "lineitem_corr_matrix",
    oracle="""
WITH b AS (
  SELECT CAST(l_quantity AS BIGINT) AS v_qty,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v_price,
         CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS v_disc,
         CAST(floor(l_tax * 10000 + 0.5) AS BIGINT) AS v_tax
  FROM lineitem),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
"""
    + ",\n".join(
        f"         CAST(sum(v_{a}) AS BIGINT) AS s_{a}" for a, _ in _CORR_VARS
    )
    + ",\n"
    + ",\n".join(
        f"         sum(CAST(v_{a} AS HUGEINT) * v_{b}) AS s_{a}{b}"
        for i, (a, _) in enumerate(_CORR_VARS)
        for (b, _) in _CORR_VARS[i:]
    )
    + "\n  FROM b)\n"
    + "\nUNION ALL\n".join(_corr_arm_sql(a, b) for a, b in _CORR_PAIRS),
    doc="Pairwise Pearson correlation matrix over the four lineitem "
        "measures (quantity/price/discount/tax), computed from EXACT "
        "integer co-moments: every measure is fixed-pointed to BIGINT "
        "(units / half-up cents / basis points), the 4 sums + 10 "
        "product sums accumulate in one partial-aggregated pass "
        "(DECIMAL(38,0) for the products — price^2 alone passes 2^63 "
        "at ~1e5 rows), and only the final corr = num/sqrt(denx*deny) "
        "touches doubles — on identical exact-integer inputs, so the "
        "IEEE ops (cast, sqrt, divide) round identically in both "
        "engines far below the 4dp output rounding. sqrt(denx)*"
        "sqrt(deny) instead of sqrt(denx*deny) keeps the product off "
        "the DECIMAL(38,0) ceiling. ONE scan and ONE single-row "
        "reduce feed all six matrix cells — the feature-redundancy "
        "screen over a 100 TB fact table costs exactly one pass, and "
        "zero-variance columns degrade to the greatest(...,1) guard "
        "instead of dividing by zero.",
)
def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_quantity").cast("long").alias("v_qty"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("v_price"),
        F.floor(F.col("l_discount") * 10000 + 0.5).cast("long").alias("v_disc"),
        F.floor(F.col("l_tax") * 10000 + 0.5).cast("long").alias("v_tax"),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    aggs += [
        F.sum(f"v_{a}").cast("long").alias(f"s_{a}") for a, _ in _CORR_VARS
    ]
    aggs += [
        F.sum((F.col(f"v_{a}") * F.col(f"v_{b}")).cast("decimal(38,0)"))
        .alias(f"s_{a}{b}")
        for i, (a, _) in enumerate(_CORR_VARS)
        for (b, _) in _CORR_VARS[i:]
    ]
    g = b.agg(*aggs)
    # one stack() generator fans the single agg row into the 6 matrix
    # cells — a 6-way union of selects over g would re-run the scan +
    # reduce subtree per cell
    cells = []
    for a, bb in _CORR_PAIRS:
        num = f"(s_{a}{bb} * n - CAST(s_{a} AS DECIMAL(38,0)) * s_{bb})"
        dena = (
            f"greatest(s_{a}{a} * n - CAST(s_{a} AS DECIMAL(38,0)) * s_{a},"
            f" CAST(1 AS DECIMAL(38,0)))"
        )
        denb = (
            f"greatest(s_{bb}{bb} * n - CAST(s_{bb} AS DECIMAL(38,0)) * s_{bb},"
            f" CAST(1 AS DECIMAL(38,0)))"
        )
        cells.append(
            f"'{a}', '{bb}', round(CAST({num} AS DOUBLE) / "
            f"(sqrt(CAST({dena} AS DOUBLE)) * sqrt(CAST({denb} AS DOUBLE))), 4)"
        )
    return g.selectExpr(
        "n",
        f"stack({len(cells)}, {', '.join(cells)}) AS (var_a, var_b, corr)",
    ).select("var_a", "var_b", "n", "corr")


# ---------------------------------------------------------------------------
# Brier score decomposition (round 7)
# ---------------------------------------------------------------------------
@query(
    "events_brier_decomposition",
    oracle="""
WITH c AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events),
m AS (SELECT greatest(CAST(max(cents) AS BIGINT), 1) AS maxc FROM c),
p AS (
  SELECT least(9, (cents * 10) // (maxc + 1)) AS bin,
         cents * 1000000 // maxc AS p_ppm, pos
  FROM c CROSS JOIN m),
bins AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS nb,
         CAST(sum(p_ppm) AS BIGINT) AS sp,
         CAST(sum(pos) AS BIGINT) AS np,
         CAST(sum((p_ppm - pos * 1000000) * (p_ppm - pos * 1000000))
              AS BIGINT) AS sq
  FROM p GROUP BY bin),
tot AS (
  SELECT CAST(sum(nb) AS BIGINT) AS n, CAST(sum(np) AS BIGINT) AS npos
  FROM bins),
k AS (
  SELECT b.nb, b.sp // b.nb AS fb, b.np * 1000000 // b.nb AS ob, b.sq,
         t.n, t.npos * 1000000 // t.n AS og
  FROM bins b CROSS JOIN tot t)
SELECT max(n) AS n,
       CAST(sum(sq) // (max(n) * 1000000) AS BIGINT) AS brier_ppm,
       CAST(sum(nb * (fb - ob) * (fb - ob)) // (max(n) * 1000000)
            AS BIGINT) AS reliability_ppm,
       CAST(sum(nb * (ob - og) * (ob - og)) // (max(n) * 1000000)
            AS BIGINT) AS resolution_ppm,
       CAST(max(og) * (1000000 - max(og)) // 1000000 AS BIGINT)
         AS uncertainty_ppm
FROM k
""",
    doc="Murphy decomposition of the Brier score for the "
        "value-predicts-purchase read: exact per-event Brier plus "
        "reliability / resolution / uncertainty over the same 10 "
        "equal-width bins as events_score_calibration — all in "
        "integer ppm (forecast p = cents/max quantized to ppm; every "
        "squared term stays BIGINT to ~9e6 events, DECIMAL(38,0) "
        "beyond — see SCALE.md headroom table). The classic identity "
        "brier = reliability - resolution + uncertainty holds up to "
        "the shared ppm quantization floor, applied identically by "
        "both engines. Plan: one scan -> broadcast max scalar -> "
        "10-group partial-agg rollup; the global row re-aggregates "
        "the 10 bins (persisted + eagerly filled so the broadcast "
        "build never races the main job through an unmaterialized "
        "chain — the dedup_family_recall lesson). AUC ranks, "
        "calibration eyeballs, Brier decomposition scores: this "
        "completes the forecast-quality trio.",
)
def events_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    c = e.select(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    m = c.agg(F.greatest(F.max("cents"), F.lit(1)).alias("maxc"))
    p = c.crossJoin(F.broadcast(m)).select(
        F.least(F.lit(9), F.expr("(cents * 10) div (maxc + 1)")).alias("bin"),
        F.expr("cents * 1000000 div maxc").alias("p_ppm"),
        "pos",
    )
    bins = persist_tracked(
        p.groupBy("bin").agg(
            F.count(F.lit(1)).cast("long").alias("nb"),
            F.sum("p_ppm").cast("long").alias("sp"),
            F.sum("pos").cast("long").alias("np"),
            F.sum(
                (F.col("p_ppm") - F.col("pos") * 1000000)
                * (F.col("p_ppm") - F.col("pos") * 1000000)
            )
            .cast("long")
            .alias("sq"),
        )
    )
    bins.count()  # eager fill: tot below is a broadcast over this chain
    tot = bins.agg(
        F.sum("nb").cast("long").alias("n"),
        F.sum("np").cast("long").alias("npos"),
    )
    k = bins.crossJoin(F.broadcast(tot)).select(
        "nb",
        F.expr("sp div nb").alias("fb"),
        F.expr("np * 1000000 div nb").alias("ob"),
        "sq",
        "n",
        F.expr("npos * 1000000 div n").alias("og"),
    )
    return k.agg(
        F.max("n").alias("n"),
        F.expr("CAST(sum(sq) div (max(n) * 1000000) AS BIGINT)").alias(
            "brier_ppm"
        ),
        F.expr(
            "CAST(sum(nb * (fb - ob) * (fb - ob))"
            " div (max(n) * 1000000) AS BIGINT)"
        ).alias("reliability_ppm"),
        F.expr(
            "CAST(sum(nb * (ob - og) * (ob - og))"
            " div (max(n) * 1000000) AS BIGINT)"
        ).alias("resolution_ppm"),
        F.expr(
            "CAST(max(og) * (1000000 - max(og)) div 1000000 AS BIGINT)"
        ).alias("uncertainty_ppm"),
    )


# ---------------------------------------------------------------------------
# split-conformal prediction interval (round 7)
# ---------------------------------------------------------------------------
@query(
    "events_conformal_interval",
    oracle="""
WITH c AS (
  SELECT event_type, event_id % 3 AS split,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
tr AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_train,
         CAST(sum(cents) // count(*) AS BIGINT) AS mu
  FROM c WHERE split = 0 GROUP BY event_type),
cal AS (
  SELECT c.event_type, abs(c.cents - tr.mu) AS r
  FROM c JOIN tr USING (event_type) WHERE c.split = 1),
rc AS (
  SELECT event_type, r, CAST(count(*) AS BIGINT) AS cnt
  FROM cal GROUP BY event_type, r),
nc AS (
  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_cal FROM rc GROUP BY event_type),
cum AS (
  SELECT event_type, r,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY r
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM rc),
q AS (
  SELECT c.event_type, min(c.r) AS q_cents
  FROM cum c JOIN nc USING (event_type)
  WHERE c.cum >= least(((nc.n_cal + 1) * 9 + 9) // 10, nc.n_cal)
  GROUP BY c.event_type)
SELECT t.event_type, tr.n_train, nc.n_cal,
       CAST(count(*) AS BIGINT) AS n_test,
       max(q.q_cents) AS q_cents,
       CAST(sum(CASE WHEN abs(t.cents - tr.mu) <= q.q_cents
                     THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
         AS cover_ppm
FROM c t
JOIN tr USING (event_type)
JOIN nc USING (event_type)
JOIN q USING (event_type)
WHERE t.split = 2
GROUP BY t.event_type, tr.n_train, nc.n_cal
""",
    doc="Split-conformal prediction interval with EXACT order "
        "statistics, per event_type: a 3-way deterministic hash split "
        "(event_id mod 3) gives train/calibration/test; the predictor "
        "is the train-split mean (floored cents), the conformal "
        "radius is the ceil(0.9*(n+1))-th smallest absolute residual "
        "— computed by collapsing calibration residuals to the "
        "(type, residual) VALUE DOMAIN and cumsum-ing counts, so the "
        "quantile window is domain-sized, never data-sized (the "
        "lineitem_ks_two_sample shape) — and the test split reports "
        "empirical coverage in ppm, which conformal theory guarantees "
        ">= 900000 in expectation regardless of the residual "
        "distribution. All arithmetic is integer (cents, ppm, "
        "integer ceil via (a+b-1) div b). The 5-row train and radius "
        "tables broadcast to the test scan; at 100 TB each split is "
        "one pruned pass and the only data-sized shuffle is the "
        "residual-domain groupBy. This is the distribution-free "
        "uncertainty gate run before shipping point predictions.",
)
def events_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_events(spark, sf_dir)
    c = e.select(
        "event_type",
        (F.col("event_id") % 3).alias("split"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    tr = (
        c.filter(F.col("split") == 0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train"),
            F.expr("CAST(sum(cents) div count(1) AS BIGINT)").alias("mu"),
        )
    )
    cal = (
        c.filter(F.col("split") == 1)
        .join(F.broadcast(tr), "event_type")
        .select("event_type", F.abs(F.col("cents") - F.col("mu")).alias("r"))
    )
    rc = cal.groupBy("event_type", "r").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    nc = rc.groupBy("event_type").agg(
        F.sum("cnt").cast("long").alias("n_cal")
    )
    w = Window.partitionBy("event_type").orderBy("r").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = rc.select("event_type", "r", F.sum("cnt").over(w).alias("cum"))
    q = (
        cum.join(F.broadcast(nc), "event_type")
        .filter(
            F.col("cum")
            >= F.least(
                F.expr("((n_cal + 1) * 9 + 9) div 10"), F.col("n_cal")
            )
        )
        .groupBy("event_type")
        .agg(F.min("r").alias("q_cents"))
    )
    t = c.filter(F.col("split") == 2).join(F.broadcast(tr), "event_type")
    t = t.join(F.broadcast(nc), "event_type").join(
        F.broadcast(q), "event_type"
    )
    return t.groupBy("event_type", "n_train", "n_cal").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.max("q_cents").alias("q_cents"),
        F.expr(
            "CAST(sum(CASE WHEN abs(cents - mu) <= q_cents THEN 1 ELSE 0 END)"
            " * 1000000 div count(1) AS BIGINT)"
        ).alias("cover_ppm"),
    )


# ---------------------------------------------------------------------------
# difference-in-differences readout (round 7)
# ---------------------------------------------------------------------------
@query(
    "events_diff_in_diff",
    oracle="""
WITH c AS (
  SELECT user_id % 2 AS grp,
         CAST(epoch(ts) AS BIGINT) AS es,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
m AS (
  SELECT (CAST(min(es) AS BIGINT) + CAST(max(es) AS BIGINT)) // 2 AS mid
  FROM c),
cell AS (
  SELECT grp, CASE WHEN es >= mid THEN 1 ELSE 0 END AS post,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents
  FROM c CROSS JOIN m GROUP BY grp, post)
SELECT
  max(CASE WHEN grp = 1 AND post = 0 THEN n END) AS n_treat_pre,
  max(CASE WHEN grp = 1 AND post = 1 THEN n END) AS n_treat_post,
  max(CASE WHEN grp = 0 AND post = 0 THEN n END) AS n_ctrl_pre,
  max(CASE WHEN grp = 0 AND post = 1 THEN n END) AS n_ctrl_post,
  max(CASE WHEN grp = 1 AND post = 0 THEN mean_cents END) AS mean_treat_pre,
  max(CASE WHEN grp = 1 AND post = 1 THEN mean_cents END) AS mean_treat_post,
  max(CASE WHEN grp = 0 AND post = 0 THEN mean_cents END) AS mean_ctrl_pre,
  max(CASE WHEN grp = 0 AND post = 1 THEN mean_cents END) AS mean_ctrl_post,
  (max(CASE WHEN grp = 1 AND post = 1 THEN mean_cents END)
   - max(CASE WHEN grp = 1 AND post = 0 THEN mean_cents END))
  - (max(CASE WHEN grp = 0 AND post = 1 THEN mean_cents END)
     - max(CASE WHEN grp = 0 AND post = 0 THEN mean_cents END))
    AS did_cents
FROM cell
""",
    doc="Difference-in-differences estimator over the events fact: "
        "treatment = deterministic user hash parity, pre/post = the "
        "epoch-midpoint of the observed window (an exact integer "
        "broadcast scalar), effect = (treated post-pre delta) minus "
        "(control post-pre delta) on floored mean cents — the "
        "quasi-experimental companion to events_ab_test (which "
        "assumes randomized exposure) and events_cuped_adjustment "
        "(variance reduction); DiD instead differences OUT any "
        "time-invariant group gap plus any common time shock. All "
        "integer arithmetic: epoch seconds, cents, truncating means "
        "applied identically per cell in both engines before the "
        "closed-form double difference. Plan: one scan -> 2-row "
        "min/max broadcast -> 4-group partial agg -> one pivot row; "
        "at 100 TB this is a single pass with a 4-row shuffle.",
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    c = e.select(
        (F.col("user_id") % 2).alias("grp"),
        F.unix_timestamp("ts").cast("long").alias("es"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    m = c.agg(
        F.expr(
            "(CAST(min(es) AS BIGINT) + CAST(max(es) AS BIGINT)) div 2"
        ).alias("mid")
    )
    cell = (
        c.crossJoin(F.broadcast(m))
        .select(
            "grp",
            F.when(F.col("es") >= F.col("mid"), 1).otherwise(0).alias("post"),
            "cents",
        )
        .groupBy("grp", "post")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("CAST(sum(cents) div count(1) AS BIGINT)").alias(
                "mean_cents"
            ),
        )
    )
    pick_n = lambda g, p: F.max(
        F.when((F.col("grp") == g) & (F.col("post") == p), F.col("n"))
    )
    pick_m = lambda g, p: F.max(
        F.when((F.col("grp") == g) & (F.col("post") == p), F.col("mean_cents"))
    )
    return cell.agg(
        pick_n(1, 0).alias("n_treat_pre"),
        pick_n(1, 1).alias("n_treat_post"),
        pick_n(0, 0).alias("n_ctrl_pre"),
        pick_n(0, 1).alias("n_ctrl_post"),
        pick_m(1, 0).alias("mean_treat_pre"),
        pick_m(1, 1).alias("mean_treat_post"),
        pick_m(0, 0).alias("mean_ctrl_pre"),
        pick_m(0, 1).alias("mean_ctrl_post"),
        (
            (pick_m(1, 1) - pick_m(1, 0)) - (pick_m(0, 1) - pick_m(0, 0))
        ).alias("did_cents"),
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test (round 7)
# ---------------------------------------------------------------------------
@query(
    "events_mann_kendall",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', ts) AS d, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY date_trunc('day', ts)),
pairs AS (
  SELECT CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END AS sg
  FROM daily a JOIN daily b ON a.d < b.d),
s AS (SELECT CAST(sum(sg) AS BIGINT) AS s_stat,
             (SELECT CAST(count(*) AS BIGINT) FROM daily) AS nd
      FROM pairs),
ties AS (
  SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT count(*) AS t FROM daily GROUP BY n)),
v AS (
  SELECT s.s_stat, s.nd,
         s.nd * (s.nd - 1) * (2 * s.nd + 5) - coalesce(t.tie_term, 0)
           AS var18
  FROM s CROSS JOIN ties t)
SELECT nd AS n_days, s_stat, var18,
       round(CASE WHEN s_stat > 0
                  THEN (s_stat - 1) / sqrt(var18 / 18.0)
                  WHEN s_stat < 0
                  THEN (s_stat + 1) / sqrt(var18 / 18.0)
                  ELSE 0.0 END, 4) AS z,
       CASE WHEN round(CASE WHEN s_stat > 0
                            THEN (s_stat - 1) / sqrt(var18 / 18.0)
                            WHEN s_stat < 0
                            THEN (s_stat + 1) / sqrt(var18 / 18.0)
                            ELSE 0.0 END, 4) > 1.96 THEN 'increasing'
            WHEN round(CASE WHEN s_stat > 0
                            THEN (s_stat - 1) / sqrt(var18 / 18.0)
                            WHEN s_stat < 0
                            THEN (s_stat + 1) / sqrt(var18 / 18.0)
                            ELSE 0.0 END, 4) < -1.96 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM v
""",
    doc="Mann-Kendall non-parametric trend test over the daily event "
        "volume series — the distribution-free companion to "
        "orders_theil_sen_trend (which estimates the slope; MK tests "
        "whether a monotone trend exists at all): S = sum of "
        "sign(x_j - x_i) over ordered day pairs (EXACT integer — the "
        "pair join runs on the ~30-row day DOMAIN, never on events), "
        "tie-corrected variance 18*Var(S) kept as an exact integer, "
        "and the continuity-corrected z touches floats only in the "
        "final sqrt/divide on exact operands (round 4, identical IEEE "
        "both engines). The volume-drift alarm for ingestion "
        "monitoring: one day-level groupBy is the only data-sized "
        "shuffle at any scale.",
)
def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    daily = persist_tracked(
        e.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
    )
    daily.count()  # eager: three small consumers below share this
    a = daily.select(F.col("d").alias("da"), F.col("n").alias("na"))
    b = daily.select(F.col("d").alias("db"), F.col("n").alias("nb"))
    s = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(
            F.sum(
                F.when(F.col("nb") > F.col("na"), 1)
                .when(F.col("nb") < F.col("na"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    ties = (
        daily.groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .agg(
            F.sum(F.expr("t * (t - 1) * (2 * t + 5)"))
            .cast("long")
            .alias("tie_term")
        )
    )
    v = (
        s.crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(ties))
        .select(
            "s_stat",
            "nd",
            F.expr(
                "nd * (nd - 1) * (2 * nd + 5) - coalesce(tie_term, 0)"
            ).alias("var18"),
        )
    )
    z = F.round(
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt(F.col("var18") / 18.0),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt(F.col("var18") / 18.0),
        )
        .otherwise(F.lit(0.0)),
        4,
    )
    return v.select(
        F.col("nd").alias("n_days"),
        "s_stat",
        "var18",
        z.alias("z"),
        F.when(z > 1.96, "increasing")
        .when(z < -1.96, "decreasing")
        .otherwise("no_trend")
        .alias("trend"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (round 7)
# ---------------------------------------------------------------------------
@query(
    "lineitem_spearman",
    oracle="""
WITH b AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
  FROM lineitem),
xd AS (
  SELECT x, CAST(count(*) AS BIGINT) AS c,
         sum(count(*)) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cb
  FROM b GROUP BY x),
xr AS (SELECT x, 2 * coalesce(cb, 0) + c + 1 AS rx FROM xd),
yd AS (
  SELECT y, CAST(count(*) AS BIGINT) AS c,
         sum(count(*)) OVER (ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cb
  FROM b GROUP BY y),
yr AS (SELECT y, 2 * coalesce(cb, 0) + c + 1 AS ry FROM yd),
r AS (
  SELECT CAST(xr.rx AS BIGINT)
           - (SELECT count(*) + 1 FROM lineitem) AS cx,
         CAST(yr.ry AS BIGINT)
           - (SELECT count(*) + 1 FROM lineitem) AS cy
  FROM b JOIN xr USING (x) JOIN yr USING (y)),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(cx AS HUGEINT) * cy) AS cnum,
         sum(CAST(cx AS HUGEINT) * cx) AS cxx,
         sum(CAST(cy AS HUGEINT) * cy) AS cyy
  FROM r)
SELECT n,
       round(CAST(cnum AS DOUBLE) /
             (sqrt(CAST(greatest(cxx, 1) AS DOUBLE))
              * sqrt(CAST(greatest(cyy, 1) AS DOUBLE))), 6) AS spearman_rho
FROM g
""",
    doc="Spearman rank correlation (quantity vs price) — the "
        "monotone-dependence companion to the Pearson matrix "
        "(lineitem_corr_matrix measures linear dependence on raw "
        "values; Spearman is Pearson on average ranks, robust to any "
        "monotone transform and to outliers). Exactness: tie-averaged "
        "ranks are kept DOUBLED (2*rank is always integral under tie "
        "averaging — the Mann-Whitney trick), computed by collapsing "
        "each variable to its VALUE DOMAIN and cumsum-ing counts "
        "(domain-sized windows, never a data-sized sort), joined back "
        "to rows by value. Round 9: the co-moments run on CENTERED "
        "doubled ranks, crx = rx - (n+1) with n a plan-time count "
        "(oracle: integer scalar subquery) — the doubled-rank mean is "
        "exactly n+1, so sum(crx) = 0 and rho reduces to "
        "sum(crx*cry)/sqrt(sum(crx^2)*sum(cry^2)): identical value to "
        "the raw-moment form (the uncentered num and den are each "
        "exactly n times the centered ones), but the dominant term "
        "drops from ~4n^4 to ~n^3, lifting the DECIMAL(38,0) "
        "data-scale headroom from ~37,000x (the steepest tree in the "
        "round-8 suite, ~2x margin past 100 TB) to ~1e8x. Co-moments "
        "in HUGEINT/DECIMAL(38,0); one final sqrt/divide on exact "
        "integers rounds identically in both engines. Plan: two "
        "domain rollups broadcast back onto the fact, one co-moment "
        "reduce — the fact table shuffles zero times beyond its "
        "domain groupBys at any scale.",
)
def lineitem_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("y"),
    )

    def doubled_ranks(col: str, out: str) -> DataFrame:
        d = b.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("c"))
        w = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        return d.select(
            col,
            (
                2 * F.coalesce(F.sum("c").over(w), F.lit(0))
                + F.col("c")
                + 1
            ).alias(out),
        )

    xr = doubled_ranks("x", "rx")
    yr = doubled_ranks("y", "ry")
    # plan-time count sets the exact doubled-rank mean n+1 (parquet
    # rowcount metadata job); centering BEFORE the products keeps the
    # co-moments at ~n^3 instead of ~4n^4 (round-9 headroom fix)
    m = li.count() + 1
    r = (
        b.join(F.broadcast(xr), "x")
        .join(yr, "y")
        .select(
            (F.col("rx") - F.lit(m)).alias("cx"),
            (F.col("ry") - F.lit(m)).alias("cy"),
        )
    )
    # operands cast BEFORE the multiply: a centered rank is ~n, so the
    # per-row product is ~n^2 and would wrap int64 past ~3e9 rows if
    # formed in long first (the corr-matrix queries cast the product
    # because their per-row values are domain-bounded; ranks are not)
    dx = F.col("cx").cast("decimal(19,0)")
    dy = F.col("cy").cast("decimal(19,0)")
    g = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((dx * dy).cast("decimal(38,0)")).alias("cnum"),
        F.sum((dx * dx).cast("decimal(38,0)")).alias("cxx"),
        F.sum((dy * dy).cast("decimal(38,0)")).alias("cyy"),
    )
    guard = "CAST(1 AS DECIMAL(38,0))"
    return g.selectExpr(
        "n",
        f"round(CAST(cnum AS DOUBLE) /"
        f" (sqrt(CAST(greatest(cxx, {guard}) AS DOUBLE))"
        f" * sqrt(CAST(greatest(cyy, {guard}) AS DOUBLE))), 6)"
        " AS spearman_rho",
    )


# ---------------------------------------------------------------------------
# Theil inequality index with between/within decomposition (round 7)
# ---------------------------------------------------------------------------
@query(
    "lineitem_theil_decomposition",
    oracle="""
WITH b AS (
  SELECT l_returnflag AS g,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
  FROM lineitem),
vals AS (
  SELECT g, c, CAST(count(*) AS BIGINT) AS k FROM b GROUP BY g, c),
gs AS (
  SELECT g, CAST(sum(k) AS BIGINT) AS ng,
         CAST(sum(k * c) AS BIGINT) AS sg
  FROM vals GROUP BY g),
tot AS (
  SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS s
  FROM gs),
tterm AS (
  SELECT v.g, v.k, v.c,
         CAST(floor(ln(v.c * 1.0 * t.n / t.s) * 1000000) AS BIGINT) AS m,
         CAST(floor(ln(v.c * 1.0 * gs.ng / gs.sg) * 1000000) AS BIGINT)
           AS mg
  FROM vals v JOIN gs USING (g) CROSS JOIN tot t),
tg AS (
  SELECT g,
         CAST(sum(CAST(k AS HUGEINT) * c * mg) // max(gs.sg) AS BIGINT)
           AS t_g_micro,
         max(gs.sg) AS sg
  FROM tterm JOIN gs USING (g) GROUP BY g),
total AS (
  SELECT CAST(sum(CAST(k AS HUGEINT) * c * m)
              // (SELECT s FROM tot) AS BIGINT) AS theil_total_micro
  FROM tterm),
btw AS (
  SELECT CAST(sum(CAST(sg AS HUGEINT)
                  * CAST(floor(ln(sg * 1.0 * t.n / ((ng * 1.0) * t.s))
                               * 1000000) AS BIGINT))
              // max(t.s) AS BIGINT) AS theil_between_micro
  FROM gs CROSS JOIN tot t),
wth AS (
  SELECT CAST(sum(CAST(sg AS HUGEINT) * t_g_micro)
              // (SELECT s FROM tot) AS BIGINT) AS theil_within_micro
  FROM tg)
SELECT (SELECT n FROM tot) AS n,
       (SELECT theil_total_micro FROM total) AS theil_total_micro,
       (SELECT theil_between_micro FROM btw) AS theil_between_micro,
       (SELECT theil_within_micro FROM wth) AS theil_within_micro
""",
    doc="Theil-T inequality index over revenue cents with the classic "
        "between/within decomposition by returnflag — the inequality "
        "read that, unlike Gini (events_user_lorenz_gini), decomposes "
        "EXACTLY into a between-groups term plus a share-weighted "
        "within-group sum, so a concentration shift can be attributed "
        "to segment mix vs within-segment spread. Exactness: the fact "
        "table collapses to its (group, cents) VALUE DOMAIN; each "
        "distinct value contributes k*c*floor(ln(c*n/S)*1e6) — a "
        "micro-nat BIGINT term from exact integer operands (shared "
        "log-quantization discipline) accumulated in HUGEINT/DECIMAL; "
        "total, between and within are each computed directly, so the "
        "decomposition identity holds up to the stated quantization "
        "floor. Plan: one (group, cents) groupBy is the only "
        "data-sized shuffle; group and grand totals broadcast back "
        "onto the domain frame.",
)
def lineitem_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_returnflag").alias("g"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("c"),
    )
    vals = persist_tracked(
        b.groupBy("g", "c").agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    vals.count()  # eager: group/grand totals broadcast over this chain
    gs = vals.groupBy("g").agg(
        F.sum("k").cast("long").alias("ng"),
        F.sum(F.col("k") * F.col("c")).cast("long").alias("sg"),
    )
    tot = gs.agg(
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").cast("long").alias("s"),
    )
    tterm = (
        vals.join(F.broadcast(gs), "g")
        .crossJoin(F.broadcast(tot))
        .select(
            "g", "k", "c", "ng", "sg", "n", "s",
            F.floor(
                F.log(F.col("c") * 1.0 * F.col("n") / F.col("s")) * 1000000
            ).cast("long").alias("m"),
            F.floor(
                F.log(F.col("c") * 1.0 * F.col("ng") / F.col("sg")) * 1000000
            ).cast("long").alias("mg"),
        )
    )
    tterm = persist_tracked(tterm)
    tterm.count()  # eager: three aggregates below consume this frame
    tg = tterm.groupBy("g").agg(
        F.expr(
            "CAST(sum(CAST(k AS DECIMAL(38,0)) * c * mg) div max(sg)"
            " AS BIGINT)"
        ).alias("t_g_micro"),
        F.max("sg").alias("sg"),
        F.max("s").alias("s"),
    )
    total = tterm.agg(
        F.expr(
            "CAST(sum(CAST(k AS DECIMAL(38,0)) * c * m) div max(s)"
            " AS BIGINT)"
        ).alias("theil_total_micro"),
        F.count(F.lit(1)).alias("__nv"),
    ).select("theil_total_micro")
    btw = (
        gs.crossJoin(F.broadcast(tot))
        .select(
            F.col("sg"),
            F.col("s"),
            F.floor(
                F.log(
                    F.col("sg") * 1.0 * F.col("n")
                    / (F.col("ng").cast("double") * F.col("s"))
                )
                * 1000000
            ).cast("long").alias("mb"),
        )
        .agg(
            F.expr(
                "CAST(sum(CAST(sg AS DECIMAL(38,0)) * mb) div max(s)"
                " AS BIGINT)"
            ).alias("theil_between_micro")
        )
    )
    wth = tg.agg(
        F.expr(
            "CAST(sum(CAST(sg AS DECIMAL(38,0)) * t_g_micro) div max(s)"
            " AS BIGINT)"
        ).alias("theil_within_micro")
    )
    n_row = tot.select(F.col("n"))
    return (
        n_row.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(btw))
        .crossJoin(F.broadcast(wth))
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test, pooled over users (round 7)
# ---------------------------------------------------------------------------
@query(
    "events_runs_test",
    oracle="""
WITH c AS (
  SELECT user_id, event_id, ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
mu AS (
  SELECT user_id, CAST(sum(cents) // count(*) AS BIGINT) AS mu
  FROM c GROUP BY user_id),
sgn AS (
  SELECT c.user_id, c.ts, c.event_id,
         CASE WHEN c.cents > mu.mu THEN 1 ELSE 0 END AS s
  FROM c JOIN mu USING (user_id)),
runs AS (
  SELECT user_id, s,
         CASE WHEN lag(s) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) IS DISTINCT FROM s
              THEN 1 ELSE 0 END AS brk
  FROM sgn),
per_user AS (
  SELECT user_id,
         CAST(sum(brk) AS BIGINT) AS r,
         CAST(sum(s) AS BIGINT) AS n1,
         CAST(count(*) - sum(s) AS BIGINT) AS n2,
         CAST(count(*) AS BIGINT) AS n
  FROM runs GROUP BY user_id),
ok AS (SELECT * FROM per_user WHERE n1 > 0 AND n2 > 0 AND n >= 2),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(r) AS BIGINT) AS total_runs,
         CAST(sum(r * 1000000
                  - (1000000 + 2000000 * n1 * n2 // n)) AS BIGINT)
           AS num_ppm,
         CAST(sum(CAST(2 AS HUGEINT) * n1 * n2 * (2 * n1 * n2 - n)
                  * 1000000000000
                  // (CAST(n AS HUGEINT) * n * (n - 1))) AS BIGINT)
           AS var_sum_p12
  FROM ok)
SELECT n_users, total_runs,
       round(num_ppm / sqrt(CAST(greatest(var_sum_p12, 1) AS DOUBLE)), 4)
         AS z,
       abs(round(num_ppm / sqrt(CAST(greatest(var_sum_p12, 1) AS DOUBLE)),
                 4)) <= 1.96 AS looks_random
FROM agg
""",
    doc="Wald-Wolfowitz runs test pooled over per-user event-value "
        "sequences: within each user's (ts, event_id)-ordered stream, "
        "values are coded above/below the user's exact floored mean "
        "(equal -> below, deterministic) and the run count R = 1 + "
        "sign changes is compared to its null expectation 1 + "
        "2*n1*n2/n; users are independent, so the pooled z sums the "
        "exact ppm-quantized numerators over a summed variance "
        "(2*n1*n2*(2*n1*n2-n)/(n^2*(n-1)), kept as exact integer "
        "pico units). Detects serial dependence (bursts, trending "
        "autocorrelation) that marginal stats miss — the sequence- "
        "randomness gate next to events_autocorr, distribution-free. "
        "Degenerate single-sided users (n1=0 or n2=0) carry zero "
        "information and are excluded identically in both engines. "
        "Plan: one user-partitioned lag window (the natural user-hash "
        "shuffle), one rollup; z is the only float, on exact integer "
        "operands.",
)
def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_events(spark, sf_dir)
    c = e.select(
        "user_id", "event_id", "ts",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    mu = c.groupBy("user_id").agg(
        F.expr("CAST(sum(cents) div count(1) AS BIGINT)").alias("mu")
    )
    sgn = c.join(mu, "user_id").select(
        "user_id", "ts", "event_id",
        F.when(F.col("cents") > F.col("mu"), 1).otherwise(0).alias("s"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = sgn.select(
        "user_id", "s",
        F.when(
            ~F.lag("s").over(w).eqNullSafe(F.col("s")), 1
        ).otherwise(0).alias("brk"),
    )
    per_user = runs.groupBy("user_id").agg(
        F.sum("brk").cast("long").alias("r"),
        F.sum("s").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).cast("long").alias("n2"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    ok = per_user.filter(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("n") >= 2)
    )
    agg = ok.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("r").cast("long").alias("total_runs"),
        F.sum(
            F.expr("r * 1000000 - (1000000 + 2000000 * n1 * n2 div n)")
        ).cast("long").alias("num_ppm"),
        F.sum(
            F.expr(
                "CAST(2 AS DECIMAL(38,0)) * n1 * n2 * (2 * n1 * n2 - n)"
                " * 1000000000000"
                " div (CAST(n AS DECIMAL(38,0)) * n * (n - 1))"
            )
        ).cast("long").alias("var_sum_p12"),
    )
    z = F.round(
        F.col("num_ppm")
        / F.sqrt(F.greatest(F.col("var_sum_p12"), F.lit(1)).cast("double")),
        4,
    )
    return agg.select(
        "n_users", "total_runs", z.alias("z"),
        (F.abs(z) <= 1.96).alias("looks_random"),
    )


# ---------------------------------------------------------------------------
# heavy-tail exponent of user activity (round 7)
# ---------------------------------------------------------------------------
@query(
    "events_user_activity_powerlaw",
    oracle="""
WITH ua AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS x FROM events
  GROUP BY user_id),
tail AS (SELECT x FROM ua WHERE x >= 5),
terms AS (
  SELECT CAST(floor(ln(x / 4.5) * 1000000) AS BIGINT) AS m FROM tail),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_tail,
         CAST(sum(m) AS BIGINT) AS sm
  FROM terms)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM ua) AS n_users,
       n_tail,
       CAST(5 AS BIGINT) AS xmin,
       CAST(1000000 + n_tail * 1000000000000 // greatest(sm, 1)
            AS BIGINT) AS alpha_micro
FROM agg
""",
    doc="Discrete power-law (Zipf) exponent of the per-user activity "
        "distribution by the standard continuous-approximation MLE "
        "(Clauset-Shalizi-Newman): alpha = 1 + n / sum(ln(x / "
        "(xmin - 0.5))) over the tail x >= xmin = 5. The "
        "heavy-tail audit run before capacity planning and "
        "per-user sampling budgets — an alpha drifting toward 2 "
        "means a few users dominate the event stream (the same read "
        "dedup cluster sizes and domain caps get via "
        "part_brand_herfindahl / doc_domain_caps, here as a fitted "
        "tail exponent). Exactness: x is an exact integer count, the "
        "per-user term floor(ln(x/4.5)*1e6) is a BIGINT micro-nat "
        "from the same double in both engines, and alpha_micro is "
        "one integral division — deterministic end to end. Plan: one "
        "user groupBy (the natural shuffle), a 1-row reduce; at "
        "100 TB the tail filter prunes the rollup, not the events.",
)
def events_user_activity_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    ua = persist_tracked(
        e.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    ua.count()  # eager: the n_users scalar shares this chain
    terms = ua.filter(F.col("x") >= 5).select(
        F.floor(F.log(F.col("x") / 4.5) * 1000000).cast("long").alias("m")
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.sum("m").cast("long").alias("sm"),
    )
    n_users = ua.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    return (
        n_users.crossJoin(F.broadcast(agg))
        .select(
            "n_users",
            "n_tail",
            F.lit(5).cast("long").alias("xmin"),
            F.expr(
                "CAST(1000000 + n_tail * 1000000000000"
                " div greatest(sm, 1) AS BIGINT)"
            ).alias("alpha_micro"),
        )
    )


# ---------------------------------------------------------------------------
# daily event-mix entropy series (round 7)
# ---------------------------------------------------------------------------
@query(
    "events_type_entropy_daily",
    oracle="""
WITH cnt AS (
  SELECT date_trunc('day', ts) AS d, event_type,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY date_trunc('day', ts), event_type),
tot AS (
  SELECT d, CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_types
  FROM cnt GROUP BY d),
ent AS (
  SELECT c.d, t.n, t.n_types,
         -(CAST(sum(c.c * CAST(floor(ln(c.c * 1.0 / t.n) / ln(2) * 1000000)
                               AS BIGINT)) AS BIGINT) // t.n)
           AS h_microbits
  FROM cnt c JOIN tot t USING (d) GROUP BY c.d, t.n, t.n_types)
SELECT strftime(d, '%Y-%m-%d') AS day, n, n_types, h_microbits,
       h_microbits
       - lag(h_microbits) OVER (ORDER BY d) AS delta_microbits
FROM ent
""",
    doc="Daily event-type-mix Shannon entropy series with day-over-day "
        "deltas — the live twin of source_lang_entropy's composition "
        "audit: a collapsing entropy means one event type is eating "
        "the stream (instrumentation bug or incident), a jump means a "
        "new flow appeared; the delta column is what a monitor "
        "alerts on. Exact micro-bit discipline throughout (counts -> "
        "floor(ln(c/n)/ln(2)*1e6) BIGINT terms -> integral division), "
        "so the series and its first difference are bit-identical "
        "across engines. The lag window runs on the ~30-row DAY "
        "domain; the only data-sized shuffle is the (day, type) "
        "rollup.",
)
def events_type_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_events(spark, sf_dir)
    cnt = e.groupBy(
        F.date_trunc("day", "ts").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = cnt.groupBy("d").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    ent = (
        cnt.join(tot, "d")
        .groupBy("d", "n", "n_types")
        .agg(
            (
                -(
                    F.sum(
                        F.col("c")
                        * F.floor(
                            F.log(F.col("c") * 1.0 / F.col("n"))
                            / F.log(F.lit(2.0))
                            * 1000000
                        ).cast("long")
                    ).cast("long")
                )
            ).alias("neg_sum")
        )
        .select(
            "d", "n", "n_types",
            F.expr("neg_sum div n").alias("h_microbits"),
        )
    )
    w = Window.orderBy("d")
    return ent.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n",
        "n_types",
        "h_microbits",
        (F.col("h_microbits") - F.lag("h_microbits").over(w)).alias(
            "delta_microbits"
        ),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b rank correlation (round 8)
# ---------------------------------------------------------------------------
@query(
    "lineitem_kendall_tau",
    oracle="""
WITH s AS (
  SELECT l_orderkey * 10 + l_linenumber AS k,
         CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS p
  FROM lineitem
  WHERE l_orderkey
        % greatest(199, (SELECT count(*) FROM lineitem) // 3000) = 0),
pairs AS (
  SELECT a.q AS qa, a.p AS pa, b.q AS qb, b.p AS pb
  FROM s a JOIN s b ON a.k < b.k),
cnt AS (
  SELECT
    CAST(count(*) FILTER ((qa - qb) * (pa - pb) > 0) AS BIGINT) AS c,
    CAST(count(*) FILTER ((qa - qb) * (pa - pb) < 0) AS BIGINT) AS d,
    CAST(count(*) FILTER (qa = qb AND pa <> pb) AS BIGINT) AS tx,
    CAST(count(*) FILTER (pa = pb AND qa <> qb) AS BIGINT) AS ty,
    CAST(count(*) FILTER (qa = qb AND pa = pb) AS BIGINT) AS txy
  FROM pairs)
SELECT c AS concordant, d AS discordant, tx AS ties_x, ty AS ties_y,
       round((c - d) / (sqrt((c + d + tx)::DOUBLE)
                        * sqrt((c + d + ty)::DOUBLE)), 6) AS tau_b
FROM cnt
""",
    doc="Kendall tau-b rank correlation between quantity and price on "
        "a key-sampled lineitem slice (l_orderkey % 199): exact "
        "concordant/discordant/tie pair counts over the i<j self-join "
        "(prices scaled to integer cents so every comparison is "
        "integer-exact), tau-b as the one rounded double. The "
        "denominator is sqrt((c+d+tx) * (c+d+ty)): each factor is the "
        "pair count NOT tied in that variable, so pairs tied in BOTH "
        "(txy, counted for the complete partition c+d+tx+ty+txy = "
        "n(n-1)/2) are excluded from both factors — including them "
        "understates tau whenever duplicate (quantity, price) rows "
        "exist, which lineitem has (the round-8 review counterexample: "
        "x=y=(1,1,2) must give tau_b=1, not 2/3). The sampling "
        "modulus is CORPUS-ADAPTIVE (round-9 fix; ADVICE r8): "
        "m = greatest(199, count(*) div 3000), computed as one "
        "plan-time count job (the near_dup_auto_planes discipline) "
        "and mirrored in the oracle as an integer scalar subquery — "
        "the r8 fixed %199 made the sample grow LINEARLY with the "
        "table, so pair compute grew quadratically (~4.6e10 pairs at "
        "100x bench); pinning the sample at ~3k rows pins pairs at "
        "~5e6 at ANY scale. The i<j theta-join broadcasts the sampled "
        "slice, so the pair set never shuffles: each task scans its "
        "broadcast copy. Complements lineitem_spearman: tau's "
        "pair-concordance semantics are robust to monotone transforms "
        "and its tie treatment differs from rank correlation.",
)
def lineitem_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # One cheap plan-time count (parquet rowcount metadata job) sets the
    # modulus; max(199, n div 3000) keeps ~3k sampled rows at any SF so
    # the i<j pair set stays ~5e6 instead of growing with n^2.
    m = max(199, li.count() // 3000)
    s = (
        li.filter(F.col("l_orderkey") % m == 0)
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("k"),
            F.col("l_quantity").cast("long").alias("q"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("p"),
        )
    )
    a, b = s.alias("a"), s.alias("b")
    pr = a.join(F.broadcast(b), F.col("a.k") < F.col("b.k")).select(
        (F.col("a.q") - F.col("b.q")).alias("dq"),
        (F.col("a.p") - F.col("b.p")).alias("dp"),
    )
    cnt = pr.agg(
        F.count_if((F.col("dq") * F.col("dp")) > 0).alias("c"),
        F.count_if((F.col("dq") * F.col("dp")) < 0).alias("d"),
        F.count_if((F.col("dq") == 0) & (F.col("dp") != 0)).alias("tx"),
        F.count_if((F.col("dp") == 0) & (F.col("dq") != 0)).alias("ty"),
        F.count_if((F.col("dq") == 0) & (F.col("dp") == 0)).alias("txy"),
    )
    return cnt.select(
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.col("tx").alias("ties_x"),
        F.col("ty").alias("ties_y"),
        F.round(
            (F.col("c") - F.col("d"))
            / (
                F.sqrt((F.col("c") + F.col("d")
                        + F.col("tx")).cast("double"))
                * F.sqrt((F.col("c") + F.col("d")
                          + F.col("ty")).cast("double"))
            ),
            6,
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test (round 8)
# ---------------------------------------------------------------------------
# Shared by events_welch_ttest and the streaming twin
# (parity_stream.stream_welch_ttest): the bit-reproducibility contract
# ("identical double expression tree on both engines") must live in
# exactly one place, or a fix in one twin silently forks the statistic.
WELCH_ORACLE = """
WITH g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(round(value * 100) AS BIGINT)) AS s,
         sum(CAST(round(value * 100) AS BIGINT)
             * CAST(round(value * 100) AS BIGINT)) AS ss
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY event_type),
w AS (
  SELECT
    max(CASE WHEN event_type = 'click' THEN n END) AS n1,
    max(CASE WHEN event_type = 'click' THEN s END) AS s1,
    max(CASE WHEN event_type = 'click' THEN ss END) AS ss1,
    max(CASE WHEN event_type = 'view' THEN n END) AS n2,
    max(CASE WHEN event_type = 'view' THEN s END) AS s2,
    max(CASE WHEN event_type = 'view' THEN ss END) AS ss2
  FROM g)
SELECT n1, n2,
       round(((s1::DOUBLE / n1) - (s2::DOUBLE / n2))
             / sqrt(((n1::HUGEINT * ss1 - s1 * s1)::DOUBLE
                     / (n1::HUGEINT * (n1 - 1))::DOUBLE) / n1
                    + ((n2::HUGEINT * ss2 - s2 * s2)::DOUBLE
                       / (n2::HUGEINT * (n2 - 1))::DOUBLE) / n2), 6) AS t_stat
FROM w
"""


def welch_cents_moments(df: DataFrame) -> DataFrame:
    """(event_type, n, s, ss) integer-cent moments for the click/view
    arms — the mergeable partial state both the batch and the
    streaming Welch queries aggregate.

    s and ss accumulate as DECIMAL(38,0), not BIGINT (round-9 fix):
    ss is a sum of per-row cents^2 (~1e8 each), so a BIGINT ss wraps
    silently around ~1e11 rows and the downstream n*ss - s*s product
    wraps ~21x past the sf0.1 corpus (measured n*ss ~ 2.0e16 of the
    9.2e18 int64 ceiling, growing quadratically with data scale).
    DECIMAL(38,0) keeps the moments exact to ~1e38 — past 100 TB —
    and under ANSI mode an overflow raises instead of wrapping. The
    DuckDB oracle mirrors via native HUGEINT sum (int128, ~1.7e38
    ceiling). Cost: a 2-group decimal hash-agg, unmeasurable next to
    the scan."""
    cents = F.round(F.col("value") * 100).cast("long")
    dec = "decimal(38,0)"
    return (
        df.filter(F.col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(cents.cast(dec)).cast(dec).alias("s"),
            F.sum((cents * cents).cast(dec)).cast(dec).alias("ss"),
        )
    )


def welch_t_from_moments(g: DataFrame) -> DataFrame:
    """Pivot the moment frame into arms and form Welch's t with ONE
    fixed double expression tree (mirrored verbatim in WELCH_ORACLE).
    t is SCALE-INVARIANT: the cents x100 factor multiplies both the
    mean difference and the standard error, so no de-scaling applies —
    the round-8 review caught a spurious /100 here that reported t two
    orders of magnitude small (and its oracle mirrored the mistake, so
    the parity gate could not see it: cross-engine equality proves
    agreement, not correctness of the named statistic).

    The moment combination n*ss - s*s runs in DECIMAL(38,0) (round-9
    fix; ADVICE r8): in BIGINT the term measured 2.0e16 at sf0.1 —
    only ~21x data headroom to the 9.2e18 int64 ceiling because it
    grows quadratically — and Spark non-ANSI long arithmetic wraps
    silently while the oracle's HUGEINT does not, so past the horizon
    the twins would either diverge or agree on garbage. DECIMAL keeps
    every integer op exact to ~1e38; only the final fixed double tree
    (division, sqrt — identical on both engines) is floating point,
    so the statistic stays bit-reproducible AND correct at 100 TB."""
    w = g.agg(
        F.max(F.when(F.col("event_type") == "click", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("event_type") == "click", F.col("s"))).alias("s1"),
        F.max(F.when(F.col("event_type") == "click", F.col("ss"))).alias("ss1"),
        F.max(F.when(F.col("event_type") == "view", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("event_type") == "view", F.col("s"))).alias("s2"),
        F.max(F.when(F.col("event_type") == "view", F.col("ss"))).alias("ss2"),
    )
    dec = "decimal(38,0)"

    def _arm_var(n, s, ss):
        num = (F.col(n).cast(dec) * F.col(ss).cast(dec)
               - F.col(s).cast(dec) * F.col(s).cast(dec))
        den = F.col(n).cast(dec) * (F.col(n) - 1).cast(dec)
        return num.cast("double") / den.cast("double")

    v1 = _arm_var("n1", "s1", "ss1")
    v2 = _arm_var("n2", "s2", "ss2")
    t = (
        (F.col("s1").cast("double") / F.col("n1"))
        - (F.col("s2").cast("double") / F.col("n2"))
    ) / F.sqrt(v1 / F.col("n1") + v2 / F.col("n2"))
    return w.select("n1", "n2", F.round(t, 6).alias("t_stat"))


@query(
    "events_welch_ttest",
    oracle=WELCH_ORACLE,
    doc="Welch's unequal-variance t statistic comparing click vs view "
        "event values: group sums and sums-of-squares accumulate in "
        "exact integer cents (value has 2 decimals, so x*100 is "
        "integral) as DECIMAL(38,0) — BIGINT moments had only ~21x "
        "data headroom before n*ss - s^2 wrapped silently (round-9 "
        "fix; oracle mirrors with HUGEINT) — then ONE double "
        "expression — identical operation "
        "tree on both engines, so IEEE arithmetic is bit-reproducible "
        "— forms the statistic. t is scale-invariant, so the cents "
        "encoding needs no de-scaling (round-8 review fix: a spurious "
        "/100 had shrunk the reported t 100x on both engines at once). "
        "Completes the two-sample testing family (Mann-Whitney and KS "
        "are rank/distribution tests; Welch is the parametric "
        "mean-difference test an A/B readout leads with). One "
        "hash-agg shuffle of 2 groups; scale-indifferent.",
)
def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return welch_t_from_moments(
        welch_cents_moments(load_events(spark, sf_dir))
    )
