"""Window / time-series / analytic queries over the `events` stream
table — the batch faces of the streaming operators (SURVEY §2.8 notes
the reference is batch-only; these are the engine's beyond-parity
analytic surface: tumbling windows, sessionization, rolling frames,
per-group top-k, rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from advanced_strapi_import_spark.plans.registry import load, load_events, query

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _us(c) -> F.Column:
    """Microseconds-since-epoch for TIMESTAMP or TIMESTAMP_NTZ input.

    Parquet ``timestamp[us]`` without a timezone infers to TIMESTAMP_NTZ
    (spark.sql.parquet.inferTimestampNTZ default), which ``unix_micros``
    rejects; casting to timestamp_ltz first (UTC session tz, so the
    wall-clock value is preserved exactly) accepts both types."""
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(col.cast("timestamp_ltz"))


@query(
    "events_hourly",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS total_value,
       count(DISTINCT user_id) AS users
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    doc="Tumbling-window aggregate (batch face of the streaming hourly "
        "rollup): count/sum/distinct-users per (hour, type).",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), TS_FMT).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("users"),
        )
    )


@query(
    "events_sessionize",
    oracle="""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts, event_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM g)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
FROM s GROUP BY user_id, session_seq
""",
    doc="Gap-based sessionization (30 min): lag + cumulative-sum session "
        "ids, per-session aggregates; exact microsecond durations.",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.plans.registry import sessionize

    s = sessionize(load_events(spark, sf_dir)).withColumnRenamed(
        "sid", "session_seq"
    )
    return (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.date_format(F.min("ts"), TS_FMT).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            (_us(F.max("ts")) - _us(F.min("ts"))).alias("duration_us"),
        )
        .select("user_id", "session_seq", "session_start", "n_events", "duration_us")
    )


@query(
    "events_rolling",
    oracle="""
SELECT event_id, user_id,
       round(sum(round(value, 2)) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 2) AS roll_sum,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq
FROM events
""",
    doc="Rolling 5-row frame per user (rows-frame window): running sum + "
        "sequence number.",
)
def events_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(
            F.sum(F.round("value", 2)).over(w.rowsBetween(-4, 0)), 2
        ).alias("roll_sum"),
        F.row_number().over(w).cast("long").alias("seq"),
    )


@query(
    "topk_orders_per_cust",
    oracle="""
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
  FROM orders)
WHERE rnk <= 3
""",
    doc="Per-group top-k via ranked window (L3's limit-1 generalized).",
)
def topk_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .select(
            "o_custkey", "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"), "rnk",
        )
    )


@query(
    "lineitem_rollup",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    doc="ROLLUP grouping-sets aggregate (free in Spark; absent in the "
        "reference).",
)
def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n",
            "sum_qty",
        )
    )


@query(
    "events_type_matrix",
    oracle="""
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS clicks,
       count(*) FILTER (WHERE event_type = 'view') AS views,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
       count(*) FILTER (WHERE event_type = 'signup') AS signups,
       count(*) FILTER (WHERE event_type = 'error') AS errors
FROM events GROUP BY user_id
""",
    doc="Conditional-aggregate pivot (manual, engine-portable).",
)
def events_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)

    def cnt(t: str):
        return F.count(F.when(F.col("event_type") == t, 1))

    return e.groupBy("user_id").agg(
        cnt("click").alias("clicks"),
        cnt("view").alias("views"),
        cnt("purchase").alias("purchases"),
        cnt("signup").alias("signups"),
        cnt("error").alias("errors"),
    )


@query(
    "ci_filters",
    oracle="""
SELECT p_partkey, p_name, p_brand
FROM part
WHERE contains(lower(p_name), 'anvil') OR lower(p_brand) = lower('BRAND#13')
""",
    doc="P7/P8: case-insensitive equality ($eqi) and contains "
        "($containsi) predicates.",
)
def ci_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.lower(F.col("p_name")).contains("anvil")
        | (F.lower(F.col("p_brand")) == F.lower(F.lit("BRAND#13")))
    ).select("p_partkey", "p_name", "p_brand")


@query(
    "events_session_window",
    oracle="""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM g)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_last,
       count(*) AS n_events
FROM s GROUP BY user_id, session_seq
""",
    doc="Spark's NATIVE session_window (dynamic gap-merging windows) "
        "verified equivalent to the hand-rolled lag+cumsum "
        "sessionization (events_sessionize) — no exact-gap boundary "
        "rows exist in the data, where the two constructions' "
        "open/closed interval semantics would differ.",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.date_format(F.min("ts"), TS_FMT).alias("session_start"),
            F.date_format(F.max("ts"), TS_FMT).alias("session_last"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_last", "n_events")
    )


@query(
    "events_retention",
    oracle="""
WITH firstseen AS (
  SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS cohort_day
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         datediff('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS DATE)) AS day_offset
  FROM events e JOIN firstseen f ON f.user_id = e.user_id)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(day_offset AS INT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM activity
WHERE day_offset <= 7
GROUP BY cohort_day, day_offset
""",
    doc="Cohort retention: users bucketed by first-seen day, counted "
        "per (cohort, day-offset) for the first week. Two shuffles on "
        "user_id (first-seen agg + cohort join are co-partitioned, so "
        "the join reuses the exchange) then one on the small "
        "(cohort, offset) grid.",
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    )
    firstseen = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(firstseen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .filter(F.col("day_offset") <= 7)
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("day_offset").cast("int").alias("day_offset"),
    ).agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "events_value_distribution",
    oracle="""
SELECT event_type, user_id, round(total, 2) AS total,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 4) AS pct_rank,
       round(cume_dist() OVER w, 4) AS cum_dist
FROM (
  SELECT event_type, user_id, sum(value) AS total
  FROM events GROUP BY event_type, user_id)
WINDOW w AS (PARTITION BY event_type ORDER BY total, user_id)
""",
    doc="Ranking/distribution window functions (ntile, percent_rank, "
        "cume_dist) over per-user spend within each event type — one "
        "agg shuffle, one window sort per type partition; the ORDER BY "
        "carries user_id so ranks are total-order deterministic.",
)
def events_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    per_user = (
        load_events(spark, sf_dir)
        .groupBy("event_type", "user_id")
        .agg(F.sum("value").alias("__total"))
    )
    w = Window.partitionBy("event_type").orderBy("__total", "user_id")
    return per_user.select(
        "event_type",
        "user_id",
        F.round("__total", 2).alias("total"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cum_dist"),
    )


@query(
    "orders_rolling_range_frame",
    oracle="""
WITH o AS (
  SELECT o_custkey, o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS order_day,
         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             AS day_num,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders)
SELECT o_custkey, o_orderkey, order_day,
       round(CAST(sum(cents) OVER w AS BIGINT) / 100.0, 2) AS roll_rev_30d,
       CAST(count(*) OVER w AS BIGINT) AS roll_orders_30d
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY day_num
             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
""",
    doc="Trailing-30-day revenue per customer via a value-based RANGE "
        "frame (not ROWS): the frame spans day-number VALUES 29 back "
        "from the current row's day, so same-day orders are peers and "
        "both see the full day's total — semantics a rows-frame cannot "
        "express. Prices are fixed-pointed to BIGINT cents before the "
        "frame sum (integer addition is order-independent, so both "
        "engines agree bit-exactly regardless of peer enumeration "
        "order). One hash partition by customer + per-partition sort; "
        "no global sort, scales with the largest single customer.",
)
def orders_rolling_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("day_num"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_num")
        .rangeBetween(-29, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "order_day",
        F.round(F.sum("cents").over(w) / 100.0, 2).alias("roll_rev_30d"),
        F.count(F.lit(1)).over(w).cast("long").alias("roll_orders_30d"),
    )


@query(
    "events_ewma",
    oracle="""
WITH daily AS (
  SELECT user_id,
         datediff('day', DATE '1970-01-01', CAST(date_trunc('day', ts) AS DATE))
             AS day_num,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2),
framed AS (
  SELECT user_id, day_num, cents,
         list(struct_pack(d := day_num, v := cents / 100.0)) OVER (
             PARTITION BY user_id ORDER BY day_num
             RANGE BETWEEN 9 PRECEDING AND CURRENT ROW) AS lst
  FROM daily)
SELECT user_id, day_num,
       round(cents / 100.0, 2) AS day_value,
       round(
         list_sum(list_transform(lst,
             s -> s.v * power(CAST(0.5 AS DOUBLE), day_num - s.d)))
         / list_sum(list_transform(lst,
             s -> power(CAST(0.5 AS DOUBLE), day_num - s.d))),
         4) AS ewma
FROM framed
""",
    doc="Gap-aware exponentially-weighted moving average of per-user "
        "daily value: weight 0.5^(day gap) over a trailing 10-day "
        "RANGE frame, normalized by the weight mass actually present "
        "(irregular/gapped series stay correct — a plain recursive "
        "EWMA would need a gap-adjusted alpha). Day totals are "
        "fixed-pointed to cents (order-independent integer sums); the "
        "decay weights 0.5^k are exact binary fractions and the "
        "collect-over-frame list is frame-ordered in both engines, so "
        "the fold is bit-identical. Window HOF = collect_list over a "
        "range frame + aggregate lambda — no self-join, no explode; "
        "one user-partition sort, linear at scale.",
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_events(spark, sf_dir)
        .groupBy(
            "user_id",
            F.datediff(
                F.date_trunc("day", "ts").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("day_num"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .alias("cents")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_num")
        .rangeBetween(-9, Window.currentRow)
    )
    framed = daily.withColumn(
        "lst",
        F.collect_list(
            F.struct(
                F.col("day_num").alias("d"),
                (F.col("cents") / 100.0).alias("v"),
            )
        ).over(w),
    )
    decay = lambda s: F.pow(F.lit(0.5), F.col("day_num") - s["d"])  # noqa: E731
    num = F.aggregate(
        "lst", F.lit(0.0), lambda acc, s: acc + s["v"] * decay(s)
    )
    den = F.aggregate("lst", F.lit(0.0), lambda acc, s: acc + decay(s))
    return framed.select(
        "user_id",
        "day_num",
        F.round(F.col("cents") / 100.0, 2).alias("day_value"),
        F.round(num / den, 4).alias("ewma"),
    )


@query(
    "parts_skyline_2d",
    oracle="""
WITH p AS (
  SELECT p_partkey, p_size,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM part),
m AS (
  SELECT p_partkey, p_size, price_cents,
         max(p_size) OVER (ORDER BY price_cents
             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS best_cheaper,
         max(p_size) OVER (PARTITION BY price_cents) AS best_peer
  FROM p)
SELECT p_partkey, round(price_cents / 100.0, 2) AS price,
       CAST(p_size AS INT) AS size
FROM m
WHERE (best_cheaper IS NULL OR p_size > best_cheaper)
  AND p_size = best_peer
""",
    doc="2-D skyline (Pareto front: minimize price, maximize size) in "
        "O(n log n) via two window maxima instead of the naive "
        "quadratic dominance anti-join: a part survives iff its size "
        "strictly beats every strictly-cheaper part's best size (a "
        "RANGE frame ending 1 PRECEDING — value-based, so same-price "
        "rows are excluded from 'cheaper') and ties its own price "
        "group's best. Prices fixed-pointed to cents so the RANGE "
        "frame key and the dominance comparisons are exact integers. "
        "Scale shape: row-level work stays fully partitioned — parts "
        "first collapse to one (price, best size) row per DISTINCT "
        "price (hash shuffle), the unpartitioned running-max window "
        "runs only over that price-domain frame (bounded by distinct "
        "price points, not rows), and survivors broadcast back onto "
        "the fact scan. Equal (price, size) duplicates are both "
        "non-dominated and both kept, matching strict dominance.",
)
def parts_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        "p_size",
        F.floor(F.col("p_retailprice") * 100 + 0.5)
        .cast("long")
        .alias("price_cents"),
    )
    # per-price best size first: the single-partition window then sees
    # |distinct prices| rows, never the fact table
    pp = p.groupBy("price_cents").agg(F.max("p_size").alias("best_peer"))
    w_cheaper = (
        Window.orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    front = pp.withColumn(
        "best_cheaper", F.max("best_peer").over(w_cheaper)
    ).filter(
        F.col("best_cheaper").isNull()
        | (F.col("best_peer") > F.col("best_cheaper"))
    )
    return (
        p.join(
            F.broadcast(front.select("price_cents", "best_peer")),
            "price_cents",
        )
        .filter(F.col("p_size") == F.col("best_peer"))
        .select(
            "p_partkey",
            F.round(F.col("price_cents") / 100.0, 2).alias("price"),
            F.col("p_size").cast("int").alias("size"),
        )
    )


@query(
    "events_user_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id,
         datediff('day', DATE '1970-01-01', CAST(date_trunc('day', ts) AS DATE))
             AS day_num
  FROM events),
isl AS (
  SELECT user_id, day_num,
         day_num - row_number() OVER (PARTITION BY user_id ORDER BY day_num)
             AS island
  FROM days),
st AS (
  SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
  FROM isl GROUP BY user_id, island)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(len) AS BIGINT) AS max_streak
FROM st GROUP BY user_id
""",
    doc="Gaps-and-islands (activity streaks): consecutive active days "
        "collapse to one island via the classic day_num - row_number "
        "constant; per user the streak count, total active days and "
        "longest run — engagement metrics dashboards derive from the "
        "raw event stream. All integer arithmetic; one user-partition "
        "window plus two user-keyed aggregations reusing the same "
        "hash partitioning, no joins.",
)
def events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        load_events(spark, sf_dir)
        .select(
            "user_id",
            F.datediff(
                F.date_trunc("day", "ts").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("day_num"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_num")
    isl = days.withColumn(
        "island", F.col("day_num") - F.row_number().over(w)
    )
    st = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    return st.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("max_streak"),
    )


@query(
    "orders_cumulative_new_customers",
    oracle="""
WITH firsts AS (
  SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS first_day
  FROM orders GROUP BY o_custkey),
per_day AS (
  SELECT first_day AS day, CAST(count(*) AS BIGINT) AS n_new
  FROM firsts GROUP BY first_day),
orders_per_day AS (
  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1)
SELECT strftime(o.day, '%Y-%m-%d') AS day, o.n_orders,
       COALESCE(p.n_new, 0) AS n_new,
       CAST(sum(COALESCE(p.n_new, 0)) OVER (ORDER BY o.day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_customers
FROM orders_per_day o LEFT JOIN per_day p ON p.day = o.day
""",
    doc="First-touch acquisition curve: per order day, order volume, "
        "NEW customers (their first-ever order day) and the running "
        "total of acquired customers — the windowless 'cumulative "
        "distinct' that a window COUNT(DISTINCT) cannot express: "
        "reduce each customer to a first-occurrence event (one "
        "customer-keyed agg), then an ordinary cumulative sum. The "
        "running-sum window is unpartitioned but runs over the DAY "
        "domain (bounded by calendar span, not row count); row-level "
        "work is two hash aggs plus a day-keyed join.",
)
def orders_cumulative_new_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("day")
    )
    firsts = o.groupBy("o_custkey").agg(F.min("day").alias("first_day"))
    per_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    orders_per_day = o.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        orders_per_day.join(per_day, "day", "left")
        .withColumn("n_new", F.coalesce("n_new", F.lit(0)))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_orders",
            "n_new",
            F.sum("n_new").over(w).cast("long").alias("cum_customers"),
        )
    )


@query(
    "events_daily_peaks",
    oracle="""
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
w AS (
  SELECT day, n,
         lag(n) OVER (ORDER BY day) AS prev_n,
         lead(n) OVER (ORDER BY day) AS next_n,
         CAST(quantile_cont(n, 0.5) OVER (ORDER BY day
              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS DOUBLE)
             AS local_med
  FROM d)
SELECT strftime(day, '%Y-%m-%d') AS day, n, prev_n, next_n,
       round(local_med, 2) AS local_median,
       n * 10 >= CAST(local_med * 12 AS DOUBLE) AS prominent
FROM w
WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
  AND n > prev_n AND n > next_n
""",
    doc="Local-maxima peak detection on the daily event-count series: "
        "days strictly above both neighbors (lag/lead), annotated "
        "with the centered 7-day rolling MEDIAN (an exact "
        "interpolated percentile over a rows frame — both engines "
        "use the same (1-f)*lo + f*hi rule on identical frames) and "
        "a prominence flag n >= 1.2 x local median evaluated as the "
        "integer cross-product n*10 >= med*12 so the threshold "
        "cannot float-drift. The traffic-spike screen feeding "
        "anomaly triage; the window runs over the DAY domain "
        "(calendar-bounded), row-level data reduces in one "
        "aggregation.",
)
def events_daily_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_events(spark, sf_dir)
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.orderBy("day")
    wf = w.rowsBetween(-3, 3)
    med = F.expr("percentile(n, 0.5)").over(wf).cast("double")
    out = d.select(
        "day",
        "n",
        F.lag("n").over(w).alias("prev_n"),
        F.lead("n").over(w).alias("next_n"),
        med.alias("local_med"),
    )
    return (
        out.filter(
            F.col("prev_n").isNotNull()
            & F.col("next_n").isNotNull()
            & (F.col("n") > F.col("prev_n"))
            & (F.col("n") > F.col("next_n"))
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            "prev_n",
            "next_n",
            F.round("local_med", 2).alias("local_median"),
            (
                F.col("n") * 10
                >= (F.col("local_med") * 12).cast("double")
            ).alias("prominent"),
        )
    )


@query(
    "customer_rfm_migration",
    oracle="""
WITH mid AS (SELECT TIMESTAMP '1995-06-01 00:00:00' AS cut),
p1 AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders, mid WHERE o_orderdate < mid.cut GROUP BY o_custkey),
p2 AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders, mid WHERE o_orderdate >= mid.cut GROUP BY o_custkey),
q1 AS (
  SELECT o_custkey,
         CAST(ntile(5) OVER (ORDER BY cents, o_custkey) AS INT) AS quintile
  FROM p1),
q2 AS (
  SELECT o_custkey,
         CAST(ntile(5) OVER (ORDER BY cents, o_custkey) AS INT) AS quintile
  FROM p2)
SELECT coalesce(q1.quintile, 0) AS from_quintile,
       coalesce(q2.quintile, 0) AS to_quintile,
       CAST(count(*) AS BIGINT) AS n_customers
FROM q1 FULL OUTER JOIN q2 ON q1.o_custkey = q2.o_custkey
GROUP BY 1, 2
""",
    doc="Customer value-segment migration matrix: spend quintiles in "
        "the first half of the window vs the second (quintiles over "
        "exact cents with customer-id tie-break — fully "
        "deterministic), full-outer joined so churned (to 0) and "
        "newly-acquired (from 0) customers appear as their own "
        "matrix border — the segment-flow report behind retention "
        "planning. Quintiles come from skew.distributed_ntile — a "
        "range-repartitioned rank with broadcast partition offsets, "
        "exactly matching the SQL ntile contract with NO single-"
        "partition window (the per-customer aggregate is customer-"
        "cardinality, which at 100 TB is billions of rows). "
        "One customer-key full-outer join of two slim frames.",
)
def customer_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.operators.skew import distributed_ntile

    o = load(spark, sf_dir, "orders")
    cut = "1995-06-01 00:00:00"
    cents = F.sum(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    ).cast("long")
    p1 = (
        o.filter(F.col("o_orderdate") < F.lit(cut).cast("timestamp"))
        .groupBy("o_custkey")
        .agg(cents.alias("cents"))
    )
    p2 = (
        o.filter(F.col("o_orderdate") >= F.lit(cut).cast("timestamp"))
        .groupBy("o_custkey")
        .agg(cents.alias("cents"))
    )
    q1 = distributed_ntile(
        p1, 5, ["cents", "o_custkey"], out_col="q1"
    ).select("o_custkey", "q1")
    q2 = distributed_ntile(
        p2, 5, ["cents", "o_custkey"], out_col="q2"
    ).select("o_custkey", "q2")
    return (
        q1.join(q2, "o_custkey", "full_outer")
        .groupBy(
            F.coalesce("q1", F.lit(0)).alias("from_quintile"),
            F.coalesce("q2", F.lit(0)).alias("to_quintile"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )
