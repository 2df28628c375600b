"""Relational-surface and statistical-audit queries.

Covers engine surfaces the rest of the catalog exercises only
implicitly: native ``RelationalGroupedDataset.pivot`` with an explicit
value list, native ``DataFrame.unpivot`` (melt), SQL correlated
``LATERAL`` subqueries with per-group LIMIT, plus statistics a data
platform audits with: Benford first-digit fraud screening, a
two-sample Kolmogorov-Smirnov distribution drift test, winsorized
robust moments, l-diversity (the privacy audit that complements
customer_k_anonymity), stratified systematic sampling, and lag-k
autocorrelation of event arrival series.

Every oracle follows the registry conventions: identical aliases,
round() on double outputs, BIGINT casts over DuckDB HUGEINT sums,
deterministic ORDER BY under every LIMIT.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from advanced_strapi_import_spark.plans.registry import (
    load,
    load_events,
    query,
)

# ---------------------------------------------------------------------------
# native pivot (explicit value list)
# ---------------------------------------------------------------------------

_STATUSES = ["O", "F", "P"]


@query(
    "orders_pivot_year_status",
    oracle="""
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       CAST(coalesce(count(*) FILTER (WHERE o_orderstatus = 'O'), 0) AS BIGINT) AS n_o,
       round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 0.0), 2) AS rev_o,
       CAST(coalesce(count(*) FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT) AS n_f,
       round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0.0), 2) AS rev_f,
       CAST(coalesce(count(*) FILTER (WHERE o_orderstatus = 'P'), 0) AS BIGINT) AS n_p,
       round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 0.0), 2) AS rev_p
FROM orders GROUP BY year(o_orderdate)
""",
    doc="Native pivot with an EXPLICIT value list (.pivot(col, values)): "
        "order count + revenue per year x order-status. The explicit "
        "list matters at scale — without it Spark runs an extra "
        "collect-distinct job over the full table just to discover the "
        "columns; with it the pivot is a single map-side-combinable "
        "aggregate. Absent (year, status) cells surface as NULL from "
        "the pivot and are coalesced to 0 to match the FILTER oracle.",
)
def orders_pivot_year_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    pv = (
        o.groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .pivot("o_orderstatus", _STATUSES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
    )
    cols = [F.col("yr")]
    for s in _STATUSES:
        cols.append(F.coalesce(F.col(f"{s}_n"), F.lit(0)).cast("long").alias(f"n_{s.lower()}"))
        cols.append(F.coalesce(F.col(f"{s}_rev"), F.lit(0.0)).alias(f"rev_{s.lower()}"))
    return pv.select(*cols)


# ---------------------------------------------------------------------------
# native unpivot (melt)
# ---------------------------------------------------------------------------

_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "lineitem_unpivot_measures",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{m}' AS measure, CAST(count({m}) AS BIGINT) AS n,
       round(sum({m}), 2) AS total, round(avg({m}), 4) AS mean,
       round(min({m}), 2) AS mn, round(max({m}), 2) AS mx FROM lineitem"""
        for m in _MEASURES
    ),
    doc="Native DataFrame.unpivot (melt): four numeric lineitem measures "
        "go long-form (measure, val) in one scan — the shape that feeds "
        "generic per-metric profiling without N separate aggregates. "
        "The unpivot itself is zero-shuffle (a row-local generate); the "
        "only exchange is the 4-key aggregate that follows. Oracle is "
        "the engine-portable UNION ALL expansion.",
)
def lineitem_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot([], _MEASURES, "measure", "val")
    return (
        long.groupBy("measure")
        .agg(
            F.count("val").cast("long").alias("n"),
            F.round(F.sum("val"), 2).alias("total"),
            F.round(F.avg("val"), 4).alias("mean"),
            F.round(F.min("val"), 2).alias("mn"),
            F.round(F.max("val"), 2).alias("mx"),
        )
    )


# ---------------------------------------------------------------------------
# SQL correlated LATERAL subquery with per-group LIMIT
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT b.p_brand, t.p_partkey, t.p_retailprice
FROM (SELECT DISTINCT p_brand FROM part) b,
LATERAL (
  SELECT p_partkey, p_retailprice FROM part p
  WHERE p.p_brand = b.p_brand
  ORDER BY p_retailprice DESC, p_partkey
  LIMIT 3
) t
"""


@query(
    "part_lateral_topk",
    oracle=_LATERAL_SQL,
    doc="Correlated LATERAL subquery with per-group ORDER BY + LIMIT "
        "(top-3 priciest parts per brand) — the SQL-standard spelling "
        "of grouped top-k. Spark's DecorrelateInnerQuery rewrites it to "
        "a partitioned rank filter, so the physical plan is the same "
        "scale-safe shape as the window-function variant "
        "(topk_orders_per_cust): no per-brand re-scan, no driver loop. "
        "Identical SQL runs on DuckDB as the oracle.",
)
def part_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# Benford first-digit screening
# ---------------------------------------------------------------------------

# Expected Benford shares embedded as identical literals on both sides so
# the comparison arithmetic starts from bit-equal operands.
_BENFORD = {d: round(math.log10(1.0 + 1.0 / d), 6) for d in range(1, 10)}


@query(
    "orders_benford",
    oracle=f"""
WITH digits AS (
  SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS digit
  FROM orders WHERE o_totalprice >= 1),
obs AS (
  SELECT digit, count(*) AS n FROM digits GROUP BY digit),
tot AS (SELECT sum(n) AS total FROM obs),
exp AS (
  SELECT digit, CAST(exp_share AS DOUBLE) AS exp_share
  FROM (VALUES {", ".join(f"('{d}', {v})" for d, v in _BENFORD.items())})
  AS t(digit, exp_share))
SELECT e.digit, CAST(coalesce(o.n, 0) AS BIGINT) AS n,
       round(coalesce(o.n, 0) * 1.0 / t.total, 6) AS obs_share,
       e.exp_share,
       round(abs(coalesce(o.n, 0) * 1.0 / t.total - e.exp_share), 6) AS abs_dev,
       round(pow(coalesce(o.n, 0) * 1.0 / t.total - e.exp_share, 2) / e.exp_share, 8)
         AS chi2_term
FROM exp e LEFT JOIN obs o ON o.digit = e.digit CROSS JOIN tot t
""",
    doc="Benford's-law first-digit screen over order totals — the "
        "classic financial-data fraud/quality audit. First digit is "
        "extracted in exact integer/string domain (floor -> BIGINT -> "
        "first char) rather than floor(log10) so no cross-engine libm "
        "boundary can flip a digit. Expected shares are plan literals "
        "(same bits both sides). One map-side-combinable 9-group "
        "aggregate + a 9x1 broadcast join: scan-bound at 100 TB.",
)
def orders_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.operators.stats import first_digit

    o = load(spark, sf_dir, "orders")
    obs = (
        o.filter(F.col("o_totalprice") >= 1)
        .select(first_digit(F.col("o_totalprice")).alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from advanced_strapi_import_spark.operators.similarity import _local_df

    exp = _local_df(
        spark,
        [(str(d), v) for d, v in _BENFORD.items()],
        "digit string, exp_share double",
    )
    total = obs.agg(F.sum("n").alias("total"))
    n = F.coalesce("n", F.lit(0))
    share = n * F.lit(1.0) / F.col("total")
    return (
        exp.join(F.broadcast(obs), "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            n.cast("long").alias("n"),
            F.round(share, 6).alias("obs_share"),
            "exp_share",
            F.round(F.abs(share - F.col("exp_share")), 6).alias("abs_dev"),
            F.round(
                F.pow(share - F.col("exp_share"), 2) / F.col("exp_share"), 8
            ).alias("chi2_term"),
        )
    )


# ---------------------------------------------------------------------------
# two-sample Kolmogorov-Smirnov drift test
# ---------------------------------------------------------------------------


@query(
    "events_ks_test",
    oracle="""
WITH pts AS (
  SELECT value,
         count(*) FILTER (WHERE event_type = 'click') AS c1,
         count(*) FILTER (WHERE event_type = 'view') AS c2
  FROM events
  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
  GROUP BY value),
tot AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM pts),
cum AS (
  SELECT sum(c1) OVER (ORDER BY value) AS s1,
         sum(c2) OVER (ORDER BY value) AS s2
  FROM pts)
SELECT round(max(abs(s1 * 1.0 / t.n1 - s2 * 1.0 / t.n2)), 6) AS ks_stat,
       round(sqrt(t.n1 * 1.0 * t.n2 / (t.n1 + t.n2))
             * max(abs(s1 * 1.0 / t.n1 - s2 * 1.0 / t.n2)), 4) AS ks_scaled,
       CAST(t.n1 AS BIGINT) AS n1, CAST(t.n2 AS BIGINT) AS n2
FROM cum CROSS JOIN tot t GROUP BY t.n1, t.n2
""",
    doc="Two-sample Kolmogorov-Smirnov statistic between the value "
        "distributions of two event types — the standard drift test "
        "between a reference and a candidate data slice. ECDFs are "
        "built from exact integer cumulative counts over the grouped "
        "value domain (RANGE window frames give identical tie handling "
        "in both engines; NULL values are filtered — Spark and DuckDB "
        "order NULLs to opposite ends), so the max|F1-F2| arithmetic "
        "starts from bit-equal operands. Divisions go through "
        "try_divide and the n1*n2 product is widened to double before "
        "multiplying (ANSI mode would otherwise hard-error on an "
        "empty side or a >2^63 product where DuckDB yields NULL / "
        "HUGEINT). The value-domain groupBy collapses 100 TB of rows "
        "to the distinct-value set before any window runs; the "
        "single-partition ordered window is over that collapsed set "
        "(same caveat class as events_median_mad, documented there).",
)
def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.operators.stats import ks_two_sample

    e = load_events(spark, sf_dir)
    return ks_two_sample(e, "value", "event_type", "click", "view")


# ---------------------------------------------------------------------------
# winsorized robust moments
# ---------------------------------------------------------------------------


@query(
    "events_winsorized_stats",
    oracle="""
WITH cuts AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type),
w AS (
  SELECT e.event_type, e.value,
         least(greatest(e.value, c.lo), c.hi) AS wval
  FROM events e JOIN cuts c ON c.event_type = e.event_type)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(avg(value), 2) AS raw_mean,
       round(avg(wval), 2) AS win_mean,
       round(stddev_samp(wval), 2) AS win_std
FROM w GROUP BY event_type
""",
    doc="Winsorized moments per event type: clamp values to the exact "
        "[p05, p95] band (Spark `percentile` == DuckDB `quantile_cont`, "
        "both linear interpolation over identical sorted doubles), then "
        "re-aggregate. The robust-statistics complement to "
        "events_median_mad: winsorizing keeps the n of every row while "
        "bounding outlier leverage. Plan shape: a 5-row percentile "
        "aggregate broadcast back onto the fact scan — two map-side "
        "combinable aggregates, no wide shuffle of raw rows.",
)
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    cuts = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    wval = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        e.join(F.broadcast(cuts), "event_type")
        .select("event_type", "value", wval.alias("wval"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("value"), 2).alias("raw_mean"),
            F.round(F.avg("wval"), 2).alias("win_mean"),
            F.round(F.stddev_samp("wval"), 2).alias("win_std"),
        )
    )


# ---------------------------------------------------------------------------
# l-diversity privacy audit
# ---------------------------------------------------------------------------


@query(
    "customer_l_diversity",
    oracle="""
SELECT c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS k,
       CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS BIGINT) AS l,
       count(*) >= 10 AS k_ok,
       count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) >= 5 AS l_ok
FROM customer GROUP BY c_nationkey, c_mktsegment
""",
    doc="l-diversity audit over the (nation, segment) quasi-identifier: "
        "k-anonymity (customer_k_anonymity) bounds re-identification by "
        "group size alone, but a group where every member shares the "
        "same sensitive value still leaks it — l-diversity additionally "
        "requires >= l distinct sensitive values (here: account-balance "
        "kilobuckets) per QI group. One map-side-combinable aggregate "
        "with a distinct-count expansion on the QI keys; at 100 TB the "
        "distinct is bounded by the bucket domain, not row count.",
)
def customer_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    bucket = F.floor(F.col("c_acctbal") / 1000).cast("long")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.countDistinct(bucket).cast("long").alias("l"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "k",
            "l",
            (F.col("k") >= 10).alias("k_ok"),
            (F.col("l") >= 5).alias("l_ok"),
        )
    )


# ---------------------------------------------------------------------------
# stratified systematic sampling
# ---------------------------------------------------------------------------

_SYS_K = 50


@query(
    "sample_systematic",
    oracle=f"""
WITH h AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT AS hk
  FROM orders),
r AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         row_number() OVER (PARTITION BY o_orderstatus ORDER BY hk, o_orderkey) AS rn
  FROM h)
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM r WHERE rn % {_SYS_K} = 1
""",
    doc="Stratified systematic sampling: within each order-status "
        "stratum, rows are ordered by a portable md5 hash (decorrelates "
        "the walk from insertion order) and every {k}-th row is kept — "
        "exact ceil(n_s/{k}) sample size per stratum, unlike Bernoulli "
        "sampling's binomial jitter (sample_stratified) or hash-mod "
        "splits (corpus_hash_split). The rank window is PARTITIONED by "
        "stratum — the scale-safe per-group form, never a global "
        "single-partition row_number.".replace("{k}", str(_SYS_K)),
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.operators.dedup import hash32

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("hk", "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            hash32(F.col("o_orderkey").cast("string")).alias("hk"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") % _SYS_K == 1)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# lag-k autocorrelation of arrival series
# ---------------------------------------------------------------------------


@query(
    "events_autocorr",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)),
span AS (
  SELECT event_type, min(hr) AS h0, max(hr) AS h1
  FROM hourly GROUP BY event_type),
spine AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
  FROM span),
filled AS (
  SELECT s.event_type, s.hr, coalesce(h.n, 0) AS n
  FROM spine s LEFT JOIN hourly h
    ON h.event_type = s.event_type AND h.hr = s.hr),
lagged AS (
  SELECT event_type, n,
         lag(n, 1) OVER (PARTITION BY event_type ORDER BY hr) AS n_lag1,
         lag(n, 24) OVER (PARTITION BY event_type ORDER BY hr) AS n_lag24
  FROM filled)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_hours,
       round(corr(n, n_lag1), 4) AS acf_lag1,
       round(corr(n, n_lag24), 4) AS acf_lag24
FROM lagged GROUP BY event_type
""",
    doc="Lag-1 / lag-24 autocorrelation of per-type hourly arrival "
        "counts — the seasonality screen run before picking a forecast "
        "model (complements events_forecast_backtest). The hourly "
        "series is GAP-FILLED to a dense per-type hour spine first "
        "(zero-arrival hours are real observations, and without the "
        "spine lag(24) pairs hours that are not 24 clock-hours apart "
        "wherever an hour is missing). Counts are exact integers, so "
        "the Pearson inputs are bit-equal across engines; corr() is "
        "rounded to 4. The spine and lag windows run over the "
        "ALREADY-aggregated hourly series (rows = hours x types, not "
        "raw events), so the window state is tiny at any corpus scale.",
)
def events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    span = hourly.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    spine = span.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("hr"),
    )
    filled = spine.join(hourly, ["event_type", "hr"], "left").select(
        "event_type", "hr", F.coalesce("n", F.lit(0)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("hr")
    lagged = filled.select(
        "event_type",
        "n",
        F.lag("n", 1).over(w).alias("n_lag1"),
        F.lag("n", 24).over(w).alias("n_lag24"),
    )
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.round(F.corr("n", "n_lag1"), 4).alias("acf_lag1"),
        F.round(F.corr("n", "n_lag24"), 4).alias("acf_lag24"),
    )


# ---------------------------------------------------------------------------
# recursive CTE hierarchy traversal
# ---------------------------------------------------------------------------

_HIERARCHY_SQL = """
WITH RECURSIVE anc(node, anc, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT a.node, CAST(floor(a.anc / 2) AS BIGINT), a.depth + 1
  FROM anc a WHERE a.anc > 1
),
chain AS (
  SELECT node, max(depth) AS depth FROM anc GROUP BY node)
SELECT depth, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(min(node) AS BIGINT) AS min_key,
       CAST(max(node) AS BIGINT) AS max_key
FROM chain GROUP BY depth
"""


@query(
    "customer_hierarchy_depth",
    oracle=_HIERARCHY_SQL,
    doc="Recursive CTE hierarchy walk (WITH RECURSIVE, new engine "
        "surface in Spark 4): every customer climbs a synthetic "
        "binary-tree org chart (parent = key / 2, root = 1) to the "
        "root, and the chain lengths are aggregated into a depth "
        "histogram — the org-chart / bill-of-materials traversal no "
        "single join can express. Each recursion level is one "
        "self-join whose frontier SHRINKS (rows retire when they hit "
        "the root), so total work is O(n log n) rows across ~log2(max "
        "key) bounded iterations — no unbounded fixpoint risk. DuckDB "
        "executes the identical recursive SQL as the oracle.",
)
def customer_hierarchy_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_HIERARCHY_SQL)


# ---------------------------------------------------------------------------
# SQL UNPIVOT syntax (round 5) — the SQL twin of DataFrame.unpivot above
# ---------------------------------------------------------------------------

_UNPIVOT_SQL = """
SELECT l_returnflag, measure,
       CAST(count(val) AS BIGINT) AS n,
       round(avg(val), 4) AS mean
FROM lineitem
UNPIVOT (val FOR measure IN (l_quantity, l_discount, l_tax))
GROUP BY l_returnflag, measure
"""


@query(
    "lineitem_unpivot_sql",
    oracle="\nUNION ALL\n".join(
        f"""SELECT l_returnflag, '{m}' AS measure,
       CAST(count({m}) AS BIGINT) AS n, round(avg({m}), 4) AS mean
FROM lineitem GROUP BY l_returnflag"""
        for m in ["l_quantity", "l_discount", "l_tax"]
    ),
    doc="SQL UNPIVOT syntax (Spark 3.4+/4.x parser surface — the SQL "
        "twin of lineitem_unpivot_measures' DataFrame.unpivot): three "
        "measures go long-form per return flag in one scan; the melt "
        "is a row-local generate, the only exchange is the (flag, "
        "measure) aggregate. Oracle is the engine-portable UNION ALL "
        "expansion (DuckDB's UNPIVOT binds names differently, so the "
        "expansion doubles as the semantic spec: UNPIVOT drops NULL "
        "measure values, hence count(val) == count(measure_col)).",
)
def lineitem_unpivot_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_UNPIVOT_SQL)


# ---------------------------------------------------------------------------
# listagg WITHIN GROUP (round 5) — new built-in in Spark 4.0
# ---------------------------------------------------------------------------

_LISTAGG_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       listagg(CAST(o_orderkey AS STRING), ',')
           WITHIN GROUP (ORDER BY o_orderkey) AS keys_csv
FROM orders
WHERE o_orderkey % 400 = 0
GROUP BY o_orderpriority
"""


@query(
    "orders_listagg",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
           AS keys_csv
FROM orders
WHERE o_orderkey % 400 = 0
GROUP BY o_orderpriority
""",
    doc="listagg(...) WITHIN GROUP (ORDER BY ...) — the ISO ordered "
        "string aggregation added as a built-in in Spark 4.0 (DuckDB "
        "spells it string_agg(expr, sep ORDER BY ...)). The WITHIN "
        "GROUP order makes the concatenation deterministic — an "
        "unordered listagg would be partition-order-dependent and "
        "unreproducible across runs, let alone engines. Input is "
        "key-sampled so group payloads stay bounded; at scale listagg "
        "output length is the thing to cap (it concatenates a whole "
        "group into ONE row) — sample, limit per group, or use "
        "collect_list + slice when the group can be hot.",
)
def orders_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LISTAGG_SQL)


# ---------------------------------------------------------------------------
# max_by / min_by with a composite tie-broken key (round 5)
# ---------------------------------------------------------------------------


@query(
    "events_extreme_users",
    oracle="""
SELECT event_type,
       CAST(max_u AS BIGINT) AS max_user,
       round(max_v, 2) AS max_value,
       CAST(min_u AS BIGINT) AS min_user,
       round(min_v, 2) AS min_value
FROM (
  SELECT event_type,
         first(user_id ORDER BY value DESC, event_id DESC) AS max_u,
         first(value   ORDER BY value DESC, event_id DESC) AS max_v,
         first(user_id ORDER BY value ASC,  event_id ASC)  AS min_u,
         first(value   ORDER BY value ASC,  event_id ASC)  AS min_v
  FROM events GROUP BY event_type)
""",
    doc="max_by/min_by with a STRUCT key (value, event_id): who produced "
        "the single largest / smallest event value per type — the "
        "argmax aggregate that replaces a window + rn=1 filter with one "
        "map-side-combinable agg (no per-group sort materialization; "
        "at 100 TB the window form shuffles and sorts every row, "
        "max_by carries one candidate per partition). The struct key "
        "makes ties impossible (event_id is unique), which is what "
        "lets an ORDER-BY-first oracle pin the exact same row.",
)
def events_extreme_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.expr("max_by(user_id, struct(value, event_id))")
        .cast("long")
        .alias("max_user"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.expr("min_by(user_id, struct(value, event_id))")
        .cast("long")
        .alias("min_user"),
        F.round(F.min("value"), 2).alias("min_value"),
    )


# ---------------------------------------------------------------------------
# fact-scale exact deciles via distributed_ntile (round 5)
# ---------------------------------------------------------------------------


@query(
    "lineitem_price_deciles",
    oracle="""
SELECT decile,
       CAST(count(*) AS BIGINT) AS n,
       round(min(l_extendedprice), 2) AS lo,
       round(max(l_extendedprice), 2) AS hi,
       round(sum(l_extendedprice), 2) AS total
FROM (
  SELECT l_extendedprice,
         CAST(ntile(10) OVER (
             ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS INT)
             AS decile
  FROM lineitem)
GROUP BY decile
""",
    doc="Exact value deciles over the FACT table (not an aggregate "
        "domain) via skew.distributed_ntile: range repartition + "
        "partition-local row_number + broadcast partition-count "
        "offsets reproduce ntile(10) with NO single-partition sort — "
        "the single-partition window form is the canonical 100 TB "
        "failure (every lineitem row through one task). Tie-break "
        "(price, orderkey, linenumber) is a total order, so the "
        "assignment is deterministic and the SQL-window oracle pins "
        "it exactly. Decile summary stats land in a 10-row frame.",
)
def lineitem_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.operators.skew import distributed_ntile

    li = load(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    dec = distributed_ntile(
        li, 10, ["l_extendedprice", "l_orderkey", "l_linenumber"],
        out_col="decile",
    )
    return dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.min("l_extendedprice"), 2).alias("lo"),
        F.round(F.max("l_extendedprice"), 2).alias("hi"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"),
    )
