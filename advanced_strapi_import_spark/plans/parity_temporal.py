"""Temporal-join and date-parsing parity queries: as-of join (checked
against DuckDB's native ASOF JOIN), bucketed interval join, the lenient
date-parse ladder (F4), and iterative duplicate clustering (value-checked
against a WITH RECURSIVE reachability oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from advanced_strapi_import_spark.functions import casts as C
from advanced_strapi_import_spark.operators import dedup as D
from advanced_strapi_import_spark.operators import temporal as T
from advanced_strapi_import_spark.plans.registry import load, load_events, query


@query(
    "events_asof_join",
    oracle="""
SELECT l.event_id, l.user_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       r.value AS last_purchase
FROM events l
ASOF LEFT JOIN (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
) r ON l.user_id = r.user_id AND r.ts <= l.ts
""",
    doc="As-of join (Spark lacks it natively): union-tag + last-ignorenulls "
        "window — one shuffle by key, no range blow-up; oracle is DuckDB's "
        "native ASOF JOIN.",
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("last_purchase")
    )
    left = e.select("event_id", "user_id", "ts")
    out = T.asof_join(
        left, purchases, on="ts", by="user_id", value_cols=["last_purchase"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "last_purchase",
    )


@query(
    "events_interval_join",
    oracle="""
WITH iv AS (
  SELECT event_id AS interval_id,
         ts AS start_ts,
         ts + INTERVAL 2 HOUR AS end_ts
  FROM events WHERE event_id % 500 = 0)
SELECT e.event_id, iv.interval_id
FROM events e JOIN iv
  ON e.ts >= iv.start_ts AND e.ts <= iv.end_ts
""",
    doc="Interval (range) join via bucketed equi-join + exact predicate "
        "— the scale form of an inequality join. Intervals are 2-hour "
        "windows anchored at every 500th event, so matches are "
        "guaranteed dense (the orders-derived variant matched on an "
        "empty result).",
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    iv = load_events(spark, sf_dir).filter(F.col("event_id") % 500 == 0).select(
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    out = T.interval_join(
        e.select("event_id", "ts"), iv, point_ts="ts",
        start_ts="start_ts", end_ts="end_ts",
    )
    return out.select("event_id", "interval_id")


@query(
    "date_parse_ladder",
    oracle="""
WITH src AS (
  SELECT o_orderkey AS k,
         CASE o_orderkey % 4
           WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')
           WHEN 1 THEN strftime(o_orderdate, '%-m/%-d/%Y')
           WHEN 2 THEN strftime(o_orderdate, '%Y-%m-%d')
           ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') END AS raw
  FROM orders)
SELECT k, raw,
       strftime(coalesce(
         try_strptime(raw, '%Y-%m-%dT%H:%M:%S'),
         try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
         try_strptime(raw, '%Y-%m-%d'),
         try_strptime(raw, '%-m/%-d/%Y')
       ), '%Y-%m-%dT%H:%M:%S') || '.000Z' AS iso
FROM src
""",
    doc="F4: the JS new Date() lenient-parse ladder -> toISOString shape, "
        "across 4 input formats.",
)
def date_parse_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.plans.registry import fan_out

    # fan_out: the 4-format regexp parse ladder per row would serialize
    # on the 1-split orders scan
    o = fan_out(load(spark, sf_dir, "orders"))
    k = F.col("o_orderkey")
    src = o.select(
        k.alias("k"),
        F.when(k % 4 == 0, F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss"))
        .when(k % 4 == 1, F.date_format("o_orderdate", "M/d/yyyy"))
        .when(k % 4 == 2, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
        .alias("raw"),
    )
    return src.select(
        "k", "raw", C.to_iso_string(C.parse_date_lenient(F.col("raw"))).alias("iso")
    )


def _clusters_oracle() -> str:
    """Exact connected components in SQL: WITH RECURSIVE transitive
    reachability over the candidate graph, then min reachable id per
    node — a VALUE-level oracle for the iterative Spark operator
    (tractable because dup clusters are small; the recursion
    materializes node x component rows)."""
    from advanced_strapi_import_spark.plans import parity_ml as ML

    return f"""
WITH RECURSIVE {ML._CORPUS_SQL.strip()},
{ML._SHINGLES_SQL.strip()},
{ML._minhash_sig_sql()},
{ML._bands_sql()},
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band_hash = b.band_hash AND a.id < b.id),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM cand
  UNION SELECT id_b, id_a FROM cand),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach AS (
  SELECT id AS v, id AS u FROM nodes
  UNION
  SELECT r.v, e.dst FROM reach r JOIN edges e ON e.src = r.u)
SELECT v AS id, min(u) AS cluster FROM reach GROUP BY v
"""


@query(
    "dedup_clusters",
    oracle=_clusters_oracle(),
    doc="Duplicate clustering: iterative min-label propagation (connected "
        "components) over the MinHash-LSH candidate graph — turns pair "
        "verdicts into keep/drop groups. Oracle: WITH RECURSIVE "
        "transitive reachability + min() — exact value-level check.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.plans.parity_ml import _shared_bands

    pairs = D.lsh_candidate_pairs(_shared_bands(spark, sf_dir))
    return D.connected_components(pairs)


@query(
    "events_asof_forward",
    oracle="""
SELECT l.event_id, l.user_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       r.value AS next_purchase
FROM events l
ASOF LEFT JOIN (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
) r ON l.user_id = r.user_id AND r.ts >= l.ts
""",
    doc="Forward as-of join: the NEXT purchase at or after each event "
        "(exact matches included, pandas merge_asof semantics) — same "
        "union-tag plan with the time order reversed.",
)
def events_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("next_purchase")
    )
    left = e.select("event_id", "user_id", "ts")
    out = T.asof_join(
        left, purchases, on="ts", by="user_id",
        value_cols=["next_purchase"], direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "next_purchase",
    )


def _keep_best_oracle() -> str:
    """Clusters oracle extended to the keep decision: every corpus doc
    joins its component (own id when unclustered), then the keeper per
    cluster is the longest text with min-id tie-break."""
    from advanced_strapi_import_spark.plans import parity_ml as ML

    return f"""
WITH RECURSIVE {ML._CORPUS_SQL.strip()},
{ML._SHINGLES_SQL.strip()},
{ML._minhash_sig_sql()},
{ML._bands_sql()},
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band_hash = b.band_hash AND a.id < b.id),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM cand
  UNION SELECT id_b, id_a FROM cand),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach AS (
  SELECT id AS v, id AS u FROM nodes
  UNION
  SELECT r.v, e.dst FROM reach r JOIN edges e ON e.src = r.u),
cc AS (SELECT v AS id, min(u) AS cluster FROM reach GROUP BY v),
labeled AS (
  SELECT c.id, coalesce(cc.cluster, c.id) AS cluster,
         length(c.text) AS n_chars
  FROM corpus c LEFT JOIN cc ON cc.id = c.id)
SELECT id, cluster, CAST(n_chars AS BIGINT) AS n_chars,
       (row_number() OVER (
          PARTITION BY cluster ORDER BY n_chars DESC, id ASC) = 1
       ) AS is_kept
FROM labeled
"""


@query(
    "dedup_keep_best",
    oracle=_keep_best_oracle(),
    doc="The dedup deliverable: every corpus doc labeled with its "
        "duplicate cluster (own id when unclustered) and a keep/drop "
        "verdict — keeper = longest text, min-id tie-break. LSH "
        "candidates -> connected components -> quality argmax; at "
        "100 TB this emits the keep list a curation pipeline actually "
        "writes, not pairs.",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from advanced_strapi_import_spark.plans.parity_ml import _corpus, _shared_bands

    corpus = _corpus(spark, sf_dir)
    pairs = D.lsh_candidate_pairs(_shared_bands(spark, sf_dir))
    cc = D.connected_components(pairs)
    labeled = (
        corpus.join(cc.withColumnRenamed("cluster", "__cc"), "id", "left")
        .select(
            "id",
            F.coalesce(F.col("__cc"), F.col("id")).alias("cluster"),
            F.length("text").cast("long").alias("n_chars"),
        )
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("n_chars").desc(), F.col("id").asc()
    )
    return labeled.select(
        "id", "cluster", "n_chars",
        (F.row_number().over(w) == 1).alias("is_kept"),
    )


@query(
    "dedup_cluster_stats",
    oracle=_clusters_oracle().rstrip().rsplit("SELECT v AS id", 1)[0] + """
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
       CAST(count(*) * (cluster_size - 1) AS BIGINT) AS n_dropped
FROM (
  SELECT cluster, count(*) AS cluster_size FROM (
    SELECT v AS id, min(u) AS cluster FROM reach GROUP BY v)
  GROUP BY cluster)
GROUP BY cluster_size
""",
    doc="Duplicate-cluster size distribution — the dedup observability "
        "readout (how much boilerplate, how big the worst family): "
        "connected components over the LSH candidate graph rolled up to "
        "(cluster_size, n_clusters, n_docs, n_dropped) where n_dropped "
        "is the keep-one-per-cluster deletion count. Two tiny "
        "aggregations after CC; a size histogram is what a 100 TB "
        "dedup job actually reports, not the raw pair list.",
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.plans.parity_ml import _shared_bands

    pairs = D.lsh_candidate_pairs(_shared_bands(spark, sf_dir))
    cc = D.connected_components(pairs)
    sizes = cc.groupBy("cluster").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).cast("long").alias("n_docs"),
        (F.count(F.lit(1)) * (F.col("cluster_size") - 1)).cast("long").alias("n_dropped"),
    ).select(
        F.col("cluster_size").cast("long").alias("cluster_size"),
        "n_clusters", "n_docs", "n_dropped",
    )


@query(
    "lineitem_kaplan_meier",
    oracle="""
WITH obs AS (
  SELECT l.l_returnflag AS flag,
         datediff('day', CAST(o.o_orderdate AS DATE),
                  CAST(l.l_shipdate AS DATE)) AS t,
         CASE WHEN l.l_linestatus = 'F' THEN 1 ELSE 0 END AS ev
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE datediff('day', CAST(o.o_orderdate AS DATE),
                 CAST(l.l_shipdate AS DATE)) >= 0),
per_t AS (
  SELECT flag, CAST(t AS BIGINT) AS t,
         CAST(sum(ev) AS BIGINT) AS d,
         CAST(count(*) - sum(ev) AS BIGINT) AS c
  FROM obs GROUP BY flag, t),
n0 AS (SELECT flag, CAST(sum(d + c) AS BIGINT) AS n FROM per_t GROUP BY flag),
risk AS (
  SELECT p.flag, p.t, p.d,
         n0.n - CAST(coalesce(sum(p.d + p.c) OVER (
             PARTITION BY p.flag ORDER BY p.t
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
  FROM per_t p JOIN n0 ON n0.flag = p.flag),
km AS (
  SELECT flag, t, d, n_risk,
         CASE WHEN min((n_risk - d) * 1.0 / n_risk) OVER win = 0 THEN 0.0
              ELSE exp(sum(ln(CASE WHEN n_risk - d > 0
                                   THEN (n_risk - d) * 1.0 / n_risk
                                   ELSE 1 END)) OVER win)
         END AS s
  FROM risk
  WINDOW win AS (PARTITION BY flag ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT flag, t, n_risk, d, round(s, 6) + 0.0 AS survival
FROM km WHERE d > 0
""",
    doc="Kaplan-Meier survival estimator for time-to-ship per return "
        "flag, with open lines (l_linestatus = 'O') as right-censored "
        "observations — the product-limit curve behind "
        "time-to-conversion / churn / SLA analyses, here on the only "
        "duration the synthetic schema carries (negative synthetic "
        "delays are excluded up front). At-risk counts come from an "
        "EXCLUSIVE cumulative sum of (events + censored) per flag; "
        "the product-limit is exp(cumsum(ln(1 - d/n))) over the "
        "frame-ordered event times (identical fold order in both "
        "engines), with a windowed-min guard so a zero factor pins "
        "the curve to exactly 0 instead of feeding ln(0) (Spark "
        "ln(0) is NULL, DuckDB -inf — the guard keeps both engines "
        "off that path). One shuffle to (flag, day) cells, windows "
        "over the per-day frame — row count never enters the "
        "windowed stage.",
)
def lineitem_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    t = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    obs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_returnflag").alias("flag"),
            t.alias("t"),
            F.when(F.col("l_linestatus") == "F", 1).otherwise(0).alias("ev"),
        )
        .filter(F.col("t") >= 0)
    )
    from advanced_strapi_import_spark.caching import persist_tracked

    # per_t is the single aggregation off the fact join; totals derive
    # from it (n = sum of events + censored over all days) — a direct
    # count over obs would run the lineitem x orders join twice
    per_t = persist_tracked(
        obs.groupBy("flag", F.col("t").cast("long").alias("t")).agg(
            F.sum("ev").cast("long").alias("d"),
            (F.count(F.lit(1)) - F.sum("ev")).cast("long").alias("c"),
        )
    )
    n0 = per_t.groupBy("flag").agg(
        F.sum(F.col("d") + F.col("c")).cast("long").alias("n")
    )
    w_excl = (
        Window.partitionBy("flag")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = per_t.join(F.broadcast(n0), "flag").select(
        "flag",
        "t",
        "d",
        (
            F.col("n")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_excl), F.lit(0)
            )
        )
        .cast("long")
        .alias("n_risk"),
    )
    win = (
        Window.partitionBy("flag")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    factor = (F.col("n_risk") - F.col("d")) * 1.0 / F.col("n_risk")
    # the zero factor is clamped to 1 INSIDE the fold (contributing
    # ln(1)=0) and the outer guard pins the curve to 0 from that day
    # on: DuckDB computes BOTH branches' windows regardless of the
    # CASE and hard-errors on ln(0) (Spark's log would yield NULL and
    # silently drop the term) — neither engine may ever see ln(0)
    safe = F.when(factor > 0, factor).otherwise(F.lit(1.0))
    s = F.when(F.min(factor).over(win) == 0, F.lit(0.0)).otherwise(
        F.exp(F.sum(F.log(safe)).over(win))
    )
    return (
        risk.withColumn("s", s)
        .filter(F.col("d") > 0)
        .select(
            "flag",
            "t",
            "n_risk",
            "d",
            (F.round("s", 6) + 0.0).alias("survival"),
        )
    )
