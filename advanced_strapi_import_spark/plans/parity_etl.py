"""Parity queries driving the validation engine (P1-P6) and the FK
cascade resolver (J1-J3) end-to-end on the driver's tables.

The "dirty CSV" is derived deterministically from `customer` (same CASE
expressions on both engines), so the DuckDB oracle can re-state the
reference's validation rules in pure SQL while the Spark side runs the
real operators from operators/validate.py and operators/resolve.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from advanced_strapi_import_spark.caching import checkpoint_tracked
from advanced_strapi_import_spark.operators import resolve as R
from advanced_strapi_import_spark.operators import validate as V
from advanced_strapi_import_spark.plans.registry import load, query
from advanced_strapi_import_spark.plans.testdata_cts import TESTDATA_REGISTRY

_REG = TESTDATA_REGISTRY


# ---------------------------------------------------------------------------
# Shared derivations (Spark side). The oracle SQL mirrors these CASEs.
# ---------------------------------------------------------------------------
def _dirty_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    return c.select(
        k.cast("string").alias("custkey"),
        F.when(k % 11 == 3, F.lit("")).otherwise(F.col("c_name")).alias("name"),
        F.when(k % 13 == 4, F.lit("abc"))
        .otherwise(F.col("c_acctbal").cast("string"))
        .alias("acctbal"),
        F.when(k % 7 == 0, F.lit("yes"))
        .when(k % 7 == 1, F.lit("NO"))
        .when(k % 7 == 2, F.lit("1"))
        .when(k % 7 == 3, F.lit("maybe"))
        .when(k % 7 == 4, F.lit("FALSE"))
        .otherwise(F.lit("true"))
        .alias("active"),
        F.when(k % 17 == 5, F.lit("not-an-email"))
        .otherwise(
            F.concat(F.lower(F.regexp_replace("c_name", "#", "")), F.lit("@example.com"))
        )
        .alias("email"),
        F.col("c_mktsegment").alias("segment"),
    )


_DIRTY_SQL = """
  SELECT row_number() OVER (ORDER BY c_custkey) AS rn,
         CAST(c_custkey AS VARCHAR) AS custkey,
         CASE WHEN c_custkey % 11 = 3 THEN '' ELSE c_name END AS name,
         CASE WHEN c_custkey % 13 = 4 THEN 'abc'
              ELSE CAST(c_acctbal AS VARCHAR) END AS acctbal,
         CASE c_custkey % 7 WHEN 0 THEN 'yes' WHEN 1 THEN 'NO' WHEN 2 THEN '1'
              WHEN 3 THEN 'maybe' WHEN 4 THEN 'FALSE' ELSE 'true' END AS active,
         CASE WHEN c_custkey % 17 = 5 THEN 'not-an-email'
              ELSE lower(replace(c_name, '#', '')) || '@example.com' END AS email,
         c_mktsegment AS segment
  FROM customer
"""

_CHECKED_SQL = f"""
WITH src AS ({_DIRTY_SQL}),
checked AS (
  SELECT *, concat_ws('; ',
    CASE WHEN name = '' THEN 'Row ' || rn || ': Required field "name" is missing' END,
    CASE WHEN acctbal <> '' AND NOT regexp_matches(acctbal,
          '^\\s*[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?')
         THEN 'Row ' || rn || ': "acctbal" must be a decimal number' END,
    CASE WHEN lower(active) NOT IN ('true','false','1','0','yes','no')
         THEN 'Row ' || rn || ': "active" must be true/false, 1/0, or yes/no' END,
    CASE WHEN NOT regexp_matches(email, '^[^\\s@]+@[^\\s@]+\\.[^\\s@]+$')
         THEN 'Row ' || rn || ': "email" must be a valid email' END,
    CASE WHEN segment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD')
         THEN 'Row ' || rn || ': "segment" must be one of: AUTOMOBILE, BUILDING, FURNITURE, HOUSEHOLD' END
  ) AS errs
  FROM src)
"""


def _validated(spark: SparkSession, sf_dir: str) -> V.ValidationResult:
    src = _dirty_customers(spark, sf_dir)
    return V.validate_df(
        src,
        _REG.get("customer_import"),
        _REG,
        order_by=[F.col("custkey").cast("long")],
    )


@query(
    "validate_valid_rows",
    oracle=_CHECKED_SQL + """
SELECT rn AS __row,
       TRY_CAST(custkey AS BIGINT) AS custkey,
       name,
       TRY_CAST(acctbal AS DOUBLE) AS acctbal,
       lower(active) IN ('true','1','yes') AS active,
       email, segment
FROM checked WHERE errs = ''
""",
    doc="P5/P6: cast+validate dirty CSV-shaped rows; keep the clean split.",
)
def validate_valid_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _validated(spark, sf_dir).valid


@query(
    "validate_invalid_rows",
    oracle=_CHECKED_SQL + """
SELECT rn AS __row, errs AS errors FROM checked WHERE errs <> ''
""",
    doc="P5/P6 error channel: reference-format 'Row N:' messages.",
)
def validate_invalid_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = _validated(spark, sf_dir)
    return res.invalid.select(
        F.col(V.ROW_COL),
        F.array_join(F.col(V.ERRORS_COL), "; ").alias("errors"),
    )


# ---------------------------------------------------------------------------
# J1/J2: scalar FK cascade (exact -> id -> contains with precedence rank)
# ---------------------------------------------------------------------------
def _nation_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("id"),
        F.col("n_name").alias("name"),
    )


_REL_VALUE_SQL = """
         CASE c_custkey % 4
           WHEN 0 THEN 'NATION_' || (c_custkey % 25)
           WHEN 1 THEN 'nation_' || (c_custkey % 25)
           WHEN 2 THEN CAST(c_custkey % 25 AS VARCHAR)
           ELSE 'ATION_' || (c_custkey % 25)
         END AS v
"""


def _rel_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    nk = (k % 25).cast("string")
    return c.select(
        k.alias("custkey"),
        F.when(k % 4 == 0, F.concat(F.lit("NATION_"), nk))
        .when(k % 4 == 1, F.concat(F.lit("nation_"), nk))
        .when(k % 4 == 2, nk)
        .otherwise(F.concat(F.lit("ATION_"), nk))
        .alias("nation"),
    )


@query(
    "fk_resolve_cascade",
    oracle=f"""
WITH vals AS (SELECT c_custkey AS custkey, {_REL_VALUE_SQL} FROM customer),
nat AS (SELECT n_nationkey AS id, n_name AS name FROM nation),
cand AS (
  SELECT v.custkey, n.id, 0 AS rnk
  FROM vals v JOIN nat n ON TRY_CAST(v.v AS DOUBLE) = CAST(n.id AS DOUBLE)
  UNION ALL
  SELECT v.custkey, n.id, 1 FROM vals v JOIN nat n ON lower(n.name) = lower(v.v)
  UNION ALL
  SELECT v.custkey, n.id, 2 FROM vals v JOIN nat n ON contains(lower(n.name), lower(v.v))
),
best AS (
  SELECT custkey, id, row_number() OVER (PARTITION BY custkey ORDER BY rnk, id) AS rn
  FROM cand
)
SELECT v.custkey, v.v AS value, b.id AS nation
FROM vals v LEFT JOIN (SELECT custkey, id FROM best WHERE rn = 1) b USING (custkey)
""",
    doc="J1/J2: first-hit-wins cascade (id, exact $eqi, $containsi) as one "
        "set-oriented plan; min(rank,id) precedence.",
)
def fk_resolve_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    vals = _rel_values(spark, sf_dir).withColumnRenamed("custkey", "__row")
    out = R.resolve_relation(
        vals.withColumn("value", F.col("nation")),
        "nation",
        _REG.get("cust_rel_import"),
        _nation_dim(spark, sf_dir),
        _REG.get("nation_dim"),
        _REG,
    )
    return out.select(F.col("__row").alias("custkey"), "value", "nation")


# ---------------------------------------------------------------------------
# J3: multi-FK (comma list -> explode -> resolve -> ordered collect)
# ---------------------------------------------------------------------------
@query(
    "fk_resolve_multi",
    oracle="""
WITH vals AS (
  SELECT c_custkey AS custkey,
         'NATION_' || (c_custkey % 25) || ', ' || CAST((c_custkey * 7) % 25 AS VARCHAR)
           || CASE WHEN c_custkey % 5 = 0 THEN ',nowhere' ELSE '' END AS nations
  FROM customer),
tokens AS (
  SELECT custkey, trim(t.tok) AS tok, t.pos
  FROM vals, LATERAL (
    SELECT unnest(string_split(nations, ',')) AS tok,
           generate_subscripts(string_split(nations, ','), 1) AS pos
  ) t),
nat AS (SELECT n_nationkey AS id, n_name AS name FROM nation),
keys AS (SELECT DISTINCT tok AS key FROM tokens),
cand AS (
  SELECT k.key, n.id, 0 AS rnk FROM keys k
    JOIN nat n ON TRY_CAST(k.key AS DOUBLE) = CAST(n.id AS DOUBLE)
  UNION ALL
  SELECT k.key, n.id, 1 FROM keys k JOIN nat n ON lower(n.name) = lower(k.key)
  UNION ALL
  SELECT k.key, n.id, 2 FROM keys k JOIN nat n ON contains(lower(n.name), lower(k.key))
),
best AS (
  SELECT key, id FROM (
    SELECT key, id, row_number() OVER (PARTITION BY key ORDER BY rnk, id) AS rn FROM cand
  ) WHERE rn = 1
),
resolved AS (
  SELECT t.custkey, t.pos, b.id FROM tokens t LEFT JOIN best b ON b.key = t.tok)
SELECT custkey,
       array_to_string(list(id ORDER BY pos) FILTER (WHERE id IS NOT NULL), ',') AS fk_ids
FROM resolved GROUP BY custkey
""",
    doc="J3: comma-split multi-FK resolution; ordered ids, misses dropped.",
)
def fk_resolve_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    vals = c.select(
        k.alias("__row"),
        F.concat(
            F.lit("NATION_"), (k % 25).cast("string"),
            F.lit(", "), ((k * 7) % 25).cast("string"),
            F.when(k % 5 == 0, F.lit(",nowhere")).otherwise(F.lit("")),
        ).alias("nations"),
    )
    out = R.resolve_relation(
        vals,
        "nations",
        _REG.get("cust_rel_import"),
        _nation_dim(spark, sf_dir),
        _REG.get("nation_dim"),
        _REG,
    )
    return out.select(
        F.col("__row").alias("custkey"),
        F.concat_ws(
            ",", F.transform(F.coalesce("nations", F.array().cast("array<long>")),
                             lambda x: x.cast("string"))
        ).alias("fk_ids"),
    )


# ---------------------------------------------------------------------------
# §3.1 composed import endpoint as ONE hash-gated plan (round 12,
# VERDICT r11 task 6): validate -> cast -> FK cascade -> component ->
# media match -> MERGE — the exact operator sequence of
# Engine._import_csv_body (api.py; reference
# controllers/csv-import.js:209-295), over the driver parquet. The
# per-operator gates can't see INTER-operator contract drift (error
# channel columns, dot-column storage names, struct-wins merge
# semantics, FK null handling); this one does.
# ---------------------------------------------------------------------------
def _pipeline_batch(spark: SparkSession, sf_dir: str):
    """The validated+resolved+assembled import batch (pre-merge) plus
    the ValidationResult — shared by the e2e and counters queries."""
    from advanced_strapi_import_spark.operators import components as CP
    from advanced_strapi_import_spark.operators import media as M

    src = _dirty_customers(spark, sf_dir)
    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    nk = (k % 25).cast("string")
    extra = c.select(
        k.cast("string").alias("custkey"),
        F.when(k % 4 == 0, F.concat(F.lit("NATION_"), nk))
        .when(k % 4 == 1, F.concat(F.lit("nation_"), nk))
        .when(k % 4 == 2, nk)
        .otherwise(F.concat(F.lit("ATION_"), nk))
        .alias("nation"),
        F.concat(F.lit("City "), (k % 50).cast("string"))
        .alias("address.city"),
        F.when(k % 19 == 6, F.lit("N/A"))
        .otherwise(((k * 13) % 100000).cast("string"))
        .alias("address.zip"),
    )
    src = src.join(extra, "custkey")
    ct = _REG.get("customer_pipeline_import")
    res = V.validate_df(
        src, ct, _REG, order_by=[F.col("custkey").cast("long")]
    )
    df = res.valid
    df = R.resolve_all_relations(
        df, ct, _REG, {"nation_dim": _nation_dim(spark, sf_dir)},
        mapping=res.mapping, row_key=V.ROW_COL,
    )
    # single-component build from the validated dot columns — the same
    # loop Engine._import_csv_body runs (api.py)
    for fld, attr in ct.attributes.items():
        if attr.type != "component" or attr.repeatable:
            continue
        cols = {
            m.component_field: V.dot_storage_col(m)
            for m in res.mapping.values()
            if m.is_component and m.field == fld and m.component_field
            and V.dot_storage_col(m) in df.columns
        }
        if cols:
            df = CP.build_single_component(
                df, fld, _REG.components[attr.component], cols
            )
    df = df.drop(*[cn for cn in df.columns if cn.startswith("__dot__")])
    # media: filenames derived from orders prefix-match the customer
    # name (the reference's upload-zip -> import flow)
    o = load(spark, sf_dir, "orders")
    ok = F.col("o_orderkey")
    files = o.select(
        ok.alias("id"),
        F.concat(
            F.lower(F.concat(
                F.lit("Customer#"),
                F.lpad(F.col("o_custkey").cast("string"), 9, "0"),
            )),
            F.when(ok % 4 == 0, F.lit(".pdf"))
            .when(ok % 4 == 1, F.lit("_1.pdf"))
            .when(ok % 4 == 2, F.lit("_12.jpg"))
            .otherwise(F.lit("_extra_report.pdf")),
        ).alias("name"),
    )
    # prefix-explode: the equi-join J7 strategy (shuffle-partitionable;
    # the broadcast-theta default is a BNLJ that costs |batch| x |files|
    # string compares — measured 4x slower here, and it is the variant
    # that would not survive 100x). Semantics gate-proven equal by
    # media_match vs media_match_prefix.
    df = M.match_media(
        df, files, "name", row_key=V.ROW_COL, out_col="docs",
        strategy="prefix-explode",
    )
    # the merge consumes the batch twice (matched-coalesce join + the
    # create anti-join) — same reason Engine.import_csv persists the
    # scan+validate subtree (api.py:233). Eager checkpoint_tracked
    # (r12 history: a raw persist leaked past caching.release_all(),
    # letting the SECOND pipeline query in a session silently reuse the
    # first one's materialized batch; and without an eager fill the
    # merge's two consumers raced an unmaterialized cache through the
    # whole validate->resolve->media subtree — the kcore race class,
    # measured exec 11.1 s -> 1.8 s, shuffle 9.9 -> 1.7 MB). The
    # checkpoint also truncates the batch lineage the merge arms would
    # otherwise re-analyze per action (counters plan 2,756 -> 397
    # lines).
    df = df.transform(checkpoint_tracked)
    return df, res


def _pipeline_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-existing table the batch merges into: every custkey % 3
    == 0 row with distinct OLD values, non-null component/media so the
    merge's struct-wins vs per-column-coalesce semantics are actually
    exercised by the hash."""
    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    return c.filter(k % 3 == 0).select(
        k.cast("long").alias("custkey"),
        F.concat(F.lit("OLD_"), k.cast("string")).alias("name"),
        (k.cast("double") / 100).alias("acctbal"),
        F.lit(False).alias("active"),
        F.lit("old@example.com").alias("email"),
        F.lit("BUILDING").alias("segment"),
        F.lit(7).cast("long").alias("nation"),
        F.struct(
            F.lit("OldCity").alias("city"),
            F.lit(99999).cast("long").alias("zip"),
        ).alias("address"),
        F.array(k.cast("long")).alias("docs"),
    )


_PIPE_ORACLE_BASE = _CHECKED_SQL + """
, extras AS (
  SELECT c_custkey AS ck,
         CASE c_custkey % 4
           WHEN 0 THEN 'NATION_' || (c_custkey % 25)
           WHEN 1 THEN 'nation_' || (c_custkey % 25)
           WHEN 2 THEN CAST(c_custkey % 25 AS VARCHAR)
           ELSE 'ATION_' || (c_custkey % 25)
         END AS nation_v,
         'City ' || (c_custkey % 50) AS city,
         CASE WHEN c_custkey % 19 = 6 THEN 'N/A'
              ELSE CAST((c_custkey * 13) % 100000 AS VARCHAR) END AS zip
  FROM customer),
valid AS (
  SELECT TRY_CAST(ch.custkey AS BIGINT) AS ck, ch.name, ch.acctbal,
         ch.active, ch.email, ch.segment, e.nation_v, e.city, e.zip
  FROM checked ch JOIN extras e ON e.ck = TRY_CAST(ch.custkey AS BIGINT)
  WHERE ch.errs = ''),
nat AS (SELECT n_nationkey AS id, n_name AS nname FROM nation),
cand AS (
  SELECT v.ck, n.id, 0 AS rnk FROM valid v
    JOIN nat n ON TRY_CAST(v.nation_v AS DOUBLE) = CAST(n.id AS DOUBLE)
  UNION ALL
  SELECT v.ck, n.id, 1 FROM valid v
    JOIN nat n ON lower(n.nname) = lower(v.nation_v)
  UNION ALL
  SELECT v.ck, n.id, 2 FROM valid v
    JOIN nat n ON contains(lower(n.nname), lower(v.nation_v))),
best AS (
  SELECT ck, id FROM (
    SELECT ck, id,
           row_number() OVER (PARTITION BY ck ORDER BY rnk, id) AS brn
    FROM cand) WHERE brn = 1),
files AS (
  SELECT o_orderkey AS fid,
         lower('Customer#' || lpad(CAST(o_custkey AS VARCHAR), 9, '0')) ||
         CASE o_orderkey % 4 WHEN 0 THEN '.pdf' WHEN 1 THEN '_1.pdf'
              WHEN 2 THEN '_12.jpg' ELSE '_extra_report.pdf' END AS fname
  FROM orders),
mm AS (
  SELECT v.ck, f.fid, f.fname
  FROM valid v JOIN files f ON starts_with(f.fname, lower(v.name))),
docs AS (
  SELECT ck, array_to_string(list(fid ORDER BY fname, fid), ',') AS ids
  FROM mm GROUP BY ck),
batch AS (
  SELECT v.ck AS custkey, v.name,
         TRY_CAST(v.acctbal AS DOUBLE) AS acctbal,
         lower(v.active) IN ('true','1','yes') AS active,
         v.email, v.segment,
         b.id AS nation,
         v.city AS addr_city,
         TRY_CAST(NULLIF(v.zip, 'N/A') AS BIGINT) AS addr_zip,
         d.ids AS docs_csv
  FROM valid v
  LEFT JOIN best b ON b.ck = v.ck
  LEFT JOIN docs d ON d.ck = v.ck),
tgt AS (
  SELECT CAST(c_custkey AS BIGINT) AS custkey,
         'OLD_' || c_custkey AS name,
         CAST(c_custkey AS DOUBLE) / 100 AS acctbal,
         false AS active,
         'old@example.com' AS email,
         'BUILDING' AS segment,
         CAST(7 AS BIGINT) AS nation,
         'OldCity' AS addr_city,
         CAST(99999 AS BIGINT) AS addr_zip,
         CAST(c_custkey AS VARCHAR) AS docs_csv
  FROM customer WHERE c_custkey % 3 = 0)
"""


@query(
    "import_pipeline_e2e",
    oracle=_PIPE_ORACLE_BASE + """
SELECT t.custkey, b.name, b.acctbal, b.active, b.email, b.segment,
       coalesce(b.nation, t.nation) AS nation,
       b.addr_city, b.addr_zip,
       coalesce(b.docs_csv, t.docs_csv) AS docs_csv
FROM tgt t JOIN batch b ON b.custkey = t.custkey
UNION ALL
SELECT t.* FROM tgt t
WHERE t.custkey NOT IN (SELECT custkey FROM batch)
UNION ALL
SELECT b.custkey, b.name, b.acctbal, b.active, b.email, b.segment,
       b.nation, b.addr_city, b.addr_zip,
       coalesce(b.docs_csv, '') AS docs_csv
FROM batch b WHERE b.custkey % 3 <> 0
""",
    doc="§3.1 composed endpoint: validate+cast -> FK cascade -> single "
        "component -> media prefix match -> join+union MERGE, one lazy "
        "plan; hash pins the merged table including struct-wins (batch "
        "address wholesale, NULL zip and all) vs per-column coalesce "
        "(NULL batch docs keep target docs) semantics.",
)
def import_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.operators import upsert as U

    df, _res = _pipeline_batch(spark, sf_dir)
    result = U.merge(
        _pipeline_target(spark, sf_dir), df, "custkey", order_col=V.ROW_COL
    )
    return result.merged.select(
        "custkey", "name", "acctbal", "active", "email", "segment",
        "nation",
        F.col("address.city").alias("addr_city"),
        F.col("address.zip").alias("addr_zip"),
        F.concat_ws(
            ",",
            F.transform(
                F.coalesce("docs", F.array().cast("array<bigint>")),
                lambda x: x.cast("string"),
            ),
        ).alias("docs_csv"),
    )


@query(
    "import_pipeline_counters",
    oracle=_PIPE_ORACLE_BASE + """
SELECT (SELECT count(*) FROM batch WHERE custkey % 3 <> 0) AS created,
       (SELECT count(*) FROM batch WHERE custkey % 3 = 0) AS updated,
       (SELECT count(*) FROM checked WHERE errs <> '') AS invalid_rows
""",
    doc="A1 through the composed plan: the endpoint's created/updated/"
        "invalidRows result dict from the same lazy pipeline.",
)
def import_pipeline_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.operators import upsert as U

    df, res = _pipeline_batch(spark, sf_dir)
    result = U.merge(
        _pipeline_target(spark, sf_dir), df, "custkey", order_col=V.ROW_COL
    )
    invalid = res.invalid.agg(
        F.count(F.lit(1)).alias("invalid_rows")
    )
    return result.counters.crossJoin(invalid).select(
        F.col("created").cast("long").alias("created"),
        F.col("updated").cast("long").alias("updated"),
        F.col("invalid_rows").cast("long").alias("invalid_rows"),
    )
