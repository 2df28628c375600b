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
