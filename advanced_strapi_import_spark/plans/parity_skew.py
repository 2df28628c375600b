"""Skew-mitigation parity queries: the salted two-phase aggregate must
produce exactly the plain aggregate's answer (the oracle IS the plain
SQL), and the error-channel explode (A2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from advanced_strapi_import_spark.operators import skew as SK
from advanced_strapi_import_spark.operators import validate as V
from advanced_strapi_import_spark.plans.parity_etl import _CHECKED_SQL, _validated
from advanced_strapi_import_spark.plans.registry import load, query


@query(
    "skew_salted_agg",
    oracle="""
SELECT l_returnflag,
       count(*) AS n,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Salted two-phase aggregate over 3 giant keys (l_returnflag): "
        "partials on (key, salt % 16), combine on key — identical "
        "answer to the plain groupBy (the oracle is the plain SQL).",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    out = SK.salted_agg(
        li,
        ["l_returnflag"],
        {
            "n": F.count(F.lit(1)),
            "sum_qty": F.sum("l_quantity"),
            "sum_price": F.sum("l_extendedprice"),
        },
        salt_col=F.col("l_orderkey"),
        salts=16,
    )
    return out.select(
        "l_returnflag",
        "n",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("sum_price", 2).alias("sum_price"),
    )


@query(
    "validate_errors_exploded",
    oracle=_CHECKED_SQL + """
SELECT rn AS __row, unnest(string_split(errs, '; ')) AS error
FROM checked WHERE errs <> ''
""",
    doc="A2 error flatten: one row per validation error message.",
)
def validate_errors_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = _validated(spark, sf_dir)
    return res.invalid.select(
        F.col(V.ROW_COL), F.explode(F.col(V.ERRORS_COL)).alias("error")
    )


@query(
    "skew_salted_join",
    oracle="""
SELECT s.s_nationkey, count(*) AS n, round(sum(l.l_extendedprice), 2) AS sum_price
FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
GROUP BY s.s_nationkey
""",
    doc="Salted skew join: hot fact side salted mod 8, mid-size dim "
        "replicated per salt, equi-join on (key, salt) — answer is "
        "identical to the plain join (the oracle IS the plain SQL), "
        "but a hot supplier's rows spread over 8 tasks instead of one "
        "straggler.",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = SK.salted_join(l, s, "l_suppkey", salts=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


# the scale-mode variant of "Row N" numbering: partition the window by a
# source-file surrogate so the sort parallelizes (SCALE.md, validate_df's
# row_number_partition) — same checked SQL with a partitioned row_number
from advanced_strapi_import_spark.plans.parity_etl import (  # noqa: E402
    _CHECKED_SQL as _CHECKED_GLOBAL_SQL,
    _dirty_customers,
)

_CHECKED_PER_FILE_SQL = _CHECKED_GLOBAL_SQL.replace(
    "row_number() OVER (ORDER BY c_custkey)",
    "row_number() OVER (PARTITION BY c_custkey % 4 ORDER BY c_custkey)",
)


@query(
    "validate_per_file_rows",
    oracle=_CHECKED_PER_FILE_SQL + """
SELECT CAST(custkey AS BIGINT) % 4 AS src, rn AS __row, errs AS errors
FROM checked WHERE errs <> ''
""",
    doc="P5 error channel in SCALE mode: 'Row N' numbering partitioned "
        "by input file (surrogate: custkey % 4) — the window "
        "parallelizes across files instead of collapsing to one "
        "partition; numbering restarts per file.",
)
def validate_per_file_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.plans.parity_etl import _REG

    df = _dirty_customers(spark, sf_dir).withColumn(
        "src", F.col("custkey").cast("long") % 4
    )
    res = V.validate_df(
        df,
        _REG.get("customer_import"),
        _REG,
        order_by=[F.col("custkey").cast("long")],
        row_number_partition="src",
    )
    return res.invalid.select(
        F.col("src"),
        F.col(V.ROW_COL),
        F.array_join(F.col(V.ERRORS_COL), "; ").alias("errors"),
    )
