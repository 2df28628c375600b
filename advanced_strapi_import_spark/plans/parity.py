"""Parity queries: the reference's operator surface (SURVEY.md §2)
re-expressed as lazy DataFrame plans over the driver's TPC-H-ish tables.

Each query cites the reference behavior it mirrors (file:line into
/root/reference) and carries a DuckDB oracle. Plans are pure built-in
pyspark.sql.functions — zero Python UDFs — so Catalyst gets pushdown,
pruning, broadcast selection and whole-stage codegen on every one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from advanced_strapi_import_spark.plans.registry import load, query


# ---------------------------------------------------------------------------
# Flagship: import-style aggregate (SURVEY §7 step 1)
# Models the reference's flagship import pipeline result summary
# (services/csv-import.js:362-409 counters) as a grouped aggregate over the
# fact table after a date filter — TPC-H Q1 shape so the plan exercises
# scan -> filter pushdown -> partial agg -> final agg.
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                    AS sum_qty,
       round(sum(l_extendedprice), 2)                               AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 2)                                    AS avg_qty,
       round(avg(l_extendedprice), 2)                               AS avg_price,
       round(avg(l_discount), 2)                                    AS avg_disc,
       count(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="Pricing summary over lineitem (flagship; scan+filter+agg).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
