"""Bucketed storage: the join/agg shuffle must actually disappear.

These tests assert on the PHYSICAL PLAN, not just results — the whole
point of bucketing is the absent Exchange, which is the difference
between an O(data) network step and none at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from advanced_strapi_import_spark.sources.bucketed import (
    bucketed,
    exchanges_in_plan,
    write_bucketed,
)

from conftest import SF_TEST


@pytest.fixture()
def bucketed_tables(spark):
    # AQE rewrites small joins to broadcast at runtime, which would hide
    # the bucket effect; pin the planner to sort-merge for this check.
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    orders = spark.read.parquet(f"{SF_TEST}/orders.parquet")
    customer = spark.read.parquet(f"{SF_TEST}/customer.parquet")
    write_bucketed(orders, "b_orders", "o_custkey", buckets=4)
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        "o_custkey",
        buckets=4,
    )
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_exchange(bucketed_tables):
    spark = bucketed_tables
    o, c = bucketed(spark, "b_orders"), bucketed(spark, "b_customer")
    joined = o.join(c, "o_custkey")

    # same join over the raw parquet shuffles both sides
    raw_o = spark.read.parquet(f"{SF_TEST}/orders.parquet")
    raw_c = spark.read.parquet(f"{SF_TEST}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    raw_joined = raw_o.join(raw_c, "o_custkey")

    assert exchanges_in_plan(joined) == 0
    assert exchanges_in_plan(raw_joined) >= 2
    assert joined.count() == raw_joined.count()


def test_bucketed_groupby_has_no_exchange(bucketed_tables):
    spark = bucketed_tables
    agg = bucketed(spark, "b_orders").groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("total")
    )
    assert exchanges_in_plan(agg) == 0
    raw_agg = (
        spark.read.parquet(f"{SF_TEST}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("total"))
    )
    assert exchanges_in_plan(raw_agg) == 1
    assert agg.count() == raw_agg.count()
