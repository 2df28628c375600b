"""Scale-behavior tests: bucketed co-located joins eliminate the
shuffle; HLL sketches stay inside their error bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_strapi_import_spark.plans.registry import load
from conftest import SF_TEST


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Pre-bucketing both sides of a recurring join key removes the
    Exchange entirely — the co-location strategy SCALE.md prescribes
    for repeated fact-to-fact joins."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckdb LOCATION '{tmp_path}/warehouse'")
    orders = load(spark, SF_TEST, "orders")
    li = load(spark, SF_TEST, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("buckdb.orders_b")
    )
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("buckdb.lineitem_b")
    )
    ob = spark.table("buckdb.orders_b")
    lb = spark.table("buckdb.lineitem_b")
    # force the non-broadcast path so the join itself must co-locate
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(lb, ob["o_orderkey"] == lb["l_orderkey"]).select(
            "o_orderkey", "o_orderstatus", "l_quantity"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed-bucketed equi-join: SortMergeJoin with ZERO exchanges
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        n_bucketed = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    n_plain = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).count()
    assert n_bucketed == n_plain


def test_approx_count_distinct_within_bound(spark):
    from advanced_strapi_import_spark.plans.parity_analytics import events_approx_users

    rows = events_approx_users(spark, SF_TEST).collect()
    assert rows
    for r in rows:
        err = abs(r["approx_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        assert err < 0.1, f"{r['event_type']}: approx {r['approx_users']} vs exact {r['exact_users']}"
