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


def test_time_partitioned_layout_prunes_partitions(spark, tmp_path):
    """A day filter on the partitioned layout must read only that day's
    files (partition pruning before file listing) and the scan must
    carry a PartitionFilters entry for it."""
    from advanced_strapi_import_spark.plans.registry import load_events
    from advanced_strapi_import_spark.sources import bucketed as B
    from tests.conftest import SF_TEST

    e = load_events(spark, SF_TEST)
    out = str(tmp_path / "events_by_day")
    B.write_time_partitioned(e, out, "ts", max_records_per_file=50_000)

    full = B.read_time_partitioned(spark, out)
    days = [r["__day"] for r in full.select("__day").distinct().collect()]
    assert len(days) > 1
    one_day = full.filter(F.col("__day") == days[0])

    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__day" in plan.split("PartitionFilters")[1][:200]
    # layout is physical: one hive directory per day, each with files
    import os

    part_dirs = [d for d in os.listdir(out) if d.startswith("__day=")]
    assert sorted(part_dirs) == sorted(f"__day={d}" for d in days)
    assert os.listdir(os.path.join(out, f"__day={days[0]}"))
    # row equivalence with a timestamp-range filter on the raw table
    expected = e.filter(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd") == days[0]).count()
    assert one_day.count() == expected


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Z-order zone maps stay selective on BOTH columns; a one-column
    sort layout is selective only on its sort key."""
    from advanced_strapi_import_spark.sources.bucketed import (
        file_zone_maps,
        write_zordered,
    )

    df = spark.range(40000).selectExpr(
        "id % 200 AS x", "CAST(id / 200 AS LONG) AS y", "id AS payload"
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "xsort")
    write_zordered(df, zpath, "x", "y", n_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(spath)
    )

    def survivors(path, lo_x, hi_x, lo_y, hi_y):
        zm = file_zone_maps(spark, path, "x", "y").collect()
        total = len(zm)
        hit = [
            r for r in zm
            if r.min_x <= hi_x and r.max_x >= lo_x
            and r.min_y <= hi_y and r.max_y >= lo_y
        ]
        return len(hit), total

    # box query selecting ~1/16 of each dimension
    zh, zt = survivors(zpath, 0, 12, 0, 12)
    sh, st = survivors(spath, 0, 12, 0, 12)
    assert zt >= 8 and st >= 8
    # z-order: only a corner of the curve overlaps the box
    assert zh <= zt // 2
    # x-sort prunes on x fine but every surviving file spans all of y,
    # so its survivor count is never better than z-order's and the
    # surviving x-sort files are y-useless:
    szm = file_zone_maps(spark, spath, "x", "y").collect()
    x_files = [r for r in szm if r.min_x <= 12 and r.max_x >= 0]
    assert all(r.max_y - r.min_y > 150 for r in x_files)
    # while z-order survivors keep y ranges tight
    zzm = file_zone_maps(spark, zpath, "x", "y").collect()
    z_files = [
        r for r in zzm
        if r.min_x <= 12 and r.max_x >= 0 and r.min_y <= 12 and r.max_y >= 0
    ]
    assert z_files and all(r.max_y - r.min_y < 150 for r in z_files)
