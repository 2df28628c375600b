"""Correctness of the iterative operators: connected components vs a
Python union-find; as-of join edge semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_strapi_import_spark.operators import dedup as D
from advanced_strapi_import_spark.operators import temporal as T


def test_connected_components_matches_union_find(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4), (40, 41)],
        "id_a long, id_b long",
    )
    # force the distributed pointer-jumping path (threshold 0) so this
    # test exercises the loop, not the driver-side union-find
    got = {
        r["id"]: r["cluster"]
        for r in D.connected_components(pairs, driver_threshold=0).collect()
    }
    # the small-graph fast path must agree with the distributed loop
    fast = {
        r["id"]: r["cluster"] for r in D.connected_components(pairs).collect()
    }
    assert fast == got

    # reference union-find
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4), (40, 41)]:
        union(a, b)
    want = {x: find(x) for x in parent}
    assert got == want
    assert got[4] == 1 and got[22] == 20


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 205), (3, 1, 300), (4, 2, 50)],
        "event_id long, user_id long, ts long",
    )
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 200, 20.0), (1, 250, 25.0), (2, 60, 1.0)],
        "user_id long, ts long, rate double",
    )
    out = T.asof_join(left, right, on="ts", by="user_id", value_cols=["rate"])
    got = {r["event_id"]: r["rate"] for r in out.collect()}
    assert got[1] == 10.0   # equal ts -> inclusive
    assert got[2] == 20.0   # most recent <= 205
    assert got[3] == 25.0
    assert got[4] is None   # no prior right row


def test_asof_join_null_values_row_level(spark):
    """merge_asof attaches the most recent right ROW — a genuinely-NULL
    value on that row must come through as NULL, not be skipped for an
    older non-null one; and multiple value_cols must come from the SAME
    right row (never stitched across rows)."""
    import pytest

    left = spark.createDataFrame([(1, 1, 300)], "event_id long, user_id long, ts long")
    right = spark.createDataFrame(
        [(1, 100, 5.0, None), (1, 200, None, 7.0)],
        "user_id long, ts long, rate double, fee double",
    )
    out = T.asof_join(
        left, right, on="ts", by="user_id", value_cols=["rate", "fee"]
    ).collect()[0]
    # most recent row is ts=200: rate NULL (not 5.0 from ts=100), fee 7.0
    assert out["rate"] is None and out["fee"] == 7.0

    # a value_col colliding with a left column fails at plan time
    with pytest.raises(ValueError):
        T.asof_join(left, right, on="ts", by="user_id", value_cols=["event_id"])


def test_interval_join_rejects_outer(spark):
    import pytest

    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        T.interval_join(df, df, point_ts="x", start_ts="x", end_ts="x", how="full")


def test_interval_join_bucket_boundaries(spark):
    points = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00"), (2, "2024-01-01 05:00:00")],
        "pid long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ivals = spark.createDataFrame(
        [(100, "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
        "iid long, s string, e string",
    ).select(
        "iid", F.col("s").cast("timestamp").alias("s"), F.col("e").cast("timestamp").alias("e")
    )
    out = T.interval_join(points, ivals, point_ts="ts", start_ts="s", end_ts="e")
    assert [r["pid"] for r in out.collect()] == [1]


def test_cogrouped_asof_equals_native(spark):
    """The cogrouped-pandas as-of fallback matches the native
    union+window implementation row for row, both directions."""
    from advanced_strapi_import_spark.operators import temporal as TP

    SF = "/root/testdata/sf0.001"
    from advanced_strapi_import_spark.plans.registry import load_events

    e = load_events(spark, SF)
    left = e.filter("event_type = 'view'").select("user_id", "ts", "event_id")
    right = e.filter("event_type = 'purchase'").select(
        "user_id", "ts", "value"
    )
    for direction in ("backward", "forward"):
        native = TP.asof_join(
            left, right, on="ts", by="user_id",
            value_cols=["value"], direction=direction,
        )
        cog = TP.asof_join_cogrouped(
            left, right, on="ts", by="user_id",
            value_cols=["value"], direction=direction,
        )
        n = {tuple(map(str, r)) for r in native.collect()}
        c = {tuple(map(str, r)) for r in cog.collect()}
        assert n == c, f"direction={direction}: {len(n ^ c)} differing rows"


def test_label_propagation_barbell_hand_computed(spark):
    # Barbell graph: triangles {1,2,3} and {4,5,6} joined by the bridge
    # (3,4). Two synchronous rounds, majority label with min-label
    # ties, all updates simultaneous — worked by hand:
    #   round 1: 1->2, 2->1, 3->1, 4->3, 5->4, 6->4
    #   round 2: 1->1, 2->1, 3->1, 4->4, 5->3, 6->3
    # The left triangle has converged to label 1; crucially the bridge
    # did NOT merge the two triangles into one label (which connected
    # components would have done).
    from advanced_strapi_import_spark.operators.dedup import (
        label_propagation,
    )

    # (2, 1) re-states edge (1, 2) in the opposite orientation and
    # (3, 2) duplicates (2, 3): canonicalization must collapse both,
    # or node votes double and the hand-computed labels break
    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (2, 3), (3, 2), (4, 5), (4, 6), (5, 6),
         (3, 4)],
        "id_a long, id_b long",
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(pairs, iterations=2).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 3, 6: 3}


def test_kcore_triangle_tail_hand_computed(spark):
    # Triangle {1,2,3} with a tail 3-4, 4-5, worked by hand at k=2:
    #   degrees: 1:2, 2:2, 3:3, 4:2, 5:1  -> drop 5
    #   round 2: 4 now has degree 1       -> drop 4
    #   round 3: triangle stable, all degree 2
    # The 2-core is exactly the triangle; a plain degree>=2 filter
    # would wrongly keep node 4 (the chain link), which is why peeling
    # iterates. (5, 4) re-states edge (4, 5) reversed and (5, 5) is a
    # self-loop — canonicalization must drop both or degrees double.
    from advanced_strapi_import_spark.operators.dedup import kcore

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 4), (5, 5)],
        "id_a long, id_b long",
    )
    rows = kcore(pairs, k=2, rounds=3).collect()
    got = {r["node"]: r["degree"] for r in rows}
    assert got == {1: 2, 2: 2, 3: 2}
    # round 3 removed nothing (round 2 dropped node 4) -> fixpoint
    assert all(r["converged"] for r in rows)
    # with ONE round the peel is mid-chain: node 4 still present with
    # residual degree 1 < k, and the flag must say so
    rows1 = kcore(pairs, k=2, rounds=1).collect()
    got1 = {r["node"]: r["degree"] for r in rows1}
    assert got1 == {1: 2, 2: 2, 3: 3, 4: 1}
    assert not any(r["converged"] for r in rows1)


def test_kcore_zero_rounds_is_degree_table(spark):
    from advanced_strapi_import_spark.operators.dedup import kcore

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    got = {r["node"]: r["degree"] for r in kcore(pairs, rounds=0).collect()}
    assert got == {1: 1, 2: 2, 3: 1}
