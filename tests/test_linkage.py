"""Fellegi-Sunter record linkage (operators/linkage.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_strapi_import_spark.operators.linkage import (
    FieldComparison, linkage_matches, linkage_scores,
)


def _fields():
    return [
        FieldComparison("name", lambda: F.col("a.name") == F.col("b.name"), 40, -12),
        FieldComparison("bal", lambda: F.abs(F.col("a.bal") - F.col("b.bal")) <= 1.0, 20, -8),
    ]


def test_linkage_scores_weights_and_blocking(spark):
    a = spark.createDataFrame(
        [(1, "alice", 10, 100.0), (2, "bob", 10, 500.0), (3, "carol", 20, 9.0)],
        "id long, name string, blk int, bal double",
    )
    b = spark.createDataFrame(
        [(11, "alice", 10, 100.5),   # true match for 1
         (12, "bobby", 10, 500.0),   # name miss, bal hit for 2
         (13, "carol", 30, 9.0)],    # blocked away from 3
        "id long, name string, blk int, bal double",
    )
    rows = {(r["id_a"], r["id_b"]): r
            for r in linkage_scores(a, b, block_on=["blk"], fields=_fields()).collect()}
    # only same-block pairs exist: carol never compared (blk 20 vs 30)
    assert set(rows) == {(1, 11), (1, 12), (2, 11), (2, 12)}
    assert rows[(1, 11)]["w_name"] == 40 and rows[(1, 11)]["w_bal"] == 20
    assert rows[(1, 11)]["score"] == 60
    assert rows[(2, 12)]["w_name"] == -12 and rows[(2, 12)]["w_bal"] == 20
    assert rows[(2, 12)]["score"] == 8
    # cross pair disagrees on everything
    assert rows[(1, 12)]["score"] == -20


def test_linkage_matches_threshold(spark):
    a = spark.createDataFrame([(1, "x", 1, 5.0)], "id long, name string, blk int, bal double")
    b = spark.createDataFrame([(2, "x", 1, 5.0), (3, "y", 1, 99.0)],
                              "id long, name string, blk int, bal double")
    scores = linkage_scores(a, b, block_on=["blk"], fields=_fields())
    kept = linkage_matches(scores, threshold=40).collect()
    assert [(r["id_a"], r["id_b"]) for r in kept] == [(1, 2)]


def test_linkage_plan_is_equi_join(spark):
    """Blocking must compile to a hash equi-join on the block key —
    never BroadcastNestedLoop/cartesian."""
    a = spark.createDataFrame([(1, "x", 1, 5.0)], "id long, name string, blk int, bal double")
    b = spark.createDataFrame([(2, "x", 1, 5.0)], "id long, name string, blk int, bal double")
    plan = linkage_scores(a, b, block_on=["blk"], fields=_fields()) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan
