"""Sketch operators: count-min guarantees, Bloom-gate guarantees, and
the new curation primitives (domain caps, hash split, blocklist)."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_strapi_import_spark.operators import curation as CU
from advanced_strapi_import_spark.operators import sketches as SK


def _keyed(spark, counts: dict[str, int]):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_cms_never_undercounts(spark):
    counts = {f"key{i}": (i % 7) + 1 for i in range(200)}
    df = _keyed(spark, counts)
    sketch = SK.cms_build(df, F.col("k"), depth=4, width=64)
    keys = spark.createDataFrame([(k,) for k in counts], "k string")
    est = {
        r["k"]: r["cms_cnt"]
        for r in SK.cms_estimate(
            sketch, keys, F.col("k"), depth=4, width=64
        ).collect()
    }
    assert set(est) == set(counts)
    for k, exact in counts.items():
        assert est[k] >= exact  # count-min can only over-count


def test_cms_exact_when_no_collisions(spark):
    counts = {"a": 3, "b": 5, "c": 1}
    df = _keyed(spark, counts)
    # width >> keys: collisions are possible but astronomically unlikely
    # to hit ALL 4 depths for the same pair of 3 keys
    sketch = SK.cms_build(df, F.col("k"), depth=4, width=4096)
    keys = spark.createDataFrame([(k,) for k in counts], "k string")
    est = {
        r["k"]: r["cms_cnt"]
        for r in SK.cms_estimate(
            sketch, keys, F.col("k"), depth=4, width=4096
        ).collect()
    }
    assert est == counts


def test_bloom_gate_no_false_negatives(spark):
    corpus = spark.createDataFrame(
        [(f"doc number {i}",) for i in range(300)], "text string"
    )
    batch = spark.createDataFrame(
        # 0..99 present verbatim, novel-* genuinely absent
        [(i, f"doc number {i}") for i in range(100)]
        + [(1000 + i, f"novel text {i}") for i in range(100)],
        "id long, text string",
    )
    out = SK.bloom_gate(corpus, batch, "text", k=4, m=1 << 16).collect()
    hits = {r["id"]: r["bloom_hit"] for r in out}
    for i in range(100):
        assert hits[i], "member must always hit (no false negatives)"
    # false-positive rate on the 100 novels should be far below 50%
    fp = sum(1 for i in range(100) if hits[1000 + i])
    assert fp < 20


def test_domain_caps_keeps_best_per_domain(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 10 else "b", 100 - i) for i in range(15)],
        "doc_id long, source string, n_chars long",
    )
    out = CU.domain_caps(df, cap=3).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert sorted(by_src["a"]) == [0, 1, 2]  # highest n_chars in 'a'
    assert sorted(by_src["b"]) == [10, 11, 12]
    assert all(r["rk"] <= 3 for r in out)


def test_hash_split_partition_and_stability(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    out = df.select(
        "id", CU.hash_split(F.col("id").cast("string")).alias("split")
    )
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] > 0
    assert abs(counts["train"] - 1600) < 200  # ~80% of 2000
    # determinism: re-evaluation yields the identical assignment
    again = {r["id"]: r["split"] for r in out.collect()}
    assert {r["id"]: r["split"] for r in out.collect()} == again


def test_blocklist_hits_exact_tokens(spark):
    df = spark.createDataFrame(
        [(1, "the slow query"), (2, "slower is not slow-ish"), (3, "dup dup")],
        "id long, text string",
    )
    out = {
        r["id"]: r["n"]
        for r in df.select(
            "id", CU.blocklist_hits(F.col("text"), ["slow", "dup"]).alias("n")
        ).collect()
    }
    assert out == {1: 1, 2: 0, 3: 2}  # exact token match only
