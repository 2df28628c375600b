"""Staged-projection text operators: same values as the inline forms,
with the token split guaranteed to evaluate once per row (the alias is
referenced more than once, so CollapseProject must keep it staged)."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_strapi_import_spark.operators import text as TX

DOCS = [
    ("a", "the cat sat on the mat the cat sat"),
    ("ws", "  padded   doc\twith  messy   whitespace "),
    ("b", "one two three four five"),
    ("c", ""),
    ("d", "x"),
    ("e", "na na na na batman 42 !!!"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_with_quality_matches_inline(spark):
    df = _df(spark)
    staged = TX.with_quality(df).select("doc_id", "quality")
    inline = df.select(
        "doc_id", TX.quality_score(F.col("text")).alias("quality")
    )
    assert sorted(staged.collect()) == sorted(inline.collect())


def test_with_quality_single_split(spark):
    plan = _optimized(TX.with_quality(_df(spark)).select("doc_id", "quality"))
    assert plan.count("split(") == 1, plan


def test_repetition_df_matches_inline(spark):
    df = _df(spark)
    staged = TX.repetition_features_df(df, "text", keep=["doc_id"])
    feats = TX.repetition_features(F.col("text"))
    inline = df.select("doc_id", *[c.alias(n) for n, c in feats.items()])
    assert sorted(staged.collect()) == sorted(inline.collect())


def test_repetition_df_single_split(spark):
    plan = _optimized(TX.repetition_features_df(_df(spark), "text", keep=["doc_id"]))
    assert plan.count("split(") == 1, plan
    # each gram array is also built once (referenced by size + distinct)
    assert plan.count("transform(") == 2, plan


def test_repetition_values(spark):
    rows = {
        r["doc_id"]: r
        for r in TX.repetition_features_df(
            _df(spark), "text", keep=["doc_id"]
        ).collect()
    }
    # "the cat sat" bigram repeats: 8 bigrams, 6 unique -> 0.25
    assert rows["a"]["n_tokens"] == 9
    assert rows["a"]["dup_bigram_ratio"] == 0.25
    assert rows["b"]["dup_bigram_ratio"] == 0.0
    # single-token / empty docs degenerate to ratio 0, never negative
    assert rows["d"]["dup_trigram_ratio"] == 0.0
    assert rows["e"]["dup_bigram_ratio"] > 0.0
