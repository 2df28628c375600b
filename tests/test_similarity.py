"""ANN quality tests: multi-table LSH must recover most of the exact
top-k (recall is the accept criterion, since LSH is approximate by
design)."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_strapi_import_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
)
from conftest import SF_ORACLE


def test_lsh_recall_against_bruteforce(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 97 == 0)
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(q, emb, k=5).collect()}
    lsh = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_lsh(q, emb, k=5, tables=8, planes=4).collect()
    }
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.6, f"multi-table LSH recall degraded: {recall:.2f}"


def test_ivf_recall_against_bruteforce(spark):
    from advanced_strapi_import_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 97 == 0)
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(q, emb, k=5).collect()}
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(q, emb, k=5, cells=16, nprobe=4).collect()
    }
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.6, f"IVF recall degraded: {recall:.2f}"


def test_lsh_scores_match_bruteforce_on_hits(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 97 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in cosine_topk(q, emb, k=5).collect()
    }
    lsh = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in cosine_topk_lsh(q, emb, k=5).collect()
    }
    for pair in set(exact) & set(lsh):
        assert exact[pair] == lsh[pair]  # same cosine, same rounding
