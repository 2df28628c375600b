"""Composed pipelines through the driver contract: end-to-end corpus
curation (dedup + quality + language gates — the actual shape of a
training-data filter job) and the oracle-checked repeatable-component
flatten (F20)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from advanced_strapi_import_spark.operators import dedup as D
from advanced_strapi_import_spark.operators import export as X
from advanced_strapi_import_spark.operators import text as TX
from advanced_strapi_import_spark.plans.parity_ml import _CORPUS_SQL, _corpus
from advanced_strapi_import_spark.plans.registry import load, query


@query(
    "corpus_curation",
    oracle=f"""
WITH {_CORPUS_SQL},
kept AS (
  SELECT min(id) AS id FROM corpus GROUP BY md5(text)),
feat AS (
  SELECT c.id, c.text,
         length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
         len(regexp_extract_all(text, '[0-9]')) AS n_digit,
         len(list_filter(string_split(lower(text), ' '),
             t -> list_contains(['the','a','of','and','to','in','is','that','it','for'], t))) AS stop_hits
  FROM corpus c JOIN kept k ON k.id = c.id),
scored AS (
  SELECT id,
         round(greatest(least(
           0.5
           + least(round(CAST(stop_hits AS DOUBLE) / n_tokens, 4) * 2, 0.3)
           - least(round(CAST(n_punct AS DOUBLE) / n_chars, 4) * 2, 0.3)
           - least(round(CAST(n_digit AS DOUBLE) / n_chars, 4), 0.2)
           + CASE WHEN round(CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens, 4)
                       BETWEEN 3 AND 10 THEN 0.2 ELSE 0.0 END,
           1.0), 0.0), 4) AS quality
  FROM feat)
SELECT id, quality FROM scored WHERE quality >= 0.5
""",
    doc="End-to-end curation: exact-dedup (keep min id) -> quality gate "
        ">= 0.5 — the composed training-data filter as one lazy plan.",
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    kept = D.exact_dedup(corpus, "text", "id")
    return kept.select(
        "id", TX.quality_score(F.col("text")).alias("quality")
    ).filter(F.col("quality") >= 0.5)


@query(
    "export_flatten_repeat",
    oracle="""
WITH r AS (
  SELECT l_orderkey, l_linenumber, l_quantity,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
  FROM lineitem)
SELECT o.o_orderkey AS id,
       max(CASE WHEN rn = 1 THEN l_linenumber END) AS "items.1.ln",
       round(max(CASE WHEN rn = 1 THEN l_quantity END), 2) AS "items.1.qty",
       max(CASE WHEN rn = 2 THEN l_linenumber END) AS "items.2.ln",
       round(max(CASE WHEN rn = 2 THEN l_quantity END), 2) AS "items.2.qty"
FROM orders o LEFT JOIN r ON r.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey
""",
    doc="F20 repeatable flatten under the oracle gate: nested "
        "array<struct> -> 1-based `field.{i}.key` columns.",
)
def export_flatten_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    nested = (
        li.groupBy("l_orderkey")
        .agg(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("l_linenumber", "l_partkey", "l_quantity")
                        )
                    ),
                    lambda s: F.struct(
                        s["l_linenumber"].alias("ln"),
                        F.round(s["l_quantity"], 2).alias("qty"),
                    ),
                ),
                1,
                2,
            ).alias("items")
        )
    )
    fact = o.select(F.col("o_orderkey").alias("id")).join(
        F.broadcast(nested), F.col("id") == nested["l_orderkey"], "left"
    ).drop("l_orderkey")
    return X.flatten_repeatable_component(fact, "items", max_items=2)
