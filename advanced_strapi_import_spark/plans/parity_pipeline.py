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


# exact-dedup (keep min id) + the quality-score formula, shared by the
# curation queries below
_CURATED_SQL = """
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
  SELECT id, text,
         round(greatest(least(
           0.5
           + least(round(CAST(stop_hits AS DOUBLE) / n_tokens, 4) * 2, 0.3)
           - least((CASE WHEN n_chars > 0 THEN round(CAST(n_punct AS DOUBLE) / n_chars, 4) ELSE 0.0 END) * 2, 0.3)
           - least((CASE WHEN n_chars > 0 THEN round(CAST(n_digit AS DOUBLE) / n_chars, 4) ELSE 0.0 END), 0.2)
           + CASE WHEN round(CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens, 4)
                       BETWEEN 3 AND 10 THEN 0.2 ELSE 0.0 END,
           1.0), 0.0), 4) AS quality
  FROM feat)
"""


@query(
    "corpus_curation",
    oracle=f"""
WITH {_CORPUS_SQL},
{_CURATED_SQL}
SELECT id, quality FROM scored WHERE quality >= 0.5
""",
    doc="End-to-end curation: exact-dedup (keep min id) -> quality gate "
        ">= 0.5 — the composed training-data filter as one lazy plan.",
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    kept = D.exact_dedup(corpus, "text", "id")
    return (
        TX.with_quality(kept)
        .select("id", "quality")
        .filter(F.col("quality") >= 0.5)
    )


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
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # rank + conditional-aggregate pivot: the old shape collect_list'd
    # EVERY lineitem of an order into an array, sorted and transformed
    # it, then sliced 2 elements — building ~4x the data it kept. Here
    # rows past rank 2 are dropped before aggregation and the pivot is
    # a pair of map-side max(when(rn=k)) partials; the groupBy reuses
    # the window's hash partitioning on l_orderkey (no second exchange)
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_quantity"
    )
    item = F.struct(
        F.col("l_linenumber").alias("ln"),
        F.round("l_quantity", 2).alias("qty"),
    )
    nested = (
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 2)
        .groupBy("l_orderkey")
        .agg(
            F.max(F.when(F.col("__rn") == 1, item)).alias("__i1"),
            F.max(F.when(F.col("__rn") == 2, item)).alias("__i2"),
        )
        .select(
            "l_orderkey",
            F.filter(
                F.array("__i1", "__i2"), lambda x: x.isNotNull()
            ).alias("items"),
        )
    )
    # NO broadcast hint: `nested` is a fact-sized aggregate (one row per
    # order, each carrying an item array) — shipping it to every
    # executor is the anti-pattern; both sides hash-shuffle on the
    # order key and AQE picks the strategy
    fact = o.select(F.col("o_orderkey").alias("id")).join(
        nested, F.col("id") == nested["l_orderkey"], "left"
    ).drop("l_orderkey")
    return X.flatten_repeatable_component(fact, "items", max_items=2)


@query(
    "corpus_to_training_chunks",
    oracle=f"""
WITH {_CORPUS_SQL},
{_CURATED_SQL},
curated AS (
  SELECT id, text || ' contact user' || id || '@example.com' AS raw
  FROM scored WHERE quality >= 0.5),
red AS (
  SELECT id,
         regexp_replace(
           regexp_replace(
             regexp_replace(raw,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
             '\\b(?:[0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b', '<IP>', 'g'),
           '\\+?[0-9][0-9()\\-. ]{{7,}}[0-9]', '<PHONE>', 'g') AS text
  FROM curated),
t AS (SELECT id, string_split_regex(trim(text), '\\s+') AS toks FROM red),
sized AS (
  SELECT id, toks,
         greatest(1, CAST(ceil((len(toks) - 16) / 48.0) AS INT)) AS n_chunks
  FROM t),
expl AS (
  SELECT id, toks, n_chunks, unnest(range(0, n_chunks)) AS ci FROM sized)
SELECT id, CAST(ci AS INT) AS chunk_index, n_chunks,
       md5(array_to_string(list_slice(toks, ci * 48 + 1, ci * 48 + 64), ' ')) AS chunk_md5,
       CAST(len(list_slice(toks, ci * 48 + 1, ci * 48 + 64)) AS INT) AS n_tokens
FROM expl
""",
    doc="The COMPLETE curation pipeline in one lazy plan: exact dedup "
        "-> quality gate >= 0.5 -> PII redaction -> 64/16 token "
        "chunking — raw corpus in, training samples out, value-checked "
        "end to end.",
)
def corpus_to_training_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    kept = D.exact_dedup(corpus, "text", "id")
    gated = (
        TX.with_quality(kept)
        .select("id", "text", "quality")
        .filter(F.col("quality") >= 0.5)
    )
    seeded = gated.select(
        "id",
        F.concat(
            F.col("text"), F.lit(" contact user"),
            F.col("id").cast("string"), F.lit("@example.com"),
        ).alias("raw"),
    )
    red = seeded.select("id", TX.redact_pii(F.col("raw")).alias("text"))
    chunks = TX.chunk_documents(red, "text", "id", chunk_tokens=64, overlap=16)
    return chunks.select(
        "id", "chunk_index", "n_chunks",
        F.md5("chunk_text").alias("chunk_md5"), "n_tokens",
    )
