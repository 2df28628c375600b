"""Corpus-curation queries: sequence packing, contamination, stratified
sampling, rarity scoring, mixture weights, fuzzy dedup, markup strip.

These extend the reference's import/export pipeline surface with the
operations a 100 TB training-data pipeline needs (build-spec first-class
components). Every query has an exact DuckDB oracle; determinism notes
live in operators/curation.py's module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from advanced_strapi_import_spark.operators import curation as CU
from advanced_strapi_import_spark.operators import text as TX
from advanced_strapi_import_spark.caching import persist_tracked
from advanced_strapi_import_spark.plans.registry import load, query


@query(
    "seq_pack_chunks",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents),
sized AS (
  SELECT doc_id, toks, len(toks) AS n,
         greatest(1, CAST(ceil((len(toks) - 16) / 48.0) AS INT)) AS n_chunks
  FROM t),
expl AS (
  SELECT doc_id, toks, n_chunks, unnest(range(0, n_chunks)) AS ci
  FROM sized),
chunks AS (
  SELECT doc_id, CAST(ci AS INT) AS chunk_index,
         CAST(len(list_slice(toks, ci * 48 + 1, ci * 48 + 64)) AS BIGINT) AS n_tokens,
         CAST(doc_id % 8 AS INT) AS shard
  FROM expl),
packed AS (
  SELECT doc_id, chunk_index, n_tokens, shard,
         CAST(sum(n_tokens) OVER (
              PARTITION BY shard ORDER BY doc_id, chunk_index
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
           AS BIGINT) AS tok_offset
  FROM chunks)
SELECT doc_id, chunk_index, n_tokens, shard, tok_offset,
       CAST(shard * 1099511627776 + floor(tok_offset / 256) AS BIGINT) AS seq_id
FROM packed
""",
    doc="Concat-and-split sequence packing (budget 256 tokens) over the "
        "64/16 chunk stream, sharded by pmod(doc_id, 8) so the cumsum "
        "parallelizes — the standard pretraining sample prep.",
)
def seq_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    chunks = TX.chunk_documents(d, "text", "doc_id", chunk_tokens=64, overlap=16)
    chunks = chunks.select(
        F.col("id").alias("doc_id"), "chunk_index",
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )
    return CU.pack_sequences(chunks, budget=256, n_shards=8)


@query(
    "contamination_8gram",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents),
expl AS (
  SELECT doc_id, toks, unnest(range(0, greatest(len(toks) - 7, 0))) AS i
  FROM t),
grams AS (
  SELECT doc_id, array_to_string(list_slice(toks, i + 1, i + 8), ' ') AS gram
  FROM expl),
bench AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
hits AS (
  SELECT doc_id, count(*) AS n_overlap
  FROM grams WHERE gram IN (SELECT gram FROM bench)
  GROUP BY doc_id)
SELECT t.doc_id,
       CAST(greatest(len(toks) - 7, 0) AS BIGINT) AS n_ngrams,
       CAST(coalesce(hits.n_overlap, 0) AS BIGINT) AS n_overlap,
       coalesce(hits.n_overlap, 0) > 0 AS contaminated
FROM t LEFT JOIN hits ON t.doc_id = hits.doc_id
""",
    doc="Benchmark decontamination: 8-gram overlap of every corpus doc "
        "against the doc_id%97==0 'eval set'; bench grams are distinct'd "
        "and broadcast so the corpus side never shuffles.",
)
def contamination_8gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.plans.registry import fan_out

    d = load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    # fan_out the corpus side only: the gram explode would serialize on
    # the 1-split scan; the bench side stays tiny and broadcasts
    out = CU.contamination(fan_out(d), bench, n=8)
    return out.select(
        "doc_id", F.col("n_ngrams").cast("long").alias("n_ngrams"),
        "n_overlap", "contaminated",
    )


@query(
    "sample_stratified",
    oracle="""
SELECT lang, doc_id, sample_rank FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
  FROM documents) s
WHERE sample_rank <= 25
""",
    doc="Deterministic per-language quota sample (25/stratum) ranked by "
        "md5(doc_id) — engine-portable pseudo-randomness; one shuffle on "
        "the stratum key.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    out = CU.stratified_sample(d, strata_col="lang", quota=25)
    return out.select("lang", "doc_id", F.col("sample_rank").cast("long").alias("sample_rank"))


@query(
    "doc_rarity",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents),
t2 AS (SELECT * FROM toks WHERE tok <> ''),
counts AS (SELECT tok, count(*) AS cnt FROM t2 GROUP BY tok)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(floor(1000000 / cnt)) AS BIGINT) AS rarity_sum,
       CAST(floor(sum(floor(1000000 / cnt)) / count(*)) AS BIGINT) AS rarity_mean
FROM t2 JOIN counts USING (tok)
GROUP BY doc_id
""",
    doc="Unigram-LM surprisal proxy: sum/mean of floor(1e6/corpus_count) "
        "per token — integer-exact (no ln) so cross-engine hashes agree; "
        "two shuffles (vocab count, per-doc sum).",
)
def doc_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return CU.doc_rarity(d)


@query(
    "corpus_mix_weights",
    oracle="""
WITH counts AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS total, count(*) AS k FROM counts)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(floor(n_docs / total * 1000000) AS BIGINT) AS share_ppm,
       CAST(floor((1.0 / k) / (n_docs / total) * 1000000) AS BIGINT) AS weight_ppm
FROM counts, tot
""",
    doc="Per-source mixture weights toward a uniform target "
        "(weight>1 => oversample); shares in integer ppm for exact "
        "hashing. Tiny output — applied downstream as a broadcast join.",
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return CU.mix_weights(d, strata_col="source")


@query(
    "fuzzy_edit_pairs",
    oracle="""
WITH base AS (
  SELECT doc_id AS id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
  FROM documents),
b2 AS (
  SELECT id,
         array_to_string(list_slice(string_split(norm, ' '), 1, 2), ' ') AS block,
         substring(norm, 1, 48) AS prefix
  FROM base
  WHERE norm <> ''
  QUALIFY count(*) OVER (PARTITION BY block) <= 1000)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.prefix, b.prefix) AS INT) AS edit_dist
FROM b2 a JOIN b2 b ON a.block = b.block AND a.id < b.id
WHERE levenshtein(a.prefix, b.prefix) <= 12
""",
    doc="Edit-distance fuzzy dedup: levenshtein on a 48-char prefix, "
        "gated by an opening-bigram blocking key — the quadratic arm "
        "runs only inside blocks (equi-join, one shuffle).",
)
def fuzzy_edit_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    out = CU.edit_distance_pairs(d, prefix_len=48, max_dist=12)
    return out.select("id_a", "id_b", F.col("edit_dist").cast("int").alias("edit_dist"))


@query(
    "strip_markup",
    oracle="""
WITH seeded AS (
  SELECT doc_id,
         '<div class="post"><b>' || text || '</b>&nbsp;&amp; more <br/>' AS raw
  FROM documents)
SELECT doc_id,
       trim(regexp_replace(
         replace(replace(replace(replace(replace(
           regexp_replace(raw, '<[^>]*>', ' ', 'g'),
           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
           '&nbsp;', ' '), '&amp;', '&'),
         '\\s+', ' ', 'g')) AS clean
FROM seeded
""",
    doc="Boilerplate removal: strip tags, decode common entities, "
        "collapse whitespace — regexp_replace chain, whole-stage "
        "codegen, no UDF. Markup is seeded synthetically (corpus text "
        "is plain).",
)
def strip_markup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit('<div class="post"><b>'), F.col("text"),
        F.lit("</b>&nbsp;&amp; more <br/>"),
    )
    return d.select("doc_id", CU.strip_markup(raw).alias("clean"))


@query(
    "doc_gopher_quality",
    oracle=r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks, text
  FROM documents),
f AS (
  SELECT doc_id,
         len(toks) AS n_words,
         round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
               / len(toks), 4) AS mean_word_len,
         round(CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE)
               / len(toks), 4) AS symbol_ratio,
         round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
               AS DOUBLE) / len(toks), 4) AS alpha_ratio,
         len(list_intersect(list_transform(toks, x -> lower(x)),
             ['the','be','to','of','and','that','have','with'])) AS stop_hits
  FROM t)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       mean_word_len, symbol_ratio, alpha_ratio,
       CAST(stop_hits AS BIGINT) AS stopword_hits,
       (n_words >= 50 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_ratio <= 0.1 AND alpha_ratio >= 0.8
        AND stop_hits >= 2) AS passes_gopher
FROM f
""",
    doc="Gopher-rule quality gates (Rae et al. 2021 A1): word-count and "
        "mean-word-length bounds, symbol-to-word ratio, alphabetic-word "
        "fraction, distinct-stopword presence — every metric emitted "
        "plus the conjunction; pure codegen expressions.",
)
def doc_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    feats = TX.gopher_rules(F.col("text"))
    return d.select("doc_id", *[v.alias(k) for k, v in feats.items()])


@query(
    "corpus_epoch_plan",
    oracle="""
WITH counts AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS total, count(*) AS k FROM counts),
w AS (
  SELECT source,
         CAST(floor((1.0 / k) / (n_docs / total) * 1000000) AS BIGINT)
           AS weight_ppm
  FROM counts, tot),
planned AS (
  SELECT d.doc_id, d.source, w.weight_ppm,
         ('0x' || substr(md5('epoch0:' || d.doc_id), 1, 15))::BIGINT
           % 1000000 AS draw
  FROM documents d JOIN w USING (source))
SELECT doc_id, source,
       CAST(weight_ppm // 1000000
            + CASE WHEN draw < weight_ppm % 1000000 THEN 1 ELSE 0 END
         AS BIGINT) AS n_copies
FROM planned
""",
    doc="Epoch replication plan: each doc's copy count for one training "
        "epoch = floor(mix weight) + a hash-thresholded extra copy for "
        "the fractional part (deterministic stochastic rounding — no "
        "RNG, reproducible across engines and runs; per-source expected "
        "copy mass equals the target mixture). Broadcast weight join, "
        "zero extra shuffles; n_copies=0 means the doc sits out the "
        "epoch (down-sampling).",
)
def corpus_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.operators.dedup import hash64

    d = load(spark, sf_dir, "documents")
    w = CU.mix_weights(d, strata_col="source").select("source", "weight_ppm")
    draw = hash64(F.concat(F.lit("epoch0:"), F.col("doc_id"))) % 1_000_000
    return (
        d.join(F.broadcast(w), "source")
        .select(
            "doc_id", "source",
            (
                F.expr("weight_ppm div 1000000")
                + F.when(draw < F.col("weight_ppm") % 1_000_000, 1).otherwise(0)
            ).cast("long").alias("n_copies"),
        )
    )


@query(
    "doc_domain_caps",
    oracle="""
SELECT doc_id, source, CAST(rk AS INT) AS rk
FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents)
WHERE rk <= 25
""",
    doc="Per-domain cap: keep the top-25 docs per source by "
        "(n_chars desc, doc_id) — the guard against one domain "
        "flooding the training mix. One shuffle on the domain key, "
        "window-local rank, rows past the cap pruned immediately.",
)
def doc_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return CU.domain_caps(d, cap=25).select(
        "doc_id", "source", F.col("rk").cast("int").alias("rk")
    )


@query(
    "corpus_hash_split",
    oracle="""
WITH assigned AS (
  SELECT CASE
           WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80 THEN 'train'
           WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'val'
           ELSE 'test'
         END AS split,
         len(string_split(text, ' ')) AS n_toks
  FROM documents)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens
FROM assigned GROUP BY split
""",
    doc="Deterministic train/val/test split (80/10/10) by md5-bucket "
        "of doc_id — leakage-safe: membership is a pure function of "
        "the id, stable across runs/engines/re-shards. Output is the "
        "per-split doc and token census.",
)
def corpus_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            CU.hash_split(F.col("doc_id").cast("string")).alias("split"),
            F.size(F.split("text", " ")).alias("n_toks"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
    )


@query(
    "doc_blocklist_filter",
    oracle="""
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                            t -> t IN ('slow', 'dup'))) AS INT) AS n_blocked,
       len(list_filter(string_split_regex(trim(text), '\\s+'),
                       t -> t IN ('slow', 'dup'))) > 0 AS blocked
FROM documents
""",
    doc="C4-style blocklist gate: per-doc count of banned tokens "
        "(exact whitespace-token match) and the drop verdict. One "
        "codegen'd pass over the token array, no shuffle, no UDF.",
)
def doc_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    hits = CU.blocklist_hits(F.col("text"), ["slow", "dup"])
    return d.select(
        "doc_id",
        hits.cast("int").alias("n_blocked"),
        (hits > 0).alias("blocked"),
    )


@query(
    "vocab_zipf_coverage",
    oracle="""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents),
t2 AS (SELECT tok FROM toks WHERE tok <> ''),
counts AS (SELECT tok, count(*) AS cnt FROM t2 GROUP BY tok),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
ranked AS (
  SELECT tok, CAST(cnt AS BIGINT) AS cnt,
         row_number() OVER (ORDER BY cnt DESC, tok) AS rnk
  FROM counts)
SELECT tok, cnt, CAST(rnk AS INT) AS rnk,
       CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm,
       CAST(sum(cnt) OVER (ORDER BY rnk
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            * 1000000 // total AS BIGINT) AS cum_ppm
FROM ranked, tot
WHERE rnk <= 50
""",
    doc="Zipf head of the corpus vocabulary: top-50 tokens with rank, "
        "ppm share, and CUMULATIVE coverage — the tokenizer-design "
        "query (how much of the stream do k types cover). The global "
        "rank window runs on the top-50 slice only: counts are "
        "aggregated, top-k'd via orderBy+limit (2-phase top-k, no "
        "single-task sort of the vocabulary), then ranked; the "
        "corpus-total is a 1-row broadcast.",
)
def vocab_zipf_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.split(F.trim(F.lower("text")), r"\s+")
        ).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("long").alias("total"))
    top = counts.orderBy(F.col("cnt").desc(), "tok").limit(50)
    w = Window.orderBy(F.col("cnt").desc(), "tok")
    cum = (
        Window.orderBy(F.col("cnt").desc(), "tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("int"))
        .withColumn("__cum", F.sum("cnt").over(cum))
        .join(F.broadcast(total))
        .select(
            "tok", "cnt", "rnk",
            F.expr("cnt * 1000000 div total").cast("long").alias("share_ppm"),
            F.expr("__cum * 1000000 div total").cast("long").alias("cum_ppm"),
        )
    )


@query(
    "diversity_ngram_ratio",
    oracle="""
WITH t AS (
  SELECT source, string_split(text, ' ') AS tk FROM documents),
expl AS (
  SELECT source, tk,
         unnest(range(1, greatest(len(tk) - 1, 1))) AS i
  FROM t),
grams AS (
  SELECT source, array_to_string(list_slice(tk, i, i + 2), ' ') AS gram
  FROM expl)
SELECT source,
       CAST(count(*) AS BIGINT) AS total_ngrams,
       CAST(count(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
       CAST(count(DISTINCT gram) * 1000000 // count(*) AS BIGINT)
         AS diversity_ppm
FROM grams GROUP BY source
""",
    doc="N-gram diversity per source: distinct/total trigram ratio — "
        "the memorization/templated-content signal (low ratio = "
        "repetitive source; the self-BLEU axis of corpus QA). "
        "Trigram explode + one grouped count-distinct (partial "
        "aggregation map-side); at 100 TB swap the exact distinct for "
        "approx_count_distinct — same plan, bounded state.",
)
def diversity_ngram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = d.select("source", F.split("text", " ").alias("tk"))
    # docs with < 3 tokens have no trigram (oracle's range(1, max(n-1,1))
    # is empty for them) — filter before the explode, don't special-case
    expl = t.filter(F.size("tk") >= 3).select(
        "source", "tk",
        F.explode(F.sequence(F.lit(1), F.size("tk") - 2)).alias("i"),
    )
    grams = expl.select(
        "source", F.concat_ws(" ", F.expr("slice(tk, i, 3)")).alias("gram")
    )
    return grams.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("total_ngrams"),
        F.countDistinct("gram").cast("long").alias("distinct_ngrams"),
        F.expr("count(distinct gram) * 1000000 div count(*)")
         .cast("long").alias("diversity_ppm"),
    )


@query(
    "sample_weighted",
    oracle="""
WITH keyed AS (
  SELECT doc_id, n_chars,
         ('0x' || substr(md5('ws:' || doc_id), 1, 8))::BIGINT % 1000000000
           AS draw
  FROM documents),
scored AS (
  SELECT doc_id, n_chars, draw,
         CAST(draw * 1000 // n_chars AS BIGINT) AS sample_key
  FROM keyed)
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, sample_key,
       CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, row_number() OVER (ORDER BY sample_key, doc_id) AS rnk
  FROM scored)
WHERE rnk <= 50
""",
    doc="Weighted sampling without replacement (probability ~ doc "
        "length): each doc gets the deterministic priority key "
        "draw*1000//weight (draw = md5-hash in [0,1e9); the integer "
        "twin of the Efraimidis-Spirakis exponential key) and the 50 "
        "smallest keys win. Map-side key computation + one 2-phase "
        "top-k (orderBy+limit) — no global sort materialized, no RNG, "
        "re-runs and engines agree exactly.",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from advanced_strapi_import_spark.operators.dedup import hash32

    d = load(spark, sf_dir, "documents")
    draw = hash32(F.concat(F.lit("ws:"), F.col("doc_id"))) % 1_000_000_000
    scored = d.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("weight"),
        draw.alias("__draw"),
    ).select(
        "doc_id", "weight",
        F.expr("__draw * 1000 div weight").cast("long").alias("sample_key"),
    )
    top = scored.orderBy("sample_key", "doc_id").limit(50)
    w = Window.orderBy("sample_key", "doc_id")
    return top.withColumn("rnk", F.row_number().over(w).cast("int"))


@query(
    "vocab_oov_rate",
    oracle=r"""
WITH toks AS (
  SELECT lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
  FROM documents),
t2 AS (SELECT lang, tok FROM toks WHERE tok <> ''),
vocab AS (
  SELECT tok FROM (SELECT tok, count(*) AS cnt FROM t2 GROUP BY tok)
  ORDER BY cnt DESC, tok LIMIT 1000)
SELECT lang,
       CAST(count(*) AS BIGINT) AS total_toks,
       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS oov_toks,
       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS oov_ppm
FROM t2 LEFT JOIN vocab v USING (tok)
GROUP BY lang
""",
    doc="Tokenizer-coverage audit: per-language out-of-vocabulary rate "
        "against the corpus's own top-1000 token vocabulary "
        "(deterministic count-desc/token tie-break). The vocabulary is "
        "an aggregate capped at 1000 rows, so the membership probe is "
        "a broadcast-hash left join against the token stream — no "
        "second shuffle of the corpus. The standard pre-training check "
        "that a tokenizer/vocab choice doesn't starve a language "
        "split; integer ppm keeps the hash exact.",
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy(F.col("__cnt").desc(), "tok")
        .limit(1000)
        .select("tok", F.lit(True).alias("__in_vocab"))
    )
    oov = F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_toks"),
            F.sum(oov).cast("long").alias("oov_toks"),
        )
        .select(
            "lang",
            "total_toks",
            "oov_toks",
            F.expr("oov_toks * 1000000 div total_toks")
            .cast("long")
            .alias("oov_ppm"),
        )
    )


@query(
    "seq_pack_efficiency",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents),
sized AS (
  SELECT doc_id, toks, len(toks) AS n,
         greatest(1, CAST(ceil((len(toks) - 16) / 48.0) AS INT)) AS n_chunks
  FROM t),
expl AS (
  SELECT doc_id, toks, n_chunks, unnest(range(0, n_chunks)) AS ci
  FROM sized),
chunks AS (
  SELECT doc_id, CAST(ci AS INT) AS chunk_index,
         CAST(len(list_slice(toks, ci * 48 + 1, ci * 48 + 64)) AS BIGINT)
           AS n_tokens,
         CAST(doc_id % 8 AS INT) AS shard
  FROM expl),
packed AS (
  SELECT doc_id, chunk_index, n_tokens, shard,
         CAST(sum(n_tokens) OVER (
              PARTITION BY shard ORDER BY doc_id, chunk_index
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
           AS BIGINT) AS tok_offset
  FROM chunks),
seqs AS (
  SELECT shard,
         CAST(shard * 1099511627776 + floor(tok_offset / 256) AS BIGINT)
           AS seq_id,
         n_tokens
  FROM packed)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(count(DISTINCT seq_id) AS BIGINT) AS n_seqs,
       CAST(CAST(ceil(sum(n_tokens) / 256.0) AS BIGINT) AS BIGINT)
         AS min_seqs,
       CAST((count(DISTINCT seq_id) * 256 - sum(n_tokens)) * 1000000
            // (count(DISTINCT seq_id) * 256) AS BIGINT) AS waste_ppm
FROM seqs GROUP BY shard
""",
    doc="Sequence-packing efficiency audit over the seq_pack_chunks "
        "stream: per shard, packed-sequence count vs the "
        "ceil(total/budget) lower bound and the padding waste in ppm — "
        "the metric that decides whether a packing strategy is worth "
        "its shuffle at pretraining scale. Same single cumsum window "
        "as the packer; the audit itself is one groupBy(shard) over "
        "the chunk stream.",
)
def seq_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    chunks = TX.chunk_documents(d, "text", "doc_id", chunk_tokens=64, overlap=16)
    chunks = chunks.select(
        F.col("id").alias("doc_id"), "chunk_index",
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )
    packed = CU.pack_sequences(chunks, budget=256, n_shards=8)
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.countDistinct("seq_id").alias("n_seqs"),
        )
        .select(
            "shard",
            "n_chunks",
            "total_tokens",
            "n_seqs",
            F.ceil(F.col("total_tokens") / 256.0).cast("long").alias("min_seqs"),
            F.expr(
                "(n_seqs * 256 - total_tokens) * 1000000 div (n_seqs * 256)"
            ).cast("long").alias("waste_ppm"),
        )
    )


@query(
    "source_lang_entropy",
    oracle="""
WITH cnt AS (
  SELECT source, lang, count(*) AS n
  FROM documents GROUP BY source, lang),
tot AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n_langs
  FROM cnt GROUP BY source),
top AS (
  SELECT source, lang AS top_lang
  FROM (SELECT source, lang,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n DESC, lang) AS rn
        FROM cnt) WHERE rn = 1)
SELECT c.source,
       t.total AS n_docs,
       t.n_langs,
       round(-sum((CAST(c.n AS DOUBLE) / t.total)
                  * ln(CAST(c.n AS DOUBLE) / t.total)) / ln(2), 2)
         AS entropy_bits,
       max(p.top_lang) AS top_lang
FROM cnt c JOIN tot t USING (source) JOIN top p USING (source)
GROUP BY c.source, t.total, t.n_langs
""",
    doc="Corpus-composition audit: per-source language-mix Shannon "
        "entropy (bits, rounded 2dp — cross-engine ln agrees far below "
        "the rounding boundary on these magnitudes), language count "
        "and dominant language. Two tiny aggregates over the "
        "(source, lang) rollup; the mix-diversity dashboard that "
        "catches a crawl source silently collapsing to one language. "
        "Dominant language resolves count ties deterministically "
        "(count desc, lang asc rank).",
)
def source_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cnt = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
    )
    from pyspark.sql.window import Window

    wr = Window.partitionBy("source").orderBy(F.col("n").desc(), "lang")
    top = (
        cnt.withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    p = F.col("n").cast("double") / F.col("n_docs")
    return (
        cnt.join(tot, "source")
        .join(top, "source")
        .groupBy("source", "n_docs", "n_langs")
        .agg(
            F.round(-F.sum(p * F.log(p)) / F.log(F.lit(2.0)), 2).alias(
                "entropy_bits"
            ),
            F.max("top_lang").alias("top_lang"),
        )
        .select("source", "n_docs", "n_langs", "entropy_bits", "top_lang")
    )


@query(
    "doc_repeated_ngrams",
    oracle=r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
  FROM documents),
expl AS (
  SELECT doc_id, toks, unnest(range(0, greatest(len(toks) - 7, 0))) AS i
  FROM t),
grams AS (
  SELECT doc_id, array_to_string(list_slice(toks, i + 1, i + 8), ' ') AS gram
  FROM expl),
dup AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS nd FROM grams GROUP BY gram)
  WHERE nd >= 2),
per AS (
  SELECT doc_id, count(*) AS n_ngrams,
         count(*) FILTER (WHERE gram IN (SELECT gram FROM dup)) AS dup_ngrams
  FROM grams GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(n_ngrams, 0) AS BIGINT) AS n_ngrams,
       CAST(coalesce(dup_ngrams, 0) AS BIGINT) AS dup_ngrams,
       CAST(CASE WHEN coalesce(n_ngrams, 0) > 0
                 THEN dup_ngrams * 1000000 // n_ngrams
                 ELSE 0 END AS BIGINT) AS dup_ppm
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
""",
    doc="Cross-doc repeated 8-gram fraction (token-level exact "
        "substring dedup, Lee et al. 2022): an 8-gram present in >=2 "
        "distinct docs is duplicated; each doc reports the ppm of its "
        "8-gram positions carrying one. Grams hash to 63 bits before "
        "any shuffle; no pairwise comparison — O(total tokens).",
)
def doc_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.plans.registry import fan_out

    d = load(spark, sf_dir, "documents")
    # fan_out: the gram explode+hash is the expensive stage; single-
    # row-group test files would otherwise serialize it on one core
    stats = CU.repeated_ngram_stats(fan_out(d), n=8)         .withColumnRenamed("id", "doc_id")
    out = d.select("doc_id").join(stats, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
        F.coalesce("dup_ngrams", F.lit(0)).cast("long").alias("dup_ngrams"),
    )
    return out.select(
        "*",
        F.expr(
            "CASE WHEN n_ngrams > 0 THEN dup_ngrams * 1000000 div n_ngrams "
            "ELSE 0 END"
        ).cast("long").alias("dup_ppm"),
    )


@query(
    "quality_floor_per_source",
    oracle=r"""
WITH f AS (
  SELECT doc_id, source,
         length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
         len(regexp_extract_all(text, '[0-9]')) AS n_digit,
         len(list_filter(string_split(lower(text), ' '),
             t -> list_contains(['the','a','of','and','to','in','is','that','it','for'], t))) AS stop_hits
  FROM documents),
r AS (
  SELECT doc_id, source,
         (CASE WHEN n_chars > 0 THEN round(CAST(n_punct AS DOUBLE) / n_chars, 4) ELSE 0.0 END) AS punct_ratio,
         (CASE WHEN n_chars > 0 THEN round(CAST(n_digit AS DOUBLE) / n_chars, 4) ELSE 0.0 END) AS digit_ratio,
         round(CAST(stop_hits AS DOUBLE) / n_tokens, 4) AS stopword_ratio,
         round(CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens, 4) AS mtl
  FROM f),
s AS (
  SELECT doc_id, source,
         round(greatest(least(
           0.5 + least(stopword_ratio * 2, 0.3)
               - least(punct_ratio * 2, 0.3)
               - least(digit_ratio, 0.2)
               + CASE WHEN mtl >= 3 AND mtl <= 10 THEN 0.2 ELSE 0 END,
           1.0), 0.0), 4) AS quality
  FROM r),
rk AS (
  SELECT doc_id, source, quality,
         row_number() OVER (PARTITION BY source ORDER BY quality, doc_id) AS q_rank,
         count(*) OVER (PARTITION BY source) AS n_docs
  FROM s)
SELECT doc_id, source, quality,
       CAST(q_rank AS BIGINT) AS q_rank,
       CAST(n_docs AS BIGINT) AS n_docs,
       q_rank > n_docs * 1 // 4 AS kept
FROM rk
""",
    doc="Per-source quality floor: documents rank by the composite "
        "quality score WITHIN their source and the bottom quartile is "
        "cut per source (integer-exact rank > n*1//4 — no float "
        "percentile), so a noisy source can't flood the corpus and a "
        "clean one isn't over-trimmed. One shuffle on the source key; "
        "rank and stratum size share the window exchange.",
)
def quality_floor_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    scored = TX.with_quality(d).select("doc_id", "source", "quality")
    return CU.quality_floor(scored, score_col="quality", by="source")


@query(
    "doc_tokens_udtf",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
e AS (
  SELECT doc_id, toks, unnest(range(0, len(toks))) AS pos FROM t)
SELECT doc_id,
       CAST(pos AS INT) AS pos,
       toks[pos + 1] AS token,
       list_contains(['the','a','of','and','to','in','is','that','it','for'],
                     lower(toks[pos + 1])) AS is_stop
FROM e
""",
    doc="Python UDTF surface (Spark 4 user-defined TABLE function): "
        "one doc row fans out to (pos, token, is_stop) rows through a "
        "LATERAL join against an Arrow-evaluated UDTF — the plug-in "
        "point for Python-only taggers/tokenizers; bulk tokenization "
        "itself stays native (text_token_counts).",
)
def doc_tokens_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return TX.explode_tokens_udtf(d)


@query(
    "customer_record_linkage",
    oracle="""
WITH a AS (
  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nk,
         c_acctbal AS bal, c_mktsegment AS seg,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket
  FROM customer),
b AS (
  SELECT c_custkey + 100000 AS id,
         CASE WHEN c_custkey % 4 = 0 THEN c_name || ' jr' ELSE c_name END AS name,
         c_nationkey AS nk,
         CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 0.5 ELSE c_acctbal END AS bal,
         CASE WHEN c_custkey % 5 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg,
         CAST(floor(CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 0.5
                         ELSE c_acctbal END / 1000) AS BIGINT) AS bal_bucket
  FROM customer),
scored AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(CASE WHEN a.name = b.name THEN 40 ELSE -12 END AS BIGINT) AS w_name,
         CAST(CASE WHEN abs(a.bal - b.bal) <= 1.0 THEN 20 ELSE -8 END AS BIGINT) AS w_bal,
         CAST(CASE WHEN a.seg = b.seg THEN 6 ELSE -3 END AS BIGINT) AS w_seg
  FROM a JOIN b ON a.nk = b.nk AND a.bal_bucket = b.bal_bucket)
SELECT id_a, id_b, w_name, w_bal, w_seg,
       CAST(w_name + w_bal + w_seg AS BIGINT) AS score
FROM scored
WHERE w_name + w_bal + w_seg >= 40
""",
    doc="Probabilistic record linkage (Fellegi-Sunter): customers vs a "
        "perturbed twin registry, blocked on (nation, acctbal-bucket) "
        "— an equi-join, never a cross join — with integer centi-log-"
        "odds per field (name exact, balance within 1.00, segment) "
        "summed to an engine-exact match score; threshold 40 keeps "
        "true twins and drops coincidental same-block pairs. The "
        "weighted-evidence complement to the reference's deterministic "
        "resolve cascade.",
)
def customer_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.operators.linkage import (
        FieldComparison, linkage_matches, linkage_scores,
    )

    c = load(spark, sf_dir, "customer")
    a = c.select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nk"), F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
    )
    pert_bal = F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 0.5) \
        .otherwise(F.col("c_acctbal"))
    b = c.select(
        (F.col("c_custkey") + 100000).alias("id"),
        F.when(F.col("c_custkey") % 4 == 0, F.concat("c_name", F.lit(" jr")))
         .otherwise(F.col("c_name")).alias("name"),
        F.col("c_nationkey").alias("nk"),
        pert_bal.alias("bal"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("MOVED"))
         .otherwise(F.col("c_mktsegment")).alias("seg"),
        F.floor(pert_bal / 1000).cast("long").alias("bal_bucket"),
    )
    fields = [
        FieldComparison("name", lambda: F.col("a.name") == F.col("b.name"), 40, -12),
        FieldComparison("bal", lambda: F.abs(F.col("a.bal") - F.col("b.bal")) <= 1.0, 20, -8),
        FieldComparison("seg", lambda: F.col("a.seg") == F.col("b.seg"), 6, -3),
    ]
    scores = linkage_scores(a, b, block_on=["nk", "bal_bucket"], fields=fields)
    return linkage_matches(scores, threshold=40)


# ---------------------------------------------------------------------------
# tokenizer fertility per (lang, source)
# ---------------------------------------------------------------------------
@query(
    "tokenizer_fertility",
    oracle=r"""
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(len(regexp_extract_all(
           text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
           AS total_bpe_tokens,
       CASE WHEN sum(len(regexp_extract_all(
                     text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) > 0
            THEN round(CAST(sum(n_chars) AS DOUBLE) /
                       sum(len(regexp_extract_all(
                           text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))), 4)
            END AS chars_per_token
FROM documents
GROUP BY lang, source
""",
    doc="Tokenizer fertility (chars per BPE-ish token) per (lang, "
        "source) stratum — the compression-rate signal that drives "
        "per-language token budgets and mixture weights (a tokenizer "
        "that spends 3x the tokens per char on one language silently "
        "shrinks its effective epoch share). One regexp_count per doc "
        "+ a low-cardinality groupBy; map-side partials carry three "
        "longs per stratum, so the shuffle is a few KB at any corpus "
        "size.",
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.plans.registry import fan_out

    d = fan_out(load(spark, sf_dir, "documents"))
    per_doc = d.select(
        "lang", "source", "n_chars",
        TX.token_count_bpe(F.col("text")).alias("__bpe"),
    )
    return per_doc.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("__bpe").cast("long").alias("total_bpe_tokens"),
        # an all-empty stratum has zero BPE tokens; NULL fertility,
        # never an ANSI divide-by-zero
        F.when(
            F.sum("__bpe") > 0,
            F.round(F.sum("n_chars").cast("double") / F.sum("__bpe"), 4),
        ).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# model-based quality scoring (classifier-filter pattern)
# ---------------------------------------------------------------------------
@query(
    "doc_model_quality_score",
    oracle=r"""
WITH f AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
         len(regexp_extract_all(text, '[0-9]')) AS n_digit,
         len(list_filter(string_split(lower(text), ' '),
             t -> list_contains(['the','a','of','and','to','in','is','that','it','for'], t))) AS stop_hits
  FROM documents),
r AS (
  SELECT doc_id,
         (CASE WHEN n_chars > 0 THEN round(CAST(n_punct AS DOUBLE) / n_chars, 4) ELSE 0.0 END) AS punct_ratio,
         (CASE WHEN n_chars > 0 THEN round(CAST(n_digit AS DOUBLE) / n_chars, 4) ELSE 0.0 END) AS digit_ratio,
         round(CAST(stop_hits AS DOUBLE) / n_tokens, 4) AS stopword_ratio,
         round(CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens, 4) AS mean_token_len
  FROM f),
z AS (
  SELECT doc_id,
         -1.2 + 6.0 * stopword_ratio - 4.0 * punct_ratio
              - 2.0 * digit_ratio
              - 0.15 * abs(mean_token_len - 6.0) AS logit
  FROM r)
SELECT doc_id,
       round(1.0 / (1.0 + exp(-logit)), 4) AS model_score,
       (round(1.0 / (1.0 + exp(-logit)), 4) >= 0.5) AS kept
FROM z
""",
    doc="Model-based quality filtering (the FineWeb-Edu/DCLM classifier "
        "pattern, linearized): a fixed-weight logistic model scored "
        "IN-ROW over the staged quality features — sigmoid(-1.2 + "
        "6*stopword - 4*punct - 2*digit - 0.15*|mean_len-6|), kept at "
        "0.5. The weights are literals baked into the plan exactly the "
        "way a distilled linear head ships to a 100 TB scoring job: "
        "zero shuffle, whole-stage codegen, no model server in the "
        "loop. Feature ratios are rounded to 4 before the dot product "
        "so both engines feed the sigmoid identical doubles.",
)
def doc_model_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.plans.registry import fan_out

    d = fan_out(load(spark, sf_dir, "documents")).withColumn(
        "__toks", TX.tokens(F.col("text"))
    )
    f = TX.quality_features(F.col("text"), toks=F.col("__toks"))
    logit = (
        F.lit(-1.2)
        + F.lit(6.0) * f["stopword_ratio"]
        - F.lit(4.0) * f["punct_ratio"]
        - F.lit(2.0) * f["digit_ratio"]
        - F.lit(0.15) * F.abs(f["mean_token_len"] - F.lit(6.0))
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 4)
    return d.select(
        "doc_id",
        score.alias("model_score"),
        (score >= 0.5).alias("kept"),
    )


@query(
    "source_top_p_docs",
    oracle="""
WITH w AS (
  SELECT source, n_chars,
         sum(n_chars) OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS cum,
         sum(n_chars) OVER (PARTITION BY source) AS total
  FROM documents)
SELECT source,
       CAST(count(*) FILTER (WHERE cum <= 0.9 * total) AS BIGINT) AS n_kept,
       CAST(count(*) AS BIGINT) AS n_total,
       round(coalesce(sum(n_chars) FILTER (WHERE cum <= 0.9 * total), 0)
             * 1.0 / max(total), 6) AS kept_mass_share,
       CAST(coalesce(min(n_chars) FILTER (WHERE cum <= 0.9 * total), 0)
            AS BIGINT) AS threshold_len
FROM w GROUP BY source
""",
    doc="Top-p (nucleus) selection per source: docs are ranked by length "
        "within their source and kept while the running mass stays "
        "under 90% of the source's total — the data-side analog of "
        "nucleus sampling, and a sharper truncation than doc_domain_caps "
        "(which caps COUNT; this caps token MASS, so one source's "
        "few huge docs can't dominate the mixture). The cumulative-sum "
        "window is partitioned by source (scale-safe); ordering ties "
        "are broken by doc_id so both engines walk the same sequence.",
)
def source_top_p_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    ws = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    wt = Window.partitionBy("source")
    w = d.select(
        "source",
        "n_chars",
        F.sum("n_chars").over(ws).alias("cum"),
        F.sum("n_chars").over(wt).alias("total"),
    )
    kept = F.col("cum") <= 0.9 * F.col("total")
    return w.groupBy("source").agg(
        F.count(F.when(kept, 1)).cast("long").alias("n_kept"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.round(
            # try_divide: a source whose docs are all n_chars=0 has
            # total=0; Spark ANSI hard-errors on /0 even for doubles
            # while the DuckDB oracle yields NULL.
            F.try_divide(
                F.coalesce(F.sum(F.when(kept, F.col("n_chars"))), F.lit(0))
                * F.lit(1.0),
                F.max("total"),
            ),
            6,
        ).alias("kept_mass_share"),
        F.coalesce(F.min(F.when(kept, F.col("n_chars"))), F.lit(0))
        .cast("long")
        .alias("threshold_len"),
    )


@query(
    "source_jackknife_influence",
    oracle="""
WITH per_src AS (
  SELECT source, count(*) AS n_s, sum(n_chars) AS sum_s
  FROM documents GROUP BY source),
tot AS (
  SELECT sum(n_s) AS n, sum(sum_s) AS total FROM per_src)
SELECT p.source, CAST(p.n_s AS BIGINT) AS n_docs,
       round(t.total * 1.0 / t.n, 4) AS mean_all,
       round((t.total - p.sum_s) * 1.0 / (t.n - p.n_s), 4) AS mean_excl,
       round(t.total * 1.0 / t.n
             - (t.total - p.sum_s) * 1.0 / (t.n - p.n_s), 6) AS influence
FROM per_src p CROSS JOIN tot t
""",
    doc="Jackknife (leave-one-source-out) influence of each source on "
        "the corpus mean document length: one map-side-combinable "
        "per-source aggregate plus a 1-row total broadcast — the "
        "delete-one-group jackknife that screens for a source skewing "
        "a corpus statistic before it is mixed in. All sums are exact "
        "BIGINT, so the per-engine division operands are bit-equal; "
        "mean_excl goes through try_divide so a single-source corpus "
        "yields NULL (DuckDB's x/0) instead of an ANSI-mode error.",
)
def source_jackknife_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_s"), F.sum("n_chars").alias("sum_s")
    )
    tot = per.agg(F.sum("n_s").alias("n"), F.sum("sum_s").alias("total"))
    mean_all = F.col("total") * F.lit(1.0) / F.col("n")
    mean_excl = F.try_divide(
        (F.col("total") - F.col("sum_s")) * F.lit(1.0),
        F.col("n") - F.col("n_s"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n_s").cast("long").alias("n_docs"),
        F.round(mean_all, 4).alias("mean_all"),
        F.round(mean_excl, 4).alias("mean_excl"),
        F.round(mean_all - mean_excl, 6).alias("influence"),
    )


@query(
    "doc_gazetteer_mentions",
    oracle="""
WITH gaz(term, category) AS (VALUES
  ('spark', 'engine'), ('table', 'storage'), ('merge', 'operation'),
  ('hash', 'operation'), ('window', 'operation'), ('scan', 'operation')),
toks AS (
  SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS term
  FROM documents),
hits AS (
  SELECT t.doc_id, t.source, g.term, g.category
  FROM toks t JOIN gaz g USING (term))
SELECT term, category,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_mentions,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM hits GROUP BY term, category
""",
    doc="Dictionary-based entity tagging (gazetteer NER): a curated "
        "term -> category dictionary broadcast-joined against the "
        "tokenized corpus, rolled up to per-entity document/mention/"
        "source counts — the cheap entity-coverage scan run before "
        "spending model inference on a corpus, and the shape of every "
        "blocklist/allowlist tagger. The gazetteer is a literal "
        "6-term VALUES table here; production swaps in a table of "
        "any size — the plan (broadcast the dictionary, never shuffle "
        "the corpus for the join, aggregate hits only) is unchanged "
        "until the dictionary itself outgrows broadcast, at which "
        "point the join key flips to the token with the corpus "
        "already partitioned by it.",
)
def doc_gazetteer_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.operators.similarity import _local_df

    gaz = _local_df(
        spark,
        [
            ("spark", "engine"), ("table", "storage"),
            ("merge", "operation"), ("hash", "operation"),
            ("window", "operation"), ("scan", "operation"),
        ],
        "term string, category string",
    )
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower("text"), " ")).alias("term"),
    )
    hits = toks.join(F.broadcast(gaz), "term")
    return hits.groupBy("term", "category").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_mentions"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )


# ---------------------------------------------------------------------------
# DSIR-style hashed-unigram importance weights (round 5)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 1024


@query(
    "doc_dsir_importance",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents),
t2 AS (
  SELECT doc_id,
         ('0x' || substr(md5(term), 1, 8))::BIGINT % {_DSIR_BUCKETS}
             AS bucket
  FROM toks WHERE term <> ''),
tgt AS (SELECT doc_id FROM documents WHERE lang = 'en'),
tc AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS tc
  FROM t2 JOIN tgt USING (doc_id) GROUP BY bucket),
rc AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS rc FROM t2 GROUP BY bucket),
tot AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM t2 JOIN tgt USING (doc_id))
             AS tt,
         (SELECT CAST(count(*) AS BIGINT) FROM t2) AS tr),
w AS (
  SELECT rc.bucket,
         CAST(floor((ln((coalesce(tc.tc, 0) + 1) * 1.0
                        / (tot.tt + {_DSIR_BUCKETS}))
                     - ln((rc.rc + 1) * 1.0
                          / (tot.tr + {_DSIR_BUCKETS}))) * 1000)
              AS BIGINT) AS w_mil
  FROM rc LEFT JOIN tc USING (bucket) CROSS JOIN tot)
SELECT t2.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(w.w_mil) AS BIGINT) AS importance_millinats
FROM t2 JOIN w USING (bucket)
GROUP BY t2.doc_id
""",
    doc="DSIR-style importance weights (Xie et al. 2023: Data Selection "
        "for LMs via Importance Resampling) with hashed unigram "
        "features: every token hashes into one of 1024 md5 buckets "
        "(md5 is engine-portable, unlike Spark's hash()); the weight "
        "of a bucket is the smoothed log-ratio of its target-corpus "
        "probability (here: lang='en' docs) to its raw-corpus "
        "probability, fixed-pointed to BIGINT milli-nats so the "
        "per-document sum is exact and order-free; documents that "
        "look like the target domain score high and become sampling "
        "candidates. Scale shape: the 1024-row weight table is the "
        "only global state and broadcasts back onto the token stream; "
        "the per-doc reduce reuses the doc partitioning — the same "
        "model-broadcast pattern as doc_unigram_logprob.",
)
def doc_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    from advanced_strapi_import_spark.caching import persist_tracked

    t2 = persist_tracked(
        d.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .select(
            "doc_id",
            (
                F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long")
                % _DSIR_BUCKETS
            ).alias("bucket"),
        )
    )
    # NO broadcast hint: the target set is corpus-sized (every 'en'
    # doc id) — a left-semi membership join lets AQE pick the strategy
    # at bench scale and shuffles correctly at 100 TB
    tgt = d.filter(F.col("lang") == "en").select("doc_id")
    t2_tgt = t2.join(tgt, "doc_id", "left_semi")
    tc = t2_tgt.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("tc")
    )
    rc = t2.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("rc"))
    tot = t2_tgt.agg(F.count(F.lit(1)).cast("long").alias("tt")).crossJoin(
        t2.agg(F.count(F.lit(1)).cast("long").alias("tr"))
    )
    # tc/rc are <= 1024-row bucket aggregates, but behind the persisted
    # token stream Catalyst lacks stats and would sort-merge them
    w = (
        rc.join(F.broadcast(tc), "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.floor(
                (
                    F.log(
                        (F.coalesce("tc", F.lit(0)) + 1)
                        * 1.0
                        / (F.col("tt") + _DSIR_BUCKETS)
                    )
                    - F.log(
                        (F.col("rc") + 1) * 1.0 / (F.col("tr") + _DSIR_BUCKETS)
                    )
                )
                * 1000
            )
            .cast("long")
            .alias("w_mil"),
        )
    )
    return (
        t2.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("w_mil").cast("long").alias("importance_millinats"),
        )
    )


# ---------------------------------------------------------------------------
# exact-duplication rate per source (round 5)
# ---------------------------------------------------------------------------


@query(
    "corpus_dedup_rate_by_source",
    oracle="""
WITH keyed AS (
  SELECT doc_id, source, md5(trim(lower(text))) AS k FROM documents),
grp AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM keyed GROUP BY k)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN grp.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_docs,
       CAST(sum(CASE WHEN grp.n > 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS dup_rate_ppm
FROM keyed JOIN grp USING (k)
GROUP BY source
""",
    doc="Exact-duplication rate per source — the first dashboard a "
        "curation team asks for ('which feed is flooding us with "
        "copies?'): documents grouped by md5 of normalized text (the "
        "digest is the shuffle key, never the full text — at 100 TB "
        "the text column stays in place and 16 bytes travel), each "
        "doc flagged if its group has >1 member, rates in exact ppm "
        "per source. Two shuffles: digest groupBy and the source "
        "rollup; the digest->count table joins back by digest.",
)
def corpus_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id", "source", F.md5(F.trim(F.lower("text"))).alias("k")
    )
    grp = keyed.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        keyed.join(grp, "k")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_docs"),
            F.expr(
                "CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) * 1000000 "
                "div count(*) AS BIGINT)"
            ).alias("dup_rate_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# exact interpolated length percentiles per language (round 5)
# ---------------------------------------------------------------------------


@query(
    "doc_length_percentiles_by_lang",
    oracle="""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(quantile_cont(n_chars, 0.25), 2) AS p25,
       round(quantile_cont(n_chars, 0.50), 2) AS p50,
       round(quantile_cont(n_chars, 0.75), 2) AS p75,
       round(quantile_cont(n_chars, 0.90), 2) AS p90
FROM documents GROUP BY lang
""",
    doc="Exact interpolated document-length percentiles per language — "
        "the sizing profile behind per-language chunking budgets "
        "(approx_percentile answers the same question with error "
        "bounds at events_approx_quantiles; this is the exact form "
        "for the low-cardinality group case). Spark's percentile() "
        "and DuckDB's quantile_cont interpolate identically on exact "
        "integer inputs (the Theil-Sen precedent); inputs are BIGINT "
        "n_chars so the rational interpolation is engine-identical "
        "before the 2-decimal guard round. Exact percentile sorts "
        "per group IN the aggregate — fine while per-lang rows fit a "
        "task (languages are few and docs collapse to one value "
        "column); the approximate sketch is the unbounded-cardinality "
        "path.",
)
def doc_length_percentiles_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.expr("percentile(n_chars, 0.25)"), 2).alias("p25"),
        F.round(F.expr("percentile(n_chars, 0.50)"), 2).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.75)"), 2).alias("p75"),
        F.round(F.expr("percentile(n_chars, 0.90)"), 2).alias("p90"),
    )


# ---------------------------------------------------------------------------
# token-budget mixture plan (round 6)
# ---------------------------------------------------------------------------
_MIX_WEIGHTS = [
    ("en", 400000), ("fr", 200000), ("es", 200000),
    ("de", 100000), ("zh", 100000),
]


@query(
    "corpus_mixture_plan",
    oracle=f"""
WITH w(lang, weight_ppm) AS (VALUES
  {", ".join(f"('{lang}', {w}::BIGINT)" for lang, w in _MIX_WEIGHTS)}),
avail AS (
  SELECT lang,
         CAST(sum(len(list_filter(string_split(text, ' '),
                                   x -> x <> ''))) AS BIGINT)
             AS avail_tokens
  FROM documents GROUP BY lang),
j AS (
  SELECT w.lang, w.weight_ppm, a.avail_tokens,
         avail_tokens * 1000000 // weight_ppm AS cap
  FROM w JOIN avail a USING (lang)),
b AS (SELECT *, min(cap) OVER () AS budget FROM j)
SELECT lang, weight_ppm, avail_tokens,
       CAST(budget AS BIGINT) AS budget_tokens,
       CAST(budget * weight_ppm // 1000000 AS BIGINT) AS need_tokens,
       CAST((budget * weight_ppm // 1000000) * 1000000
            // greatest(avail_tokens, 1) AS BIGINT) AS rate_ppm,
       cap = budget AS binding
FROM b
""",
    doc="Token-budget mixture plan — the data-mixing solver run before "
        "every pretraining job: given target language weights (ppm) "
        "and the measured per-language token supply, find the LARGEST "
        "total budget B with every sampling rate <= 1 (no upsampling): "
        "B = min over languages of avail/weight, the binding language "
        "saturates (rate 1e6 ppm) and every other language downsamples "
        "to exactly B*w tokens. One corpus pass computes supply "
        "(in-row token count, low-cardinality groupBy); the solver "
        "itself is pure integer arithmetic over |languages| rows — the "
        "min is a window over the DOMAIN-sized plan frame, not data. "
        "All divisions are floor (`div` / `//`) so the plan is "
        "bit-identical across engines; rate_ppm of the binding row "
        "can sit just under 1e6 from double flooring (budget*w//1e6 "
        "then *1e6//avail) — that is the spec, not error.",
)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    n_toks = F.size(F.filter(F.split("text", " "), lambda x: x != F.lit("")))
    avail = d.groupBy("lang").agg(
        F.sum(n_toks).cast("long").alias("avail_tokens")
    )
    weights = F.create_map(
        *[F.lit(x) for pair in _MIX_WEIGHTS for x in pair]
    )
    j = (
        avail.select(
            "lang",
            F.element_at(weights, F.col("lang"))
            .cast("long")
            .alias("weight_ppm"),
            "avail_tokens",
        )
        .filter(F.col("weight_ppm").isNotNull())
        .withColumn(
            "cap", F.expr("avail_tokens * 1000000 div weight_ppm")
        )
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    b = j.withColumn("budget", F.min("cap").over(wall))
    return b.select(
        "lang",
        "weight_ppm",
        "avail_tokens",
        F.col("budget").cast("long").alias("budget_tokens"),
        F.expr("CAST(budget * weight_ppm div 1000000 AS BIGINT)").alias(
            "need_tokens"
        ),
        F.expr(
            # greatest(...,1): a stratum of empty texts has 0 supply ->
            # budget 0 -> 0/0; guarded, both engines emit rate 0
            "CAST((budget * weight_ppm div 1000000) * 1000000 "
            "div greatest(avail_tokens, 1) AS BIGINT)"
        ).alias("rate_ppm"),
        (F.col("cap") == F.col("budget")).alias("binding"),
    )


# ---------------------------------------------------------------------------
# cross-half vocabulary KL divergence (round 6)
# ---------------------------------------------------------------------------
@query(
    "corpus_vocab_kl_divergence",
    oracle="""
WITH toks AS (
  SELECT length(source) = 4 AS half_p,
         unnest(list_filter(string_split(lower(text), ' '),
                            x -> x <> '')) AS term
  FROM documents),
cp AS (SELECT term, CAST(count(*) AS BIGINT) AS c
       FROM toks WHERE half_p GROUP BY term),
cq AS (SELECT term, CAST(count(*) AS BIGINT) AS c
       FROM toks WHERE NOT half_p GROUP BY term),
vocab AS (
  SELECT term FROM cp UNION SELECT term FROM cq),
tot AS (
  SELECT CAST((SELECT coalesce(sum(c), 0) FROM cp) AS BIGINT) AS np,
         CAST((SELECT coalesce(sum(c), 0) FROM cq) AS BIGINT) AS nq,
         CAST((SELECT count(*) FROM vocab) AS BIGINT) AS v),
contrib AS (
  SELECT CAST(floor(
           ((coalesce(p.c, 0) + 1) * 1.0 / (t.np + t.v))
           * (ln((coalesce(p.c, 0) + 1) * 1.0 / (t.np + t.v))
              - ln((coalesce(q.c, 0) + 1) * 1.0 / (t.nq + t.v)))
           * 1000000000) AS BIGINT) AS kn
  FROM vocab
  LEFT JOIN cp p USING (term)
  LEFT JOIN cq q USING (term)
  CROSS JOIN tot t)
SELECT (SELECT v FROM tot) AS vocab_size,
       (SELECT np FROM tot) AS np_tokens,
       (SELECT nq FROM tot) AS nq_tokens,
       CAST(sum(kn) AS BIGINT) AS kl_nano
FROM contrib
""",
    doc="Vocabulary-level KL divergence KL(P||Q) between the two source "
        "halves of the corpus (src0-9 vs src10-19, split by the "
        "length-4 source name): add-one-smoothed unigram distributions "
        "over the UNION vocabulary, per-term contribution "
        "p*(ln p - ln q) fixed-pointed to BIGINT nano-nats so the "
        "reduction is order-independent and engine-exact (the "
        "unigram-logprob micro-nat discipline, one level finer because "
        "per-term p is tiny). This is the distribution-shift audit "
        "behind mixture decisions — DSIR's importance weights "
        "(doc_dsir_importance) are the per-document face of the same "
        "ratio; this is the corpus-level number. One token pass, two "
        "count tables, a vocab-sized three-way hash join; nothing "
        "data-sized after the first shuffle. ULP caveat as in "
        "doc_unigram_logprob.",
)
def corpus_vocab_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = persist_tracked(
        d.select(
            (F.length("source") == 4).alias("half_p"),
            F.explode(
                F.filter(
                    F.split(F.lower("text"), " "), lambda x: x != F.lit("")
                )
            ).alias("term"),
        )
    )
    toks.count()  # materialize before the scalar-total broadcasts derive
    cp = toks.filter("half_p").groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("cp")
    )
    cq = toks.filter("NOT half_p").groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("cq")
    )
    vocab = cp.select("term").union(cq.select("term")).distinct()
    # ONE three-way join, persisted and filled: both the totals and the
    # contribution pass read it (building it twice would redo the cp/cq
    # aggregations and the vocab join)
    j0 = persist_tracked(
        vocab.join(cp, "term", "left").join(cq, "term", "left")
    )
    j0.count()
    tot = j0.agg(
        F.sum(F.coalesce("cp", F.lit(0))).cast("long").alias("np"),
        F.sum(F.coalesce("cq", F.lit(0))).cast("long").alias("nq"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    joined = j0.crossJoin(F.broadcast(tot))
    p = (F.coalesce("cp", F.lit(0)) + 1) * 1.0 / (F.col("np") + F.col("v"))
    q = (F.coalesce("cq", F.lit(0)) + 1) * 1.0 / (F.col("nq") + F.col("v"))
    kn = F.floor(p * (F.log(p) - F.log(q)) * 1000000000).cast("long")
    return joined.agg(
        F.max("v").alias("vocab_size"),
        F.max("np").alias("np_tokens"),
        F.max("nq").alias("nq_tokens"),
        F.sum(kn).cast("long").alias("kl_nano"),
    )


# ---------------------------------------------------------------------------
# Neyman-allocation stratified sampling design (round 6)
# ---------------------------------------------------------------------------
@query(
    "doc_stratified_neyman",
    oracle="""
WITH g AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_chars) AS BIGINT) AS s,
         sum(n_chars::HUGEINT * n_chars) AS ss
  FROM documents GROUP BY lang),
sc AS (
  SELECT lang, n,
         CAST(floor(sqrt(CAST(n::HUGEINT * ss - s::HUGEINT * s AS DOUBLE))
                    * 1000 + 0.5) AS BIGINT) AS score_milli
  FROM g),
t AS (SELECT CAST(sum(score_milli) AS BIGINT) AS tot FROM sc)
SELECT lang, n AS n_docs, score_milli,
       CAST(score_milli * 1000000 // greatest(t.tot, 1) AS BIGINT)
           AS alloc_ppm,
       CAST((score_milli * 1000000 // greatest(t.tot, 1)) * 10000
            // 1000000 AS BIGINT) AS sample_n
FROM sc CROSS JOIN t
""",
    doc="Neyman-allocation stratified sampling design over language "
        "strata: the optimal share of a fixed labeling/eval budget for "
        "stratum h is proportional to N_h * sigma_h of the target "
        "metric (doc length) — equal-allocation wastes budget on "
        "homogeneous strata. The identity N_h*sigma_h = "
        "sqrt(n*sum(x^2) - sum(x)^2) lets the whole score come from "
        "EXACT integer accumulations (HUGEINT/DECIMAL(38,0) squared "
        "sums, the embedding_dim_stats discipline) with one sqrt on "
        "the same exact value in both engines, fixed-pointed to milli "
        "before the integer normalization — so allocation ppm and the "
        "budget-10000 sample counts are bit-exact. One corpus pass, "
        "|strata| rows after; floor allocation means sample_n sums to "
        "<= budget (the deliberate remainder goes to a manual "
        "largest-remainder pass at apply time).",
)
def doc_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    g = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("s"),
        F.sum(
            (F.col("n_chars") * F.col("n_chars")).cast("decimal(38,0)")
        ).alias("ss"),
    )
    num = (
        F.col("ss") * F.col("n")
        - F.col("s").cast("decimal(38,0)") * F.col("s")
    )
    sc = g.select(
        "lang",
        F.col("n").alias("n_docs"),
        F.floor(F.sqrt(num.cast("double")) * 1000 + 0.5)
        .cast("long")
        .alias("score_milli"),
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    b = sc.withColumn("tot", F.sum("score_milli").over(wall))
    return b.select(
        "lang",
        "n_docs",
        "score_milli",
        F.expr(
            # greatest(tot,1): all-zero-variance strata zero every
            # score; guarded, allocation is 0 in both engines
            "CAST(score_milli * 1000000 div greatest(tot, 1) AS BIGINT)"
        ).alias("alloc_ppm"),
        F.expr(
            "CAST((score_milli * 1000000 div greatest(tot, 1)) * 10000 "
            "div 1000000 AS BIGINT)"
        ).alias("sample_n"),
    )


# ---------------------------------------------------------------------------
# per-doc character entropy rollup (round 7)
# ---------------------------------------------------------------------------
@query(
    "doc_char_entropy",
    oracle="""
WITH ch AS (
  SELECT doc_id, source, unnest(string_split(text, '')) AS ch
  FROM documents),
cnt AS (
  SELECT doc_id, source, ch, CAST(count(*) AS BIGINT) AS c
  FROM ch WHERE ch <> '' GROUP BY doc_id, source, ch),
tot AS (
  SELECT doc_id, source, CAST(sum(c) AS BIGINT) AS l FROM cnt
  GROUP BY doc_id, source),
term AS (
  SELECT c.doc_id, c.source, t.l,
         c.c * CAST(floor(ln(c.c * 1.0 / t.l) / ln(2) * 1000000)
                    AS BIGINT) AS m
  FROM cnt c JOIN tot t USING (doc_id, source)),
docent AS (
  SELECT doc_id, source,
         -(CAST(sum(m) AS BIGINT) // max(l)) AS h_micro
  FROM term GROUP BY doc_id, source)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(h_micro) // count(*) AS BIGINT) AS mean_entropy_microbits,
       CAST(min(h_micro) AS BIGINT) AS min_entropy_microbits,
       CAST(max(h_micro) AS BIGINT) AS max_entropy_microbits
FROM docent GROUP BY source
""",
    doc="Per-source character-entropy profile — the cheapest quality "
        "signal that separates natural text (~4.1 bits/char) from "
        "base64/hex blobs (high, flat) and boilerplate padding (low): "
        "per-doc Shannon entropy over the character distribution, "
        "rolled up to source mean/min/max. Exactness discipline: the "
        "per-character term floor(ln(c/L)/ln(2)*1e6) is a BIGINT "
        "micro-bit quantity computed from exact integer counts (the "
        "doc_unigram_logprob micro-nat trick — Spark's Math.log and "
        "DuckDB's libm ln agree bit-for-bit on identical doubles, "
        "verified across every SF by that query), so per-doc entropy "
        "-(sum(c*m)) div L and the source rollup are pure integer "
        "arithmetic with NO order-dependent float summation anywhere. "
        "Plan: char explode is row-local (fan_out lifts the "
        "single-split scan to all cores), one (doc, char) partial-agg "
        "groupBy — alphabet-bounded, so ~100 rows per doc — then two "
        "tiny rollups; at 100 TB the explode streams and nothing "
        "data-sized shuffles except the bounded per-doc histogram.",
)
def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from advanced_strapi_import_spark.plans.registry import fan_out

    d = fan_out(load(spark, sf_dir, "documents").select("doc_id", "source", "text"))
    ch = d.select(
        "doc_id", "source", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.col("ch") != "")
    cnt = ch.groupBy("doc_id", "source", "ch").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = cnt.groupBy("doc_id", "source").agg(
        F.sum("c").cast("long").alias("l")
    )
    term = cnt.join(tot, ["doc_id", "source"]).select(
        "doc_id",
        "source",
        "l",
        (
            F.col("c")
            * F.floor(
                F.log(F.col("c") * 1.0 / F.col("l"))
                / F.log(F.lit(2.0))
                * 1000000
            ).cast("long")
        ).alias("m"),
    )
    docent = term.groupBy("doc_id", "source").agg(
        (-(F.sum("m").cast("long"))).alias("neg_sum"),
        F.max("l").alias("l"),
    ).select(
        "doc_id", "source", F.expr("neg_sum div l").alias("h_micro")
    )
    return docent.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("CAST(sum(h_micro) div count(1) AS BIGINT)").alias(
            "mean_entropy_microbits"
        ),
        F.min("h_micro").cast("long").alias("min_entropy_microbits"),
        F.max("h_micro").cast("long").alias("max_entropy_microbits"),
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth fit (round 7)
# ---------------------------------------------------------------------------
@query(
    "vocab_heaps_law",
    oracle="""
WITH t AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents),
tk AS (SELECT doc_id, tok FROM t WHERE tok <> ''),
mx AS (SELECT CAST(max(doc_id) AS BIGINT) AS maxd FROM tk),
ck AS (
  SELECT k, (mx.maxd + 1) * k // 10 - 1 AS d
  FROM unnest(generate_series(1, 10)) AS s(k) CROSS JOIN mx),
first_doc AS (
  SELECT tok, CAST(min(doc_id) AS BIGINT) AS fd FROM tk GROUP BY tok),
doc_n AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks FROM tk GROUP BY doc_id),
pts AS (
  SELECT ck.k,
         (SELECT CAST(sum(n_toks) AS BIGINT) FROM doc_n
          WHERE doc_id <= ck.d) AS n,
         (SELECT CAST(count(*) AS BIGINT) FROM first_doc
          WHERE fd <= ck.d) AS v
  FROM ck),
q AS (
  SELECT CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS x,
         CAST(floor(ln(CAST(v AS DOUBLE)) * 1000000) AS BIGINT) AS y,
         n, v
  FROM pts WHERE n > 0 AND v > 0),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS np,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         CAST(max(n) AS BIGINT) AS tokens_total,
         CAST(max(v) AS BIGINT) AS vocab_total
  FROM q)
SELECT np AS n_checkpoints, tokens_total, vocab_total,
       CAST((sxy * np - CAST(sx AS HUGEINT) * sy) * 1000000
            // greatest(sxx * np - CAST(sx AS HUGEINT) * sx, 1)
            AS BIGINT) AS beta_micro,
       CAST((sy - (sxy * np - CAST(sx AS HUGEINT) * sy) * 1000000
                  // greatest(sxx * np - CAST(sx AS HUGEINT) * sx, 1)
                  * sx // 1000000) // np AS BIGINT) AS logk_micro
FROM s
""",
    doc="Heaps'-law fit V(n) ~ K*n^beta of vocabulary growth: token "
        "first-occurrence positions give the exact vocabulary size at "
        "10 doc-id checkpoints (V(d) = tokens whose min doc_id <= d — "
        "computed as a groupBy + 10 threshold counts, NO data-sized "
        "cumulative window), cumulative token counts give n(d), and "
        "beta comes from exact-integer OLS on micro-nat-quantized "
        "(ln n, ln V) — the lineitem_regression_metrics co-moment "
        "recipe over just 10 points, so every sum is comfortably "
        "BIGINT. beta well below 1 is the healthy sublinear regime; "
        "beta drifting toward 1 flags a corpus whose 'vocabulary' "
        "never saturates (serial numbers, hashes, boilerplate IDs) — "
        "the tokenizer-budget planning read. Scale: first-occurrence "
        "is one token-keyed groupBy (the corpus's natural shuffle "
        "key); checkpoints broadcast; the doc-id prefix is the "
        "ingestion order at 100 TB (any monotone ingest stamp works).",
)
def vocab_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    from advanced_strapi_import_spark.plans.registry import fan_out

    tk = (
        fan_out(d)
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
                "tok"
            ),
        )
        .filter(F.col("tok") != "")
    )
    tk = persist_tracked(tk)
    tk.count()  # eager: both consumers below broadcast over this chain
    mx = tk.agg(F.max("doc_id").cast("long").alias("maxd"))
    ck = (
        load(spark, sf_dir, "documents")
        .sparkSession.range(1, 11)
        .withColumnRenamed("id", "k")
        .crossJoin(F.broadcast(mx))
        .select("k", F.expr("(maxd + 1) * k div 10 - 1").alias("d"))
    )
    first_doc = tk.groupBy("tok").agg(
        F.min("doc_id").cast("long").alias("fd")
    )
    doc_n = tk.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_toks")
    )
    ckb = F.broadcast(ck)
    nv = (
        doc_n.join(ckb, doc_n.doc_id <= ckb.d)
        .groupBy("k", "d")
        .agg(F.sum("n_toks").cast("long").alias("n"))
    )
    vv = (
        first_doc.join(ckb, first_doc.fd <= ckb.d)
        .groupBy("k", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    q = (
        nv.join(vv, ["k", "d"])
        .filter((F.col("n") > 0) & (F.col("v") > 0))
        .select(
            F.floor(F.log(F.col("n").cast("double")) * 1000000)
            .cast("long")
            .alias("x"),
            F.floor(F.log(F.col("v").cast("double")) * 1000000)
            .cast("long")
            .alias("y"),
            "n",
            "v",
        )
    )
    s = q.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        # DECIMAL(38,0): micro-nat products overflow BIGINT once the
        # centered co-moment is scaled by 1e6 (the regression recipe)
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.max("n").cast("long").alias("tokens_total"),
        F.max("v").cast("long").alias("vocab_total"),
    )
    return s.select(
        F.col("np").alias("n_checkpoints"),
        "tokens_total",
        "vocab_total",
        F.expr(
            "CAST((sxy * np - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000"
            " div greatest(sxx * np - CAST(sx AS DECIMAL(38,0)) * sx,"
            "              CAST(1 AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("beta_micro"),
        F.expr(
            "CAST((sy - (sxy * np - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000"
            "           div greatest(sxx * np - CAST(sx AS DECIMAL(38,0)) * sx,"
            "                        CAST(1 AS DECIMAL(38,0)))"
            "           * sx div 1000000) div np AS BIGINT)"
        ).alias("logk_micro"),
    )
