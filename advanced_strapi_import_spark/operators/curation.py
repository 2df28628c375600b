"""Corpus-curation operators for large-scale training-data pipelines:
sequence packing, benchmark contamination checks, stratified quota
sampling, unigram-rarity scoring, mixture weighting, edit-distance
fuzzy dedup, and markup stripping.

All operators are native Spark SQL expressions (whole-stage codegen,
no Python UDFs). Cross-engine determinism rules (driver hashes values
against a DuckDB oracle):

  - ranking randomness is md5(cast(id as string)) — identical bytes in
    any engine, unlike xxhash64/hash() which are engine-specific;
  - scores avoid transcendental functions (ln/exp are not correctly
    rounded and differ across libm implementations); rarity uses only
    IEEE-exact ops (integer +,*, one correctly-rounded /, floor);
  - every window has a total deterministic ORDER BY.

SCALE: each operator's shuffle shape is documented inline; none is
quadratic, none collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


# ---------------------------------------------------------------------------
# sequence packing (concat-and-split over shards)
# ---------------------------------------------------------------------------
def pack_sequences(
    chunks: DataFrame,
    *,
    id_col: str = "doc_id",
    index_col: str = "chunk_index",
    tokens_col: str = "n_tokens",
    budget: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """Assign token chunks to fixed-budget training sequences.

    The standard pretraining prep concatenates the token stream and
    cuts it every ``budget`` tokens; a chunk belongs to the sequence
    where its first token lands: seq = floor(tokens_before / budget).

    A single global cumsum would serialize on one partition, so the
    stream is sharded by ``pmod(id, n_shards)`` and packed per shard —
    each shard's cumsum runs in parallel (one shuffle on the shard key)
    and sequence ids are namespaced ``shard * 2^40 + local_seq``.
    At 100 TB raise n_shards to O(cluster cores); packing quality is
    unchanged because shard boundaries only add < n_shards partial
    sequences.

    Output: one row per chunk with its (seq_id, tok_offset) placement.
    """
    id_type = chunks.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        # pmod on a non-numeric id implicitly casts to double and
        # yields NULL (ANSI off): every row lands in one NULL shard —
        # the exact serialization sharding exists to avoid — with NULL
        # seq ids. Fail loudly instead.
        raise TypeError(
            f"pack_sequences needs an integral {id_col!r}, got {id_type}; "
            "hash string ids to a bigint first (e.g. xxhash64)"
        )
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col), F.col(index_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    before = (cum - F.col(tokens_col)).cast("long")
    return (
        chunks.withColumn("shard", shard)
        .withColumn("tok_offset", before)
        .withColumn(
            "seq_id",
            (F.col("shard").cast("long") * F.lit(1 << 40)
             + F.floor(F.col("tok_offset") / F.lit(budget))).cast("long"),
        )
        .select(id_col, index_col, tokens_col, "shard", "tok_offset", "seq_id")
    )


# ---------------------------------------------------------------------------
# benchmark contamination (n-gram overlap)
# ---------------------------------------------------------------------------
def _ngram_strings(text: Column, n: int) -> Column:
    """Whitespace-token n-grams re-joined to strings; empty array when
    the document has fewer than n tokens (sequence() would otherwise
    produce a descending range)."""
    toks = F.split(F.trim(text), r"\s+")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def quality_floor(
    df: DataFrame,
    *,
    score_col: str,
    by: str,
    id_col: str = "doc_id",
    num: int = 1,
    den: int = 4,
) -> DataFrame:
    """Per-stratum quality floor: within each ``by`` stratum, rank docs
    by ascending score and keep everything above the bottom num/den
    fraction — the per-source percentile filter a mixture pipeline
    applies so one noisy source can't flood the corpus while a clean
    source is over-trimmed (per-domain thresholds, not one global one).

    The cut is integer-exact: ``rank > n_docs * num // den`` — no float
    percentile, so any engine agrees on exactly which rows survive.
    Ties break by ``id_col`` for deterministic ranks.

    Scale: one shuffle on the stratum key; both the rank and the
    stratum size come from the same window partition, so the second
    window reuses the first's exchange."""
    w = Window.partitionBy(by).orderBy(F.col(score_col).asc(), F.col(id_col).asc())
    n = Window.partitionBy(by)
    return (
        df.withColumn("q_rank", F.row_number().over(w).cast("long"))
        .withColumn("n_docs", F.count(F.lit(1)).over(n).cast("long"))
        .withColumn(
            "kept", F.col("q_rank") > F.expr(f"n_docs * {num} div {den}")
        )
    )


def repeated_ngram_stats(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated n-gram statistics — the token-level form
    of exact substring deduplication (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": memorized boilerplate
    shows up as long spans shared verbatim across documents). An n-gram
    is DUPLICATED when it occurs in >= ``min_docs`` distinct documents;
    each document reports how many of its n-gram positions carry a
    duplicated gram. Downstream filters drop or trim the high-fraction
    docs.

    Returns (id, n_ngrams, dup_ngrams) — one row per doc that has at
    least one n-gram; callers left-join from the corpus to keep short
    docs with zero grams.

    Scale: grams collapse to a 64-bit hash BEFORE any shuffle (8-byte
    keys, not 8-token strings), the duplicated-gram table is built from
    a (id, gh)-distinct projection (positions within one doc never
    inflate the document count), and the final join is gram-hash ->
    small dup set — broadcastable when the duplicated-gram table is
    selective, one hash shuffle otherwise. No pairwise comparison
    anywhere, so cost stays O(total tokens) at 100 TB.

    The gram hash never leaves the operator (output is per-doc counts),
    so it uses native xxhash64 — JVM codegen, ~10x cheaper than the
    md5-derived portable hash the dedup family needs for its
    oracle-visible keys."""
    from advanced_strapi_import_spark.caching import persist_tracked

    # persisted: BOTH the dup aggregate and the per-doc join read this
    # frame, and Spark does not share subplans across join sides — an
    # unpersisted explode would run the dominant map stage twice
    grams = persist_tracked(
        corpus.select(
            F.col(id_col).alias("id"),
            F.explode(_ngram_strings(F.col(text_col), n)).alias("gram"),
        ).select("id", F.xxhash64("gram").alias("gh"))
    )
    dup = (
        grams.distinct()
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gh", "nd")
    )
    return (
        grams.join(dup, "gh", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("nd").alias("dup_ngrams"),
        )
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document overlap with a benchmark set's n-grams (the GPT-3
    style decontamination check: a training doc is contaminated when it
    shares any length-n token window with an eval set).

    Benchmark n-grams are DISTINCT'd then broadcast — eval sets are
    tiny relative to the corpus, so the corpus side never shuffles and
    the explode is map-side. ONE corpus gram explode feeds both the
    total and the overlap count (broadcast left join + count/count_if
    in the same groupBy) — the earlier totals/hits two-branch shape
    evaluated the n-gram build twice. Output: (doc_id, n_ngrams,
    n_overlap, contaminated)."""
    bench_grams = (
        benchmark.select(F.explode(_ngram_strings(F.col(text_col), n)).alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    corpus_grams = corpus.select(
        F.col(id_col),
        F.explode(_ngram_strings(F.col(text_col), n)).alias("gram"),
    )
    per_doc = (
        corpus_grams.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("__hit").alias("n_overlap"),
        )
    )
    return (
        corpus.select(id_col).join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).cast("int").alias("n_ngrams"),
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# stratified quota sampling
# ---------------------------------------------------------------------------
def stratified_sample(
    df: DataFrame,
    *,
    strata_col: str,
    id_col: str = "doc_id",
    quota: int = 25,
) -> DataFrame:
    """Deterministic per-stratum quota sample: rank rows inside each
    stratum by md5(id) — a uniform, engine-portable pseudo-random key —
    and keep the first ``quota``.

    One shuffle on the stratum key. SCALE: rank-per-stratum sorts each
    stratum; at 100 TB with huge strata, replace with a two-pass
    threshold sample (sample 1% -> estimate the quota'th md5 threshold
    -> filter), which this operator's contract allows since md5 order
    is stable. Output: (strata, doc_id, sample_rank)."""
    rnd = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(rnd, F.col(id_col))
    return (
        df.select(F.col(strata_col), F.col(id_col), rnd.alias("__r"))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= quota)
        .select(strata_col, id_col, "sample_rank")
    )


# ---------------------------------------------------------------------------
# unigram rarity (surprisal proxy with integer-exact arithmetic)
# ---------------------------------------------------------------------------
def doc_rarity(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram-LM surprisal proxy: each token contributes
    floor(1e6 / corpus_count(token)); a document's rarity is the mean
    contribution over its tokens (rare tokens -> large values). The
    true -sum(log p) form needs ln(), which is not correctly rounded
    and hash-drifts across engines; 1/count preserves the ranking for
    filtering purposes and is IEEE-exact (one division + floor).

    Two shuffles: token->count aggregation, then contribution sum per
    doc. The count table is corpus-vocabulary sized — joined broadcast
    when small, shuffle-hash otherwise (Catalyst/AQE picks).
    Output: (doc_id, n_tokens, rarity_sum, rarity_mean)."""
    from advanced_strapi_import_spark.caching import persist_tracked

    # the exploded frame feeds BOTH the vocab count and the contrib
    # join — without persist the tokenize+explode map stage runs twice
    toks = persist_tracked(
        df.select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
        ).filter(F.col("tok") != "")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    contrib = toks.join(counts, "tok").select(
        id_col, F.floor(F.lit(1000000) / F.col("cnt")).alias("c")
    )
    return contrib.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("c").alias("rarity_sum"),
        F.floor(F.sum("c") / F.count(F.lit(1))).cast("long").alias("rarity_mean"),
    )


# ---------------------------------------------------------------------------
# mixture weights
# ---------------------------------------------------------------------------
def mix_weights(
    df: DataFrame,
    *,
    strata_col: str,
    target: dict[str, float] | None = None,
) -> DataFrame:
    """Per-stratum sampling weights to hit a target mixture (uniform by
    default): weight = target_share / actual_share. weight > 1 means
    the stratum is under-represented (oversample / extra epochs).

    One aggregation; the per-stratum table is tiny (cardinality of the
    stratum key) so downstream application is a broadcast join.
    Output: (strata, n_docs, share_ppm, weight_ppm) — shares scaled to
    integer parts-per-million so the hash is engine-exact."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(
        F.sum("n_docs").alias("__total"), F.count(F.lit(1)).alias("__k")
    )
    if target is None:
        tgt = F.lit(1.0) / F.col("__k")
    else:
        if not target:
            raise ValueError(
                "target must be a non-empty {stratum: share} dict; "
                "pass None for the uniform default"
            )
        tgt = None
        for k, v in target.items():
            branch = (F.col(strata_col) == k, F.lit(float(v)))
            tgt = F.when(*branch) if tgt is None else tgt.when(*branch)
        tgt = tgt.otherwise(F.lit(0.0))
    share = F.col("n_docs") / F.col("__total")
    return (
        counts.join(F.broadcast(total))
        .select(
            strata_col,
            "n_docs",
            F.floor(share * 1000000).cast("long").alias("share_ppm"),
            F.floor(tgt / share * 1000000).cast("long").alias("weight_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# edit-distance fuzzy dedup (bucket-gated levenshtein)
# ---------------------------------------------------------------------------
def edit_distance_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 48,
    max_dist: int = 12,
    max_block: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs by edit distance, gated by a cheap blocking
    key so the quadratic levenshtein only runs inside buckets.

    Blocking key = first two whitespace tokens of the normalized text
    (documents sharing an opening bigram are candidate near-dups; an
    O(n^2)-over-corpus levenshtein would never survive 100 TB). The
    self-join is an equi-join on the block key — one shuffle, pair
    expansion bounded by bucket size. Buckets larger than ``max_block``
    are DROPPED before the join: a block of m docs yields ~m^2/2
    levenshtein pairs, so one ubiquitous opening bigram (license
    boilerplate, '<!doctype') would otherwise make the stage quadratic
    in corpus size — mega-blocks are boilerplate families that the
    MinHash/exact-dedup paths handle, not edit-distance material.
    Distance runs on a fixed-length prefix so cost per pair is
    O(prefix_len^2) regardless of doc size.
    Output: (id_a, id_b, edit_dist) for pairs with dist <= max_dist."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    base = df.select(
        F.col(id_col).alias("id"),
        F.concat_ws(" ", F.slice(F.split(norm, " "), 1, 2)).alias("block"),
        F.substring(norm, 1, prefix_len).alias("prefix"),
    ).filter(F.col("block") != "")
    wb = Window.partitionBy("block")
    base = base.withColumn("__bn", F.count(F.lit(1)).over(wb)).filter(
        F.col("__bn") <= max_block
    ).drop("__bn")
    a = base.select(
        F.col("id").alias("id_a"), F.col("block"), F.col("prefix").alias("pa")
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("block"), F.col("prefix").alias("pb")
    )
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.levenshtein("pa", "pb").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= max_dist)
    )


# ---------------------------------------------------------------------------
# markup stripping (boilerplate removal)
# ---------------------------------------------------------------------------
_TAG_RE = r"<[^>]*>"
# &amp; must decode LAST: decoding it first turns the doubly-escaped
# '&amp;lt;' (the literal text '&lt;') into '&lt;', which the next
# replacement then corrupts into '<'
_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_markup(text: Column) -> Column:
    """Remove HTML/XML tags, decode the common entities, collapse the
    resulting whitespace. Pure regexp_replace chain — codegen'd, no UDF."""
    out = F.regexp_replace(text, _TAG_RE, " ")
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


# ---------------------------------------------------------------------------
# per-domain caps (source-level quota)
# ---------------------------------------------------------------------------
def domain_caps(
    df: DataFrame,
    *,
    domain_col: str = "source",
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
    cap: int = 25,
) -> DataFrame:
    """Keep at most ``cap`` documents per domain, best-quality first —
    the CommonCrawl-style guard against one domain flooding the mix.
    Deterministic total order: (quality desc, id asc).

    SCALE: one shuffle on the domain key; the per-domain sort is
    window-local. A skewed mega-domain is exactly the case the cap
    exists for — rank_limit-style early pruning applies because rows
    ranked past ``cap`` are dropped before any further stage."""
    w = Window.partitionBy(domain_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
    )


# ---------------------------------------------------------------------------
# deterministic hash split (train/val/test)
# ---------------------------------------------------------------------------
def hash_split(
    id_col: Column,
    *,
    train_pct: int = 80,
    val_pct: int = 10,
) -> Column:
    """'train'/'val'/'test' by md5-bucket of the id — the standard
    leakage-safe split: membership is a pure function of the id, stable
    across runs, engines, and re-shards (no sampling state to persist).
    Bucket = first 8 md5 hex chars mod 100."""
    from advanced_strapi_import_spark.operators.dedup import hash32

    # md5 requires a string input and Spark will not implicitly cast
    # numerics — cast here so bigint ids work without caller ceremony
    bucket = hash32(id_col.cast("string")) % 100
    return (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


# ---------------------------------------------------------------------------
# blocklist filtering (C4-style banned-word gate)
# ---------------------------------------------------------------------------
def blocklist_hits(text: Column, blocked: list[str]) -> Column:
    """Count of tokens in ``blocked`` (exact whitespace-token match,
    case-sensitive — the predictable form; callers lower() both sides
    for the insensitive variant). Single pass over the token array.
    Splits on \\s+ like every other tokenizer in this module — a
    single-space split would let 'foo\\nbadword' smuggle banned
    tokens past the gate."""
    return F.size(
        F.filter(
            F.split(F.trim(text), r"\s+"), lambda t: t.isin([*blocked])
        )
    )
