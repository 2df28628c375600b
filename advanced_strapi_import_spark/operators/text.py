"""Text analysis for training-data curation: language ID, quality
scoring, token counting, document fingerprinting. All native Spark SQL
expressions (regexp_count / split / array ops) — the hot path stays in
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from advanced_strapi_import_spark.operators.dedup import hash64, shingles, tokens

# Minimal per-language stopword profiles for the n-gram/stopword
# heuristic (public common-word lists, truncated).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "von"],
    "zh": ["的", "了", "是", "我", "在", "有", "和", "就", "不", "人"],
}

# BPE-ish word/number/punct tokenizer (public GPT-2-style pattern, simplified)
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count via regexp_count (words + digit runs + punct)."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def quality_features(text: Column, toks: Column | None = None) -> dict[str, Column]:
    """Length/punctuation/stopword/digit ratios (rounded, portable).

    Pass ``toks`` as a MATERIALIZED token-array column (see
    ``with_quality``) to tokenize once per row; when None the split is
    inlined into every consumer expression."""
    n_chars = F.length(text)
    if toks is None:
        toks = tokens(text)
    n_toks = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(LANG_PROFILES["en"]))
    )
    n_punct = F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]"))
    n_digit = F.regexp_count(text, F.lit(r"[0-9]"))
    mean_tok_len = (n_chars - (n_toks - 1)) / n_toks  # spaces removed
    # n_chars = 0 (empty text) would divide-by-zero under ANSI mode —
    # an empty doc scores 0 ratios, it must never kill the pipeline.
    # n_toks needs no guard: split('') yields [''], size >= 1.
    def per_char(num: Column) -> Column:
        return F.when(n_chars > 0, F.round(num / n_chars, 4)).otherwise(
            F.lit(0.0)
        )

    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_toks.cast("long"),
        "punct_ratio": per_char(n_punct),
        "digit_ratio": per_char(n_digit),
        "stopword_ratio": F.round(stop_hits / n_toks, 4),
        "mean_token_len": F.round(mean_tok_len, 4),
    }


# Gopher-rule stopword list (Rae et al. 2021, table A1: a document must
# contain >= 2 of these to pass the stopword rule).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    text: Column,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> dict[str, Column]:
    """Gopher-style repetition-free quality gates (Rae et al. 2021 §A1 —
    the de-facto rule set also used by Dolma/FineWeb): word count
    bounds, mean word length bounds, symbol-to-word ratio (# and
    ellipsis), fraction of words containing an alphabetic character,
    and distinct-stopword presence. Emits every metric plus the
    conjunction, so downstream can re-threshold without recomputing.
    All whole-stage-codegen expressions — no UDFs."""
    toks = tokens(text)
    n = F.size(toks)
    char_sum = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    mean_word_len = F.round(char_sum / n, 4)
    alpha_ratio = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n, 4
    )
    symbol_ratio = F.round(
        F.regexp_count(text, F.lit(r"#|\.\.\.")) / n, 4
    )
    stop_hits = F.size(
        F.array_intersect(
            F.transform(toks, lambda t: F.lower(t)),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    passes = (
        (n >= min_words)
        & (n <= max_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (alpha_ratio >= min_alpha_ratio)
        & (stop_hits >= min_stopword_hits)
    )
    return {
        "n_words": n.cast("long"),
        "mean_word_len": mean_word_len,
        "symbol_ratio": symbol_ratio,
        "alpha_ratio": alpha_ratio,
        "stopword_hits": stop_hits.cast("long"),
        "passes_gopher": passes,
    }


def quality_score(text: Column, toks: Column | None = None) -> Column:
    """Composite heuristic in [0,1]: rewards stopword presence and sane
    token lengths, penalizes punctuation/digit noise (C4/Gopher-style
    rule-of-thumb filters)."""
    f = quality_features(text, toks)
    score = (
        F.lit(0.5)
        + F.least(f["stopword_ratio"] * 2, F.lit(0.3))
        - F.least(f["punct_ratio"] * 2, F.lit(0.3))
        - F.least(f["digit_ratio"], F.lit(0.2))
        + F.when((f["mean_token_len"] >= 3) & (f["mean_token_len"] <= 10), 0.2).otherwise(0.0)
    )
    return F.round(F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)), 4)


def with_quality(
    df: DataFrame, text_col: str = "text", out_col: str = "quality"
) -> DataFrame:
    """Append ``quality_score`` with the token array STAGED in its own
    projection, so split() runs once per row instead of being inlined
    into each of the score's 3 token-consuming sub-expressions.
    CollapseProject keeps a non-cheap alias referenced more than once
    in a separate Project (verified on the optimized plan), so the
    staging survives optimization without any barrier trick."""
    tcol = "__q_toks"
    return (
        df.withColumn(tcol, tokens(F.col(text_col)))
        .withColumn(out_col, quality_score(F.col(text_col), toks=F.col(tcol)))
        .drop(tcol)
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword-hit count per language profile."""
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(words)))
        for lang, words in LANG_PROFILES.items()
    }


def lang_id(text: Column) -> Column:
    """argmax language by stopword hits; 'und' when nothing matches.
    Deterministic tie-break: profile order en,es,fr,de,zh."""
    scores = lang_scores(text)
    best = None
    best_lang = F.lit("und")
    for lang in LANG_PROFILES:  # insertion order = tie-break order
        s = scores[lang]
        if best is None:
            best, best_lang = s, F.when(s > 0, F.lit(lang)).otherwise(F.lit("und"))
        else:
            cond = s > best
            best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
            best = F.when(cond, s).otherwise(best)
    return best_lang


def normalize(text: Column) -> Column:
    """lowercase + collapse whitespace (fingerprint canonical form)."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column, *, shingle_k: int = 3) -> dict[str, Column]:
    """Document fingerprints: full-content md5 and min-shingle-hash (a
    1-hash MinHash — robust to local edits, the winnowing-lite form)."""
    norm = normalize(text)
    return {
        "fp_md5": F.md5(norm),
        "fp_minshingle": F.array_min(
            F.transform(shingles(norm, shingle_k), lambda s: F.md5(s))
        ),
        "fp_hash64": hash64(norm),
    }


# ---------------------------------------------------------------------------
# document chunking (LLM-corpus prep: fixed token windows with overlap)
# ---------------------------------------------------------------------------
def chunk_documents(
    df,
    text_col: str,
    id_col: str,
    *,
    chunk_tokens: int = 64,
    overlap: int = 16,
):
    """Split each document into whitespace-token windows of
    ``chunk_tokens`` with ``overlap`` tokens carried between adjacent
    chunks (stride = chunk_tokens - overlap) — the standard prep for
    fixed-context training samples.

    One explode per document (no shuffle); chunk count per doc is
    ceil(max(n - overlap, 1) / stride). Output:
    (id, chunk_index, n_chunks, chunk_text, n_tokens)."""
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    return (
        df.select(
            F.col(id_col).alias("id"), toks.alias("__t"), n_chunks.alias("n_chunks")
        )
        .select(
            "id",
            "n_chunks",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n_chunks") - 1),
                    lambda i: F.slice(F.col("__t"), i * stride + 1, chunk_tokens),
                )
            ).alias("chunk_index", "__chunk"),
        )
        .select(
            "id",
            "chunk_index",
            "n_chunks",
            F.concat_ws(" ", "__chunk").alias("chunk_text"),
            F.size("__chunk").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction (regexes kept in the Java/RE2 common subset so any
# engine applies the identical patterns)
# ---------------------------------------------------------------------------
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    (r"\+?[0-9][0-9()\-. ]{7,}[0-9]", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Replace emails, phone-like numbers and IPv4 literals with typed
    placeholder tags. Order matters: emails first so their local parts
    are not half-eaten, and IPs before phones (a dotted quad also
    matches the phone charset)."""
    out = text
    for pattern, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, tag)
    return out


# ---------------------------------------------------------------------------
# exact segment dedup (cross-document substring-level dedup: fixed
# token spans, first occurrence wins — the dedup granularity used for
# training corpora when document-level dedup is too coarse)
# ---------------------------------------------------------------------------
def segment_dedup(
    df,
    text_col: str,
    id_col: str,
    *,
    segment_tokens: int = 16,
):
    """Cross-document exact segment dedup: split every document into
    consecutive ``segment_tokens``-token spans, keep only the FIRST
    occurrence of each exact span corpus-wide (ordered by doc id then
    span position), and reassemble the surviving spans per document.

    Scale shape: one explode (no shuffle), one shuffle partitioned by
    segment text (the window that ranks occurrences — identical
    segments co-locate, everything else passes through), one shuffle
    back on doc id to reassemble. No similarity join, no candidate
    blowup; cost is O(corpus tokens) end to end, which is what makes
    substring-level dedup feasible at corpus scale.

    Output: (id, n_kept, text_dedup) — documents whose every span was
    seen earlier disappear (fully-duplicate docs drop out)."""
    from pyspark.sql import Window

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_segs = F.ceil(F.size(toks) / F.lit(segment_tokens)).cast("int")
    segs = df.select(
        F.col(id_col).alias("id"), toks.alias("__t"), n_segs.alias("__n")
    ).select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("__n") - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("__t"), i * segment_tokens + 1, segment_tokens)
                ),
            )
        ).alias("seg_no", "seg"),
    )
    w = Window.partitionBy("seg").orderBy("id", "seg_no")
    kept = segs.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return (
        kept.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_sort(F.collect_list(F.struct("seg_no", "seg"))).alias("__s"),
        )
        .select(
            "id",
            "n_kept",
            F.concat_ws(
                " ", F.transform(F.col("__s"), lambda s: s["seg"])
            ).alias("text_dedup"),
        )
    )


def repetition_features(text: Column) -> dict[str, Column]:
    """Within-document repetition signals (the Gopher/MassiveText
    repetition filters): fraction of duplicate word bigrams and
    trigrams. High values flag boilerplate/spam docs that survive
    cross-document dedup because they are unique *as documents*."""
    toks = F.split(F.trim(text), r"\s+")
    n = F.size(toks)

    def ngram_dup_ratio(k: int) -> Column:
        # greatest(...,1): sequence(1, 0) would count DOWN; a doc
        # shorter than k tokens degenerates to one short gram, ratio 0
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i, k)
            ),
        )
        total = F.size(grams)
        uniq = F.size(F.array_distinct(grams))
        return F.when(total > 0, F.round(1 - uniq / total, 4)).otherwise(F.lit(0.0))

    return {
        "n_tokens": n.cast("long"),
        "dup_bigram_ratio": ngram_dup_ratio(2),
        "dup_trigram_ratio": ngram_dup_ratio(3),
    }


def repetition_features_df(
    df: DataFrame, text_col: str = "text", keep: list[str] | None = None
) -> DataFrame:
    """Staged-projection form of ``repetition_features``: the token
    array and each gram array are materialized in their own Projects,
    so split() runs once per row and each gram array is built once
    (instead of split re-evaluating inside every higher-order-function
    lambda element — HOF lambdas sit outside codegen subexpression
    elimination). Same output columns, ~half the per-row work."""
    keep = list(keep or [])

    def grams(toks: Column, n: Column, k: int) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )

    def dup_ratio(g: Column) -> Column:
        total = F.size(g)
        uniq = F.size(F.array_distinct(g))
        return F.when(total > 0, F.round(1 - uniq / total, 4)).otherwise(F.lit(0.0))

    t, n = F.col("__toks"), F.col("__n")
    # trim + \s+ split, NOT dedup.tokens (single-space, no trim): the
    # inline repetition_features and the text_repetition oracle both
    # trim, so leading/trailing/multi whitespace must not mint tokens
    return (
        df.select(*keep, F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks"))
        .select(*keep, "__toks", F.size("__toks").alias("__n"))
        .select(
            *keep,
            F.col("__n").cast("long").alias("n_tokens"),
            grams(t, n, 2).alias("__bi"),
            grams(t, n, 3).alias("__tri"),
        )
        .select(
            *keep,
            "n_tokens",
            dup_ratio(F.col("__bi")).alias("dup_bigram_ratio"),
            dup_ratio(F.col("__tri")).alias("dup_trigram_ratio"),
        )
    )


def explode_tokens_udtf(df: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Token expansion through a Python UDTF (Spark 4's user-defined
    TABLE function surface): one input row fans out to (pos, token,
    is_stop) rows via a LATERAL join, the per-row-to-many-rows shape
    SQL can't express without a predefined generator.

    The UDTF here is the INTEGRATION surface (Arrow-batched eval is
    enabled by tune()); bulk tokenization itself stays on the native
    split/posexplode path (text_token_counts) — a Python generator
    per row is never the 100 TB hot path, but a custom tagger/
    tokenizer that must run Python (spaCy, a BPE lib) plugs in exactly
    here with the plan shape unchanged."""
    from pyspark.sql.functions import udtf

    stops = set(LANG_PROFILES["en"])

    @udtf(returnType="pos int, token string, is_stop boolean")
    class TokenExplode:
        def eval(self, text: str):
            if text is None:
                return
            # '' flows through: split(' ') yields [''], matching the
            # oracle's string_split behavior (one empty-token row)
            for i, t in enumerate(text.split(" ")):
                yield i, t, t.lower() in stops

    spark = df.sparkSession
    spark.udtf.register("token_explode", TokenExplode)
    return spark.sql(
        f"SELECT d.{id_col}, t.pos, t.token, t.is_stop "
        f"FROM {{d}} d, LATERAL token_explode(d.{text_col}) t",
        d=df,
    )


# ---------------------------------------------------------------------------
# content-defined chunking (CDC)
# ---------------------------------------------------------------------------
# polynomial rolling hash over an 8-char window: h(i) = sum_j
# code(c[i+j]) * B^j mod M with B=257, M=1e9+7; a position is a cut
# when h % CDC_MASK == 0 (expected chunk ~= CDC_MASK chars). The B^j
# mod M powers are baked as constants so every per-position term stays
# far under 2^63 (code <= 0x10FFFF times ~1e9, summed 8x ~ 9e15).
CDC_WINDOW = 8
CDC_MASK = 64
CDC_POWS = (1, 257, 66049, 16974593, 362470373, 154885210, 805498697, 13163680)
CDC_MOD = 1000000007


def _cdc_hash_expr(codes: str, i: str) -> str:
    terms = " + ".join(
        f"element_at({codes}, {i} + {j}) * {p}L"
        for j, p in enumerate(CDC_POWS)
    )
    return f"(({terms}) % {CDC_MOD}L)"


def cdc_chunks(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, chunk, chunk_len) content-defined chunks per document —
    the Rabin/gear-CDC shape used by dedup storage systems and
    fine-grained corpus dedup: chunk boundaries depend only on local
    content (an 8-char polynomial rolling hash hitting 0 mod 64), so
    an insertion early in a document shifts ONE chunk while every
    later chunk re-aligns — fixed-size segmenting (segment_dedup)
    loses all alignment after the edit. Stateless variant: every
    content-defined cut applies (no min/max clamp — those need a
    sequential scan per doc; the expected-64-char mask bounds chunk
    size probabilistically), which keeps the whole operator a
    row-local JVM higher-order-function pipeline: split -> codepoint
    transform -> per-position hash filter -> substring slicing. No
    Python, no shuffle, linear per doc; at 100 TB it runs inside the
    scan stage."""
    # each stage lands as a REAL column before the next references it:
    # inlining `codes` into the per-position lambda would re-split the
    # string once per position (O(L^2) per doc — measured 20x slower)
    staged = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__t"),
        F.expr(
            f"transform(filter(split({text_col}, ''), c -> c <> ''), "
            f"c -> ascii(c))"
        ).alias("__codes"),
    )
    # guard at WINDOW+1, not WINDOW: position 1 is excluded (it is the
    # implicit start cut), and Spark's sequence(2, 1) would count DOWN
    idx = (
        f"CASE WHEN size(__codes) >= {CDC_WINDOW} + 1 "
        f"THEN sequence(2, size(__codes) - {CDC_WINDOW} + 1) "
        f"ELSE array() END"
    )
    cuts = (
        f"filter({idx}, i -> "
        f"{_cdc_hash_expr('__codes', 'i')} % {CDC_MASK} = 0)"
    )
    staged = staged.select(
        "id",
        "__t",
        F.expr(
            f"concat(array(1), {cuts}, array(size(__codes) + 1))"
        ).alias("__cutpoints"),
    )
    chunks = (
        f"transform(sequence(1, size(__cutpoints) - 1), "
        f"k -> substring(__t, element_at(__cutpoints, k), "
        f"element_at(__cutpoints, k + 1) - element_at(__cutpoints, k)))"
    )
    return (
        staged.select("id", F.explode(F.expr(chunks)).alias("chunk"))
        .filter(F.col("chunk") != "")
        .withColumn("chunk_len", F.length("chunk").cast("long"))
    )
