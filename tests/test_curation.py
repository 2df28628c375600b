"""Unit tests for corpus-curation operators (operators/curation.py)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from advanced_strapi_import_spark.operators import curation as CU
from tests.conftest import SF_TEST


def _docs(spark):
    return spark.read.parquet(f"{SF_TEST}/documents.parquet")


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------
def test_pack_sequences_layout(spark):
    chunks = spark.createDataFrame(
        [Row(doc_id=i, chunk_index=j, n_tokens=64) for i in range(16) for j in range(3)]
    )
    out = CU.pack_sequences(chunks, budget=256, n_shards=4).collect()
    assert len(out) == 48
    by_shard: dict[int, list] = {}
    for r in out:
        assert r.shard == r.doc_id % 4
        assert r.seq_id == r.shard * (1 << 40) + r.tok_offset // 256
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: (r.doc_id, r.chunk_index))
        # offsets are the exact running token count per shard
        cum = 0
        for r in rows:
            assert r.tok_offset == cum
            cum += r.n_tokens


def test_pack_sequences_budget_fill(spark):
    # 64-token chunks, budget 256 -> exactly 4 chunks per sequence
    chunks = spark.createDataFrame(
        [Row(doc_id=0, chunk_index=j, n_tokens=64) for j in range(8)]
    )
    out = CU.pack_sequences(chunks, budget=256, n_shards=1).collect()
    sizes = {}
    for r in out:
        sizes[r.seq_id] = sizes.get(r.seq_id, 0) + 1
    assert sorted(sizes.values()) == [4, 4]


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------
def test_contamination_self_and_clean(spark):
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e f g h i j"),      # bench member
            Row(doc_id=2, text="a b c d e f g h tail x"),   # shares the first 8-gram
            Row(doc_id=3, text="z y x w v u t s r q"),      # disjoint
            Row(doc_id=4, text="too short"),                # < 8 tokens
        ]
    )
    bench = corpus.filter(F.col("doc_id") == 1)
    got = {r.doc_id: r for r in CU.contamination(corpus, bench, n=8).collect()}
    assert got[1].contaminated and got[2].contaminated
    assert not got[3].contaminated
    assert got[4].n_ngrams == 0 and not got[4].contaminated
    assert got[2].n_overlap == 1


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------
def test_stratified_sample_quota_and_determinism(spark):
    d = _docs(spark)
    a = CU.stratified_sample(d, strata_col="lang", quota=5)
    rows = a.collect()
    per = {}
    for r in rows:
        per[r.lang] = per.get(r.lang, 0) + 1
    assert all(v <= 5 for v in per.values())
    assert sorted(r.sample_rank for r in rows if r.lang == rows[0].lang) == list(
        range(1, per[rows[0].lang] + 1)
    )
    b = CU.stratified_sample(d, strata_col="lang", quota=5).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# rarity
# ---------------------------------------------------------------------------
def test_doc_rarity_orders_rare_above_common(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="common common common common"),
            Row(doc_id=2, text="common xylophone quetzal obelisk"),
        ]
    )
    got = {r.doc_id: r for r in CU.doc_rarity(df).collect()}
    assert got[2].rarity_mean > got[1].rarity_mean
    assert got[1].n_tokens == 4
    # 'common' appears 5x -> floor(1e6/5) = 200000 each
    assert got[1].rarity_sum == 4 * 200000


# ---------------------------------------------------------------------------
# mixture weights
# ---------------------------------------------------------------------------
def test_mix_weights_uniform_target(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, source="a" if i < 30 else "b") for i in range(40)]
    )
    got = {r.source: r for r in CU.mix_weights(df, strata_col="source").collect()}
    assert got["a"].n_docs == 30 and got["b"].n_docs == 10
    assert got["a"].share_ppm == 750000 and got["b"].share_ppm == 250000
    # uniform target 0.5: a is over-represented (weight<1), b under (weight>1)
    assert got["a"].weight_ppm < 1000000 < got["b"].weight_ppm
    assert got["b"].weight_ppm == 2000000


def test_mix_weights_explicit_target(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, source="a" if i < 10 else "b") for i in range(20)]
    )
    got = {
        r.source: r
        for r in CU.mix_weights(
            df, strata_col="source", target={"a": 0.9, "b": 0.1}
        ).collect()
    }
    assert got["a"].weight_ppm == 1800000  # 0.9 / 0.5
    assert got["b"].weight_ppm == 200000   # 0.1 / 0.5


# ---------------------------------------------------------------------------
# edit-distance pairs
# ---------------------------------------------------------------------------
def test_edit_distance_pairs_blocks_and_threshold(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta"),
            Row(doc_id=2, text="alpha beta gamma delts"),   # dist 1, same block
            Row(doc_id=3, text="alpha beta entirely different and long tail"),
            Row(doc_id=4, text="omega psi chi phi"),        # different block
        ]
    )
    pairs = {(r.id_a, r.id_b): r.edit_dist for r in
             CU.edit_distance_pairs(df, prefix_len=48, max_dist=5).collect()}
    assert pairs[(1, 2)] == 1
    assert (1, 4) not in pairs and (2, 4) not in pairs
    assert (1, 3) not in pairs  # same block but dist > 5


# ---------------------------------------------------------------------------
# markup strip
# ---------------------------------------------------------------------------
def test_strip_markup(spark):
    df = spark.createDataFrame(
        [Row(s='<div class="x"><b>Hello</b>&nbsp;&amp; <i>world</i></div>')]
    )
    out = df.select(CU.strip_markup(F.col("s")).alias("c")).collect()[0].c
    assert out == "Hello & world"


# ---------------------------------------------------------------------------
# Gopher quality rules
# ---------------------------------------------------------------------------
def test_gopher_rules_metrics_and_gates(spark):
    from advanced_strapi_import_spark.operators import text as TX

    good = " ".join(
        ["the quick brown fox jumps over that lazy dog with more of and be to"] * 5
    )  # 75 words, all alpha, plenty of stopwords
    short = "the of and"  # fails min_words
    symbols = " ".join(["###"] * 60)  # fails symbol ratio + alpha + stopwords
    numeric = " ".join(["12345"] * 60) + " the be to of and"  # fails alpha ratio
    df = spark.createDataFrame(
        [Row(id=1, text=good), Row(id=2, text=short),
         Row(id=3, text=symbols), Row(id=4, text=numeric)]
    )
    feats = TX.gopher_rules(F.col("text"))
    rows = {r.id: r for r in df.select(
        "id", *[v.alias(k) for k, v in feats.items()]).collect()}

    assert rows[1].passes_gopher
    assert rows[1].n_words == 75
    assert rows[1].alpha_ratio == 1.0
    assert rows[1].stopword_hits >= 2

    assert not rows[2].passes_gopher  # too short
    assert rows[2].n_words == 3

    assert not rows[3].passes_gopher
    assert rows[3].alpha_ratio == 0.0
    assert rows[3].symbol_ratio > 0.1  # every token is '#'-only

    assert not rows[4].passes_gopher
    assert rows[4].alpha_ratio < 0.8
    assert rows[4].stopword_hits == 5


def test_gopher_rules_mean_word_len_bounds(spark):
    from advanced_strapi_import_spark.operators import text as TX

    tiny = " ".join(["a"] * 60) + " the be"  # mean len ~1 -> fails
    df = spark.createDataFrame([Row(id=1, text=tiny)])
    feats = TX.gopher_rules(F.col("text"))
    r = df.select(*[v.alias(k) for k, v in feats.items()]).collect()[0]
    assert r.mean_word_len < 3.0
    assert not r.passes_gopher


# ---------------------------------------------------------------------------
# incremental dedup
# ---------------------------------------------------------------------------
def test_incremental_band_candidates(spark):
    from advanced_strapi_import_spark.operators import dedup as D

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [Row(id=1, text=base),
         Row(id=2, text="completely different content about spark physical plans")]
    )
    batch = spark.createDataFrame(
        [Row(id=100, text=base + " update"),          # near-dup of corpus id 1
         Row(id=101, text="unrelated brand new document text nothing shared here")]
    )
    cb = D.lsh_bands(D.minhash_signature(corpus, "text", "id"))
    bb = D.lsh_bands(D.minhash_signature(batch, "text", "id"))
    out = D.incremental_band_candidates(cb, bb).collect()
    pairs = {(r.new_id, r.dup_of) for r in out}
    assert (100, 1) in pairs                     # batch near-dup found
    assert all(new >= 100 for new, _ in pairs)   # never corpus x corpus
    assert (101, 2) not in pairs                 # unrelated docs don't collide


def test_dedup_keep_best_semantics(spark):
    """Keeper = longest text in the cluster, min-id tie-break;
    unclustered docs keep themselves under their own id."""
    from pyspark.sql import Window
    from advanced_strapi_import_spark.operators import dedup as D

    base = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame(
        [Row(id=1, text=base),
         Row(id=2, text=base + " update"),        # near-dup, longer -> keeper
         Row(id=3, text="totally unrelated text about catalyst plan rewrites")]
    )
    bands = D.lsh_bands(D.minhash_signature(df, "text", "id"))
    cc = D.connected_components(D.lsh_candidate_pairs(bands))
    labeled = (
        df.join(cc.withColumnRenamed("cluster", "__cc"), "id", "left")
        .select(
            "id", F.coalesce(F.col("__cc"), F.col("id")).alias("cluster"),
            F.length("text").cast("long").alias("n_chars"),
        )
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("n_chars").desc(), F.col("id").asc()
    )
    rows = {r.id: r for r in labeled.select(
        "id", "cluster", (F.row_number().over(w) == 1).alias("is_kept")
    ).collect()}
    assert rows[1].cluster == 1 and rows[2].cluster == 1
    assert rows[2].is_kept and not rows[1].is_kept  # longer wins
    assert rows[3].cluster == 3 and rows[3].is_kept  # singleton keeps itself


def test_incremental_candidates_broadcast_plan(spark):
    """The corpus side must NOT shuffle: the batch bands broadcast, so
    the physical plan joins via BroadcastHashJoin with no Exchange on
    the corpus scan path."""
    from advanced_strapi_import_spark.operators import dedup as D

    corpus = _docs(spark).select(F.col("doc_id").alias("id"), "text")
    batch = _docs(spark).limit(20).select(
        (F.col("doc_id") + 500000).alias("id"), "text"
    )
    cb = D.lsh_bands(D.minhash_signature(corpus, "text", "id"))
    bb = D.lsh_bands(D.minhash_signature(batch, "text", "id"))
    out = D.incremental_band_candidates(cb, bb)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # The candidate join must be broadcast (batch side), never a
    # sort-merge that would shuffle the corpus band table. The band
    # TABLE build itself (signature groupBy) legitimately shuffles —
    # in production that table is precomputed and stored.
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_repeated_ngram_stats_cross_doc_only(spark):
    seq = " ".join(f"w{i}" for i in range(8))          # one shared 8-gram
    df = spark.createDataFrame(
        [
            (1, seq + " tail1 a b c"),
            (2, "lead " + seq),                        # shares the 8-gram with doc 1
            (3, "totally different words " + " ".join(f"x{i}" for i in range(8))),
            (4, "short doc"),                          # < 8 tokens -> no grams
            (5, seq + " " + seq),                      # within-doc repeat only counts
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in CU.repeated_ngram_stats(df, n=8).collect()}
    # doc 4 emits no grams at all
    assert 4 not in got
    # doc 1: 12 tokens -> 5 gram positions, only position 0 ('w0..w7')
    # is cross-doc
    assert got[1]["n_ngrams"] == 5 and got[1]["dup_ngrams"] == 1
    # doc 2: 'lead w0..w6' is unique, 'w0..w7' shared
    assert got[2]["dup_ngrams"] == 1
    # doc 3 shares nothing
    assert got[3]["dup_ngrams"] == 0
    # doc 5 shares 'w0..w7' (and rotations appear only within itself):
    # every gram containing the full shared window counts only if some
    # OTHER doc has it -> exactly the two 'w0..w7' positions
    assert got[5]["dup_ngrams"] == 2


def test_quality_floor_integer_cut_and_ties(spark):
    rows = [(i, "s1", float(i % 5)) for i in range(10)]   # ties on score
    rows += [(100 + i, "s2", float(i)) for i in range(3)]  # tiny stratum
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")
    out = CU.quality_floor(df, score_col="q", by="source").collect()
    s1 = sorted([r for r in out if r["source"] == "s1"], key=lambda r: r["q_rank"])
    # 10 docs -> bottom 10*1//4 = 2 cut
    assert [r["kept"] for r in s1] == [False] * 2 + [True] * 8
    # ties broke by doc_id: the two cut docs are the lowest (q, doc_id)
    assert [r["doc_id"] for r in s1[:2]] == [0, 5]
    s2 = [r for r in out if r["source"] == "s2"]
    # 3 docs -> 3*1//4 = 0 cut: small strata are never over-trimmed
    assert all(r["kept"] for r in s2)
