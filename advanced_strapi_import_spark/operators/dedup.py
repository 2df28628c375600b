"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's surface (its only dedup is the upload cache,
csv-import.js:1025-1036 -> dropDuplicates), these are the dedup
primitives a 100 TB corpus pipeline needs. All hashing is md5-based and
engine-portable (identical results in Spark and DuckDB), and every
operator is expressed in native Spark SQL functions — shingling is
sequence+slice (JVM-side), signatures are one groupBy, candidate
generation is an equi-join on band keys. No Python UDFs anywhere.

Scale notes:
  - exact dedup: one shuffle on the content hash.
  - MinHash-LSH: cost O(docs * shingles * H) map-side, then one shuffle
    on (band, band_hash) — the classic way to avoid the O(n^2) pairwise
    join. Band width trades recall vs candidate volume.
  - SimHash: one pass, 32 partial sums per doc; near-dup candidates via
    Hamming distance on the fingerprint (bit tricks, no joins needed
    when bucketing on fingerprint prefixes).
  - n-gram Jaccard: exploded-shingle self-join — quadratic in the worst
    case, so gate it behind LSH candidates in production; exposed
    directly for verification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from advanced_strapi_import_spark.caching import checkpoint_tracked, persist_tracked

# ---------------------------------------------------------------------------
# shared text primitives (portable across Spark/DuckDB)
# ---------------------------------------------------------------------------


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-grams: transform(sequence(1, n-k+1), i ->
    concat_ws(' ', slice(tokens, i, k)))."""
    toks = tokens(text)
    n = F.size(toks)
    return F.array_distinct(
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def hash64(col: Column) -> Column:
    """Portable 63-bit hash: first 15 hex chars of md5 -> bigint.
    (DuckDB mirror: ('0x' || substr(md5(x),1,15))::BIGINT.)"""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash32(col: Column) -> Column:
    """Portable 32-bit hash (first 8 hex chars of md5)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


# universal-hash family over ONE base hash: h_s(x) = (a_s*(h(x) mod P) + b_s) mod P.
# All arithmetic stays under 2^62, so BIGINT math is exact (and identical)
# in both Spark and DuckDB. Constants are fixed odd multipliers.
UHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)


def uhash_consts(s: int) -> tuple[int, int]:
    """Deterministic (a, b) for permutation s; a is odd and nonzero mod P."""
    a = (2654435761 * (s + 1) + 1) % UHASH_P
    b = (40503 * (s + 7) + 13) % UHASH_P
    return (a | 1), b


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content with the
    kept (min) id and the duplicate count."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the min-id row per distinct content."""
    keep = exact_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def shingle_hashes(
    df: DataFrame, text_col: str, id_col: str, *, shingle_k: int = 3
) -> DataFrame:
    """(id, sh64, h32) — ONE explode and ONE md5 per shingle, sliced two
    ways: ``sh64`` (63-bit, for Jaccard set intersection) and ``h32``
    (32-bit mod P, the base of the universal-hash minhash family).

    This is the shared prefix of the whole near-dup pipeline: minhash
    signatures, LSH bands, and Jaccard verification all derive from it,
    so a pipeline that needs several of those persists THIS frame once
    instead of re-exploding (and re-md5-ing) the corpus per stage —
    md5-per-shingle is the dominant map-side cost."""
    m = F.md5(F.col("__sh_raw"))
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), shingle_k)).alias("__sh_raw"),
    ).select(
        "id",
        F.conv(F.substring(m, 1, 15), 16, 10).cast("long").alias("sh64"),
        (F.conv(F.substring(m, 1, 8), 16, 10).cast("long") % UHASH_P).alias("h32"),
    )


def minhash_signature_from_hashes(
    sh: DataFrame, *, num_hashes: int = 16
) -> DataFrame:
    """(id, h0..hN) minhash signature over precomputed ``h32`` base
    hashes: num_hashes cheap integer mixes + one groupBy. All arithmetic
    stays under 2^62 — exact (and identical) BIGINT math in any engine."""
    sig_cols = []
    for s in range(num_hashes):
        a, b = uhash_consts(s)
        sig_cols.append(
            F.min((F.col("h32") * F.lit(a) + F.lit(b)) % UHASH_P).alias(f"h{s}")
        )
    return sh.groupBy("id").agg(*sig_cols)


def minhash_signature(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_k: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """(id, sig) where sig[s] = min over shingles of the s-th universal
    hash of ONE md5 base hash per shingle — 1 md5 + num_hashes cheap
    integer mixes per shingle row instead of num_hashes md5 calls
    (md5 dominated the signature stage)."""
    return minhash_signature_from_hashes(
        shingle_hashes(df, text_col, id_col, shingle_k=shingle_k),
        num_hashes=num_hashes,
    )


def lsh_bands(
    sig: DataFrame, *, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """(id, band, band_hash): each band of rows/band signature columns
    folded — WITH the band id — into one 63-bit bigint. A single narrow
    join/shuffle key (8 bytes vs a 32-char md5 string), and because the
    band id is inside the hash, downstream candidate generation buckets
    on band_hash alone.

    Built as ONE pass over the signature frame — an explode of a
    bands-length struct array — not a union of per-band projections: a
    union re-evaluates the whole upstream signature subplan (shingle
    explode + md5 + groupBy) once per band, quadrupling the dominant
    map cost whenever the signature isn't already materialized."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide evenly into bands "
            f"({bands}) — trailing signature columns would be silently "
            "ignored, weakening the banding guarantee"
        )
    rows = num_hashes // bands
    entries = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows + r}") for r in range(rows)]
        entries.append(
            F.struct(
                F.lit(b).alias("band"),
                hash64(F.concat_ws(",", F.lit(b), *cols)).alias("band_hash"),
            )
        )
    return sig.select("id", F.explode(F.array(*entries)).alias("__e")).select(
        "id", F.col("__e.band").alias("band"), F.col("__e.band_hash").alias("band_hash")
    )


def lsh_candidate_pairs(bands_df: DataFrame) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one band bucket.

    Shape: groupBy(band_hash) -> sorted id set -> in-place pair
    expansion (JVM-side nested transform), then one distinct. Two
    shuffles total, and the quadratic-per-bucket work happens inside a
    bucket row without a join — cheaper than the self-join equivalent,
    which shuffles the bands twice and sort-merges. Bucket width is the
    LSH selectivity knob: band bits keep buckets small by construction
    (a giant bucket means the banding is too coarse, not that the join
    strategy is wrong)."""
    buckets = (
        bands_df.groupBy("band_hash")
        .agg(F.sort_array(F.collect_set("id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pairs = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), y -> struct(x, y))))"
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.x").alias("id_a"), F.col("p.y").alias("id_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash(
    df: DataFrame, text_col: str, id_col: str, *, bits: int = 32
) -> DataFrame:
    """(id, simhash): sign of per-bit weighted sums over 32-bit token
    hashes — one explode + one groupBy, 32 conditional sums."""
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("t"),
    ).withColumn("h", hash32(F.col("t")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy("id").agg(*bit_sums)
    fp = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select("id", fp.cast("long").alias("simhash"))


def hamming_pairs(
    fp: DataFrame, *, max_distance: int = 3, bits: int = 32
) -> DataFrame:
    """Near-dup pairs by Hamming distance on fingerprints. Candidates
    are generated by bucketing on fingerprint halves (a doc pair within
    distance d shares at least one of d+1 equal chunks — pigeonhole), so
    the join stays equi."""
    chunks = max_distance + 1
    chunk_bits = bits // chunks
    mask = (1 << chunk_bits) - 1

    def chunk_val(col: Column, c: int) -> Column:
        return F.shiftright(col, c * chunk_bits).bitwiseAND(F.lit(mask))

    parts = []
    for c in range(chunks):
        parts.append(
            fp.select(
                "id",
                "simhash",
                F.lit(c).alias("chunk"),
                chunk_val(F.col("simhash"), c).alias("chunk_val"),
            )
        )
    buckets = parts[0]
    for p in parts[1:]:
        buckets = buckets.unionByName(p)
    a, b = buckets.alias("a"), buckets.alias("b")
    dist = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    # A pair sharing k chunks would surface k times; instead of a
    # distinct() (which shuffles every surviving pair again, ~4x the
    # result size), emit the pair ONLY from its lowest shared chunk:
    # require every chunk below the join chunk to differ. Both full
    # fingerprints ride the join, so the guard is a cheap post-join
    # predicate inside the bucket — the dedup costs zero exchanges.
    lowest = F.lit(True)
    for c in range(chunks - 1):
        lowest = lowest & F.when(
            F.col("a.chunk") > c,
            chunk_val(F.col("a.simhash"), c) != chunk_val(F.col("b.simhash"), c),
        ).otherwise(F.lit(True))
    return a.join(
        b,
        (F.col("a.chunk") == F.col("b.chunk"))
        & (F.col("a.chunk_val") == F.col("b.chunk_val"))
        & (F.col("a.id") < F.col("b.id"))
        & (dist <= max_distance)
        & lowest,
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        dist.alias("hamming"),
    )


# ---------------------------------------------------------------------------
# label propagation (community detection over the candidate graph)
# ---------------------------------------------------------------------------
def label_propagation(
    pairs: DataFrame, *, iterations: int = 2
) -> DataFrame:
    """(node, label) after ``iterations`` synchronous label-propagation
    rounds over an undirected (id_a, id_b) pair graph.

    Deterministic LPA: every node starts labeled with its own id; each
    round ALL nodes simultaneously adopt the most frequent label among
    their neighbors' previous-round labels, ties broken toward the
    smallest label. Unlike :func:`connected_components` (reachability:
    one bridge edge merges two cliques), majority voting lets LPA keep
    densely-linked groups apart across a thin bridge — the community
    view of a dup-candidate graph.

    Each round is one equi-join (edges x labels, both hash-partitioned
    on the node id) + a (node, label) count + a partitioned rank
    filter: O(E) shuffle per round, no driver-side state, bounded
    rounds — the scalable synchronous LPA shape.

    Pairs are CANONICALIZED (least, greatest) and deduped here (same
    defensive posture as connected_components): a repeated (a, b) row —
    or the same undirected edge arriving as both (a, b) and (b, a) —
    would double-weight that neighbor's vote and can flip a majority.
    Self-loops (id_a == id_b) are dropped before canonicalization —
    a surviving (a, a) row would symmetrize into two identical edge
    rows and double-count the self-vote.
    The symmetrized edge list is MATERIALIZED EAGERLY at call time (an
    eager checkpoint — it is read once for the initial labels and once
    per round, and without it the whole upstream pair-generation
    pipeline would re-execute each time). Two caveats callers must
    know: (1) calling this function executes Spark jobs immediately —
    it does not build an inspectable lazy plan; (2) by default the
    checkpoint is executor-local (unreplicated), so on a real cluster
    an executor loss or dynamic-allocation scale-down mid-query is
    unrecoverable — set caching.RELIABLE_CHECKPOINT_CONF=true plus a
    checkpoint dir for a fault-tolerant run (same contract as
    :func:`connected_components`)."""
    from pyspark.sql import Window

    base = (
        pairs.filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
    # r12: eager localCheckpoint instead of a lazy run-scoped persist —
    # the edge list has three consumers (initial labels + one join per
    # round), and an unmaterialized persisted frame under concurrent
    # consumers recomputes raced partitions through the whole upstream
    # pair build (the kcore race class); the checkpoint also truncates
    # every round's analyzed plan to a LogicalRDD leaf. Edge lists are
    # dup-graph-sized at any corpus scale.
    edges = (
        base.union(
            base.select(F.col("id_b"), F.col("id_a"))
        ).toDF("node", "nbr")
        .transform(checkpoint_tracked)
    )
    labels = (
        edges.select("node").distinct().withColumn("label", F.col("node"))
    )
    w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("label"))
    for _ in range(iterations):
        nbr_labels = edges.join(
            labels.withColumnRenamed("node", "nbr"), "nbr"
        ).select("node", "label")
        labels = (
            nbr_labels.groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    return labels


# ---------------------------------------------------------------------------
# duplicate clustering (iterative connected components)
# ---------------------------------------------------------------------------
def connected_components(
    pairs: DataFrame, *, max_iter: int = 20, driver_threshold: int = 2_000_000
) -> DataFrame:
    """(id, cluster) where cluster = min id of the connected component
    in the near-dup pair graph — the step that turns pairwise dedup
    verdicts into keep/drop groups.

    Iterative min-label propagation with pointer jumping: each round
    every node takes the min label in its neighborhood, then labels
    are compressed one hop (label := label's label), which halves
    remaining path lengths — O(log diameter) rounds instead of
    O(diameter). Each round is two joins + one groupBy (shuffles on
    id); localCheckpoint truncates the growing lineage. This is the
    one genuinely iterative operator in the engine — inherently
    non-SQL-expressible, so its driver check is rows-only and its
    correctness test compares against union-find.

    Convergence is detected by sum(cluster): labels only ever decrease
    (min-propagation), so the label sum is strictly decreasing until
    the fixpoint — one no-join aggregate per round instead of the
    old join-and-count of changed rows. The iteration's shuffle width
    is sized to the (materialized) edge count and restored afterwards:
    a duplicate graph is far smaller than the corpus that produced it,
    and per-round fixed cost scales with partition count."""
    spark = pairs.sparkSession
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        # materialize once: every iteration joins edges, and without this
        # the whole upstream pair-generation pipeline would re-run per round
        .transform(checkpoint_tracked)
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    n_edges = edges.count()  # cheap: counts the checkpointed partitions
    if n_edges <= driver_threshold:
        # Small-graph fast path: a near-dup edge list is orders of
        # magnitude smaller than the corpus that produced it (it holds
        # only detected duplicates). Under the threshold (~32 MB of
        # id pairs) a driver-side union-find beats O(log diameter)
        # distributed rounds, each of which costs two shuffles plus a
        # checkpoint, by a wide margin — this is the standard hybrid in
        # production dedup pipelines. Above it, pointer jumping runs.
        return _cc_driver(spark, edges)
    loop_parts = min(int(prev_parts), max(2, n_edges // 250_000))
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        labels = _cc_loop(edges, max_iter)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return labels


def _cc_driver(spark, edges: DataFrame) -> DataFrame:
    """Union-find on a collected edge list (bounded by driver_threshold;
    the caller guarantees the count). Path-halving + union-by-label-min
    keeps it near-linear; results are identical to the distributed loop:
    cluster = min node id of the component."""
    from pyspark.sql import types as T

    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    pdf = edges.select("src", "dst").toPandas()  # Arrow batch transfer
    for src, dst in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
        if src not in parent:
            parent[src] = src
        if dst not in parent:
            parent[dst] = dst
        ra, rb = find(src), find(dst)
        if ra != rb:
            # union by min so the root IS the min id (matches min-label
            # propagation's fixpoint: cluster = min id of the component)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    id_type = edges.schema["src"].dataType
    schema = T.StructType(
        [T.StructField("id", id_type), T.StructField("cluster", id_type)]
    )
    from advanced_strapi_import_spark.operators.similarity import _local_df

    return _local_df(spark, [(n, find(n)) for n in parent], schema)


def _cc_loop(edges: DataFrame, max_iter: int) -> DataFrame:
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("cluster", F.col("id"))
    )
    prev_sum = None
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("cluster").alias("nmin"))
        )
        propagated = labels.join(
            neighbor_min, labels["id"] == neighbor_min["src"], "left"
        ).select(
            "id",
            F.least(F.col("cluster"), F.coalesce("nmin", F.col("cluster"))).alias("cluster"),
        )
        # pointer jump: cluster := cluster's cluster (labels are always
        # node ids of the same component, so the lookup stays in-component)
        jump = propagated.select(
            F.col("id").alias("__jid"), F.col("cluster").alias("__jc")
        )
        new_labels = (
            propagated.join(jump, propagated["cluster"] == jump["__jid"], "left")
            .select(
                "id",
                F.least(
                    F.col("cluster"), F.coalesce("__jc", F.col("cluster"))
                ).alias("cluster"),
            )
            .transform(checkpoint_tracked)
        )
        label_sum = new_labels.agg(
            F.sum(F.col("cluster").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels = new_labels
        if label_sum == prev_sum:
            break
        prev_sum = label_sum
    return labels


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------
def jaccard_on_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_k: int = 3,
    threshold: float = 0.5,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """Jaccard verification restricted to candidate ``pairs`` (id_a,
    id_b) — the production shape: LSH proposes, Jaccard disposes. Cost
    is O(|pairs| * shingles) instead of the all-pairs self-join.

    ``shingle_df``: optionally the (persisted) output of
    ``shingle_hashes`` — lets a pipeline that already exploded the
    corpus for minhash/LSH reuse those rows instead of re-exploding."""
    if shingle_df is not None:
        sh = shingle_df.select("id", F.col("sh64").alias("sh"))
    else:
        sh = df.select(
            F.col(id_col).alias("id"),
            F.explode(shingles(F.col(text_col), shingle_k)).alias("__sh_raw"),
        ).select("id", hash64(F.col("__sh_raw")).alias("sh"))
    # ONE groupBy collapses the exploded shingles to a set-array per doc
    # (PPJoin-style verification layout): the pair joins then move 1 row
    # per doc instead of 1 row per shingle — same bytes, ~2 orders of
    # magnitude fewer join rows than joining the exploded table twice,
    # and the set intersection runs as a JVM array op per pair. Array
    # size is bounded by document length, the same bound the exploded
    # form's per-doc row count already had.
    j = set_overlap_on_pairs(sh, pairs).withColumn(
        "jaccard",
        F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4),
    )
    return j.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def set_overlap_on_pairs(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """(pairs columns, na, nb, inter) for candidate pairs via the
    set-array layout: ``sh`` is (id, sh) DISTINCT-element rows; one
    groupBy collapses each doc to an array row, the pair joins move
    one row per doc instead of one per element, and the intersection
    runs as a JVM array op per pair. Single source of truth for
    jaccard_on_pairs, minhash_est_error's exact arm, and
    dedup_weighted_pagerank's edge weights — elements must be DISTINCT
    per id (array_intersect is set semantics) and hashed (63-bit) so a
    collision stays consistent cross-engine.

    The set-array frame is persisted and EAGERLY filled: both pair-join
    sides consume it, usually as two independent broadcast builds, and
    without materialization each build re-runs the whole collapse
    aggregate from its upstream (ReuseExchange can't dedupe the two
    differently-aliased broadcast exchanges; measured as the collapse
    agg running twice in dedup_family_recall's verify stage). The fill
    is the kcore-race discipline: materialize BEFORE handing the frame
    to racing consumers."""
    from advanced_strapi_import_spark.caching import persist_tracked

    sets_df = persist_tracked(
        sh.groupBy("id").agg(F.collect_list("sh").alias("__shs"))
    )
    sets_df.count()
    a = sets_df.select(
        F.col("id").alias("id_a"), F.col("__shs").alias("__sa"),
        F.size("__shs").alias("na"),
    )
    b = sets_df.select(
        F.col("id").alias("id_b"), F.col("__shs").alias("__sb"),
        F.size("__shs").alias("nb"),
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("__sa", "__sb")))
        .drop("__sa", "__sb")
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs over the threshold, via an
    exploded-shingle self-join (inter) against per-doc shingle counts
    (union = |A| + |B| - inter)."""
    # join/shuffle on a 63-bit shingle hash, not the 32-char md5 or raw
    # text — ~4x smaller shuffle payload, same result (both engines hash
    # identically, so even a collision stays consistent cross-engine)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), shingle_k)).alias("__sh_raw"),
    ).select("id", hash64(F.col("__sh_raw")).alias("sh"))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    j = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# incremental dedup (batch vs corpus)
# ---------------------------------------------------------------------------
def incremental_band_candidates(
    corpus_bands: DataFrame, batch_bands: DataFrame
) -> DataFrame:
    """(new_id, dup_of) candidates for an ARRIVING batch against an
    existing corpus — the daily-ingest shape of LSH dedup at 100 TB:
    the corpus band table is computed once and stored (the "signature
    table" pattern); each day only the new batch is shingled, and the
    join generates batch x (corpus + earlier-batch) candidates, never
    corpus x corpus. Requires batch ids to sort after corpus ids (the
    natural monotonic-ingest-id layout); ``id < new_id`` then both
    orders within-batch pairs and excludes old x old for free.

    The batch side is broadcast: a day's arrivals are orders of
    magnitude smaller than the corpus, so the corpus band table never
    shuffles — the scan streams against the broadcast hash map."""
    all_bands = corpus_bands.unionByName(batch_bands)
    new = F.broadcast(
        batch_bands.select(
            F.col("id").alias("new_id"), F.col("band_hash").alias("__bh")
        )
    )
    return (
        all_bands.join(
            new,
            (F.col("band_hash") == F.col("__bh")) & (F.col("id") < F.col("new_id")),
        )
        .select("new_id", F.col("id").alias("dup_of"))
        .distinct()
    )


def word_ngram_sets(
    df: DataFrame, text_col: str, id_col: str, *, n: int = 2
) -> DataFrame:
    """(id, tok) distinct word n-gram sets over \\s+-normalized lowercase
    tokens — the input relation for set-similarity operators (prefix
    filtering, exact token Jaccard). n=2 bigrams carry word order, which
    keeps templated same-vocabulary docs from colliding the way unigram
    sets do. Docs with fewer than n words contribute no rows."""
    ws = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    grams = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(grams)).alias("tok"),
    )


def prefix_filter_candidates(
    toks: DataFrame, *, prefix_k: int = 3, max_df: int = 50
) -> DataFrame:
    """PPJoin-style prefix-filter blocking over word token sets (the
    third classic candidate-generation family next to MinHash-LSH and
    sorted-neighborhood): two similar sets MUST share a token inside
    their rarest-``prefix_k`` prefix, so only docs sharing a rare-token
    prefix entry become candidates — an equi-join on the prefix token,
    O(sum prefix sizes), never all-pairs. Rarity order = global
    document frequency (ascending, token tie-break), which makes
    prefix entries near-unique and candidate groups tiny by
    construction: the prefix build is one shuffle on the token (the
    dfreq join broadcasts back), the pair join shuffles only
    ``prefix_k`` rows per doc. Returns distinct (id_a, id_b), id_a <
    id_b, with each side's token-set size for downstream Jaccard.

    Algorithm per SSJoin/PPJoin (public literature); behavior parity
    target: dedup_minhash_pairs candidate generation."""
    from pyspark.sql.window import Window

    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__dfreq"))
    # the prefix-filter guarantee assumes prefix entries are RARE; on a
    # corpus with heavy duplication a doc's "rarest" tokens can still be
    # shared by hundreds of near-identical docs, making candidate groups
    # quadratic (measured 3.8M pairs vs 1k with the cap on the sf0.1
    # corpus). max_df drops prefix entries whose document frequency
    # exceeds the cap: work becomes O(n * prefix_k * max_df) by
    # construction. Pairs whose only shared evidence is high-df tokens
    # are the exact-duplicate/templated head, which the upstream
    # exact-dedup and MinHash-LSH stages own (see dedup_family_recall).
    #
    # The max_df cut happens BEFORE the rank window, which is
    # equivalent (rank order is dfreq-ASCENDING, so every token with
    # dfreq > max_df sorts after all of a doc's qualifying tokens:
    # filtering before or after ranking selects the same prefix set)
    # and collapses the window input from |tok rows| to only the rare
    # occurrences — on the heavy-dup bench corpus that is 519k -> ~500
    # rows, removing the dominant exchange+sort of the old plan. Set
    # sizes come from a separate tiny groupBy(id) aggregate (they must
    # count ALL tokens, not just rare ones) that broadcasts back onto
    # the prefix rows.
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n_toks"))
    rare = toks.join(dfreq.filter(F.col("__dfreq") <= max_df), "tok")
    w = Window.partitionBy("id").orderBy("__dfreq", "tok")
    prefix = (
        rare.select("id", "tok", F.row_number().over(w).alias("__rn"))
        .filter(F.col("__rn") <= prefix_k)
        .join(sizes, "id")
        .select("id", "tok", "n_toks")
    )
    return (
        prefix.select(
            F.col("id").alias("id_a"), "tok", F.col("n_toks").alias("n_a")
        )
        .join(
            prefix.select(
                F.col("id").alias("id_b"), "tok", F.col("n_toks").alias("n_b")
            ),
            "tok",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "n_a", "n_b")
        .distinct()
    )


def kcore(pairs: DataFrame, k: int = 2, rounds: int = 3) -> DataFrame:
    """Fixed-round k-core peeling over an undirected candidate-pair
    graph: repeatedly drop nodes whose degree is below ``k`` and the
    edges touching them, ``rounds`` times; return the surviving nodes
    with their residual degree.

    OUTPUT CONTRACT — this is a ``rounds``-round PEEL, not the exact
    k-core: (node, degree, converged). ``converged`` is TRUE iff the
    RESULT is already a fixpoint — min residual degree >= k, i.e. one
    more round would remove nothing and the returned subgraph IS the
    exact k-core. When FALSE, long chain graphs still contain nodes
    with residual degree < k; callers needing the exact core re-enter
    with more rounds until the flag flips.

    The k-core is the densest-region filter used on dedup candidate
    graphs: LSH emits chains and stars whose low-degree fringe is
    usually a false positive, while nodes that keep >= k neighbors
    after peeling sit in genuinely duplicated families. A fixed round
    count (peeling converges geometrically; 3 rounds settles all but
    adversarial chains) keeps the plan static and oracle-matchable —
    the exact fixpoint variant is this same loop driven until the
    count stops moving. An EMPTY result is also terminal: the peel
    removed every node, the exact k-core is the empty graph, and —
    since zero rows carry no ``converged`` column value to observe —
    callers of the re-enter loop must treat zero rows as converged
    (more rounds can never resurrect a node).

    Edges are canonicalized/deduped/self-loop-filtered like
    label_propagation (a duplicate or reversed pair would double a
    degree and can wrongly keep a fringe node). Each round is one
    degree aggregation plus two semi-joins, all hash-partitioned on
    the node id — O(E) shuffle per round, no driver state; each
    round's survivor edge set is MATERIALIZED EAGERLY (an eager
    checkpoint) so the next round — and the final degree count — reads
    it once instead of re-deriving the whole peel history. Caveats,
    same as :func:`label_propagation`: calling this executes Spark
    jobs immediately (one per peel round — no inspectable lazy plan),
    and the default executor-local checkpoint is unrecoverable on
    executor loss; set caching.RELIABLE_CHECKPOINT_CONF=true plus a
    checkpoint dir on a real cluster."""

    base = (
        pairs.filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
    edges = (
        base.union(base.select(F.col("id_b"), F.col("id_a"))).toDF(
            "node", "nbr"
        )
        .transform(checkpoint_tracked)
    )
    for _ in range(rounds):
        keep = (
            edges.groupBy("node")
            .agg(F.count(F.lit(1)).alias("__deg"))
            .filter(F.col("__deg") >= k)
            .select("node")
        )
        edges = (
            edges.join(keep, "node").join(
                keep.withColumnRenamed("node", "nbr"), "nbr"
            ).select("node", "nbr")
            .transform(checkpoint_tracked)
        )
    # convergence flag as a WINDOW over the final degree frame — ONE
    # linear pipeline. Every scalar-aggregate formulation (crossJoin of
    # a broadcast min, count comparison of the last two rounds) makes
    # the flag a SECOND consumer of the unmaterialized persisted peel
    # chain, and Spark's broadcast-build thread then races the main
    # job through the whole history — measured ~2x duplicate partition
    # computation ("Block already exists" warns). The window's
    # single-partition exchange carries only the node-domain OUTPUT
    # (already collapsed from edges); at extreme surviving-node
    # cardinality read min(degree) from the returned frame in a
    # separate action instead of trusting this column.
    from pyspark.sql import Window

    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        edges.groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .withColumn("converged", F.min("degree").over(wall) >= k)
    )
