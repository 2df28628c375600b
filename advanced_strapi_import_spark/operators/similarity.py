"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline: a broadcast join of
the (small) query set against the corpus with a JVM-side fold for the
dot product (F.aggregate / zip_with — no Python UDF), then a per-query
window top-k. The scale path buckets the corpus with random-hyperplane
LSH (deterministic md5-seeded planes) so each query only scores its
bucket — the standard recall/cost dial for 1e9-row corpora.

Embeddings in the driver's tables are float32; all arithmetic casts to
double first so results are portable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast(queries) x corpus.

    Output: (query_id, neighbor_id, cos, rank). Deterministic tie-break
    on neighbor id. Scale: one pass over the corpus per batch of
    queries; the corpus is never shuffled."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    pairs = q.crossJoin(c)
    if not include_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_sign(vec: Column, plane: int, dims: int) -> Column:
    """Deterministic pseudo-random hyperplane: component d has sign +1
    iff the md5 of 'plane|d' has an odd first hex digit. JVM-only expr."""
    signs = F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda d: F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{plane}|"), d.cast("string"))), 1, 1
                ),
                16,
                10,
            ).cast("int")
            % 2
            == 1,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)),
    )
    return F.when(_dot(vec, signs) >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket(vec: Column, *, planes: int = 8, dims: int = 64) -> Column:
    """Bucket id = concatenated sign bits across hyperplanes."""
    bits = [hyperplane_sign(vec, p, dims).cast("string") for p in range(planes)]
    return F.concat(*bits)


def _multi_buckets(
    df: DataFrame, vec_col: str, out_id: str, *, tables: int, planes: int, dims: int
) -> DataFrame:
    """(id, vec, table, bucket): one bucket per hash table; table t uses
    planes [t*planes, (t+1)*planes) of the deterministic family."""
    parts = []
    for t in range(tables):
        bits = [
            hyperplane_sign(F.col(vec_col), t * planes + p, dims).cast("string")
            for p in range(planes)
        ]
        parts.append(
            df.select(
                F.col(out_id),
                F.col(vec_col),
                F.lit(t).alias("__table"),
                F.concat(*bits).alias("__bucket"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    tables: int = 8,
    planes: int = 4,
    dims: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k with MULTI-TABLE random-hyperplane LSH: a
    candidate survives if it shares a bucket with the query in ANY of
    the ``tables`` hash tables (union-of-candidates — the standard
    recall/cost dial; single-table recall collapses when true-neighbor
    cosines are moderate). Equi-join on (table, bucket): corpus shuffles
    once, queries broadcast — the 100 TB path."""
    q = _multi_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)),
        vec_col, "query_id", tables=tables, planes=planes, dims=dims,
    ).withColumnRenamed(vec_col, "__qv")
    c = _multi_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)),
        vec_col, "neighbor_id", tables=tables, planes=planes, dims=dims,
    ).withColumnRenamed(vec_col, "__cv")
    cand = (
        F.broadcast(q)
        .join(c, ["__table", "__bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qv", "__cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tables: int = 8,
    planes: int = 4,
    dims: int = 64,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold, multi-table
    LSH-gated: a pair is scored if it collides in ANY table. At a 0.95
    threshold the collision probability per 4-plane table is ~0.66, so 8
    tables give >0.9999 recall while scoring a tiny candidate set."""
    b = _multi_buckets(
        df.select(F.col(id_col).alias("id"), F.col(vec_col)),
        vec_col, "id", tables=tables, planes=planes, dims=dims,
    ).withColumnRenamed(vec_col, "__v")
    a, c = b.alias("a"), b.alias("b")
    pairs = (
        a.join(
            c,
            (F.col("a.__table") == F.col("b.__table"))
            & (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.__v").alias("__va"), F.col("b.__v").alias("__vb"))
        .dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a", "id_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), 6).alias("cos"),
        )
    )
    return pairs.filter(F.col("cos") >= threshold)
