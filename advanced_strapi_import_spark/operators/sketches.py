"""Probabilistic sketch operators: count-min and Bloom-filter gating.

The reference has no sketch surface (its closest analogue is the exact
import counters, /root/reference/server/services/csv-import.js:364-368);
these are the approximate structures a 100 TB pipeline needs where exact
state would not fit: heavy-hitter tracking over unbounded key domains
(count-min) and membership gating of arriving batches against a corpus
too large to join per ingest (Bloom).

Both sketches are built from the same portable md5-based hash family as
the dedup operators (`dedup.hash32` + `dedup.uhash_consts`), so every
bucket index and bit position is reproducible bit-for-bit in any engine
— the DuckDB oracles replicate the sketches exactly rather than
checking loose bounds.

Scale notes:
  - count-min: one groupBy over (depth x width) buckets — the sketch
    table is depth*width rows regardless of input size, and the build
    is a single map-side-combinable aggregation. Estimation joins the
    (tiny) sketch table broadcast.
  - Bloom: the corpus collapses to an m-bit bitmap ONCE (m bits =
    m/8 bytes driver-side; 2^20 bits = 128 KiB), broadcast to every
    executor; each arriving batch is tested locally — zero shuffle on
    the batch, no join against the corpus. This is the classic
    anti-join-avoidance gate: a `might_contain` miss is a guaranteed
    novel document (no false negatives), only hits need the exact
    verify path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from advanced_strapi_import_spark.operators.dedup import UHASH_P, hash32, uhash_consts

# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def cms_bucket(key: Column, depth_idx: int, width: int) -> Column:
    """Bucket of ``key`` in sketch row ``depth_idx``: the same universal
    hash family as minhash, reduced mod the row width. Exact BIGINT
    arithmetic — identical in Spark and DuckDB."""
    a, b = uhash_consts(depth_idx)
    return ((hash32(key) % UHASH_P) * a + b) % UHASH_P % width


def cms_build(
    df: DataFrame, key: Column, *, depth: int = 4, width: int = 512
) -> DataFrame:
    """(d, bucket, cnt): the count-min table as one DataFrame.

    One explode of a depth-length array per row, then a single
    map-side-combinable groupBy over at most depth*width groups — the
    sketch never grows with the key domain, which is the point."""
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), cms_bucket(key, d, width).alias("bucket")
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("__c"))
        .groupBy(F.col("__c.d").alias("d"), F.col("__c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key: Column, *, depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Append ``cms_cnt`` = min over sketch rows of the key's bucket
    count — the count-min estimate, which can only over-count (every
    row's bucket contains the key's full count plus collisions).

    The sketch is depth*width rows -> broadcast; the keys side never
    shuffles."""
    exploded = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cms_bucket(key, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__q"),
    ).select("*", F.col("__q.d").alias("d"), F.col("__q.bucket").alias("bucket"))
    out_cols = [c for c in keys.columns]
    # LEFT join + coalesce(0): cms_build stores only OBSERVED buckets,
    # so a probe key hashing to any empty bucket has true count-min 0 —
    # an inner join would drop such keys entirely (breaking the
    # 'append cms_cnt to every key' contract) and a key with a mix of
    # empty and collided buckets would min() over only the collided
    # ones, inflating the estimate.
    return (
        exploded.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(*out_cols)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_cnt"))
    )


# ---------------------------------------------------------------------------
# Bloom filter gate
# ---------------------------------------------------------------------------


def bloom_positions(key: Column, *, k: int = 4, m: int = 1 << 20) -> Column:
    """array<long> of the ``k`` bit positions of ``key`` — one md5 base
    hash, k cheap integer mixes (offset so the hash family does not
    collide with the count-min rows)."""
    h = hash32(key) % UHASH_P
    parts = []
    for i in range(k):
        a, b = uhash_consts(100 + i)
        parts.append((h * a + b) % UHASH_P % m)
    return F.array(*parts)


def bloom_gate(
    corpus: DataFrame,
    batch: DataFrame,
    key_col: str,
    *,
    k: int = 4,
    m: int = 1 << 20,
    flag_col: str = "bloom_hit",
) -> DataFrame:
    """Append ``bloom_hit`` to ``batch``: True when every bit position
    of the batch row's key is set by some corpus key.

    Build: corpus -> distinct bit positions (<= min(k*|corpus|, m)
    rows) -> driver bitmap (m/8 bytes) -> ``sc.broadcast``. Test: a
    vectorized pandas UDF indexes the bitmap per batch row — the batch
    is never shuffled and the corpus is never re-read per ingest. A
    False is a guaranteed novel key (Bloom filters have no false
    negatives); True still needs the exact path for the fp-rate
    fraction of genuinely novel keys."""
    import numpy as np
    import pandas as pd

    pos = (
        corpus.select(F.explode(bloom_positions(F.col(key_col), k=k, m=m)).alias("p"))
        .distinct()
        .collect()
    )
    bitmap = np.zeros(m, dtype=bool)
    bitmap[[r[0] for r in pos]] = True
    bc = corpus.sparkSession.sparkContext.broadcast(np.packbits(bitmap))

    def _test(positions: pd.Series) -> pd.Series:
        bits = np.unpackbits(bc.value).astype(bool)
        return positions.map(lambda ps: bool(bits[np.asarray(ps)].all()))

    _test.__annotations__ = {"positions": pd.Series, "return": pd.Series}
    test = F.pandas_udf(_test, "boolean")
    return batch.withColumn(
        flag_col, test(bloom_positions(F.col(key_col), k=k, m=m))
    )
