"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting handles most runtime skew automatically
(enabled in session.py), but two patterns still need explicit salting
at 100 TB:

  - aggregations with a handful of giant keys (AQE cannot split a
    hash-aggregate's build side): pre-aggregate on (key, salt), then
    re-aggregate on key — the classic two-phase combine. Works for any
    algebraic aggregate (sum/count/min/max; avg decomposes into
    sum+count).
  - joins where ONE side has hot keys and the other is mid-sized (too
    big to broadcast): replicate the small side per salt, salt the hot
    side randomly-but-deterministically.

Salting is deterministic here (hash of a secondary column mod salts),
so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    *,
    salt_col: Column,
    salts: int = 16,
) -> DataFrame:
    """Two-phase aggregate: phase 1 groups on (keys, salt) — spreading a
    hot key over ``salts`` reducers — phase 2 combines partials on keys.

    ``aggs`` maps output name -> SUM-combinable partial expression (the
    caller decomposes non-algebraic aggregates). ``salt_col`` should be
    a high-cardinality column; it is hashed mod ``salts``."""
    salted = df.withColumn("__salt", F.pmod(F.hash(salt_col), F.lit(salts)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[v.alias(f"__p_{k}") for k, v in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"__p_{k}").alias(k) for k in aggs]
    )


def salted_join(
    hot: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew join without broadcast: the hot side gets a deterministic
    salt in [0, salts); the small side replicates once per salt; the
    join key becomes (on, salt), so a hot key's rows spread over
    ``salts`` tasks instead of one straggler.

    Only ``inner`` and ``left`` are valid: the salting rewrite
    preserves exactly the hot side's row multiplicity. A right/full/
    semi/anti join would see each small-side row ``salts`` times and
    emit duplicate null-extended (or phantom) rows for salts no hot
    row hashed to — rejected loudly rather than silently wrong."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "the replicated small side breaks other join types"
        )
    hot_s = hot.withColumn(
        "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salts))
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    out = hot_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")
