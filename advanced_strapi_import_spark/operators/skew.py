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


def distributed_ntile(
    df: DataFrame,
    n_buckets: int,
    order_cols: list[str],
    *,
    out_col: str = "bucket",
    num_partitions: int = 32,
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY order_cols)`` without funnelling
    the frame through a single-partition window.

    Classic distributed rank: range-repartition on the order key, take
    partition-local ``row_number`` s, then add each partition's global
    offset (the per-partition row counts — ``num_partitions`` scalar
    rows, NOT data-sized — are collected once and folded back in as a
    broadcast map literal).  The global rank is mapped to its ntile
    bucket arithmetically: with ``q, r = divmod(total, n)`` the first
    ``r`` buckets hold ``q+1`` rows, the rest ``q`` — identical to the
    SQL ``ntile`` contract.  ``order_cols`` must be a TOTAL order
    (tie-break to uniqueness) for a deterministic assignment.

    The non-determinism of range-boundary sampling is harmless: a row's
    global rank is partition-count-offset + local row_number, which is
    invariant to where the boundaries fall."""
    part = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    # tracked persist: the frame feeds the offsets collect AND the rank
    # pass; a raw .persist() would outlive release_tracked()/release_all()
    # and pin the range-shuffled input for the rest of the session.
    # LOAD-BEARING for correctness, not just cost: both consumers must
    # see IDENTICAL __pid assignments, and the MEMORY_AND_DISK persist
    # is what guarantees that — a recompute (serialized-to-nothing
    # storage level, executor loss) would re-run RangePartitioner
    # boundary SAMPLING and could re-deal rows to different partitions
    # between the two passes. Do not "optimize away" this persist.
    from advanced_strapi_import_spark.caching import persist_tracked

    part = persist_tracked(part)
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in part.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    total = sum(c for _, c in counts)
    if total == 0:
        return part.drop("__pid").withColumn(out_col, F.lit(0))
    offsets, acc = [], 0
    for pid, c in counts:
        offsets.extend((F.lit(pid), F.lit(acc)))
        acc += c
    from pyspark.sql import Window

    rank = (
        F.element_at(F.create_map(*offsets), F.col("__pid"))
        + F.row_number().over(
            Window.partitionBy("__pid").orderBy(*order_cols)
        )
    ).cast("long")
    q, r = divmod(total, n_buckets)
    head = r * (q + 1)  # rows covered by the ceil-sized buckets
    bucket = F.when(
        rank <= F.lit(head),
        (rank + F.lit(q)) / F.lit(q + 1),  # ceil(rank / (q+1))
    ).otherwise(
        # ceil((rank - head) / q) + r ; max(q,1) keeps the expression
        # well-typed when q == 0 (branch is then unreachable: every
        # rank is <= head = total)
        (rank - F.lit(head) + F.lit(max(q, 1) - 1)) / F.lit(max(q, 1))
        + F.lit(r)
    )
    return part.withColumn(
        out_col, F.floor(bucket).cast("int")
    ).drop("__pid")


def distributed_cumsum(
    df: DataFrame,
    order_cols: list[str],
    sum_col: str | list[str],
    *,
    out_col: str | list[str] = "cum",
    num_partitions: int = 32,
) -> DataFrame:
    """Exact global running sum of ``sum_col`` (INCLUSIVE of the current
    row) under the total order ``order_cols`` — without funnelling the
    frame through a single-partition window.

    Same distributed-rank recipe as :func:`distributed_ntile`:
    range-repartition on the order key, per-partition local running
    sums, then add each partition's global offset (``num_partitions``
    scalar rows collected once, folded back as a broadcast map
    literal). ``order_cols`` must be a TOTAL order — within ties the
    local running sum is row-order dependent.

    ``sum_col``/``out_col`` also accept LISTS of equal length: all
    running sums share the ONE range repartition, one offsets collect
    (one row per partition carrying every column's partial), and one
    window pass — a caller needing both a running total and a running
    row index (pass a ones column) pays a single shuffle, not two.

    INTEGRAL CONTRACT: every ``sum_col`` must be an integral Spark type
    (byte/short/int/long). The partition offsets round-trip through
    Python ``int`` and the result is cast to BIGINT, so a fractional
    column would be silently truncated with per-partition compounding
    error; we raise instead of guessing.

    As in distributed_ntile, the persist is LOAD-BEARING for
    correctness, not just cost: the offsets collect and the cumsum pass
    must see IDENTICAL ``__pid`` assignments, which a recompute through
    fresh RangePartitioner boundary sampling would not guarantee."""
    from pyspark.sql import Window

    from advanced_strapi_import_spark.caching import persist_tracked

    sum_cols = [sum_col] if isinstance(sum_col, str) else list(sum_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(sum_cols) != len(out_cols):
        raise ValueError("sum_col and out_col must have equal length")
    for sc in sum_cols:
        sum_type = df.schema[sc].dataType.typeName()
        if sum_type not in ("byte", "short", "integer", "long"):
            raise TypeError(
                f"distributed_cumsum requires an integral sum_col; "
                f"{sc!r} is {sum_type} (scale fractional inputs to "
                f"integer units — e.g. micro-units — before calling)"
            )
    part = persist_tracked(
        df.repartitionByRange(num_partitions, *order_cols).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    sums = sorted(
        (r["__pid"], tuple(r[f"s{i}"] for i in range(len(sum_cols))))
        for r in part.groupBy("__pid")
        .agg(*[F.sum(sc).alias(f"s{i}") for i, sc in enumerate(sum_cols)])
        .collect()
    )
    offsets: list[list] = [[] for _ in sum_cols]
    accs = [0] * len(sum_cols)
    for pid, ss in sums:
        for i, s in enumerate(ss):
            offsets[i].extend((F.lit(pid), F.lit(accs[i])))
            accs[i] += int(s or 0)
    if not sums:  # empty frame: no partitions reported
        out = df
        for oc in out_cols:
            out = out.withColumn(oc, F.lit(0).cast("long"))
        return out
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = part
    for i, (sc, oc) in enumerate(zip(sum_cols, out_cols)):
        cum = F.element_at(
            F.create_map(*offsets[i]), F.col("__pid")
        ) + F.sum(sc).over(w)
        out = out.withColumn(oc, cum.cast("long"))
    return out.drop("__pid")
