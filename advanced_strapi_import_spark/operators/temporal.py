"""Temporal joins: as-of and interval (range) joins.

The reference has no sort-merge/range/as-of joins (SURVEY §2.3 note);
these are the beyond-parity operators a time-series/feature pipeline
needs. Spark has no native ASOF JOIN, so:

  - ``asof_join``: the union-tag trick — union both streams tagged,
    window ``last(value, ignorenulls=True)`` over (key, time, tag) —
    ONE shuffle by key, no range blow-up, no per-row lookups. This is
    the scale-correct form (a join+filter+max would shuffle the
    cartesian range product).
  - ``interval_join``: equi-join on overlapping coarse time buckets +
    exact range predicate — turns the inequality join into an equi join
    with bounded duplication (ceil(interval/bucket) + 1 buckets per
    row), the standard trick for range joins at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.on <= left.on (backward; 'forward' flips), matching on ``by``.

    Implementation: tag and union the two streams, sort within each
    ``by`` partition by (time, tag) and carry the last right ROW
    forward as one struct. The struct (non-null for every right row,
    even one whose value columns are all NULL) is what merge_asof /
    DuckDB ASOF attach — carrying each value column independently with
    ignorenulls would skip genuinely-NULL right values and could
    stitch one output row from DIFFERENT right rows. Left columns pass
    through unchanged."""
    lcols = left.columns
    clash = [c for c in value_cols if c in lcols]
    if clash:
        raise ValueError(
            f"value_cols {clash} already exist in left — the output "
            "would carry duplicate column names; rename before joining"
        )
    # right rows (__tag=0) must sort BEFORE left rows at equal timestamps
    # in BOTH directions, so exact matches are included (same semantics
    # as pandas merge_asof allow_exact_matches=True / DuckDB ASOF)
    tag_order = F.col("__tag").asc()
    r = right.select(
        F.col(by),
        F.col(on),
        F.struct(*[F.col(c) for c in value_cols]).alias("__rrow"),
    ).withColumn("__tag", F.lit(0))
    l = left.withColumn("__tag", F.lit(1)).withColumn(
        "__rrow", F.lit(None).cast(r.schema["__rrow"].dataType)
    )
    u = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        w = Window.partitionBy(by).orderBy(F.col(on).asc(), tag_order).rowsBetween(
            Window.unboundedPreceding, 0
        )
    else:
        w = Window.partitionBy(by).orderBy(F.col(on).desc(), tag_order).rowsBetween(
            Window.unboundedPreceding, 0
        )
    out = (
        u.withColumn("__asof", F.last("__rrow", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    return out.select(
        *[F.col(c) for c in lcols],
        *[F.col("__asof").getField(c).alias(c) for c in value_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join point events into [start, end] intervals via bucketed
    equi-join + exact predicate. Intervals explode into their covered
    buckets; points compute one bucket — the join is equi on the bucket,
    then the exact range filter runs on the (bounded) candidates."""
    if how not in ("inner", "left"):
        # intervals are EXPLODED into ceil(len/bucket)+1 bucket rows: a
        # right/full outer join would emit one null-padded output row
        # PER BUCKET for an unmatched interval instead of one — reject
        # rather than silently multiply rows
        raise ValueError(
            f"interval_join supports how='inner'|'left', got {how!r}"
        )
    p_bucket = (F.unix_timestamp(F.col(point_ts)) / bucket_seconds).cast("long")
    i_start = F.unix_timestamp(F.col(start_ts))
    i_end = F.unix_timestamp(F.col(end_ts))
    ivals = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (i_start / bucket_seconds).cast("long"),
                (i_end / bucket_seconds).cast("long"),
            )
        ),
    )
    pts = points.withColumn("__bucket", p_bucket).alias("__p")
    ivals = ivals.alias("__i")
    # the exact range predicate is part of the JOIN CONDITION, not a
    # post-filter: a post-filter on interval columns evaluates NULL for
    # an outer join's unmatched rows and silently degrades how='left'
    # back to inner (unmatched points would vanish)
    cond = (
        (F.col("__p.__bucket") == F.col("__i.__bucket"))
        & (F.col(point_ts) >= F.col(start_ts))
        & (F.col(point_ts) <= F.col(end_ts))
    )
    joined = pts.join(ivals, cond, how)
    return joined.drop("__bucket")


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join via COGROUPED applyInPandas — the Arrow fallback shape
    for operators whose per-group logic outgrows SQL (here it's
    pandas.merge_asof per key group). Both inputs shuffle once on the
    ``by`` key; matching groups arrive as two aligned pandas frames per
    task and never cross group boundaries — O(group) memory, all keys
    in parallel. Equivalent to the native union+window asof_join
    (asserted in tests); the native form is preferred when semantics
    fit SQL — this exists as the documented pattern for when they
    don't (custom interpolation, model scoring per key, etc.)."""
    import pandas as pd

    lcols = list(left.columns)
    clash = [c for c in value_cols if c in lcols]
    if clash:
        # merge_asof would suffix the collision to c_x/c_y and the
        # final column selection would KeyError inside the UDF at
        # runtime — fail at plan time with the same contract as
        # asof_join
        raise ValueError(
            f"value_cols {clash} already exist in left — rename before joining"
        )
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in left.schema.fields
    ) + ", " + ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in right.select(*value_cols).schema.fields
    )

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=lcols + value_cols)
        ls = l.sort_values(on, kind="mergesort")
        rs = r.sort_values(on, kind="mergesort")[[on] + value_cols]
        out = pd.merge_asof(
            ls, rs, on=on, direction=direction,
            allow_exact_matches=True,
        )
        return out[lcols + value_cols]

    return (
        left.groupBy(by)
        .cogroup(right.select(by, on, *value_cols).groupBy(by))
        .applyInPandas(merge, out_schema)
    )
