"""Statistical-audit primitives shared by the parity_relational plans
and property tests.

Both helpers follow the engine's cross-engine determinism rules: exact
integer counts feed every division, divisions that can see a zero
denominator go through try_divide (DuckDB's x/0 is NULL; Spark ANSI
would hard-error), and products that could exceed 2^63 widen to double
before multiplying.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def first_digit(col: Column) -> Column:
    """First significant digit of a numeric >= 1, extracted in exact
    integer/string domain (floor -> BIGINT -> first char). Never uses
    floor(log10(x)): a libm boundary (log10(1000) = 2.9999...) could
    flip the digit differently per engine."""
    return F.substring(F.floor(col).cast("long").cast("string"), 1, 1)


def ks_two_sample(
    df: DataFrame, value_col: str, group_col: str, a: str, b: str
) -> DataFrame:
    """One-row (ks_stat, ks_scaled, n1, n2): two-sample Kolmogorov-
    Smirnov statistic between ``value_col``'s distributions under
    ``group_col == a`` vs ``== b``.

    ECDFs are built from exact integer cumulative counts over the
    DISTINCT value domain — the groupBy collapses the fact table
    before any ordered window runs, so the single-partition ECDF
    window is over distinct values, not rows (the events_median_mad
    caveat class). NULL values are filtered: Spark orders NULLs first
    and DuckDB last, which would diverge the prefix sums."""
    pts = (
        df.filter(
            F.col(group_col).isin(a, b) & F.col(value_col).isNotNull()
        )
        .groupBy(value_col)
        .agg(
            F.count(F.when(F.col(group_col) == a, 1)).alias("c1"),
            F.count(F.when(F.col(group_col) == b, 1)).alias("c2"),
        )
    )
    tot = pts.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    w = Window.orderBy(value_col)
    cum = pts.select(
        F.sum("c1").over(w).alias("s1"), F.sum("c2").over(w).alias("s2")
    )
    d = F.abs(
        F.try_divide(F.col("s1") * F.lit(1.0), F.col("n1"))
        - F.try_divide(F.col("s2") * F.lit(1.0), F.col("n2"))
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.round(F.max(d), 6).alias("ks_stat"),
            F.round(
                F.sqrt(
                    F.col("n1") * F.lit(1.0) * F.col("n2")
                    / (F.col("n1") + F.col("n2"))
                )
                * F.max(d),
                4,
            ).alias("ks_scaled"),
        )
        .select(
            "ks_stat",
            "ks_scaled",
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
        )
    )
