"""Scale-behavior tests: bucketed co-located joins eliminate the
shuffle; HLL sketches stay inside their error bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_strapi_import_spark.plans.registry import load
from conftest import SF_TEST


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Pre-bucketing both sides of a recurring join key removes the
    Exchange entirely — the co-location strategy SCALE.md prescribes
    for repeated fact-to-fact joins."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckdb LOCATION '{tmp_path}/warehouse'")
    orders = load(spark, SF_TEST, "orders")
    li = load(spark, SF_TEST, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("buckdb.orders_b")
    )
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("buckdb.lineitem_b")
    )
    ob = spark.table("buckdb.orders_b")
    lb = spark.table("buckdb.lineitem_b")
    # force the non-broadcast path so the join itself must co-locate
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(lb, ob["o_orderkey"] == lb["l_orderkey"]).select(
            "o_orderkey", "o_orderstatus", "l_quantity"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed-bucketed equi-join: SortMergeJoin with ZERO exchanges
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        n_bucketed = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    n_plain = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).count()
    assert n_bucketed == n_plain


def test_approx_count_distinct_within_bound(spark):
    from advanced_strapi_import_spark.plans.parity_analytics import events_approx_users

    rows = events_approx_users(spark, SF_TEST).collect()
    assert rows
    for r in rows:
        assert r["exact_users"] > 0
        assert r["within_bound"] is True, (
            f"{r['event_type']}: HLL estimate outside 3x-rsd bound of "
            f"exact={r['exact_users']}"
        )


def test_chunk_documents_overlap_and_tail(spark):
    from advanced_strapi_import_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, words), (2, "short doc")], "doc_id long, text string")
    out = chunk_documents(df, "text", "doc_id", chunk_tokens=64, overlap=16)
    rows = {(r["id"], r["chunk_index"]): r for r in out.collect()}
    # doc 1: 100 tokens, stride 48 -> ceil(84/48) = 2 chunks
    assert rows[(1, 0)]["n_chunks"] == 2 and rows[(1, 1)]["n_tokens"] == 52
    c0, c1 = rows[(1, 0)]["chunk_text"].split(), rows[(1, 1)]["chunk_text"].split()
    assert len(c0) == 64
    assert c0[48:] == c1[:16]           # 16-token overlap carried over
    assert c1[-1] == "w99"              # ragged tail kept
    # doc 2: shorter than one chunk -> exactly one chunk with all tokens
    assert rows[(2, 0)]["n_chunks"] == 1 and rows[(2, 0)]["n_tokens"] == 2


def test_redact_pii_patterns(spark):
    from advanced_strapi_import_spark.operators.text import redact_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-y.co phone +1 (555) 010-99 ip 10.0.3.7 clean 42")],
        "id long, text string",
    )
    got = df.select(redact_pii(F.col("text")).alias("t")).collect()[0]["t"]
    assert "<EMAIL>" in got and "<PHONE>" in got and "<IP>" in got
    assert "a.b+c@" not in got and "555" not in got and "10.0.3.7" not in got
    assert got.endswith("clean 42")  # short numbers untouched


def test_explode_tokens_udtf_lateral(spark):
    """Python UDTF fan-out through a LATERAL join: ordinal positions,
    stopword flags, empty text yields no rows."""
    from advanced_strapi_import_spark.operators.text import explode_tokens_udtf

    df = spark.createDataFrame(
        [(1, "The quick fox"), (2, ""), (3, None), (4, "a")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["pos"], r["token"], r["is_stop"])
        for r in explode_tokens_udtf(df).collect()
    )
    # '' emits one empty-token row (string_split semantics, matching
    # the DuckDB oracle); only NULL text drops the doc
    assert rows == [
        (1, 0, "The", True), (1, 1, "quick", False), (1, 2, "fox", False),
        (2, 0, "", False),
        (4, 0, "a", True),
    ]


def test_jackknife_single_source_yields_null_not_error(spark, tmp_path):
    # review finding: with ONE distinct source, n == n_s and the
    # leave-one-out denominator is zero — must mirror DuckDB's
    # NULL-on-divide-by-zero instead of raising under ANSI mode
    import advanced_strapi_import_spark.plans.all  # noqa: F401
    from advanced_strapi_import_spark.plans.registry import QUERIES

    spark.createDataFrame(
        [(1, "aa bb", "en", "web", 5), (2, "cc dd", "en", "web", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = QUERIES["source_jackknife_influence"].fn(
        spark, str(tmp_path)
    ).collect()
    assert len(rows) == 1
    assert rows[0]["mean_excl"] is None and rows[0]["influence"] is None
    assert rows[0]["mean_all"] == 5.0


def test_ks_test_one_sided_sample_yields_null_not_error(spark, tmp_path):
    # review finding: a slice with only 'view' rows makes n1 = 0 —
    # try_divide must yield NULL ks_stat, not an ANSI DIVIDE_BY_ZERO
    import datetime

    import advanced_strapi_import_spark.plans.all  # noqa: F401
    from advanced_strapi_import_spark.plans.registry import QUERIES

    t = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(1, t, 10, "view", 1.5, "{}"), (2, t, 11, "view", 2.5, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    rows = QUERIES["events_ks_test"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["n1"] == 0 and rows[0]["n2"] == 2
    assert rows[0]["ks_stat"] is None


def test_distributed_ntile_matches_builtin(spark):
    # distributed_ntile must reproduce ntile(n) OVER (ORDER BY ...)
    # exactly — including the ceil/floor bucket-size split when the
    # row count is not divisible by n — while never funnelling the
    # frame through a single partition.
    from pyspark.sql import Window
    from advanced_strapi_import_spark.operators.skew import distributed_ntile

    for rows, n in [(23, 5), (100, 5), (3, 5), (40, 4)]:
        df = spark.range(rows).select(
            (F.col("id") * 37 % rows).alias("k"),
            F.col("id").alias("tie"),
        )
        got = {
            (r["k"], r["tie"]): r["b"]
            for r in distributed_ntile(
                df, n, ["k", "tie"], out_col="b", num_partitions=7
            ).collect()
        }
        want = {
            (r["k"], r["tie"]): r["b"]
            for r in df.select(
                "k",
                "tie",
                F.ntile(n).over(Window.orderBy("k", "tie")).alias("b"),
            ).collect()
        }
        assert got == want, f"rows={rows} n={n}"
    # empty frame: no rows, no crash
    empty = spark.range(0).select(F.col("id").alias("k"), F.col("id").alias("tie"))
    assert distributed_ntile(empty, 5, ["k", "tie"]).count() == 0


def test_distributed_cumsum_matches_window(spark):
    """distributed_cumsum must equal sum() OVER (ORDER BY k ROWS
    UNBOUNDED PRECEDING..CURRENT) on a total order, for partition
    counts below, at, and above the row count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from advanced_strapi_import_spark.caching import release_tracked
    from advanced_strapi_import_spark.operators.skew import distributed_cumsum

    df = spark.range(101).select(
        (F.col("id") * 37 % 101).alias("k"), (F.col("id") % 7).alias("v")
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    want = sorted(
        (r.k, r.c) for r in df.select(
            "k", F.sum("v").over(w).cast("long").alias("c")).collect()
    )
    for p in (4, 101, 200):
        got = sorted(
            (r.k, r.cum)
            for r in distributed_cumsum(
                df, ["k"], "v", num_partitions=p
            ).select("k", "cum").collect()
        )
        assert got == want, f"num_partitions={p}"
        release_tracked()
    empty = df.filter("k < 0")
    assert distributed_cumsum(empty, ["k"], "v").count() == 0
    release_tracked()


def test_welch_moments_survive_int64_overflow(spark):
    """welch_t_from_moments must stay exact PAST the int64 horizon
    (round-9 fix; ADVICE r8): with ~2e7 rows/arm the n*ss - s*s
    moment combination exceeds 9.2e18, where the former BIGINT tree
    wrapped silently under Spark's non-ANSI long arithmetic. Plant
    arm moments just past the horizon, verify (a) the DECIMAL(38,0)
    tree reproduces the exact-integer reference t, and (b) a 64-bit
    wrap of the same combination would have produced a DIFFERENT
    (garbage) variance — proving the test actually crosses the
    horizon rather than passing vacuously."""
    import math
    from decimal import Decimal

    from advanced_strapi_import_spark.plans.parity_analytics import (
        welch_t_from_moments,
    )

    n1, n2 = 20_000_000, 25_000_000
    s1 = n1 * 10_050 + 1_234_567
    s2 = n2 * 9_980 + 7_654_321
    # variance term n*ss - s*s ~ n * pad >> 2^63
    ss1 = s1 * s1 // n1 + 987_654_321_000
    ss2 = s2 * s2 // n2 + 876_543_210_000
    true1 = n1 * ss1 - s1 * s1
    true2 = n2 * ss2 - s2 * s2
    assert true1 > 2**63 and true2 > 2**63  # past the int64 ceiling

    def wrap64(x):
        return (x + 2**63) % 2**64 - 2**63

    # the old BIGINT tree: each product wraps, then the difference wraps
    wrapped1 = wrap64(wrap64(n1 * ss1) - wrap64(s1 * s1))
    assert wrapped1 != true1  # the bug this test pins down

    g = spark.createDataFrame(
        [("click", n1, Decimal(s1), Decimal(ss1)),
         ("view", n2, Decimal(s2), Decimal(ss2))],
        "event_type string, n long, s decimal(38,0), ss decimal(38,0)",
    )
    got = welch_t_from_moments(g).collect()[0]

    v1 = float(true1) / float(n1 * (n1 - 1))
    v2 = float(true2) / float(n2 * (n2 - 1))
    t = (float(s1) / n1 - float(s2) / n2) / math.sqrt(v1 / n1 + v2 / n2)
    assert (got.n1, got.n2) == (n1, n2)
    assert abs(got.t_stat - round(t, 6)) <= 2e-6, (got.t_stat, t)
