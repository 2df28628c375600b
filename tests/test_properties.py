"""Property-based tests (hypothesis): the cast expressions match a
Python reference implementation of the JS semantics they mirror
(/root/reference/server/services/csv-import.js:127-197) on arbitrary
inputs, not just the fixtures. Each property evaluates ONE Spark job
per generated batch (lists of strings), keeping runtime sane."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from advanced_strapi_import_spark.functions import casts as C

# printable-ish text with plenty of digit/sign/space collisions
TXT = st.text(
    alphabet=st.sampled_from(list("0123456789+-. eEyYnNtTfFaloObBxX/,_")),
    max_size=12,
)
BATCH = st.lists(TXT, min_size=1, max_size=200)

SETTINGS = dict(max_examples=5, deadline=None)


def _eval(spark, values, col_expr):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["out"] for r in df.select(col_expr.alias("out")).collect()]


def _js_parse_int(s: str):
    m = re.match(r"^\s*([+-]?\d+)", s)
    if not m:
        return None
    return int(m.group(1))


@given(BATCH)
@settings(**SETTINGS)
def test_parse_int_matches_js_semantics(spark, batch):
    batch = [s for s in batch if (v := _js_parse_int(s)) is None or abs(v) < 2**62]
    if not batch:
        return
    got = _eval(spark, batch, C.parse_int(F.col("v")))
    want = [_js_parse_int(s) for s in batch]
    assert got == want


@given(BATCH)
@settings(**SETTINGS)
def test_parse_bool_six_literals_only(spark, batch):
    got = _eval(spark, batch, C.parse_bool(F.col("v")))
    for s, g in zip(batch, got):
        low = s.lower()
        if low in ("true", "1", "yes"):
            assert g is True
        elif low in ("false", "0", "no"):
            assert g is False
        else:
            assert g is None


@given(BATCH)
@settings(**SETTINGS)
def test_is_numeric_accepts_only_python_parseable(spark, batch):
    got = _eval(spark, batch, C.is_numeric(F.col("v")))
    for s, g in zip(batch, got):
        if g:
            # acceptance implies a real numeric literal with a leading digit
            float(s.strip())
            assert re.match(r"^\s*[+-]?\d", s)


@given(BATCH)
@settings(**SETTINGS)
def test_split_trim_matches_js(spark, batch):
    # guard against Spark's split-on-regex: comma is literal here
    got = _eval(spark, batch, C.split_trim(F.col("v")))
    want = [[t.strip() for t in s.split(",")] for s in batch]
    assert got == want


# ---------------------------------------------------------------------------
# text-operator robustness: arbitrary input must never throw (the
# empty-text ANSI divide-by-zero class) and stays in documented bounds
# ---------------------------------------------------------------------------
ANYTXT = st.text(max_size=40)  # full unicode, incl. '', whitespace-only
TXT_BATCH = st.lists(ANYTXT, min_size=1, max_size=50)


@given(TXT_BATCH)
@settings(**SETTINGS)
def test_quality_score_total_and_bounded(spark, batch):
    from advanced_strapi_import_spark.operators import text as TX

    df = spark.createDataFrame([(v,) for v in batch], "text string")
    vals = [
        r["quality"]
        for r in TX.with_quality(df).select("quality").collect()
    ]
    assert all(v is not None and 0.0 <= v <= 1.0 for v in vals)


@given(TXT_BATCH)
@settings(**SETTINGS)
def test_repetition_ratios_bounded(spark, batch):
    from advanced_strapi_import_spark.operators import text as TX

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(batch)], "doc_id long, text string"
    )
    rows = TX.repetition_features_df(df, "text", keep=["doc_id"]).collect()
    assert len(rows) == len(batch)
    for r in rows:
        assert r["n_tokens"] >= 1
        assert 0.0 <= r["dup_bigram_ratio"] < 1.0
        assert 0.0 <= r["dup_trigram_ratio"] < 1.0


# ---------------------------------------------------------------------------
# chunking invariants vs a Python reference
# ---------------------------------------------------------------------------
WORD = st.text(alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
               min_size=1, max_size=6)
DOC = st.lists(WORD, min_size=0, max_size=200).map(" ".join)


@given(st.lists(DOC, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_chunk_documents_matches_reference(spark, docs):
    import math

    from advanced_strapi_import_spark.operators import text as TX

    chunk_tokens, overlap = 64, 16
    stride = chunk_tokens - overlap
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r["id"], r["chunk_index"]): (r["n_chunks"], r["chunk_text"], r["n_tokens"])
        for r in TX.chunk_documents(
            df, "text", "doc_id", chunk_tokens=chunk_tokens, overlap=overlap
        ).collect()
    }
    want = {}
    for i, d in enumerate(docs):
        toks = d.strip().split() if d.strip() else [""]
        # split(r"\s+") on '' yields [''] — mirror that
        if d.strip() == "" and d != "":
            toks = [""]
        n = len(toks)
        n_chunks = max(1, math.ceil((n - overlap) / stride))
        for ci in range(n_chunks):
            sl = toks[ci * stride: ci * stride + chunk_tokens]
            want[(i, ci)] = (n_chunks, " ".join(sl), len(sl))
    assert got == want


# ---------------------------------------------------------------------------
# RFC-4180 round-trip: export sink -> scan source preserves cells
# ---------------------------------------------------------------------------
CELL = st.text(
    alphabet=st.sampled_from(list('abc,";| \t0')), min_size=0, max_size=8
)


@given(st.lists(st.tuples(CELL, CELL), min_size=1, max_size=30))
@settings(**SETTINGS)
def test_csv_round_trip(spark, tmp_path_factory, rows):
    from advanced_strapi_import_spark.operators.export import write_csv
    from advanced_strapi_import_spark.sources.csv_source import csv_scan

    out = str(tmp_path_factory.mktemp("rt") / "t.csv")
    df = spark.createDataFrame(rows, "a string, b string")
    write_csv(df, out)
    back = csv_scan(spark, out)
    assert back.columns == ["a", "b"]
    # Spark's writer emits empty string and the reader maps it to null —
    # normalize both sides to None for the comparison
    norm = lambda v: None if v in ("", None) else v  # noqa: E731
    key = lambda t: tuple((v is None, v or "") for v in t)  # noqa: E731
    got = sorted(((norm(r["a"]), norm(r["b"])) for r in back.collect()), key=key)
    want = sorted(((norm(a), norm(b)) for a, b in rows), key=key)
    assert got == want


# ---------------------------------------------------------------------------
# lenient date-parse ladder vs a Python reference over arbitrary dates
# ---------------------------------------------------------------------------
import datetime as _dt

DATES = st.datetimes(
    min_value=_dt.datetime(1971, 1, 1),
    max_value=_dt.datetime(2099, 12, 28),
).map(lambda d: d.replace(microsecond=0))
FMT = st.sampled_from(["iso_dt", "iso_dt_ms_z", "us", "iso_date", "sql_dt"])


def _render(d: _dt.datetime, fmt: str) -> tuple[str, _dt.datetime]:
    """(raw string, expected parsed UTC timestamp) per ladder format."""
    if fmt == "iso_dt":
        return d.strftime("%Y-%m-%dT%H:%M:%S"), d
    if fmt == "iso_dt_ms_z":
        return d.strftime("%Y-%m-%dT%H:%M:%S.000Z"), d
    if fmt == "us":
        day0 = d.replace(hour=0, minute=0, second=0)
        return f"{d.month}/{d.day}/{d.year}", day0
    if fmt == "iso_date":
        day0 = d.replace(hour=0, minute=0, second=0)
        return d.strftime("%Y-%m-%d"), day0
    return d.strftime("%Y-%m-%d %H:%M:%S"), d


@given(st.lists(st.tuples(DATES, FMT), min_size=1, max_size=50))
@settings(**SETTINGS)
def test_date_ladder_matches_reference(spark, cases):
    rendered = [_render(d, f) for d, f in cases]
    got = _eval(
        spark,
        [raw for raw, _ in rendered],
        C.to_iso_string(C.parse_date_lenient(F.col("v"))),
    )
    want = [exp.strftime("%Y-%m-%dT%H:%M:%S.000Z") for _, exp in rendered]
    assert got == want


# ---------------------------------------------------------------------------
# statistical-audit primitives vs pure-Python references
# ---------------------------------------------------------------------------

_KS_VALS = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False,
              allow_infinity=False, width=32),
    min_size=1, max_size=60,
)


@given(xs=_KS_VALS, ys=_KS_VALS)
@settings(**SETTINGS)
def test_ks_two_sample_matches_python_ecdf(spark, xs, ys):
    """ks_stat equals the textbook max|F1-F2| computed by a pure-Python
    ECDF walk — verification independent of the DuckDB oracle."""
    from bisect import bisect_right

    from advanced_strapi_import_spark.operators.stats import ks_two_sample

    rows = [("a", float(v)) for v in xs] + [("b", float(v)) for v in ys]
    df = spark.createDataFrame(rows, "grp string, value double")
    got = ks_two_sample(df, "value", "grp", "a", "b").collect()[0]

    sx, sy = sorted(xs), sorted(ys)
    ref = max(
        abs(bisect_right(sx, p) / len(sx) - bisect_right(sy, p) / len(sy))
        for p in set(xs) | set(ys)
    )
    assert got["n1"] == len(xs) and got["n2"] == len(ys)
    assert abs(got["ks_stat"] - ref) <= 5e-6  # round(.,6) on the query side


_POS = st.lists(
    st.floats(min_value=1.0, max_value=1e12, allow_nan=False,
              allow_infinity=False),
    min_size=1, max_size=100,
)


@given(vals=_POS)
@settings(**SETTINGS)
def test_first_digit_matches_python_string_walk(spark, vals):
    from advanced_strapi_import_spark.operators.stats import first_digit

    import math

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = [
        r["d"] for r in df.select(first_digit(F.col("v")).alias("d")).collect()
    ]
    ref = [str(int(math.floor(v)))[0] for v in vals]
    assert got == ref


_EDGES = st.lists(
    st.tuples(st.integers(min_value=1, max_value=12),
              st.integers(min_value=1, max_value=12)).filter(
        lambda p: p[0] != p[1]
    ),
    min_size=1, max_size=25,
)


@given(raw=_EDGES)
@settings(**SETTINGS)
def test_label_propagation_matches_python_reference(spark, raw):
    """Distributed synchronous LPA equals a dict-based reference on
    arbitrary small graphs — exercises the majority rule, the
    min-label tie-break, and the duplicate-edge dedup."""
    from collections import Counter

    from advanced_strapi_import_spark.operators.dedup import (
        label_propagation,
    )

    # undirected unique edge set (the operator dedupes; the reference
    # must see the same graph)
    edges = {(min(a, b), max(a, b)) for a, b in raw}
    nbrs: dict = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    labels = {n: n for n in nbrs}
    for _ in range(2):
        nxt = {}
        for n in nbrs:
            votes = Counter(labels[m] for m in nbrs[n])
            top = max(votes.values())
            nxt[n] = min(l for l, c in votes.items() if c == top)
        labels = nxt

    pairs = spark.createDataFrame(list(raw), "id_a long, id_b long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(pairs, iterations=2).collect()
    }
    assert got == labels


_KEYS = st.lists(
    st.integers(min_value=1, max_value=10_000), min_size=1, max_size=300,
    unique=True,
)


@given(keys=_KEYS)
@settings(**SETTINGS)
def test_systematic_sampling_exact_stratum_sizes(spark, keys):
    """The stratified systematic sampler's selling point is EXACT
    per-stratum sample sizes: ceil(n_s / k) rows from every stratum,
    no binomial jitter — verified on arbitrary key sets."""
    import math
    import tempfile

    import advanced_strapi_import_spark.plans.all  # noqa: F401
    from advanced_strapi_import_spark.plans.parity_relational import _SYS_K
    from advanced_strapi_import_spark.plans.registry import QUERIES

    rows = [(k, ["O", "F", "P"][k % 3], float(k)) for k in keys]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, o_totalprice double"
    )
    # per-run unique dir: tmp_path is function-scoped (hypothesis's
    # health check blocks it under @given); a fixed path would collide
    # across concurrent pytest runs
    d = tempfile.mkdtemp(prefix="sysprop_")
    df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    out = QUERIES["sample_systematic"].fn(spark, d)
    got = {
        r["o_orderstatus"]: r["n"]
        for r in out.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    from collections import Counter

    strata = Counter(s for _, s, _ in rows)
    want = {s: math.ceil(n / _SYS_K) for s, n in strata.items()}
    assert got == want


# ---------------------------------------------------------------------------
# round-5 operators: distributed_ntile vs built-in ntile; MMR greedy
# reference implementation
# ---------------------------------------------------------------------------

NTILE_CASE = st.tuples(
    st.integers(min_value=1, max_value=60),   # rows
    st.integers(min_value=1, max_value=9),    # buckets
    st.integers(min_value=1, max_value=8),    # partitions
)


@given(st.lists(NTILE_CASE, min_size=1, max_size=3))
@settings(**SETTINGS)
def test_distributed_ntile_matches_builtin_property(spark, cases):
    from pyspark.sql import Window
    from advanced_strapi_import_spark.operators.skew import distributed_ntile

    for rows, buckets, parts in cases:
        df = spark.range(rows).select(
            (F.col("id") * 131 % max(rows, 1)).alias("k"),
            F.col("id").alias("tie"),
        )
        got = {
            (r["k"], r["tie"]): r["b"]
            for r in distributed_ntile(
                df, buckets, ["k", "tie"], out_col="b",
                num_partitions=parts,
            ).collect()
        }
        want = {
            (r["k"], r["tie"]): r["b"]
            for r in df.select(
                "k", "tie",
                F.ntile(buckets).over(Window.orderBy("k", "tie")).alias("b"),
            ).collect()
        }
        assert got == want, (rows, buckets, parts)


def _mmr_reference(cand_rows, picks=3, rw=0.7, dw=0.3):
    """Pure-Python greedy MMR over (neighbor_id, cos, rank, vec) rows —
    the spec the Arrow kernel must match."""
    import math

    rows = sorted(cand_rows, key=lambda r: r[2])
    ids = [r[0] for r in rows]
    cos = [r[1] for r in rows]
    vecs = [r[3] for r in rows]

    def sim(i, j):
        dot = sum(a * b for a, b in zip(vecs[i], vecs[j]))
        ni = math.sqrt(sum(a * a for a in vecs[i]))
        nj = math.sqrt(sum(a * a for a in vecs[j]))
        raw = dot / (ni * nj)
        return math.copysign(math.floor(abs(raw) * 1e6 + 0.5) / 1e6, raw)

    sel = [0]
    out = [(ids[0], 1, cos[0])]
    for step in range(2, picks + 1):
        live = [i for i in range(len(ids)) if i not in sel]
        if not live:
            break
        scored = []
        for i in live:
            pen = max(sim(i, j) for j in sel)
            s = math.floor((rw * cos[i] - dw * pen) * 1e6 + 0.5) / 1e6
            scored.append((-s, ids[i], i))
        scored.sort()
        _, vid, idx = scored[0]
        sel.append(idx)
        out.append((vid, step, -scored[0][0]))
    return out


# magnitude + sign instead of filter(abs > 1e-3): the filtered form
# rejects most draws once Hypothesis shrinks toward zero and trips the
# filter_too_much health check on some seeds (round-7 flake)
VEC = st.lists(
    st.tuples(
        st.floats(min_value=2.0 ** -10, max_value=2.0, allow_nan=False,
                  allow_infinity=False, width=32),
        st.booleans(),
    ).map(lambda t: t[0] if t[1] else -t[0]),
    min_size=4, max_size=4,
)
POOL = st.lists(VEC, min_size=1, max_size=8, unique_by=tuple)


@given(POOL)
@settings(**SETTINGS)
def test_mmr_rerank_matches_reference_property(spark, vecs):
    from advanced_strapi_import_spark.operators import similarity as S

    # build a pool with cos = rounded similarity to an arbitrary probe,
    # ranked like cosine_topk would rank it
    import math

    probe = [1.0, 0.5, -0.25, 0.125]

    def rcos(v):
        dot = sum(a * b for a, b in zip(probe, v))
        n1 = math.sqrt(sum(a * a for a in probe))
        n2 = math.sqrt(sum(a * a for a in v))
        raw = dot / (n1 * n2)
        return math.copysign(math.floor(abs(raw) * 1e6 + 0.5) / 1e6, raw)

    pool = sorted(
        [(i + 10, rcos(v), v) for i, v in enumerate(vecs)],
        key=lambda t: (-t[1], t[0]),
    )
    rows = [
        (7, nid, c, rank + 1, v) for rank, (nid, c, v) in enumerate(pool)
    ]
    cand = spark.createDataFrame(
        rows,
        "query_id bigint, neighbor_id bigint, cos double, rank int, "
        "__nv array<double>",
    )
    got = sorted(
        (r["vec_id"], r["mmr_rank"], r["mmr_score"])
        for r in S.mmr_rerank(cand).collect()
    )
    want = sorted(
        _mmr_reference([(nid, c, rank, v) for _, nid, c, rank, v in rows])
    )
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-12


# ---------------------------------------------------------------------------
# round 6: distributed_cumsum vs the built-in window on arbitrary shapes
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(-50, 50)),
        min_size=1,
        max_size=120,
    ),
    st.sampled_from([1, 3, 32, 150]),
)
@settings(max_examples=5, deadline=None)
def test_distributed_cumsum_matches_window_property(spark, rows, parts):
    """Exact global running sums under a total order, for any mix of
    duplicate-free keys and any partition count (below / at / above
    the row count)."""
    from pyspark.sql import Window

    from advanced_strapi_import_spark.caching import release_tracked
    from advanced_strapi_import_spark.operators.skew import distributed_cumsum

    # keys must form a TOTAL order (documented contract): dedupe them
    seen: dict[int, int] = {}
    for k, v in rows:
        seen.setdefault(k, v)
    data = sorted(seen.items())
    df = spark.createDataFrame(data, "k long, v long")
    w = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = [
        (r.k, r.c)
        for r in df.select(
            "k", F.sum("v").over(w).cast("long").alias("c")
        ).collect()
    ]
    got = sorted(
        (r.k, r.cum)
        for r in distributed_cumsum(df, ["k"], "v", num_partitions=parts)
        .select("k", "cum")
        .collect()
    )
    release_tracked()
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# round 6: padded-string BPE merge application vs a pure-Python greedy
# reference (the parity core of bpe_iterative_merges)
# ---------------------------------------------------------------------------
def _greedy_merge(symbols: list[str], a: str, b: str) -> list[str]:
    """Reference greedy left-to-right BPE merge application."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "ab", "ba", "c"]),
                 min_size=1, max_size=8),
        min_size=1,
        max_size=20,
    ),
    st.sampled_from([("a", "a"), ("a", "b"), ("b", "a"), ("ab", "a"),
                     ("a", "ab"), ("c", "c")]),
)
@settings(max_examples=5, deadline=None)
def test_bpe_padded_replace_matches_greedy_merge(spark, words, pair):
    """replace() on the SEP SEP-padded symbol string must equal the
    pure-Python greedy left-to-right merge for adversarial symbol
    sequences (overlaps, merged-token lookalikes like 'ab' next to
    'a','b')."""
    from advanced_strapi_import_spark.plans.parity_ml import (
        _BPE_SEP as sep,
        _BPE_SS as ss,
    )

    a, b = pair
    padded = [ss + ss.join(wsyms) + ss for wsyms in words]
    df = spark.createDataFrame([(s,) for s in padded], "s string")
    rep = F.replace(
        F.col("s"),
        F.lit(sep + a + ss + b + sep),
        F.lit(sep + a + b + sep),
    )
    got = [r["out"] for r in df.select(rep.alias("out")).collect()]
    want = [
        ss + ss.join(_greedy_merge(wsyms, a, b)) + ss for wsyms in words
    ]
    assert got == want


def test_distributed_cumsum_multi_column(spark):
    """Multi-column form: both running sums share one repartition and
    agree with independent single-column calls and the built-in
    window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from advanced_strapi_import_spark.operators import skew as SK

    df = spark.range(0, 500).select(
        F.col("id"),
        (F.col("id") * 37 % 101).cast("long").alias("a"),
        F.lit(1).cast("long").alias("one"),
    )
    multi = {
        r["id"]: (r["ca"], r["idx"])
        for r in SK.distributed_cumsum(
            df, ["id"], ["a", "one"], out_col=["ca", "idx"]
        ).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    ref = {
        r["id"]: (r["ca"], r["idx"])
        for r in df.select(
            "id",
            F.sum("a").over(w).alias("ca"),
            F.sum("one").over(w).alias("idx"),
        ).collect()
    }
    assert multi == ref
    import pytest

    with pytest.raises(ValueError):
        SK.distributed_cumsum(df, ["id"], ["a", "one"], out_col=["ca"])
    with pytest.raises(TypeError):
        SK.distributed_cumsum(
            df.withColumn("d", F.col("a") * 1.5), ["id"], ["a", "d"],
            out_col=["x", "y"],
        )
