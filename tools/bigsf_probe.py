"""One-extra-SF scaling probe for the pair-generating dedup/ANN
queries (round-8 VERDICT item: verify dedup_minhash_pairs' pair-verify
stage, and the new corpus-adaptive embedding_near_dup gating, stay
near-linear one 3-4x step PAST sf0.1).

There is no sf1 test corpus, so the extra point is synthesized from
sf0.1 (driver generated, read-only) into $BIGSF_DIR (default
/tmp/sfbig) with structure-preserving expansion:

- documents x3: copies get per-copy DETERMINISTIC word shuffles
  (string_agg ordered by md5(word||pos||k)), so a copy is NOT a
  near-dup of its original — the minhash pair structure replicates per
  copy (linear growth) instead of fusing dup families (which would
  fabricate quadratic growth the real corpus doesn't have);
- embeddings x4: copies carry a +/-0.88-amplitude deterministic
  per-dimension perturbation — far outside the cos>=0.9 band.

Method mirrors tools/scaling_probe.py: per query, one warm run
(compile/JIT), release all caches, one timed run with real
shuffle-bytes-written from the SQL status store. Compare the printed
ratios against the sf0.01 -> sf0.1 step in SCALING.md (adjusted for
the 3x / 4x step: linear == ratio ~ step).

Usage: python tools/bigsf_probe.py   (prints rows; paste into
SCALING.md's round-8 note)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import advanced_strapi_import_spark.plans.all  # noqa: F401
from advanced_strapi_import_spark import caching
from advanced_strapi_import_spark.plans.registry import QUERIES
from advanced_strapi_import_spark.session import get_spark
from bench import _exec_count, _shuffle_bytes_since, force

BIG = os.environ.get("BIGSF_DIR", "/tmp/sfbig")
BASE = "/root/testdata/sf0.1"


def synthesize(out_dir: str = BIG, base: str = BASE,
               doc_copies: int = 3, emb_copies: int = 4) -> None:
    """Regenerate the expanded tables with DuckDB (no Spark session) —
    runs automatically when the directory is missing, so the probe is
    self-contained across environments/reboots."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"""
COPY (
WITH d AS (SELECT * FROM read_parquet('{base}/documents.parquet')),
w AS (
  SELECT d.doc_id, k.k,
         string_split(d.text, ' ')[pos.pos] AS word, pos.pos AS pos
  FROM d
  CROSS JOIN (SELECT unnest(range({doc_copies})) AS k) k
  CROSS JOIN LATERAL (
    SELECT unnest(range(1, len(string_split(d.text, ' ')) + 1)) AS pos
  ) pos
),
t AS (
  SELECT doc_id, k,
         string_agg(word, ' ' ORDER BY
           CASE WHEN k = 0 THEN lpad(pos::VARCHAR, 8, '0')
                ELSE md5(word || '-' || pos || '-' || k) END) AS text2
  FROM w GROUP BY doc_id, k
)
SELECT t.doc_id + 1000000 * t.k AS doc_id, t.text2 AS text,
       d.lang, d.source, length(t.text2) AS n_chars
FROM t JOIN d ON d.doc_id = t.doc_id
ORDER BY 1
) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
""")
    # copy k applies ONE fixed dimension permutation (odd stride ->
    # bijection on 64 dims): norms and all within-copy cosines are
    # EXACTLY preserved, so the base pair structure replicates per copy
    # (linear) — additive noise at the wrong scale fabricates quadratic
    # structure instead (measured twice while building this probe)
    con.sql(f"""
COPY (
WITH e AS (SELECT * FROM read_parquet('{base}/embeddings.parquet')),
x AS (
  SELECT e.vec_id, k.k, e.embedding, e.label
  FROM e CROSS JOIN (SELECT unnest(range({emb_copies})) AS k) k
)
SELECT vec_id + 1000000 * k AS vec_id,
       CASE WHEN k = 0 THEN embedding
            ELSE list_transform(range(0, len(embedding)),
                 i -> embedding[((i * (2 * k * k + 3)) % 64) + 1])
       END AS embedding,
       label
FROM x ORDER BY 1
) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)
""")

def synthesize_lineitem(out_dir: str = BIG, base: str = BASE) -> None:
    """lineitem x3 (round 9, for the Kendall adaptive-modulus probe):
    copies shift l_orderkey by 100M per copy — key distribution scales
    linearly, so the corpus-adaptive modulus greatest(199, n div 3000)
    must keep the SAMPLED ROW COUNT flat while the table triples."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    duckdb.sql(f"""
COPY (
SELECT * REPLACE (l_orderkey + 100000000 * k.k AS l_orderkey)
FROM read_parquet('{base}/lineitem.parquet')
CROSS JOIN (SELECT unnest(range(3)) AS k) k
ORDER BY l_orderkey, l_linenumber
) TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET)
""")


PROBES = [
    ("dedup_minhash_pairs", "documents x3"),
    ("dedup_minhash_bands", "documents x3"),
    ("embedding_near_dup", "embeddings x4 (adaptive planes)"),
    ("dedup_prefix_filter", "documents x3"),
    # round-9 additions (VERDICT r8 tasks 2 + 8)
    ("dedup_weighted_pagerank", "documents x3"),
    ("dedup_kcore", "documents x3"),
    ("lineitem_kendall_tau", "lineitem x3 (adaptive modulus)"),
]


WIDE9_PROBES = [
    # round 11 (VERDICT r10 task 1): extend the x9 evidence beyond the
    # graph family — the most expensive non-graph pipelines, each with
    # a documented 100-TB shape claim that was previously measured at
    # x3/x4 only
    ("dedup_family_recall", "documents x9"),
    ("dedup_prefix_filter", "documents x9"),
    ("minhash_band_sweep", "documents x9"),
    ("embedding_mmr_ivf", "embeddings x9"),
    ("embedding_pq_topk", "embeddings x9"),
    ("stream_ann_index_update", "embeddings x9"),
    ("embedding_ivfpq_topk", "embeddings x9"),  # r11 composed IVF+PQ
    # round 12 (VERDICT r11 task 3): the stored-index serve paths and
    # the streaming IVF+PQ maintenance gate — the shapes whose scaling
    # had been inferred from the inline twin, now measured
    ("embedding_ivfpq_index_serve", "embeddings x9"),
    ("stream_ann_serve_ivf", "embeddings x9"),
    ("stream_ivfpq_index_update", "embeddings x9"),
    # quantile-audit saturation claim: the r11 skew-safe audit rework's
    # exchange is bounded by the distinct (flag, cent) DOMAIN, which a
    # x9 row-count copy leaves unchanged — total shuffle should read
    # well below x9 (sketch part linear, audit part ~flat)
    ("lineitem_quantile_sketch", "lineitem x9"),
]


def synthesize_embeddings9(out_dir: str, base: str = BASE,
                           copies: int = 9) -> None:
    """embeddings x9 for the wide9 probe. Same fixed-permutation idea
    as synthesize() (norms and within-copy cosines exactly preserved,
    so pair structure replicates linearly), but with stride 2k+3: the
    x4 probe's 2k^2+3 stride collides mod 64 at k in {2,6} (both 11),
    which would make copies 2 and 6 EXACT duplicates and fabricate a
    dup family the real corpus doesn't have. 2k+3 for k<=8 gives nine
    distinct odd strides (3,5,...,19), all bijections on 64 dims and
    none the identity."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    duckdb.sql(f"""
COPY (
WITH e AS (SELECT * FROM read_parquet('{base}/embeddings.parquet')),
x AS (
  SELECT e.vec_id, k.k, e.embedding, e.label
  FROM e CROSS JOIN (SELECT unnest(range({copies})) AS k) k
)
SELECT vec_id + 1000000 * k AS vec_id,
       CASE WHEN k = 0 THEN embedding
            ELSE list_transform(range(0, len(embedding)),
                 i -> embedding[((i * (2 * k + 3)) % 64) + 1])
       END AS embedding,
       label
FROM x ORDER BY 1
) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)
""")


def synthesize_lineitem9(out_dir: str, base: str = BASE,
                         copies: int = 9) -> None:
    """lineitem x9 for the quantile-audit saturation probe: copies
    offset l_orderkey only — every value column (prices, quantities,
    flags) repeats verbatim, so the distinct (flag, cent) domain the
    audit exchange is bounded by stays EXACTLY the sf0.1 domain."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    duckdb.sql(f"""
COPY (
WITH l AS (SELECT * FROM read_parquet('{base}/lineitem.parquet'))
SELECT l.* REPLACE (l_orderkey + 100000000 * k.k AS l_orderkey)
FROM l CROSS JOIN (SELECT unnest(range({copies})) AS k) k
ORDER BY l_orderkey
) TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET)
""")


def main_wide9() -> None:
    """`python tools/bigsf_probe.py --wide9`: x9 probe for the top
    expensive NON-graph families (VERDICT r10 task 1). Reuses the
    graph9 documents x9 corpus; adds embeddings x9 (distinct-stride
    permutations) and lineitem x9 the first time."""
    import duckdb

    big9 = os.environ.get("BIGSF9_DIR", "/tmp/sfbig9")
    if not os.path.exists(f"{big9}/documents.parquet"):
        print(f"# synthesizing {big9} (documents x9) from {BASE}",
              file=sys.stderr)
        os.makedirs(big9, exist_ok=True)
        synthesize(big9, BASE, doc_copies=9, emb_copies=1)
    # the graph9 synth wrote embeddings x1 into the same dir; upgrade
    # to x9 if the row count is not already 9x the base
    n_base = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{BASE}/embeddings.parquet')"
    ).fetchone()[0]
    n_big = 0
    if os.path.exists(f"{big9}/embeddings.parquet"):
        n_big = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{big9}/embeddings.parquet')"
        ).fetchone()[0]
    if n_big != 9 * n_base:
        print(f"# synthesizing {big9}/embeddings.parquet (x9, "
              f"was {n_big} rows)", file=sys.stderr)
        synthesize_embeddings9(big9, BASE, copies=9)
    n_lbase = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{BASE}/lineitem.parquet')"
    ).fetchone()[0]
    n_lbig = 0
    if os.path.exists(f"{big9}/lineitem.parquet"):
        n_lbig = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{big9}/lineitem.parquet')"
        ).fetchone()[0]
    if n_lbig != 9 * n_lbase:
        print(f"# synthesizing {big9}/lineitem.parquet (x9, "
              f"was {n_lbig} rows)", file=sys.stderr)
        synthesize_lineitem9(big9, BASE, copies=9)
    spark = get_spark("bigsf9-wide-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # optional name filters: `--wide9 substr...` probes only matches
    pats = [a for a in sys.argv[1:] if not a.startswith("--")]
    probes = [
        (n, s) for n, s in WIDE9_PROBES
        if not pats or any(p in n for p in pats)
    ]
    print("| query | step | t(s) sf0.1 -> x9 | t ratio | shuffle B "
          "sf0.1 -> x9 | sh ratio |")
    print("|---|---|---|---|---|---|")
    for name, step in probes:
        spec = QUERIES[name]
        vals = []
        for sf in (BASE, big9):
            force(spec.fn(spark, sf))  # warm
            caching.release_all()
            mark = _exec_count(spark)
            t0 = time.perf_counter()
            force(spec.fn(spark, sf))
            dt = time.perf_counter() - t0
            sb = _shuffle_bytes_since(spark, mark)
            caching.release_all()
            vals.append((dt, sb))
        (t1, s1), (t2, s2) = vals
        tr = f"{t2 / t1:.1f}" if t1 > 0 else "-"
        sr = f"{s2 / s1:.1f}" if s1 and s1 > 0 and s2 >= 0 else "-"
        print(f"| {name} | {step} | {t1:.2f} -> {t2:.2f} | {tr} "
              f"| {s1} -> {s2} | {sr} |", flush=True)
    spark.stop()


def main_serve9() -> None:
    """`python tools/bigsf_probe.py --serve9` (round 12, VERDICT r11
    task 3): does stored-index SERVE cost scale with the CORPUS or
    with the QUERY BATCH? Builds the IVF+PQ index over sf0.1 and over
    the x9 embeddings corpus, then measures serve-only shuffle for
    (a) the SAME base query batch on both indexes — the corpus-growth
    axis, expected ~FLAT: auto_cells keeps expected cell size
    constant, so per-query candidate volume is corpus-size-invariant
    — and (b) the x9 query batch on the x9 index — the query-count
    axis, expected ~linear. The index BUILD is outside the timed
    window (build once, serve many is the lifecycle's whole point)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from advanced_strapi_import_spark.operators import similarity as S

    big9 = os.environ.get("BIGSF9_DIR", "/tmp/sfbig9")
    if not os.path.exists(f"{big9}/embeddings.parquet"):
        synthesize_embeddings9(big9, BASE, copies=9)
    spark = get_spark("bigsf9-serve-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    idx_dirs = {}
    try:
        for tag, sf in (("sf0.1", BASE), ("x9", big9)):
            corpus = spark.read.parquet(f"{sf}/embeddings.parquet")
            d = tempfile.mkdtemp(prefix=f"serve9_{tag}_")
            idx_dirs[tag] = d
            S.build_ivfpq_index(corpus, d, m=32, codebook=64)
        base_q = spark.read.parquet(f"{BASE}/embeddings.parquet").filter(
            F.col("vec_id") % 97 == 0
        )
        big_q = spark.read.parquet(f"{big9}/embeddings.parquet").filter(
            F.col("vec_id") % 97 == 0
        )
        cases = [
            ("base queries on sf0.1 index", idx_dirs["sf0.1"], base_q, BASE),
            ("base queries on x9 index", idx_dirs["x9"], base_q, big9),
            ("x9 queries on x9 index", idx_dirs["x9"], big_q, big9),
        ]
        for label, idx, qdf, sf in cases:
            corpus = spark.read.parquet(f"{sf}/embeddings.parquet")

            def serve():
                return S.ivfpq_query_index(
                    spark, idx, qdf, k=5, nprobe=8,
                    rerank=20, rerank_corpus=corpus,
                )

            force(serve())  # warm
            caching.release_all()
            mark = _exec_count(spark)
            t0 = time.perf_counter()
            force(serve())
            dt = time.perf_counter() - t0
            sb = _shuffle_bytes_since(spark, mark)
            caching.release_all()
            nq = qdf.count()
            rows.append((label, nq, dt, sb))
        print("| serve case | n queries | t(s) | shuffle B |")
        print("|---|---|---|---|")
        for label, nq, dt, sb in rows:
            print(f"| {label} | {nq} | {dt:.2f} | {sb} |", flush=True)
    finally:
        for d in idx_dirs.values():
            shutil.rmtree(d, ignore_errors=True)
        spark.stop()


GRAPH9_PROBES = [
    # round 10 (VERDICT r9 task 6): one more order of magnitude for the
    # iterative graph family — x3 -> x9 confirms per-round linearity
    # holds two steps below the 100x target, not just one
    ("dedup_weighted_pagerank", "documents x9"),
    ("dedup_kcore", "documents x9"),
    ("dedup_label_propagation", "documents x9"),
]


def main_graph9() -> None:
    """`python tools/bigsf_probe.py --graph9`: documents x9 probe for
    the graph family (same method as main, bigger step)."""
    big9 = os.environ.get("BIGSF9_DIR", "/tmp/sfbig9")
    if not os.path.exists(f"{big9}/documents.parquet"):
        print(f"# synthesizing {big9} (documents x9) from {BASE}",
              file=sys.stderr)
        os.makedirs(big9, exist_ok=True)
        synthesize(big9, BASE, doc_copies=9, emb_copies=1)
    spark = get_spark("bigsf9-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print("| query | step | t(s) sf0.1 -> x9 | t ratio | shuffle B "
          "sf0.1 -> x9 | sh ratio |")
    print("|---|---|---|---|---|---|")
    for name, step in GRAPH9_PROBES:
        spec = QUERIES[name]
        vals = []
        for sf in (BASE, big9):
            force(spec.fn(spark, sf))  # warm
            caching.release_all()
            mark = _exec_count(spark)
            t0 = time.perf_counter()
            force(spec.fn(spark, sf))
            dt = time.perf_counter() - t0
            sb = _shuffle_bytes_since(spark, mark)
            caching.release_all()
            vals.append((dt, sb))
        (t1, s1), (t2, s2) = vals
        tr = f"{t2 / t1:.1f}" if t1 > 0 else "-"
        sr = f"{s2 / s1:.1f}" if s1 and s1 > 0 and s2 >= 0 else "-"
        print(f"| {name} | {step} | {t1:.2f} -> {t2:.2f} | {tr} "
              f"| {s1} -> {s2} | {sr} |", flush=True)
    spark.stop()


def main() -> None:
    if "--graph9" in sys.argv:
        return main_graph9()
    if "--wide9" in sys.argv:
        return main_wide9()
    if "--serve9" in sys.argv:
        return main_serve9()
    if not (os.path.exists(f"{BIG}/documents.parquet")
            and os.path.exists(f"{BIG}/embeddings.parquet")):
        print(f"# synthesizing {BIG} from {BASE}", file=sys.stderr)
        synthesize()
    if not os.path.exists(f"{BIG}/lineitem.parquet"):
        print(f"# synthesizing {BIG}/lineitem.parquet", file=sys.stderr)
        synthesize_lineitem()
    # flat-sample evidence for the Kendall adaptive modulus (DuckDB,
    # no Spark): the sampled slice must stay ~3k rows as the table x3
    import duckdb

    for tag, path in (("sf0.1", BASE), ("x3", BIG)):
        n, m, s = duckdb.sql(f"""
            WITH c AS (SELECT count(*) AS n
                       FROM read_parquet('{path}/lineitem.parquet'))
            SELECT c.n, greatest(199, c.n // 3000) AS m,
                   (SELECT count(*)
                    FROM read_parquet('{path}/lineitem.parquet')
                    WHERE l_orderkey % greatest(199, c.n // 3000) = 0)
            FROM c
        """).fetchone()
        print(f"# kendall sample {tag}: rows={n} modulus={m} "
              f"sampled={s} (pairs ~ {s * (s - 1) // 2:,})",
              file=sys.stderr, flush=True)
    spark = get_spark("bigsf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print("| query | step | t(s) sf0.1 -> big | t ratio | shuffle B "
          "sf0.1 -> big | sh ratio |")
    print("|---|---|---|---|---|---|")
    for name, step in PROBES:
        spec = QUERIES[name]
        vals = []
        for sf in (BASE, BIG):
            force(spec.fn(spark, sf))  # warm
            caching.release_all()
            mark = _exec_count(spark)
            t0 = time.perf_counter()
            force(spec.fn(spark, sf))
            dt = time.perf_counter() - t0
            sb = _shuffle_bytes_since(spark, mark)
            caching.release_all()
            vals.append((dt, sb))
        (t1, s1), (t2, s2) = vals
        tr = f"{t2 / t1:.1f}" if t1 > 0 else "-"
        sr = f"{s2 / s1:.1f}" if s1 and s1 > 0 and s2 >= 0 else "-"
        print(f"| {name} | {step} | {t1:.2f} -> {t2:.2f} | {tr} "
              f"| {s1} -> {s2} | {sr} |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
