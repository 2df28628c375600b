"""Empirical scaling probe: run a representative operator subset at
sf0.001 / sf0.01 / sf0.1 (10x data per step), record warm wall time and
real shuffle-bytes-written, and write SCALING.md.

Why: "would this hold at 1000x the data" is the design question every
operator answers in SCALE.md; this tool adds the measured counterpart —
time and shuffle volume as functions of input size. Shuffle bytes are
the honest scale signal at toy sizes (wall time is scheduler-dominated
below ~1s): a shuffle that grows ~10x per 10x data step is linear; one
that grows ~100x is quadratic and would not survive 100 TB.

Method: per SF, each query runs twice and the SECOND run is recorded —
codegen/JIT compile amortizes to zero at scale, so warm runs measure
the data path. Shuffle bytes come from the SQL status store (same
collector as bench.py).

Usage: python tools/scaling_probe.py   (writes SCALING.md, prints rows)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import advanced_strapi_import_spark.plans.all  # noqa: F401
from advanced_strapi_import_spark import caching
from advanced_strapi_import_spark.plans.registry import QUERIES
from advanced_strapi_import_spark.session import get_spark
from bench import _exec_count, _shuffle_bytes_since, force

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# one per plan family; comments name the shape being probed
PROBES = [
    ("q1_pricing_summary", "scan + hash agg"),
    ("q3_shipping_priority", "3-way broadcast join + agg"),
    ("q18_large_orders", "fact-fact join + agg"),
    ("events_rolling", "time-range window"),
    ("events_sessionize", "lag + cumsum sessionization"),
    ("topk_orders_per_cust", "partitioned rank top-k"),
    ("dedup_minhash_bands", "shingle explode + md5 + 16-min agg"),
    ("dedup_minhash_pairs", "LSH bucket pair expansion + verify"),
    ("embedding_lsh_bucket", "Arrow matmul bucketing"),
    ("embedding_near_dup", "multi-table LSH + pair scoring"),
    ("text_quality", "regexp feature extraction"),
    ("doc_chunks", "token-window explode"),
    ("doc_repeated_ngrams", "8-gram hash + dup join"),
    ("skew_salted_join", "salted skew join"),
    ("dedup_label_propagation", "iterative LPA rounds over LSH graph"),
    ("customer_hierarchy_depth", "recursive CTE shrinking frontier"),
    ("stream_events_hourly", "streaming drain (fixed cost)"),
    ("dedup_kcore", "iterative k-core peel over LSH graph"),
    ("doc_tfidf_cosine_pairs", "inverted-index sparse cosine join"),
    ("dedup_link_prediction", "wedge join over SNM chain graph"),
    ("embedding_srp_buckets", "16-plane SRP signature + bucket agg"),
    ("lineitem_price_deciles", "distributed ntile: range rank, no single-partition sort"),
    ("embedding_mmr_topk", "brute candidates + single Arrow MMR kernel stage"),
    ("doc_dsir_importance", "token hash buckets + broadcast weight model"),
    ("events_model_auc", "distributed cumsum: exact tie-aware AUC"),
    ("dedup_weighted_pagerank", "Jaccard-weighted PR rounds over LSH graph"),
    ("bpe_iterative_merges", "3-round BPE merge loop over word table"),
    ("doc_bigram_backoff_logprob", "bigram LM broadcast scoring"),
    ("multimodal_png_pixels", "PNG encode+zlib decode+stats Arrow pipeline"),
    ("doc_ngram_novelty", "digest-keyed 8-gram first-appearance join"),
    ("events_sprt_ab", "multi-column distributed cumsum per arm"),
    ("embedding_gram_matrix", "d^2 Gram partials, one matmul per batch"),
    ("doc_keyword_rake", "segment window + phrase-vocab joins"),
    ("lineitem_corr_matrix", "one-pass DECIMAL co-moment matrix"),
    ("events_conformal_interval", "domain-collapse order statistic"),
    ("embedding_kmeans_lloyd", "3 Lloyd rounds, broadcast centers"),
    ("dedup_cdc_chunks", "row-local CDC chunking + chunk-hash dedup"),
    ("minhash_band_sweep", "one signature table re-banded 3 ways"),
    ("embedding_pca_top2", "orthogonal iteration, fixed job count"),
]


def main() -> None:
    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows: dict[str, list[tuple[float, int]]] = {name: [] for name, _ in PROBES}
    for sf in SFS:
        for name, _ in PROBES:
            spec = QUERIES[name]
            force(spec.fn(spark, sf))  # warm: compile + JIT
            # drop BOTH per-query persists and session-shared subplan
            # caches (dedup bands etc.) so the timed run pays the full
            # query cost, not a cache read
            caching.release_all()
            mark = _exec_count(spark)
            t0 = time.perf_counter()
            force(spec.fn(spark, sf))
            dt = time.perf_counter() - t0
            sb = _shuffle_bytes_since(spark, mark)
            caching.release_all()
            rows[name].append((dt, sb))
            print(f"# {sf.rsplit('sf',1)[-1]} {name}: {dt:.2f}s {sb}B",
                  file=sys.stderr, flush=True)

    out = [
        "# SCALING — measured time & shuffle volume vs data size",
        "",
        "Warm second-run wall time and shuffle-bytes-written per query at",
        "sf0.001 / sf0.01 / sf0.1 (10x rows per step, `local[32]`).",
        "Generated by `tools/scaling_probe.py`; regenerate after operator",
        "changes.",
        "",
        "Reading guide: **sh x10** is the shuffle-bytes growth over the",
        "last 10x data step — ~10x means the shuffle is linear in input",
        "(survives scale-up), ~100x means quadratic (would not).",
        "**t x10** is the same for wall time; values well under 10 mean",
        "the query is still fixed-overhead-dominated at sf0.1, so time",
        "ratios there understate nothing — the shuffle column is the",
        "binding evidence.",
        "",
        "| query | shape | t(ms) 0.001/0.01/0.1 | t x10 | shuffle B 0.001/0.01/0.1 | sh x10 |",
        "|---|---|---|---|---|---|",
    ]
    for name, shape in PROBES:
        (t1, s1), (t2, s2), (t3, s3) = rows[name]
        tr = f"{t3 / t2:.1f}" if t2 > 0 else "-"
        sr = f"{s3 / s2:.1f}" if s2 and s2 > 0 and s3 >= 0 else "-"
        out.append(
            f"| {name} | {shape} | {t1*1000:.0f} / {t2*1000:.0f} / {t3*1000:.0f} "
            f"| {tr} | {s1} / {s2} / {s3} | {sr} |"
        )
    out.append("")
    Path(__file__).resolve().parent.parent.joinpath("SCALING.md").write_text(
        "\n".join(out)
    )
    print("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
