"""Per-query time decomposition: driver-side plan construction (Python
+ py4j) vs analysis vs execution, plus job/stage counts.

The bench times fn(spark, sf_dir) + noop-sink force as one number; this
tool splits that number so optimization effort lands where the time is:

  t_fn      — Python plan-building (py4j round trips, driver numpy,
              any eager actions the builder runs: counts, collects,
              index builds, streaming drains)
  t_analyze — first .schema touch (Catalyst analysis)
  t_exec    — noop sink (optimization + physical planning + execution)
  jobs      — Spark jobs launched across the whole query (fn + force)

Usage::

    python tools/profile_breakdown.py [-w] query_name [query_name ...]
    python tools/profile_breakdown.py --top N     # N slowest from BENCH_FULL
    -w: warm each plan at sf0.001 first (bench protocol)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import advanced_strapi_import_spark.plans.all  # noqa: F401,E402
from advanced_strapi_import_spark import caching  # noqa: E402
from advanced_strapi_import_spark.plans.registry import QUERIES  # noqa: E402
from advanced_strapi_import_spark.session import get_spark  # noqa: E402

from bench import SF_DIR, force  # noqa: E402


def _n_jobs(spark) -> int:
    try:
        tracker = spark.sparkContext.statusTracker()
        return len(tracker.getJobIdsForGroup(None))
    except Exception:
        return -1


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    warm = "-w" in sys.argv
    if "--top" in sys.argv:
        n = int(sys.argv[sys.argv.index("--top") + 1])
        bf = json.loads((REPO / "BENCH_FULL.json").read_text())
        args = sorted(bf["queries"], key=bf["queries"].get, reverse=True)[:n]
    spark = get_spark("profile-breakdown")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # bench-equivalent warmers: JVM + parquet footers + python workers
    force(QUERIES["q1_pricing_summary"].fn(spark, SF_DIR))
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    def _noop(s):
        return s

    _noop.__annotations__ = {"s": __import__("pandas").Series,
                             "return": __import__("pandas").Series}
    spark.range(32).repartition(32).select(
        F.pandas_udf(_noop, "long")("id")).count()

    rows = []
    for name in args:
        spec = QUERIES[name]
        if warm:
            try:
                force(spec.fn(spark, "/root/testdata/sf0.001"))
            except Exception as e:
                print(f"# warm {name} failed: {e}", file=sys.stderr)
            caching.release_all()
        import gc
        gc.collect()
        spark._jvm.System.gc()
        j0 = _n_jobs(spark)
        t0 = time.perf_counter()
        df = spec.fn(spark, SF_DIR)
        t1 = time.perf_counter()
        _ = df.schema
        t2 = time.perf_counter()
        force(df)
        t3 = time.perf_counter()
        j1 = _n_jobs(spark)
        caching.release_all()
        rows.append({
            "query": name,
            "t_total": round(t3 - t0, 3),
            "t_fn": round(t1 - t0, 3),
            "t_analyze": round(t2 - t1, 3),
            "t_exec": round(t3 - t2, 3),
            "jobs": (j1 - j0) if (j0 >= 0 and j1 >= 0) else -1,
        })
        r = rows[-1]
        print(f"{name:36s} total={r['t_total']:7.2f}  fn={r['t_fn']:6.2f}"
              f"  analyze={r['t_analyze']:5.2f}  exec={r['t_exec']:6.2f}"
              f"  jobs={r['jobs']}", flush=True)
    print(json.dumps(rows))
    spark.stop()


if __name__ == "__main__":
    main()
