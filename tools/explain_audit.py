"""Plan audit: for every registered query, count the physical-plan
features that matter at 100 TB — exchanges (shuffles), broadcast vs
sort-merge joins, whole-stage codegen spans, parquet filter pushdown.

Usage: python tools/explain_audit.py [query_name ...]
With names: print the full formatted plan. Without: one summary line
per query (the thing to eyeball after every operator change).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import advanced_strapi_import_spark.plans.all  # noqa: F401
from advanced_strapi_import_spark.plans.registry import QUERIES
from advanced_strapi_import_spark.session import get_spark

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("explain-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or list(QUERIES)
    for name in names:
        spec = QUERIES[name]
        if name == "stream_events_hourly":
            print(f"{name:28s}  (streaming — skipped)")
            continue
        try:
            df = spec.fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s}  ERROR {str(e)[:80]}")
            continue
        if sys.argv[1:]:
            df.explain("formatted")
            continue
        n_exchange = len(re.findall(r"Exchange (?:hash|range|Single)", plan))
        n_bhj = plan.count("BroadcastHashJoin")
        n_smj = plan.count("SortMergeJoin")
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        n_wsc = len(set(re.findall(r"\*\((\d+)\)", plan)))
        pushed = "push" if re.search(r"PushedFilters: \[[^\]]", plan) else "-"
        print(
            f"{name:28s}  exch={n_exchange:<2d} bhj={n_bhj:<2d} smj={n_smj:<2d} "
            f"bnlj={n_bnlj:<2d} codegen={n_wsc:<2d} {pushed}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
