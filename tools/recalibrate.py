"""Print the MEASURED metrics behind every pinned-boolean oracle.

Three registry queries pin constant-TRUE booleans in their DuckDB
oracles (``embedding_mmr_ivf``, ``embedding_ivf_nprobe_sweep``,
``events_hll_precision_sweep``): the oracle asserts the *shape* and the
Spark side asserts a tuned recall/error floor. If the data generator,
the k-means seed, or a sketch implementation changes, those floors can
silently go stale — the bench fails with no signal of the new true
values. This tool makes recalibration mechanical: each query exposes an
``emit_metrics=True`` mode returning the underlying measured values
(same plan, booleans skipped), and this script prints them per SF so
the floors can be re-tuned from evidence instead of bisection.

Usage: python tools/recalibrate.py [sf_dir ...]
Defaults to all three testdata SFs.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from advanced_strapi_import_spark.session import get_spark  # noqa: E402
import advanced_strapi_import_spark.plans.all  # noqa: F401,E402
from advanced_strapi_import_spark.plans.parity_ml import (  # noqa: E402
    embedding_ivf_nprobe_sweep,
    embedding_mmr_ivf,
)
from advanced_strapi_import_spark.plans.parity_sketch import (  # noqa: E402
    events_hll_precision_sweep,
)
from advanced_strapi_import_spark.caching import release_tracked  # noqa: E402

PINNED = {
    "embedding_mmr_ivf": embedding_mmr_ivf,
    "embedding_ivf_nprobe_sweep": embedding_ivf_nprobe_sweep,
    "events_hll_precision_sweep": events_hll_precision_sweep,
}


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        f"/root/testdata/sf{sf}" for sf in ("0.001", "0.01", "0.1")
    ]
    spark = get_spark("recalibrate")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        for name, fn in PINNED.items():
            print(f"\n== {name} @ {sf_dir} ==")
            fn(spark, sf_dir, emit_metrics=True).show(50, truncate=False)
            release_tracked()
    spark.stop()


if __name__ == "__main__":
    main()
