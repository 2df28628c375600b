"""Standalone best-of-N floor measurement (the PLANS.md protocol,
formalized in round 10 so the bench-drift triage is reproducible).

For each named query, spawns a FRESH subprocess (fresh JVM, fresh
page-cache state for the session) per sample, warms THAT query's plan
once at sf0.001 (codegen/JIT compile is cached by generated source and
path-independent — same discipline as bench.py's warm phase, so the
timed run measures the data path, not one-time compile), then times
one full build+execute (fn + no-op v2 sink, exactly what bench.py
times) at $SPARK_GRAFT_SF_DIR, and reports the MINIMUM — the
reproducible standalone cost, stripped of suite-order heap effects.

Usage::

    python tools/standalone_floor.py [-n 5] query_name [query_name ...]

Prints one JSON line:
    {"sf_dir": ..., "n": 5, "floors": {q: min}, "samples": {q: [..]}}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = """
import gc, os, sys, time
sys.path.insert(0, {repo!r})
import advanced_strapi_import_spark.plans.all  # noqa: F401
from advanced_strapi_import_spark import caching
from advanced_strapi_import_spark.plans.registry import QUERIES
from advanced_strapi_import_spark.session import get_spark
from bench import SF_DIR, force
spark = get_spark("floor")
warm_sf = "/root/testdata/sf0.001"
if os.path.isdir(warm_sf) and (
    os.path.realpath(warm_sf) != os.path.realpath(SF_DIR)
):
    force(QUERIES[{name!r}].fn(spark, warm_sf))
    caching.release_all()
    gc.collect()
    spark._jvm.System.gc()
t0 = time.perf_counter()
force(QUERIES[{name!r}].fn(spark, SF_DIR))
print("FLOOR_SEC", time.perf_counter() - t0, flush=True)
"""


def sample(name: str) -> float:
    src = _CHILD.format(repo=str(REPO), name=name)
    out = subprocess.run(
        [sys.executable, "-c", src],
        capture_output=True, text=True, cwd=str(REPO),
        env={**os.environ},
    )
    for ln in out.stdout.splitlines():
        if ln.startswith("FLOOR_SEC"):
            return float(ln.split()[1])
    raise RuntimeError(
        f"{name}: no FLOOR_SEC in child output\n{out.stdout[-2000:]}"
        f"\n{out.stderr[-2000:]}"
    )


def main() -> int:
    args = sys.argv[1:]
    n = 5
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    if not args:
        print(__doc__)
        return 2
    samples: dict[str, list[float]] = {}
    for name in args:
        samples[name] = []
        for i in range(n):
            s = sample(name)
            samples[name].append(round(s, 2))
            print(f"# {name} sample {i + 1}/{n}: {s:.2f}s", flush=True)
    print(json.dumps({
        "sf_dir": os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ),
        "n": n,
        "floors": {q: min(v) for q, v in samples.items()},
        "samples": samples,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
