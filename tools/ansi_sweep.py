"""ANSI-mode tripwire sweep (round 9, VERDICT r8 task 4).

Runs EVERY registered query once with ``spark.sql.ansi.enabled=true``
so that any silent integer overflow, lossy cast, or out-of-bounds
access in the 315 plans surfaces as a hard error instead of a wrapped
value the DuckDB-parity gate cannot see (the gate proves cross-engine
AGREEMENT; a non-ANSI wrap that both engines avoid — because DuckDB
raises while Spark wraps — only diverges once the data is large
enough, which sf0.01 is not). This is the cheap systematic version of
the round-8 Welch finding: run once per round, list the queries that
fail ANSI, fix or document each.

Usage::

    python tools/ansi_sweep.py [substring ...]   # default: all queries
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/ansi_sweep.py

Prints one line per query (OK / FAIL + the exception head) and a
final JSON summary; exit code 1 if any query failed.

Interpretation notes:
- a FAIL here is not automatically a bug: ANSI also hardens LENIENT
  casts that are part of the reference semantics (JS parseInt-style
  "cast returns null on garbage"). Those must use try_cast/try_*
  forms so they stay null-producing under ANSI — that conversion IS
  the fix, since it makes the intent explicit and keeps the plan
  ANSI-clean.
- the sweep materializes through the same no-op v2 sink as bench.py
  (count() would let Catalyst prune the very expression that wraps).
"""

from __future__ import annotations

import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import advanced_strapi_import_spark.plans.all  # noqa: F401
from advanced_strapi_import_spark import caching
from advanced_strapi_import_spark.plans.registry import QUERIES
from advanced_strapi_import_spark.session import get_spark

from bench import SF_DIR, force  # noqa: E402


def main() -> int:
    subs = [a for a in sys.argv[1:] if not a.startswith("-")]
    names = [
        n for n in QUERIES
        if not subs or any(s in n for s in subs)
    ]
    spark = get_spark("ansi-sweep")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    failures: dict[str, str] = {}
    t0 = time.time()
    for i, name in enumerate(names):
        t = time.time()
        try:
            force(QUERIES[name].fn(spark, SF_DIR))
            print(f"[{i + 1}/{len(names)}] {name}: OK"
                  f" ({time.time() - t:.1f}s)", flush=True)
        except Exception:
            tb = traceback.format_exc()
            # the root cause line is usually the last JVM message
            head = next(
                (ln for ln in tb.splitlines() if "SparkArithmeticException"
                 in ln or "ArithmeticException" in ln or "CAST_INVALID"
                 in ln or "ARITHMETIC_OVERFLOW" in ln or "Error" in ln),
                tb.splitlines()[-1],
            )
            failures[name] = head.strip()[:300]
            print(f"[{i + 1}/{len(names)}] {name}: FAIL {failures[name]}",
                  flush=True)
        finally:
            caching.release_all()
    # self-check (round 10, VERDICT r9 task 4): a full sweep must have
    # covered EVERY registered query — a query landing after the last
    # sweep re-run used to leave a silent coverage gap
    full = not subs
    summary = {
        "sf_dir": SF_DIR,
        "n_queries": len(names),
        "n_registered": len(QUERIES),
        "full_sweep": full,
        "n_failed": len(failures),
        "failures": failures,
        "total_sec": round(time.time() - t0, 1),
    }
    print(json.dumps(summary))
    if full:
        # persist the covered set: tests/test_ansi_coverage.py asserts
        # the RECORDED sweep covers the CURRENT registry, so a query
        # registered after the last sweep re-run turns the pytest suite
        # red instead of leaving a silent coverage gap
        out = Path(__file__).with_name("ansi_sweep_result.json")
        out.write_text(json.dumps({**summary, "covered": names}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
