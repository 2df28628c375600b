"""ANSI-sweep coverage tripwire (round 10, VERDICT r9 task 4).

`tools/ansi_sweep.py` runs every registered plan under
``spark.sql.ansi.enabled=true`` once per round and records the covered
query set in `tools/ansi_sweep_result.json`. Round 9 shipped one query
(`stream_rollup_compacted`) that landed AFTER the last sweep re-run —
a silent coverage gap. This test makes that state a hard pytest
failure: any query registered but absent from the recorded sweep (or
any recorded ANSI failure) turns the suite red until the sweep is
re-run.

No Spark session: it compares the registry against the recorded JSON.
"""

import json
from pathlib import Path

import advanced_strapi_import_spark.plans.all  # noqa: F401
from advanced_strapi_import_spark.plans.registry import QUERIES

_RESULT = Path(__file__).resolve().parent.parent / "tools" / (
    "ansi_sweep_result.json"
)


def test_recorded_ansi_sweep_covers_registry():
    assert _RESULT.exists(), (
        "tools/ansi_sweep_result.json missing — run"
        " `python tools/ansi_sweep.py` (full sweep) once per round"
    )
    rec = json.loads(_RESULT.read_text())
    missing = sorted(set(QUERIES) - set(rec["covered"]))
    assert not missing, (
        f"{len(missing)} registered queries not covered by the last"
        f" full ANSI sweep: {missing[:10]} — re-run"
        " `python tools/ansi_sweep.py`"
    )
    assert rec["n_failed"] == 0, (
        f"last ANSI sweep recorded failures: {rec['failures']}"
    )
