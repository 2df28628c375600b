"""Generate QUERIES.md: the full query catalog with per-query doc and
oracle status. Run after adding queries; the artifact is the judge/user
index into the engine's surface.

Usage: python tools/catalog_doc.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import advanced_strapi_import_spark.plans.all  # noqa: F401
from advanced_strapi_import_spark.plans.registry import QUERIES


def main() -> None:
    lines = [
        "# QUERIES — the engine's query catalog",
        "",
        f"{len(QUERIES)} registered queries. Every entry is a PySpark plan"
        " builder paired with a DuckDB oracle (ANSI SQL on the same"
        " parquet) unless marked rows-only; `python tools/driver_sim.py`"
        " replays the full value-checked gate. Docs below are the"
        " queries' own docstrings (registry `doc=`).",
        "",
        "| # | Query | Oracle | What it does |",
        "|---|---|---|---|",
    ]
    for i, (name, spec) in enumerate(QUERIES.items(), 1):
        doc = " ".join((spec.doc or "").split())
        oracle = "value-checked" if spec.oracle else "rows-only"
        doc = doc.replace("|", "\\|")
        lines.append(f"| {i} | `{name}` | {oracle} | {doc} |")
    out = Path(__file__).resolve().parent.parent / "QUERIES.md"
    out.write_text("\n".join(lines) + "\n")
    n_oracle = sum(1 for s in QUERIES.values() if s.oracle)
    print(f"QUERIES.md: {len(QUERIES)} queries, {n_oracle} value-checked")


if __name__ == "__main__":
    main()
