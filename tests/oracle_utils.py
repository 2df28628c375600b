"""Local mirror of the driver's correctness gate: run a registered query
on Spark and its oracle on DuckDB over the same parquet dir, compare
row-count, column names, and (order-insensitively) values."""

from __future__ import annotations

import math
from datetime import date, datetime


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact float match is the target (driver hashes values); keep value
        return v
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def compare_query(spark, duck, spec, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    res = duck.sql(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    problems: list[str] = []
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns differ: spark={sorted(scols)} duck={sorted(dcols)}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"row count differs: spark={len(srows)} duck={len(drows)}")
    s, d = _rowset(scols, srows), _rowset(dcols, drows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b]
        problems.append(
            f"values differ ({len(diffs)} of {max(len(s), len(d))} rows); "
            f"first: spark={diffs[0][0] if diffs else s[:1]} duck={diffs[0][1] if diffs else d[:1]}"
        )
    return problems
