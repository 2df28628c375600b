"""String helper functions (SURVEY.md §2.7 F8-F18) — column expressions
plus the few driver-side helpers the API layer needs."""

from __future__ import annotations

import re
from datetime import date

from pyspark.sql import Column, functions as F


def ci_eq(col: Column, value) -> Column:
    """P7 $eqi: case-insensitive equality (csv-import.js:529-531)."""
    return F.lower(col) == F.lower(F.lit(value) if not isinstance(value, Column) else value)


def ci_contains(col: Column, value) -> Column:
    """P8 $containsi: case-insensitive contains (csv-import.js:541-546)."""
    v = F.lit(value) if not isinstance(value, Column) else value
    return F.lower(col).contains(F.lower(v))


def sanitize_name(col: Column) -> Column:
    """F17: replace(/[^a-zA-Z0-9.-]/g, '_') (csv-import.js:837,1054)."""
    return F.regexp_replace(col, r"[^a-zA-Z0-9.\-]", "_")


def sanitize_name_py(name: str) -> str:
    return re.sub(r"[^a-zA-Z0-9.\-]", "_", name)


def escape_regexp(value: str) -> str:
    """F11 escapeRegExp (csv-import.js:1251-1253) — Python-side because
    patterns are built driver-side before hitting rlike."""
    return re.escape(value)


def stamped_filename(base: str, ext: str = "csv", on: date | None = None) -> str:
    """F18: `${base}_${date}.csv` export naming
    (controllers/csv-import.js:454)."""
    stamp = (on or date.today()).isoformat()
    return f"{base}_{stamp}.{ext}"
