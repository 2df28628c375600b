"""Type-coercion expressions faithful to the reference's JS semantics
(validation switch at /root/reference/server/services/csv-import.js:127-197),
expressed as native Spark columns so they stay inside whole-stage codegen.

Notable fidelity choices:
  - JS ``parseInt("12abc") == 12``: we extract the leading integer with a
    regex before casting, instead of Spark's all-or-null cast.
  - JS ``parseFloat`` likewise takes the leading float literal.
  - JS ``new Date(v)`` is lax: we parse through a ladder of common formats
    and emit the reference's ``toISOString()`` shape (UTC, millis, 'Z').
  - boolean accepts exactly the six literals true/false/1/0/yes/no,
    case-insensitively (csv-import.js:149-151).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_REGEX = r"^[^\s@]+@[^\s@]+\.[^\s@]+$"  # csv-import.js:169

_INT_RE = r"^\s*([+-]?\d+)"
_FLOAT_RE = r"^\s*([+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)"

TRUE_LITERALS = ["true", "1", "yes"]
FALSE_LITERALS = ["false", "0", "no"]

ISO_MS_Z = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"  # Date.prototype.toISOString shape


def parse_int(col: Column) -> Column:
    """JS parseInt(v, 10): leading integer or null (F1)."""
    lead = F.regexp_extract(col, _INT_RE, 1)
    return F.when(lead != "", lead.cast("long"))


def parse_float(col: Column) -> Column:
    """JS parseFloat(v): leading float literal or null (F2)."""
    lead = F.regexp_extract(col, _FLOAT_RE, 1)
    return F.when(lead != "", lead.cast("double"))


def parse_bool(col: Column) -> Column:
    """Six-literal boolean, case-insensitive; null when unrecognized (F3)."""
    low = F.lower(col)
    return (
        F.when(low.isin(TRUE_LITERALS), F.lit(True))
        .when(low.isin(FALSE_LITERALS), F.lit(False))
    )


def bool_recognized(col: Column) -> Column:
    return F.lower(col).isin(TRUE_LITERALS + FALSE_LITERALS)


def parse_date_lenient(col: Column) -> Column:
    """JS new Date(v) ladder -> timestamp; null when nothing parses (F4).

    Covers the formats the reference's tests exercise: ISO date, ISO
    datetime (with/without millis/'Z'), US M/d/yyyy, and
    'yyyy-MM-dd HH:mm:ss'.
    """
    c = F.trim(col)
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSS")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(c, F.lit("M/d/yyyy")),
    )


def to_iso_string(ts: Column) -> Column:
    """Emit the exact Date.toISOString() shape in UTC (csv-import.js:164)."""
    return F.date_format(ts, ISO_MS_Z)


def is_valid_email(col: Column) -> Column:
    return col.rlike(EMAIL_REGEX)  # F5


def is_numeric(col: Column) -> Column:
    """JS !isNaN(Number(v)) && !isNaN(parseInt(v)) (csv-import.js:557, F16).

    Number('') is 0 in JS but parseInt('') is NaN, so empty fails; a pure
    decimal like '.5' passes Number but fails parseInt -> fails. The
    combined predicate is "has a leading digit and is a full numeric
    literal"; we mirror with a strict numeric-literal regex.
    """
    return col.rlike(r"^\s*[+-]?(\d+(\.\d*)?)([eE][+-]?\d+)?\s*$")


def split_trim(col: Column, sep: str = ",") -> Column:
    """v.split(sep).map(t => t.trim()) (F9, csv-import.js:478,712)."""
    return F.transform(F.split(col, sep), lambda x: F.trim(x))
