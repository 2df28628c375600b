"""Media file matching & classification — SURVEY.md §2.3 J7/J8, §2.4 A4/A5.

J7 (processMediaFields, /root/reference/server/services/csv-import.js:
1201-1246): match uploaded files to rows where, case-insensitively,
    pattern 1  file == `{matchValue}.{ext}`        (exact)
    pattern 2  file matches `^{matchValue}_\\d+\\.` (numbered, regex-escaped)
    pattern 3  file startswith matchValue           (prefix)
Patterns 1 and 2 imply pattern 3, so the JOIN condition is exactly
"lower(name) startswith lower(matchValue)"; the three flags are still
computed post-join for reporting parity. Matched ids are collected
sorted by lowercase name (localeCompare, :1229-1233) with id as a
deterministic tie-break.

Two physical strategies:
  - ``broadcast-theta`` (default): rows x broadcast(files) with a
    startswith predicate — right when the file set is bounded (one zip).
  - ``prefix-explode``: files explode into (prefix, file) rows for every
    prefix length <= max_key_len, then an EQUI join on prefix==key. This
    is the 100 TB path: shuffle-partitionable, no cartesian, cost
    O(|files| * max_key_len + |rows|).

J8 (filterFilesForMediaField, :1142-1172): route files to media fields
by a filename-contains-keyword table — config data, joined not looped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# keyword table from csv-import.js:1143-1149 (config data, not code)
FIELD_KEYWORDS: dict[str, list[str]] = {
    "reports": ["report", "rpt", "analysis", "summary", "result"],
    "lab_docs": ["lab", "test", "analysis", "sample"],
    "referee_result": ["referee", "ref", "audit", "verification", "check"],
    "payment_docs": ["payment", "pay", "invoice", "bill", "receipt", "financial"],
    "challan_docs": ["challan", "delivery", "transport", "dispatch", "shipping"],
}

# extension -> MIME map from csv-import.js:1177-1196 (F15)
MIME_TYPES: dict[str, str] = {
    "pdf": "application/pdf",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "gif": "image/gif",
    "doc": "application/msword",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xls": "application/vnd.ms-excel",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "txt": "text/plain",
    "mp4": "video/mp4",
    "mp3": "audio/mpeg",
}
DEFAULT_MIME = "application/octet-stream"


def file_extension(col: F.Column) -> F.Column:
    """filename.split('.').pop().toLowerCase() (F14, csv-import.js:1258-1260)."""
    return F.lower(F.element_at(F.split(col, r"\."), -1))


def mime_type(filename: F.Column) -> F.Column:
    """F15: extension -> MIME with octet-stream default."""
    m = F.create_map(*[F.lit(x) for kv in MIME_TYPES.items() for x in kv])
    return F.coalesce(F.try_element_at(m, file_extension(filename)), F.lit(DEFAULT_MIME))


def classify_files(files: DataFrame, *, name_col: str = "name") -> DataFrame:
    """J8: emit one row per (media field, file) keyword match.

    The keyword table is config data, so each field's keywords compile
    into ONE literal alternation regex and classification is five
    codegen'd rlike filters unioned — no join at all (a contains-join
    against the keyword table was a BroadcastNestedLoopJoin with
    interpreted predicates; this form is map-side only)."""
    import re as _re

    lname = F.lower(F.col(name_col))
    parts = []
    for field, kws in FIELD_KEYWORDS.items():
        pattern = "|".join(_re.escape(k.lower()) for k in kws)
        parts.append(
            files.filter(lname.rlike(pattern)).withColumn("field", F.lit(field))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    cols = ["field"] + [c for c in files.columns]
    return out.select(*cols)


def match_media(
    rows: DataFrame,
    files: DataFrame,
    match_col: str,
    *,
    row_key: str,
    file_name_col: str = "name",
    file_id_col: str = "id",
    out_col: str = "media_ids",
    strategy: str = "broadcast-theta",
    max_key_len: int = 64,
) -> DataFrame:
    """J7: attach ``out_col`` = sorted array of matching file ids.

    Rows whose match value is empty/null stay unmatched (csv-import.js
    :1208 skips them); rows with zero matches get a null array (the
    reference leaves the field unset, :1226)."""
    mv = F.lower(F.col(match_col).cast("string"))
    fname = F.lower(F.col(file_name_col))
    fid = F.col(file_id_col).cast("long")

    left = rows.select(F.col(row_key), mv.alias("__mv")).where(
        F.col("__mv").isNotNull() & (F.col("__mv") != "")
    )

    if strategy == "prefix-explode":
        # equi-join path: explode every prefix of the file name up to
        # max_key_len -> (prefix, name, id); join on prefix == match
        # value. The prefix fan-out is ~64 rows per file — rebalance
        # the files scan first so a 1-split file table doesn't
        # serialize the explode on one core.
        par = files.sparkSession.sparkContext.defaultParallelism
        pref = files.repartition(par).select(
            fname.alias("__fname"), fid.alias("__fid")
        ).withColumn(
            "__prefix",
            F.explode(
                F.expr(
                    f"transform(sequence(1, least(length(__fname), {max_key_len})), "
                    "i -> substring(__fname, 1, i))"
                )
            ),
        )
        short = left.where(F.length("__mv") <= max_key_len)
        matched = short.join(
            pref, F.col("__mv") == F.col("__prefix"), "inner"
        ).drop("__prefix")
        # match values LONGER than max_key_len have no equi-join prefix
        # row — without this arm they would silently never match,
        # diverging from the theta strategy. They are rare (match keys
        # are short identifiers), so the tiny residual goes through the
        # same broadcast-theta join the other strategy uses.
        long_vals = left.where(F.length("__mv") > max_key_len)
        long_matched = long_vals.join(
            F.broadcast(files.select(fname.alias("__fname"), fid.alias("__fid"))),
            F.col("__fname").startswith(F.col("__mv")),
            "inner",
        )
        matched = matched.unionByName(long_matched)
    else:
        # BNLJ cost is |left| x |files| predicate evaluations on the
        # STREAM (left) side's partitions — a 1-split left scan would
        # run them all on one core; rebalance to cluster parallelism
        # first (cheap: left is (key, match-value) only)
        par = left.sparkSession.sparkContext.defaultParallelism
        matched = left.repartition(par).join(
            F.broadcast(files.select(fname.alias("__fname"), fid.alias("__fid"))),
            F.col("__fname").startswith(F.col("__mv")),
            "inner",
        )

    agg = (
        matched.groupBy(row_key)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__fname", "__fid"))),
                lambda s: s["__fid"],
            ).alias(out_col)
        )
    )
    return rows.join(agg, row_key, "left")
