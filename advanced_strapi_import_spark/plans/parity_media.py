"""Parity queries for the media pipeline: the 3-pattern theta join (J7)
in both physical strategies, keyword classification (J8), and the MIME
map (F15) — over file tables derived deterministically from orders/part.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from advanced_strapi_import_spark.operators import media as M
from advanced_strapi_import_spark.plans.registry import load, query

_FILES_SQL = """
  SELECT o_orderkey AS id,
         lower('Supplier#' || lpad(CAST(o_custkey % 200 AS VARCHAR), 9, '0')) ||
         CASE o_orderkey % 4 WHEN 0 THEN '.pdf' WHEN 1 THEN '_1.pdf'
              WHEN 2 THEN '_12.jpg' ELSE '_extra_report.pdf' END AS name
  FROM orders
"""

_MATCH_SQL = f"""
WITH f AS ({_FILES_SQL}),
m AS (
  SELECT s.s_suppkey AS skey, f.id, f.name
  FROM supplier s JOIN f ON starts_with(f.name, lower(s.s_name))),
agg AS (
  SELECT skey, array_to_string(list(id ORDER BY name, id), ',') AS ids
  FROM m GROUP BY skey)
SELECT s.s_suppkey AS skey, s.s_name AS sname, coalesce(a.ids, '') AS media_ids
FROM supplier s LEFT JOIN agg a ON a.skey = s.s_suppkey
"""


def _media_inputs(spark: SparkSession, sf_dir: str):
    sup = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("skey"), F.col("s_name").alias("sname")
    )
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    files = o.select(
        k.alias("id"),
        F.concat(
            F.lower(F.concat(F.lit("Supplier#"),
                             F.lpad((F.col("o_custkey") % 200).cast("string"), 9, "0"))),
            F.when(k % 4 == 0, F.lit(".pdf"))
            .when(k % 4 == 1, F.lit("_1.pdf"))
            .when(k % 4 == 2, F.lit("_12.jpg"))
            .otherwise(F.lit("_extra_report.pdf")),
        ).alias("name"),
    )
    return sup, files


def _ids_csv(df: DataFrame) -> DataFrame:
    return df.select(
        "skey", "sname",
        F.concat_ws(
            ",",
            F.transform(F.coalesce("media_ids", F.array().cast("array<long>")),
                        lambda x: x.cast("string")),
        ).alias("media_ids"),
    )


@query(
    "media_match",
    oracle=_MATCH_SQL,
    doc="J7: 3-pattern filename theta join (exact/numbered/prefix ⊆ "
        "startswith), sorted id collect (W1); broadcast-theta strategy.",
)
def media_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup, files = _media_inputs(spark, sf_dir)
    out = M.match_media(sup, files, "sname", row_key="skey")
    return _ids_csv(out)


@query(
    "media_match_prefix",
    oracle=_MATCH_SQL,
    doc="J7 at scale: same semantics via prefix-explode EQUI join "
        "(shuffle-partitionable, no cartesian).",
)
def media_match_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup, files = _media_inputs(spark, sf_dir)
    out = M.match_media(sup, files, "sname", row_key="skey", strategy="prefix-explode")
    return _ids_csv(out)


_KW_VALUES = ", ".join(
    f"('{f}', '{k}')" for f, kws in M.FIELD_KEYWORDS.items() for k in kws
)

_CLASSIFY_FILES_SQL = """
  SELECT p_partkey AS id,
         replace(lower(p_name), ' ', '_') || '_' ||
         CASE p_partkey % 6 WHEN 0 THEN 'report' WHEN 1 THEN 'invoice'
              WHEN 2 THEN 'lab' WHEN 3 THEN 'challan' WHEN 4 THEN 'audit'
              ELSE 'misc' END ||
         CASE p_partkey % 5 WHEN 0 THEN '.pdf' WHEN 1 THEN '.jpg'
              WHEN 2 THEN '.docx' WHEN 3 THEN '.txt' ELSE '.bin' END AS name
  FROM part
"""


def _classify_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return p.select(
        k.alias("id"),
        F.concat(
            F.regexp_replace(F.lower("p_name"), " ", "_"), F.lit("_"),
            F.when(k % 6 == 0, F.lit("report")).when(k % 6 == 1, F.lit("invoice"))
            .when(k % 6 == 2, F.lit("lab")).when(k % 6 == 3, F.lit("challan"))
            .when(k % 6 == 4, F.lit("audit")).otherwise(F.lit("misc")),
            F.when(k % 5 == 0, F.lit(".pdf")).when(k % 5 == 1, F.lit(".jpg"))
            .when(k % 5 == 2, F.lit(".docx")).when(k % 5 == 3, F.lit(".txt"))
            .otherwise(F.lit(".bin")),
        ).alias("name"),
    )


@query(
    "media_classify",
    oracle=f"""
WITH f AS ({_CLASSIFY_FILES_SQL}),
kw(field, keyword) AS (VALUES {_KW_VALUES})
SELECT DISTINCT k.field, f.id, f.name
FROM f JOIN kw k ON contains(f.name, k.keyword)
""",
    doc="J8: keyword file-to-field routing as a broadcast contains-join "
        "over the config keyword table.",
)
def media_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.classify_files(_classify_files(spark, sf_dir), name_col="name").select(
        "field", "id", "name"
    )


@query(
    "file_mime",
    oracle=f"""
WITH f AS ({_CLASSIFY_FILES_SQL})
SELECT id, name,
       CASE lower(string_split(name, '.')[-1])
         WHEN 'pdf' THEN 'application/pdf'
         WHEN 'jpg' THEN 'image/jpeg'  WHEN 'jpeg' THEN 'image/jpeg'
         WHEN 'png' THEN 'image/png'   WHEN 'gif' THEN 'image/gif'
         WHEN 'doc' THEN 'application/msword'
         WHEN 'docx' THEN 'application/vnd.openxmlformats-officedocument.wordprocessingml.document'
         WHEN 'xls' THEN 'application/vnd.ms-excel'
         WHEN 'xlsx' THEN 'application/vnd.openxmlformats-officedocument.spreadsheetml.sheet'
         WHEN 'txt' THEN 'text/plain'  WHEN 'mp4' THEN 'video/mp4'
         WHEN 'mp3' THEN 'audio/mpeg'
         ELSE 'application/octet-stream' END AS mime
FROM f
""",
    doc="F15: extension -> MIME map lookup with octet-stream default.",
)
def file_mime(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _classify_files(spark, sf_dir)
    return f.select("id", "name", M.mime_type(F.col("name")).alias("mime"))
