"""Denormalizing export — SURVEY.md §2.3 J9, §2.7 F19/F20, §2.4 A6, §2.1 S7.

Re-expresses the reference's export path
(/root/reference/server/controllers/csv-import.js:300-466): fetch rows
with relations/components populated, flatten nested values to
dot-notation columns, serialize to quoted CSV.

  - scalar relation  -> `field.<firstcol>` column (first-column heuristic
    F19, controllers/csv-import.js:390-391: first attribute of the target
    schema, falling back name -> title -> displayName -> id)
  - multi relation   -> display values joined ', ' (A6, :383-401)
  - single component -> `field.key` columns (:353-360)
  - repeatable comp  -> `field.{i}.key` 1-based columns (:361-378)
  - metadata columns createdAt/updatedAt/publishedAt dropped (P10, :420-423)

All flattening is select/join expressions — the populate step is a set
of broadcast left joins, never per-row fetches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from advanced_strapi_import_spark.schema import ContentType

METADATA_COLS = ["createdAt", "updatedAt", "publishedAt"]


def first_column(target_ct: ContentType) -> str:
    """F19: the display column of a related row (controllers/csv-import.js
    :390-391,408-409)."""
    # first non-id attribute, else id. (A name/title/displayName
    # fallback chain would be dead code here: any such attribute is
    # itself a non-id attribute and therefore already names[0]'s list.)
    names = [n for n in target_ct.attributes if n != "id"]
    return names[0] if names else "id"


def flatten_scalar_relation(
    df: DataFrame,
    field: str,
    target: DataFrame,
    target_ct: ContentType,
    *,
    id_col: str = "id",
) -> DataFrame:
    """Replace FK column ``field`` with `` field.<first> `` display value
    via a broadcast left join (J9)."""
    disp = first_column(target_ct)
    dim = F.broadcast(
        target.select(
            F.col(id_col).alias("__dim_id"), F.col(disp).cast("string").alias("__dim_disp")
        )
    )
    return (
        df.join(dim, df[field] == F.col("__dim_id"), "left")
        .drop(field, "__dim_id")
        .withColumnRenamed("__dim_disp", f"{field}.{disp}")
    )


def flatten_multi_relation(
    df: DataFrame,
    field: str,
    target: DataFrame,
    target_ct: ContentType,
    *,
    id_col: str = "id",
    row_key: str = "id",
) -> DataFrame:
    """A6: array-of-FK column -> `', '`-joined display values, order =
    array order (the reference joins in populate order)."""
    disp = first_column(target_ct)
    dim = F.broadcast(
        target.select(F.col(id_col).alias("__dim_id"), F.col(disp).cast("string").alias("__d"))
    )
    # null/empty FK arrays must flatten to NULL, not '': the reference
    # leaves the field unset, and the CSV writer serializes NULL as an
    # empty cell but '' as a quoted "" — dropping the null explode rows
    # here means such rows miss the aggregate and the final left join
    # yields NULL
    exploded = df.select(
        row_key, F.posexplode_outer(field).alias("__pos", "__fk")
    ).where(F.col("__fk").isNotNull())
    joined = (
        exploded.join(dim, F.col("__fk") == F.col("__dim_id"), "left")
        .groupBy(row_key)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__d"))),
                    lambda s: s["__d"],
                ),
                ", ",
            ).alias(f"{field}.{disp}")
        )
    )
    return df.drop(field).join(joined, row_key, "left")


def flatten_single_component(df: DataFrame, field: str) -> DataFrame:
    """F20 single: struct column -> `field.key` scalar columns."""
    struct_type = dict(zip(df.columns, [f.dataType for f in df.schema.fields]))[field]
    out = df
    for sub in struct_type.fieldNames():
        out = out.withColumn(f"{field}.{sub}", F.col(field).getField(sub))
    return out.drop(field)


def flatten_repeatable_component(
    df: DataFrame, field: str, *, max_items: int | None = None
) -> DataFrame:
    """F20 repeatable: array<struct> -> `field.{i}.key` 1-based columns.

    ``max_items`` bounds the flattened width; when None it is computed
    with one tiny agg (max array size) — a driver-side scalar, not a
    collect of data."""
    if max_items is None:
        max_items = (
            df.agg(F.max(F.size(F.coalesce(F.col(field), F.array()))).alias("m"))
            .collect()[0]["m"]
            or 0
        )
    arr_type = dict(zip(df.columns, [f.dataType for f in df.schema.fields]))[field]
    sub_names = arr_type.elementType.fieldNames()
    out = df
    for i in range(1, max_items + 1):
        item = F.try_element_at(F.col(field), F.lit(i))  # null past the end (ANSI-safe)
        for sub in sub_names:
            out = out.withColumn(f"{field}.{i}.{sub}", item.getField(sub))
    return out.drop(field)


def drop_metadata(df: DataFrame) -> DataFrame:
    """P10 export hygiene: metadata + reserved `__*` columns."""
    drops = [c for c in df.columns if c in METADATA_COLS or c.startswith("__")]
    return df.drop(*drops)


def write_csv(df: DataFrame, path: str, *, header: bool = True) -> None:
    """S7 CSV sink: RFC-4180 quoting (quote when needed, `\"`->`\"\"`)
    is Spark's CSV writer default (controllers/csv-import.js:442-445).

    ignoreLeading/TrailingWhiteSpace default to TRUE on the writer
    (unlike the reader) and would silently trim cell padding the
    reference writes as-is — found by the round-trip property test."""
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
    )
