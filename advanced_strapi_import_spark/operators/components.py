"""Nested component construction — SURVEY.md §2.3 J5, §2.4 A3.

The reference builds "components" (structs / arrays of structs) from flat
pivoted CSV columns (/root/reference/server/services/csv-import.js:625-803):

  - single component: one struct from `component.field` columns (:664-676)
  - repeatable: parallel comma-separated lists pivot into an array of
    structs; the array length is the MAX of the per-column list lengths
    (A3 maxRows, :707-715); shorter lists pad with null (ragged ok)
  - field values cast per the component schema; cast failures coerce to
    null instead of erroring (:774-803)
  - relations inside components resolve through the same entity cascade
    (`field.searchfield`, :742-769)

Spark-first: the pivot is sequence(1, greatest(sizes)) + transform over
element_at — one expression, no explode/shuffle; only a relation-in-
component triggers the resolver's joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from advanced_strapi_import_spark.functions import casts as C
from advanced_strapi_import_spark.operators.resolve import (
    RESOLVED_COL,
    VALUE_COL,
    resolve_values,
)
from advanced_strapi_import_spark.schema import Attribute, ContentType, Registry


def _coerce(attr: Attribute, value: Column) -> Column:
    """Component-field cast: invalid -> null, never an error
    (csv-import.js:774-803)."""
    t = attr.type
    v = F.when(value != "", value)  # empty string counts as missing
    if t in ("integer", "biginteger"):
        return C.parse_int(v)
    if t in ("decimal", "float"):
        return C.parse_float(v)
    if t == "boolean":
        return C.parse_bool(v)
    if t in ("date", "datetime", "time"):
        return C.to_iso_string(C.parse_date_lenient(v))
    return v.cast("string")


def build_repeatable_component(
    df: DataFrame,
    field: str,
    comp_ct: ContentType,
    columns: dict[str, str],
    *,
    registry: Registry | None = None,
    targets: dict[str, DataFrame] | None = None,
    search_fields: dict[str, str] | None = None,
    row_key: str = "__row",
) -> DataFrame:
    """Pivot comma-lists in ``columns`` (component-field -> source column)
    into ``field`` = array<struct<...>> (A3 + J5).

    Relation-typed component fields resolve each token through the
    cascade when a target DataFrame is provided.
    """
    # Materialize each field's split array ONCE per row. Higher-order
    # functions run interpreted (outside whole-stage codegen), so a
    # split_trim referenced inside the transform() below would re-split
    # the source string once per element per field; hoisting the arrays
    # into plain projected columns keeps the split in codegen and the
    # HOF body down to try_element_at + cast.
    arr_cols = {cf: f"__arr__{field}__{cf}" for cf in columns}
    out = df
    for cf, src in columns.items():
        out = out.withColumn(arr_cols[cf], C.split_trim(F.col(f"`{src}`")))
    splits = {cf: F.col(arr_cols[cf]) for cf in columns}
    n = F.greatest(*[F.size(s) for s in splits.values()]) if len(splits) > 1 else F.size(
        next(iter(splits.values()))
    )
    resolved_maps: dict[str, str] = {}
    if registry is not None and targets:
        for cf, src in columns.items():
            attr = comp_ct.attributes.get(cf)
            if attr is None or attr.type != "relation" or attr.target not in targets:
                continue
            tokens = df.select(
                F.explode(C.split_trim(F.col(f"`{src}`"))).alias(VALUE_COL)
            )
            mapping = resolve_values(
                tokens,
                targets[attr.target],
                registry.get(attr.target),
                registry,
                search_field=(search_fields or {}).get(cf),
            )
            map_col = f"__map__{field}__{cf}"
            # broadcast the tiny value->id map as a MapType literal-free
            # join: collect into a map column via a cross join of one row
            kv = mapping.agg(
                F.map_from_entries(
                    F.collect_list(F.struct(VALUE_COL, RESOLVED_COL))
                ).alias(map_col)
            )
            out = out.crossJoin(F.broadcast(kv))
            resolved_maps[cf] = map_col

    def item(i: Column) -> Column:
        parts = []
        for cf, src in columns.items():
            # try_element_at: out-of-range index pads null (ragged lists,
            # A3) instead of throwing under ANSI mode
            tok = F.try_element_at(splits[cf], i)
            attr = comp_ct.attributes.get(cf, Attribute(type="string"))
            if cf in resolved_maps:
                parts.append(
                    F.try_element_at(F.col(resolved_maps[cf]), tok).alias(cf)
                )
            else:
                parts.append(_coerce(attr, tok).alias(cf))
        return F.struct(*parts)

    out = out.withColumn(
        field,
        F.transform(F.sequence(F.lit(1), n), item),
    )
    # drop() matches raw names (dots included), no backticks
    return out.drop(
        *columns.values(), *arr_cols.values(), *resolved_maps.values()
    )


def build_single_component(
    df: DataFrame,
    field: str,
    comp_ct: ContentType,
    columns: dict[str, str],
) -> DataFrame:
    """Single component: struct built directly from its dot columns
    (csv-import.js:664-676)."""
    parts = [
        _coerce(comp_ct.attributes.get(cf, Attribute(type="string")), F.col(f"`{src}`")).alias(cf)
        for cf, src in columns.items()
    ]
    return df.withColumn(field, F.struct(*parts)).drop(*columns.values())
