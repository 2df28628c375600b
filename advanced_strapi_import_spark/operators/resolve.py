"""Entity-resolution (FK lookup) cascade — SURVEY.md §2.3 J1-J5.

The reference resolves every relation value with a per-row fallback
cascade of DB queries (/root/reference/server/services/csv-import.js:521-620):

    1. searchField $eqi exact        (when a `relation.field` header gave one)
    2. searchField $containsi fuzzy
    3. id equality (numeric values)
    4. common string fields [name,title,slug,displayName,label,country] $eqi
    5. $containsi on the first common field
    -- first hit wins, limit 1 per strategy.

Here the whole cascade is ONE set-oriented plan:
  - distinct values are resolved once (not once per row — kills the N+1),
  - exact arms become a broadcast join against a stacked (key, rank, id)
    lookup built from the target dimension,
  - each contains (theta) arm only sees values missed by every arm of
    HIGHER precedence (per-arm anti-join), keeping the non-equi join
    tiny while preserving strategy order: searchField $containsi
    outranks the id and common-field exact strategies,
  - precedence = min(struct(rank, id)) per value; ties inside one
    strategy break deterministically on min id (the reference takes the
    DB's arbitrary first row — documented divergence).

Scale: the lookup side is the dimension table — broadcast below the
64 MB threshold, shuffle-hash above; values side never re-shuffles per
strategy because all equality arms share one join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

from advanced_strapi_import_spark.functions.casts import is_numeric, split_trim
from advanced_strapi_import_spark.operators.validate import dot_storage_col
from advanced_strapi_import_spark.schema import ContentType, Registry

VALUE_COL = "__value"
RESOLVED_COL = "__resolved_id"


def _strategies(
    target_ct: ContentType, registry: Registry, search_field: str | None
) -> tuple[list[tuple[int, str]], list[tuple[int, str]], int | None]:
    """Return (exact_arms [(rank, field)], contains_arms [(rank, field)],
    id_rank) in reference precedence order."""
    exact: list[tuple[int, str]] = []
    contains: list[tuple[int, str]] = []
    rank = 0
    if search_field and search_field in target_ct.attributes:
        exact.append((rank, search_field)); rank += 1
        contains.append((rank, search_field)); rank += 1
    id_rank = rank; rank += 1
    commons = registry.search_fields(target_ct)
    for f in commons:
        exact.append((rank, f)); rank += 1
    if commons:
        contains.append((rank, commons[0])); rank += 1
    return exact, contains, id_rank


def resolve_values(
    values: DataFrame,
    target: DataFrame,
    target_ct: ContentType,
    registry: Registry,
    *,
    search_field: str | None = None,
    id_col: str = "id",
) -> DataFrame:
    """Resolve a one-column DataFrame of distinct strings (VALUE_COL) to
    target ids -> (VALUE_COL, RESOLVED_COL); unresolved values are absent.
    """
    exact, contains, id_rank = _strategies(target_ct, registry, search_field)

    vals = values.select(VALUE_COL).where(F.col(VALUE_COL).isNotNull()).distinct()

    # --- stacked exact lookup: one join serves every equality arm --------
    lookups = []
    for rank, fld in exact:
        lookups.append(
            target.select(
                F.lower(F.col(fld).cast("string")).alias("__k"),
                F.lit(rank).alias("__rank"),
                F.col(id_col).cast("long").alias("__id"),
            )
        )
    cand_parts = []
    if lookups:
        stacked = lookups[0]
        for l in lookups[1:]:
            stacked = stacked.unionByName(l)
        cand_parts.append(
            vals.join(
                broadcast(stacked), F.lower(F.col(VALUE_COL)) == F.col("__k"), "inner"
            ).select(VALUE_COL, "__rank", "__id")
        )

    # --- id arm (numeric values only; csv-import.js:555-566) -------------
    # JS compares Number(value) == id (float equality); try_cast avoids
    # ANSI-mode cast errors on non-numeric strings.
    ids = target.select(F.col(id_col).cast("long").alias("__id"))
    cand_parts.append(
        vals.where(is_numeric(F.col(VALUE_COL)))
        .join(
            broadcast(ids),
            F.col(VALUE_COL).try_cast("double") == F.col("__id").cast("double"),
            "inner",
        )
        .select(VALUE_COL, F.lit(id_rank).alias("__rank"), "__id")
    )

    exact_cand = cand_parts[0]
    for p in cand_parts[1:]:
        exact_cand = exact_cand.unionByName(p)

    # --- contains (theta) arms -------------------------------------------
    # Each contains arm fires for the values missed by every arm of
    # HIGHER precedence (rank < its own), not by all exact arms: in the
    # reference, searchField $containsi (strategy 2) runs BEFORE the id
    # and common-field $eqi strategies (csv-import.js:521-620), so a
    # value that misses searchField-exact but hits searchField-contains
    # must resolve to the contains hit even when a lower-precedence exact
    # arm also matches. min(struct(rank, id)) arbitrates across arms, so
    # a candidate surviving from a later contains arm can never shadow an
    # earlier one — the anti-join below only bounds the theta-join size.
    if contains:
        theta_parts = []
        for rank, fld in contains:
            higher_hits = (
                exact_cand.where(F.col("__rank") < rank).select(VALUE_COL).distinct()
            )
            missed = vals.join(higher_hits, VALUE_COL, "left_anti")
            theta_parts.append(
                missed.join(
                    broadcast(
                        target.select(
                            F.lower(F.col(fld).cast("string")).alias("__k"),
                            F.col(id_col).cast("long").alias("__id"),
                        )
                    ),
                    F.col("__k").contains(F.lower(F.col(VALUE_COL))),
                    "inner",
                ).select(VALUE_COL, F.lit(rank).alias("__rank"), "__id")
            )
        for p in theta_parts:
            exact_cand = exact_cand.unionByName(p)

    return (
        exact_cand.groupBy(VALUE_COL)
        .agg(F.min(F.struct("__rank", "__id")).alias("__best"))
        .select(VALUE_COL, F.col("__best.__id").alias(RESOLVED_COL))
    )


def resolve_relation(
    df: DataFrame,
    field_name: str,
    ct: ContentType,
    target: DataFrame,
    target_ct: ContentType,
    registry: Registry,
    *,
    search_field: str | None = None,
    dot_col: str | None = None,
    id_col: str = "id",
    row_key: str = "__row",
) -> DataFrame:
    """J2/J3/J4: replace ``field_name`` on ``df`` with resolved FK id(s).

    - dot-notation value column (J4) takes precedence over the direct one
      (csv-import.js:450-459);
    - scalar relations -> long id, miss -> null (reference deletes the
      key, csv-import.js:471 — null is the columnar equivalent);
    - multi relations -> array of ids in input token order, misses
      dropped; all-missed -> null (csv-import.js:475-493).
    """
    attr = ct.attributes[field_name]
    has_dot = dot_col is not None and dot_col in df.columns
    has_direct = field_name in df.columns
    if has_dot and has_direct:
        src = F.coalesce(F.col(f"`{dot_col}`"), F.col(field_name))
    elif has_dot:
        src = F.col(f"`{dot_col}`")
    else:
        src = F.col(field_name)

    if attr.is_multi_relation:
        work = df.withColumn("__tokens", split_trim(src))
        exploded = work.select(
            F.col(row_key), F.posexplode_outer("__tokens").alias("__pos", VALUE_COL)
        )
        mapping = resolve_values(
            exploded.select(VALUE_COL), target, target_ct, registry,
            search_field=search_field, id_col=id_col,
        )
        resolved = (
            exploded.join(mapping, VALUE_COL, "left")
            .groupBy(row_key)
            .agg(
                F.array_compact(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("__pos", RESOLVED_COL))
                        ),
                        lambda s: s[RESOLVED_COL],
                    )
                ).alias("__ids")
            )
            .select(
                row_key,
                F.when(F.size("__ids") > 0, F.col("__ids")).alias(field_name),
            )
        )
        out = work.drop("__tokens", field_name).join(resolved, row_key, "left")
    else:
        work = df.withColumn(VALUE_COL, src)
        mapping = resolve_values(
            work.select(VALUE_COL), target, target_ct, registry,
            search_field=search_field, id_col=id_col,
        )
        out = (
            work.join(mapping, VALUE_COL, "left")
            .drop(VALUE_COL)
            .withColumn(field_name, F.col(RESOLVED_COL))
            .drop(RESOLVED_COL)
        )
    if dot_col and dot_col in df.columns:
        out = out.drop(dot_col)
    return out


def resolve_all_relations(
    df: DataFrame,
    ct: ContentType,
    registry: Registry,
    targets: dict[str, DataFrame],
    *,
    mapping: dict | None = None,
    row_key: str = "__row",
    id_cols: dict[str, str] | None = None,
) -> DataFrame:
    """processRelations analog (csv-import.js:433-513): resolve every
    relation attribute of ``ct`` present on ``df``; ``targets`` maps
    content-type name -> dimension DataFrame."""
    out = df
    for fname, attr in ct.attributes.items():
        if attr.type != "relation" or attr.target not in targets:
            continue
        dot_col = None
        search_field = None
        if mapping:
            for m in mapping.values():
                if m.is_valid and m.is_dot_notation and not m.is_component and m.field == fname:
                    dot_col = dot_storage_col(m)
                    search_field = m.relation_field
                    break
        if fname not in out.columns and (dot_col is None or dot_col not in out.columns):
            continue
        out = resolve_relation(
            out, fname, ct, targets[attr.target], registry.get(attr.target),
            registry, search_field=search_field, dot_col=dot_col,
            id_col=(id_cols or {}).get(attr.target, "id"), row_key=row_key,
        )
    return out
