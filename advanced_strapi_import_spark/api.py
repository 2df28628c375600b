"""The engine's user-facing verbs — SURVEY.md §2.10.

One function per reference endpoint (/root/reference/server/routes/
index.js:3-67), re-expressed as an embeddable Python API over parquet
table storage:

    GET  /content-types      -> Engine.list_content_types
    POST /preview/:ct        -> Engine.preview_csv        (L2: 10 rows)
    POST /upload/:ct         -> Engine.validate_csv       (L1: 5 rows)
    POST /upload-zip         -> Engine.ingest_zip
    POST /upload-media-zip   -> Engine.ingest_media_zip
    POST /import/:ct         -> Engine.import_csv         (§3.1 pipeline)
    POST /export/:ct         -> Engine.export_csv         (L4: 1000 rows)

The import pipeline is ONE lazy plan end to end (csv scan -> validate ->
FK resolve -> components -> media match -> merge); actions happen only
at the final write and the counter aggregation.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from advanced_strapi_import_spark.operators import components as C
from advanced_strapi_import_spark.operators import export as X
from advanced_strapi_import_spark.operators import media as M
from advanced_strapi_import_spark.operators import resolve as R
from advanced_strapi_import_spark.operators import upsert as U
from advanced_strapi_import_spark.operators import validate as V
from advanced_strapi_import_spark.schema import Registry
from advanced_strapi_import_spark.sources import zip_source as Z
from advanced_strapi_import_spark.sources.csv_source import csv_scan, preview


# Reference file limits (/root/reference/README.md "File Limits":
# max 10MB, CSV only; UI check admin/src/components/PluginPage.js:73-82).
MAX_CSV_BYTES = 10 * 1024 * 1024


def check_csv_file(path: str) -> None:
    """Reject non-.csv and >10MB inputs with the reference's error
    surface before any Spark plan is built."""
    if not path.lower().endswith(".csv"):
        raise ValueError("Please select a valid CSV file")
    if os.path.exists(path) and os.path.getsize(path) > MAX_CSV_BYTES:
        raise ValueError("Maximum file size: 10MB")


@dataclass
class Engine:
    spark: SparkSession
    registry: Registry
    storage_root: str
    _media: dict[str, DataFrame] = field(default_factory=dict)

    # -- storage ---------------------------------------------------------
    def _path(self, ct_name: str) -> str:
        return os.path.join(self.storage_root, ct_name)

    def table(self, ct_name: str, *, fmt: str = "parquet") -> DataFrame:
        """Read a stored table. ``fmt`` selects the storage format —
        parquet (default), orc, or json (JSONL); all three are
        splittable columnar/line formats Spark scans in parallel with
        pushdown (parquet/orc) or schema inference capped by the
        stored schema (json)."""
        if fmt == "parquet":
            return self.spark.read.parquet(self._path(ct_name))
        return self.spark.read.format(fmt).load(self._path(ct_name))

    def write_table(
        self, ct_name: str, df: DataFrame, *,
        batch_size: int | None = None, fmt: str = "parquet",
    ) -> None:
        """Atomic swap-write: when the plan being written READS the same
        table (upsert merge), a direct overwrite would delete its own
        input mid-scan. Write to a temp dir, then swap (the non-Delta
        MERGE fallback from SURVEY §4).

        ``batch_size`` is the reference's write-batching knob
        (csv-import.js:363, default 100 rows/insert batch) mapped to
        its Spark analog: maxRecordsPerFile caps rows per output file."""
        path = self._path(ct_name)
        writer = df.write.mode("overwrite").format(fmt)
        if batch_size:
            writer = writer.option("maxRecordsPerFile", batch_size)
        if os.path.exists(path):
            import shutil

            tmp = path + ".__tmp__"
            writer.save(tmp)
            shutil.rmtree(path)
            os.rename(tmp, path)
        else:
            writer.save(path)

    def has_table(self, ct_name: str) -> bool:
        return os.path.exists(self._path(ct_name))

    def compact_table(
        self, ct_name: str, *, target_file_bytes: int = 128 * 1024 * 1024
    ) -> int:
        """Small-file compaction: rewrite the table so each parquet file
        is ~``target_file_bytes``. Incremental sinks (batched imports,
        streaming foreachBatch upserts) accrete small files; at scale
        that degrades scans (footer/open cost per file, tiny row
        groups) and the fix is a periodic rewrite — the parquet-dir
        analog of Delta OPTIMIZE / Iceberg rewrite_data_files.

        File count = ceil(bytes / target); the rewrite is one
        round-robin repartition (no key, no skew), reusing the atomic
        swap so readers never see a half-compacted table. Returns the
        new file count."""
        import math

        path = self._path(ct_name)
        total = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )
        n_files = max(1, math.ceil(total / target_file_bytes))
        self.write_table(ct_name, self.table(ct_name).repartition(n_files))
        return n_files

    # -- verbs -----------------------------------------------------------
    def list_content_types(self) -> list[dict[str, str]]:
        """GET /content-types (controllers/csv-import.js:7-20)."""
        return self.registry.list_tables()

    def preview_csv(self, path: str, ct_name: str) -> dict:
        """POST /preview/:ct — headers + 10 rows + schema attribute names
        (controllers/csv-import.js:113-124)."""
        check_csv_file(path)
        df = csv_scan(self.spark, path)
        out = preview(df, 10)
        out["attributes"] = list(self.registry.get(ct_name).attributes)
        return out

    def validate_csv(
        self, path: str, ct_name: str, *, error_cap: int = 10_000
    ) -> dict:
        """POST /upload/:ct — validation report + 5-row preview
        (controllers/csv-import.js:25-84).

        The per-row error report is DRIVER-BOUNDED (VERDICT r10 item 2):
        the reference returns every row error in the HTTP response,
        which is fine under its 10 MB upload cap, but a pathological
        batch that is mostly invalid must not drive an unbounded
        ``collect()`` — only the first ``error_cap`` invalid ROWS ship
        their error strings; ``invalidRows`` stays the exact full count
        and ``errorsTruncated`` flags the capped case (the complete
        invalid-row frame remains available distributed via
        :func:`validate.validate_df` for side-table writes)."""
        check_csv_file(path)
        ct = self.registry.get(ct_name)
        res = V.validate_df(csv_scan(self.spark, path), ct, self.registry)
        # four consumers (invalid collect, preview, two counts) would
        # otherwise each re-run the CSV scan + validation projection
        cached = res.all.persist()
        try:
            invalid = (
                res.invalid.select(V.ROW_COL, V.ERRORS_COL)
                .limit(error_cap).collect()
            )
            total = cached.count()
            valid_rows = res.valid.count()
            return {
                "errors": res.schema_errors
                + [e for r in invalid for e in r[V.ERRORS_COL]],
                "warnings": res.warnings,
                "preview": [r.asDict() for r in res.valid.limit(5).collect()],
                "totalRows": total,
                "validRows": valid_rows,
                "invalidRows": total - valid_rows,
                "errorsTruncated": total - valid_rows > len(invalid),
            }
        finally:
            cached.unpersist()

    def ingest_zip(self, path: str, media_field: str) -> DataFrame:
        """POST /upload-zip (S8): flat unzip -> files table."""
        files = Z.hygiene_filter(Z.zip_entries(self.spark, path, skip_corrupt=True))
        # corrupt-archive marker rows are a side signal, not media files:
        # stored they would inflate counts and join as matchable names
        files = files.filter(F.col("name") != "__CORRUPT__")
        files = files.dropDuplicates(["name", "entry_path"]).withColumn(
            "mime", M.mime_type(F.col("name"))
        )
        self._media[media_field] = files
        return files

    def ingest_media_zip(self, path: str, ct_name: str, match_field: str) -> DataFrame:
        """POST /upload-media-zip (S9): foldered unzip -> routed files.

        Folder names route case-insensitively onto the content type's
        media attributes (the zip router lowercases folder names, so a
        camelCase attribute like ``coverImage`` would otherwise never
        match import_csv's case-sensitive attribute check)."""
        ct = self.registry.get(ct_name)
        by_lower = {a.lower(): a for a in ct.attributes}
        routed = Z.media_files(self.spark, path)
        for row in routed.select("field").distinct().collect():
            fld = by_lower.get(row["field"].lower(), row["field"])
            self._media[fld] = routed.filter(F.col("field") == row["field"])
        return routed

    def import_csv(
        self,
        path: str,
        ct_name: str,
        *,
        upsert: bool = False,
        upsert_field: str = "id",
        media_match_field: str | None = None,
        strict: bool = False,
        batch_size: int | None = None,
        error_cap: int = 10_000,
    ) -> dict[str, Any]:
        """POST /import/:ct — the §3.1 flagship pipeline.

        ``error_cap`` bounds the strict-mode error collect the same way
        as :meth:`validate_csv` — see there."""
        check_csv_file(path)
        ct = self.registry.get(ct_name)
        res = V.validate_df(csv_scan(self.spark, path), ct, self.registry)
        # the scan+validate subtree feeds n_invalid, the error collect,
        # the merge counters AND the table write — cache it once
        res.all.persist()
        try:
            return self._import_csv_body(
                res, ct, ct_name,
                upsert=upsert, upsert_field=upsert_field,
                media_match_field=media_match_field, strict=strict,
                batch_size=batch_size, error_cap=error_cap,
            )
        finally:
            res.all.unpersist()

    def _import_csv_body(
        self,
        res: V.ValidationResult,
        ct,
        ct_name: str,
        *,
        upsert: bool,
        upsert_field: str,
        media_match_field: str | None,
        strict: bool,
        batch_size: int | None,
        error_cap: int = 10_000,
    ) -> dict[str, Any]:
        n_invalid = res.invalid.count()
        if res.schema_errors or (strict and n_invalid):
            capped = (
                res.invalid.select(V.ERRORS_COL).limit(error_cap).collect()
            )
            return {
                "created": 0, "updated": 0,
                "errors": res.schema_errors
                + [e for r in capped for e in r[V.ERRORS_COL]],
                "errorsTruncated": n_invalid > len(capped),
            }

        df = res.valid
        targets = {
            a.target: self.table(a.target)
            for a in ct.attributes.values()
            if a.type == "relation" and a.target and self.has_table(a.target)
        }
        df = R.resolve_all_relations(
            df, ct, self.registry, targets, mapping=res.mapping, row_key=V.ROW_COL
        )

        for fld, files in self._media.items():
            if media_match_field and fld in ct.attributes:
                if fld in df.columns:
                    # a CSV header with the media field's name (e.g. a
                    # round-tripped export) would otherwise collide with
                    # match_media's out_col -> duplicate column at write
                    df = df.drop(fld)
                df = M.match_media(
                    df, files, media_match_field, row_key=V.ROW_COL, out_col=fld
                )

        # build component structs from their validated dot columns
        # (csv-import.js:664-676 componentData): single components only —
        # repeatable components have no CSV header convention in the
        # reference either
        for fld, attr in ct.attributes.items():
            if attr.type != "component" or attr.repeatable:
                continue
            cols = {
                m.component_field: V.dot_storage_col(m)
                for m in res.mapping.values()
                if m.is_component and m.field == fld and m.component_field
                and V.dot_storage_col(m) in df.columns
            }
            if cols:
                df = C.build_single_component(
                    df, fld, self.registry.components[attr.component], cols
                )

        # keep ROW_COL through the merge: it is the "last write wins" order
        # for duplicate upsert keys (reference processes rows sequentially)
        df = df.drop(*[c for c in df.columns if c.startswith("__dot__")])

        if upsert and self.has_table(ct_name):
            result = U.merge(self.table(ct_name), df, upsert_field, order_col=V.ROW_COL)
            counters = result.counters.collect()[0]
            self.write_table(ct_name, result.merged, batch_size=batch_size)
            created, updated = counters["created"], counters["updated"]
        else:
            df = df.drop(V.ROW_COL)
            created = df.count()
            updated = 0
            if self.has_table(ct_name):
                self.write_table(
                    ct_name,
                    self.table(ct_name).unionByName(df, allowMissingColumns=True),
                    batch_size=batch_size,
                )
            else:
                self.write_table(ct_name, df, batch_size=batch_size)
        return {"created": created, "updated": updated, "invalidRows": n_invalid}

    def export_csv(
        self,
        ct_name: str,
        out_path: str,
        *,
        filters: dict[str, Any] | None = None,
        limit: int = 1000,
        order_by: str | None = None,
        stats_out: dict[str, Any] | None = None,
    ) -> DataFrame:
        """POST /export/:ct — populate + flatten + CSV write (§3.3).

        Pass ``stats_out={}`` to receive ``{"n_rows": N}`` measured by
        a CollectMetrics observation riding the write job itself — a
        ``count()`` after the fact would re-execute the whole
        populate/flatten pipeline as a second pass (joins included),
        which is the difference between one scan and two at 100 TB."""
        ct = self.registry.get(ct_name)
        df = self.table(ct_name)
        for k, v in (filters or {}).items():
            df = df.filter(F.col(k) == F.lit(v))
        # row_key must uniquely identify rows, NEVER the order_by sort
        # column: grouping the exploded FKs by a non-unique value would
        # merge different rows' display lists into each other. Tables
        # without an id column get a synthetic unique key for the
        # flatten joins, dropped before the write.
        row_key = "id"
        if row_key not in df.columns:
            row_key = "__xid"
            df = df.withColumn(row_key, F.monotonically_increasing_id())
        for fname, attr in ct.attributes.items():
            if attr.type != "relation" or fname not in df.columns:
                continue
            if not self.has_table(attr.target):
                continue
            tgt = self.table(attr.target)
            tct = self.registry.get(attr.target)
            if attr.is_multi_relation:
                df = X.flatten_multi_relation(df, fname, tgt, tct, row_key=row_key)
            else:
                df = X.flatten_scalar_relation(df, fname, tgt, tct)
        if row_key == "__xid":
            df = df.drop("__xid")
        for fname, attr in ct.attributes.items():
            # media columns are array<bigint> of file ids; the CSV writer
            # rejects arrays, so export them the way multi-relations
            # export: ', '-joined ids, NULL when unset
            if attr.type == "media" and fname in df.columns:
                df = df.withColumn(
                    fname,
                    F.when(
                        F.col(fname).isNotNull() & (F.size(fname) > 0),
                        F.array_join(
                            F.transform(fname, lambda x: x.cast("string")), ", "
                        ),
                    ),
                )
        for fname, attr in ct.attributes.items():
            if attr.type == "component" and fname in df.columns:
                if attr.repeatable:
                    df = X.flatten_repeatable_component(df, fname)
                else:
                    df = X.flatten_single_component(df, fname)
        df = X.drop_metadata(df)
        if order_by and order_by in df.columns:
            df = df.orderBy(order_by)
        df = df.limit(limit)
        obs = None
        if stats_out is not None:
            from pyspark.sql import Observation

            obs = Observation()
            df = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
        X.write_csv(df, out_path)
        if obs is not None:
            stats_out.update(obs.get)
        return df

    # -- SQL surface -----------------------------------------------------
    def sql(
        self, query: str, *, fmt: str = "parquet", args: dict | None = None
    ) -> DataFrame:
        """Run ANSI SQL over the engine's stored content types: every
        table under ``storage_root`` registers as a temp view named
        after its content type, then the query plans through Catalyst
        exactly like the DataFrame API (same pushdown, same AQE). The
        reference exposes filtered REST reads (`/content-types/.../
        export` filters); this is the superset surface a warehouse
        user expects — arbitrary joins/aggregates over the same
        governed tables, no copies.

        ``args`` binds named parameter markers (``:name``) via Spark's
        parameterized SQL — values travel as typed literals, never
        spliced into the query text, so a caller-supplied filter value
        cannot change the query's structure (the injection-safe path
        the reference's querystring filters map onto)."""
        import os as _os

        for name in sorted(_os.listdir(self.storage_root)):
            p = _os.path.join(self.storage_root, name)
            if _os.path.isdir(p):
                try:
                    self.table(name, fmt=fmt).createOrReplaceTempView(name)
                except Exception:
                    continue  # non-table dirs (checkpoints, tmp) skip
        if args:
            return self.spark.sql(query, args=args)
        return self.spark.sql(query)
