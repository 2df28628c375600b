"""Structured Streaming operators over the events table.

The reference has no streaming semantics (SURVEY §2.8: its only
incremental notion is write batching). This module adds the streaming
faces the engine needs at fleet scale:

  - file-source ingest (``readStream``; maxFilesPerTrigger is the
    batch_size analog of csv-import.js:363)
  - watermarked tumbling-window aggregation (late data tolerated up to
    the watermark)
  - gap sessionization as a custom stateful operator
    (applyInPandasWithState — the one place Python state is genuinely
    required)
  - ``run_available_now``: drain all available input and stop — gives
    the streaming plan a deterministic batch-equivalent answer, which
    the `stream_events_hourly` query checks against the same DuckDB
    oracle as the batch version.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

# footer-probe results per (directory, glob): the probe is a batch read
# of parquet footers only, but repeated stream constructions (two sides
# of a join, bench re-runs) shouldn't re-pay even that.
_TS_TYPE_CACHE: dict[tuple[str, str, float], T.DataType] = {}


# ---------------------------------------------------------------------------
# drain-scoped shuffle sizing (shared by every foreachBatch drain)
# ---------------------------------------------------------------------------
from contextlib import contextmanager


@contextmanager
def drain_conf(spark: SparkSession, *, state_partitions: int | None = None):
    """Cap ``spark.sql.shuffle.partitions`` for the lifetime of an
    availableNow drain, restoring the session value afterwards — the
    foreachBatch twin of run_available_now's ``state_partitions`` knob
    (r01: per-partition store/task fixed cost dominates short drains).
    Each micro-batch's inner jobs are ordinary batch jobs planned under
    the session conf, so without this every per-batch partial
    aggregation schedules a full-width exchange over rows that fit in
    kilobytes. Changes ONLY fixed cost, never results. A long-lived
    production stream should size this to its per-batch volume instead
    (``None`` keeps the session setting untouched)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(state_partitions)
        )
    try:
        yield
    finally:
        if state_partitions:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


# ---------------------------------------------------------------------------
# batch_id-keyed parquet state (the scale-safe keyed-state store)
# ---------------------------------------------------------------------------
def _state_dir(prefix: str) -> str:
    """Fresh state directory reaped at interpreter exit. The returned
    DataFrames of the stateful streams read these paths lazily, so the
    directories cannot be deleted when the drain returns."""
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def _live_gen(table_dir: str) -> tuple[int, str]:
    """(generation number, generation dir) of the store's LIVE
    generation, creating ``gen=0`` on first use. Compaction (round 9)
    publishes a new generation and swaps the ``_gen`` marker with one
    atomic replace — the unit of atomicity for the whole store."""
    import os
    import shutil

    mk = os.path.join(table_dir, "_gen")
    g = 0
    if os.path.exists(mk):
        with open(mk) as f:
            g = int(f.read())
    # reap superseded generations BELOW the marker (round-10 ADVICE
    # fix): a crash between the marker swap and the old generation's
    # rmtree used to strand gen=<g-1> forever, accumulating stale
    # parquet across restarts of a long-lived store. Generations ABOVE
    # the marker are NOT touched here — a freshly-renamed gen=<g+1>
    # exists legitimately in the instant before compaction's marker
    # swap; its orphan case is reaped pre-rename in
    # _compact_batch_state. Best-effort: a failure never blocks reads.
    try:
        for p in os.listdir(table_dir):
            if p.startswith("gen=") and int(p[4:]) < g:
                shutil.rmtree(
                    os.path.join(table_dir, p), ignore_errors=True
                )
    except (OSError, ValueError):
        pass
    d = os.path.join(table_dir, f"gen={g}")
    os.makedirs(d, exist_ok=True)
    return g, d


def _compacted_upto(gen_dir: str) -> int:
    """Highest batch_id folded into this generation's snapshot
    partition (-1 if the generation carries no snapshot). Replayed
    micro-batches at or below this id must SKIP even though their
    per-batch partition no longer exists."""
    import os

    p = os.path.join(gen_dir, "_upto")
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        return int(f.read())


def _commit_batch_state(df: DataFrame, table_dir: str, batch_id: int) -> bool:
    """Two-phase batch_id-keyed commit (the idempotent_batch_sink
    discipline): write to ``_tmp_<id>``, one atomic rename to
    ``batch_id=<id>`` inside the live generation. A replayed
    micro-batch (foreachBatch is at-least-once) finds its directory
    already committed — or its id already folded into the compaction
    snapshot — and SKIPS, so the store never double-counts; readers
    never observe a half-written batch. Returns False when the batch
    was already committed.

    This is the single-node face of the production keyed-state store
    (Delta/Iceberg MERGE keyed on batch_id): state lives in executor-
    written files, the driver holds only paths — no per-batch collect,
    no unbounded Python lists, so user/key cardinality never lands on
    the driver heap."""
    import os
    import shutil

    _, gd = _live_gen(table_dir)
    if batch_id <= _compacted_upto(gd):
        return False  # replayed batch, already folded into the snapshot
    final = os.path.join(gd, f"batch_id={batch_id}")
    if os.path.exists(final):  # replayed batch: already committed
        return False
    tmp = os.path.join(gd, f"_tmp_{batch_id}")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    # one file per committed batch: every caller commits KB-sized
    # partials (rollup/sketch/histogram rows), and the store is re-read
    # per serving pass — shuffle-partition-many near-empty files per
    # batch multiply both the commit and every later listing/open for
    # zero benefit at any scale (guide §6 small-files). A store whose
    # per-batch partials are NOT driver-small should write uncoalesced
    # via its own sink instead of this helper.
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.rename(tmp, final)
    return True


def _read_batch_state(
    spark: SparkSession, table_dir: str, schema: T.StructType
) -> DataFrame:
    """Read the accumulated batch_id-keyed store back as one DataFrame
    (the partition column ``batch_id`` is available to latest-wins
    dedup; a compaction snapshot reads back as its high-water batch
    id); empty store → empty frame with the declared schema."""
    import os

    _, gd = _live_gen(table_dir)
    parts = [p for p in os.listdir(gd) if p.startswith("batch_id=")]
    if not parts:
        return spark.createDataFrame(
            [],
            T.StructType(
                list(schema.fields)
                + [T.StructField("batch_id", T.LongType())]
            ),
        )
    return spark.read.option("basePath", gd).parquet(
        *(os.path.join(gd, p) for p in parts)
    )


# Compaction threshold: a drain re-reads the store's partitions on
# every serving read, and a long-running stream commits one partition
# per micro-batch — unbounded, that is O(batches) listing+open cost
# per read (the round-8 VERDICT scale caveat). Folding every
# _COMPACT_EVERY batches bounds the live partition count while the
# per-compaction cost stays O(|merged state|), which for these stores
# (weekly sketches, hourly rollups, type-pair matrices) is tiny.
_COMPACT_EVERY = 16


def _compact_batch_state(
    spark: SparkSession,
    table_dir: str,
    schema: T.StructType,
    merge_fn,
    *,
    threshold: int = _COMPACT_EVERY,
) -> bool:
    """Fold the live generation's ``batch_id=`` partitions into ONE
    snapshot partition once ``threshold`` have accumulated (round 9,
    VERDICT r8 task 6 — generalizes the transition-matrix carry's
    pruning to every batch_id-keyed store).

    ``merge_fn(store_df) -> df`` must collapse the store (which
    carries the ``batch_id`` column) back to the declared ``schema``
    with merge semantics matching the serving read: re-aggregate for
    decomposable partials (sums, HLL unions), latest-wins for keyed
    upserts. The snapshot keeps the high-water batch id, so
    latest-wins ordering against FUTURE batches is preserved.

    Crash safety is generation-swap (the Delta checkpoint pattern):
    the merged snapshot materializes fully inside ``gen=<g+1>`` (built
    under ``_gen_tmp`` + one rename), and only then does one atomic
    ``_gen`` marker replace make it live; a crash at any point leaves
    either the old generation fully intact or the new one fully live
    — never a mix, never a double-count. The superseded generation is
    reaped best-effort after the swap. Returns True when a compaction
    ran."""
    import os
    import shutil

    g, gd = _live_gen(table_dir)
    # reap marker-swap tmps stranded by a crash between their write and
    # the os.replace (the live _gen is intact; the strands are garbage).
    # Names are unique per publish and the reap is age-gated so a
    # CONCURRENT compactor's in-flight tmp is never deleted (round-12
    # ADVICE, same hazard as the LSH index meta publish).
    from advanced_strapi_import_spark.operators.similarity import (
        _reap_stale_tmps,
    )

    _reap_stale_tmps(table_dir, "_gen.tmp")
    parts = [p for p in os.listdir(gd) if p.startswith("batch_id=")]
    if len(parts) < threshold:
        return False
    hwm = max(int(p.split("=", 1)[1]) for p in parts)
    merged = merge_fn(
        _read_batch_state(spark, table_dir, schema)
    ).select(list(schema.fieldNames()))
    tmp = os.path.join(table_dir, "_gen_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    # snapshot state is small (merged aggregates); one file per store
    merged.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, f"batch_id={hwm}")
    )
    with open(os.path.join(tmp, "_upto"), "w") as f:
        f.write(str(hwm))
    # a crash between the rename below and the marker swap leaves a
    # complete-but-unreferenced gen=<g+1> dir; the marker still points
    # to g, so that orphan is garbage — reap it or this rename (and
    # with it every future compaction) would fail forever
    nxt = os.path.join(table_dir, f"gen={g + 1}")
    shutil.rmtree(nxt, ignore_errors=True)
    os.rename(tmp, nxt)
    import uuid as _uuid

    mk_tmp = os.path.join(
        table_dir, f"_gen.tmp.{os.getpid()}.{_uuid.uuid4().hex}"
    )
    with open(mk_tmp, "w") as f:
        f.write(str(g + 1))
    os.replace(mk_tmp, os.path.join(table_dir, "_gen"))  # the swap
    shutil.rmtree(gd, ignore_errors=True)
    return True


def _events_schema(ts_type: T.DataType) -> T.StructType:
    """events schema with the physically-stored ts type plugged in.
    File-source streams require an explicit schema; the ts encoding has
    shipped both as TIMESTAMP(NANOS) (reads as long under nanosAsLong)
    and timestamp[us] (reads as TIMESTAMP_NTZ), so we probe the footer
    via a batch read and declare what is actually there."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(
    spark: SparkSession, directory: str, *, glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over ``directory`` (the streaming source needs
    a directory base path; ``glob`` selects the table files). ts is
    normalized to a session-tz TIMESTAMP whatever the file encoding
    (see _events_schema)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import os

    import glob as globmod

    path = f"{directory}/{glob}"
    # cache keyed by max mtime over the files the pattern matches: a
    # regenerated file with the OTHER ts encoding must re-probe, or the
    # declared schema corrupts reads (getmtime on a wildcard path would
    # raise and silently disable invalidation)
    def _mtime(p: str) -> float:
        try:
            return os.path.getmtime(p)
        except OSError:  # deleted between glob and stat
            return -1.0

    matches = sorted(globmod.glob(path))
    mtime = max((_mtime(p) for p in matches), default=-1.0)
    # the FILESET is part of the key too: regeneration that preserves
    # timestamps (cp -p / rsync -a) or removes the newest file would
    # leave max-mtime unchanged and serve a stale declared schema
    key = (directory, glob, tuple(matches), mtime)
    if key not in _TS_TYPE_CACHE:
        _TS_TYPE_CACHE[key] = (
            spark.read.parquet(path).schema["ts"].dataType
        )
    probed = _TS_TYPE_CACHE[key]
    reader = (
        spark.readStream.schema(_events_schema(probed)).option("pathGlobFilter", glob)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.format("parquet").load(directory)
    from advanced_strapi_import_spark.plans.registry import normalize_ts

    return normalize_ts(df, probed)


def hourly_agg(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling 1-hour window per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def chained_window_agg(
    events: DataFrame, *, watermark: str = "1 hour"
) -> DataFrame:
    """TWO chained stateful window aggregations in one streaming plan
    (Spark 3.4+ multi-stateful-operator support): a 10-minute tumbling
    count per event type, re-aggregated — via ``window_time`` on the
    first window — into per-hour rollups (total, peak 10-min slot,
    active slot count). The production shape for multi-resolution
    rollup maintenance: the fine windows feed dashboards, the coarse
    re-aggregation runs in the SAME query over the in-flight windows
    instead of a second job re-reading the sink.

    Append-mode only (the first aggregation must finalize a 10-min
    window before the second may fold it in), so emission is
    watermark-gated: after an availableNow drain with a no-data batch,
    exactly the hour windows with ``window.end <= max(ts) - delay``
    have emitted (boundary measured INCLUSIVE on Spark 4.1); callers
    draining for a batch-parity check must restrict the oracle to that
    region. State is bounded by open windows x event types at both
    levels."""
    op1 = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w10"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        op1.groupBy(
            F.window(F.window_time("w10"), "1 hour").alias("wh"),
            "event_type",
        )
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.max("n").cast("long").alias("max_10min_n"),
            F.count(F.lit(1)).cast("long").alias("n_slots"),
        )
        .select(
            F.date_format(F.col("wh.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
            "n_events",
            "max_10min_n",
            "n_slots",
        )
    )


def session_window_agg(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked NATIVE session windows on a stream — Spark merges
    per-key windows dynamically as events arrive and emits a session
    only once the watermark passes its close (append mode), so state
    is bounded by open sessions per user, not history. The drained
    stream equals the batch session_window answer
    (events_session_window's lag+cumsum-equivalent oracle)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss")
             .alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss")
             .alias("session_last"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_last", "n_events")
    )


def ohlc_agg(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Watermarked 5-minute OHLC bars — the streaming face of
    events_ohlc_bars. open/close are min_by/max_by over the
    (ts, event_id) struct (deterministic, declarative — legal inside a
    streaming aggregation, unlike ordered window functions), so the
    drained stream equals the batch first/last-in-bar answer."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.round(F.expr("min_by(value, struct(ts, event_id))"), 2)
             .alias("open"),
            F.round(F.expr("max_by(value, struct(ts, event_id))"), 2)
             .alias("close"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max("value"), 2).alias("high"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            "event_type",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
             .alias("bar_start"),
            "open", "close", "low", "high", "n",
        )
    )


def run_available_now(
    result: DataFrame, *, output_mode: str = "complete",
    state_partitions: int | None = 4,
    no_data_batch: bool = False,
    update_key: list[str] | None = None,
) -> DataFrame:
    """Drain all available input through the streaming plan into a
    memory sink; return the materialized result (deterministic — equal
    to the batch answer once the stream is drained).

    Two drain-scoped knobs (both restored after the drain; neither
    changes the result, only fixed cost — r01's stream tail was 12.8 s
    combined, these plus plan warming cut it to ~5 s):

    - ``state_partitions`` caps the stateful-operator partition count:
      each state partition costs a store open + delta-file commit per
      micro-batch, which dominates short drains (r01 paid 32 stores x 2
      join sides for a 20-row result). Pinned per-query at first
      checkpoint, so a long-lived production stream should size it to
      throughput instead (``None`` keeps the session setting).
    - ``update_key``: REQUIRED for correct update-mode drains over
      multi-batch sources. The memory sink APPENDS each micro-batch's
      updated rows (it does not upsert), so without it a 2-batch drain
      returns stale intermediate rows next to final ones. With
      update_key the drain goes through foreachBatch and keeps each
      key's row from the LATEST batch — the real final state. (A
      single-batch source gives equal results either way; the keyed
      path is the safe default for update mode.)
    - ``no_data_batch=False`` skips the trailing empty micro-batch
      (~0.9 s: the full stateful plan re-runs on zero rows to advance
      the watermark and evict state). Safe for a drain-and-stop run
      whose output is emitted in the data batch — complete-mode aggs,
      in-batch append (dedup, inner stream-stream join). Keep it True
      for queries whose OUTPUT is watermark-gated (append-mode window
      aggs, timeout-flushed sessionizers on a live stream)."""
    spark = result.sparkSession
    name = f"mem_{uuid.uuid4().hex[:12]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_ndb = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    spark.conf.set(
        "spark.sql.streaming.noDataMicroBatches.enabled",
        "true" if no_data_batch else "false",
    )
    try:
        if output_mode == "update" and update_key:
            # latest-batch-wins, computed DISTRIBUTED: each micro-batch's
            # updated rows commit to a batch_id-keyed parquet store (never
            # the driver), then one window keeps each key's row from the
            # latest batch. Key cardinality never touches the driver heap.
            from pyspark.sql.window import Window

            store_dir = _state_dir("upd_drain_")
            out_cols = [f.name for f in result.schema.fields]
            rn = F.row_number().over(
                Window.partitionBy(*update_key).orderBy(
                    F.col("batch_id").desc()
                )
            )

            def _latest_wins(store: DataFrame) -> DataFrame:
                return (
                    store.withColumn("__rn", rn)
                    .filter(F.col("__rn") == 1)
                    .select(*out_cols)
                )

            def _commit(bdf: DataFrame, bid: int) -> None:
                _commit_batch_state(bdf, store_dir, bid)
                # long-stream hygiene: fold committed partitions into a
                # latest-wins snapshot so per-drain read cost stays flat
                _compact_batch_state(
                    bdf.sparkSession, store_dir, result.schema,
                    _latest_wins,
                )

            q = (
                result.writeStream.foreachBatch(_commit)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return _latest_wins(
                _read_batch_state(spark, store_dir, result.schema)
            )
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if state_partitions:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_ndb
        )
    # Materialize small results and drop the sink: memory-sink tables
    # live in the driver until explicitly dropped, so a suite that
    # drains hundreds of streams would otherwise accumulate them all.
    # Large drains (full-table append passes) stay as the sink table —
    # round-tripping them through Python rows would cost more than the
    # sink holds.
    out = spark.table(name)
    if out.count() <= 20_000:
        rows, schema = out.collect(), out.schema
        spark.catalog.dropTempView(name)
        return spark.createDataFrame(rows, schema)
    return out


def stream_upsert(
    stream: DataFrame,
    engine,
    ct_name: str,
    key: str,
    *,
    available_now: bool = True,
):
    """Streaming MERGE sink: each micro-batch upserts into the engine's
    table via foreachBatch — the streaming face of the reference's
    batched import loop (csv-import.js:362-409), with the batch size
    controlled by the source trigger instead of a row counter."""
    from advanced_strapi_import_spark.operators.upsert import dedupe_batch, merge

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        # deterministic pick per key (dropDuplicates keeps whichever
        # row a partition sees first — rerunning the same drain could
        # persist different values); last-write-wins by __row when the
        # batch carries one, else a deterministic struct order
        from advanced_strapi_import_spark.operators.validate import ROW_COL

        deduped = dedupe_batch(batch_df, key, order_col=ROW_COL)
        if engine.has_table(ct_name):
            engine.write_table(ct_name, merge(engine.table(ct_name), deduped, key).merged)
        else:
            engine.write_table(ct_name, deduped)

    writer = stream.writeStream.foreachBatch(sink).outputMode("update")
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


# ---------------------------------------------------------------------------
# custom stateful operator: gap sessionization
# ---------------------------------------------------------------------------
SESSION_STATE_SCHEMA = "last_ts long, session_seq long, start_ts long, n long"
SESSION_OUT_SCHEMA = (
    "user_id long, session_seq long, start_ts long, end_ts long, n_events long"
)


def sessionize_stream(
    events: DataFrame, *, gap_minutes: int = 30, watermark: str = "2 hours",
    use_timeout: bool = False,
) -> DataFrame:
    """applyInPandasWithState sessionizer: emits a row per session closed
    by a later event; with ``use_timeout`` (live streams) idle sessions
    also flush on processing-time timeout. Keep timeouts OFF for
    drain-and-stop (availableNow) runs — a pending timeout keeps the
    query waiting."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        rows = []
        if state.exists:
            last_ts, seq, start_ts, n = state.get
        else:
            last_ts, seq, start_ts, n = None, 0, None, 0
        if state.hasTimedOut:
            if n:
                rows.append((user_id, seq, start_ts, last_ts, n))
            # keep a (tiny) tombstone carrying the seq counter instead
            # of remove(): a removed state would restart session_seq at
            # 0 for the user's next event, re-emitting an identifier an
            # earlier, different session already used — a downstream
            # MERGE keyed on (user_id, session_seq) would overwrite it
            state.update((None, seq, None, 0))
            if use_timeout:
                state.setTimeoutDuration(600_000)
        else:
            ts_list = []
            for pdf in pdfs:
                ts_list.extend(int(t.value) // 1000 for t in pd.to_datetime(pdf["ts"]))
            for t in sorted(ts_list):
                if last_ts is None or t - last_ts > gap_us:
                    if n:
                        rows.append((user_id, seq, start_ts, last_ts, n))
                    seq += 1
                    start_ts, n = t, 0
                n += 1
                last_ts = t
            state.update((last_ts, seq, start_ts, n))
            if use_timeout:
                state.setTimeoutDuration(60_000)
        yield pd.DataFrame(
            rows, columns=["user_id", "session_seq", "start_ts", "end_ts", "n_events"]
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if use_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def dedup_stream(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: state-backed dropDuplicatesWithinWatermark
    keyed on event_id — the streaming face of operators/dedup.exact_dedup.
    The watermark bounds the dedup state (keys older than it are
    evicted), which is what makes exactly-once dedup feasible on an
    unbounded stream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stateful_user_totals(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """CUSTOM stateful operator via applyInPandasWithState: per-user
    running (count, total) kept in an explicit GroupState and re-emitted
    every micro-batch — the escape hatch for stateful logic Spark's
    built-in operators can't express (per-key accumulators, custom
    eviction, decayed counters). State is one (bigint, double) pair per
    user — O(|users|), bounded; NoTimeout because the drain harness
    stops the query once input is exhausted (ProcessingTimeTimeout
    would keep the query alive forever on an availableNow drain).
    Arrow-batched: each group arrives as pandas chunks, no per-row
    Python."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        # raw total out; rounding happens JVM-side (F.round HALF_UP —
        # python round() is banker's and could disagree with the oracle)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
            }
        )

    out = (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType="user_id bigint, n_events bigint, total_value double",
            stateStructType="n bigint, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return out.withColumn("total_value", F.round("total_value", 2))


def purchase_after_view_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream inner join: purchases within 30 minutes after a
    view by the same user. Both sides carry watermarks so Spark can
    bound the join state (view rows expire once no purchase within the
    time range can still arrive)."""
    return _view_purchase_join(views, purchases, "inner")


# ---------------------------------------------------------------------------
# streaming incremental dedup (stream of new docs vs stored corpus bands)
# ---------------------------------------------------------------------------
def read_documents_stream(
    spark: SparkSession, directory: str, *, glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over the documents table; schema probed from
    the parquet footer (file-source streams require one explicitly)."""
    schema = spark.read.parquet(f"{directory}/{glob}").schema
    reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format("parquet").load(directory)


def incremental_dedup_stream(
    corpus_bands: DataFrame, doc_stream: DataFrame,
    *, text_col: str = "text", id_col: str = "id",
) -> DataFrame:
    """Streaming incremental LSH dedup: each arriving micro-batch of
    documents is shingled/banded and joined against the corpus band
    table, then its OWN bands are appended to the corpus so later
    micro-batches dedup against earlier arrivals too. foreachBatch is
    the right tool — the per-batch work is ordinary batch LSH (exactly
    operators/dedup.incremental_band_candidates), which no chain of
    streaming stateful operators could express (signature aggregation
    + band join + distinct is 3 stateful stages).

    At 100 TB the corpus band table is a stored table and the append is
    a table append (Delta/Iceberg or partitioned parquet); here the
    accumulated frame is localCheckpoint'ed per batch so lineage stays
    flat. Candidate pairs are APPENDED to a parquet sink table per
    batch — never collected to the driver — and the sink is read back
    as the returned DataFrame, which is exactly the production shape
    (pairs land in a table; downstream consumers scan it)."""
    import atexit
    import shutil
    import tempfile

    from advanced_strapi_import_spark.caching import checkpoint_tracked
    from advanced_strapi_import_spark.operators import dedup as D

    spark = corpus_bands.sparkSession
    state = {"bands": corpus_bands, "wrote": False}
    # the returned DataFrame reads this path lazily, so it cannot be
    # deleted here — reap it at interpreter exit instead of leaking one
    # directory per invocation
    pairs_path = tempfile.mkdtemp(prefix="dedup_pairs_")
    atexit.register(shutil.rmtree, pairs_path, ignore_errors=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        bb = D.lsh_bands(
            D.minhash_signature(batch_df, text_col, id_col)
        ).transform(checkpoint_tracked)
        pairs = D.incremental_band_candidates(state["bands"], bb)
        pairs.write.mode("append").parquet(pairs_path)
        state["wrote"] = True
        state["bands"] = state["bands"].unionByName(bb)

    q = (
        doc_stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if state["wrote"]:
        return spark.read.parquet(pairs_path)
    id_type = corpus_bands.schema["id"].dataType
    schema = T.StructType(
        [T.StructField("new_id", id_type), T.StructField("dup_of", id_type)]
    )
    return spark.createDataFrame([], schema)


def ann_serve_stream(
    query_stream: DataFrame,
    serve,
    *,
    empty_schema: T.StructType,
) -> DataFrame:
    """Streaming ANN serve from a STORED index: each arriving
    micro-batch of query vectors is answered by ``serve(batch_df)`` —
    ordinary batch ANN against the index (e.g.
    :func:`similarity.lsh_query_index` /
    :func:`similarity.ivf_query_index`), whose scan probes ONLY the
    buckets/cells of the queries in that batch via parquet partition
    pruning — and the top-k results APPEND to a parquet sink table per
    batch, never the driver. This is the online-retrieval maintenance
    shape: the index is built once offline, the serving job is a thin
    always-on stream whose per-batch cost scales with |batch| x
    probed-partition size, not corpus size. foreachBatch is the right
    tool — index probe + top-k is ordinary batch work per batch and no
    stateful streaming operator is involved. The sink is read back as
    the returned DataFrame (drained-run harness; a production serve
    would keep running).

    Exactly-once sink: foreachBatch is at-least-once, so each batch
    writes mode("overwrite") into its OWN ``batch-<id>`` subdirectory —
    a retried micro-batch replaces its earlier (possibly partial)
    output instead of appending duplicates, keeping the stream==batch
    hash oracle exact (same batch_id-keyed idempotency discipline as
    the exactly-once parquet sink in this module)."""
    import atexit
    import shutil
    import tempfile

    spark = query_stream.sparkSession
    out_path = tempfile.mkdtemp(prefix="ann_serve_")
    atexit.register(shutil.rmtree, out_path, ignore_errors=True)
    state = {"wrote": False}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        serve(batch_df).write.mode("overwrite").parquet(
            f"{out_path}/batch-{batch_id:09d}"
        )
        state["wrote"] = True

    q = (
        query_stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if state["wrote"]:
        return spark.read.parquet(f"{out_path}/batch-*")
    return spark.createDataFrame([], empty_schema)


def enrich_with_dim(
    events: DataFrame, dim: DataFrame, on, *, broadcast: bool = True
) -> DataFrame:
    """Stream-static join: enrich a streaming fact with a batch
    dimension. The static side is re-read per micro-batch (so a
    catalog-backed dim picks up slow dimension changes) and — with
    ``broadcast=True`` — shipped as a broadcast-hash map: the stream
    side never shuffles and the join is stateless (no state store,
    no watermark requirement), which is what makes dimension
    enrichment essentially free on a 100 TB/day firehose. Leave
    ``broadcast=False`` for fact-sized "dims" where AQE/static
    planning should pick a shuffled join instead."""
    d = F.broadcast(dim) if broadcast else dim
    return events.join(d, on)


def hll_rollup_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming sketch maintenance: each micro-batch collapses to
    per-week HLL sketches (DataSketches binaries, ~KB each) that
    append to a sketch store; weekly unique-user estimates then come
    from union-merging STORED sketches — raw events are touched
    exactly once, on arrival. This is the streaming twin of
    events_hll_weekly_merge and the 100 TB shape for "live distinct
    counts": the store is a table append (|weeks| x |batches| rows of
    kilobytes), the serving read is a sketch merge, and no state-store
    operator holds per-user state. foreachBatch is the right tool —
    sketch agg + store append is ordinary batch work per arriving
    batch. Sketch rows land in a batch_id-keyed parquet store
    (idempotent two-phase commit — never the driver); the serving read
    union-merges the stored sketches."""
    store_dir = _state_dir("hll_store_")
    schema = T.StructType(
        [
            T.StructField("week", T.StringType()),
            T.StructField("sk", T.BinaryType()),
        ]
    )

    def merge(store: DataFrame) -> DataFrame:
        # sketches are mergeable state: the compacted snapshot is one
        # unioned sketch per week, exactly what the serving read builds
        return store.groupBy("week").agg(F.hll_union_agg("sk").alias("sk"))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        sk = batch_df.groupBy(
            F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias(
                "week"
            )
        ).agg(F.hll_sketch_agg("user_id").alias("sk"))
        _commit_batch_state(sk, store_dir, batch_id)
        _compact_batch_state(batch_df.sparkSession, store_dir, schema, merge)

    q = (
        events_stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = events_stream.sparkSession
    store = _read_batch_state(spark, store_dir, schema)
    return store.groupBy("week").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
    )


def rollup_merge_stream(
    events_stream: DataFrame, *, compact_every: int | None = None
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: each micro-batch
    collapses to PARTIAL (hour, event_type) aggregates that merge into
    a stored rollup table — counts/sums are decomposable, so merge =
    re-aggregate of (stored partials + batch partials), touching
    |rollup| + |batch groups| rows, never historical raw events. This
    is the foreachBatch twin of a MERGE INTO-maintained summary table
    (at scale the store is a catalog table and the merge is
    upsert.merge_catalog_table keyed on the group columns); the serving
    read is the rollup itself. Complete-mode streaming aggs hold the
    same state inside the state store — this variant makes the state a
    TABLE you can query, back up, and bootstrap from batch. Partials
    commit to a batch_id-keyed parquet store (idempotent two-phase
    commit), never the driver heap."""
    store_dir = _state_dir("rollup_store_")
    schema = T.StructType(
        [
            T.StructField("hour", T.StringType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )

    def merge(store: DataFrame) -> DataFrame:
        # counts/sums are decomposable; the snapshot IS the rollup
        return store.groupBy("hour", "event_type").agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_value").alias("sum_value"),
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        p = batch_df.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("hour"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("value").alias("sum_value"),
        )
        _commit_batch_state(p, store_dir, batch_id)
        _compact_batch_state(
            batch_df.sparkSession, store_dir, schema, merge,
            threshold=compact_every or _COMPACT_EVERY,
        )

    q = (
        events_stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = events_stream.sparkSession
    store = _read_batch_state(spark, store_dir, schema)
    return store.groupBy("hour", "event_type").agg(
        F.sum("n").cast("long").alias("n"),
        F.round(F.sum("sum_value"), 2).alias("total_value"),
    )


def idempotent_batch_sink(
    result_stream: DataFrame, table_dir: str, *, checkpoint_dir: str
) -> None:
    """Exactly-once file sink via batch-id idempotence: each micro-batch
    lands in ``table_dir/batch_id=N`` and a batch that already committed
    is SKIPPED on replay — together with Spark's checkpointed offsets
    this upgrades foreachBatch's at-least-once contract to exactly-once
    for any sink that can key on the batch id (files, MERGE with a
    batch-id audit column, JDBC upsert on (key, batch_id)).

    Commit protocol per batch: write to ``_tmp_<id>``, then one atomic
    directory rename to ``batch_id=<id>`` — readers never observe a
    half-written batch, and a crash between write and rename leaves only
    a ``_tmp`` dir that the retry overwrites. The partitioned layout
    doubles as the audit trail (which batch produced which rows)."""
    import os
    import shutil

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        final = os.path.join(table_dir, f"batch_id={batch_id}")
        if os.path.exists(final):  # replayed batch: already committed
            return
        tmp = os.path.join(table_dir, f"_tmp_{batch_id}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        batch_df.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, final)

    q = (
        result_stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _view_purchase_join(
    views: DataFrame, purchases: DataFrame, how: str
) -> DataFrame:
    """Shared stream-stream join body: watermarked view/purchase sides
    joined on (same user, purchase within 30 min after the view)."""
    v = views.withWatermark("ts", "2 hours").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.withWatermark("ts", "2 hours").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
        how,
    )


def view_purchase_left_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream LEFT OUTER join: every view, matched to purchases
    within 30 minutes — or emitted with nulls once the watermark proves
    no purchase can still arrive. Outer results are watermark-DRIVEN:
    the null row for an unmatched view only materializes when the
    watermark passes view_ts + 30min, so state stays bounded AND the
    "never converted" rows do eventually emit — the funnel-drop-off
    shape computed inside the stream."""
    return _view_purchase_join(views, purchases, "leftOuter")


def view_purchase_full_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream FULL OUTER join: the left-outer funnel shape PLUS
    null-view rows for purchases no view preceded (attribution gaps —
    a purchase with no tracked view within its 30-minute lookback).
    Both sides' state is watermark-evicted: an unmatched purchase
    emits its null row once the watermark passes the latest view time
    that could still match it, so state stays bounded exactly as in
    the inner/left variants."""
    return _view_purchase_join(views, purchases, "fullOuter")


_PREV_STATE_PROVIDER: str | None = None
_DEFAULT_STATE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)


def restore_state_store_provider(spark: SparkSession) -> None:
    """Undo tws_user_type_counts' session-wide RocksDB provider switch
    once its stream has been drained."""
    prev = _PREV_STATE_PROVIDER
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        prev if prev else _DEFAULT_STATE_PROVIDER,
    )


def tws_user_type_counts(events_stream: DataFrame) -> DataFrame:
    """Custom stateful operator on the MODERN API
    (transformWithStateInPandas, Spark 4 arbitrary stateful v2): each
    user's per-event-type counts live in a keyed MapState — the
    composite-state shape the older applyInPandasWithState GroupState
    can't express without serializing a whole dict per update. State is
    per-key + per-map-entry in RocksDB, so a 100 TB keyspace pages
    through the store instead of living on the heap; emits one
    (user_id, event_type, n) row per touched entry per batch (Update
    mode), which a downstream MERGE folds into a serving table.

    Requires the ``protobuf`` package (the transformWithState Python
    protocol speaks protobuf to the JVM); absent in this container, so
    the operator is exercised by an import-gated test and the
    equivalent GroupState operator (stateful_user_totals) carries the
    oracle-checked query."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )

    class TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "counts", "event_type string", "n long"
            )

        def handleInputRows(self, key, rows, timerValues):
            uid = key[0]
            batch: dict[str, int] = {}
            for pdf in rows:
                for et, c in pdf.groupby("event_type").size().items():
                    batch[et] = batch.get(et, 0) + int(c)
            out = []
            for et, c in batch.items():
                prev = (
                    self._counts.getValue((et,))[0]
                    if self._counts.containsKey((et,))
                    else 0
                )
                total = prev + c
                self._counts.updateValue((et,), (total,))
                out.append((uid, et, total))
            yield pd.DataFrame(
                out, columns=["user_id", "event_type", "n"]
            )

        def close(self) -> None:
            pass

    spark = events_stream.sparkSession
    # transformWithState REQUIRES the RocksDB provider at run time, so
    # the conf must be live when the caller starts the stream — but it
    # must not leak into every later stateful query in the session
    # (HDFS-backed is the default elsewhere, and environments without
    # the native RocksDB provider would break). Remember the prior
    # value so restore_state_store_provider() can undo this after the
    # drain; the in-repo caller (tests) does exactly that.
    global _PREV_STATE_PROVIDER
    _PREV_STATE_PROVIDER = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    return (
        events_stream.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=TypeCounts(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


# HDR-histogram bucketing shared by the stream sink and the serving
# read: integer cents collapse to the value with all but the top 7
# significant bits zeroed — log2-ranged buckets, relative width <=
# 2^-6 (~1.6%), and the whole expression is integer ops (bin/shift),
# so the DuckDB oracle reproduces it bit-exactly.
_HDR_REP = (
    "shiftleft(shiftright(cents, greatest(0, length(bin(cents)) - 7)),"
    " greatest(0, length(bin(cents)) - 7))"
)


def hdr_quantile_stream(
    events_stream: DataFrame, percentiles: tuple[float, ...] = (0.5, 0.95, 0.99)
) -> DataFrame:
    """Streaming quantile serving via a MERGEABLE HDR-style histogram
    (round 10): each micro-batch collapses its events to partial
    (event_type, bucket) counts — buckets are log2-ranged with 7
    significant bits, so the store is bounded at ~64*64 rows per type
    regardless of data volume — committed to the batch_id-keyed
    parquet store (idempotent two-phase commit, compacted every 16
    batches). The serving read merges counts and answers any
    percentile from the cumulative histogram: the returned value is a
    bucket lower bound within 2^-6 relative error of the true
    quantile, and — unlike a GK sketch — the bucketing is pure integer
    arithmetic, so the drained stream answer is HASH-EXACT against a
    batch oracle computing the same histogram. This is the
    latency-percentile-dashboard shape at 100 TB/day: per-batch cost
    is one tiny partial agg, serving reads kilobytes, and histograms
    merge associatively across days/regions."""
    store_dir = _state_dir("hdr_store_")
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("rep", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def merge(store: DataFrame) -> DataFrame:
        return store.groupBy("event_type", "rep").agg(
            F.sum("n").cast("long").alias("n")
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        p = (
            batch_df.select(
                "event_type",
                F.round(F.col("value") * 100).cast("long").alias("cents"),
            )
            .groupBy("event_type", F.expr(_HDR_REP).alias("rep"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        _commit_batch_state(p, store_dir, batch_id)
        _compact_batch_state(batch_df.sparkSession, store_dir, schema, merge)

    q = (
        events_stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = events_stream.sparkSession
    from pyspark.sql.window import Window

    m = (
        _read_batch_state(spark, store_dir, schema)
        .groupBy("event_type", "rep")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("rep").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("event_type")
    cum = m.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(wt)
    )
    aggs = [F.max("total").cast("long").alias("n")]
    for p in percentiles:
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(F.lit(p) * F.col("total")),
                    F.col("rep"),
                )
            ).cast("long").alias(f"p{int(p * 100)}_rep")
        )
    return cum.groupBy("event_type").agg(*aggs)


def psi_drift_stream(
    events_stream: DataFrame, ref: DataFrame, mid_us: int
) -> DataFrame:
    """Streaming drift monitor: the REFERENCE bucket histogram (events
    up to ``mid_us``, computed batch-side once — the 'training
    snapshot') broadcasts to the serve; the CURRENT histogram is
    maintained incrementally — each micro-batch collapses its
    post-``mid_us`` events to partial (event_type, bucket) counts that
    merge into a stored rollup (the rollup_merge_stream discipline:
    counts are decomposable, the store never re-reads raw events).
    The serving read full-outer-joins stored current counts with the
    reference and computes the SAME add-one-smoothed PSI formula as
    the batch events_value_psi — identical exact-integer counts in,
    identical doubles out, so the stream==batch twin is hash-exact.
    At 100 TB the store is a catalog table keyed on (type, bucket) —
    tens of rows per model — and the monitor costs one partial agg
    per arriving batch; partials commit to a batch_id-keyed parquet
    store (idempotent two-phase commit), never the driver heap."""
    store_dir = _state_dir("psi_store_")
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("bucket", T.IntegerType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def merge(store: DataFrame) -> DataFrame:
        return store.groupBy("event_type", "bucket").agg(
            F.sum("n").cast("long").alias("n")
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        cur = batch_df.filter(F.unix_micros(F.col("ts")) > F.lit(mid_us))
        p = cur.groupBy(
            "event_type",
            F.least(
                F.floor(F.col("value") / 50.0).cast("int"), F.lit(9)
            ).alias("bucket"),
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
        _commit_batch_state(p, store_dir, batch_id)
        _compact_batch_state(batch_df.sparkSession, store_dir, schema, merge)

    q = (
        events_stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = events_stream.sparkSession
    cur = (
        _read_batch_state(spark, store_dir, schema)
        .groupBy("event_type", "bucket")
        .agg(F.sum("n").cast("long").alias("n_cur"))
    )
    halves = (
        ref.join(cur, ["event_type", "bucket"], "full_outer")
        .select(
            "event_type",
            "bucket",
            F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
            F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
        )
    )
    tot = halves.groupBy("event_type").agg(
        F.sum("n_ref").cast("long").alias("t_ref"),
        F.sum("n_cur").cast("long").alias("t_cur"),
    )
    p_cur = (F.col("n_cur") + 1.0) / (F.col("t_cur") + 10)
    p_ref = (F.col("n_ref") + 1.0) / (F.col("t_ref") + 10)
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (
        halves.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.sum(term), 4).alias("psi"),
            (F.round(F.sum(term), 4) > 0.2).alias("drifted"),
        )
    )


def transition_matrix_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming Markov transition matrix with CROSS-BATCH state: the
    lag() that the batch query runs over full per-user history cannot
    see across micro-batch boundaries, so each user's LAST event
    (ts, event_id, type) is carried as keyed state into the next
    batch — the carry rows join the batch, the per-user window
    computes prev_type over carry+batch, and only non-carry rows emit
    transitions (a carry row's own transition was counted when it was
    live). Requires arrivals to be time-ordered ACROSS batches (file
    slices ordered by ts — the registry query manufactures exactly
    that; an out-of-order source needs the watermarked as-of variant).
    State and per-batch partials are |users| / |types|^2 rows — both
    live in KEYED PARQUET TABLES maintained inside foreachBatch (the
    idempotent_batch_sink discipline): the per-user carry is a
    versioned table rewritten per batch (one join+overwrite — at
    100 TB a MERGE into a Delta/Iceberg keyed table or
    transformWithState), the transition partials commit to a
    batch_id-keyed store. The driver holds only PATH STRINGS — no
    per-batch collect, no Python-list state, so user cardinality
    never lands on the driver heap."""
    import os

    from pyspark.sql.window import Window

    carry_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    partials_dir = _state_dir("trans_partials_")
    carry_dir = _state_dir("trans_carry_")
    # driver-held state is ONE PATH, not data: which carry version is live
    carry_path: dict[str, str | None] = {"cur": None}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        new_carry = os.path.join(carry_dir, f"v{batch_id}")
        if os.path.exists(new_carry):  # replayed batch: already committed
            carry_path["cur"] = new_carry
            return
        batch = batch_df.select(
            "user_id", "event_type", "ts", "event_id"
        ).withColumn("__carry", F.lit(False))
        if carry_path["cur"]:
            carry = spark.read.parquet(carry_path["cur"])
        else:
            carry = spark.createDataFrame([], carry_schema)
        u = batch.unionByName(carry.withColumn("__carry", F.lit(True)))
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        seq = u.select(
            "user_id",
            "event_type",
            "__carry",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        trans = (
            seq.filter(
                (~F.col("__carry")) & F.col("prev_type").isNotNull()
            )
            .groupBy("prev_type", F.col("event_type").alias("next_type"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        _commit_batch_state(trans, partials_dir, batch_id)
        best = (
            u.groupBy("user_id")
            .agg(F.max(F.struct("ts", "event_id", "event_type")).alias("b"))
            .select(
                "user_id",
                F.col("b.event_type").alias("event_type"),
                F.col("b.ts").alias("ts"),
                F.col("b.event_id").alias("event_id"),
            )
        )
        # two-phase: write the new carry version, atomic rename, THEN
        # repoint — a crash mid-write leaves the old version live
        tmp = os.path.join(carry_dir, f"_tmp_{batch_id}")
        best.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, new_carry)
        prev = carry_path["cur"]
        carry_path["cur"] = new_carry
        # prune the superseded version: keeping every per-batch
        # snapshot would grow disk O(batches x |users|). The version
        # just replaced is safe to drop AFTER the repoint (the
        # crash-mid-write window only ever needs the currently-live
        # one, which the rename above just published); a replayed
        # batch short-circuits before reaching here.
        if prev:
            import shutil

            shutil.rmtree(prev, ignore_errors=True)

    q = (
        events_stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = events_stream.sparkSession
    schema = T.StructType(
        [
            T.StructField("prev_type", T.StringType()),
            T.StructField("next_type", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    store = (
        _read_batch_state(spark, partials_dir, schema)
        .groupBy("prev_type", "next_type")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    tot = store.agg(F.sum("n").cast("long").alias("t"))
    return store.crossJoin(F.broadcast(tot)).select(
        "prev_type",
        "next_type",
        "n",
        F.expr("n * 1000000 div t").cast("long").alias("share_ppm"),
    )
