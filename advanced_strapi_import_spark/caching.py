"""Run-scoped persist tracking.

Several operators persist an intermediate frame that is read more than
once inside a single query (simhash fingerprints before the bucketed
self-join, embedding vectors before candidate scoring). A long-lived
session that runs hundreds of such queries — the bench suite, a
notebook, a multi-job pipeline — would otherwise accumulate every one
of those persisted frames in storage memory: Spark's unified memory
manager can evict *cached* blocks under execution pressure, but the
eviction + recompute churn shows up as multi-x slowdowns late in a
suite, and localCheckpoint blocks are not evictable at all.

Protocol:
  - operators call :func:`persist_tracked` instead of ``df.persist()``
    for any persist whose useful life is ONE query execution;
  - harnesses (bench, driver sim, pipeline runners) call
    :func:`release_tracked` after consuming each query's result;
  - modules that keep deliberately session-scoped caches (the shared
    shingle/band frames of the dedup family) register a releaser via
    :func:`register_shared_releaser`; :func:`release_all` drops those
    too (end of suite / between phases).

Single-query users never need to call anything — an unreleased tracked
persist behaves exactly like the plain ``persist()`` it replaces.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_CHECKPOINTED: list[DataFrame] = []
_SHARED_RELEASERS: list[Callable[[], None]] = []

#: Session conf switch: when "true" AND a checkpoint directory is
#: configured (``sc.setCheckpointDir``), :func:`checkpoint_tracked`
#: uses a RELIABLE ``checkpoint()`` (replicated to the checkpoint
#: store, survives executor loss) instead of ``localCheckpoint()``
#: (executor-local blocks — fast, but an executor loss or
#: dynamic-allocation scale-down mid-query is unrecoverable because
#: the lineage was truncated by design). Local mode keeps the default:
#: there is one "executor" and its loss is the application's.
RELIABLE_CHECKPOINT_CONF = "spark.graft.checkpoint.reliable"


def checkpoint_tracked(df: DataFrame, *, eager: bool = True) -> DataFrame:
    """Lineage-truncating materialization for loop/multi-consumer
    frames, with the cluster-mode escape hatch above.

    Default is ``localCheckpoint(eager=...)`` — the standard choice for
    iterative graph loops (blocks are executor-local and unreplicated).
    With ``RELIABLE_CHECKPOINT_CONF=true`` it becomes a reliable
    ``checkpoint()``; that requires ``sc.setCheckpointDir`` or this
    raises (silently falling back would betray the operator's explicit
    durability request).

    The returned frame is enrolled in a tracking list that
    :func:`release_tracked` clears. Unlike persisted frames,
    checkpointed blocks can NOT be evicted or safely unpersisted here —
    the truncated lineage cannot recompute them — so the sweep only
    drops this module's references; the blocks themselves are reclaimed
    by Spark's ContextCleaner once the JVM-side RDD is unreferenced.
    Long-lived sessions that drain many checkpoint-based queries should
    force a GC sweep between queries (``gc.collect()`` +
    ``spark._jvm.System.gc()`` — bench.py's protocol) or the
    non-evictable blocks accumulate in storage memory."""
    spark = df.sparkSession
    try:
        reliable = (
            str(spark.conf.get(RELIABLE_CHECKPOINT_CONF, "false")).lower()
            == "true"
        )
    except Exception:
        reliable = False
    if reliable:
        if spark.sparkContext.getCheckpointDir() is None:
            raise ValueError(
                f"{RELIABLE_CHECKPOINT_CONF}=true but no checkpoint "
                "directory is set — call sc.setCheckpointDir() (reliable "
                "checkpoints must land in fault-tolerant storage)"
            )
        out = df.checkpoint(eager=eager)
    else:
        out = df.localCheckpoint(eager=eager)
    _CHECKPOINTED.append(out)
    return out


def persist_tracked(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() + enroll for the next :func:`release_tracked` sweep."""
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame; returns how many were released.
    Checkpointed frames (see :func:`checkpoint_tracked`) cannot be
    unpersisted — their truncated lineage cannot recompute the blocks —
    so the sweep drops this module's references to them and leaves
    reclamation to the ContextCleaner (callers that need the memory
    back deterministically must GC-sweep, as bench.py does)."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to free
    _CHECKPOINTED.clear()
    return n


def register_shared_releaser(fn: Callable[[], None]) -> None:
    _SHARED_RELEASERS.append(fn)


def release_all() -> int:
    """Release per-query persists AND session-scoped shared caches."""
    n = release_tracked()
    for fn in _SHARED_RELEASERS:
        try:
            fn()
            n += 1
        except Exception:
            pass
    return n
