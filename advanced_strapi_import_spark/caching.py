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
_SHARED_RELEASERS: list[Callable[[], None]] = []


def persist_tracked(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() + enroll for the next :func:`release_tracked` sweep."""
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to free
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
