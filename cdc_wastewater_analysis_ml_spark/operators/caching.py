"""Cache-lifetime scoping for operator-internal ``persist()`` calls.

Candidate generators (MinHash/SimHash banding, shingle explosion) persist an
intermediate so expensive per-row work (md5 signatures) runs once across the
self-join's two sides.  A bare ``persist()`` leaks: Spark's CacheManager keys
entries by logical plan and never frees them until ``unpersist()`` or session
end, so a long-lived session accumulates dead cached blocks (executor memory
at 100 TB scale).

:func:`scoped_persist` ties each intermediate's cache lifetime to the RESULT
DataFrame instead: a ``weakref.finalize`` on the returned handle unpersists
the intermediates once the caller drops the result.  Correctness is
unaffected either way — persist is purely a perf hint; a re-execution after
release just recomputes the signatures.

**Lifetime contract**: the cache stays live only while the RETURNED handle is
referenced.  A caller that immediately derives a new DataFrame and drops the
handle (``minhash_lsh_candidates(...).distinct()``) releases the pins before
the derived plan ever executes, silently losing the persist benefit — this is
exactly what bit ``dedup_lsh_verified`` in round 3 (2.25× slower: the verify
join recomputed the banded signatures on both sides).  Derivation helpers that
consume a scoped result must therefore call :func:`transfer_cache_scope` to
move ownership onto the DataFrame they return, so the pins follow the plan the
caller will actually execute.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

#: Attribute carrying ``(finalizer, cached_frames)`` on a scoped result handle.
_SCOPE_ATTR = "_scoped_cache_state"


def _safe_unpersist(cached: tuple[DataFrame, ...]) -> None:
    for df in cached:
        try:
            df.unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass


def scoped_persist(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Unpersist ``cached`` (already-persisted intermediates of ``result``)
    when the returned DataFrame handle is garbage-collected.

    If ``result`` already carries scoped pins (e.g. ownership transferred
    from an upstream operator), the new pins are merged into the existing
    scope rather than racing it.
    """
    prior = getattr(result, _SCOPE_ATTR, None)
    if prior is not None:
        fin, existing = prior
        fin.detach()
        cached = tuple(existing) + tuple(c for c in cached if c not in existing)
    fin = weakref.finalize(result, _safe_unpersist, tuple(cached))
    setattr(result, _SCOPE_ATTR, (fin, tuple(cached)))
    return result


def release_local_checkpoint(df: DataFrame) -> None:
    """Free the block-manager storage behind an eager ``localCheckpoint``
    result NOW, instead of waiting for Python→py4j→JVM GC to reclaim it.

    Iterative operators (:func:`~..dedup.connected_components`) checkpoint
    per-round state; without an explicit release every round's blocks stay
    pinned for the run's tail (long chains × busy executors = real memory).
    A checkpointed Dataset's analyzed plan is a ``LogicalRDD`` holding the
    materialized RDD — unpersisting that RDD drops the blocks.

    **Only call on relations nothing will read again**: lineage was
    truncated at checkpoint, so the data is unrecoverable afterwards.
    Best-effort: any failure (Connect-mode DataFrame without ``_jdf``,
    plan-shape drift across Spark versions) degrades to the old
    GC-eventually behavior.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)  # noqa: SLF001
    except Exception:  # noqa: BLE001 — release is an optimization, never load-bearing
        pass


def transfer_cache_scope(src: DataFrame, dst: DataFrame) -> DataFrame:
    """Move cache-scope ownership from ``src`` (an operator result carrying
    scoped pins) onto ``dst`` (a DataFrame derived from it).

    After the transfer, dropping ``src`` no longer releases the caches; they
    live until ``dst`` is dropped.  No-op when ``src`` carries no scope (the
    common case for un-persisted inputs), so derivation helpers can call this
    unconditionally.
    """
    state = getattr(src, _SCOPE_ATTR, None)
    if state is None or src is dst:
        return dst
    fin, cached = state
    fin.detach()
    delattr(src, _SCOPE_ATTR)
    return scoped_persist(dst, *cached)
