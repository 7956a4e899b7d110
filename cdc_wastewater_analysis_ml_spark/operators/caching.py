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
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def _safe_unpersist(cached: tuple[DataFrame, ...]) -> None:
    for df in cached:
        try:
            df.unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass


def scoped_persist(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Unpersist ``cached`` (already-persisted intermediates of ``result``)
    when the returned DataFrame handle is garbage-collected."""
    weakref.finalize(result, _safe_unpersist, cached)
    return result
