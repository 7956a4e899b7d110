"""SparkSession construction with scale-oriented defaults.

The reference executes eagerly on one thread with no partitioning
(``codes.py:21`` onward).  This engine instead declares lazy DataFrame plans
and relies on Catalyst + AQE; the session defaults below are the knobs that
matter at cluster scale and are harmless in local mode:

- AQE on (runtime coalescing, skew-join splitting) — at 100 TB the static
  shuffle-partition count is always wrong for some stage; AQE fixes it.
- ``spark.sql.session.timeZone=UTC`` — pins event-time semantics so weekly /
  monthly bucketing is reproducible across machines (and matches DuckDB's
  naive-timestamp reading of the same parquet).
- Arrow enabled — every pandas interchange (createDataFrame/toPandas and all
  pandas UDFs) is batch-columnar, not row-pickled.
"""

from __future__ import annotations

import os
import warnings
import weakref

from pyspark.sql import SparkSession

# Runtime-settable confs that query functions may re-assert on a session the
# caller (e.g. the verify driver) constructed without our builder.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    # The driver fixtures store events.ts as parquet TIMESTAMP(NANOS), which
    # Spark cannot read natively; read as long and convert in the loader.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let AQE change the OUTPUT partitioning of cached plans (default false
    # for plan-reuse conservatism).  The dedup/similarity family persists
    # its shingle/banded/edge intermediates, and with this off the cache-
    # materialization stages keep the static shuffle-partition count while
    # everything else coalesces — measured on pipeline_corpus_curation at
    # sf0.1: median 5.3 s (spikes to 10.9) → stable 4.5 s.  Results are
    # partition-layout invariant by house rule (tests/
    # test_partition_invariance.py), so the physical change is observable
    # only as speed.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # Conservative AUTO-broadcast thresholds, both static and AQE-runtime.
    # Every size signal Spark's automatic decisions read is COMPRESSED —
    # parquet file stats for the static planner, shuffle block sizes for
    # AQE — and text-derived relations (docs, shingles, token arrays,
    # exploded or not) dictionary-compress 20-40×, so a "≤64 MB" side can
    # be a multi-GB in-memory build.  The r7 sf10 probe OOMed exactly this
    # way THREE times: static plan broadcasting a 58 MB-on-disk corpus
    # derivation, AQE broadcasting a 51 MB-compressed array relation, AQE
    # broadcasting the exploded verify rows.  4 MB × ~40× worst-case
    # expansion ≈ 160 MB build — safe on any sane executor.  Known-small
    # dimension joins are UNAFFECTED: the house rule broadcasts dims with
    # an explicit F.broadcast() hint (plan-tested), which ignores both
    # thresholds; genuinely tiny unhinted sides (≤4 MB compressed) still
    # auto-broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(4 * 1024 * 1024),
    "spark.sql.adaptive.autoBroadcastJoinThreshold": str(4 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # r14 (opt): PySpark 4's DataFrame-debugging hook walks a Python
    # traceback and makes an extra py4j round trip on EVERY DataFrame API
    # call to enrich error messages with the Python call site (~3 ms/call;
    # measured 0.65 s of the 1.33 s plan-construction time of
    # dedup_lsh_verified alone).  That cost is pure single-threaded DRIVER
    # time, paid per query build at every scale and every core count —
    # exactly the serial fraction that caps scale-out.  Error behavior is
    # unchanged except the message no longer names the Python line.
    # NB: pyspark caches this flag per process at the FIRST wrapped call,
    # so it must be set before any DataFrame op; get_spark() sessions get
    # it at build, and apply_runtime_confs() asserts it early (every
    # loader runs it) for driver-owned sessions.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
}


#: Shared by the signature default and the reuse-warning comparison below —
#: two hardcoded copies could drift, making every default-argument call
#: warn spuriously (r10 review).
_DEFAULT_APP_NAME = "cdc-wastewater-analysis-ml-spark"


def get_spark(
    app_name: str = _DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    Reuse is conf-preserving: when a session is already live (a caller's
    notebook, the verify driver, a composed pipeline), only the
    result-affecting RUNTIME_CONFS are asserted on it — ``app_name``,
    ``master`` and ``shuffle_partitions`` are defaults for a session this
    call CREATES, never overrides of one the caller owns.  The previous
    ``builder.getOrCreate()``-only form silently re-applied every builder
    conf onto a live session (``getOrCreate`` sets them as runtime confs),
    so embedding the CLI in an existing session renamed it and reset its
    shuffle parallelism — observed as an order-dependent plan change in the
    test suite (a 32-partition leak re-shuffling an 8-bucket store side).
    """
    # A session created in another thread is reusable but not "active" in
    # this one; builder.getOrCreate() below would find and clobber it, so
    # fall back to Spark's process-wide instantiated-session handle.
    active = SparkSession.getActiveSession() or getattr(
        SparkSession, "_instantiatedSession", None  # private; absent on Connect
    )
    if active is not None:
        try:
            alive = active.sparkContext._jsc is not None
        except Exception:  # Spark Connect: no sparkContext, but live if listed
            alive = True
        if alive:
            # Reuse drops any explicitly-passed build args by design — but
            # silently, which strands a caller who asked for different
            # parallelism (r9 ADVICE).  Warn when a NON-DEFAULT request
            # differs from what the live session actually runs.
            requested = {
                "spark.sql.shuffle.partitions": (
                    None if shuffle_partitions is None else str(shuffle_partitions)
                ),
                "spark.master": master,
                # app_name defaults to a concrete string rather than None:
                # only a caller who CHANGED it asked for anything (r10
                # review — the third silently-dropped build arg).
                "spark.app.name": (
                    app_name if app_name != _DEFAULT_APP_NAME else None
                ),
            }
            for conf, want in requested.items():
                if want is None:
                    continue
                try:
                    have = active.conf.get(conf)
                except Exception:  # conf unreadable (Connect) — nothing to compare
                    continue
                if have != want:
                    warnings.warn(
                        f"get_spark: reusing the live SparkSession, ignoring "
                        f"explicit {conf}={want!r} (session has {have!r}); "
                        "stop the session first to rebuild with new settings",
                        RuntimeWarning,
                        stacklevel=2,
                    )
            apply_runtime_confs(active)
            return active
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    apply_runtime_confs(spark)
    return spark


#: Sessions already asserted — ``spark.conf.set`` is one py4j round trip per
#: conf, and the table loaders call :func:`apply_runtime_confs` on EVERY
#: load, so re-asserting the same values cost ~40 round trips of serial
#: driver time per query build (r15 opt).  Weak identity keys: a new wrapper
#: for the same JVM session (e.g. foreachBatch micro-batches) just misses
#: and re-applies — the pre-memo behavior, never stale.
_RUNTIME_CONFS_APPLIED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def apply_runtime_confs(spark: SparkSession) -> None:
    """Assert the runtime-settable confs on an externally built session.

    Safe/idempotent: only touches confs that can change after JVM start.
    Called by the table loaders so driver-owned sessions get deterministic
    time-zone and AQE behavior too.  Applied once per session object —
    nothing in the engine mutates these confs afterwards, so one assertion
    pins them for the session's lifetime.
    """
    try:
        if spark in _RUNTIME_CONFS_APPLIED:
            return
    except TypeError:  # pragma: no cover - unhashable session type
        pass
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static on some builds
            pass
    try:
        _RUNTIME_CONFS_APPLIED.add(spark)
    except TypeError:  # pragma: no cover - weakref/hash unsupported
        pass
