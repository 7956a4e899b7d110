"""Data-layout operators: multi-dimensional clustering keys (Z-order),
clustered parquet writes, and file-level min/max manifests for scan pruning.

The reference reads one CSV into one pandas frame (codes.py:21-26) — data
layout is a non-problem at that scale.  At 100 TB it is THE problem: a
parquet scan prunes row groups / files by their min-max stats, and those
stats are only selective if rows with nearby key values are physically
co-located.  Sorting by one column makes that column's stats tight and every
other column's stats useless; interleaving the bits of several bucketed
columns (a Z-order / Morton curve) makes EVERY participating column's
per-file span ~n_files^(-1/k) of its range, so a selective predicate on any
of the k dimensions skips most of the data.  This is the clustering layout
Delta's OPTIMIZE ZORDER BY and Iceberg's sort orders implement; here it is
expressed as plain Catalyst integer arithmetic + ``repartitionByRange``, so
it works on vanilla parquet with no table format.

Everything stays JVM-side: the bucket/interleave math is shiftleft/OR
expressions inside whole-stage codegen (no UDF), the global min/max ranges
join back as one broadcast row, and the only shuffle is the range partition
that any clustered write needs.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "zorder_key",
    "cluster_write",
    "file_minmax_stats",
    "files_touched",
    "compact_small_files",
]


def _bucket(col: Column, cmin: Column, cmax: Column, cells: int) -> Column:
    """Width-bucket ``col`` into ``[0, cells)`` over the ``[cmin, cmax]``
    range: ``floor((v - min) * cells / span)`` clamped at BOTH ends — the
    max value itself lands in cells-1, anything below the declared min in
    cell 0 (with caller-supplied ``ranges`` an out-of-domain value yields a
    negative raw bucket, and shiftright on a negative long sign-extends, so
    an unclamped low end would OR garbage high bits into the Z-key) — and
    to 0 for a degenerate span.  Nulls map to cell 0 (they sort first, same
    as a null-first sort key).  The arithmetic order — subtract, multiply,
    divide — is pinned because the DuckDB oracle mirrors it term for term
    (IEEE doubles agree across engines only for identically-ordered
    operations).
    """
    span = cmax - cmin
    raw = F.floor((col.cast("double") - cmin) * F.lit(float(cells)) / span)
    # Null guard must come BEFORE the clamp: F.least/F.greatest SKIP nulls
    # (they return the extreme of the non-null operands), so
    # least(null_raw, cells-1) would send null values to the TOP cell
    # instead of cell 0.
    cell = F.when(col.isNull() | (span <= F.lit(0.0)), F.lit(0)).otherwise(
        F.least(F.greatest(raw, F.lit(0)), F.lit(cells - 1))
    )
    return cell.cast("long")


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton-interleave ``k`` bucket columns of ``bits`` bits each into one
    LONG: bit ``j`` of bucket ``i`` lands at position ``j*k + (k-1-i)``, so
    column 0 owns the most significant bit of every group.  2*bits*k shift/
    mask terms, all whole-stage-codegen integer ops.
    """
    k = len(buckets)
    z = F.lit(0).cast("long")
    for i, b in enumerate(buckets):
        for j in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(b, j).bitwiseAND(F.lit(1)), j * k + (k - 1 - i))
            )
    return z


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    key_col: str = "__z",
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Append a Z-order clustering key over ``cols`` (each width-bucketed
    into ``2**bits`` cells over its global [min, max], bits interleaved).

    ``ranges`` inlines known per-column (min, max) bounds as literals —
    the production shape, where the ingest pipeline knows its domains and
    the key needs no extra pass.  Without it the ranges come from one tiny
    global aggregate joined back as a broadcast single-row relation, so the
    plan stays lazy and the data is still read once (the agg reads only the
    key columns — column-pruned at the scan).

    At most ``63 // len(cols)`` bits per column (the key is one signed
    LONG).
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits < 1 or bits * len(cols) > 63:
        raise ValueError(
            f"bits={bits} with {len(cols)} columns overflows a signed long "
            f"(max {63 // len(cols)} bits per column)"
        )
    cells = 1 << bits
    if ranges is not None:
        missing = [c for c in cols if c not in ranges]
        if missing:
            raise ValueError(f"ranges missing for columns: {missing}")
        buckets = [
            _bucket(
                F.col(c),
                F.lit(float(ranges[c][0])),
                F.lit(float(ranges[c][1])),
                cells,
            )
            for c in cols
        ]
        return df.withColumn(key_col, _interleave(buckets, bits))
    agg = df.agg(
        *[
            stat
            for c in cols
            for stat in (
                F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
            )
        ]
    )
    joined = df.crossJoin(F.broadcast(agg))
    buckets = [
        _bucket(F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), cells)
        for c in cols
    ]
    out = joined.withColumn(key_col, _interleave(buckets, bits))
    return out.drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])


def cluster_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 16,
    bits: int = 8,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of ``cols``:
    range-partition by the key (→ ``num_files`` files covering disjoint
    z-ranges, i.e. compact spatial tiles) and sort within each partition so
    ROW-GROUP stats inside each file are tight too.  The key column itself
    is dropped before the write — the layout, not the value, is the product.

    One shuffle (the range partition — unavoidable for any clustered
    layout), one pass; at 100 TB this is the nightly OPTIMIZE job whose
    cost is repaid by every subsequent selective scan.
    """
    keyed = zorder_key(df, cols, bits=bits, ranges=ranges)
    (
        keyed.repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_minmax_stats(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file min/max/count manifest for a parquet directory — the
    pruning index a table format (Delta/Iceberg) keeps in metadata, built
    distributedly from the data itself via ``input_file_name()``.

    One scan reading only ``cols``, one groupBy on the file name (cardinality
    = number of files, trivially small relative to the data).  Consulting
    this manifest before planning a box query is file-level pruning for
    plain parquet directories; Spark's own parquet reader applies the same
    stats per ROW GROUP once the files are opened (PushedFilters — plan-
    tested in tests/test_layout.py).
    """
    df = spark.read.parquet(path).select(*cols).withColumn(
        "__file", F.input_file_name()
    )
    aggs = [F.count(F.lit(1)).alias("rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.groupBy("__file").agg(*aggs)


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` from filesystem METADATA (O(files),
    driver-side by design — the same listing any scan does).  Prefers the
    JVM Hadoop FileSystem (works for any hadoop-supported scheme); under
    Spark Connect there is no ``_jvm`` gateway, so degrade to best-effort
    local ``os.walk`` sizing for ``file://`` / bare paths (mirroring the
    release_local_checkpoint best-effort pattern)."""
    try:  # gateway ABSENCE only (Connect raises on the attribute itself)
        jvm = spark._jvm
    except Exception:
        jvm = None
    if jvm is not None:
        # JVM gateway present: use it, and let REAL filesystem errors
        # (missing dir, auth, bad scheme) propagate — falling back to local
        # sizing here would either mask the cause behind a misleading
        # "no gateway" error or, worse, silently size a same-named LOCAL
        # directory and compact to a wrong n_out.
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return int(fs.getContentSummary(jpath).getLength())
    else:
        local = path[len("file://"):] if path.startswith("file://") else path
        if not os.path.isdir(local):
            raise ValueError(
                f"cannot size {path!r}: no JVM filesystem gateway (Spark "
                "Connect?) and the path is not a local directory"
            )
        # skip dotfiles: the Hadoop ChecksumFileSystem hides its .crc
        # sidecars from listings, so getContentSummary never counts them
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _dirs, files in os.walk(local)
            for f in files
            if not f.startswith(".")
        )


def _hashable_cols(df: DataFrame) -> list[str]:
    """Columns whose types ``xxhash64`` accepts — MapType is rejected
    anywhere in a nested type (maps have no canonical element order)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    def has_map(dt) -> bool:
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(has_map(f.dataType) for f in dt.fields)
        return False

    return [f.name for f in df.schema.fields if not has_map(f.dataType)]


def _salt_draw(df: DataFrame, partition_by: list[str]) -> Column:
    """The within-value salt draw for :func:`compact_small_files`'s
    ``partition_by`` path.  The salt must vary WITHIN a hive value (it
    exists to fan a skewed value over several files), so it hashes the
    NON-partition columns only — partition columns are constant inside a
    directory and would make the draw degenerate.  ``xxhash64`` rejects
    MapType (anywhere in a nested type); fall back to a JSON rendering
    of the data columns where none are hashable.  Every branch is
    retry-stable: a non-deterministic draw (the rejected r9
    ``monotonically_increasing_id``) feeding ``repartition()`` re-hashes
    rows to different partitions under task retry — the classic
    duplicate/lost-row shuffle hazard (r9 ADVICE).  The salt only
    spreads placement, so identical rows sharing a slot is fine.

    Extracted (r10 review) so tests can pin the expression per schema
    shape instead of trusting the docstring.
    """
    data_cols = [c for c in df.columns if c not in set(partition_by)]
    hashable = [c for c in _hashable_cols(df) if c not in set(partition_by)]
    if hashable:
        return F.xxhash64(*[F.col(c) for c in hashable])
    if data_cols:
        return F.xxhash64(F.to_json(F.struct(*data_cols)))
    # Partition columns only: rows of a value are IDENTICAL, so no
    # deterministic function of row content can vary within the value —
    # and the case is unreachable for any layout the compaction could
    # write back anyway (Spark's writer rejects partitioning on every
    # column: ALL_PARTITION_COLUMNS_NOT_ALLOWED).  The prior silent
    # F.lit(0) fallback stuffed a skewed value into one single-task file
    # and then died cryptically at the write (r10 review) — fail fast
    # with the real reason instead.
    raise ValueError(
        "compact_small_files: partition_by covers every column — Spark "
        "cannot write a table whose columns are all partition columns "
        "(ALL_PARTITION_COLUMNS_NOT_ALLOWED); keep at least one data "
        "column or drop partition_by"
    )


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_mb: int = 128,
    sort_cols: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``ceil(total_bytes/target)`` files
    of roughly ``target_mb`` each; returns ``n_out``, the output slot count
    the sizing chose.

    Why an operator: incremental ingest (streaming sinks, CDC micro-batches,
    per-delta dedup outputs) accretes thousands of KB-sized files, and at
    100 TB the scan's task-scheduling overhead and the namenode/listing cost
    come to dominate actual I/O — periodic compaction is the standard
    counter-move (Delta OPTIMIZE / Iceberg rewrite_data_files; here for
    plain parquet directories).

    Sizing reads the filesystem metadata (:func:`_dir_bytes`), never the
    data; the rewrite is one ``repartition``-and-write pass.  ``sort_cols``
    re-sorts while compacting (``repartitionByRange`` + in-partition sort),
    folding a clustering pass into the rewrite for free.  Writes to
    ``out_path`` — atomically swapping directories is the caller's (or
    table format's) job; compact-in-place on a live directory is how
    readers see partial data.

    Compacting a hive-partitioned directory REQUIRES ``partition_by``
    (the reader surfaces partition values as ordinary columns, so an
    unpartitioned rewrite would silently flatten the layout and break
    every downstream partition-pruned scan).  Each hive directory then
    receives ≤ ``ceil(n_out · its row share)`` files: rows are hashed on
    (partition value, salt) with the salt range sized PER VALUE from its
    row share, so a skewed value fans out toward ``target_mb`` chunks
    while tiny values stay at one file each.  With ``sort_cols`` too, the
    range key is (partition columns, then sort columns) — clustering by
    partition value FIRST, so each range task spans at most a couple of
    hive values and the directories stay compact; sorting by ``sort_cols``
    alone would hand every task rows of every partition value, and
    ``partitionBy`` would then fragment each directory into up to
    ``n_out`` files — the exact pathology compaction exists to remove.
    """
    if target_mb < 1:
        raise ValueError("target_mb must be >= 1")
    total = _dir_bytes(spark, path)
    n_out = max(1, -(-total // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if sort_cols and partition_by:
        key = [*partition_by, *sort_cols]
        shaped = df.repartitionByRange(n_out, *key).sortWithinPartitions(*key)
    elif sort_cols:
        shaped = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    elif partition_by:
        # Per-VALUE salt slot counts, sized from each value's row share (a
        # partition-columns-only aggregate — no data columns read): a value
        # holding most of the data fans out over ~its share of n_out slots
        # while tiny values stay at one file, and every (value, salt) pair
        # lands wholly in one task.  A global ceil(n_out / n_values)
        # average would leave a skewed value's salt range at 1 and
        # collapse it back into one oversized single-task file — the exact
        # pathology compaction exists to remove.
        counts = df.groupBy(*partition_by).agg(F.count(F.lit(1)).alias("__rows"))
        total = counts.agg(F.sum("__rows").alias("t")).collect()[0]["t"] or 1
        slots = counts.select(
            *partition_by,
            F.greatest(
                F.lit(1),
                F.least(
                    F.lit(n_out),
                    F.ceil(F.lit(n_out) * F.col("__rows") / F.lit(total)),
                ),
            )
            .cast("int")
            .alias("__slots"),
        )
        # NULL partition values are legal (they read back from hive
        # __HIVE_DEFAULT_PARTITION__ dirs as null), and a plain equi-join
        # on the partition columns would silently DROP those rows from the
        # compacted output (r9 ADVICE) — join null-safely (`<=>`) against
        # renamed slot-side keys so null groups keep their slot counts.
        slot_keys = [f"__pv_{c}" for c in partition_by]
        slots_b = F.broadcast(
            slots.select(
                *[
                    F.col(c).alias(k)
                    for c, k in zip(partition_by, slot_keys)
                ],
                "__slots",
            )
        )
        cond = F.lit(True)
        for c, k in zip(partition_by, slot_keys):
            cond = cond & F.col(c).eqNullSafe(F.col(k))
        salted = df.join(slots_b, cond).drop(*slot_keys)
        # Retry-stable within-value draw — expression per schema shape
        # pinned by tests via _salt_draw (r10 review).
        salt = F.pmod(_salt_draw(df, partition_by), F.col("__slots"))
        shaped = salted.repartition(
            n_out, *[F.col(c) for c in partition_by], salt
        ).drop("__slots")
    else:
        shaped = df.repartition(n_out)
    writer = shaped.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_path)
    return int(n_out)


def files_touched(
    stats: DataFrame, box: dict[str, tuple[float, float]]
) -> int:
    """How many files a box predicate must read, per the min/max manifest:
    a file is touched iff its [min, max] interval overlaps the query range
    on EVERY predicated column (stats can only prove absence).  Driver
    scalar by design — the manifest is O(files)."""
    cond = F.lit(True)
    for c, (lo, hi) in box.items():
        cond = cond & (F.col(f"{c}_max") >= F.lit(lo)) & (
            F.col(f"{c}_min") <= F.lit(hi)
        )
    return stats.filter(cond).count()
