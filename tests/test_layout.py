"""Data-layout operators (operators/layout.py): Z-order key math, clustered
writes, file min/max manifests, and the pruning they buy.

The registry gate (layout_zorder_key) hash-verifies the key computation vs
DuckDB; these tests pin the parts a value hash can't see — the bit layout
itself, null/degenerate handling, and the actual file-skipping effect of the
clustered layout vs a single-column sort.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_wastewater_analysis_ml_spark.operators.layout import (
    cluster_write,
    compact_small_files,
    file_minmax_stats,
    files_touched,
    zorder_key,
)


def _morton2(bx: int, by: int, bits: int) -> int:
    """Reference interleave: bit j of col 0 (x) → position 2j+1, col 1 (y)
    → 2j (mirrors layout._interleave's j*k + (k-1-i) map)."""
    z = 0
    for j in range(bits):
        z |= ((bx >> j) & 1) << (2 * j + 1)
        z |= ((by >> j) & 1) << (2 * j)
    return z


def test_zorder_key_known_grid(spark):
    """4×4 grid with pinned ranges: every cell's key equals the hand-computed
    Morton code (mid-cell values so bucketing is unambiguous)."""
    rows = [(x + 0.5, y + 0.5) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = zorder_key(df, ["x", "y"], bits=2, ranges={"x": (0, 4), "y": (0, 4)})
    got = {(r.x, r.y): r["__z"] for r in out.collect()}
    for x in range(4):
        for y in range(4):
            assert got[(x + 0.5, y + 0.5)] == _morton2(x, y, 2)


def test_zorder_key_max_value_lands_in_top_cell(spark):
    """v == max must clamp into cells-1, not overflow into a new cell."""
    df = spark.createDataFrame([(0.0, 0.0), (10.0, 10.0)], "x double, y double")
    out = zorder_key(df, ["x", "y"], bits=2)  # auto ranges from the data
    vals = {r.x: r["__z"] for r in out.collect()}
    assert vals[0.0] == _morton2(0, 0, 2)
    assert vals[10.0] == _morton2(3, 3, 2)


def test_zorder_key_null_and_degenerate_span(spark):
    """Nulls bucket to cell 0; a constant column (span 0) buckets to 0 for
    every row instead of dividing by zero."""
    df = spark.createDataFrame(
        [(None, 5.0), (3.0, 5.0), (9.0, 5.0)], "x double, y double"
    )
    out = zorder_key(df, ["x", "y"], bits=2, ranges={"x": (0, 9), "y": (5, 5)})
    got = {r.x: r["__z"] for r in out.collect()}
    assert got[None] == _morton2(0, 0, 2)
    assert got[3.0] == _morton2(1, 0, 2)
    assert got[9.0] == _morton2(3, 0, 2)


def test_zorder_key_out_of_domain_clamps_low(spark):
    """Caller-supplied ranges with a value BELOW the declared min: the raw
    bucket is negative, and shiftright on a negative long sign-extends —
    without the lower clamp the interleave ORs spurious high bits into the
    key.  Out-of-domain-low must land in cell 0, same as the min itself."""
    df = spark.createDataFrame(
        [(-50.0, 1.5), (0.0, 1.5), (99.0, 1.5)], "x double, y double"
    )
    out = zorder_key(df, ["x", "y"], bits=2, ranges={"x": (0, 4), "y": (0, 4)})
    got = {r.x: r["__z"] for r in out.collect()}
    assert got[-50.0] == got[0.0] == _morton2(0, 1, 2)
    # and above-max still clamps high, with every key inside the bit budget
    assert got[99.0] == _morton2(3, 1, 2)
    assert all(0 <= z < (1 << 4) for z in got.values())


def test_zorder_key_validation(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    with pytest.raises(ValueError, match="overflows"):
        zorder_key(df, ["x", "y"], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [])
    with pytest.raises(ValueError, match="ranges missing"):
        zorder_key(df, ["x", "y"], ranges={"x": (0, 1)})


def test_zorder_key_stays_jvm_side(spark):
    """The key is pure Catalyst integer arithmetic — no Python evaluation
    node may appear in the plan (the 100 TB hot path must stay codegen'd)."""
    df = spark.range(100).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") % 10).cast("double").alias("y"),
    )
    plan = zorder_key(df, ["x", "y"], bits=4)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_files_touched_interval_logic(spark):
    """A file is touched iff its [min,max] overlaps the box on EVERY column."""
    stats = spark.createDataFrame(
        [
            ("f1", 0.0, 10.0, 0.0, 10.0),   # overlaps both
            ("f2", 0.0, 10.0, 50.0, 60.0),  # y disjoint
            ("f3", 90.0, 99.0, 0.0, 10.0),  # x disjoint
        ],
        "__file string, x_min double, x_max double, y_min double, y_max double",
    )
    assert files_touched(stats, {"x": (5, 6), "y": (5, 6)}) == 1
    assert files_touched(stats, {"x": (5, 6)}) == 2


@pytest.fixture(scope="module")
def _grid_layouts(spark, tmp_path_factory):
    """64×64 uniform grid written two ways: Z-ordered on (x, y) vs linearly
    sorted on x only — both 16 files."""
    base = tmp_path_factory.mktemp("layout")
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).cast("double").alias("x"),
        (F.col("id") / 64).cast("long").cast("double").alias("y"),
        F.col("id").alias("payload"),
    )
    zpath = str(base / "zorder")
    lpath = str(base / "linear")
    cluster_write(grid, zpath, ["x", "y"], num_files=16, bits=8)
    (
        grid.repartitionByRange(16, F.col("x"))
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    return zpath, lpath


def test_cluster_write_prunes_nonleading_dim(spark, _grid_layouts):
    """A thin slab on y: the x-sorted layout must read EVERY file (y spans
    the full range in each), the Z-ordered layout only the bottom tile row
    (~4 of 16; ≤8 allows for range-boundary slop)."""
    zpath, lpath = _grid_layouts
    box = {"y": (0.0, 3.9)}
    zs = file_minmax_stats(spark, zpath, ["x", "y"])
    ls = file_minmax_stats(spark, lpath, ["x", "y"])
    assert zs.count() == 16 and ls.count() == 16
    z_touch = files_touched(zs, box)
    l_touch = files_touched(ls, box)
    assert l_touch == 16
    assert z_touch <= 8
    # and the layout still prunes the OTHER dimension too (the point of
    # interleaving over single-column sorting):
    assert files_touched(zs, {"x": (0.0, 3.9)}) <= 8


def test_cluster_write_roundtrip_and_pushdown(spark, _grid_layouts):
    """The clustered write preserves the data exactly (the key column is
    layout-only) and a box filter reaches the parquet scan as PushedFilters
    — Spark's row-group-level pruning inside each surviving file."""
    zpath, _ = _grid_layouts
    back = spark.read.parquet(zpath)
    assert back.count() == 64 * 64
    assert set(back.columns) == {"x", "y", "payload"}
    filtered = back.filter((F.col("x") < 4.0) & (F.col("y") < 4.0))
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(x,4.0)" in plan
    assert filtered.count() == 16


def _part_files(path) -> list[str]:
    import os

    return [f for f in os.listdir(path) if f.startswith("part-")]


def test_compact_small_files_collapses_fragments(spark, tmp_path):
    """64 KB-sized fragments → one target-sized file; data intact."""
    src = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    spark.range(10_000).repartition(64).write.parquet(src)
    assert len(_part_files(src)) == 64
    n_out = compact_small_files(spark, src, out, target_mb=128)
    assert n_out == 1
    assert len(_part_files(out)) == 1
    assert spark.read.parquet(out).count() == 10_000


def test_compact_small_files_preserves_hive_partitions(spark, tmp_path):
    """Compacting a hive-partitioned directory with partition_by keeps the
    pt=K/ layout (an unpartitioned rewrite would silently flatten it and
    break downstream partition pruning)."""
    import os

    src = str(tmp_path / "pfrag")
    out = str(tmp_path / "pcompact")
    (
        spark.range(8_000)
        .select((F.col("id") % 4).alias("pt"), F.col("id").alias("v"))
        .repartition(16)
        .write.partitionBy("pt")
        .parquet(src)
    )
    assert len(_part_files(os.path.join(src, "pt=0"))) >= 8
    compact_small_files(spark, src, out, target_mb=512, partition_by=["pt"])
    pdirs = sorted(d for d in os.listdir(out) if d.startswith("pt="))
    assert pdirs == ["pt=0", "pt=1", "pt=2", "pt=3"]
    for d in pdirs:
        assert len(_part_files(os.path.join(out, d))) == 1
    back = spark.read.parquet(out)
    assert back.count() == 8_000
    assert back.filter(F.col("pt") == 2).count() == 2_000


def test_compact_small_files_sort_plus_partition_stays_compact(spark, tmp_path):
    """sort_cols AND partition_by together: the range key must lead with the
    partition columns, else every range task holds rows of every partition
    value and partitionBy fragments each hive dir into up to n_out files —
    the exact pathology compaction exists to remove.  Pin: total output
    files ≤ n_out + n_partition_values (boundary-straddle slop), far below
    the n_out × n_partition_values of the broken shape."""
    import os

    src = str(tmp_path / "spfrag")
    out = str(tmp_path / "spcompact")
    (
        spark.range(300_000)
        .select(
            (F.col("id") % 4).alias("pt"),
            F.col("id").alias("v"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .repartition(32)
        .write.partitionBy("pt")
        .parquet(src)
    )
    n_out = compact_small_files(
        spark, src, out, target_mb=1, sort_cols=["v"], partition_by=["pt"]
    )
    assert n_out >= 4  # sizing actually split
    pdirs = sorted(d for d in os.listdir(out) if d.startswith("pt="))
    assert pdirs == ["pt=0", "pt=1", "pt=2", "pt=3"]
    total_files = sum(len(_part_files(os.path.join(out, d))) for d in pdirs)
    assert total_files <= n_out + len(pdirs)
    # the fold-in sort still holds: per-file v-ranges within a dir disjoint
    stats = file_minmax_stats(spark, out, ["v", "pt"]).collect()
    by_dir: dict[int, list[tuple[int, int]]] = {}
    for r in stats:
        by_dir.setdefault(r.pt_min, []).append((r.v_min, r.v_max))
    for spans in by_dir.values():
        spans.sort()
        for (_, prev_max), (nxt_min, _) in zip(spans, spans[1:]):
            assert prev_max < nxt_min
    assert spark.read.parquet(out).count() == 300_000


def test_compact_small_files_splits_large_partition(spark, tmp_path):
    """partition_by alone with a partition value much bigger than target_mb:
    the salt must fan it over several files (collapsing every value into
    one single-task file recreates the oversized-file problem in reverse),
    while keeping ≤ ceil(n_out / n_values) files per hive dir."""
    import os

    src = str(tmp_path / "bigpart")
    out = str(tmp_path / "bigpart_out")
    (
        spark.range(400_000)
        .select(
            (F.col("id") % 2).alias("pt"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .repartition(8)
        .write.partitionBy("pt")
        .parquet(src)
    )
    n_out = compact_small_files(spark, src, out, target_mb=1, partition_by=["pt"])
    assert n_out >= 4
    per_dir_cap = -(-n_out // 2)
    for d in ("pt=0", "pt=1"):
        n_files = len(_part_files(os.path.join(out, d)))
        assert 2 <= n_files <= per_dir_cap
    assert spark.read.parquet(out).count() == 400_000


def test_compact_small_files_keeps_null_partition_rows(spark, tmp_path):
    """A hive directory with NULL partition values (written out as
    __HIVE_DEFAULT_PARTITION__, read back as null) must survive compaction
    intact: the r9 slot join was a null-unsafe equi-join and silently
    DROPPED those rows (r9 ADVICE, high)."""
    import os

    src = str(tmp_path / "nullpart")
    out = str(tmp_path / "nullpart_out")
    (
        spark.range(6_000)
        .select(
            F.when(F.col("id") % 3 == 0, None)
            .otherwise((F.col("id") % 3).cast("string"))
            .alias("pt"),
            F.col("id").alias("v"),
        )
        .repartition(8)
        .write.partitionBy("pt")
        .parquet(src)
    )
    assert "pt=__HIVE_DEFAULT_PARTITION__" in os.listdir(src)
    compact_small_files(spark, src, out, target_mb=512, partition_by=["pt"])
    back = spark.read.parquet(out)
    assert back.count() == 6_000
    assert back.filter(F.col("pt").isNull()).count() == 2_000
    assert "pt=__HIVE_DEFAULT_PARTITION__" in os.listdir(out)


def test_compact_small_files_all_map_schema_deterministic_salt(spark, tmp_path):
    """Every data column map-typed → xxhash64 can't take any column, so the
    salt falls back to hashing the row's JSON rendering.  Must stay
    DETERMINISTIC (a monotonically_increasing_id draw feeding repartition()
    re-hashes rows to different partitions under task retry — r9 ADVICE)
    and lose no rows."""
    src = str(tmp_path / "mapsrc")
    out = str(tmp_path / "mapout")
    (
        spark.range(5_000)
        .select(
            (F.col("id") % 2).alias("pt"),
            F.create_map(
                F.lit("k"), F.md5(F.col("id").cast("string"))
            ).alias("payload"),
        )
        .repartition(8)
        .write.partitionBy("pt")
        .parquet(src)
    )
    df = spark.read.parquet(src)
    from cdc_wastewater_analysis_ml_spark.operators.layout import _hashable_cols

    assert _hashable_cols(df.drop("pt")) == []
    compact_small_files(
        spark, src, out, target_mb=1, partition_by=["pt"]
    )
    back = spark.read.parquet(out)
    assert back.count() == 5_000
    assert back.select("payload").filter(
        F.col("payload")["k"].isNull()
    ).count() == 0
    # Pin the draw EXPRESSION, not just the outcome (r10 review: count
    # parity holds for a non-deterministic draw too, so the prior
    # assertions never guarded the regression they were written for):
    # the all-map schema must route the to_json rendering, and nothing
    # in the draw may be the rejected monotonically_increasing_id.
    from cdc_wastewater_analysis_ml_spark.operators.layout import _salt_draw

    expr = str(_salt_draw(df, ["pt"]))
    assert "xxhash64" in expr and "to_json" in expr
    assert "monotonically" not in expr


def test_salt_draw_partition_cols_only_fails_fast(spark):
    """Schema whose every column is a partition column: rows of a value
    are literally identical, so no deterministic row-content draw can
    exist — and Spark's own writer rejects all-partition-column tables
    (ALL_PARTITION_COLUMNS_NOT_ALLOWED), so the compaction could never
    write the result either.  The draw must fail fast with the real
    reason (r10 review: the prior silent F.lit(0) collapsed a skewed
    value into one single-task file, then died cryptically at the
    write)."""
    import pytest

    from cdc_wastewater_analysis_ml_spark.operators.layout import _salt_draw

    df = spark.range(10).select((F.col("id") % 3).alias("pt"))
    with pytest.raises(ValueError, match="ALL_PARTITION_COLUMNS"):
        _salt_draw(df, ["pt"])


def test_dir_bytes_local_fallback_matches_jvm(spark, tmp_path):
    """The Spark-Connect fallback (os.walk sizing) must agree with the JVM
    Hadoop FileSystem on a local directory, so sizing-driven n_out is the
    same either way."""
    from cdc_wastewater_analysis_ml_spark.operators.layout import _dir_bytes

    src = str(tmp_path / "sized")
    spark.range(10_000).repartition(4).write.parquet(src)
    via_jvm = _dir_bytes(spark, src)
    # simulate Connect: no _jvm attribute on the session object
    class _NoJvm:
        def __getattr__(self, name):
            raise AttributeError(name)

    via_walk = _dir_bytes(_NoJvm(), src)
    assert via_jvm == via_walk > 0


def test_compact_small_files_respects_target_size(spark, tmp_path):
    """High-entropy payload big enough to need several target-size files:
    the sizing math must split, and a sort_cols compaction leaves per-file
    ranges disjoint (clustering folded into the rewrite)."""
    src = str(tmp_path / "frag2")
    out = str(tmp_path / "compact2")
    spark.range(200_000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("payload")
    ).repartition(32).write.parquet(src)
    n_out = compact_small_files(spark, src, out, target_mb=1, sort_cols=["id"])
    assert n_out >= 2
    assert len(_part_files(out)) == n_out
    stats = file_minmax_stats(spark, out, ["id"]).collect()
    assert sum(r.rows for r in stats) == 200_000
    spans = sorted((r["id_min"], r["id_max"]) for r in stats)
    for (_, prev_max), (nxt_min, _) in zip(spans, spans[1:]):
        assert prev_max < nxt_min  # disjoint sorted ranges across files


def test_compact_salt_splits_skewed_partition_value(spark, tmp_path):
    """The salt range is sized PER partition value from its row share: a
    value holding ~99% of the data fans out over several files while a
    tiny value stays at one — a global ceil(n_out / n_values) average
    would leave the skewed value's salt constant and collapse it into one
    oversized single-task file (r9 review finding)."""
    import os

    src = str(tmp_path / "skfrag")
    out = str(tmp_path / "skcompact")
    # incompressible payload (unique md5 chains) so the on-disk size is
    # real — a constant pad dictionary-encodes to ~nothing and n_out = 1
    big = spark.range(20_000).select(
        F.lit("hot").alias("pt"),
        F.concat_ws(
            "",
            *[
                F.md5(F.concat(F.col("id").cast("string"), F.lit(str(i))))
                for i in range(10)
            ],
        ).alias("v"),
    )
    small = spark.range(20).select(
        F.lit("cold").alias("pt"), F.col("id").cast("string").alias("v")
    )
    big.unionByName(small).repartition(8).write.partitionBy("pt").parquet(src)
    n_out = compact_small_files(spark, src, out, target_mb=1, partition_by=["pt"])
    assert n_out >= 3  # the fixture is sized to demand several slots
    assert len(_part_files(os.path.join(out, "pt=hot"))) >= 2
    assert len(_part_files(os.path.join(out, "pt=cold"))) == 1
    back = spark.read.parquet(out)
    assert back.count() == 20_020


def test_compact_tolerates_map_typed_columns(spark, tmp_path):
    """xxhash64 rejects MapType anywhere in a nested type; the salt must
    draw only from hashable columns so compacting a schema with map
    metadata columns doesn't crash at plan time (r9 review finding: the
    first salted version hashed every column)."""
    import os

    src = str(tmp_path / "mfrag")
    out = str(tmp_path / "mcompact")
    (
        spark.range(2_000)
        .select(
            (F.col("id") % 2).alias("pt"),
            F.col("id").alias("v"),
            F.create_map(F.lit("k"), F.col("id").cast("string")).alias("tags"),
        )
        .repartition(8)
        .write.partitionBy("pt")
        .parquet(src)
    )
    compact_small_files(spark, src, out, target_mb=512, partition_by=["pt"])
    back = spark.read.parquet(out)
    assert back.count() == 2_000
    assert dict(back.filter(F.col("v") == 7).select("tags").first()["tags"]) == {
        "k": "7"
    }
