"""Deterministic sampling operators for training-data curation: uniform
hash sampling, per-group mixture weighting, per-key top-k sampling.

Training pipelines need samples that are (a) reproducible across runs and
engines — no RNG, no partition-order dependence — and (b) expressible as a
pure filter so they push into the scan stage.  The house trick (same one
the MinHash family uses): an md5 over ``seed:key`` is a uniform 128-bit
draw, and comparing its first 8 hex chars against a precomputed hex
threshold is an exact "keep with probability p" test.  Lowercase fixed-width
hex compares lexicographically == numerically in every engine, so the SAME
predicate string runs on Spark and the DuckDB oracle.

Contrast with ``df.sample()`` — partition-order dependent (Bernoulli per
row in iteration order) and not reproducible across engines, and with
``rand(seed)`` — reproducible only within one Spark partitioning.  A
keyed-hash filter survives repartitioning, AQE re-planning, and engine
swaps; at 100 TB it also means a re-run after a lost executor samples the
exact same rows.

All operators are stateless filters or bounded per-key windows — no global
shuffle beyond what the semantics require.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_SPAN = 16**8  # first 8 hex chars of md5: uniform draw in [0, 16^8)


def fraction_to_hex_threshold(fraction: float) -> str:
    """Exact keep-threshold: ``hash8 < threshold`` keeps ⌊p·16⁸⌋/16⁸ ≈ p.

    ``fraction == 1.0`` returns ``"g"`` — lexicographically after every hex
    digit, so the predicate keeps EVERY row.  (The ⌊p·16⁸⌋ clamp would
    otherwise cap at ``"ffffffff"`` and silently drop rows whose draw is
    exactly ``ffffffff`` — p≈2.3e-10 per row, ~1 row per 4.3B at corpus
    scale, for a weight that says "keep everything".)
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction == 1.0:
        return "g"
    return format(min(int(fraction * _HEX_SPAN), _HEX_SPAN - 1), "08x")


def hash_draw(key: Column | str, seed: int | str = 0) -> Column:
    """The uniform draw: first 8 hex chars of md5(seed:key)."""
    key = F.col(key) if isinstance(key, str) else key
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 8
    )


def sample_fraction_hash(
    df: DataFrame, key_col: str, fraction: float, seed: int | str = 0
) -> DataFrame:
    """Deterministic uniform sample: keep each row with probability
    ``fraction``, decided solely by ``md5(seed:key)``.  A pure filter —
    pushes to the scan, costs one hash per row, zero shuffle."""
    thr = fraction_to_hex_threshold(fraction)
    return df.filter(hash_draw(key_col, seed) < F.lit(thr))


def sample_mixture(
    df: DataFrame,
    key_col: str,
    group_col: str,
    weights: Mapping[str, float],
    seed: int | str = 0,
) -> DataFrame:
    """Per-group mixture sampling: keep a row of group *g* with probability
    ``weights[g]`` (groups absent from ``weights`` are dropped).  This is
    the corpus-mixture re-weighting step of a training-data pipeline
    ("2× wiki, 0.3× web") as a single deterministic filter — the whole
    mixture materializes in one scan, no per-source passes, no shuffle.

    Weights must be ≤ 1 (down-sampling).  Up-weighting (>1) needs row
    replication — ``explode(sequence(...))`` — deliberately out of scope
    here so the operator stays a filter.
    """
    bad = {g: w for g, w in weights.items() if not 0.0 <= w <= 1.0}
    if bad:
        raise ValueError(f"mixture weights must be in [0, 1]: {bad}")
    thr: Column = F.lit(None)
    for g, w in weights.items():
        thr = F.when(
            F.col(group_col) == g, F.lit(fraction_to_hex_threshold(w))
        ).otherwise(thr)
    return df.filter(hash_draw(key_col, seed) < thr)


def sample_topk_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    id_col: str,
    k: int,
    seed: int | str = 0,
    out_rank: str = "rk",
) -> DataFrame:
    """Exactly-k-per-key deterministic sample: rank rows within each key by
    their hash draw (a uniform random order, frozen by the seed) and keep
    the first ``k`` — the reproducible equivalent of per-key reservoir
    sampling.

    One shuffle on the key; each window partition is a single key's rows,
    so parallelism is #keys — the right shape when keys are many and
    moderate (sources, languages, shards).  The md5 tiebreak makes the
    order total (draw collisions broken by id), so results are stable
    across partitionings and engines.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        hash_draw(id_col, seed), F.col(id_col)
    )
    return (
        df.withColumn(out_rank, F.row_number().over(w))
        .filter(F.col(out_rank) <= k)
    )


def resample_mixture(
    df: DataFrame,
    key_col: str,
    group_col: str,
    weights: Mapping[str, float],
    seed: int | str = 0,
    out_copy: str = "copy_id",
) -> DataFrame:
    """Mixture re-weighting WITH up-sampling: a row of group *g* appears
    ``⌊w⌋`` times plus one more with probability ``frac(w)`` — e.g. w=2.5
    yields 2 or 3 copies (deterministically, by the row's hash draw), w=0.3
    yields 0 or 1.  Completes :func:`sample_mixture` (filter-only, w ≤ 1)
    for the "repeat the high-quality corpus 2×" epoch-mixture shape.

    ``explode(sequence(...))`` replicates JVM-side — no Python, no shuffle;
    output size is Σ w_g·n_g.  ``out_copy`` (1-based copy index) keeps
    replicated rows distinguishable downstream (e.g. for per-epoch salts).
    Groups absent from ``weights`` are dropped.
    """
    bad = {g: w for g, w in weights.items() if w < 0}
    if bad:
        raise ValueError(f"mixture weights must be >= 0: {bad}")
    n_extra: Column = F.lit(None).cast("int")
    base: Column = F.lit(None).cast("int")
    for g, w in weights.items():
        whole, frac = int(w), w - int(w)
        thr = fraction_to_hex_threshold(frac)
        is_g = F.col(group_col) == g
        base = F.when(is_g, F.lit(whole)).otherwise(base)
        n_extra = F.when(
            is_g, (hash_draw(key_col, seed) < F.lit(thr)).cast("int")
        ).otherwise(n_extra)
    n = (base + n_extra).alias("__n")
    return (
        df.withColumn("__n", n)
        .filter(F.col("__n") > 0)
        .withColumn(out_copy, F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__n")
    )
