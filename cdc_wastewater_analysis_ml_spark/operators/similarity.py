"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk_bruteforce``: exact top-k — broadcast the (small) query set
  against the corpus; one pass, no corpus shuffle.  The baseline and the
  verification stage for approximate methods.
- ``rhp_signature`` / ``cosine_topk_lsh``: random-hyperplane LSH scale path —
  corpus is bucketed by sign-pattern signature; queries probe only their own
  bucket.  Hyperplane coefficients are derived from md5 (deterministic, no
  RNG, reproducible across engines).

Dot products run as JVM array expressions (``zip_with`` + ``aggregate``) in
double precision — no Python UDF, identical left-to-right summation order to
the SQL oracle, so results are bit-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import fan_out


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, left-to-right."""
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query (query_id, neighbor_id, cos, rank).

    The query side broadcasts (ANN workloads have |queries| ≪ |corpus|), so
    the corpus streams through map-side — one scan, zero shuffle before the
    final per-query top-k, which is a bounded window over |Q|·|C| scored rows
    reduced by rank ≤ k.  Self-matches excluded; ties broken by neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def rhp_sign(vec: Column, plane: int, dims: int) -> Column:
    """Sign bit of ⟨vec, h_plane⟩ for the md5-derived ±1 hyperplane h."""
    coeff = F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda d: F.when(
            F.substring(F.md5(F.concat(F.lit(f"p{plane}:"), d.cast("string"))), 1, 1)
            >= "8",
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)),
    )
    proj = F.aggregate(
        F.zip_with(vec.cast("array<double>"), coeff, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(proj > 0, F.lit("1")).otherwise(F.lit("0"))


def rhp_signature(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH signature (bit-string of length ``planes``)."""
    sig = F.concat(*[rhp_sign(F.col(vec_col), p, dims) for p in range(planes)])
    return df.select(F.col(id_col), F.col(vec_col), sig.alias("rhp_sig"))


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """Approximate top-k: score only within the query's LSH bucket.

    The signature equi-join replaces the cross join — at scale the corpus is
    pre-bucketed (partitioned/bucketed BY rhp_sig on disk) so a query touches
    |C|/2^planes candidates.  Recall is tunable via ``planes`` (fewer planes
    = bigger buckets = higher recall, more compute).
    """
    q = rhp_signature(queries, id_col, vec_col, planes, dims).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("rhp_sig"),
    )
    c = rhp_signature(fan_out(corpus), id_col, vec_col, planes, dims).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("rhp_sig"),
    )
    scored = (
        F.broadcast(q)
        .join(c, on="rhp_sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def assign_ivf_cells(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out: str = "cell",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine, ties → lowest
    centroid id) — the IVF coarse quantizer.

    Centroids arrive as a driver-side list (they are tiny — nlist entries) and
    are inlined as literals, so assignment is a pure map-side projection: zero
    shuffle, zero broadcast join, whole-stage codegen over the corpus scan.
    At 100 TB the corpus is written out partitioned by ``cell`` once and every
    subsequent query prunes to its probe cells.
    """
    scored = F.array(
        *[
            F.struct(
                cosine(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in vec]).cast("array<double>"),
                ).alias("cos"),
                F.lit(-int(cid)).alias("neg_cid"),
            )
            for cid, vec in centroids
        ]
    )
    best = F.array_max(scored)
    return df.withColumn(out, -best["neg_cid"])


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF approximate top-k: probe only the ``nprobe`` cells whose centroids
    are closest to the query (SURVEY §7 phase 4 scale path; baseline =
    :func:`cosine_topk_bruteforce`).

    Corpus cell assignment is map-side (see :func:`assign_ivf_cells`); each
    query fans out to ``nprobe`` (query, cell) probes that equi-join the
    bucketed corpus — the cross join shrinks by ~nlist/nprobe versus brute
    force.  Deterministic: centroids are caller-fixed (no RNG), ties break on
    centroid id then neighbor id.
    """
    c = assign_ivf_cells(
        fan_out(corpus).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        centroids,
        "c_vec",
        "cell",
    )
    q_scored = F.array(
        *[
            F.struct(
                cosine(
                    F.col("q_vec"),
                    F.array(*[F.lit(float(x)) for x in vec]).cast("array<double>"),
                ).alias("cos"),
                F.lit(-int(cid)).alias("neg_cid"),
            )
            for cid, vec in centroids
        ]
    )
    probes = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .withColumn(
            "cell",
            F.explode(
                F.transform(
                    F.slice(F.sort_array(q_scored, asc=False), 1, nprobe),
                    lambda s: -s["neg_cid"],
                )
            ),
        )
    )
    scored = (
        F.broadcast(probes)
        .join(c, on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
