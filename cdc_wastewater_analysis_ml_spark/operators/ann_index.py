"""IVF index persistence: the materialized-layout half of the ANN story.

:func:`~.similarity.cosine_topk_ivf` computes the inverted file inline —
right for one-shot queries, wasteful for a served index: at 100 TB the
corpus-side cell assignment is the expensive pass, and it only changes when
the corpus or the coarse quantizer does.  This module writes the assignment
DOWN as a **cell-partitioned parquet layout** plus a tiny centroid table,
so that queries:

- skip the assignment pass entirely (it is the directory structure);
- read ONLY the probed cells — the broadcast probe relation's equi-join on
  the partition column lets Spark prune cell directories (dynamic partition
  pruning), i.e. nprobe/nlist of the corpus bytes ever leave storage;
- share one index across query batches, engines, and sessions (plain
  parquet + a schema'd centroid table — no engine-private format).

This is the parquet analogue of a FAISS ``IndexIVFFlat`` on disk, built
from public building blocks (partitioned layout + broadcast-join pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import fan_out
from .similarity import _cos_scorer_udf, assign_ivf_cells, probe_ivf_cells

Centroids = list[tuple[int, list[float]]]


def save_ivf_index(
    corpus: DataFrame,
    centroids: Centroids,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF layout: ``<path>/corpus`` cell-partitioned
    parquet of ``(id_col, vec_col)`` and ``<path>/centroids`` the coarse
    quantizer.  One corpus pass (the Arrow argmax assignment) + one write;
    re-run only on corpus/quantizer change."""
    assigned = assign_ivf_cells(
        fan_out(corpus).select(F.col(id_col), F.col(vec_col)),
        centroids,
        vec_col,
        "cell",
    )
    assigned.write.partitionBy("cell").mode("overwrite").parquet(f"{path}/corpus")
    cent = corpus.sparkSession.createDataFrame(
        [(int(cid), [float(x) for x in c]) for cid, c in centroids],
        "cid int, center array<double>",
    )
    cent.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def load_ivf_centroids(spark: SparkSession, path: str) -> Centroids:
    """Read the coarse quantizer back (driver-side — it is nlist rows)."""
    rows = spark.read.parquet(f"{path}/centroids").orderBy("cid").collect()
    return [(r["cid"], list(r["center"])) for r in rows]


def query_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Top-k over a saved index: probe assignment is a map-side argmax over
    the (tiny) loaded centroids; the broadcast probe relation equi-joins the
    cell-partitioned corpus on the PARTITION column, so only probed cell
    directories are scanned.  Same result contract as
    :func:`~.similarity.cosine_topk_ivf` with the same quantizer."""
    cents = load_ivf_centroids(spark, path)
    corpus = spark.read.parquet(f"{path}/corpus")
    probes = probe_ivf_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        cents,
        "q_vec",
        "cell",
        nprobe,
    )
    scorer = _cos_scorer_udf()
    scored = (
        F.broadcast(probes)
        .join(corpus, on="cell")
        .filter(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(scorer(F.col("q_vec"), F.col(vec_col)), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
