"""IVF index persistence round-trip (operators/ann_index.py): the saved
cell-partitioned layout must answer identically to the inline IVF operator
with the same quantizer, across save → load → query."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_wastewater_analysis_ml_spark.operators import ann_index as ANN
from cdc_wastewater_analysis_ml_spark.operators import similarity as SIM
from cdc_wastewater_analysis_ml_spark.sources import load_table


def test_ivf_index_roundtrip_matches_inline(spark, sf_small, tmp_path):
    emb = load_table(spark, sf_small, "embeddings")
    centroids = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    ]
    path = str(tmp_path / "ivf")
    ANN.save_ivf_index(emb, centroids, path, "vec_id", "embedding")

    loaded = ANN.load_ivf_centroids(spark, path)
    assert loaded == [(int(c), [float(x) for x in v]) for c, v in centroids]

    queries = emb.filter(F.col("vec_id") < 10)
    via_index = ANN.query_ivf_index(
        spark, path, queries, "vec_id", "embedding", k=5, nprobe=2
    )
    inline = SIM.cosine_topk_ivf(
        queries, emb, centroids, "vec_id", "embedding", k=5, nprobe=2
    )
    got = {tuple(r) for r in via_index.collect()}
    want = {tuple(r) for r in inline.collect()}
    assert got == want and got


def test_ivf_index_rebuild_overwrites(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    cents_a = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    path = str(tmp_path / "ivf")
    ANN.save_ivf_index(df, cents_a, path, "vec_id", "embedding")
    cents_b = [(0, [1.0, 1.0]), (1, [-1.0, 1.0])]
    ANN.save_ivf_index(df, cents_b, path, "vec_id", "embedding")
    assert ANN.load_ivf_centroids(spark, path) == cents_b
