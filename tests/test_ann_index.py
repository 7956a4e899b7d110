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


def test_rhp_signature_arrow_matches_catalyst_fold(spark, sf_small):
    """The Arrow-vectorized signature pass must agree bit-for-bit with the
    per-plane Catalyst fold (rhp_sign) — same md5 hyperplanes, same
    left-to-right float64 accumulation — or multi-table buckets silently
    diverge from the SQL oracle's."""
    from pyspark.sql import functions as F

    from cdc_wastewater_analysis_ml_spark.operators import similarity as SIM
    from cdc_wastewater_analysis_ml_spark.sources import load_table

    emb = load_table(spark, sf_small, "embeddings").limit(100)
    fast = {
        r["vec_id"]: r["rhp_sig"]
        for r in SIM.rhp_signature_arrow(emb, "embedding", 12).collect()
    }
    slow = {
        r["vec_id"]: r["rhp_sig"]
        for r in SIM.rhp_signature(emb, "vec_id", "embedding", planes=12).collect()
    }
    assert fast == slow and len(fast) == 100


def test_lsh_multi_candidate_join_is_vector_free(spark, sf_small):
    """Scale contract: embedding vectors must not ride through the banded
    candidate join or the pair distinct — the only relations carrying
    vectors are the final per-id score joins.  Mechanically: every
    hashpartitioning exchange in the plan partitions on narrow key
    columns, never on (or carrying) the embedding array... checked by
    asserting the distinct aggregate's schema is exactly the pair key."""
    from pyspark.sql import functions as F

    from cdc_wastewater_analysis_ml_spark.operators import similarity as SIM
    from cdc_wastewater_analysis_ml_spark.sources import load_table

    emb = load_table(spark, sf_small, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = SIM.cosine_topk_lsh_multi(q, emb, k=3)
    plan = out._jdf.queryExecution().toString()
    # the distinct runs over exactly (query_id, neighbor_id)
    assert "HashAggregate(keys=[query_id" in plan and "c_vec" not in plan.split(
        "HashAggregate(keys=[query_id"
    )[1].split("\n")[0]
    rows = out.collect()
    assert rows and all(1 <= r["rank"] <= 3 for r in rows)


def test_lsh_multi_multiprobe_widens_candidates(spark, sf_small):
    """multiprobe=1 must be a strict superset generator: recall can only
    rise vs multiprobe=0 at higher candidate cost."""
    from pyspark.sql import functions as F

    from cdc_wastewater_analysis_ml_spark.operators import similarity as SIM
    from cdc_wastewater_analysis_ml_spark.sources import load_table

    emb = load_table(spark, sf_small, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    c0 = SIM.lsh_multi_scored(q, emb, bands=4, band_bits=6, multiprobe=0)
    c1 = SIM.lsh_multi_scored(q, emb, bands=4, band_bits=6, multiprobe=1)
    s0 = {(r["query_id"], r["neighbor_id"]) for r in c0.collect()}
    s1 = {(r["query_id"], r["neighbor_id"]) for r in c1.collect()}
    assert s0 <= s1 and len(s1) > len(s0)


def test_lsh_multi_rejects_unimplemented_probe_radius(spark, sf_small):
    """multiprobe > 1 (Hamming-≥2) is unimplemented: asking for it must
    fail loudly, not silently probe a smaller radius than requested."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from cdc_wastewater_analysis_ml_spark.operators import similarity as SIM
    from cdc_wastewater_analysis_ml_spark.sources import load_table

    emb = load_table(spark, sf_small, "embeddings")
    q = emb.filter(F.col("vec_id") < 2)
    with _pytest.raises(ValueError, match="multiprobe"):
        SIM.lsh_multi_scored(q, emb, bands=4, band_bits=6, multiprobe=2)
