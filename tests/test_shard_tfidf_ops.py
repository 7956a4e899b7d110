"""Shard layout, exact-substring dedup, TF-IDF keywords, quality-aware
cluster representative — the r6 session-2 additions.

Invariants here are the ones a production run depends on: shard assignment
is deterministic and dense, written shards are sorted and complete,
substring pairs appear iff an exact k-token span is shared, the greedy
quality policy picks the argmax member.
"""

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from cdc_wastewater_analysis_ml_spark.operators.corpus import tfidf_top_terms
from cdc_wastewater_analysis_ml_spark.operators.dedup import (
    cluster_best_decision,
    substring_kgram_pairs,
)
from cdc_wastewater_analysis_ml_spark.operators.shards import (
    assign_shards,
    write_training_shards,
)


def _ref_assign(keys, n_shards, seed):
    """Driver-side reference: the same md5 draw computed with hashlib."""
    draws = {
        k: hashlib.md5(f"{seed}:{k}".encode()).hexdigest()[:8] for k in keys
    }
    shard = {k: int(draws[k], 16) % n_shards for k in keys}
    pos = {}
    for s in set(shard.values()):
        members = sorted(
            (k for k in keys if shard[k] == s), key=lambda k: (draws[k], k)
        )
        for i, k in enumerate(members):
            pos[k] = i
    return shard, pos


# ---------------------------------------------------------------------------
# assign_shards / write_training_shards
# ---------------------------------------------------------------------------


def test_assign_shards_matches_reference_and_is_dense(spark):
    keys = list(range(1, 201))
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long").repartition(8)
    out = assign_shards(df, "doc_id", 8, seed=42).collect()
    shard, pos = _ref_assign(keys, 8, 42)
    assert len(out) == len(keys)
    for r in out:
        assert r["shard"] == shard[r["doc_id"]]
        assert r["pos_in_shard"] == pos[r["doc_id"]]


def test_assign_shards_deterministic_across_runs(spark):
    df = spark.createDataFrame([(k,) for k in range(50)], "doc_id long")
    a = sorted(map(tuple, assign_shards(df, "doc_id", 4, seed=7).collect()))
    b = sorted(map(tuple, assign_shards(df, "doc_id", 4, seed=7).collect()))
    assert a == b
    c = sorted(map(tuple, assign_shards(df, "doc_id", 4, seed=8).collect()))
    assert a != c  # a different seed reshuffles


def test_assign_shards_rejects_bad_n(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        assign_shards(df, "doc_id", 0)


def test_write_training_shards_roundtrip_sorted(spark, tmp_path):
    df = spark.createDataFrame(
        [(k, f"doc {k}") for k in range(120)], "doc_id long, text string"
    )
    path = str(tmp_path / "shards")
    write_training_shards(df, path, "doc_id", 4, seed=1)
    back = spark.read.parquet(path)
    assert back.count() == 120
    assert set(back.select("shard").distinct().toPandas()["shard"]) <= set(range(4))
    # within each shard the parquet row order equals pos_in_shard order
    for s in range(4):
        rows = (
            back.filter(F.col("shard") == s)
            .select("pos_in_shard")
            .toPandas()["pos_in_shard"]
            .tolist()
        )
        assert rows == sorted(rows)
        assert sorted(rows) == list(range(len(rows)))  # dense 0..n-1


# ---------------------------------------------------------------------------
# substring_kgram_pairs
# ---------------------------------------------------------------------------

_SPAN = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_substring_pairs_found_iff_span_shared(spark):
    texts = [
        f"intro words here {_SPAN} and some trailing content one",
        f"totally different opening {_SPAN} closing remarks two three",
        "no shared span in this document at all nine distinct words",
    ]
    out = substring_kgram_pairs(_docs(spark, texts), "text", "doc_id", k=8).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]
    assert out[0]["n_shared_spans"] == 1


def test_substring_pairs_low_jaccard_still_caught(spark):
    # the Lee-et-al motivation: one verbatim paragraph inside otherwise
    # disjoint documents — Jaccard is tiny but the pair MUST surface
    filler_a = " ".join(f"a{i}" for i in range(60))
    filler_b = " ".join(f"b{i}" for i in range(60))
    out = substring_kgram_pairs(
        _docs(spark, [f"{filler_a} {_SPAN}", f"{_SPAN} {filler_b}"]),
        "text",
        "doc_id",
        k=8,
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]


def test_substring_pairs_short_docs_excluded(spark):
    out = substring_kgram_pairs(
        _docs(spark, ["seven tokens only in this tiny doc"] * 2),
        "text",
        "doc_id",
        k=8,
    ).collect()
    assert out == []  # 7 tokens < k: no k-span can exist


def test_substring_pairs_hot_span_guard(spark):
    texts = [f"{_SPAN} unique tail number {i}" for i in range(6)]
    all_pairs = substring_kgram_pairs(
        _docs(spark, texts), "text", "doc_id", k=8
    ).collect()
    assert len(all_pairs) == 15  # C(6,2): every pair shares the span
    guarded = substring_kgram_pairs(
        _docs(spark, texts), "text", "doc_id", k=8, max_bucket_size=3
    ).collect()
    assert guarded == []  # the span occurs in 6 > 3 docs: dropped


def test_substring_guarded_spans_cached_once_and_scope_released(spark):
    """r6 ADVICE, amended r15: the raw span relation is pinned (the hot-set
    aggregate and the anti-join probe side both read it), and since the
    guarded path now generates pairs from the bounded per-bucket collect
    (ONE downstream consumer of the anti-join) there is no second
    guarded-relation cache to pin.  The pin must release with the result
    handle."""
    import gc

    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    cache_mgr.clearCache()
    texts = [f"{_SPAN} unique tail number {i}" for i in range(6)]
    out = substring_kgram_pairs(
        _docs(spark, texts), "text", "doc_id", k=8, max_bucket_size=3
    )
    assert cache_mgr.cachedData().size() == 1  # raw spans only (r15)
    out.count()
    del out
    gc.collect()
    assert cache_mgr.isEmpty()
    # unguarded path: exactly one pin (no dead second cache entry)
    out = substring_kgram_pairs(_docs(spark, texts), "text", "doc_id", k=8)
    assert cache_mgr.cachedData().size() == 1
    del out
    gc.collect()
    assert cache_mgr.isEmpty()


# ---------------------------------------------------------------------------
# cluster_best_decision
# ---------------------------------------------------------------------------


def test_cluster_best_picks_argmax_quality_with_id_tiebreak(spark):
    cc = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (10, 0.1), (11, 0.1)],
        "doc_id long, quality double",
    )
    out = {r["doc_id"]: r["keep_best"] for r in
           cluster_best_decision(cc, scores).collect()}
    # cluster 1: docs 2 and 3 tie on 0.9 → lowest id (2) wins
    # cluster 10: docs 10 and 11 tie on 0.1 → 10 wins
    assert out == {1: False, 2: True, 3: False, 10: True, 11: False}


# ---------------------------------------------------------------------------
# tfidf_top_terms
# ---------------------------------------------------------------------------


def test_tfidf_hand_computed(spark):
    # doc1: "x x y", doc2: "y z", doc3: "z z z"
    # N=3; df: x→1, y→2, z→2
    df = _docs(spark, ["x x y", "y z", "z z z"])
    out = tfidf_top_terms(df, "text", "doc_id", top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["rank"])

    def s(tf, dfreq):
        return math.floor(tf * math.log(3 / dfreq) * 1e6 + 0.5) / 1e6

    # doc1: x→2·ln3 ≈ 2.197, y→1·ln1.5 ≈ 0.405
    assert [(r["term"], r["tfidf"]) for r in by_doc[1]] == [
        ("x", pytest.approx(s(2, 1), abs=2e-6)),
        ("y", pytest.approx(s(1, 2), abs=2e-6)),
    ]
    # doc2: y and z tie (1·ln1.5) → term ASC: y first
    assert [r["term"] for r in by_doc[2]] == ["y", "z"]
    # doc3: only z → a single row despite top_k=2
    assert [r["term"] for r in by_doc[3]] == ["z"]
    assert by_doc[3][0]["tf"] == 3


def test_tfidf_rank_unique_and_bounded(spark):
    rng = random.Random(5)
    texts = [
        " ".join(f"w{rng.randint(0, 20)}" for _ in range(rng.randint(3, 30)))
        for _ in range(40)
    ]
    out = tfidf_top_terms(_docs(spark, texts), "text", "doc_id", top_k=3).collect()
    seen = {}
    for r in out:
        assert 1 <= r["rank"] <= 3
        key = (r["doc_id"], r["rank"])
        assert key not in seen  # ranks are dense and unique per doc
        seen[key] = r["term"]


def test_write_training_shards_max_records_per_file(spark, tmp_path):
    import glob
    import pyarrow.parquet as pq

    df = spark.createDataFrame(
        [(k, f"doc {k}") for k in range(100)], "doc_id long, text string"
    )
    path = str(tmp_path / "chunked")
    write_training_shards(df, path, "doc_id", 2, seed=3, max_records_per_file=10)
    files = sorted(glob.glob(f"{path}/shard=*/*.parquet"))
    assert len(files) >= 10  # 100 rows / 10-per-file across 2 shards
    for f in files:
        t = pq.read_table(f)
        assert t.num_rows <= 10
        pos = t.column("pos_in_shard").to_pylist()
        assert pos == sorted(pos)  # order preserved within every chunk file
