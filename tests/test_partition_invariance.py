"""Partition-invariance properties: the distributed operators added in r6
must produce BIT-IDENTICAL results regardless of how the input happens to
be partitioned — the determinism property that separates "works on my
32-way local fixture" from "reproducible on a 1000-executor cluster where
the scan split count is whatever the day's file layout gives you".

Each test runs the same logical input through pathological partitionings
(one giant partition, many tiny ones, value-skewed) and asserts identical
row sets.
"""

import random

from pyspark.sql import functions as F

from cdc_wastewater_analysis_ml_spark.operators.corpus import (
    pack_token_stream,
    tfidf_top_terms,
    unigram_logprob,
)
from cdc_wastewater_analysis_ml_spark.operators.prefix import global_prefix_sum
from cdc_wastewater_analysis_ml_spark.operators.shards import assign_shards


def _variants(df):
    yield df.coalesce(1)
    yield df.repartition(17)
    yield df.repartition(5, F.col(df.columns[0]))  # key-skewed layout


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_global_prefix_sum_partition_invariant(spark):
    rng = random.Random(13)
    data = [(i, rng.randint(1, 9)) for i in range(300)]
    rng.shuffle(data)
    base = spark.createDataFrame(data, "k long, v long")
    expected = None
    for v in _variants(base):
        got = _rows(global_prefix_sum(v, ["k"], "v", out="ps"))
        if expected is None:
            expected = got
        assert got == expected


def test_pack_token_stream_partition_invariant(spark):
    rng = random.Random(17)
    texts = [
        (i, " ".join("w" for _ in range(rng.randint(1, 30))))
        for i in range(150)
    ]
    base = spark.createDataFrame(texts, "doc_id long, text string")
    expected = None
    for v in _variants(base):
        got = _rows(pack_token_stream(v, "text", "doc_id", context_len=32))
        if expected is None:
            expected = got
        assert got == expected


def test_assign_shards_partition_invariant(spark):
    base = spark.createDataFrame([(k,) for k in range(250)], "doc_id long")
    expected = None
    for v in _variants(base):
        got = _rows(assign_shards(v, "doc_id", 8, seed=5))
        if expected is None:
            expected = got
        assert got == expected


def test_tfidf_and_unigram_partition_invariant(spark):
    rng = random.Random(23)
    texts = [
        (i, " ".join(f"t{rng.randint(0, 12)}" for _ in range(rng.randint(2, 20))))
        for i in range(80)
    ]
    base = spark.createDataFrame(texts, "doc_id long, text string")
    exp_tfidf = exp_uni = None
    for v in _variants(base):
        got_t = _rows(tfidf_top_terms(v, "text", "doc_id", top_k=3))
        got_u = _rows(unigram_logprob(v, "text", "doc_id"))
        if exp_tfidf is None:
            exp_tfidf = got_t
        if exp_uni is None:
            exp_uni = got_u
        assert got_t == exp_tfidf
        assert got_u == exp_uni
