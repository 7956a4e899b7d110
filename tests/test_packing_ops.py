"""Sequence packing + unigram-LM scoring + distributed prefix sum.

These are the r6 training-data-pipeline additions: the invariants below are
the ones a 100 TB packing run actually depends on (token conservation,
window fullness, greedy bin feasibility), plus a direct equivalence check
for the two-phase prefix sum against the single-machine definition.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from cdc_wastewater_analysis_ml_spark.operators.corpus import (
    greedy_pack_by_key,
    pack_token_counts,
    pack_token_stream,
    unigram_logprob,
)
from cdc_wastewater_analysis_ml_spark.operators.prefix import global_prefix_sum


def _docs(spark, texts, ids=None, sources=None):
    ids = ids or list(range(1, len(texts) + 1))
    sources = sources or ["s0"] * len(texts)
    return spark.createDataFrame(
        list(zip(ids, texts, sources)), "doc_id long, text string, source string"
    )


# ---------------------------------------------------------------------------
# global_prefix_sum
# ---------------------------------------------------------------------------


def test_global_prefix_sum_matches_sequential_cumsum(spark):
    rng = random.Random(7)
    rows = [(i, rng.randint(1, 50)) for i in range(200)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, v long").repartition(8)
    got = {
        r["k"]: r["ps"]
        for r in global_prefix_sum(df, ["k"], "v", out="ps").collect()
    }
    expect, acc = {}, 0
    for k, v in sorted(rows):
        expect[k] = acc
        acc += v
    assert got == expect


def test_global_prefix_sum_inclusive(spark):
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long")
    got = {
        r["k"]: r["ps"]
        for r in global_prefix_sum(df, ["k"], "v", out="ps", exclusive=False).collect()
    }
    assert got == {1: 10, 2: 30, 3: 60}


# ---------------------------------------------------------------------------
# pack_token_stream (concat-and-split)
# ---------------------------------------------------------------------------


def test_pack_token_stream_conserves_tokens_and_fills_windows(spark):
    rng = random.Random(11)
    texts = [" ".join(f"w{rng.randint(0, 30)}" for _ in range(rng.randint(1, 40)))
             for _ in range(60)]
    df = _docs(spark, texts)
    out = pack_token_stream(df, "text", "doc_id", context_len=32).collect()

    # token conservation per doc
    per_doc = {}
    for r in out:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_tokens_in_pack"]
        assert 1 <= r["n_tokens_in_pack"] <= 32
    n_by_id = {i + 1: len(texts[i].split()) for i in range(len(texts))}
    assert per_doc == n_by_id

    # every pack except the last holds exactly context_len tokens
    per_pack = {}
    for r in out:
        per_pack[r["pack_id"]] = per_pack.get(r["pack_id"], 0) + r["n_tokens_in_pack"]
    last = max(per_pack)
    assert set(per_pack) == set(range(last + 1))  # contiguous pack ids
    for pid, tot in per_pack.items():
        if pid != last:
            assert tot == 32, (pid, tot)
    assert 1 <= per_pack[last] <= 32

    # begins_in_pack marks exactly one span per doc — the first one
    begins = [r["doc_id"] for r in out if r["begins_in_pack"]]
    assert sorted(begins) == sorted(n_by_id)


def test_pack_token_stream_doc_longer_than_window_spans_many(spark):
    df = _docs(spark, ["a " * 100])  # 100 tokens (trailing space trimmed)
    out = sorted(
        pack_token_stream(df, "text", "doc_id", context_len=32).collect(),
        key=lambda r: r["pack_id"],
    )
    assert [r["n_tokens_in_pack"] for r in out] == [32, 32, 32, 4]
    assert [r["begins_in_pack"] for r in out] == [True, False, False, False]


def test_pack_token_counts_matches_text_form(spark):
    """The r15 text-free packing tail: pack_token_counts over precomputed
    token counts must emit exactly the spans pack_token_stream derives from
    the text — including empty docs (count 0 → dropped) and docs spanning
    several windows."""
    from cdc_wastewater_analysis_ml_spark.operators.text import token_count

    random.seed(7)
    texts = ["w " * random.randint(0, 40) for _ in range(60)] + ["z " * 120]
    df = _docs(spark, texts)
    via_text = pack_token_stream(df, "text", "doc_id", context_len=32)
    counts = df.select("doc_id", token_count("text").alias("n_tok"))
    via_counts = pack_token_counts(counts, "n_tok", "doc_id", context_len=32)
    a = sorted(map(tuple, via_text.collect()))
    b = sorted(map(tuple, via_counts.collect()))
    assert a == b and len(a) > 60


def test_pack_token_counts_rejects_bad_context(spark):
    with pytest.raises(ValueError):
        pack_token_counts(
            _docs(spark, ["x"]).select("doc_id", F.lit(1).alias("n")),
            "n", "doc_id", context_len=0,
        )


def test_pack_token_stream_rejects_bad_context(spark):
    with pytest.raises(ValueError):
        pack_token_stream(_docs(spark, ["x"]), "text", "doc_id", context_len=0)


# ---------------------------------------------------------------------------
# greedy_pack_by_key (no-split)
# ---------------------------------------------------------------------------


def _greedy_reference(sizes, cap):
    packs, pack, fill = [], -1, 0
    for n in sizes:
        if pack < 0 or fill + n > cap:
            pack, fill = pack + 1, n
        else:
            fill += n
        packs.append(pack)
    return packs


def test_greedy_pack_matches_reference_walk(spark):
    rng = random.Random(3)
    texts, ids, sources = [], [], []
    for i in range(120):
        texts.append(" ".join("t" for _ in range(rng.randint(1, 50))))
        ids.append(i)
        sources.append(f"s{i % 4}")
    df = _docs(spark, texts, ids, sources)
    out = greedy_pack_by_key(
        df, "text", "doc_id", key_col="source", context_len=64
    ).collect()

    by_key = {}
    for r in sorted(out, key=lambda r: (r["source"], r["doc_id"])):
        by_key.setdefault(r["source"], []).append(r)
    for src, rows in by_key.items():
        sizes = [len(texts[r["doc_id"]].split()) for r in rows]
        assert [r["n_doc_tokens"] for r in rows] == sizes
        assert [r["pack_id"] for r in rows] == _greedy_reference(sizes, 64)
        # feasibility: no pack overflows unless it holds one oversized doc
        fills = {}
        for r in rows:
            fills.setdefault(r["pack_id"], []).append(r["n_doc_tokens"])
        for members in fills.values():
            assert sum(members) <= 64 or len(members) == 1


def test_greedy_pack_oversized_doc_gets_own_pack(spark):
    texts = ["w " * 10, "w " * 200, "w " * 10]
    df = _docs(spark, texts)
    rows = sorted(
        greedy_pack_by_key(
            df, "text", "doc_id", key_col="source", context_len=64
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [r["pack_id"] for r in rows] == [0, 1, 2]
    assert rows[1]["pack_fill"] == 200


# ---------------------------------------------------------------------------
# unigram_logprob
# ---------------------------------------------------------------------------


def test_unigram_logprob_hand_computed(spark):
    # corpus: "a a b" + "a c" → counts a:3, b:1, c:1, total 5
    df = _docs(spark, ["a a b", "a c"])
    rows = {r["doc_id"]: r for r in unigram_logprob(df, "text", "doc_id").collect()}
    p = {"a": 3 / 5, "b": 1 / 5, "c": 1 / 5}

    def expect(tokens):
        lp = sum(math.log(p[t]) for t in tokens) / len(tokens)
        return math.floor(lp * 1e6 + 0.5) / 1e6

    assert rows[1]["n_tokens"] == 3
    assert rows[1]["avg_logprob"] == pytest.approx(expect(["a", "a", "b"]), abs=2e-6)
    assert rows[2]["n_tokens"] == 2
    assert rows[2]["avg_logprob"] == pytest.approx(expect(["a", "c"]), abs=2e-6)
    # the common-word doc is "more natural" than the rare-word doc
    assert rows[1]["avg_logprob"] > rows[2]["avg_logprob"]


def test_greedy_pack_generic_key_types(spark):
    # int key + string id: the output schema is derived from the input,
    # not pinned to the registry call's (string key, long id) shape
    df = spark.createDataFrame(
        [(1, "d1", "w w w"), (1, "d2", "w w"), (2, "d3", "w")],
        "shard int, name string, text string",
    )
    out = greedy_pack_by_key(df, "text", "name", key_col="shard", context_len=4)
    assert dict(out.dtypes)["shard"] == "int"
    assert dict(out.dtypes)["name"] == "string"
    rows = sorted(out.collect(), key=lambda r: r["name"])
    assert [r["pack_id"] for r in rows] == [0, 1, 0]


def test_global_prefix_sum_empty_input(spark):
    df = spark.createDataFrame([], "k long, v long")
    assert global_prefix_sum(df, ["k"], "v", out="ps").collect() == []


def test_pack_token_stream_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    # null text and empty text both tokenize to zero countable spans > 0?
    # "" tokenizes to [""] (1 token) per house semantics — it packs;
    # NULL text has NULL count and is excluded by the > 0 filter.
    out = pack_token_stream(df, "text", "doc_id", context_len=8).collect()
    assert [(r["doc_id"], r["n_doc_tokens"]) for r in out] == [(2, 1)]
