"""Line-level dedup semantics (operators/lines.py) on crafted corpora —
the registry gate checks engine parity on the wrapped fixture; these pin
the contract edges a value hash can't isolate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_wastewater_analysis_ml_spark.operators.lines import (
    build_line_store,
    line_occurrence_counts,
    merge_line_counts,
    merge_line_counts_bucketed,
    remove_hot_lines,
    remove_hot_lines_vs_store,
)


def _corpus(spark, docs: dict[int, str]):
    return spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )


def test_threshold_is_strictly_greater(spark):
    """A line at EXACTLY max_occurrences survives; one above it is removed
    everywhere it appears."""
    df = _corpus(
        spark,
        {
            1: "twice\nunique one",
            2: "twice\nthrice",
            3: "thrice\nunique three",
            4: "thrice",
        },
    )
    out = {
        r.doc_id: r
        for r in remove_hot_lines(df, max_occurrences=2).collect()
    }
    assert out[1].text_clean == "twice\nunique one"
    assert out[2].text_clean == "twice"  # 'thrice' (3 > 2) stripped
    assert out[3].text_clean == "unique three"
    assert out[4].text_clean == "" and out[4].lines_kept == 0
    assert out[4].lines_removed == 1


def test_occurrences_count_corpus_wide_including_within_doc(spark):
    """Two occurrences inside ONE doc plus one elsewhere = 3 total: hot at
    max_occurrences=2 even though only two documents carry the line."""
    df = _corpus(spark, {1: "dup\nmiddle\ndup", 2: "dup\nother"})
    out = {
        r.doc_id: r
        for r in remove_hot_lines(df, max_occurrences=2).collect()
    }
    assert out[1].text_clean == "middle" and out[1].lines_removed == 2
    assert out[2].text_clean == "other"
    counts = {
        r.line: (r.n_docs, r.n_occurrences)
        for r in line_occurrence_counts(df).collect()
    }
    assert counts["dup"] == (2, 3)  # n_docs vs n_occurrences distinction


def test_min_chars_exempts_short_lines(spark):
    """Blank/short lines repeat everywhere by nature; with a length floor
    they are never counted as hot, without one they are."""
    docs = {i: f"ab\n\nbody {i}" for i in range(5)}
    df = _corpus(spark, docs)
    floored = {
        r.doc_id: r.text_clean
        for r in remove_hot_lines(df, max_occurrences=2, min_chars=3).collect()
    }
    assert floored[0] == "ab\n\nbody 0"  # 'ab' and '' both exempt
    raw = {
        r.doc_id: r.text_clean
        for r in remove_hot_lines(df, max_occurrences=2, min_chars=0).collect()
    }
    assert raw[0] == "body 0"  # both stripped as hot


def test_order_preserved_across_interleaved_removals(spark):
    """Surviving lines must come back in original order even when removals
    interleave them (reassembly sorts by the original position)."""
    hot = "hot"
    docs = {1: f"a\n{hot}\nb\n{hot}\nc", 2: hot, 3: hot}
    df = _corpus(spark, docs)
    out = {
        r.doc_id: r
        for r in remove_hot_lines(df, max_occurrences=2).collect()
    }
    assert out[1].text_clean == "a\nb\nc"
    assert out[1].lines_kept == 3 and out[1].lines_removed == 2
    assert df.count() == 3  # input untouched


def test_validation_and_plan_shape(spark):
    df = _corpus(spark, {1: "x"})
    with pytest.raises(ValueError, match="max_occurrences"):
        remove_hot_lines(df, max_occurrences=0)
    plan = (
        remove_hot_lines(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vs_store_counts_combine_store_and_delta(spark):
    """Hotness on the ingest path = delta-internal + store occurrences:
    a line the store already knows 3× is stripped from its FIRST delta
    occurrence; store 1 + delta 1 = 2 stays (threshold is strict >)."""
    store = build_line_store(
        _corpus(spark, {1: "known\nknown", 2: "known\nborder"})
    )
    delta = _corpus(spark, {10: "known\nborder\nfresh"})
    out = remove_hot_lines_vs_store(delta, store, max_occurrences=2).collect()
    assert out[0].text_clean == "border\nfresh"  # known: 3+1>2; border: 1+1=2
    assert out[0].lines_removed == 1


def test_vs_store_catches_delta_internal_flood(spark):
    """A brand-new banner flooding a single delta is hot WITHOUT any store
    evidence — delta-internal counts alone cross the threshold."""
    store = build_line_store(_corpus(spark, {1: "old content"}))
    delta = _corpus(
        spark, {10: "new banner\nbody a", 11: "new banner\nbody b",
                12: "new banner\nbody c"}
    )
    out = {
        r.doc_id: r.text_clean
        for r in remove_hot_lines_vs_store(
            delta, store, max_occurrences=2
        ).collect()
    }
    assert out == {10: "body a", 11: "body b", 12: "body c"}


def test_vs_store_min_chars_exemption(spark):
    store = build_line_store(_corpus(spark, {1: "ab\nab\nab"}))
    delta = _corpus(spark, {10: "ab\nreal body"})
    out = remove_hot_lines_vs_store(
        delta, store, max_occurrences=2, min_chars=3
    ).collect()
    assert out[0].text_clean == "ab\nreal body"  # short line exempt


def test_merge_line_counts_equals_from_scratch(spark):
    """Incremental store evolution must converge to the batch count: store
    built on corpus A then merged with delta B == store built on A ∪ B."""
    a = _corpus(spark, {1: "x\ny", 2: "x\nz"})
    b = _corpus(spark, {10: "x\nw", 11: "y"})
    both = a.unionByName(b)
    merged = {
        r.line_dig: r.n
        for r in merge_line_counts(build_line_store(a), b).collect()
    }
    scratch = {r.line_dig: r.n for r in build_line_store(both).collect()}
    assert merged == scratch


def test_hot_set_anti_join_broadcasts(spark):
    """The removal anti-join's build side is the hot digest set — the tiny
    head of the line distribution.  r14 (broadcast audit): AQE REFUSED
    this broadcast at sf10mf (its estimate for an aggregate-after-filter
    is guesswork) and silently shuffled the corpus-sized exploded relation
    on ``__dig`` — so the broadcast is now EXPLICIT under the counted
    ``_DIGEST_BROADCAST_MAX`` gate, deterministic even with the auto
    threshold disabled; this is the plan shape the 100× probe exponent
    (0.234) rests on."""
    docs = {i: f"boilerplate banner\nunique body {i}" for i in range(200)}
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # simulate the sf10mf refusal: estimates alone would never pick BHJ
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = remove_hot_lines(_corpus(spark, docs), max_occurrences=2)
        out.collect()  # AQE finalizes on execution
        plan = out._jdf.queryExecution().executedPlan().toString().lower()
        assert "isfinalplan=true" in plan
        assert "broadcasthashjoin" in plan and "leftanti" in plan, plan[:2000]

        # over the gate (adversarial hot set) the join pins sort-merge —
        # determinism over estimates in both directions
        import cdc_wastewater_analysis_ml_spark.operators.lines as LN

        prev_gate = LN._DIGEST_BROADCAST_MAX
        LN._DIGEST_BROADCAST_MAX = 0
        try:
            fb = remove_hot_lines(_corpus(spark, docs), max_occurrences=2)
            fb_plan = fb._jdf.queryExecution().executedPlan().toString().lower()
            assert "sortmergejoin" in fb_plan and "leftanti" in fb_plan
            assert {r.doc_id: r.text_clean for r in fb.collect()} == {
                r.doc_id: r.text_clean for r in out.collect()
            }
        finally:
            LN._DIGEST_BROADCAST_MAX = prev_gate
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def test_bucketed_line_store_joins_exchange_free(spark, tmp_path):
    """The operators/lines.py docstring promises the 100 TB store is
    bucketed at rest on line_dig so merges and hot-lookups never
    re-shuffle the store.  Pin that composition (the r8 VERDICT task 5
    plan-shape pin): with the store written via sink_parquet_bucketed,

    - merge_line_counts_bucketed exchanges ONLY the delta vocabulary
      (exactly one hash exchange: the delta's own count aggregation —
      which already satisfies the join's distribution),
    - remove_hot_lines_vs_store's store-side lookup rides the bucketing
      through the rename projection (one fewer exchange than the same
      plan over a plain store),

    and both stay result-identical to the unbucketed paths."""
    from cdc_wastewater_analysis_ml_spark.sources.sinks import (
        sink_parquet_bucketed,
    )

    docs = _corpus(
        spark, {i: f"banner line\nbody {i}\nfooter line" for i in range(50)}
    )
    delta = _corpus(
        spark, {100 + i: f"banner line\nfresh {i}" for i in range(10)}
    )
    plain_store = build_line_store(docs)
    spark.sql("DROP TABLE IF EXISTS line_store_b")
    sink_parquet_bucketed(
        plain_store, "line_store_b", ["line_dig"], 8, sort_cols=["line_dig"]
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_abs = spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    )
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # force the shuffle-join path — at 100 TB neither side broadcasts
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # size the session parallelism to the store's bucket count — the
        # real-world sizing rule this layout depends on: EnsureRequirements
        # rides an already-hash-partitioned side only when doing so doesn't
        # LOWER join parallelism below spark.sql.shuffle.partitions; with
        # buckets < partitions it re-shuffles the store side UP instead
        # (measured: 8-bucket store under a 32-partition session = 2
        # exchanges).  At 100 TB the store is bucketed >= the cluster's
        # shuffle parallelism, so the test pins partitions == buckets.
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        # and pin the property under test: the DisableUnnecessaryBucketedScan
        # rule may drop the bucketed scan when it estimates the 8-way
        # bucket parallelism costs more than a 32-way re-shuffle — a
        # fixture-scale heuristic (observed to flip with session history)
        # that inverts at 100 TB, where the bucket count is sized to the
        # cluster and re-shuffling the store is the expensive branch.
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        bucketed = spark.table("line_store_b")

        merged = merge_line_counts_bucketed(bucketed, delta)
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert _n_exchanges(merged) == 1, plan[:3000]
        want = {
            r.line_dig: r.n
            for r in merge_line_counts(plain_store, delta).collect()
        }
        got = {r.line_dig: r.n for r in merged.collect()}
        assert got == want

        # r14 contract: under the delta-vocabulary gate the hot lookup is
        # broadcast-based for ANY store layout — the store is semi-reduced
        # by an explicit broadcast of the delta digest set (map-side
        # filter, zero store-side shuffle), so bucketed and plain stores
        # plan identically (the bucketing advantage remains pinned on the
        # merge above).  Explicit hints override the disabled
        # auto-threshold — that is the point (the r13
        # AQE-refused-broadcast lesson).
        lookup_bucketed = remove_hot_lines_vs_store(
            delta, bucketed, max_occurrences=2
        )
        lookup_plain = remove_hot_lines_vs_store(
            delta, plain_store, max_occurrences=2
        )
        import re as _re

        for lookup in (lookup_bucketed, lookup_plain):
            plan = lookup._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" in plan, plan[:3000]
            # no sort-merge join on the digest key anywhere: the store
            # lookup and the removal anti-join are both broadcast-based
            # (the doc_id reassembly join may stay SMJ — that one is
            # corpus-sized on both sides by design)
            assert not _re.search(r"SortMergeJoin \[__dig", plan), plan[:3000]
        # and the bucketed scan is never re-shuffled on its own key
        assert "hashpartitioning(line_dig" not in (
            lookup_bucketed._jdf.queryExecution().executedPlan().toString()
        )
        a = {r.doc_id: r.text_clean for r in lookup_bucketed.collect()}
        b = {r.doc_id: r.text_clean for r in lookup_plain.collect()}
        assert a == b and a[100] == "fresh 0"  # banner hot from store side

        # Over the gate (corpus-sized delta) the pre-r14 sort-merge shape
        # returns, and there the bucketed store still saves the store-side
        # exchange — the original r8 pin, now on the fallback leg.
        import cdc_wastewater_analysis_ml_spark.operators.lines as LN

        prev_gate = LN._DIGEST_BROADCAST_MAX
        LN._DIGEST_BROADCAST_MAX = 0
        try:
            fb_bucketed = remove_hot_lines_vs_store(
                delta, bucketed, max_occurrences=2
            )
            fb_plain = remove_hot_lines_vs_store(
                delta, plain_store, max_occurrences=2
            )
            # strictly fewer exchanges (not an exact count: the r14 hot-set
            # cache makes shared subtrees render as InMemoryTableScan, so
            # string-level exchange multiplicity is no longer stable)
            assert _n_exchanges(fb_bucketed) < _n_exchanges(fb_plain)
            assert "hashpartitioning(line_dig" not in (
                fb_bucketed._jdf.queryExecution().executedPlan().toString()
            )
            fa = {r.doc_id: r.text_clean for r in fb_bucketed.collect()}
            assert fa == a
        finally:
            LN._DIGEST_BROADCAST_MAX = prev_gate
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev_abs
        )
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        spark.sql("DROP TABLE IF EXISTS line_store_b")


def test_merge_bucketed_equals_union_merge_on_disjoint_and_overlap(spark):
    """Full-outer + sum must agree with union + re-sum on all three key
    classes: store-only, delta-only, and overlapping digests."""
    store_docs = _corpus(spark, {1: "both\nstore only"})
    delta = _corpus(spark, {10: "both\ndelta only\nboth"})
    store = build_line_store(store_docs)
    via_join = {
        r.line_dig: r.n
        for r in merge_line_counts_bucketed(store, delta).collect()
    }
    via_union = {
        r.line_dig: r.n for r in merge_line_counts(store, delta).collect()
    }
    assert via_join == via_union and len(via_join) == 3
    assert sorted(via_join.values()) == [1, 1, 3]


def test_every_input_doc_keeps_a_row(spark):
    """Even a fully-boilerplate document must come back (as an empty
    string), or downstream joins silently drop corpus rows."""
    docs = {i: "only boilerplate" for i in range(4)}
    docs[99] = "real content"
    out = remove_hot_lines(_corpus(spark, docs), max_occurrences=2)
    assert out.count() == 5
    empties = out.filter(F.col("text_clean") == "").count()
    assert empties == 4
