"""Batch/streaming parity (SURVEY §5.2.5): the streaming variants computed
over the events fixture must agree with the batch operators once all data is
processed."""


import pytest
from pyspark.sql import functions as F

from cdc_wastewater_analysis_ml_spark.operators import aggregates as A
from cdc_wastewater_analysis_ml_spark.operators import windows as W
from cdc_wastewater_analysis_ml_spark.sources import load_table
from cdc_wastewater_analysis_ml_spark.streaming import (
    read_events_stream,
    stream_conditional_rate,
    stream_lag_per_key,
    stream_weekly_mean,
)


@pytest.fixture(scope="module")
def stream_dir(spark, sf_small, tmp_path_factory):
    """Materialize events (with repaired timestamps) into a streaming source
    dir — the raw fixture stores nanos timestamps streaming readers can't
    take directly, so this mirrors a real bronze→silver layout."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_small, "events").write.mode("overwrite").parquet(d)
    return d


def _drain(q, timeout=300):
    """awaitTermination with fail-loud timeout handling (r9 ADVICE): a hung
    availableNow stream must surface as a timeout here, not as a confusing
    downstream parity-assert failure on a partial sink."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise AssertionError(f"stream did not drain in {timeout} s")


def _run_to_memory(spark, sdf, name, mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, 120)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_weekly_mean_matches_batch(spark, sf_small, stream_dir):
    # complete mode: append would withhold the trailing windows the watermark
    # has not closed when the finite stream ends (correct streaming behavior;
    # parity here is about the *values*, so emit every window).
    sdf = stream_weekly_mean(read_events_stream(spark, stream_dir))
    got = _run_to_memory(spark, sdf, "weekly_mean_sink", "complete").toPandas()
    expected = (
        A.agg_mean_resampled(load_table(spark, sf_small, "events"), "ts", "value")
        .toPandas()
    )
    got = got.sort_values("week_start").reset_index(drop=True)
    expected = expected.sort_values("week_start").reset_index(drop=True)
    assert len(got) == len(expected)
    assert (got["week_start"].to_numpy() == expected["week_start"].to_numpy()).all()
    assert (abs(got["avg_value"] - expected["avg_value"]) < 1e-9).all()


def test_stream_conditional_rate_matches_batch(spark, sf_small, stream_dir):
    sdf = stream_conditional_rate(read_events_stream(spark, stream_dir), 50.0)
    got = _run_to_memory(spark, sdf, "cond_rate_sink", "complete").toPandas()
    ev = load_table(spark, sf_small, "events").withColumn(
        "flag", F.when(F.col("value") > 50.0, 1).otherwise(0)
    ).withColumn("day_start", F.date_trunc("day", "ts"))
    expected = (
        ev.groupBy("day_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("total"),
            (F.lit(100.0) * F.avg("flag")).alias("detection_rate"),
        )
        .toPandas()
    )
    key = ["day_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    expected = expected.sort_values(key).reset_index(drop=True)
    assert len(got) == len(expected)
    assert (got["total"].to_numpy() == expected["total"].to_numpy()).all()
    assert (abs(got["detection_rate"] - expected["detection_rate"]) < 1e-9).all()


def test_stream_lag_matches_batch(spark, sf_small, stream_dir):
    sdf = stream_lag_per_key(read_events_stream(spark, stream_dir))
    got = _run_to_memory(spark, sdf, "lag_sink", "append").toPandas()
    expected = (
        W.window_lag(
            load_table(spark, sf_small, "events"),
            ["user_id"],
            ["ts", "event_id"],
            "value",
            offsets=(1, 2),
            default=0.0,
        )
        .select("event_id", "value_lag1", "value_lag2")
        .toPandas()
    )
    got = got.sort_values("event_id").reset_index(drop=True)
    expected = expected.sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(expected)
    assert (abs(got["value_lag1"] - expected["value_lag1"]) < 1e-9).all()
    assert (abs(got["value_lag2"] - expected["value_lag2"]) < 1e-9).all()


def test_stream_interval_join_matches_batch_and_bounds(spark, tmp_path):
    """Crafted input pinning the interval-join boundary semantics: both
    range endpoints are INCLUSIVE ([l_ts − lookback, l_ts]), future clicks
    and other users never match, and the streamed result equals the batch
    join."""
    import datetime as dt

    from cdc_wastewater_analysis_ml_spark.streaming import stream_interval_join
    from cdc_wastewater_analysis_ml_spark.streaming.ops import EVENTS_SCHEMA

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, minutes, user, typ):
        return (eid, t0 + dt.timedelta(minutes=minutes), user, typ, 0.0, "{}")

    rows = [
        ev(1, 0, 1, "purchase"),
        ev(2, -30, 1, "click"),   # exactly lookback before → inclusive lower
        ev(3, 0, 1, "click"),     # same instant → inclusive upper
        ev(4, -31, 1, "click"),   # one minute too old → excluded
        ev(5, 1, 1, "click"),     # after the purchase → excluded
        ev(6, -5, 2, "click"),    # other user → excluded
    ]
    d = str(tmp_path / "iv_events")
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(d)
    src = read_events_stream(spark, d)
    out = _run_to_memory(
        spark,
        stream_interval_join(src, "user_id", "purchase", "click",
                             "30 minutes", "10 minutes"),
        "iv_join",
        "append",
    )
    got = {(r["l_id"], r["r_id"]) for r in out.collect()}
    assert got == {(1, 2), (1, 3)}


def test_stream_session_windows_prefix_of_batch(spark, sf_small, stream_dir):
    from cdc_wastewater_analysis_ml_spark.streaming import stream_session_windows

    sdf = stream_session_windows(read_events_stream(spark, stream_dir))
    got = _run_to_memory(spark, sdf, "session_sink", "append").toPandas()
    batch = A.agg_session_windows(
        load_table(spark, sf_small, "events"), "user_id", "ts", "30 minutes"
    ).toPandas()
    key = ["user_id", "session_start", "session_end", "n_events"]
    got_set = {tuple(r) for r in got[key].itertuples(index=False)}
    batch_set = {tuple(r) for r in batch[key].itertuples(index=False)}
    # append emits only watermark-closed sessions: exact subset, no phantoms
    assert got_set <= batch_set
    assert len(got_set) > 0  # the 1h watermark closes almost every session
    missing = batch_set - got_set
    # only trailing sessions (near the max event time) may be withheld
    max_end = max(e for _, _, e, _ in batch_set)
    import pandas as pd

    for _, _, end, _ in missing:
        assert end >= max_end - pd.Timedelta(hours=2), (end, max_end)


def test_stream_lag_reordered_multifile_cross_batch_disorder(spark, tmp_path):
    """DEVNOTES item 4 closure: a 3-file source where 10-row blocks are
    SWAPPED across file boundaries (a row's newer siblings arrive one
    micro-batch earlier), maxFilesPerTrigger=1 and Arrow chunks of 32.
    stream_lag_per_key_reordered must (a) emit every row the final watermark
    released, exactly once, as a contiguous event-time prefix per key, and
    (b) reproduce the batch window_lag values exactly — the cross-batch
    disorder the plain stream_lag_per_key documents as unhandled."""
    import os

    import numpy as np
    import pandas as pd

    from cdc_wastewater_analysis_ml_spark.streaming import (
        stream_lag_per_key_reordered,
    )

    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
    n = 400
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": (base + pd.to_timedelta(np.arange(n), unit="m")).astype("datetime64[us]"),
        "user_id": (np.arange(n) % 2).astype(np.int64),
        "event_type": "a",
        "value": (np.arange(n) * 1.5).astype(np.float64),
        "props": "{}",
    })
    fidx = np.repeat([0, 1, 2], [134, 133, 133])
    fidx[124:134], fidx[134:144] = 1, 0   # early rows arrive a batch LATE
    fidx[257:267], fidx[267:277] = 2, 1
    d = str(tmp_path / "src")
    os.makedirs(d, exist_ok=True)
    for k in range(3):
        part = df[fidx == k].sample(frac=1.0, random_state=k)  # in-batch shuffle
        f = f"{d}/f{k}.parquet"
        part.to_parquet(f, index=False)
        os.utime(f, (1_700_000_000 + 1000 * k,) * 2)  # deterministic file order

    src = read_events_stream(spark, d, maxFilesPerTrigger=1)  # SOURCE option
    sdf = stream_lag_per_key_reordered(src, "30 minutes")
    q = (
        sdf.writeStream.format("memory").queryName("reord_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    _drain(q)
    # the disorder must actually straddle micro-batches: 3 files → ≥3 batches
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 3
    got = spark.sql("SELECT * FROM reord_sink").toPandas()

    # final watermark = max ts - 30 min -> exactly the first 370 rows emitted
    assert len(got) == 370 and got["event_id"].is_unique
    for u in (0, 1):
        eids = sorted(got[got.user_id == u]["event_id"])
        assert eids == list(range(u, 370, 2))  # contiguous event-time prefix

    exp = W.window_lag(
        spark.createDataFrame(df), ["user_id"], ["ts", "event_id"], "value",
        offsets=(1, 2), default=0.0, out_prefix="value_lag",
    ).toPandas()
    m = got.merge(exp[["event_id", "value_lag1", "value_lag2"]],
                  on="event_id", suffixes=("_g", "_e"))
    assert (m["value_lag1_g"] == m["value_lag1_e"]).all()
    assert (m["value_lag2_g"] == m["value_lag2_e"]).all()


def test_stream_lag_event_time_tws_gate(spark):
    """The transformWithStateInPandas variant needs protobuf for its state
    protocol: without it the op must fail FAST with an actionable ImportError
    (not a mid-query driver-worker crash); with it, the op builds a plan."""
    from cdc_wastewater_analysis_ml_spark.streaming import (
        stream_lag_per_key_event_time,
    )

    events = spark.readStream.format("rate").load().selectExpr(
        "value AS event_id", "timestamp AS ts", "value % 2 AS user_id",
        "'a' AS event_type", "CAST(value AS DOUBLE) AS value", "'{}' AS props"
    )
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="protobuf"):
            stream_lag_per_key_event_time(events)
    else:
        assert stream_lag_per_key_event_time(events).isStreaming


def test_stream_dedup_within_watermark_bounded_state_contract(spark, tmp_path):
    """The bounded-state dedup contract, both directions: a duplicate WITHIN
    the event-time horizon is dropped; a duplicate BEYOND it re-emits
    (its predecessor's state expired with the watermark) — the price of
    O(horizon) state on a forever-running ingest."""
    import os

    import pandas as pd

    from cdc_wastewater_analysis_ml_spark.streaming import (
        stream_dedup_within_watermark,
    )

    t0 = pd.Timestamp("2024-01-01")

    def mk(rows):
        return pd.DataFrame({
            "event_id": range(len(rows)),
            "ts": pd.Series([t0 + pd.Timedelta(r[1]) for r in rows]).astype("datetime64[us]"),
            "user_id": [r[0] for r in rows],
            "event_type": "a",
            "value": 1.0,
            "props": "{}",
        })

    d = str(tmp_path / "dedup_src")
    os.makedirs(d)
    # file 0: K=1 at t0; filler advances the watermark to t0+26h after batch
    # 0, STRICTLY past K=1's state expiry t0+24h (an exact tie would probe
    # Spark's eviction boundary, not the contract).  State eviction runs at
    # the END of a batch with that batch's incoming watermark, so K=1's
    # expired state is gone only after batch 1 — the re-admitted duplicate
    # must arrive in batch 2.
    mk([(1, "0h"), (9, "50h"), (3, "47h")]).to_parquet(f"{d}/f0.parquet", index=False)
    # file 1: K=3 again 1h later (within horizon -> dropped as duplicate)
    mk([(3, "48h")]).to_parquet(f"{d}/f1.parquet", index=False)
    # file 2: K=1 again at t0+3d (beyond the 1d horizon -> re-emits)
    mk([(1, "72h")]).to_parquet(f"{d}/f2.parquet", index=False)
    for k in range(3):
        os.utime(f"{d}/f{k}.parquet", (1_700_000_000 + 1000 * k,) * 2)

    src = read_events_stream(spark, d, maxFilesPerTrigger=1)
    sdf = stream_dedup_within_watermark(src, ["user_id"], "1 day")
    q = (
        sdf.writeStream.format("memory").queryName("dd_wm_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    _drain(q, 120)
    got = spark.sql("SELECT user_id, ts FROM dd_wm_sink").toPandas()
    counts = got.groupby("user_id").size().to_dict()
    assert counts == {1: 2, 3: 1, 9: 1}, counts  # K=1 re-admitted, K=3 deduped


def test_stream_sink_parquet_exactly_once_across_restart(spark, tmp_path):
    """File-source checkpoint + file-sink transaction log = end-to-end
    exactly-once: a restart after new source files arrive appends ONLY the
    new rows — no duplicates, no gaps (the canonical bronze->silver loop)."""
    import os

    import numpy as np
    import pandas as pd

    from cdc_wastewater_analysis_ml_spark.streaming import stream_sink_parquet

    def mk(ids):
        return pd.DataFrame({
            "event_id": np.asarray(ids, dtype=np.int64),
            "ts": pd.Series([pd.Timestamp("2024-01-01")] * len(ids)).astype("datetime64[us]"),
            "user_id": np.zeros(len(ids), dtype=np.int64),
            "event_type": "a",
            "value": 1.0,
            "props": "{}",
        })

    src_dir, out_dir, ckpt = (str(tmp_path / n) for n in ("src", "out", "ckpt"))
    os.makedirs(src_dir)
    mk(range(100)).to_parquet(f"{src_dir}/f0.parquet", index=False)

    for expected in (100, 250):
        q = stream_sink_parquet(
            read_events_stream(spark, src_dir).select("event_id", "user_id"),
            out_dir, ckpt,
        )
        _drain(q, 120)
        got = spark.read.parquet(out_dir)
        assert got.count() == expected
        assert got.select("event_id").distinct().count() == expected
        if expected == 100:  # arrange the restart: 150 NEW rows
            mk(range(100, 250)).to_parquet(f"{src_dir}/f1.parquet", index=False)


def test_stream_line_dedup_matches_batch_and_merged_store(spark, sf_small, tmp_path):
    """foreachBatch line-level dedup (streaming/lines.py): with a static
    store the per-micro-batch cleaned union must equal the one-shot
    remove_hot_lines_vs_store over the whole delta (boilerplate heat is
    store-side in this fixture), the run must actually be incremental
    (>= 3 micro-batches), and the counts side-output re-summed with the
    store must equal the one-shot merge_line_counts — the order-independent
    store-refresh half of the contract."""
    from cdc_wastewater_analysis_ml_spark.operators.lines import (
        build_line_store,
        merge_line_counts,
        remove_hot_lines_vs_store,
    )
    from cdc_wastewater_analysis_ml_spark.plans.registry_lines import (
        _lined_delta,
        _lined_docs,
    )
    from cdc_wastewater_analysis_ml_spark.streaming import (
        merged_store,
        read_docs_stream,
        stream_line_dedup,
    )

    store = build_line_store(_lined_docs(spark, sf_small))
    delta = _lined_delta(spark, sf_small)
    src, sink, counts, ckpt = (
        str(tmp_path / n) for n in ("src", "sink", "counts", "ckpt")
    )
    delta.repartition(3).write.mode("overwrite").parquet(src)

    q = stream_line_dedup(
        read_docs_stream(spark, src, maxFilesPerTrigger=1),
        store, sink, counts, ckpt, max_occurrences=2, min_chars=1,
    )
    _drain(q)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3, f"expected >=3 micro-batches, got {n_batches}"

    got = {
        r.doc_id: (r.text_clean, r.lines_kept, r.lines_removed)
        for r in spark.read.parquet(sink)
        .select("doc_id", "text_clean", "lines_kept", "lines_removed")
        .collect()
    }
    want = {
        r.doc_id: (r.text_clean, r.lines_kept, r.lines_removed)
        for r in remove_hot_lines_vs_store(
            delta, store, max_occurrences=2, min_chars=1
        ).collect()
    }
    assert got == want and len(want) > 0

    refreshed = {
        r.line_dig: r.n
        for r in merged_store(
            store, spark.read.parquet(counts).select("line_dig", "n")
        ).collect()
    }
    one_shot = {
        r.line_dig: r.n for r in merge_line_counts(store, delta).collect()
    }
    assert refreshed == one_shot


def test_stream_near_dedup_matches_batch_and_is_multi_batch(spark, sf_small, tmp_path):
    """foreachBatch incremental near-dedup (streaming/neardup.py): with a
    static store, the union of per-micro-batch survivor sets must equal the
    one-shot batch dedup_incremental_near over the whole delta — and the
    run must actually be incremental (>= 3 micro-batches: one per ingest
    file under maxFilesPerTrigger=1), or the parity assertion is vacuous."""
    from cdc_wastewater_analysis_ml_spark.operators.dedup import (
        dedup_incremental_near,
    )
    from cdc_wastewater_analysis_ml_spark.plans.registry_stream_ext import (
        _delta_docs,
    )
    from cdc_wastewater_analysis_ml_spark.streaming import (
        read_docs_stream,
        stream_dedup_incremental_near,
    )

    store = load_table(spark, sf_small, "documents").select("doc_id", "text")
    delta = _delta_docs(spark, sf_small)
    src, sink, ckpt = (str(tmp_path / n) for n in ("src", "sink", "ckpt"))
    delta.repartition(3).write.mode("overwrite").parquet(src)

    q = stream_dedup_incremental_near(
        read_docs_stream(spark, src, maxFilesPerTrigger=1),
        store, sink, ckpt, threshold=0.3,
    )
    _drain(q)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3, f"expected >=3 micro-batches, got {n_batches}"

    got = sorted(
        r["doc_id"] for r in spark.read.parquet(sink).select("doc_id").collect()
    )
    want = sorted(
        r["doc_id"]
        for r in dedup_incremental_near(
            delta, store, "text", "doc_id", threshold=0.3
        ).select("doc_id").collect()
    )
    assert got == want and len(want) > 0


def test_stream_incremental_ingest_matches_batch_chain(spark, sf_small, tmp_path):
    """foreachBatch ingest composite (streaming/ingest.py): with static
    stores, the union of per-micro-batch survivor sets must equal the
    one-shot batch chain (line clean → exact-vs-store → near-vs-store →
    quality gate) over the whole 4-slice crawl, the run must actually be
    incremental (>= 3 micro-batches), survivors must be exactly the novel
    slice (every other slice dies at its designated stage — the same
    attribution the batch composite test proves), and the counts
    side-output re-summed with the store must equal the one-shot
    merge_line_counts."""
    from cdc_wastewater_analysis_ml_spark.operators import text as T
    from cdc_wastewater_analysis_ml_spark.operators.dedup import (
        dedup_incremental_exact,
        dedup_incremental_near,
    )
    from cdc_wastewater_analysis_ml_spark.operators.lines import (
        build_line_store,
        merge_line_counts,
        remove_hot_lines_vs_store,
    )
    from cdc_wastewater_analysis_ml_spark.plans.registry_ext import _NOVEL_OFFSET
    from cdc_wastewater_analysis_ml_spark.plans.registry_lines import (
        _ingest_delta,
        _lined_docs,
    )
    from cdc_wastewater_analysis_ml_spark.sources import load_table
    from cdc_wastewater_analysis_ml_spark.streaming import (
        merged_store,
        read_docs_stream,
        stream_incremental_ingest,
    )
    from pyspark.sql import functions as F

    store_raw = load_table(spark, sf_small, "documents").select("doc_id", "text")
    line_store = build_line_store(_lined_docs(spark, sf_small))
    delta = _ingest_delta(spark, sf_small)
    src, sink, counts, ckpt = (
        str(tmp_path / n) for n in ("src", "sink", "counts", "ckpt")
    )
    delta.repartition(3).write.mode("overwrite").parquet(src)

    q = stream_incremental_ingest(
        read_docs_stream(spark, src, maxFilesPerTrigger=1),
        line_store, store_raw, sink, counts, ckpt,
        max_occurrences=2, min_chars=0, threshold=0.3, min_tokens=6,
    )
    _drain(q)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3, f"expected >=3 micro-batches, got {n_batches}"

    got = {
        (r.doc_id, r.text)
        for r in spark.read.parquet(sink).select("doc_id", "text").collect()
    }
    cleaned = remove_hot_lines_vs_store(
        delta, line_store, max_occurrences=2, min_chars=0
    ).select("doc_id", F.col("text_clean").alias("text"))
    one_shot = dedup_incremental_near(
        dedup_incremental_exact(cleaned, store_raw, "text", "doc_id"),
        store_raw, "text", "doc_id", threshold=0.3,
    ).filter(T.token_count("text") >= 6)
    want = {(r.doc_id, r.text) for r in one_shot.collect()}
    assert got == want and len(want) > 0
    # Stage attribution: only the novel slice survives all four gates.
    assert all(
        _NOVEL_OFFSET <= doc_id < _NOVEL_OFFSET + 10_000_000_000
        for doc_id, _ in got
    )

    refreshed = {
        r.line_dig: r.n
        for r in merged_store(
            line_store, spark.read.parquet(counts).select("line_dig", "n")
        ).collect()
    }
    want_counts = {
        r.line_dig: r.n for r in merge_line_counts(line_store, delta).collect()
    }
    assert refreshed == want_counts


def test_stream_incremental_ingest_replayed_batch_is_idempotent(
    spark, sf_small, tmp_path
):
    """foreachBatch is at-least-once: if the process dies AFTER a batch's
    sink writes but BEFORE its checkpoint commit lands, the restarted
    query re-runs the same batch_id with the same data.  The composite's
    retry-idempotence claim (overwrite into per-batch ``batch_id=N/``
    dirs) must hold under that replay: survivors are not duplicated and —
    the sharper hazard — the counts side-output is not double-counted
    into the store refresh.  Simulated faithfully by deleting the LAST
    checkpoint commit file (the offsets log survives, so the restart
    reconstructs the identical batch) and restarting."""
    from pathlib import Path

    from cdc_wastewater_analysis_ml_spark.operators.lines import build_line_store
    from cdc_wastewater_analysis_ml_spark.plans.registry_lines import (
        _ingest_delta,
        _lined_docs,
    )
    from cdc_wastewater_analysis_ml_spark.sources import load_table
    from cdc_wastewater_analysis_ml_spark.streaming import (
        read_docs_stream,
        stream_incremental_ingest,
    )

    store_raw = load_table(spark, sf_small, "documents").select("doc_id", "text")
    line_store = build_line_store(_lined_docs(spark, sf_small))
    src, sink, counts, ckpt = (
        str(tmp_path / n) for n in ("src", "sink", "counts", "ckpt")
    )
    _ingest_delta(spark, sf_small).repartition(3).write.mode(
        "overwrite"
    ).parquet(src)

    def run():
        q = stream_incremental_ingest(
            read_docs_stream(spark, src, maxFilesPerTrigger=1),
            line_store, store_raw, sink, counts, ckpt,
            max_occurrences=2, min_chars=0, threshold=0.3, min_tokens=6,
        )
        _drain(q)
        return q

    run()
    survivors = sorted(
        (r.doc_id, r.text)
        for r in spark.read.parquet(sink).select("doc_id", "text").collect()
    )
    count_totals = sorted(
        (r.line_dig, r.n)
        for r in spark.read.parquet(counts).select("line_dig", "n").collect()
    )
    assert len(survivors) > 0 and len(count_totals) > 0

    commits = sorted(
        (p for p in Path(ckpt, "commits").iterdir() if p.name.isdigit()),
        key=lambda p: int(p.name),
    )
    assert len(commits) >= 3  # one per ingest file under maxFilesPerTrigger=1
    commits[-1].unlink()  # die between sink write and checkpoint commit
    # The local checksummed FS leaves a .N.crc sidecar the crashed process
    # would never have written; left behind it fails the replay's atomic
    # commit rename (FileAlreadyExists -> misreported as a concurrent
    # query), so remove it with the commit file it shadows.
    crc = commits[-1].with_name(f".{commits[-1].name}.crc")
    if crc.exists():
        crc.unlink()

    q2 = run()
    replayed = [p for p in q2.recentProgress if p["numInputRows"] > 0]
    assert replayed, "restart must actually re-run the uncommitted batch"

    assert sorted(
        (r.doc_id, r.text)
        for r in spark.read.parquet(sink).select("doc_id", "text").collect()
    ) == survivors
    assert sorted(
        (r.line_dig, r.n)
        for r in spark.read.parquet(counts).select("line_dig", "n").collect()
    ) == count_totals
