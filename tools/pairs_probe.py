"""Pairs-vs-bytes isolation for the seg2 dedup byte slope (VERDICT r13
task 1, option b).

The open question from r13: `dedup_lsh_verified` / `dedup_cluster_cc` read
a seg2 (sf1mf → sf10mf) shuffle-byte exponent of ~1.63-1.64 on the
closed-vocab canonical ladder after the prepart adoption.  The standing
diagnosis — candidate-PAIR count grows superlinearly at the fixture's
fixed 31-word vocabulary while the verify's bytes are linear in pairs by
construction — was plausible but had no committed experiment isolating
pairs from bytes.  This tool commits that experiment.

Per rung (default: the canonical mid-rung ladder sf0.1mf / sf1mf / sf10mf,
plus the open-vocab pair ov1 / ov100 when present) it measures, in one
probe session:

- ``n_docs``             — augmented corpus size (the query's actual input),
- ``bucket_pairs``       — Σ n·(n−1)/2 over (band, key) buckets: the LSH
                           self-join's exact output volume (cross-band
                           duplicates included),
- ``candidate_pairs``    — distinct (id_a, id_b): the verify stage's input,
- ``verified_pairs``     — query output rows (jaccard ≥ threshold): also
                           `dedup_cluster_cc`'s edge count,
- ``query_shuffle_mb``   — full `dedup_lsh_verified` run, REST stage deltas
                           (same counters as tools/scale_probe).

Derived per adjacent rung pair: exponents for each series
(log(ratio)/log(factor)) and ``mb_per_1k_candidates`` — if bytes-per-pair
is flat across rungs while the pair count carries the superlinear slope,
the byte exponent is the CANDIDATE DENSITY of the corpus (a data
property), not a plan defect; the plan's contract is then "shuffle bytes
linear in candidate pairs", pinned at the dispatch-site docstring.

Usage:
    python -m tools.gen_scale_fixture /tmp/spark_graft_sf01_mf 1 0 32
    python -m tools.gen_scale_fixture /tmp/spark_graft_sf1_mf 10 0 32
    python -m tools.gen_scale_fixture /tmp/spark_graft_sf10_mf 100 0 32
    python -m tools.gen_scale_fixture /tmp/spark_graft_ov1 1 160
    python -m tools.gen_scale_fixture /tmp/spark_graft_ov100 100 2600
    python -m tools.pairs_probe            # writes PROBE_PAIRS_r{N}.json
"""

from __future__ import annotations

import gc
import json
import math
import os
import sys

from pyspark.sql import functions as F

from tools.scale_probe import build_session, rest_shuffle_totals, _force
from tools.staleness import current_round, repo_root

#: (label, dir) rungs, grouped into ladders so exponents only compare
#: within a vocabulary regime.
LADDERS = {
    "closed_vocab_mf": [
        ("sf0.1mf", "/tmp/spark_graft_sf01_mf", 5_000),
        ("sf1mf", "/tmp/spark_graft_sf1_mf", 50_000),
        ("sf10mf", "/tmp/spark_graft_sf10_mf", 500_000),
    ],
    "open_vocab": [
        ("ov1", "/tmp/spark_graft_ov1", 5_000),
        ("ov100", "/tmp/spark_graft_ov100", 500_000),
    ],
}

#: The query's exact LSH parameters (plans/registry_scale.py
#: q_dedup_lsh_verified): 8 minhashes, 4 bands (r = 2), 3-word shingles,
#: verify threshold 0.3.
NUM_HASHES, BANDS, SHINGLE_N, THRESHOLD = 8, 4, 3, 0.3


def _measure_rung(spark, label: str, sf_dir: str) -> dict:
    from cdc_wastewater_analysis_ml_spark.operators import dedup as D
    from cdc_wastewater_analysis_ml_spark.plans.registry import QUERIES
    from cdc_wastewater_analysis_ml_spark.plans.registry_ext import (
        _augmented_docs,
    )

    docs = _augmented_docs(spark, sf_dir)
    n_docs = docs.count()

    # Counting pass: banded once, bucket stats + distinct pairs off the
    # same persisted relation (mirrors minhash_lsh_candidates' internals
    # but aggregates instead of returning the pair relation).
    banded = D.banded_minhash(
        docs, "text", "doc_id", NUM_HASHES, BANDS, SHINGLE_N
    ).persist()
    stats = (
        D.lsh_bucket_stats(banded)
        .agg(
            F.sum("candidate_pairs").alias("bucket_pairs"),
            F.max("max_bucket").alias("max_bucket"),
        )
        .first()
    )
    a, b = banded.alias("a"), banded.alias("b")
    candidate_pairs = (
        a.join(
            b,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_key") == F.col("b.band_key"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
        .count()
    )
    banded.unpersist()

    # Bytes pass: the production query, REST deltas around one forced run.
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    w0, r0 = rest_shuffle_totals(spark)
    df = QUERIES["dedup_lsh_verified"](spark, sf_dir)
    _force(df)
    w1, r1 = rest_shuffle_totals(spark)
    verified_pairs = df.count()
    del df
    gc.collect()

    rec = {
        "label": label,
        "n_docs": n_docs,
        "bucket_pairs": int(stats["bucket_pairs"]),
        "max_bucket": int(stats["max_bucket"]),
        "candidate_pairs": candidate_pairs,
        "verified_pairs": verified_pairs,
        "query_shuffle_write_mb": round((w1 - w0) / 1e6, 1),
        "mb_per_1k_candidates": round(
            (w1 - w0) / 1e6 / max(candidate_pairs / 1e3, 1e-9), 4
        ),
    }
    print(json.dumps(rec), flush=True)
    return rec


def _exponents(small: dict, big: dict, factor: float) -> dict:
    out = {}
    for k in (
        "bucket_pairs",
        "candidate_pairs",
        "verified_pairs",
        "query_shuffle_write_mb",
    ):
        lo, hi = small[k], big[k]
        out[f"{k}_exp"] = (
            round(math.log(hi / lo) / math.log(factor), 3) if lo else None
        )
    out["mb_per_1k_candidates_ratio"] = round(
        big["mb_per_1k_candidates"] / max(small["mb_per_1k_candidates"], 1e-9),
        3,
    )
    return out


def main() -> int:
    root = repo_root()
    rnd = current_round(root)
    out_name = os.environ.get(
        "SPARK_GRAFT_PAIRS_OUT", f"PROBE_PAIRS_r{rnd:02d}.json"
    )
    spark = build_session("pairs_probe", port=4053)
    record: dict = {"params": {
        "num_hashes": NUM_HASHES, "bands": BANDS,
        "shingle_n": SHINGLE_N, "threshold": THRESHOLD,
    }, "ladders": {}}
    try:
        for ladder, rungs in LADDERS.items():
            present = [r for r in rungs if os.path.isdir(r[1])]
            if len(present) < 2:
                print(f"skipping {ladder}: fixtures missing", file=sys.stderr)
                continue
            measured = [
                _measure_rung(spark, label, d) for label, d, _ in present
            ]
            segs = {}
            for (sl, _, sn), (bl, _, bn), s_rec, b_rec in zip(
                present, present[1:], measured, measured[1:]
            ):
                segs[f"{sl}->{bl}"] = _exponents(s_rec, b_rec, bn / sn)
            record["ladders"][ladder] = {"rungs": measured, "segments": segs}
    finally:
        spark.stop()
    out = root / out_name
    out.write_text(json.dumps(record, indent=1) + "\n")
    print(json.dumps({"out": str(out)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
