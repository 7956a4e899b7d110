"""Fixed-eval contamination probe (VERDICT r13 task 4).

`corpus_contamination`'s seg2 byte exponent reads ~1.89 on the canonical
ladder because the FIXTURE's eval side (every 5th doc) scales with the
corpus and crosses the broadcast cap between sf1mf and sf10mf — a
fixture-driven regime crossing, profiled in DEVNOTES r13.  The documented
claim — "real eval suites are fixed-size ⇒ the slope is the linear train
explode" — had no committed measurement.  This tool commits it: the eval
digest set is HELD at the sf1mf shape (every 5th doc of the sf1mf corpus)
while the train side scales sf1mf → sf10mf, and the byte exponent over
that segment is recorded.  Expectation: ≈ 1.0 (the train-side shingle
explode is the only scaling term).

Usage:
    python -m tools.contamination_probe   # writes PROBE_CONTAM_FIXED_r{N}.json
"""

from __future__ import annotations

import gc
import json
import math
import sys

from pyspark.sql import functions as F

from tools.scale_probe import build_session, rest_shuffle_totals, _force
from tools.staleness import current_round, repo_root

EVAL_DIR = "/tmp/spark_graft_sf1_mf"
TRAIN_RUNGS = [
    ("sf1mf", "/tmp/spark_graft_sf1_mf"),
    ("sf10mf", "/tmp/spark_graft_sf10_mf"),
]


def main() -> int:
    root = repo_root()
    rnd = current_round(root)
    spark = build_session("contamination_probe", port=4055)
    spark.sparkContext.setLogLevel("ERROR")
    from cdc_wastewater_analysis_ml_spark.operators import corpus as C
    from cdc_wastewater_analysis_ml_spark.plans.registry_corpus import (
        _EVAL_TAIL,
    )
    from cdc_wastewater_analysis_ml_spark.sources import fan_out, load_table

    def eval_side():
        docs = fan_out(
            load_table(spark, EVAL_DIR, "documents").select("doc_id", "text")
        )
        return docs.filter(F.col("doc_id") % 5 == 0).select(
            "doc_id", F.concat(F.col("text"), F.lit(_EVAL_TAIL)).alias("text")
        )

    rungs = []
    try:
        for label, train_dir in TRAIN_RUNGS:
            train = fan_out(
                load_table(spark, train_dir, "documents").select(
                    "doc_id", "text"
                )
            )
            gc.collect()
            w0, _ = rest_shuffle_totals(spark)
            out = C.contamination_overlap(train, eval_side(), "text", "doc_id", n=8)
            _force(out)
            w1, _ = rest_shuffle_totals(spark)
            rec = {
                "train": label,
                "eval": "sf1mf (fixed)",
                "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
            }
            rungs.append(rec)
            print(json.dumps(rec), flush=True)
    finally:
        spark.stop()
    lo, hi = rungs[0]["shuffle_write_mb"], rungs[1]["shuffle_write_mb"]
    record = {
        "claim": "fixed-size eval => contamination bytes linear in train",
        "rungs": rungs,
        "factor": 10,
        "byte_exponent": round(math.log(hi / max(lo, 0.1)) / math.log(10), 3)
        if lo >= 0.1
        else None,
    }
    out_path = root / f"PROBE_CONTAM_FIXED_r{rnd:02d}.json"
    out_path.write_text(json.dumps(record, indent=1) + "\n")
    print(json.dumps({"out": str(out_path), **record}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
