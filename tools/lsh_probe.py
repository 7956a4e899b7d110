"""Cache-residency instrumentation for ``dedup_lsh_verified`` (VERDICT r5
task 2): reproduce the bench protocol for this one query and log, per run,

- wall time,
- whether the executed plan reuses the cached relations
  (``InMemoryTableScan`` count — expect 3: banded×2 sides + shingles; the
  shingle relation feeds both pair-join sides, so 4 IMTS total),
- block-manager residency before/after (cached RDD count + memory bytes),
- a stage breakdown: banded-signatures-only force vs full pipeline.

Usage: [SPARK_GRAFT_SF_DIR=...] python -m tools.lsh_probe [n_runs]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

from pyspark.sql import functions as F

from cdc_wastewater_analysis_ml_spark.operators import dedup as D
from cdc_wastewater_analysis_ml_spark.plans.registry import QUERIES
from cdc_wastewater_analysis_ml_spark.plans.registry_ext import _augmented_docs
from cdc_wastewater_analysis_ml_spark.session import get_spark


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _storage(spark):
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {
        "n_cached_rdds": len(infos),
        "mem_bytes": sum(i.memSize() for i in infos),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("lsh_probe")
    # bench-identical warm-up
    _force(QUERIES["flagship_weekly_detection_rate"](spark, "/root/testdata/sf0.001"))
    _force(QUERIES["sim_cosine_topk"](spark, "/root/testdata/sf0.001"))
    _force(QUERIES["dedup_lsh_verified"](spark, "/root/testdata/sf0.001"))
    gc.collect()

    for i in range(runs):
        before = _storage(spark)
        t0 = time.perf_counter()
        df = QUERIES["dedup_lsh_verified"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        _force(df)
        dt = time.perf_counter() - t0
        during = _storage(spark)
        imts = plan.count("InMemoryTableScan")
        del df
        gc.collect()
        after = _storage(spark)
        print(
            json.dumps(
                {
                    "run": i,
                    "sec": round(dt, 3),
                    "imts_in_plan": imts,
                    "before": before,
                    "after_force": during,
                    "after_gc": after,
                }
            )
        )

    # stage breakdown (fresh relations, one shot each)
    docs = _augmented_docs(spark, sf_dir)
    t0 = time.perf_counter()
    banded = D.banded_minhash(docs, "text", "doc_id", 8, 4, 3)
    _force(banded)
    t_banded = time.perf_counter() - t0

    t0 = time.perf_counter()
    pairs = D.minhash_lsh_candidates(docs, "text", "doc_id", num_hashes=8, bands=4)
    _force(pairs)
    t_cand = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = D.jaccard_verify_pairs(docs, pairs, "text", "doc_id", threshold=0.3)
    _force(out)
    t_verify = time.perf_counter() - t0

    t0 = time.perf_counter()
    sh = (
        docs.select(
            "doc_id",
            F.array_distinct(D.word_shingles("text", 3)).alias("__shs"),
        )
    )
    _force(sh)
    t_shingle = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "stage_banded_force_sec": round(t_banded, 3),
                "stage_candidates_sec": round(t_cand, 3),
                "stage_verify_given_pairs_sec": round(t_verify, 3),
                "stage_shingle_only_sec": round(t_shingle, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
