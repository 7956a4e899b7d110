"""10× scale probe (VERDICT r5 task 5): run the flagship scale-path
families at sf0.1 and at a 10× synthetic fixture
(``tools/gen_scale_fixture.py``) and record wall time + shuffle volume per
query, so the 100 TB design claims get an empirical scaling datapoint.

Shuffle bytes come from the Spark UI REST API (this probe builds its own
session with the UI enabled; the engine default keeps it off), summed over
the stages that ran during each query — deltas between snapshots.

Usage:
    python -m tools.gen_scale_fixture /tmp/spark_graft_sf1 10
    python -m tools.scale_probe [queries...]
"""

from __future__ import annotations

import gc
import json
import sys
import time
import urllib.request

from pyspark.sql import SparkSession

from cdc_wastewater_analysis_ml_spark.session import RUNTIME_CONFS

DEFAULT_QUERIES = [
    "dedup_lsh_verified",
    "dedup_cluster_cc",
    "corpus_contamination",
    "sim_ivf_index_persisted",
]

import os

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_sf1"
#: Override the comparison pair, e.g. a 100× ladder rung:
#:   SPARK_GRAFT_PROBE_BIG_LABEL=sf10 \
#:   SPARK_GRAFT_PROBE_BIG_DIR=/tmp/spark_graft_sf10 \
#:   SPARK_GRAFT_PROBE_FACTOR=100 python -m tools.scale_probe ...
BIG_LABEL = os.environ.get("SPARK_GRAFT_PROBE_BIG_LABEL", "sf1")
BIG_DIR = os.environ.get("SPARK_GRAFT_PROBE_BIG_DIR", SF1)
FACTOR = float(os.environ.get("SPARK_GRAFT_PROBE_FACTOR", "10"))
if FACTOR <= 1:
    raise SystemExit("SPARK_GRAFT_PROBE_FACTOR must be > 1")
if BIG_LABEL == "sf0.1":
    raise SystemExit("SPARK_GRAFT_PROBE_BIG_LABEL must differ from sf0.1")


def _session() -> SparkSession:
    b = (
        SparkSession.builder.appName("scale_probe")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    return b.getOrCreate()


def _shuffle_totals(app_id: str) -> tuple[int, int]:
    url = f"http://localhost:4049/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleReadBytes", 0) for s in stages),
    )


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = _session()
    app_id = spark.sparkContext.applicationId

    from cdc_wastewater_analysis_ml_spark.plans.registry import QUERIES

    # warm-up: JVM codegen + Python worker pools on the tiny fixture
    _force(QUERIES["flagship_weekly_detection_rate"](spark, "/root/testdata/sf0.001"))
    _force(QUERIES["sim_cosine_topk"](spark, "/root/testdata/sf0.001"))

    results: dict[str, dict] = {}
    for sf_label, sf_dir in (("sf0.1", SF01), (BIG_LABEL, BIG_DIR)):
        for name in names:
            runs = []
            for i in range(2):
                gc.collect()
                w0, r0 = _shuffle_totals(app_id)
                t0 = time.perf_counter()
                df = QUERIES[name](spark, sf_dir)
                _force(df)
                dt = time.perf_counter() - t0
                time.sleep(0.5)  # let the status store catch up
                w1, r1 = _shuffle_totals(app_id)
                runs.append(
                    {
                        "sec": round(dt, 2),
                        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
                        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
                    }
                )
                del df
            results[f"{name}@{sf_label}"] = runs
            print(json.dumps({f"{name}@{sf_label}": runs}), flush=True)

    # scaling exponents from the 2nd (steady) run of each pair
    print(f"\n== scaling (steady-state run 2, {BIG_LABEL} vs sf0.1) ==")
    import math

    for name in names:
        a = results[f"{name}@sf0.1"][-1]
        b = results[f"{name}@{BIG_LABEL}"][-1]
        ratio = b["sec"] / max(a["sec"], 1e-9)
        exp = math.log(ratio) / math.log(FACTOR)
        print(
            f"{name}: {a['sec']}s -> {b['sec']}s (x{ratio:.1f}, exponent "
            f"{exp:.2f}); shuffle write {a['shuffle_write_mb']} -> "
            f"{b['shuffle_write_mb']} MB, read {a['shuffle_read_mb']} -> "
            f"{b['shuffle_read_mb']} MB"
        )


if __name__ == "__main__":
    main()
