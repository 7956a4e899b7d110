"""A/B harness for the candidates→verify implementation seam (r11, VERDICT
r10 task 3): run a registry query on a fixture with each digest-verify plan
(``exploded`` = :func:`_verify_jaccard_exploded_hashed`, ``packed`` =
:func:`_verify_jaccard_packed`) and record wall time + total shuffle bytes
(Spark UI REST, per-run app delta) plus a result checksum, so an adoption
decision is a committed measurement, not an argument.

Usage:
    python -m tools.verify_ab QUERY FIXTURE_DIR [runs]

Each variant gets its own session (fresh shuffle counters and caches); the
steady-state run (last of ``runs``, default 2) is the comparison number, and
the checksum over (id pairs, 6dp-jaccard) must match across variants.
"""

from __future__ import annotations

import gc
import json
import sys
import time
import urllib.request

from pyspark.sql import SparkSession

from cdc_wastewater_analysis_ml_spark.operators import dedup as D
from cdc_wastewater_analysis_ml_spark.session import RUNTIME_CONFS

PORT = 4053


def _session() -> SparkSession:
    b = (
        SparkSession.builder.appName("verify_ab")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(PORT))
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    return b.getOrCreate()


def _shuffle_write(app_id: str) -> int:
    url = (
        f"http://localhost:{PORT}/api/v1/applications/{app_id}"
        "/stages?status=complete"
    )
    with urllib.request.urlopen(url, timeout=10) as r:
        return sum(s.get("shuffleWriteBytes", 0) for s in json.load(r))


def run_variant(name: str, impl, query: str, sf_dir: str, runs: int) -> dict:
    D._HASHED_VERIFY_IMPL = impl
    spark = _session()
    from cdc_wastewater_analysis_ml_spark.plans.registry import QUERIES

    app = spark.sparkContext.applicationId
    out = {"variant": name, "runs": []}
    checksum = None
    for i in range(runs):
        before = _shuffle_write(app)
        t0 = time.time()
        df = QUERIES[query](spark, sf_dir)
        rows = df.count()
        sec = time.time() - t0
        mb = (_shuffle_write(app) - before) / 1e6
        out["runs"].append({"sec": round(sec, 2), "shuffle_mb": round(mb, 1)})
        if i == runs - 1:
            # Cheap order-insensitive checksum; jaccard values are raw
            # IEEE quotients, bit-identical across variants by design.
            # Generic order-insensitive checksum over all columns; raw
            # jaccard doubles are bit-identical across variants by design
            # (same exact-integer operands, same single division).
            checksum = df.selectExpr(
                "bit_xor(xxhash64(struct(*))) AS c"
            ).collect()[0]["c"]
        del df
        gc.collect()
    out["rows"] = rows
    out["checksum"] = checksum
    spark.stop()
    return out


def main() -> None:
    query, sf_dir = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    results = []
    for name, impl in (
        ("exploded", D._verify_jaccard_exploded_hashed),
        ("packed", D._verify_jaccard_packed),
    ):
        r = run_variant(name, impl, query, sf_dir, runs)
        print(json.dumps(r), flush=True)
        results.append(r)
    a, b = results
    print(
        json.dumps(
            {
                "query": query,
                "fixture": sf_dir,
                "checksums_match": a["checksum"] == b["checksum"]
                and a["rows"] == b["rows"],
                "steady_exploded": a["runs"][-1],
                "steady_packed": b["runs"][-1],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
