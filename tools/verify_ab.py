"""A/B harness for the candidates→verify implementation seam (r11, VERDICT
r10 task 3): run a registry query on a fixture with each digest-verify plan
(``exploded`` = :func:`_verify_jaccard_exploded_hashed`, ``packed`` =
:func:`_verify_jaccard_packed`) and record wall time + total shuffle bytes
(Spark UI REST, per-run app delta) plus an order-insensitive checksum over
ALL columns, so an adoption decision is a committed measurement, not an
argument.

Usage:
    python -m tools.verify_ab QUERY FIXTURE_DIR [runs]

Each variant gets its own session (fresh shuffle counters and caches) built
by the shared probe helper (tools/scale_probe.build_session); the
steady-state run (last of ``runs``, default 2) is the comparison number,
and the checksum must match across variants — raw jaccard doubles are
bit-identical by design (same exact-integer operands, same single
division), and survivor-list outputs hash their full rows.
"""

from __future__ import annotations

import gc
import json
import sys
import time

from cdc_wastewater_analysis_ml_spark.operators import dedup as D
from tools.scale_probe import build_session, rest_shuffle_totals


def run_variant(
    name: str,
    impl,
    query: str,
    sf_dir: str,
    runs: int,
    orient: bool = False,
    prepart: bool = False,
) -> dict:
    D._HASHED_VERIFY_IMPL = impl
    D._ORIENT_SIZED_VERIFY = orient
    D._PREPART_PACKED_HS = prepart
    spark = build_session(app_name="verify_ab", port=4053)
    from cdc_wastewater_analysis_ml_spark.plans.registry import QUERIES

    out = {"variant": name, "runs": []}
    checksum = None
    for i in range(runs):
        before, _ = rest_shuffle_totals(spark)
        t0 = time.time()
        df = QUERIES[query](spark, sf_dir)
        rows = df.count()
        sec = time.time() - t0
        after, _ = rest_shuffle_totals(spark)
        out["runs"].append(
            {"sec": round(sec, 2), "shuffle_mb": round((after - before) / 1e6, 1)}
        )
        if i == runs - 1:
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
    # Third variant since r12: the packed plan with the size-annotated
    # orientation seam ON (smaller-side pair expansion + size-ratio
    # prefilter) — the r12 adoption vs the r11 "packed" baseline.
    # Fourth since r13: orientation + the pre-partitioned packed-relation
    # layout (one repartition-into-cache exchange feeding both expansion
    # joins instead of two array-relation exchanges).
    for name, impl, orient, prepart in (
        ("exploded", D._verify_jaccard_exploded_hashed, False, False),
        ("packed", D._verify_jaccard_packed, False, False),
        ("packed_oriented", D._verify_jaccard_packed, True, False),
        ("packed_oriented_prepart", D._verify_jaccard_packed, True, True),
    ):
        r = run_variant(name, impl, query, sf_dir, runs, orient, prepart)
        print(json.dumps(r), flush=True)
        results.append(r)
    base = results[0]
    print(
        json.dumps(
            {
                "query": query,
                "fixture": sf_dir,
                "checksums_match": all(
                    r["checksum"] == base["checksum"] and r["rows"] == base["rows"]
                    for r in results
                ),
                **{f"steady_{r['variant']}": r["runs"][-1] for r in results},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
