"""Per-stage shuffle profile for one registry query on a fixture (r11).

The scale ladder (tools/scale_probe.py) answers "how much does this query
shuffle"; this answers "WHICH stage owns it" — the question that found the
packed-verify win (one 3.7 GB pair-expansion stage was 67% of
dedup_lsh_verified's sf10 bytes).  Runs the query twice (steady state),
then lists completed stages by shuffle-write bytes via the session's UI
REST endpoint.

Usage: python -m tools.stage_profile QUERY FIXTURE_DIR [top_n]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

from tools.scale_probe import build_session


def main() -> None:
    name, sf_dir = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    spark = build_session(app_name="stage_profile", port=4052)
    from cdc_wastewater_analysis_ml_spark.plans.registry import QUERIES

    for run in range(2):
        t0 = time.time()
        n = QUERIES[name](spark, sf_dir).count()
        print(f"run{run}: {time.time() - t0:.1f}s rows={n}", flush=True)

    app_id = spark.sparkContext.applicationId
    base = spark.sparkContext.uiWebUrl
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    rows = []
    total = 0
    for s in stages:
        w = s.get("shuffleWriteBytes", 0)
        total += w
        if w > 1_000_000:
            rows.append((w, s["stageId"], s.get("numTasks"), s.get("name", "")[:90]))
    rows.sort(reverse=True)
    for w, sid, nt, nm in rows[:top_n]:
        print(f"{w / 1e6:9.1f} MB  stage {sid:4d} tasks={nt}  {nm}")
    print(f"TOTAL shuffle write (both runs): {total / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
