"""Bounded-relation join audit (VERDICT r13 task 3).

r13 caught AQE silently refusing to broadcast provably-bounded semi-join
filter relations (its conservative 4 MB estimate for an
aggregate-after-filter is guesswork) — the gated reductions in
`dedup_incremental_near` shuffled full-size until explicit `F.broadcast`
hints landed (−37%).  That failure mode was found by a stage profile, not
an audit.  This tool is the audit: for each query it runs the plan to
completion at the given fixture (AQE final plan) and extracts every join
node — strategy, join type, build side — so "assumed broadcast" sites are
a diffable fact instead of a hope.

Usage:
    python -m tools.broadcast_audit FIXTURE_DIR [query ...]
        # default query set: the scale-probe ladder
Prints one JSON line per query: {query, joins: [{strategy, join_type,
build_side}], smj, bhj} and a trailing summary.
"""

from __future__ import annotations

import json
import re
import sys

from tools.scale_probe import DEFAULT_QUERIES, build_session, _force

#: join-node head patterns in the executedPlan string (Spark 4 names).
_JOIN_RE = re.compile(
    r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)"
    r"(?:\s+\[[^\]]*\])?(?:,?\s+\[[^\]]*\])?"
    r"[,]?\s*(Inner|LeftOuter|RightOuter|FullOuter|LeftSemi|LeftAnti|Cross|"
    r"ExistenceJoin[^,\s]*)?"
    r"(?:,\s*(BuildLeft|BuildRight))?"
)


def plan_joins(plan: str) -> list[dict]:
    out = []
    for m in _JOIN_RE.finditer(plan):
        out.append(
            {
                "strategy": m.group(1),
                "join_type": m.group(2),
                "build_side": m.group(3),
            }
        )
    return out


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    fixture = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = build_session("broadcast_audit", port=4054)
    from cdc_wastewater_analysis_ml_spark.plans.registry import QUERIES

    summary = {}
    try:
        for name in names:
            df = QUERIES[name](spark, fixture)
            _force(df)  # AQE finalizes join strategies only on execution
            plan = df._jdf.queryExecution().executedPlan().toString()
            joins = plan_joins(plan)
            rec = {
                "query": name,
                "joins": joins,
                "smj": sum(j["strategy"] == "SortMergeJoin" for j in joins),
                "bhj": sum(
                    j["strategy"] == "BroadcastHashJoin" for j in joins
                ),
            }
            summary[name] = {"smj": rec["smj"], "bhj": rec["bhj"]}
            print(json.dumps(rec), flush=True)
    finally:
        spark.stop()
    print(json.dumps({"fixture": fixture, "summary": summary}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
