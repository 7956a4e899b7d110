"""Bounded-relation join audit (VERDICT r13 task 3).

r13 caught AQE silently refusing to broadcast provably-bounded semi-join
filter relations (its conservative 4 MB estimate for an
aggregate-after-filter is guesswork) — the gated reductions in
`dedup_incremental_near` shuffled full-size until explicit `F.broadcast`
hints landed (−37%).  That failure mode was found by a stage profile, not
an audit.  This tool is the audit: for each query it runs the plan to
completion and then reads the session's SQL-execution REST endpoint —
which records EVERY execution, including the internal eager actions of
composite operators (cc pointer-doubling rounds, adaptive-verify
barriers) that never appear in the returned DataFrame's own plan — and
extracts every join node (strategy + join type + build side) from the
final adaptive physical plans, so "assumed broadcast" sites are a
diffable fact instead of a hope.

Usage:
    python -m tools.broadcast_audit FIXTURE_DIR [query ...]
        # default query set: the scale-probe ladder
Writes one JSON line per query to stdout: {query, joins: {<sig>: count},
smj, bhj} plus a trailing summary line.
"""

from __future__ import annotations

import json
import re
import sys
import urllib.request

from tools.scale_probe import DEFAULT_QUERIES, build_session, _force

#: join-node heads in a physical plan description (Spark 4 node names).
_JOIN_RE = re.compile(
    r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)"
    r"[^\n]*?\b(Inner|LeftOuter|RightOuter|FullOuter|LeftSemi|LeftAnti|"
    r"Cross|ExistenceJoin)\b"
    r"(?:[^\n]*?\b(BuildLeft|BuildRight)\b)?"
)


def _sql_executions(spark) -> list[dict]:
    app_id = spark.sparkContext.applicationId
    base = spark.sparkContext.uiWebUrl
    url = (
        f"{base}/api/v1/applications/{app_id}/sql"
        "?details=true&planDescription=true&length=10000"
    )
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)


def plan_joins(plan: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for m in _JOIN_RE.finditer(plan):
        sig = " ".join(p for p in m.groups() if p)
        out[sig] = out.get(sig, 0) + 1
    return out


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    fixture = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = build_session("broadcast_audit", port=4054)
    spark.sparkContext.setLogLevel("ERROR")
    from cdc_wastewater_analysis_ml_spark.plans.registry import QUERIES

    summary = {}
    try:
        for name in names:
            seen = {e["id"] for e in _sql_executions(spark)}
            try:
                df = QUERIES[name](spark, fixture)
                _force(df)  # finalize AQE join strategies
            except Exception as exc:  # noqa: BLE001 — audit must continue
                print(json.dumps({"query": name, "error": str(exc)[:200]}))
                continue
            joins: dict[str, int] = {}
            for e in _sql_executions(spark):
                if e["id"] in seen:
                    continue
                for sig, n in plan_joins(
                    e.get("planDescription", "")
                ).items():
                    joins[sig] = joins.get(sig, 0) + n
            rec = {
                "query": name,
                "joins": joins,
                "smj": sum(
                    n for s, n in joins.items() if s.startswith("SortMergeJoin")
                ),
                "bhj": sum(
                    n
                    for s, n in joins.items()
                    if s.startswith("BroadcastHashJoin")
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
