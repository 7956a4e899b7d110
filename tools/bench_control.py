"""Self-controlled bench protocol (VERDICT r12 task 7).

Cross-round BENCH sums drifted two rounds in a row (39.90 → 41.41 →
45.80 s) while controlled same-session A/Bs and the deterministic byte
ladders measured the touched queries FASTER — the committed artifact was
measuring ambient host state, not the code.  This tool makes the committed
record carry its OWN ambient baseline: it checks out the previous round's
driver VERDICT commit into a throwaway git worktree and runs ``bench.py``
from BASE and HEAD **interleaved in one host window** (B, H, B, H, …), so
any ambient drift hits both series equally and the PAIRED ratio is the
signal.

Usage:
    python -m tools.bench_control [alternations] [out_name]

- ``alternations`` (default 2): how many BASE/HEAD pairs to run (each run
  is a full bench.py invocation, ~45 s at sf0.1 each).
- Writes ``BENCH_CONTROL_r{N}.json`` (round-stamped) at the repo root:
  per-series sum-of-medians for every run, the per-query medians of the
  LAST run of each series, and ``paired_ratio`` = HEAD/BASE of the
  per-series MIN sum (min: both series' best run in the shared window —
  the least ambient-contaminated pairing).

Both invocations run as subprocesses with the same env (``SPARK_GRAFT_*``
passthrough); each bench run builds its own Spark session, exactly like
the driver's invocation.  The worktree is removed afterwards.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile

from tools.staleness import base_commit, current_round, repo_root


def _run_bench(cwd: str) -> dict:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_WRITE_DETAIL", None)  # never clobber the artifact
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"bench.py in {cwd} exited 0 but emitted no JSON line; "
            f"stderr tail: {proc.stderr[-2000:]!r}"
        )
    return json.loads(lines[-1])


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    mid = n // 2
    return s[mid] if n % 2 else (s[mid - 1] + s[mid]) / 2.0


def main() -> int:
    alternations = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    root = repo_root()
    base = base_commit(root)
    if base is None:
        print("no previous-round verdict commit to control against")
        return 1
    rnd = current_round(root)
    out_name = (
        sys.argv[2] if len(sys.argv) > 2 else f"BENCH_CONTROL_r{rnd:02d}.json"
    )
    wt = tempfile.mkdtemp(prefix="spark_graft_bench_base_")
    subprocess.run(
        ["git", "-C", str(root), "worktree", "add", "--detach", wt, base],
        check=True,
        capture_output=True,
    )
    try:
        series: dict[str, list[dict]] = {"base": [], "head": []}
        for i in range(alternations):
            for label, cwd in (("base", wt), ("head", str(root))):
                rec = _run_bench(cwd)
                series[label].append(rec)
                print(
                    json.dumps(
                        {
                            "alternation": i,
                            "series": label,
                            "value": rec["value"],
                        }
                    ),
                    flush=True,
                )
        sums = {k: [r["value"] for r in v] for k, v in series.items()}
        # Per-query paired ratios (VERDICT r13 task 5): median each query
        # across its series' runs, ratio head/base, flag >1.25 so
        # sub-second outliers discharge individually instead of hiding
        # inside the total.
        per_query: dict[str, dict] = {}
        head_qs = [r["queries"] for r in series["head"]]
        base_qs = [r["queries"] for r in series["base"]]
        for q in sorted(set(head_qs[0]) & set(base_qs[0])):
            hm = _median([runs[q] for runs in head_qs if q in runs])
            bm = _median([runs[q] for runs in base_qs if q in runs])
            per_query[q] = {
                "base_median": round(bm, 4),
                "head_median": round(hm, 4),
                "paired_ratio": round(hm / bm, 4) if bm > 0 else None,
            }
        flagged = sorted(
            q
            for q, v in per_query.items()
            if v["paired_ratio"] is not None and v["paired_ratio"] > 1.25
        )
        record = {
            "round": rnd,
            "base_commit": base,
            "head_commit": subprocess.run(
                ["git", "-C", str(root), "rev-parse", "HEAD"],
                check=True,
                capture_output=True,
                text=True,
            ).stdout.strip(),
            "alternations": alternations,
            "sums": sums,
            "paired_ratio_min": round(min(sums["head"]) / min(sums["base"]), 4),
            "paired_ratio_median": round(
                _median(sums["head"]) / _median(sums["base"]), 4
            ),
            "per_query": per_query,
            "flagged_over_1p25": flagged,
            "queries_head": series["head"][-1]["queries"],
            "queries_base": series["base"][-1]["queries"],
        }
        out = root / re.sub(r"\{N(:02d)?\}", f"{rnd:02d}", out_name)
        out.write_text(json.dumps(record, indent=1) + "\n")
        print(
            json.dumps(
                {
                    "out": str(out),
                    "paired_ratio_min": record["paired_ratio_min"],
                    "sums": sums,
                }
            )
        )
    finally:
        subprocess.run(
            ["git", "-C", str(root), "worktree", "remove", "--force", wt],
            check=False,
            capture_output=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
