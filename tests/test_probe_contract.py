"""Scale-probe record contract (VERDICT r6 task 2): the sf-ladder evidence
must be machine-readable and self-consistent, so a regression in a scaling
exponent or shuffle volume is a diffable fact instead of DEVNOTES prose.

No Spark here — ``build_record`` is pure, and the committed PROBE_r*.json
artifacts are validated structurally."""

import json
import math
import re
from pathlib import Path

from tools import scale_probe

ROOT = Path(__file__).resolve().parent.parent


def test_default_probe_queries_are_registered():
    from cdc_wastewater_analysis_ml_spark.plans.registry import QUERIES

    missing = [n for n in scale_probe.DEFAULT_QUERIES if n not in QUERIES]
    assert not missing, missing


def test_build_record_exponent_math():
    runs_small = [{"sec": 4.0, "shuffle_write_mb": 1.0, "shuffle_read_mb": 1.0}]
    runs_big = [
        {"sec": 99.0, "shuffle_write_mb": 9.0, "shuffle_read_mb": 9.0},
        {"sec": 40.0, "shuffle_write_mb": 10.0, "shuffle_read_mb": 10.0},
    ]
    rec = scale_probe.build_record(
        {"q@sf0.1": runs_small, "q@sf10": runs_big}, ["q"], "sf10", 100.0
    )
    q = rec["queries"]["q"]
    # steady-state = LAST run of each pair, not the cold first run
    assert q["small_sec"] == 4.0 and q["big_sec"] == 40.0
    assert q["wall_ratio"] == 10.0
    assert q["exponent"] == round(math.log(10.0) / math.log(100.0), 3) == 0.5
    assert q["big_shuffle_write_mb"] == 10.0
    # a query probed at only one scale is omitted, not half-recorded
    rec2 = scale_probe.build_record({"q@sf0.1": runs_small}, ["q"], "sf10", 100.0)
    assert rec2["queries"] == {}


def test_probe_artifacts_are_self_consistent():
    """Every committed PROBE_r*.json parses, names registered queries, and
    its stored exponents re-derive from its own stored walls."""
    from cdc_wastewater_analysis_ml_spark.plans.registry import QUERIES

    paths = sorted(ROOT.glob("PROBE_r*.json"))
    for path in paths:
        m = re.fullmatch(r"PROBE_r(\d{2})\.json", path.name)
        assert m, path.name
        rec = json.loads(path.read_text())
        # r12 fixture decision: the canonical ladder migrates to the
        # 32-file production-shaped rungs at r13 — canonical records are
        # contract-bound to small == sf0.1 through r12 and small ==
        # sf0.1mf from r13 on (PROBE_MULTIFILE_r12.json is the baseline).
        want_small = "sf0.1" if int(m.group(1)) <= 12 else "sf0.1mf"
        assert rec["small"] == want_small, (path.name, rec["small"])
        assert rec["factor"] > 1
        assert rec["queries"], f"{path.name} has no query entries"
        for name, q in rec["queries"].items():
            assert name in QUERIES, f"{path.name}: unknown query {name}"
            ratio = q["big_sec"] / max(q["small_sec"], 1e-9)
            want = math.log(ratio) / math.log(rec["factor"])
            assert abs(q["exponent"] - want) < 5e-3, (path.name, name)
            for k in (
                "small_shuffle_write_mb",
                "big_shuffle_write_mb",
                "small_shuffle_read_mb",
                "big_shuffle_read_mb",
            ):
                assert isinstance(q[k], (int, float)), (path.name, name, k)
            # byte_exponent (r10+): when present, it re-derives from the
            # stored shuffle-write volumes the same way the wall exponent
            # re-derives from the walls.
            if q.get("byte_exponent") is not None:
                bw = q["big_shuffle_write_mb"] / q["small_shuffle_write_mb"]
                want_b = math.log(bw) / math.log(rec["factor"])
                assert abs(q["byte_exponent"] - want_b) < 5e-3, (
                    path.name,
                    name,
                )


def test_current_round_probe_covers_the_ladder():
    """The round's probe file (once emitted) must cover the full default
    ladder — a partial rung silently narrows the regression guard."""
    from tools.staleness import current_round

    path = ROOT / f"PROBE_r{current_round(ROOT):02d}.json"
    if not path.exists():
        import pytest

        pytest.skip("round probe not yet emitted")
    rec = json.loads(path.read_text())
    missing = [n for n in scale_probe.DEFAULT_QUERIES if n not in rec["queries"]]
    assert not missing, missing
