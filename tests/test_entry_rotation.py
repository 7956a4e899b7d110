"""Rotation / staleness logic of ``__spark_entry__`` (no SparkSession needed).

The driver verifies a bounded prefix of ``queries()`` per round, so the
ordering logic is load-bearing: a bug here silently starves queries of
driver verification.  Three contracts:

1. a module marked changed in round N invalidates EVERY registry query that
   transitively consumes it (the r2 regression: ``binary_curve`` changed but
   only 2 of its 8 consumers were invalidated);
2. a CORRECTNESS row with no ``*_match`` key present (e.g. a partially
   written file) must NOT count as green;
3. a ``no_oracle`` row with a recorded row count DOES count (rows-only
   queries rotate like the rest instead of pinning the queue head).
"""

from __future__ import annotations

import importlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod


def test_module_change_invalidates_all_consumers():
    # >= not ==: a query may route through SEVERAL changed modules and
    # _CHANGED_IN_ROUND takes the max (r12: metric_accuracy is a
    # plans/metrics.py consumer whose registry_ext.py block also changed).
    changed = entry_mod._CHANGED_IN_ROUND
    metrics_rnd = entry_mod._MODULE_CHANGED_IN_ROUND["plans/metrics.py"]
    for name in entry_mod.effective_consumers("plans/metrics.py", metrics_rnd):
        assert (
            changed.get(name, -1)
            >= entry_mod._MODULE_CHANGED_IN_ROUND["plans/metrics.py"]
        ), f"{name} routes through plans/metrics.py but is not invalidated"


def test_changed_consumers_sort_before_green_queries():
    ordered = list(entry_mod.queries())
    green = entry_mod._last_green_round()
    stale = [
        n
        for n in entry_mod.effective_consumers(
            "plans/metrics.py",
            entry_mod._MODULE_CHANGED_IN_ROUND["plans/metrics.py"],
        )
        if green.get(n, -1) < entry_mod._CHANGED_IN_ROUND[n]
    ]
    # Every stale metric consumer must outrank every query whose green row
    # is at least as recent as the current max round.
    if not stale:
        return
    max_round = max(green.values(), default=-1)
    freshest = [n for n in ordered if green.get(n, -1) >= max_round and n not in stale]
    worst_stale = max(ordered.index(n) for n in stale)
    best_fresh = min((ordered.index(n) for n in freshest), default=len(ordered))
    assert worst_stale < best_fresh, (
        "stale (changed-module) queries must sort before freshly-green ones"
    )


def test_green_requires_positive_match_signal(tmp_path, monkeypatch):
    rows = {
        "no_match_keys": {"err": None, "spark_rows": 5, "oracle_rows": 5},
        "all_green": {
            "err": None,
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
        },
        "one_false": {"err": None, "rows_match": True, "hash_match": False},
        "rows_only_ok": {"err": "no_oracle", "spark_rows": 7},
        "rows_only_dead": {"err": "no_oracle", "spark_rows": None},
        "hard_error": {"err": "Traceback ...", "rows_match": None},
    }
    (tmp_path / "CORRECTNESS_r09.json").write_text(json.dumps(rows))
    fake_entry = tmp_path / "__spark_entry__.py"
    fake_entry.write_text(Path(entry_mod.__file__).read_text())
    monkeypatch.setattr(entry_mod, "__file__", str(fake_entry))
    try:
        green = entry_mod._last_green_round()
    finally:
        importlib.reload(entry_mod)
    assert green.get("all_green") == 9
    assert green.get("rows_only_ok") == 9
    assert "no_match_keys" not in green
    assert "one_false" not in green
    assert "rows_only_dead" not in green
    assert "hard_error" not in green
