"""Enforce the integer-quotient rounding audit (VERDICT r10 task 4; see
tools/round_audit.py).  A new ``F.round`` site must be classified before it
ships; a classification without a site is stale and must be pruned; a
deferred boundary-class conversion whose planned round has passed fails
loudly instead of rotting."""

from pathlib import Path

from tools.round_audit import (
    BOUNDARY_DEFERRED,
    DISPOSITIONS,
    audit,
    collect_sites,
)

ROOT = Path(__file__).resolve().parent.parent


def test_every_round_site_classified_and_no_stale_entries():
    unclassified, stale, overdue = audit(ROOT)
    assert not unclassified, (
        "new F.round site(s) need a disposition in tools/round_audit.py "
        f"(raw-quotient rule — see module docstring): {unclassified}"
    )
    assert not stale, f"prune stale classification(s): {stale}"
    assert not overdue, (
        "deferred boundary-class conversion(s) missed their planned "
        f"rotation window: {overdue}"
    )


def test_boundary_deferrals_carry_plans():
    for key, d in DISPOSITIONS.items():
        if d.kind == BOUNDARY_DEFERRED:
            assert d.planned_round is not None, key


def test_inventory_is_nonempty_and_ast_keyed():
    # Sanity: the collector actually parses the package (a refactor that
    # renames the functions import would silently empty the audit).
    sites = collect_sites(ROOT)
    assert sum(sites.values()) >= 50


def test_count_drift_under_existing_key_is_flagged(monkeypatch):
    """r12 ADVICE: a NEW site whose first-arg text collides with an
    existing key must NOT silently inherit the old disposition.  Simulated
    by skewing EXPECTED_COUNTS for a real multi-site key both ways."""
    import tools.round_audit as ra

    key = (
        "cdc_wastewater_analysis_ml_spark/operators/similarity.py",
        'scorer(F.col("q_vec"), F.col("c_vec"))',
    )
    assert ra.EXPECTED_COUNTS[key] == 4  # real inventory at HEAD

    monkeypatch.setitem(ra.EXPECTED_COUNTS, key, 3)
    unclassified, _, _ = ra.audit(ROOT)
    assert any(key[1] in u and "new site" in u for u in unclassified)

    monkeypatch.setitem(ra.EXPECTED_COUNTS, key, 5)
    _, stale, _ = ra.audit(ROOT)
    assert any(key[1] in st and "removed" in st for st in stale)
