"""Staleness registration is mechanical, not a judgment call (VERDICT r5
task 3): every package module touched since the previous round's driver
commit must be registered in ``__spark_entry__._MODULE_CHANGED_IN_ROUND`` at
the current round, and changed registry files must list every AST-affected
``@register`` block as a stale consumer.

These tests are self-neutralizing after the round closes: once the driver
commits ``round N: ...``, the diff base advances and the worktree diff is
empty — they only bite while edits are in flight, which is exactly when the
map must be maintained.
"""

import subprocess

import pytest

import __spark_entry__ as entry
from tools import staleness


@pytest.fixture(scope="module")
def audit_ctx():
    root = staleness.repo_root()
    try:
        base = staleness.base_commit(root)
    except (subprocess.CalledProcessError, FileNotFoundError):
        pytest.skip("git unavailable")
    if base is None:
        pytest.skip("no prior-round driver commit to diff against")
    return root, base, staleness.current_round(root)


def test_changed_modules_are_registered_at_current_round(audit_ctx):
    root, base, rnd = audit_ctx
    changed = staleness.changed_package_files(root, base)
    missing = {
        rel: entry._MODULE_CHANGED_IN_ROUND.get(rel)
        for rel in changed
        if entry._MODULE_CHANGED_IN_ROUND.get(rel, -1) < rnd
    }
    assert not missing, (
        f"modules changed since {base[:10]} but not registered at round {rnd} "
        f"in _MODULE_CHANGED_IN_ROUND: {missing}"
    )


def test_changed_registry_files_list_all_ast_affected_queries(audit_ctx):
    root, base, rnd = audit_ctx
    problems = {}
    for rel in staleness.changed_package_files(root, base):
        if not rel.split("/")[-1].startswith("registry"):
            continue
        required = staleness.registry_required_consumers(root, base, rel)
        listed = entry.effective_consumers(
            rel, entry._MODULE_CHANGED_IN_ROUND.get(rel, -1)
        )
        if not required <= listed:
            problems[rel] = sorted(required - listed)
    assert not problems, (
        f"AST-affected @register blocks missing from the effective consumer "
        f"set (overlay or derived routes): {problems}"
    )


def test_current_round_survives_judge_seam(tmp_path):
    """VERDICT r6 task 1: the driver drops CORRECTNESS_r{N}.json BEFORE the
    ``round N:`` marker commit lands.  In that window the audit must still
    say "round N" (the round the artifact just closed), not N+1 — otherwise
    every round-N registration looks one round behind at exactly the moment
    the judge runs pytest."""
    subprocess.run(["git", "-C", str(tmp_path), "init", "-q"], check=True)
    env_args = ["-c", "user.email=t@t", "-c", "user.name=t"]
    (tmp_path / "f").write_text("x")
    subprocess.run(
        ["git", "-C", str(tmp_path), *env_args, "add", "."], check=True
    )
    subprocess.run(
        ["git", "-C", str(tmp_path), *env_args, "commit", "-q", "-m",
         "round 5: verdict/advice/correctness/bench"],
        check=True,
    )
    # Judge seam: the round-6 artifact exists, the round-6 marker does not.
    (tmp_path / "CORRECTNESS_r06.json").write_text("{}")
    assert staleness.current_round(tmp_path) == 6
    # Marker lands -> the epoch advances with the diff base, in lockstep.
    subprocess.run(
        ["git", "-C", str(tmp_path), *env_args, "add", "."], check=True
    )
    subprocess.run(
        ["git", "-C", str(tmp_path), *env_args, "commit", "-q", "-m",
         "round 6: verdict/advice/correctness/bench"],
        check=True,
    )
    assert staleness.current_round(tmp_path) == 7
    assert staleness.base_commit(tmp_path) is not None


def test_current_round_fallback_without_marker(tmp_path):
    """Round 1 (no driver marker yet): fall back to the artifact count."""
    subprocess.run(["git", "-C", str(tmp_path), "init", "-q"], check=True)
    assert staleness.current_round(tmp_path) == 1
    (tmp_path / "CORRECTNESS_r01.json").write_text("{}")
    assert staleness.current_round(tmp_path) == 2


def test_consumer_lists_name_real_queries():
    """Guard against typos: every consumer name must exist in the registry
    (new not-yet-implemented names would silently invalidate nothing)."""
    from cdc_wastewater_analysis_ml_spark.plans.registry import QUERIES

    unknown = {
        key: [n for n in names if n not in QUERIES]
        for key, names in entry._ROUND_AFFECTED.items()
    }
    unknown = {m: ns for m, ns in unknown.items() if ns}
    assert not unknown, f"consumer names not in registry: {unknown}"


def test_mid_round_snapshot_does_not_advance_epoch(tmp_path):
    """r10 seam: when a session is interrupted, the driver commits
    ``round N: end-of-round snapshot`` MID-round and building continues
    after it (observed r4 and r10).  The snapshot is not a verification
    event — the round-N driver check still lies ahead — so it must advance
    neither the epoch nor the diff base: edits after it belong to round N
    (the check that will verify them), and edits it committed must stay
    visible to the changed-files audit."""
    subprocess.run(["git", "-C", str(tmp_path), "init", "-q"], check=True)
    env_args = ["-c", "user.email=t@t", "-c", "user.name=t"]

    def commit(msg):
        (tmp_path / "f").write_text(msg)
        subprocess.run(
            ["git", "-C", str(tmp_path), *env_args, "add", "."], check=True
        )
        subprocess.run(
            ["git", "-C", str(tmp_path), *env_args, "commit", "-q", "-m", msg],
            check=True,
        )

    commit("round 9: verdict/advice/correctness/bench")
    verdict_sha = subprocess.run(
        ["git", "-C", str(tmp_path), "rev-parse", "HEAD"],
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    assert staleness.current_round(tmp_path) == 10
    commit("builder work, session 1")
    commit("round 10: end-of-round snapshot (33 turns, 979s)")
    # Building continues in a restarted session: still round 10, still
    # diffing against the round-9 verdict.
    assert staleness.current_round(tmp_path) == 10
    assert staleness.base_commit(tmp_path) == verdict_sha


def test_body_verdict_mention_does_not_advance_epoch(tmp_path):
    """r10 ADVICE: ``git log --grep`` matches any line of the MESSAGE, so a
    snapshot commit whose BODY quotes "round N: verdict ..." is selected by
    the grep while its subject is still a snapshot.  The subject parse must
    reject it and keep scanning to the most recent GENUINE verdict commit —
    neither advancing the epoch (the old loose parse matched
    ``round (\\d+):`` against the snapshot subject) nor losing the diff
    base to the fallback."""
    subprocess.run(["git", "-C", str(tmp_path), "init", "-q"], check=True)
    env_args = ["-c", "user.email=t@t", "-c", "user.name=t"]

    def commit(msg):
        (tmp_path / "f").write_text(msg)
        subprocess.run(
            ["git", "-C", str(tmp_path), *env_args, "add", "."], check=True
        )
        subprocess.run(
            ["git", "-C", str(tmp_path), *env_args, "commit", "-q", "-m", msg],
            check=True,
        )

    commit("round 9: verdict/advice/correctness/bench")
    verdict_sha = subprocess.run(
        ["git", "-C", str(tmp_path), "rev-parse", "HEAD"],
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    # Snapshot whose body quotes the verdict marker on a line of its own:
    # the --grep hit lands on this commit, but its subject is a snapshot.
    commit(
        "round 10: end-of-round snapshot (12 turns)\n\n"
        "round 10: verdict still pending; carrying the r9 task list."
    )
    assert staleness.current_round(tmp_path) == 10
    assert staleness.base_commit(tmp_path) == verdict_sha


def test_no_duplicate_keys_in_hand_maintained_maps():
    """r12 review: _MODULE_CHANGED_IN_ROUND carried a duplicate
    "plans/registry.py" key for four rounds — Python dict literals keep the
    LAST duplicate silently, so an edit to the earlier (shadowed) entry
    would be ignored and the intended invalidation never applied.  Parse
    the dict literals and fail on any textual duplicate key."""
    import ast
    from pathlib import Path

    src = (Path(__file__).resolve().parent.parent / "__spark_entry__.py").read_text()
    tree = ast.parse(src)
    checked = 0
    for node in ast.walk(tree):
        if not isinstance(node, ast.AnnAssign) or not isinstance(node.value, ast.Dict):
            continue
        name = getattr(node.target, "id", "")
        if name not in ("_MODULE_CHANGED_IN_ROUND", "_ROUND_AFFECTED"):
            continue
        checked += 1
        keys = [ast.literal_eval(k) for k in node.value.keys if k is not None]
        dupes = {k for k in keys if keys.count(k) > 1}
        assert not dupes, f"{name} has duplicate key(s): {dupes}"
    assert checked == 2, "expected to find both hand-maintained maps"


def test_derived_routes_available_and_cover_overlays():
    """ADVICE r12 #3: the full forward route map is DERIVED from imports +
    call sites (tools/staleness.derive_module_routes) and is the staleness
    fallback for any (module, round) without an explicit overlay.  The
    derivation must (a) import-succeed in the driver's environment, (b)
    know every registered query, and (c) be a superset of every overlay
    subset — an overlay naming a query the derivation can't see would mean
    the fallback under-stales relative to the hand judgment."""
    from cdc_wastewater_analysis_ml_spark.plans.registry import QUERIES

    routes = entry._DERIVED_ROUTES
    assert routes is not None, "route derivation failed at import"
    seen = set().union(*routes.values())
    assert seen == set(QUERIES), (
        f"derivation missed queries: {sorted(set(QUERIES) - seen)}"
    )
    problems = {
        key: sorted(set(names) - routes.get(key[0], set()))
        for key, names in entry._ROUND_AFFECTED.items()
    }
    problems = {k: v for k, v in problems.items() if v}
    assert not problems, (
        f"overlay consumers outside the derived route map: {problems}"
    )


def test_round_bump_without_overlay_falls_back_to_full_routes():
    """The fail-safe the overlay exists for: a (module, round) pair with no
    overlay entry must stale the module's FULL derived route set, never an
    older round's trim."""
    routes = entry._DERIVED_ROUTES
    assert routes is not None
    # operators/dedup.py has an overlay at its current round; a hypothetical
    # future round must fall back to the full (much larger) derived set.
    cur = entry._MODULE_CHANGED_IN_ROUND["operators/dedup.py"]
    trimmed = entry.effective_consumers("operators/dedup.py", cur)
    full = entry.effective_consumers("operators/dedup.py", cur + 1)
    assert full == routes["operators/dedup.py"]
    assert trimmed < full, "expected the overlay to be a strict narrowing"
