"""Mechanical staleness-registration audit (VERDICT r5 task 3).

``__spark_entry__._MODULE_CHANGED_IN_ROUND`` invalidates prior-round green
CORRECTNESS rows for queries routed through changed modules.  Three rounds
in a row, the weak link was a HUMAN judgment call — "this diff is textually
additive, nothing re-verifies" — applied to a file the map then omitted.
This module computes the ground truth from git + the AST, so the pytest in
``tests/test_staleness_registration.py`` can enforce:

1. every ``.py`` under the package changed since the previous round's
   driver commit appears in the map AT the current round (file granularity,
   additive or not);
2. for changed ``plans/registry*.py`` files, the consumer set covers every
   query whose ``@register`` block is AST-affected by the diff — directly,
   or transitively through changed module-level helpers it mentions
   (fixpoint over the helper-mention graph), so "only helper X changed and
   nothing uses it" is a computed fact rather than an argument.

Operator/source/streaming modules stay at file granularity with
hand-maintained consumer lists (their call graphs cross modules; the map's
strict-indexing assert plus rule 1 keep those honest).
"""

from __future__ import annotations

import ast
import json
import re
import subprocess
from pathlib import Path

PKG = "cdc_wastewater_analysis_ml_spark"


def repo_root() -> Path:
    return Path(__file__).resolve().parent.parent


def current_round(root: Path) -> int:
    """Round currently being built = 1 + the round of the latest
    ``round N: verdict`` driver marker commit.

    Derived from the MARKER, not from the ``CORRECTNESS_r*.json`` artifacts
    (the r6 judge seam): the driver drops ``CORRECTNESS_r{N}.json`` BEFORE it
    commits the ``round N:`` marker, so during that window an artifact-based
    count demands round N+1 registration for round-N edits the round-N driver
    run already re-verified green — a false positive exactly when the audit's
    credibility matters.  The marker and the diff base (``base_commit``)
    advance together, so marker-derived rounds keep "changed since base" and
    "registered at current round" consistent at every commit, including the
    judge seam (VERDICT r6 task 1).

    Only the VERDICT marker advances the epoch (r10 seam): the driver also
    commits ``round N: end-of-round snapshot`` checkpoints, and when a round
    is split across interrupted sessions a snapshot can land MID-round with
    building continuing after it (observed r4 and r10).  A snapshot is not a
    verification event — the round-N driver check still lies ahead — so
    treating it as the epoch boundary would demand round-N+1 registration
    for edits the round-N check will verify, and (worse) hide the round's
    earlier, snapshot-committed edits from the changed-files audit.
    """
    try:
        hits = _git(
            root, "log", "-E", "--grep", r"^round [0-9]+: verdict",
            "--format=%s",
        ).splitlines()
    except subprocess.CalledProcessError:  # unborn branch: no commits at all
        hits = []
    # The grep above matches any line of the MESSAGE, not just the subject
    # (r10 ADVICE): a snapshot whose BODY quotes "round N: verdict" would be
    # selected while its subject is still "round N: end-of-round snapshot" —
    # and a loose `round (\d+):` subject parse would then silently
    # reintroduce the mid-round epoch-advance seam.  Each hit's SUBJECT is
    # therefore re-validated against the verdict marker, skipping past
    # body-only hits to the most recent GENUINE verdict commit (not straight
    # to the artifact fallback, which mis-counts during the judge seam).
    for subject in hits:
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            return int(m.group(1)) + 1
    # No marker yet (round 1, or a fresh clone without driver history):
    # fall back to the artifact count so the audit still has an epoch.
    rounds = [
        int(g.group(1))
        for p in root.glob("CORRECTNESS_r*.json")
        if (g := re.search(r"r(\d+)", p.name))
    ]
    return max(rounds, default=0) + 1


def _git(root: Path, *args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(root), *args],
        check=True,
        capture_output=True,
        text=True,
    ).stdout


def base_commit(root: Path) -> str | None:
    """The previous round's driver VERDICT commit (subject ``round N:
    verdict/...``) — snapshots don't advance the diff base, matching
    :func:`current_round`'s epoch rule.  Mirrors the subject re-validation
    (r10 ADVICE): the grep matches message BODIES too, so the selected
    commit's %s must itself carry the verdict marker or we fall back to
    no-base, keeping the diff base and the epoch in lockstep."""
    hits = _git(
        root, "log", "-E", "--grep", r"^round [0-9]+: verdict",
        "--format=%H %s",
    ).splitlines()
    out = ""
    for line in hits:
        sha, _, subject = line.partition(" ")
        if re.match(r"round \d+: verdict", subject):
            out = sha
            break
    return out or None


def changed_package_files(root: Path, base: str) -> list[str]:
    """Package-relative paths of query-defining ``.py`` files that differ
    between ``base`` and the WORKTREE — uncommitted edits count, and so do
    brand-new UNTRACKED files (git diff alone would let a new module ship
    unregistered until its first commit)."""
    out = _git(root, "diff", "--name-only", base, "--", PKG)
    out += _git(root, "ls-files", "--others", "--exclude-standard", "--", PKG)
    rels = []
    for line in sorted(set(out.splitlines())):
        p = Path(line)
        if p.suffix != ".py" or p.name in ("__init__.py", "__main__.py"):
            continue
        if not (root / p).exists():  # deleted: import of registry covers it
            continue
        rels.append(str(p.relative_to(PKG)))
    return sorted(rels)


# ---------------------------------------------------------------------------
# AST block-diff for registry files
# ---------------------------------------------------------------------------


def _top_level_defs(src: str) -> dict[str, str]:
    """name -> AST dump for every top-level function / simple assignment."""
    defs: dict[str, str] = {}
    for node in ast.parse(src).body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            defs[node.name] = ast.dump(node)
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    defs[tgt.id] = ast.dump(node)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            defs[node.target.id] = ast.dump(node)
    return defs


def _registered_query(node: ast.FunctionDef) -> str | None:
    """Query name if ``node`` carries a ``@register("name", ...)`` decorator."""
    for dec in node.decorator_list:
        if (
            isinstance(dec, ast.Call)
            and isinstance(dec.func, ast.Name)
            and dec.func.id == "register"
            and dec.args
            and isinstance(dec.args[0], ast.Constant)
            and isinstance(dec.args[0].value, str)
        ):
            return dec.args[0].value
    return None


def _mentions(node: ast.AST) -> set[str]:
    return {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}


def registry_required_consumers(root: Path, base: str, rel_pkg_path: str) -> set[str]:
    """Query names a changed registry file MUST list as stale consumers.

    New file (absent at ``base``) → every query it registers (they are
    never-verified anyway, so listing them invalidates nothing).
    """
    path = root / PKG / rel_pkg_path
    new_src = path.read_text()
    try:
        old_src = _git(root, "show", f"{base}:{PKG}/{rel_pkg_path}")
    except subprocess.CalledProcessError:
        old_src = None

    new_defs = _top_level_defs(new_src)
    tree = ast.parse(new_src)
    fn_nodes = {
        n.name: n for n in tree.body if isinstance(n, ast.FunctionDef)
    }
    queries = {
        name: q
        for name, n in fn_nodes.items()
        if (q := _registered_query(n)) is not None
    }
    if old_src is None:
        return set(queries.values())

    old_defs = _top_level_defs(old_src)
    changed = {
        name
        for name, dump in new_defs.items()
        if old_defs.get(name) != dump
    }
    # Fixpoint: a def that mentions a changed top-level name is changed too
    # (helper → helper → query chains).  Mentions are computed on the NEW
    # source; a def that stopped mentioning a helper no longer depends on it.
    mention_map = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef):
            mention_map[node.name] = _mentions(node) - {node.name}
        elif isinstance(node, ast.Assign) and all(
            isinstance(t, ast.Name) for t in node.targets
        ):
            tgts = {t.id for t in node.targets}
            for t in tgts:
                mention_map[t] = _mentions(node.value) - tgts
    while True:
        grew = {
            name
            for name, ment in mention_map.items()
            if name not in changed and ment & changed
        }
        if not grew:
            break
        changed |= grew
    return {queries[name] for name in changed if name in queries}


def audit(root: Path | None = None) -> dict:
    """One-shot report (also handy interactively: python -m tools.staleness)."""
    root = root or repo_root()
    base = base_commit(root)
    rnd = current_round(root)
    files = changed_package_files(root, base) if base else []
    report = {"base": base, "round": rnd, "changed_files": files, "registry": {}}
    for rel in files:
        if Path(rel).name.startswith("registry"):
            report["registry"][rel] = sorted(
                registry_required_consumers(root, base, rel)
            )
    return report


if __name__ == "__main__":
    print(json.dumps(audit(), indent=2))
