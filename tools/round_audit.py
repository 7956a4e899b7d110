"""Mechanized integer-quotient rounding audit (VERDICT r10 task 4).

``quality_linear_score`` was latent for nine rounds because ``round(int/int,
6)`` only diverges cross-engine on exact .5-at-the-7th-digit boundaries,
which densify on specific fixtures (token counts that are multiples of 16).
The r10 fix established the rule — now recorded in the verify skill and
enforced here mechanically instead of by per-round greps:

- **Publish the RAW IEEE quotient** when the rounded value is a single
  deterministic float operation (or none) over EXACT integer operands: the
  result is bit-identical cross-engine, and ``round(·, 6)`` only ADDS the
  boundary class where Spark's BigDecimal-HALF_UP-on-the-binary-double and
  DuckDB's scaled multiply can disagree.
- **Keep ``round(·, 6)``** when the UPSTREAM arithmetic differs cross-engine
  (nondeterministic-order float sums, differently-ordered interpolation
  formulas, UDF float math): there, rounding is the alignment guard the
  driver hash needs.

This module inventories every ``F.round`` call in the package (AST, keyed by
(file, normalized first-argument source) so line drift doesn't churn the
list) and requires an explicit DISPOSITION for each; the pytest in
``tests/test_round_audit.py`` fails on any unclassified NEW site, any stale
entry (classification without a matching site), and any deferred boundary
site whose planned round has passed.  Keys whose first-arg source appears at
SEVERAL sites carry their expected site count in ``EXPECTED_COUNTS`` (r12
ADVICE: without it, a NEW semantically-different site whose first-argument
text collides with an existing key in the same file would silently inherit
the old disposition) — an extra site under a known key is flagged as
unclassified, a missing one as stale.  Oracle-SQL ``round()`` text mirrors
the Python side by construction (conversions always land on both sides in
one diff), so the Python inventory is the single audit surface.

Dispositions
------------
- ``FLOAT_GUARD``: upstream float arithmetic differs cross-engine (order of
  summation, interpolation formula, cosine accumulation) — rounding is
  correct and required.
- ``EXACT_SHORT_DECIMAL``: the value is always exactly representable within
  the rounding scale (integral doubles, k/2 medians with one decimal, 2dp
  currency sums of 2dp inputs) — round is the identity; harmless, kept for
  uniformity.
- ``BOUNDARY_DEFERRED(round=N)``: a genuine integer-quotient boundary-class
  site (single division of exact integers).  Conversion to raw-quotient
  publication changes the query's published values, so it is scheduled for
  the round its CORRECTNESS row comes due in the rotation anyway (zero
  prefix-slot cost; the r11 jaccard/recall conversions rode the
  operators/dedup.py staleness the same way).  The audit FAILS if the
  planned round passes without the conversion landing.
"""

from __future__ import annotations

import ast
from dataclasses import dataclass
from pathlib import Path

PKG = "cdc_wastewater_analysis_ml_spark"

FLOAT_GUARD = "float_guard"
EXACT_SHORT_DECIMAL = "exact_short_decimal"
BOUNDARY_DEFERRED = "boundary_deferred"


@dataclass(frozen=True)
class Disposition:
    kind: str
    why: str
    #: For BOUNDARY_DEFERRED: the round whose rotation makes the conversion
    #: free (the query's CORRECTNESS row comes due then); the audit fails
    #: once current_round exceeds this without the site disappearing.
    planned_round: int | None = None


def collect_sites(root: Path) -> dict[tuple[str, str], int]:
    """(package-relative file, normalized first-arg source) -> count."""
    sites: dict[tuple[str, str], int] = {}
    for p in sorted((root / PKG).rglob("*.py")):
        src = p.read_text()
        for node in ast.walk(ast.parse(src)):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "round"
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "F"
            ):
                seg = ast.get_source_segment(src, node.args[0]) if node.args else "?"
                key = (str(p.relative_to(root)), " ".join(seg.split()))
                sites[key] = sites.get(key, 0) + 1
    return sites


def _f(why: str) -> Disposition:
    return Disposition(FLOAT_GUARD, why)


def _e(why: str) -> Disposition:
    return Disposition(EXACT_SHORT_DECIMAL, why)


def _b(why: str, planned_round: int) -> Disposition:
    return Disposition(BOUNDARY_DEFERRED, why, planned_round)


_COS = _f("cosine: per-element float products folded in engine-specific order")
_SUMD = _f("sum/avg of double columns: accumulation order differs cross-engine")
_PCTL = _f("interpolated percentile: (1-d)*a+d*b op order differs cross-engine")
_CENTS = _e("2dp round of sums of 2dp-currency doubles: integral in cents, exact")
_WINDOW = _f("windowed mean/sum of doubles: accumulation order differs")

#: Every F.round site in the package.  Keys match :func:`collect_sites`.
DISPOSITIONS: dict[tuple[str, str], Disposition] = {
    # --- operators ---------------------------------------------------------
    (f"{PKG}/operators/aggregates.py", "F.sum(F.col(value_col))"): _SUMD,
    (f"{PKG}/operators/ann_index.py", 'scorer(F.col("q_vec"), F.col(vec_col))'): _COS,
    (f"{PKG}/operators/dedup.py", 'cosine(F.col("vec_a"), F.col("vec_b"))'): _COS,
    (f"{PKG}/operators/similarity.py", 'scorer(F.col("q_vec"), F.col("c_vec"))'): _COS,
    # --- plans/ml.py -------------------------------------------------------
    (f"{PKG}/plans/ml.py", '"score"'): _f(
        "linear-probability score: float dot product, engine-internal only "
        "(quantizes the threshold set; never oracle-compared directly)"
    ),
    # --- plans/registry.py -------------------------------------------------
    (f"{PKG}/plans/registry.py", 'F.sum("o_totalprice")'): _CENTS,
    (f"{PKG}/plans/registry.py", '"user_mean"'): _SUMD,
    (f"{PKG}/plans/registry.py", '"median_qty"'): _e(
        "median of integral quantities: exact int or k/2 midpoint, <=1 decimal"
    ),
    (f"{PKG}/plans/registry.py", '"mean_value"'): _SUMD,
    (f"{PKG}/plans/registry.py", '"avg_value"'): _SUMD,
    (f"{PKG}/plans/registry.py", '"p25"'): _PCTL,
    (f"{PKG}/plans/registry.py", '"p50"'): _PCTL,
    (f"{PKG}/plans/registry.py", '"p75"'): _PCTL,
    (f"{PKG}/plans/registry.py", '"running_sum"'): _WINDOW,
    (f"{PKG}/plans/registry.py", '"value_rollmean4"'): _WINDOW,
    (f"{PKG}/plans/registry.py", 'S.log1p_("value")'): _f("log1p float math"),
    (f"{PKG}/plans/registry.py", 'S.clip_upper("v", 100.0)'): _f(
        "clip of float column (and 6dp-aligned with the interaction column)"
    ),
    (f"{PKG}/plans/registry.py", 'S.interaction("value", "v")'): _f(
        "float product"
    ),
    (f"{PKG}/plans/registry.py", 'S.fill_null("v", med)'): _f(
        "fill with float median then publish: float column"
    ),
    # (flagship 100*avg(0/1): converted to raw-quotient publication at r13,
    # on schedule — no F.round site remains.)
    # --- plans/registry_analytic.py ---------------------------------------
    (f"{PKG}/plans/registry_analytic.py", '"v"'): _f("float source column"),
    (f"{PKG}/plans/registry_analytic.py", '"v_filled"'): _f(
        "LOCF-filled float column"
    ),
    # --- plans/registry_ext.py (metrics family; r8 rows -> due r12) --------
    (f"{PKG}/plans/registry_ext.py", '"roc_auc"'): _f(
        "trapezoid sum of float products: accumulation order differs"
    ),
    (f"{PKG}/plans/registry_ext.py", '"average_precision"'): _f(
        "sum of precision*rel products: accumulation order differs"
    ),
    # --- plans/registry_ml.py ---------------------------------------------
    (f"{PKG}/plans/registry_ml.py", 'S.log1p_("v_filled")'): _f("log1p float"),
    (f"{PKG}/plans/registry_ml.py", "F.col(c)"): _f(
        "reference-scenario metric table: float metric values, rows-only row"
    ),
    # --- plans/registry_quality.py ----------------------------------------
    (
        f"{PKG}/plans/registry_quality.py",
        'SIM.cosine(F.col("q_vec"), F.col("c_vec"))',
    ): _COS,
    # --- plans/registry_scale.py ------------------------------------------
    (f"{PKG}/plans/registry_scale.py", 'F.max("value")'): _e(
        "max of doubles: exact element, round is display-identity at 6dp"
    ),
    (
        f"{PKG}/plans/registry_scale.py",
        'F.coalesce(F.sum(F.col("__r.value")), F.lit(0.0))',
    ): _SUMD,
    (f"{PKG}/plans/registry_scale.py", 'F.sum("l_quantity")'): _e(
        "sum of integral-valued doubles: exact below 2^53"
    ),
    (f"{PKG}/plans/registry_scale.py", 'F.sum("l_extendedprice")'): _CENTS,
    (
        f"{PKG}/plans/registry_scale.py",
        'F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))',
    ): _SUMD,
    (f"{PKG}/plans/registry_scale.py", 'F.avg("l_extendedprice")'): _SUMD,
    (f"{PKG}/plans/registry_scale.py", 'F.avg("l_discount")'): _SUMD,
    (f"{PKG}/plans/registry_scale.py", 'F.sum("o_totalprice")'): _CENTS,
    (f"{PKG}/plans/registry_scale.py", '"value"'): _f(
        "float source column (salted-join / enrich projections)"
    ),
    (f"{PKG}/plans/registry_scale.py", 'F.avg("value")'): _SUMD,
    (f"{PKG}/plans/registry_scale.py", '"e25"'): _PCTL,
    (f"{PKG}/plans/registry_scale.py", '"e50"'): _PCTL,
    (f"{PKG}/plans/registry_scale.py", '"e75"'): _PCTL,
    (f"{PKG}/plans/registry_scale.py", '"trailing_mean"'): _WINDOW,
    (f"{PKG}/plans/registry_scale.py", '"click"'): _SUMD,
    (f"{PKG}/plans/registry_scale.py", '"view"'): _SUMD,
    (f"{PKG}/plans/registry_scale.py", '"purchase"'): _SUMD,
    (f"{PKG}/plans/registry_scale.py", 'F.sum("value")'): _SUMD,
    # --- plans/registry_stream.py -----------------------------------------
    (f"{PKG}/plans/registry_stream.py", '"avg_value"'): _SUMD,
    # (streaming detection_rate: converted to raw-quotient publication at
    # r13, on schedule — no F.round site remains.)
    (f"{PKG}/plans/registry_stream.py", '"value"'): _f("float source column"),
    (f"{PKG}/plans/registry_stream.py", '"value_lag1"'): _f(
        "lagged float column"
    ),
    (f"{PKG}/plans/registry_stream.py", '"value_lag2"'): _f(
        "lagged float column"
    ),
}

#: Expected number of call sites per key with MORE than one site (default 1).
#: Reviewed per entry: every multi-site key below is the SAME expression in
#: the same role (shared cosine/scorer helpers, streaming twins of batch
#: queries, repeated TPC-H aggregate shapes), so one disposition covering
#: the recorded count is sound — any count drift fails the audit.
EXPECTED_COUNTS: dict[tuple[str, str], int] = {
    (f"{PKG}/operators/dedup.py", 'cosine(F.col("vec_a"), F.col("vec_b"))'): 2,
    (f"{PKG}/operators/similarity.py", 'scorer(F.col("q_vec"), F.col("c_vec"))'): 4,
    (f"{PKG}/plans/registry_quality.py", 'SIM.cosine(F.col("q_vec"), F.col("c_vec"))'): 3,
    (f"{PKG}/plans/registry_scale.py", '"click"'): 2,
    (f"{PKG}/plans/registry_scale.py", '"value"'): 2,
    (f"{PKG}/plans/registry_scale.py", '"view"'): 2,
    (f"{PKG}/plans/registry_scale.py", 'F.sum("l_quantity")'): 2,
    (f"{PKG}/plans/registry_scale.py", 'F.sum("o_totalprice")'): 3,
    (
        f"{PKG}/plans/registry_scale.py",
        'F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))',
    ): 4,
    (f"{PKG}/plans/registry_stream.py", '"value"'): 2,
    (f"{PKG}/plans/registry_stream.py", '"value_lag1"'): 2,
    (f"{PKG}/plans/registry_stream.py", '"value_lag2"'): 2,
}


def audit(root: Path) -> tuple[list[str], list[str], list[str]]:
    """Returns (unclassified, stale_entries, overdue_deferred)."""
    from tools.staleness import current_round

    sites = collect_sites(root)
    unclassified = [f"{f}: {s}" for (f, s) in sites if (f, s) not in DISPOSITIONS]
    stale = [f"{f}: {s}" for (f, s) in DISPOSITIONS if (f, s) not in sites]
    # Per-key count check (r12 ADVICE): a disposition classifies the exact
    # number of sites recorded when it was written, never "however many
    # happen to share the key".
    for key, n in sites.items():
        if key not in DISPOSITIONS:
            continue
        expected = EXPECTED_COUNTS.get(key, 1)
        f, src = key
        if n > expected:
            unclassified.append(
                f"{f}: {src} ({n} sites, {expected} classified — new site "
                "under an existing key; bump EXPECTED_COUNTS after review)"
            )
        elif n < expected:
            stale.append(
                f"{f}: {src} ({n} sites, {expected} classified — a recorded "
                "site was removed; lower EXPECTED_COUNTS)"
            )
    rnd = current_round(root)
    overdue = [
        f"{f}: {s} (planned r{d.planned_round}, now r{rnd})"
        for (f, s), d in DISPOSITIONS.items()
        if d.kind == BOUNDARY_DEFERRED
        and (f, s) in sites
        and d.planned_round is not None
        and rnd > d.planned_round
    ]
    return unclassified, stale, overdue


if __name__ == "__main__":
    # Support `python tools/round_audit.py` as well as the module form
    # (`python -m tools.round_audit`): audit() imports tools.staleness, and
    # script invocation puts tools/ (not the repo root) on sys.path (r11
    # review — the documented CLI crashed with ModuleNotFoundError).
    import sys

    root = Path(__file__).resolve().parent.parent
    if str(root) not in sys.path:
        sys.path.insert(0, str(root))
    unclassified, stale, overdue = audit(root)
    sites = collect_sites(root)
    kinds: dict[str, int] = {}
    for key, n in sites.items():
        d = DISPOSITIONS.get(key)
        kinds[d.kind if d else "UNCLASSIFIED"] = (
            kinds.get(d.kind if d else "UNCLASSIFIED", 0) + n
        )
    print(f"{sum(sites.values())} F.round call sites, {len(sites)} distinct keys")
    for k, v in sorted(kinds.items()):
        print(f"  {k}: {v}")
    for label, rows in (
        ("UNCLASSIFIED", unclassified),
        ("STALE", stale),
        ("OVERDUE", overdue),
    ):
        for r in rows:
            print(f"{label}: {r}")
    raise SystemExit(1 if (unclassified or stale or overdue) else 0)
