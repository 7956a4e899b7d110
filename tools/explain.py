"""Plan auditor: dump the formatted physical plan of registry queries.

Usage::

    python -m tools.explain [SF_DIR] [QUERY ...] [--out FILE]

With no queries listed, audits the bench HEADLINE set.  The output is the
per-query ``explain("formatted")`` text plus a one-line red-flag scan
(cartesian products, row-wise Python eval, unpartitioned data windows) —
the review loop the scale rules prescribe: after an operator works,
explain it and iterate until the plan is the one you'd want at 100×.
"""

from __future__ import annotations

import re
import sys

#: Substrings that are (almost) always wrong in this engine's plans.
#: BroadcastNestedLoopJoin / CartesianProduct appear legitimately only in
#: documented brute-force baselines; row-wise Python eval never.
RED_FLAGS = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",
)
#: Queries whose documented plan shape legitimately trips a flag:
#: - brute-force baselines (cartesian by definition);
#: - the binary-curve metrics, whose "cross join" is a 1-ROW scalar-totals
#:   broadcast (IdentityBroadcastMode of __pos_total/__neg_total) — the
#:   standard attach-a-global-scalar pattern, bounded by construction.
FLAG_ALLOWED = {
    "sim_cosine_topk",
    "sim_recall_at_k",
    "dedup_embedding_cosine",
    "metric_roc_auc",
    "metric_average_precision",
    "metric_roc_curve",
    "metric_pr_curve",
    # 1-row corpus-total / corpus-size scalar broadcast (same
    # IdentityBroadcastMode pattern as the metric curves; plan tests pin
    # BNLJ count <= 1 for both).
    "corpus_unigram_logprob",
    "corpus_tfidf_top_terms",
    "tpch_important_parts",
}


def main(argv: list[str]) -> int:
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    names = argv[1:]
    if not names:
        from bench import HEADLINE  # repo-root bench.py

        names = list(HEADLINE)

    from cdc_wastewater_analysis_ml_spark.plans.registry import QUERIES
    from cdc_wastewater_analysis_ml_spark.session import get_spark

    spark = get_spark("explain")
    chunks: list[str] = []
    flagged: list[str] = []
    import contextlib
    import io

    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        hits = [f for f in RED_FLAGS if f in plan]
        if hits and name not in FLAG_ALLOWED:
            flagged.append(f"{name}: {', '.join(hits)}")
        windows = [
            ln.strip()[:160]
            for ln in plan.splitlines()
            if re.match(r"\s*\(\d+\) Window", ln)
        ]
        chunks.append(
            f"{'=' * 70}\n## {name}\n{'=' * 70}\n"
            + (f"RED FLAGS: {hits}\n" if hits else "")
            + plan
        )
    report = "\n".join(chunks) + (
        "\n\nFLAGGED (outside documented baselines):\n"
        + ("\n".join(flagged) if flagged else "none")
        + "\n"
    )
    if out_path:
        with open(out_path, "w") as f:
            f.write(report)
        print(f"wrote {out_path} ({len(names)} plans)")
    else:
        print(report)
    print(f"flagged: {flagged if flagged else 'none'}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
