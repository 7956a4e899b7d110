"""Stage attribution for the pipeline_incremental_ingest composite (r9).

The DuckDB oracle hash-gates the VALUES; these tests pin the reason the
composite is non-vacuous: each delta slice dies at its designated stage,
so a regression that turns any stage into a pass-through (or an
over-aggressive one that kills novel content) fails here even if it
produces a well-formed pack table.
"""

from pyspark.sql import functions as F

from cdc_wastewater_analysis_ml_spark.plans.registry import QUERIES
from cdc_wastewater_analysis_ml_spark.plans.registry_ext import (
    _AUG_OFFSET,
    _NOVEL_OFFSET,
)
from cdc_wastewater_analysis_ml_spark.plans.registry_lines import (
    _JUNK_OFFSET,
    _RECRAWL_OFFSET,
    _ingest_delta,
)
from cdc_wastewater_analysis_ml_spark.sources import load_table


def test_only_novel_docs_reach_packing(spark, sf_small):
    out = QUERIES["pipeline_incremental_ingest"](spark, sf_small)
    ids = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    assert ids, "composite produced no packed docs"
    # every survivor is a novel-slice doc (near/recrawl/junk all died)
    assert all(_NOVEL_OFFSET <= i < _RECRAWL_OFFSET for i in ids)
    # and EVERY novel doc survived — the near stage did not overreach
    # (boilerplate was stripped before shingling, so shared site chrome
    # could not push novel docs over the Jaccard threshold)
    novel = {
        r.doc_id + _NOVEL_OFFSET
        for r in load_table(spark, sf_small, "documents")
        .filter(F.col("doc_id") % 5 == 1)
        .select("doc_id")
        .collect()
    }
    assert ids == novel


def test_delta_slices_are_nonempty(spark, sf_small):
    """The attribution above is only meaningful if every killed slice
    actually existed in the delta."""
    delta = _ingest_delta(spark, sf_small)
    counts = {
        row["slice"]: row["n"]
        for row in delta.groupBy(
            (F.floor(F.col("doc_id") / F.lit(_AUG_OFFSET))).alias("slice")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # slices 1-4: near, novel, recrawl, junk
    assert all(counts.get(s, 0) > 0 for s in (1, 2, 3, 4)), counts
    assert _JUNK_OFFSET == 4 * _AUG_OFFSET  # floor-division slice math
