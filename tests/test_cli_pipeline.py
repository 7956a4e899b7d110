"""Smoke test for the one-command reference-equivalent pipeline
(``python -m cdc_wastewater_analysis_ml_spark``): EP1+EP2+EP3 end to end on a
small synthetic wastewater table, CSV in → processed CSV out."""

import glob

from cdc_wastewater_analysis_ml_spark.__main__ import main
from tools.wastewater_fixture import write_fixture


def test_cli_end_to_end(spark, tmp_path):
    write_fixture(str(tmp_path / "ww"), n_rows=1500)
    csv_in = str(tmp_path / "ww" / "wastewater_samples.csv")
    out = str(tmp_path / "out")
    rc = main([csv_in, "--out", out, "--max-iter", "2"])
    assert rc == 0
    produced = glob.glob(f"{out}/processed_csv/*.csv")
    assert produced, "processed CSV missing"
    header = open(produced[0]).readline().strip().split(",")
    # engineered columns present in the sink
    for col in ("influenza_a_detected", "log_conc_lag1", "population_group_encoded"):
        assert col in header


def test_explain_tool_flags_and_writes(spark, tmp_path, capsys):
    """tools/explain.py must render formatted plans for named queries and
    exit 0 when nothing outside the allowlist is flagged."""
    from tools.explain import main

    out = tmp_path / "plans.txt"
    rc = main(["/root/testdata/sf0.001", "join_left_equi", "topk_categories",
               "--out", str(out)])
    assert rc == 0
    text = out.read_text()
    assert "## join_left_equi" in text and "## topk_categories" in text
    assert "Physical Plan" in text
