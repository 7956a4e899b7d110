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
