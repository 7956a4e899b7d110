"""Bench-harness contract guards (the BENCH_r05 truncation lesson: the
driver records only the LAST ~2000 chars of stdout, so the one JSON line
must always fit — including every median and both totals)."""

from bench import HEADLINE

from cdc_wastewater_analysis_ml_spark.plans.registry import QUERIES


def test_headline_names_are_registered():
    missing = [n for n in HEADLINE if n not in QUERIES]
    assert not missing, missing


def test_headline_has_no_duplicates():
    assert len(HEADLINE) == len(set(HEADLINE))


def test_bench_line_fits_driver_record():
    """Worst-case stdout line length: scalar summary (~170 chars incl. the
    trailing duplicate totals) + '"name": 123.456, ' per query.  Must stay
    under the ~2000-char tail horizon with slack, or adding a query
    silently truncates the record again."""
    per_query = sum(len(n) + 12 for n in HEADLINE)
    assert 170 + per_query < 1980, (
        f"headline too large for the driver record: ~{170 + per_query} chars; "
        "shrink the set or emit a second compact line"
    )
