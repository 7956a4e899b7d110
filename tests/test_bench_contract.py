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


def test_adhoc_sidecar_never_follows_planted_symlink(tmp_path, monkeypatch):
    """r12 (ADVICE r11): the ad-hoc detail sidecar lives at a FIXED
    predictable tempdir name; a pre-planted symlink there must be REPLACED
    (rename), never followed — otherwise an attacker-chosen target file
    gets overwritten with bench output."""
    import json
    import os
    import tempfile

    from bench import write_detail_sidecar

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    victim = tmp_path / "victim.txt"
    victim.write_text("precious")
    fixed = tmp_path / f"BENCH_DETAIL_last.{os.getuid()}.json"
    fixed.symlink_to(victim)

    out = write_detail_sidecar(False, {"value": 1.0})

    assert victim.read_text() == "precious"
    assert out == str(fixed)
    assert not fixed.is_symlink()
    assert json.loads(fixed.read_text()) == {"value": 1.0}
    # And a pre-existing attacker-owned REGULAR file is replaced, not
    # reused: the inode changes (mkstemp + rename, never open-in-place).
    before = os.stat(fixed).st_ino
    write_detail_sidecar(False, {"value": 2.0})
    assert os.stat(fixed).st_ino != before
    assert json.loads(fixed.read_text()) == {"value": 2.0}
