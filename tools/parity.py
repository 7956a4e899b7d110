"""Local replica of the driver's correctness gate.

Runs every registry query through Spark AND its DuckDB oracle over the same
parquet fixtures, then compares row count, column names, and order-insensitive
values (exact for non-floats, tolerant for floats).  Usage:

    python -m tools.parity [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

from cdc_wastewater_analysis_ml_spark.plans.registry import ORACLES, QUERIES
from cdc_wastewater_analysis_ml_spark.session import get_spark
from cdc_wastewater_analysis_ml_spark.sources.readers import FIXTURE_TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        try:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        except duckdb.Error:
            # Synthetic scale fixtures (tools/gen_scale_fixture.py) carry
            # only documents/embeddings; queries over absent tables fail
            # per-query instead of blocking the whole sweep (r11 — the sf1
            # heaviest-queries oracle sweep runs on such a fixture).
            pass
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_extension_array_dtype(df[c]):
            df[c] = df[c].astype(object).where(df[c].notna(), None)
    key = df.apply(lambda r: tuple(str(v) for v in r), axis=1) if len(df) else None
    if key is not None:
        df = df.assign(__k=key).sort_values("__k").drop(columns="__k")
    return df.reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} != {len(duck_pdf)}")
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns {list(a.columns)} != {list(b.columns)}")
        return problems
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = pd.to_numeric(av, errors="coerce").astype(float)
            bf = pd.to_numeric(bv, errors="coerce").astype(float)
            bad = ~(
                (af.isna() & bf.isna())
                | (abs(af - bf) <= 1e-9 + 1e-9 * abs(bf)).fillna(False)
            )
            if bad.any():
                i = bad.idxmax()
                problems.append(
                    f"col {c}: {int(bad.sum())} float mismatches, "
                    f"e.g. row {i}: {af[i]!r} != {bf[i]!r}"
                )
        else:
            av_s = av.map(lambda v: None if v is None or v != v else str(v))
            bv_s = bv.map(lambda v: None if v is None or v != v else str(v))
            bad = av_s.fillna("\0") != bv_s.fillna("\0")
            if bad.any():
                i = bad.idxmax()
                problems.append(
                    f"col {c}: {int(bad.sum())} mismatches, "
                    f"e.g. row {i}: {av[i]!r} != {bv[i]!r}"
                )
    return problems


def run_parity(sf_dir: str = DEFAULT_SF_DIR, names: list[str] | None = None) -> int:
    unknown = [n for n in names or [] if n not in QUERIES]
    if unknown:
        import difflib

        for n in unknown:
            hint = difflib.get_close_matches(n, QUERIES, n=3)
            suffix = f" (did you mean: {', '.join(hint)}?)" if hint else ""
            print(f"FAIL  {n}: unknown query name{suffix}")
        print(f"\nValid names: {', '.join(sorted(QUERIES))}")
        return len(unknown)
    spark = get_spark("parity-check")
    con = duck_connection(sf_dir)
    selected = names or list(QUERIES)
    failures = 0
    for name in selected:
        sql = ORACLES.get(name)
        try:
            spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if sql is None:
            print(f"ROWS  {name}: {len(spark_pdf)} rows (no oracle)")
            continue
        try:
            duck_pdf = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name}: {len(spark_pdf)} rows")
    print(f"\n{len(selected) - failures}/{len(selected)} queries pass at {sf_dir}")
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else DEFAULT_SF_DIR
    qnames = [a for a in args if "/" not in a] or None
    sys.exit(1 if run_parity(sf, qnames) else 0)
