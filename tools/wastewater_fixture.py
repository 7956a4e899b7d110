"""Deterministic synthetic ``wastewater_samples`` fixture (FIXTURES.md §B).

Stand-in for the reference's ``CDC_Wastewater_Data_for_Influenza_A.csv``
(not in the reference repo — ``.MISSING_LARGE_BLOBS:1``).  Shapes match the
evidence in SURVEY §1.2: null rates, zero-inflated target (~58% negatives),
duplicated rows (~1%), unparsable dates (~0.5%), rec_eff values > 100, all
four population buckets populated including exact edge values.

Usage:
    python -m tools.wastewater_fixture OUT_DIR [N_ROWS]
writes ``wastewater_samples.parquet`` and ``wastewater_samples.csv``.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

STATES = [
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA",
    "HI", "ID", "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD",
    "MA", "MI", "MN", "MS", "MO", "MT", "NE", "NV", "NH", "NJ",
    "NM", "NY", "NC", "ND", "OH", "OK", "OR", "PA", "RI", "SC",
    "SD", "TN", "TX", "UT", "VT", "VA", "WA", "WV", "WI", "WY",
]


def generate_wastewater(n_rows: int = 5000, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n = n_rows

    pop = np.exp(rng.uniform(np.log(1e3), np.log(5e6), n)).astype(np.int64)
    # Pin exact bucket edges (left-closed bins must be exercised).
    for i, v in enumerate([0, 20000, 50000, 200000]):
        pop[i % n] = v

    dates = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 639, n), unit="D"
    )
    date_str = dates.strftime("%Y-%m-%d").to_numpy(dtype=object)
    bad_dates = rng.random(n) < 0.005
    date_str[bad_dates] = rng.choice(["not-a-date", "", "13/45/2024"], bad_dates.sum())

    flow = np.exp(rng.normal(2.5, 1.0, n))
    flow[rng.random(n) < 0.10] = np.nan

    # Detection probability carries real signal (winter seasonality + larger
    # sewersheds detect more) so the EP3 models have something to learn; the
    # overall positive rate stays ≈ the reference's 42% (*.ipynb:483-485).
    month = dates.month.to_numpy()
    winter = np.isin(month, [12, 1, 2, 3]).astype(float)
    pop_sig = (np.log10(pop + 1) - 4.5) / 1.5
    p_detect = np.clip(0.25 + 0.30 * winter + 0.15 * pop_sig, 0.05, 0.92)
    conc = np.where(
        rng.random(n) < p_detect, np.exp(rng.normal(10.0, 2.0, n)), 0.0
    )
    conc[rng.random(n) < 0.01] = np.nan

    flowpop = np.exp(rng.normal(5.0, 1.5, n))
    flowpop[rng.random(n) < 0.05] = np.nan

    lod = np.exp(rng.normal(4.0, 0.5, n))
    lod[rng.random(n) < 0.05] = np.nan

    rec_eff = rng.uniform(0.0, 400.0, n)
    rec_eff[rng.random(n) < 0.03] = np.nan

    pasteurized = rng.choice(["yes", "no"], n).astype(object)
    pasteurized[rng.random(n) < 0.8] = None

    counties = rng.choice(
        ["Adams", "Brown", "Clark", "Davis", "Evans", "Franklin"], n
    ).astype(object)
    counties[rng.random(n) < 0.02] = None

    gene_agg = rng.choice(["N1", "N2", "N1,N2"], n, p=[0.5, 0.3, 0.2]).astype(object)
    gene_agg[rng.random(n) < 0.04] = None

    spike = rng.uniform(1.0, 10.0, n)
    spike[rng.random(n) < 0.2] = -1.0  # sentinel rows (FIXTURES.md §B)

    df = pd.DataFrame(
        {
            "sewershed_id": rng.integers(1, 3001, n),
            "wwtp_jurisdiction": rng.choice(STATES, n),
            "county_fips": [f"{v:05d}" for v in rng.integers(1000, 57000, n)],
            "counties_served": counties,
            "population_served": pop,
            "sample_id": [f"{v:032x}" for v in rng.integers(0, 2**63, n)],
            "sample_collect_date": date_str,
            "sample_type": rng.choice(
                ["24-hr time-weighted composite", "24-hr flow-weighted composite"], n
            ),
            "sample_matrix": "raw wastewater",
            "sample_location": "wwtp",
            "flow_rate": flow,
            "pcr_target": "influenza a",
            "pcr_target_avg_conc": conc,
            "pcr_target_flowpop_lin": flowpop,
            "pcr_gene_target_agg": gene_agg,
            "lod_sewage": lod,
            "pasteurized": pasteurized,
            "rec_eff_percent": rec_eff,
            "rec_eff_spike_conc": spike,
            "date_updated": "01/15/2025 10:30:00 AM",
        }
    )

    # Duplicate ~1% of rows verbatim (dedup path, codes.py:96), and inject
    # same-jurisdiction same-date ties (lag tiebreak semantics).
    dup_idx = rng.choice(n, max(1, n // 100), replace=False)
    df = pd.concat([df, df.iloc[dup_idx]], ignore_index=True)
    return df


def write_fixture(out_dir: str, n_rows: int = 5000, seed: int = 42) -> str:
    os.makedirs(out_dir, exist_ok=True)
    df = generate_wastewater(n_rows, seed)
    pq = os.path.join(out_dir, "wastewater_samples.parquet")
    df.to_parquet(pq, index=False)
    df.to_csv(os.path.join(out_dir, "wastewater_samples.csv"), index=False)
    return pq


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "fixtures"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    print(write_fixture(out, n))
