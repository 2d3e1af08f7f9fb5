"""S2/S4 sinks (SURVEY.md §2.1).

- ``write_results``: the scale sink — partitioned parquet (resumable
  layout is handled by pipelines/flagship.py + state/manifest.py).
- ``write_spreadsheet``: the reference-parity convenience sink
  (/root/reference/README.md:2 "outputs a clean, standardized Excel
  file"). openpyxl is not installed in this environment [SURVEY §0 ENV],
  so the standardized table is written as CSV (spreadsheet-openable);
  if openpyxl ever appears, the same frame goes to .xlsx.
"""

from __future__ import annotations

import ray.data


def write_results(ds: "ray.data.Dataset", out_dir: str) -> None:
    ds.write_parquet(out_dir)


def write_spreadsheet(ds: "ray.data.Dataset", path: str, limit: int = 1_048_576) -> str:
    """Small-result convenience export (driver-side; bounded by `limit`
    — a spreadsheet is not a 100TB sink)."""
    df = ds.limit(limit).to_pandas()
    if path.endswith(".xlsx"):
        try:
            df.to_excel(path, index=False)
            return path
        except (ImportError, ModuleNotFoundError):
            path = path[: -len(".xlsx")] + ".csv"
    df.to_csv(path, index=False)
    return path
