"""S2/S4 sinks (SURVEY.md §2.1).

- ``write_results``: the scale sink — partitioned parquet (resumable
  layout is handled by pipelines/flagship.py + state/manifest.py).
- ``write_spreadsheet``: the reference-parity convenience sink
  (/root/reference/README.md:2 "outputs a clean, standardized Excel
  file"). Real .xlsx output via the from-scratch ECMA-376 writer in
  sources/xlsx.py (no third-party spreadsheet library needed); .csv
  when asked for a csv path.
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
        from bank_statement_pdf_parser_ray.sources.xlsx import write_xlsx

        rows = df.itertuples(index=False, name=None)
        return write_xlsx(path, [str(c) for c in df.columns], [list(r) for r in rows])
    df.to_csv(path, index=False)
    return path
