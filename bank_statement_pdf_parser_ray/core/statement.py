"""PDF-layout statement extractor: M2+M3/M4+M5+M8+M9 composed (SURVEY.md §3.1).

The per-payload analogue of the reference tool's whole run
(/root/reference/README.md:2): layout text -> table detect -> dialect
row match -> continuation merge -> noise filter -> standardized rows.

Output contract (one payload):
- ``extracted_text`` — the cleaned statement body where the table region
  is replaced by one canonical line per transaction
  ``date | description | debit | credit | balance`` (empty fields stay
  empty), M7-normalized. This is the per-turn text-equality field.
- ``transactions`` — the standardized row list (string-typed; SURVEY §1.2).
- ``spans`` — (start, end, kind) into the RAW payload: "table" for the
  detected table region, "body" for the full kept-line region.
- ``dialect`` / ``balance_ok`` — J1 verdict and G3 validation.
"""

from __future__ import annotations

from typing import Any

from bank_statement_pdf_parser_ray.core import tables as T
from bank_statement_pdf_parser_ray.core.dialects import (
    DialectConfig,
    detect_dialect,
    map_columns,
    match_rows,
)
from bank_statement_pdf_parser_ray.core.layout import extract_lines
from bank_statement_pdf_parser_ray.core.normalize import normalize_text


def _canonical_txn_line(t: dict[str, str]) -> str:
    return " | ".join([t["date"], t["description"], t["debit"], t["credit"], t["balance"]])


def extract_statement(payload: str) -> dict[str, Any]:
    lines_off = extract_lines(payload)
    lines = [ln for _, ln in lines_off]
    cfg: DialectConfig | None = detect_dialect(lines)

    table: T.Table | None = None
    if cfg is not None:
        has_grid = any(T.is_border(ln) for ln in lines)
        if cfg.table_kind == "lattice" or has_grid:
            # a ruling grid always wins (camelot semantics: lattice beats
            # stream when rulings exist) — also the GENERIC-dialect path
            table = T.find_lattice_table(lines)
        if table is None:
            table = T.find_stream_table(lines, cfg.header_rx)
    if table is None:
        table = T.find_lattice_table(lines)

    spans: list[tuple[int, int, str]] = []
    if lines_off:
        body_start = lines_off[0][0]
        body_end = lines_off[-1][0] + len(lines_off[-1][1])
        spans.append((body_start, body_end, "body"))

    txns: list[dict[str, str]] = []
    balance_ok = True
    out_lines: list[str]
    if table is not None and cfg is not None:
        roles = map_columns(table.header)
        res = match_rows(table.rows, roles, cfg)
        txns = [t.as_dict() for t in res.transactions]
        balance_ok = res.balance_ok
        ts = lines_off[table.start_line][0]
        last = lines_off[table.end_line - 1]
        spans.append((ts, last[0] + len(last[1]), "table"))
        out_lines = [ln for _, ln in lines_off[: table.start_line]]
        if res.opening_balance:
            out_lines.append(f"BALANCE B/F | | | | {res.opening_balance}")
        out_lines.extend(_canonical_txn_line(t) for t in txns)
        out_lines.extend(ln for _, ln in lines_off[table.end_line :])
    else:
        out_lines = lines

    return {
        "extracted_text": normalize_text("\n".join(out_lines)),
        "transactions": txns,
        "spans": spans,
        "dialect": cfg.name if cfg else "",
        "balance_ok": balance_ok,
    }
