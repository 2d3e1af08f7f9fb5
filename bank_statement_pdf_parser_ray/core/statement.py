"""PDF-layout statement extractor: M2+M3/M4+M5+M8+M9 composed (SURVEY.md §3.1).

The per-payload analogue of the reference tool's whole run
(/root/reference/README.md:2): layout text -> table detect -> dialect
row match -> continuation merge -> noise filter -> standardized rows.

Multi-page statements are the norm: a transaction table may continue
across pages, each continuation under a repeated column header. All
tables are detected in document order and their rows concatenated into
ONE standardized transaction stream (the balance chain runs across
pages, so G3 validation spans them).

Output contract (one payload):
- ``extracted_text`` — the cleaned statement body where each table region
  is replaced by one canonical line per transaction
  ``date | description | debit | credit | balance`` (empty fields stay
  empty), M7-normalized. This is the per-turn text-equality field.
- ``transactions`` — the standardized row list (string-typed; SURVEY §1.2).
- ``spans`` — (start, end, kind) into the RAW payload: "table" for each
  detected table region, "body" for the full kept-line region.
- ``dialect`` / ``balance_ok`` — J1 verdict and G3 validation.
"""

from __future__ import annotations

from typing import Any

from bank_statement_pdf_parser_ray.core import tables as T
from bank_statement_pdf_parser_ray.core.dialects import (
    DialectConfig,
    MatchResult,
    detect_dialect,
    map_columns,
    match_rows,
    period_year,
)
from bank_statement_pdf_parser_ray.core.layout import extract_lines
from bank_statement_pdf_parser_ray.core.normalize import normalize_text


def _canonical_txn_line(t: dict[str, str]) -> str:
    return " | ".join([t["date"], t["description"], t["debit"], t["credit"], t["balance"]])


def _find_tables(lines: list[str], cfg: DialectConfig | None) -> list[T.Table]:
    """All tables in document order (a statement's table continues across
    pages under repeated headers). Indices are absolute into ``lines``."""
    tables: list[T.Table] = []
    pos = 0
    while pos < len(lines):
        rest = lines[pos:]
        tbl: T.Table | None = None
        if cfg is not None:
            lat = T.find_lattice_table(rest)
            stream = None if cfg.table_kind == "lattice" else T.find_stream_table(rest, cfg.header_rx)
            # take whichever starts FIRST in document order; on overlap the
            # ruling grid wins (camelot semantics: lattice beats stream) —
            # but a grid far below a stream table (e.g. a boxed fee-summary
            # after the transaction table) must not pre-empt it
            if lat is not None and stream is not None:
                tbl = lat if lat.start_line <= stream.start_line else stream
            else:
                tbl = lat or stream
        else:
            tbl = T.find_lattice_table(rest)
        if tbl is None:
            break
        tables.append(
            T.Table(tbl.header, tbl.rows, tbl.start_line + pos, tbl.end_line + pos)
        )
        pos = tbl.end_line + pos
    return tables


def extract_statement(payload: str) -> dict[str, Any]:
    lines_off = extract_lines(payload)
    lines = [ln for _, ln in lines_off]
    cfg: DialectConfig | None = detect_dialect(lines)
    tables = _find_tables(lines, cfg)

    spans: list[tuple[int, int, str]] = []
    if lines_off:
        body_start = lines_off[0][0]
        body_end = lines_off[-1][0] + len(lines_off[-1][1])
        spans.append((body_start, body_end, "body"))

    txns: list[dict[str, str]] = []
    balance_ok = True
    if tables and cfg is not None:
        # concatenate all tables into one match stream (per-table header
        # mapping; continuation rows still merge within their table run)
        res = MatchResult()
        year = period_year(lines)
        for tbl in tables:
            roles = map_columns(tbl.header)
            match_rows(tbl.rows, roles, cfg, into=res, default_year=year)
        txns = [t.as_dict() for t in res.transactions]
        balance_ok = res.balance_ok

        out_lines: list[str] = []
        cursor = 0
        first_table = True
        for tbl in tables:
            out_lines.extend(ln for _, ln in lines_off[cursor : tbl.start_line])
            if first_table:
                if res.opening_balance:
                    out_lines.append(f"BALANCE B/F | | | | {res.opening_balance}")
                out_lines.extend(_canonical_txn_line(t) for t in txns)
                first_table = False
            # later table regions collapse into the first (already emitted)
            ts = lines_off[tbl.start_line][0]
            last = lines_off[tbl.end_line - 1]
            spans.append((ts, last[0] + len(last[1]), "table"))
            cursor = tbl.end_line
        out_lines.extend(ln for _, ln in lines_off[cursor:])
    else:
        out_lines = lines

    return {
        "extracted_text": normalize_text("\n".join(out_lines)),
        "transactions": txns,
        "spans": spans,
        "dialect": cfg.name if cfg else "",
        "balance_ok": balance_ok,
    }
