"""M3 lattice + M4 stream table detection (SURVEY.md §2.2 M3/M4).

camelot-style semantics re-expressed over text-encoded layout
(BASELINE.json north_star: "camelot-style lattice/stream table
detection"):

- **lattice**: the cell grid is recovered from ruling lines — here the
  box-drawing border rows ``+----+----+`` and cell rows ``| a | b |``.
  Consecutive cell rows between two borders form ONE logical row whose
  per-column text is the space-join of the non-empty fragments
  (wrapped descriptions).
- **stream**: column boundaries are recovered from whitespace alignment —
  the header line's column-name start positions define cut windows
  (midpoints between a header token's end and the next token's start),
  and every data line is sliced at those cuts.

Both return rows of raw cell strings; dialect row-matching (M5) turns
them into transactions.
"""

from __future__ import annotations

import re
from typing import NamedTuple

_BORDER_RX = re.compile(r"^\s*\+[-=+]+\+\s*$")
_CELL_ROW_RX = re.compile(r"^\s*\|.*\|\s*$")


def is_border(line: str) -> bool:
    return bool(_BORDER_RX.match(line))


def is_cell_row(line: str) -> bool:
    return bool(_CELL_ROW_RX.match(line))


class Table(NamedTuple):
    header: list[str]        # column names
    rows: list[list[str]]    # physical rows of raw cell strings
    start_line: int          # index of first table line in the input
    end_line: int            # index past the last table line


def find_lattice_table(lines: list[str]) -> Table | None:
    """Find the first box-drawn table; merge wrapped cell rows per
    bordered row group. Returns None when no grid exists."""
    start = None
    for i, ln in enumerate(lines):
        if is_border(ln):
            start = i
            break
    if start is None:
        return None
    groups: list[list[list[str]]] = []  # list of row-groups, each = physical rows of cells
    cur: list[list[str]] = []
    end = start
    i = start
    while i < len(lines):
        ln = lines[i]
        if is_border(ln):
            if cur:
                groups.append(cur)
                cur = []
            end = i + 1
            i += 1
            continue
        if is_cell_row(ln):
            cells = [c.strip() for c in ln.strip().strip("|").split("|")]
            cur.append(cells)
            end = i + 1
            i += 1
            continue
        break  # table ended
    if cur:
        groups.append(cur)
    if not groups:
        return None

    def merge(group: list[list[str]]) -> list[str]:
        width = max(len(r) for r in group)
        out = []
        for c in range(width):
            parts = [r[c] for r in group if c < len(r) and r[c]]
            out.append(" ".join(parts))
        return out

    merged = [merge(g) for g in groups]
    return Table(header=merged[0], rows=merged[1:], start_line=start, end_line=end)


def stream_cuts(header_line: str) -> list[int]:
    """Column cut positions from a stream header line.

    Tokens are runs separated by >=2 spaces ("Transaction Details" stays
    one token). Cut i = midpoint between token[i-1].end and token[i].start,
    so right-aligned numerics that start left of their header name still
    land in the right window.
    """
    tokens = [(m.start(), m.end()) for m in re.finditer(r"\S+(?:\s\S+)*?(?=\s{2,}|\s*$)", header_line)]
    cuts = [0]
    for (s0, e0), (s1, _e1) in zip(tokens, tokens[1:]):
        cuts.append((e0 + s1 + 1) // 2)
    return cuts


def slice_row(line: str, cuts: list[int]) -> list[str]:
    out = []
    for i, c in enumerate(cuts):
        nxt = cuts[i + 1] if i + 1 < len(cuts) else len(line)
        out.append(line[c:nxt].strip())
    return out


def find_stream_table(lines: list[str], header_rx: re.Pattern[str]) -> Table | None:
    """Find the first whitespace-aligned table whose header matches
    ``header_rx`` (dialect-specific column names); data rows run until
    the first blank line followed by a non-data line, or end of input."""
    hdr_i = None
    for i, ln in enumerate(lines):
        if header_rx.search(ln):
            hdr_i = i
            break
    if hdr_i is None:
        return None
    cuts = stream_cuts(lines[hdr_i])
    header = slice_row(lines[hdr_i], cuts)
    rows: list[list[str]] = []
    end = hdr_i + 1
    blanks = 0
    for j in range(hdr_i + 1, len(lines)):
        ln = lines[j]
        if not ln.strip():
            blanks += 1
            if blanks >= 2:
                break
            continue
        if blanks and not ln.startswith(" "):
            break  # paragraph after the table
        blanks = 0
        rows.append(slice_row(ln, cuts))
        end = j + 1
    return Table(header=header, rows=rows, start_line=hdr_i, end_line=end)
