"""M2 layout text extraction + M9 header/footer noise filter (SURVEY.md §2.2).

pdfplumber-style semantics over text-encoded layout payloads: the
``text`` column carries a page-structured rendering of a statement
(pages separated by form-feed \\f), and this module restores a clean
reading-order line stream:

- pages split on \\f;
- "Page N of M" footer lines dropped everywhere (M9);
- for pages after the first, a leading line-prefix identical to page 1's
  leading lines (the repeated per-page bank header) is dropped once
  (M9 / D2 repeated-line dedup within a payload);
- lines are right-stripped; the per-page line streams are concatenated.

Every line keeps its RAW byte offset into the payload so downstream
table detection can emit spans into the original text.

Reference analogue: /root/reference/README.md:2 "parses bank statement
PDFs ... outputs a clean ... file" — page chrome never reaches the output.
"""

from __future__ import annotations

import re

_PAGE_FOOTER_RX = re.compile(r"(?i)^\s*page\s+\d+\s+of\s+\d+\s*$")
# Table-looking lines (lattice borders / cell rows) never belong to the
# repeated page header — a table may continue on page 2 directly under
# the repeated bank header, and its border/header rows must survive.
_TABLEISH_RX = re.compile(r"^\s*[+|]")

Line = tuple[int, str]  # (raw_offset, right-stripped text)


def split_pages(payload: str) -> list[list[Line]]:
    """Payload -> pages -> (raw_offset, line) pairs."""
    pages: list[list[Line]] = [[]]
    off = 0
    for raw_line in payload.split("\n"):
        seg = raw_line
        start = off
        off += len(raw_line) + 1  # +1 for the split newline
        while "\f" in seg:
            pre, seg = seg.split("\f", 1)
            pages[-1].append((start, pre.rstrip()))
            start += len(pre) + 1
            pages.append([])
        pages[-1].append((start, seg.rstrip()))
    return pages


def _leading_nonblank(lines: list[Line], k: int) -> list[str]:
    out: list[str] = []
    for _, ln in lines:
        if _TABLEISH_RX.match(ln):
            break
        if ln.strip():
            out.append(ln)
        if len(out) >= k:
            break
    return out


def extract_lines(payload: str, header_probe: int = 4) -> list[Line]:
    """Clean reading-order (offset, line) stream for the whole payload.

    ``header_probe`` bounds how many leading non-blank lines of page 1
    are considered the repeated per-page header.
    """
    pages = split_pages(payload)
    if not pages:
        return []
    header = _leading_nonblank(pages[0], header_probe)
    out: list[Line] = []
    for pi, page in enumerate(pages):
        lines = [(o, ln) for o, ln in page if not _PAGE_FOOTER_RX.match(ln)]
        if pi > 0 and header:
            hi = 0
            trimmed: list[Line] = []
            for o, ln in lines:
                if hi < len(header) and ln.strip():
                    if ln == header[hi]:
                        hi += 1
                        continue
                    hi = len(header)  # stop matching at the first mismatch
                trimmed.append((o, ln))
            lines = trimmed
        out.extend(lines)
    while out and not out[0][1].strip():
        out.pop(0)
    while out and not out[-1][1].strip():
        out.pop()
    return out
