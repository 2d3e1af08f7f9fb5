"""M1 content sniffer (SURVEY.md §2.2 M1).

Routes each ``text`` payload to one of three extractors
(BASELINE.json north_star: "routed by content sniffing"):

- ``pdf_layout`` — bank-statement-like layout text (the generalization of
  the reference's PDF input, /root/reference/README.md:2);
- ``html`` — markup payload for the boilerplate stripper;
- ``plain`` — everything else.

Pure function over one payload string; called per row inside the
extractor actor's batch loop (no separate pass over the data).
"""

from __future__ import annotations

import re

from bank_statement_pdf_parser_ray.core.rasterfont import RASTER_MARKER

KIND_PDF = "pdf_layout"
KIND_HTML = "html"
KIND_PLAIN = "plain"
KIND_RASTER = "raster"

# Lattice ruling line: +----+----+ box-drawing grid (camelot-lattice analogue).
_LATTICE_RX = re.compile(r"^\s*\+[-=+]{4,}\+\s*$", re.M)
# Statement column-header line: a date column plus a balance column.
_STMT_HEADER_RX = re.compile(
    r"(?i)^.*\bdate\b.*\b(balance|withdrawal|deposit|debit|credit)\b.*$", re.M
)
# Page footer marker typical of paginated statements.
_PAGE_FOOTER_RX = re.compile(r"(?i)^\s*page\s+\d+\s+of\s+\d+\s*$", re.M)
# HTML structural tags (opening or closing).
_HTML_TAG_RX = re.compile(
    r"(?i)</?\s*(html|head|body|div|p|nav|header|footer|ul|li|a|span|table|h[1-6]|title|script|style)\b"
)


def sniff_kind(text: str) -> str:
    """Classify one payload. Order matters: statement markers beat stray
    angle brackets; HTML needs >=2 structural tags to avoid misrouting
    prose that mentions tags."""
    if not text:
        return KIND_PLAIN
    if text.startswith(RASTER_MARKER):  # scanned page in the b64 envelope
        return KIND_RASTER
    if _LATTICE_RX.search(text) or _STMT_HEADER_RX.search(text) or _PAGE_FOOTER_RX.search(text):
        return KIND_PDF
    tags = _HTML_TAG_RX.findall(text)
    if len(tags) >= 2:
        return KIND_HTML
    return KIND_PLAIN
