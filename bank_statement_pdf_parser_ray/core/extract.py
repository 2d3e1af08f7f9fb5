"""Per-payload extraction orchestrator: sniff -> route -> extract (X2 registry).

The single pure function both the sequential oracle (oracle.py) and the
distributed extractor actor (stages/extract.py) call per payload, so the
engine's per-turn text equality vs the oracle is equality by
construction wherever distribution is correct (SURVEY.md §7).

Routing (BASELINE.json north_star):
- ``pdf_layout`` -> statement extractor (M2..M9)
- ``html``       -> boilerplate stripper (M6)
- ``plain``      -> normalizer (M7)
"""

from __future__ import annotations

from typing import Any, Callable

from bank_statement_pdf_parser_ray import EXTRACTOR_VERSION
from bank_statement_pdf_parser_ray.core.html_strip import strip_html
from bank_statement_pdf_parser_ray.core.normalize import normalize_text
from bank_statement_pdf_parser_ray.core.rasterfont import ocr_page, raster_payload_pgm
from bank_statement_pdf_parser_ray.core.sniff import (
    KIND_HTML,
    KIND_PDF,
    KIND_PLAIN,
    KIND_RASTER,
    sniff_kind,
)
from bank_statement_pdf_parser_ray.core.statement import extract_statement


def _extract_plain(payload: str) -> dict[str, Any]:
    text = normalize_text(payload)
    n = len(payload)
    lead = len(payload) - len(payload.lstrip())
    trail = len(payload.rstrip())
    spans = [(lead, trail, "text")] if text else []
    return {"extracted_text": text, "transactions": [], "spans": spans, "dialect": "", "balance_ok": True}


def _extract_html(payload: str) -> dict[str, Any]:
    text, spans = strip_html(payload)
    return {"extracted_text": text, "transactions": [], "spans": [(s, e, k) for s, e, k in spans], "dialect": "", "balance_ok": True}


def _extract_raster(payload: str) -> dict[str, Any]:
    """OCR fallback (reference: scanned-statement path): recover the
    page text from the base64 PGM envelope with the bitmap-font
    template matcher, then route the RECOVERED text through the normal
    sniff -> extract dispatch (a scanned statement lands in the
    statement extractor; a scanned letter in the normalizer). Spans
    index into the recovered text. Unreadable rasters raise, which
    ``extract_payload`` turns into a quarantined error row."""
    pgm = raster_payload_pgm(payload)
    text = ocr_page(pgm) if pgm is not None else ""
    if not text:
        raise ValueError("unreadable raster payload")
    inner = sniff_kind(text)
    if inner == KIND_RASTER:  # never recurse on a recovered marker line
        inner = KIND_PLAIN
    return EXTRACTORS[inner](text)


# X2 extractor registry: content_kind -> extractor
EXTRACTORS: dict[str, Callable[[str], dict[str, Any]]] = {
    KIND_PDF: extract_statement,
    KIND_HTML: _extract_html,
    KIND_PLAIN: _extract_plain,
    KIND_RASTER: _extract_raster,
}


def extract_payload(payload: str) -> dict[str, Any]:
    """sniff + route + extract one payload. Never raises on bad input:
    extraction failures degrade to the plain normalizer with
    ``error`` set (quarantine-able via M10)."""
    if payload is None:
        payload = ""
    kind = sniff_kind(payload)
    try:
        out = EXTRACTORS[kind](payload)
        err = ""
    except Exception as e:  # defensive: one bad payload must not kill a block
        out = _extract_plain(payload)
        err = f"{type(e).__name__}: {e}"
    out["content_kind"] = kind
    out["extractor_version"] = EXTRACTOR_VERSION
    out["error"] = err
    return out
