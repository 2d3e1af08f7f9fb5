"""A1 extractor actor pool (SURVEY.md §2.3 A1; BASELINE.json "actor pools
holding warm parser state (compiled regex banks, layout models, OCR
fallbacks)").

A callable class passed to ``map_batches(cls, concurrency=N)`` — Ray Data
instantiates one actor per pool slot; ``__init__`` warms the parser state
once per actor (importing the core compiles every regex bank; the OCR
fallback is the from-scratch bitmap-font template matcher in
core/rasterfont.py — no OCR library ships in this environment),
``__call__`` extracts one zero-copy Arrow batch.

The per-payload work (layout parse, table detection, dialect regex bank)
is inherently per-document, so the batch loop is a Python loop over
payload strings — the vectorized parts (key hashing, column assembly,
normalization-only fast paths) use Arrow kernels. This is the same
shape any published extraction pipeline uses for document payloads.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from bank_statement_pdf_parser_ray.schema import OUTPUT_SCHEMA, result_columns_from_payloads


class ExtractorActor:
    """Warm-state extractor: __init__ once per actor, __call__ per batch."""

    def __init__(self) -> None:
        # Importing the core modules compiles all regex banks (M5 dialects,
        # M6 tag patterns, M7 tables) once per actor process.
        from bank_statement_pdf_parser_ray.core.dialects import DIALECTS
        from bank_statement_pdf_parser_ray.core.extract import EXTRACTORS, extract_payload

        self._extract = extract_payload
        self._dialects = DIALECTS
        self._extractors = EXTRACTORS
        # OCR fallback hook (reference: scanned-statement path). No OCR
        # library ships in this environment, so the hook is the
        # from-scratch bitmap-font template matcher: raster payloads
        # (core/rasterfont.py envelope) route through it inside
        # extract_payload, and it's exposed here for direct use on
        # binary media columns.
        from bank_statement_pdf_parser_ray.core.rasterfont import ocr_page

        self.ocr_fallback = ocr_page
        # warm the matchers on a tiny probe so first-batch latency is flat
        extract_payload("warmup 01/01/2024")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        cols = result_columns_from_payloads(texts)
        out: dict[str, Any] = {
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "role": batch.column("role"),
            "ts": batch.column("ts"),
        }
        arrays = []
        names = []
        for f in OUTPUT_SCHEMA:
            names.append(f.name)
            if f.name in out:
                arrays.append(out[f.name])
            else:
                arrays.append(pa.array(cols[f.name], type=f.type))
        t = pa.table(dict(zip(names, arrays)))
        # carry the partition/salt keys through when present
        for extra in ("part", "salt", "group_key"):
            if extra in batch.schema.names:
                t = t.append_column(extra, batch.column(extra))
        return t
