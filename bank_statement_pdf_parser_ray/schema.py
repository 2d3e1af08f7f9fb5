"""Arrow schemas of the engine (SURVEY.md §1.2 target data model).

The output schema is the engine's analogue of the reference's
"standardized Excel" row (/root/reference/README.md:2): one fixed
schema regardless of payload family / issuer dialect.
"""

from __future__ import annotations

import pyarrow as pa

INPUT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

SPAN_TYPE = pa.struct([("start", pa.int32()), ("end", pa.int32()), ("kind", pa.string())])

TXN_TYPE = pa.struct(
    [
        ("date", pa.string()),
        ("description", pa.string()),
        ("debit", pa.string()),
        ("credit", pa.string()),
        ("balance", pa.string()),
    ]
)

OUTPUT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("ts", pa.timestamp("us")),
        ("content_kind", pa.string()),
        ("extracted_text", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("transactions", pa.list_(TXN_TYPE)),
        ("dialect", pa.string()),
        ("balance_ok", pa.bool_()),
        ("error", pa.string()),
        ("extractor_version", pa.string()),
    ]
)


def result_columns_from_payloads(texts: list[str]) -> dict[str, list]:
    """Run the core extractor over payload strings -> output column lists
    (everything except the passthrough keys). Shared by the oracle and
    the distributed extractor stage."""
    from bank_statement_pdf_parser_ray.core.extract import extract_payload

    cols: dict[str, list] = {
        "content_kind": [],
        "extracted_text": [],
        "spans": [],
        "transactions": [],
        "dialect": [],
        "balance_ok": [],
        "error": [],
        "extractor_version": [],
    }
    for t in texts:
        out = extract_payload(t)
        cols["content_kind"].append(out["content_kind"])
        cols["extracted_text"].append(out["extracted_text"])
        cols["spans"].append([{"start": s, "end": e, "kind": k} for s, e, k in out["spans"]])
        cols["transactions"].append(out["transactions"])
        cols["dialect"].append(out["dialect"])
        cols["balance_ok"].append(out["balance_ok"])
        cols["error"].append(out["error"])
        cols["extractor_version"].append(out["extractor_version"])
    return cols
