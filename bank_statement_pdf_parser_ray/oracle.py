"""Sequential, Ray-free oracle (SURVEY.md §5.2).

The reference repo ships no implementation (SURVEY.md §0), so this
single-process pipeline IS the stand-in reference parser: sort by
(conv_id, turn_idx) -> exact dedup (D1, duplicates are verbatim) ->
per-payload extraction via the shared core -> the frozen expected
output. pytest asserts the distributed Ray pipeline equals this oracle
per turn (per-turn text equality under stable turn ordering,
BASELINE.json north_rule).

Imports: pyarrow + the pure core only. NO ray.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from bank_statement_pdf_parser_ray.schema import OUTPUT_SCHEMA, result_columns_from_payloads


def oracle_extract(input_table: pa.Table) -> pa.Table:
    """Expected output for an input_hint-shaped table, ordered by
    (conv_id, turn_idx), one row per unique key."""
    t = input_table.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    # exact dedup on (conv_id, turn_idx): keep the first occurrence
    keys = [
        f"{c}\x1f{i}"
        for c, i in zip(t.column("conv_id").to_pylist(), t.column("turn_idx").to_pylist())
    ]
    keep = []
    prev = None
    for k in keys:
        keep.append(k != prev)
        prev = k
    t = t.filter(pa.array(keep))

    cols = result_columns_from_payloads(t.column("text").to_pylist())
    data = {
        "conv_id": t.column("conv_id"),
        "turn_idx": t.column("turn_idx"),
        "role": t.column("role"),
        "ts": t.column("ts"),
        **cols,
    }
    arrays = [
        pa.array(data[f.name], type=f.type) if isinstance(data[f.name], list) else data[f.name].cast(f.type)
        for f in OUTPUT_SCHEMA
    ]
    return pa.Table.from_arrays(arrays, schema=OUTPUT_SCHEMA)


def oracle_validate(expected: pa.Table, actual: pa.Table) -> dict:
    """Compare two output tables per (conv_id, turn_idx); both must be
    sorted. Returns a report dict with pass rate and first mismatches."""
    report: dict = {"rows_expected": expected.num_rows, "rows_actual": actual.num_rows}
    if expected.num_rows != actual.num_rows:
        report["pass"] = False
        report["why"] = "row count mismatch"
        return report
    mismatches = []
    for col in ("conv_id", "turn_idx", "extracted_text", "content_kind"):
        eq = pc.equal(expected.column(col), actual.column(col))
        bad = pc.index(eq, False).as_py() if False in eq.to_pylist() else -1
        if bad >= 0:
            mismatches.append((col, bad))
    # nested columns: python-level compare
    for col in ("transactions", "spans"):
        e, a = expected.column(col).to_pylist(), actual.column(col).to_pylist()
        for i, (x, y) in enumerate(zip(e, a)):
            if x != y:
                mismatches.append((col, i))
                break
    report["pass"] = not mismatches
    report["mismatches"] = mismatches[:5]
    n = expected.num_rows
    if n:
        eq = pc.equal(expected.column("extracted_text"), actual.column("extracted_text"))
        report["text_equality_rate"] = pc.sum(pc.cast(eq, pa.int64())).as_py() / n
    return report
