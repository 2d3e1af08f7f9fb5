"""Cross-turn statement stitching — a conversation-LEVEL extraction op.

Real agent transcripts often carry one document split across several
tool-output turns (page 1 of a statement in turn k, page 2 in turn
k+1). Per-turn extraction handles each fragment alone; this stage runs
AFTER the ordering shuffle, walks each conversation in turn order, and
re-assembles page-numbered pdf_layout runs ("Page 1 of N" ... "Page N
of N" in consecutive turns) into one payload which is re-extracted as a
whole — so the merged statement's transaction table and balance chain
(G3) span the original turn boundary.

Output: one row per stitched document:
(conv_id, first_turn_idx, last_turn_idx, n_turns, dialect,
 n_transactions, balance_ok, extracted_text).

Partitioning assumption (documented per the custom-operator rule): all
turns of a conversation reach one group — guaranteed by grouping on
conv_id (stitching is rare and the per-group payload is a handful of
turns' text, so the per-conversation grouping that the ordering shuffle
avoids for bulk rows is fine here: the input is pre-filtered to
pdf_layout rows with page markers only, a tiny fraction of the corpus).
"""

from __future__ import annotations

import re

import pandas as pd

import ray.data

# own-line marker anywhere in the payload (statements often place legal
# footer lines BELOW the page number)
_PAGE_RX = re.compile(r"(?im)^\s*page\s+(\d+)\s+of\s+(\d+)\s*$")


def _page_marker(text: str) -> tuple[int, int] | None:
    """Last 'Page i of N' own-line marker in a payload."""
    hits = _PAGE_RX.findall(text)
    if not hits:
        return None
    i, n = hits[-1]
    return int(i), int(n)


def _stitch_conv(g: pd.DataFrame) -> pd.DataFrame:
    from bank_statement_pdf_parser_ray.core.statement import extract_statement

    g = g.sort_values("turn_idx").reset_index(drop=True)
    out = []
    run: list[int] = []  # row indices of the current page run
    run_complete = False  # last page of the document was seen
    expect_next = None
    total = None

    def flush() -> None:
        nonlocal run, run_complete
        # only COMPLETE multi-turn documents are stitched — a truncated
        # run (page N never seen) must not pass as a validated document
        if len(run) >= 2 and run_complete:
            rows = g.iloc[run]
            payload = "\f".join(rows["text"].tolist())
            res = extract_statement(payload)
            out.append(
                {
                    "conv_id": rows["conv_id"].iloc[0],
                    "first_turn_idx": int(rows["turn_idx"].iloc[0]),
                    "last_turn_idx": int(rows["turn_idx"].iloc[-1]),
                    "n_turns": len(rows),
                    "dialect": res["dialect"],
                    "n_transactions": len(res["transactions"]),
                    "balance_ok": bool(res["balance_ok"]),
                    "extracted_text": res["extracted_text"],
                }
            )
        run = []
        run_complete = False

    for i in range(len(g)):
        marker = _page_marker(g["text"].iloc[i])
        if marker is None:
            flush()
            expect_next = None
            continue
        page, n_pages = marker
        if page == 1 and n_pages > 1:
            flush()
            run = [i]
            expect_next, total = 2, n_pages
        elif run and expect_next == page and total == n_pages and g["turn_idx"].iloc[i] == g["turn_idx"].iloc[run[-1]] + 1:
            run.append(i)
            if page == n_pages:
                run_complete = True
                flush()
                expect_next = None
            else:
                expect_next = page + 1
        else:
            flush()
            expect_next = None
    flush()
    cols = [
        "conv_id", "first_turn_idx", "last_turn_idx", "n_turns",
        "dialect", "n_transactions", "balance_ok", "extracted_text",
    ]
    return pd.DataFrame(out, columns=cols)


def stitch_statements(transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Input: the raw transcript Dataset (conv_id, turn_idx, text, ...).
    Pre-filters to page-marked payloads (vectorized) so the conv_id
    grouping only sees candidate rows, then stitches per conversation."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def candidates(t: pa.Table) -> pa.Table:
        # total pages >= 2: any count except exactly 1 (handles 10, 100, ...)
        mask = pc.match_substring_regex(
            t.column("text"), pattern=r"(?i)page\s+\d+\s+of\s+([2-9]|[1-9]\d+)\b"
        )
        return t.filter(mask).select(["conv_id", "turn_idx", "text"])

    ds = transcripts.map_batches(candidates, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("conv_id").map_groups(_stitch_conv, batch_format="pandas")
