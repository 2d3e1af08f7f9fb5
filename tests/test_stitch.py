"""Cross-turn statement stitching (stages/stitch.py)."""

from __future__ import annotations

import pyarrow as pa

import ray.data

from bank_statement_pdf_parser_ray.stages.stitch import stitch_statements

PAGE1 = """DBS BANK LTD
Account Statement

+--------------+--------------------------+----------------+----------------+------------------+
| Date         | Transaction Details      | Debit          | Credit         | Balance          |
+--------------+--------------------------+----------------+----------------+------------------+
| 05/01/2024   | OPENING CREDIT           |                | 1,000.00       | 1,000.00         |
+--------------+--------------------------+----------------+----------------+------------------+

Page 1 of 2"""

PAGE2 = """DBS BANK LTD
Account Statement

+--------------+--------------------------+----------------+----------------+------------------+
| Date         | Transaction Details      | Debit          | Credit         | Balance          |
+--------------+--------------------------+----------------+----------------+------------------+
| 20/01/2024   | CARD PAYMENT             | 250.00         |                | 750.00           |
+--------------+--------------------------+----------------+----------------+------------------+

End of Statement
Page 2 of 2"""


def _conv(conv_id: str, texts: list[str], start_idx: int = 0):
    n = len(texts)
    return {
        "conv_id": [conv_id] * n,
        "turn_idx": list(range(start_idx, start_idx + n)),
        "role": ["tool"] * n,
        "text": texts,
        "tool": ["pdf_reader"] * n,
        "ts": [0] * n,
    }


def _table(*convs) -> pa.Table:
    cols = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for c in convs:
        for k in cols:
            cols[k].extend(c[k])
    t = pa.table(cols)
    return t.set_column(1, "turn_idx", t.column("turn_idx").cast(pa.int32()))


class TestStitch:
    def test_split_statement_reassembled(self):
        src = ray.data.from_arrow(
            _table(
                _conv("c1", ["hello plain turn", PAGE1, PAGE2, "closing remark"]),
                _conv("c2", ["unrelated"]),
            )
        )
        out = stitch_statements(src).to_pandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert row["conv_id"] == "c1"
        assert (row["first_turn_idx"], row["last_turn_idx"], row["n_turns"]) == (1, 2, 2)
        assert row["dialect"] == "DBS"
        # both pages' transactions in ONE table, balance chain across the
        # turn boundary validated
        assert row["n_transactions"] == 2
        assert row["balance_ok"] == True  # noqa: E712

    def test_broken_chain_detected_across_turns(self):
        bad2 = PAGE2.replace("750.00", "751.00")
        src = ray.data.from_arrow(_table(_conv("c1", [PAGE1, bad2])))
        out = stitch_statements(src).to_pandas()
        assert len(out) == 1
        assert out.iloc[0]["balance_ok"] == False  # noqa: E712

    def test_non_consecutive_pages_not_stitched(self):
        src = ray.data.from_arrow(
            _table(_conv("c1", [PAGE1, "interruption turn", PAGE2]))
        )
        out = stitch_statements(src).to_pandas()
        assert len(out) == 0  # page 2 not adjacent -> no stitch

    def test_single_page_statements_ignored(self):
        single = PAGE1.replace("Page 1 of 2", "Page 1 of 1")
        src = ray.data.from_arrow(_table(_conv("c1", [single])))
        assert stitch_statements(src).count() == 0

    def test_ten_page_document_stitched(self):
        pages = []
        for i in range(1, 11):
            body = PAGE1.replace("Page 1 of 2", f"Page {i} of 10")
            pages.append(body)
        src = ray.data.from_arrow(_table(_conv("c1", pages)))
        out = stitch_statements(src).to_pandas()
        assert len(out) == 1 and out.iloc[0]["n_turns"] == 10

    def test_truncated_run_not_emitted(self):
        p1 = PAGE1.replace("Page 1 of 2", "Page 1 of 3")
        p2 = PAGE2.replace("Page 2 of 2", "Page 2 of 3")
        src = ray.data.from_arrow(_table(_conv("c1", [p1, p2])))
        assert stitch_statements(src).count() == 0  # page 3 never arrived

    def test_footer_below_page_marker(self):
        p2 = PAGE2 + "\nDBS Bank Ltd Co. Reg. No. 196800306E"
        src = ray.data.from_arrow(_table(_conv("c1", [PAGE1, p2])))
        out = stitch_statements(src).to_pandas()
        assert len(out) == 1 and out.iloc[0]["n_transactions"] == 2
