"""Statement-to-rows fixture tests (SURVEY.md §5.1; BASELINE.json
"golden-file tests mirroring the repo's statement-to-rows fixtures").

Hand-written statement texts per issuer dialect -> exact expected
transaction tuples.
"""

from __future__ import annotations

from bank_statement_pdf_parser_ray.core.extract import extract_payload
from bank_statement_pdf_parser_ray.core.statement import extract_statement

UOB_STREAM = """UOB   UNITED OVERSEAS BANK LIMITED
Account Statement
Account No: 123-456-789
Statement Period: 01 Jan 2024 to 31 Dec 2024

Date                    Description                     Withdrawal          Deposit         Balance
                        BALANCE B/F                                                       10,000.00
05 Jan 2024             GIRO SALARY PAYMENT                                5,000.00       15,000.00
12 Feb 2024             CARD PURCHASE ONLINE              1,250.50                        13,749.50
                        MERCHANT REF 998877
03 Mar 2024             CHEQUE DEPOSIT                                       100.00       13,849.50

End of Statement
Page 1 of 1"""


class TestUOBStream:
    def test_rows(self):
        out = extract_statement(UOB_STREAM)
        assert out["dialect"] == "UOB"
        t = out["transactions"]
        assert t == [
            {"date": "2024-01-05", "description": "GIRO SALARY PAYMENT", "debit": "", "credit": "5000.00", "balance": "15000.00"},
            {"date": "2024-02-12", "description": "CARD PURCHASE ONLINE MERCHANT REF 998877", "debit": "1250.50", "credit": "", "balance": "13749.50"},
            {"date": "2024-03-03", "description": "CHEQUE DEPOSIT", "debit": "", "credit": "100.00", "balance": "13849.50"},
        ]
        assert out["balance_ok"] is True

    def test_extracted_text_canonical(self):
        out = extract_statement(UOB_STREAM)
        assert "2024-01-05 | GIRO SALARY PAYMENT | | 5000.00 | 15000.00" in out["extracted_text"]
        assert "Page 1 of 1" not in out["extracted_text"]
        assert "BALANCE B/F | | | | 10000.00" in out["extracted_text"]

    def test_balance_violation_detected(self):
        bad = UOB_STREAM.replace("13,849.50", "13,849.51")
        out = extract_statement(bad)
        assert out["balance_ok"] is False


DBS_LATTICE = """DBS BANK LTD
Account Statement
Account No: 555-001-002

+--------------+--------------------------+----------------+----------------+------------------+
| Date         | Transaction Details      | Debit          | Credit         | Balance          |
+--------------+--------------------------+----------------+----------------+------------------+
| 10/01/2024   | FAST TRANSFER IN         |                | 2,000.00       | 2,000.00         |
+--------------+--------------------------+----------------+----------------+------------------+
| 15/01/2024   | POS PURCHASE             | 350.25         |                | 1,649.75         |
|              | GROCERY STORE 42         |                |                |                  |
+--------------+--------------------------+----------------+----------------+------------------+

End of Statement
Page 1 of 1"""


class TestDBSLattice:
    def test_rows(self):
        out = extract_statement(DBS_LATTICE)
        assert out["dialect"] == "DBS"
        t = out["transactions"]
        assert t == [
            {"date": "2024-01-10", "description": "FAST TRANSFER IN", "debit": "", "credit": "2000.00", "balance": "2000.00"},
            {"date": "2024-01-15", "description": "POS PURCHASE GROCERY STORE 42", "debit": "350.25", "credit": "", "balance": "1649.75"},
        ]
        assert out["balance_ok"] is True  # no opening balance -> checked from row 2

    def test_table_span(self):
        out = extract_statement(DBS_LATTICE)
        kinds = [k for _, _, k in out["spans"]]
        assert "table" in kinds
        s, e, _ = [sp for sp in out["spans"] if sp[2] == "table"][0]
        assert "Transaction Details" in DBS_LATTICE[s:e]


OCBC_STREAM = """OCBC   OVERSEA-CHINESE BANKING CORPORATION
Account Statement

Date                    Description                     Debit               Credit          Balance
01-02-24                INTEREST CREDIT                                      12.34          512.34 CR
15-02-24                SERVICE CHARGE                     600.00                            87.66 DR

End of Statement
Page 1 of 1"""


class TestOCBCStream:
    def test_cr_dr_suffix(self):
        out = extract_statement(OCBC_STREAM)
        assert out["dialect"] == "OCBC"
        t = out["transactions"]
        assert t[0]["balance"] == "512.34"
        assert t[1]["balance"] == "-87.66"
        assert t[0]["date"] == "2024-02-01"
        assert out["balance_ok"] is True


HDFC_LATTICE = """HDFC BANK LIMITED
Account Statement

+--------------+--------------------------+----------------+----------------+------------------+
| Date         | Narration                | Withdrawal Amt | Deposit Amt    | Closing Balance  |
+--------------+--------------------------+----------------+----------------+------------------+
| 02/04/24     | UPI PAYMENT VENDOR       | 1,500.00       |                | (500.00)         |
+--------------+--------------------------+----------------+----------------+------------------+
| 09/04/24     | NEFT INWARD              |                | 2,500.00       | 2,000.00         |
+--------------+--------------------------+----------------+----------------+------------------+

Page 1 of 1"""


class TestHDFCLattice:
    def test_paren_negative(self):
        out = extract_statement(HDFC_LATTICE)
        assert out["dialect"] == "HDFC"
        t = out["transactions"]
        assert t[0]["balance"] == "-500.00"
        assert t[0]["date"] == "2024-04-02"
        assert t[1]["balance"] == "2000.00"
        assert out["balance_ok"] is True


TWO_PAGE = """UOB   UNITED OVERSEAS BANK LIMITED
Account Statement

Date                    Description                     Withdrawal          Deposit         Balance
07 May 2024             ATM WITHDRAWAL                      200.00                          800.00

Page 1 of 2\fUOB   UNITED OVERSEAS BANK LIMITED
Account Statement

End of Statement
Page 2 of 2"""


class TestPagination:
    def test_repeated_header_and_footers_dropped(self):
        out = extract_statement(TWO_PAGE)
        txt = out["extracted_text"]
        assert txt.count("UNITED OVERSEAS BANK") == 1  # M9 page-header dedup
        assert "Page 1 of 2" not in txt and "Page 2 of 2" not in txt
        assert len(out["transactions"]) == 1


class TestRouting:
    def test_statement_routed_pdf(self):
        out = extract_payload(UOB_STREAM)
        assert out["content_kind"] == "pdf_layout"
        assert out["error"] == ""

    def test_extractor_never_raises(self):
        out = extract_payload("+--+\n| broken | grid\nPage 1 of 1")
        assert out["extractor_version"]


GENERIC_STREAM = """ACME COMMUNITY CREDIT UNION
Monthly Account Statement

Date                    Description                     Debit               Credit          Balance
03/06/2024              OPENING DEPOSIT                                    1,000.00        1,000.00
18/06/2024              COFFEE SHOP                        12.50                             987.50

Page 1 of 1"""


class TestGenericDialect:
    def test_unknown_issuer_still_parses(self):
        out = extract_statement(GENERIC_STREAM)
        assert out["dialect"] == "GENERIC"
        t = out["transactions"]
        assert len(t) == 2
        assert t[0] == {"date": "2024-06-03", "description": "OPENING DEPOSIT", "debit": "", "credit": "1000.00", "balance": "1000.00"}
        assert out["balance_ok"] is True

    def test_generic_lattice_grid_wins(self):
        grid = GENERIC_STREAM.replace(
            "Date                    Description                     Debit               Credit          Balance\n"
            "03/06/2024              OPENING DEPOSIT                                    1,000.00        1,000.00\n"
            "18/06/2024              COFFEE SHOP                        12.50                             987.50",
            "+------------+------------------+----------+----------+----------+\n"
            "| Date       | Description      | Debit    | Credit   | Balance  |\n"
            "+------------+------------------+----------+----------+----------+\n"
            "| 03/06/2024 | OPENING DEPOSIT  |          | 1,000.00 | 1,000.00 |\n"
            "+------------+------------------+----------+----------+----------+",
        )
        out = extract_statement(grid)
        assert out["dialect"] == "GENERIC"
        assert len(out["transactions"]) == 1
        assert out["transactions"][0]["credit"] == "1000.00"


PAGE_CONTINUED = """DBS BANK LTD
Account Statement

+--------------+--------------------------+----------------+----------------+------------------+
| Date         | Transaction Details      | Debit          | Credit         | Balance          |
+--------------+--------------------------+----------------+----------------+------------------+
| 05/01/2024   | OPENING CREDIT           |                | 1,000.00       | 1,000.00         |
+--------------+--------------------------+----------------+----------------+------------------+

Page 1 of 2\fDBS BANK LTD
Account Statement

+--------------+--------------------------+----------------+----------------+------------------+
| Date         | Transaction Details      | Debit          | Credit         | Balance          |
+--------------+--------------------------+----------------+----------------+------------------+
| 20/01/2024   | CARD PAYMENT             | 250.00         |                | 750.00           |
+--------------+--------------------------+----------------+----------------+------------------+

End of Statement
Page 2 of 2"""


class TestPageContinuedTable:
    def test_rows_concatenated_across_pages(self):
        out = extract_statement(PAGE_CONTINUED)
        t = out["transactions"]
        assert [x["date"] for x in t] == ["2024-01-05", "2024-01-20"]
        assert out["balance_ok"] is True  # chain 1000.00 -> 750.00 spans the page break
        assert len([sp for sp in out["spans"] if sp[2] == "table"]) == 2

    def test_balance_chain_violation_across_pages(self):
        bad = PAGE_CONTINUED.replace("750.00", "751.00")
        assert extract_statement(bad)["balance_ok"] is False


YEARLESS = """UOB   UNITED OVERSEAS BANK LIMITED
Account Statement
Statement Period: 01 Jan 2023 to 31 Dec 2023

Date                    Description                     Withdrawal          Deposit         Balance
05 Jan                  GIRO SALARY                                        5,000.00        5,000.00
12 Feb                  CARD PURCHASE                     1,000.00                         4,000.00

Page 1 of 1"""


class TestYearlessDates:
    def test_year_from_statement_period(self):
        out = extract_statement(YEARLESS)
        t = out["transactions"]
        assert [x["date"] for x in t] == ["2023-01-05", "2023-02-12"]
        assert out["balance_ok"] is True


class TestReviewRegressions:
    """Fixes from the round-1 code review (each repro'd before fixing)."""

    def test_stream_table_not_preempted_by_later_grid(self):
        # a boxed fee-summary AFTER the stream transaction table must not
        # swallow the transactions
        s = UOB_STREAM.replace(
            "End of Statement",
            "+----------+----------+\n| Fee Type | Amount   |\n+----------+----------+\n"
            "| ANNUAL   | 10.00    |\n+----------+----------+\nEnd of Statement",
        )
        out = extract_statement(s)
        assert len(out["transactions"]) == 3  # stream table still parsed first

    def test_dialect_by_earliest_keyword(self):
        s = DBS_LATTICE.replace(
            "Account No: 555-001-002",
            "Account No: 555-001-002 (incoming transfer from UOB account)",
        )
        assert extract_statement(s)["dialect"] == "DBS"

    def test_period_spanning_year_boundary(self):
        s = YEARLESS.replace(
            "Statement Period: 01 Jan 2023 to 31 Dec 2023",
            "Statement Period: 15 Dec 2022 to 14 Feb 2023",
        )
        out = extract_statement(s)
        # Jan/Feb fall AFTER the December start -> end year 2023
        assert [x["date"] for x in out["transactions"]] == ["2023-01-05", "2023-02-12"]
        s2 = s.replace("05 Jan  ", "05 Dec  ")
        out2 = extract_statement(s2)
        assert out2["transactions"][0]["date"] == "2022-12-05"  # Dec -> start year

    def test_no_balance_column_not_a_violation(self):
        s = """ACME BANK
Account Statement

Date                    Description                     Debit               Credit
03/06/2024              OPENING DEPOSIT                                    1,000.00
18/06/2024              COFFEE SHOP                        12.50

Page 1 of 1"""
        out = extract_statement(s)
        assert len(out["transactions"]) == 2
        assert out["balance_ok"] is True  # absence of data != inconsistency
