"""Transactions explode, rollups, writers, CLI (SURVEY.md S2, G1/G2)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

import ray.data

from bank_statement_pdf_parser_ray.pipelines.flagship import build_extracted, run_flagship
from bank_statement_pdf_parser_ray.stages.metrics import conv_rollup, job_metrics
from bank_statement_pdf_parser_ray.stages.transactions import transactions_table
from bank_statement_pdf_parser_ray.sources.writers import write_spreadsheet


@pytest.fixture(scope="module")
def extracted(tiny_corpus):
    return run_flagship(ray.data.from_arrow(tiny_corpus), salt_chunk=25, n_parts=8)


class TestTransactionsTable:
    def test_explode_matches_oracle(self, extracted, tiny_expected):
        txns = transactions_table(extracted).to_pandas()
        n_expected = sum(len(t) for t in tiny_expected.column("transactions").to_pylist())
        assert len(txns) == n_expected > 0
        assert list(txns.columns) == [
            "conv_id", "turn_idx", "txn_idx", "date", "description",
            "debit", "credit", "balance", "dialect",
        ]
        # txn_idx is a contiguous 0..n-1 within each (conv_id, turn_idx)
        for _, g in txns.groupby(["conv_id", "turn_idx"]):
            assert sorted(g["txn_idx"].tolist()) == list(range(len(g)))
        assert (txns["date"].str.match(r"\d{4}-\d{2}-\d{2}")).all()
        assert set(txns["dialect"]) <= {"UOB", "DBS", "OCBC", "HDFC"}


class TestRollups:
    def test_conv_rollup(self, extracted, tiny_expected):
        roll = conv_rollup(extracted).to_pandas().set_index("conv_id")
        exp = tiny_expected.to_pandas().groupby("conv_id").size()
        assert roll.loc["conv-00000000", "n_turns"] == exp["conv-00000000"] == 120
        assert (roll["n_balance_violations"] == 0).all()

    def test_job_metrics(self, extracted, tiny_expected):
        m = job_metrics(extracted)
        assert m["rows"] == tiny_expected.num_rows
        assert m["errors"] == 0
        assert m["pdf_layout"] > 0 and m["html"] > 0 and m["plain"] > 0
        assert m["rows"] == m["pdf_layout"] + m["html"] + m["plain"]


class TestWriters:
    def test_spreadsheet_writes_real_xlsx(self, extracted, tmp_path):
        import zipfile

        from bank_statement_pdf_parser_ray.sources.xlsx import read_xlsx

        out = write_spreadsheet(transactions_table(extracted), str(tmp_path / "t.xlsx"))
        assert out.endswith(".xlsx")
        assert zipfile.is_zipfile(out)
        header, rows = read_xlsx(out)
        assert header[:4] == ["conv_id", "turn_idx", "txn_idx", "date"]
        assert len(rows) > 0

    def test_spreadsheet_csv_path(self, extracted, tmp_path):
        out = write_spreadsheet(transactions_table(extracted), str(tmp_path / "t.csv"))
        assert out.endswith(".csv")
        head = open(out).readline().strip()
        assert head.startswith("conv_id,turn_idx,txn_idx,date")

    def test_xlsx_roundtrip_types(self, tmp_path):
        from bank_statement_pdf_parser_ray.sources.xlsx import read_xlsx, write_xlsx

        header = ["a", "b", "c", "d"]
        rows = [[1, 2.5, "hello <&> \"world\"", True], [-3, 0.0, "", False], [7, 1e9, "söme ünicode", True]]
        p = write_xlsx(str(tmp_path / "r.xlsx"), header, rows)
        h2, r2 = read_xlsx(p)
        assert h2 == header
        assert r2 == rows


class TestCLI:
    def test_run_command(self, tiny_corpus, tmp_path):
        # drive main() in-process (session already owned by the test fixture)
        import json

        from bank_statement_pdf_parser_ray.__main__ import main

        inp = tmp_path / "in.parquet"
        pq.write_table(tiny_corpus, str(inp))
        out_dir = str(tmp_path / "out")
        sheet = str(tmp_path / "txns.csv")
        rc = main(
            [
                "run", "--input", str(inp), "--out", out_dir,
                "--spreadsheet", sheet, "--metrics",
                "--n-parts", "4", "--salt-chunk", "50",
            ]
        )
        assert rc == 0
        import os

        assert os.path.isdir(os.path.join(out_dir, "_manifest"))
        assert os.path.exists(sheet)


class TestDedupCLI:
    def test_exact_dedup_roundtrip(self, tmp_path):
        import json as _json

        import pyarrow as pa

        from bank_statement_pdf_parser_ray.__main__ import main

        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": ["same text here", "unique text", "same text here"],
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        out_dir = str(tmp_path / "deduped")
        rc = main(["dedup", "--sf-dir", str(tmp_path), "--method", "exact", "--out", out_dir])
        assert rc == 0
        import pyarrow.dataset as pads

        got = pads.dataset(out_dir).to_table().sort_by("doc_id")
        assert got.column("doc_id").to_pylist() == [0, 1]


class TestCSVRunCLI:
    def test_run_with_csv_input(self, tmp_path):
        from bank_statement_pdf_parser_ray.__main__ import main

        inp = tmp_path / "in.csv"
        inp.write_text(
            "conv_id,turn_idx,role,text,tool,ts\n"
            "c1,0,user,plain  text one,,0\n"
            "c1,1,assistant,plain text two,,0\n"
        )
        out_dir = str(tmp_path / "out")
        rc = main(["run", "--input", str(inp), "--format", "csv", "--out", out_dir, "--n-parts", "2", "--salt-chunk", "50"])
        assert rc == 0
        import os

        assert os.path.isdir(os.path.join(out_dir, "_manifest"))


class TestParseCLI:
    def test_single_statement_parse(self, tmp_path):
        from bank_statement_pdf_parser_ray.__main__ import main

        stmt = tmp_path / "s.txt"
        stmt.write_text(
            "UOB   UNITED OVERSEAS BANK LIMITED\nAccount Statement\n\n"
            "Date                    Description                     Withdrawal          Deposit         Balance\n"
            "05 Jan 2024             GIRO SALARY                                        5,000.00        5,000.00\n"
            "\nPage 1 of 1\n"
        )
        out = tmp_path / "t.csv"
        assert main(["parse", str(stmt), "--out", str(out)]) == 0
        lines = out.read_text().strip().splitlines()
        assert lines[0] == "date,description,debit,credit,balance"
        assert lines[1] == "2024-01-05,GIRO SALARY,,5000.00,5000.00"


class TestPrepCLI:
    def test_prep_command(self, tmp_path):
        import json as _json
        import os

        from bank_statement_pdf_parser_ray.__main__ import main

        out = str(tmp_path / "prep")
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(["prep", "--sf-dir", "/root/testdata/sf0.001", "--out", out, "--per-stratum", "3"])
        assert rc == 0
        summary = _json.loads(buf.getvalue().strip().splitlines()[-1])
        assert summary["strata_written"] >= 1
        assert all(d.startswith("lang=") for d in os.listdir(out))
