"""CLI entry point — the reference-parity surface
(/root/reference/README.md:2 is a CLI tool: statement in, standardized
table out). Here: transcript parquet in, extracted parquet (+ optional
standardized transaction spreadsheet) out, resumable.

Usage:
  python -m bank_statement_pdf_parser_ray run \
      --input /path/to/transcripts_parquet \
      --out /tmp/extracted [--spreadsheet /tmp/txns.csv] \
      [--n-parts 64] [--salt-chunk 10000] [--num-cpus N]

Owns its Ray session (init/shutdown) — the only library-adjacent code
allowed to (driver contract forbids it inside __ray_entry__/pipelines).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="bank_statement_pdf_parser_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run", help="run the flagship extraction job")
    runp.add_argument("--input", required=True, help="input transcript parquet dir/file")
    runp.add_argument("--out", required=True, help="output root (partitioned parquet + manifest)")
    runp.add_argument("--spreadsheet", default=None, help="also export the standardized transaction table (csv/xlsx)")
    runp.add_argument("--n-parts", type=int, default=64)
    runp.add_argument("--salt-chunk", type=int, default=10_000)
    runp.add_argument("--num-cpus", type=int, default=None)
    runp.add_argument("--metrics", action="store_true", help="print G2 job metrics JSON")

    # the reference tool's own workflow (README.md:2): ONE statement in,
    # standardized transaction table out — pure core, no Ray session
    parsep = sub.add_parser("parse", help="parse a single statement text file to a transaction table")
    parsep.add_argument("statement", help="path to a statement text file")
    parsep.add_argument("--out", default=None, help="write transactions to CSV (default: stdout JSON)")
    args = p.parse_args(argv)

    if args.cmd == "parse":
        from bank_statement_pdf_parser_ray.core.extract import extract_payload

        with open(args.statement, encoding="utf-8") as f:
            payload = f.read()
        res = extract_payload(payload)
        if args.out:
            import csv

            with open(args.out, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=["date", "description", "debit", "credit", "balance"])
                w.writeheader()
                w.writerows(res["transactions"])
            print(json.dumps({"transactions": len(res["transactions"]), "dialect": res["dialect"],
                              "balance_ok": res["balance_ok"], "error": res["error"], "out": args.out}))
        else:
            print(json.dumps({"dialect": res["dialect"], "balance_ok": res["balance_ok"],
                              "error": res["error"], "transactions": res["transactions"]}))
        # a degraded parse (extractor exception -> plain-text fallback)
        # is NOT a silent success
        return 1 if res["error"] else 0

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        try:
            from ray.data import DataContext

            DataContext.get_current().use_polars_sort = True
        except Exception:
            pass
    try:
        from bank_statement_pdf_parser_ray.pipelines.flagship import read_extracted, run_flagship

        summary = run_flagship(
            args.input, args.out, n_parts=args.n_parts, salt_chunk=args.salt_chunk
        )
        out = {"summary": summary}
        if args.spreadsheet or args.metrics:
            # read back the parquet this run just committed — never
            # re-extract for the convenience outputs
            ds = read_extracted(args.out)
            if args.spreadsheet:
                from bank_statement_pdf_parser_ray.sources.writers import write_spreadsheet
                from bank_statement_pdf_parser_ray.stages.transactions import transactions_table

                out["spreadsheet"] = write_spreadsheet(transactions_table(ds), args.spreadsheet)
            if args.metrics:
                from bank_statement_pdf_parser_ray.stages.metrics import job_metrics

                out["metrics"] = job_metrics(ds)
        print(json.dumps(out))
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
