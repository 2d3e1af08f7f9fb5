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
    runp.add_argument("--input", required=True, help="input transcript dir/file")
    runp.add_argument(
        "--format",
        default="parquet",
        choices=["parquet", "json", "csv"],
        help="input format (json = JSONL; non-parquet goes through the normalizing reader)",
    )
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

    # training-data dedup over a documents table (doc_id:int64, text:string)
    dedupp = sub.add_parser("dedup", help="deduplicate a documents parquet table")
    dedupp.add_argument("--sf-dir", required=True, help="dir containing documents.parquet")
    dedupp.add_argument(
        "--method",
        default="exact",
        choices=["exact", "minhash", "verified"],
        help="exact = keep min doc_id per distinct text; minhash = LSH candidate pairs; verified = Jaccard-verified pairs",
    )
    dedupp.add_argument("--threshold", type=float, default=0.8, help="Jaccard threshold (verified)")
    dedupp.add_argument("--out", required=True, help="output parquet dir")
    dedupp.add_argument("--num-cpus", type=int, default=None)

    # the composed prep DAG: gates -> dedup -> join-back -> stratified sample
    prepp = sub.add_parser("prep", help="run the composed training-data prep pipeline")
    prepp.add_argument("--sf-dir", required=True, help="dir containing documents.parquet")
    prepp.add_argument("--per-stratum", type=int, default=10, help="sample size per language")
    prepp.add_argument("--out", required=True, help="output root (lang-partitioned parquet)")
    prepp.add_argument("--num-cpus", type=int, default=None)

    delp = sub.add_parser("delete", help="GDPR-style targeted delete of conversations from a committed output")
    delp.add_argument("--out", required=True, help="committed flagship output root")
    delp.add_argument("--conv", action="append", required=True, help="conversation id (repeatable)")
    delp.add_argument("--num-cpus", type=int, default=None)

    ingp = sub.add_parser("ingest", help="incremental ingest: merge a newly-arrived input wave into a committed output")
    ingp.add_argument("--out", required=True, help="committed flagship output root")
    ingp.add_argument("--input", required=True, help="parquet path of the new wave")
    ingp.add_argument("--wave-id", default=None, help="explicit wave id for the consumed-inputs ledger")
    ingp.add_argument("--mode", choices=("cow", "mor"), default="cow", help="copy-on-write rewrite or merge-on-read delta append")
    ingp.add_argument("--num-cpus", type=int, default=None)

    compp = sub.add_parser("compact", help="fold merge-on-read delta files back to one sorted file per part")
    compp.add_argument("--out", required=True, help="committed flagship output root")
    compp.add_argument("--num-cpus", type=int, default=None)

    descp = sub.add_parser("describe", help="inspect a committed output: per-part manifest, totals, ingest ledger")
    descp.add_argument("--out", required=True, help="committed flagship output root")

    # run ANY registered pipeline by name over the shared tables —
    # the same names the driver contract checks (registry.py)
    queryp = sub.add_parser("query", help="run a registered pipeline/query by name")
    queryp.add_argument("name", nargs="?", default=None, help="query name (omit with --list)")
    queryp.add_argument("--sf-dir", default=None, help="dir containing the parquet tables")
    queryp.add_argument("--out", default=None, help="write result (.parquet or .csv); default prints head")
    queryp.add_argument("--show", type=int, default=10, help="rows to print when --out is omitted")
    queryp.add_argument("--list", action="store_true", help="list registered query names and exit")
    queryp.add_argument("--num-cpus", type=int, default=None)
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

    if args.cmd == "query" and args.list:
        from bank_statement_pdf_parser_ray.registry import oracle_sql, queries

        o = oracle_sql()
        for name in sorted(queries()):
            print(f"{name}\t{'sql-oracle' if name in o else 'rows-only'}")
        return 0

    if args.cmd == "describe":
        # pure metadata: manifest JSONs + the ingest ledger + file
        # listing — no Ray session, no data read
        import os

        from bank_statement_pdf_parser_ray.state.manifest import Manifest

        manifest = Manifest(os.path.join(args.out, "_manifest"))
        parts = sorted(manifest.committed_parts())
        infos = []
        for p in parts:
            meta = manifest.read(p)
            pdir = os.path.join(args.out, f"part={p}")
            n_files = (
                sum(1 for f in os.listdir(pdir) if f.endswith(".parquet"))
                if os.path.isdir(pdir)
                else 0
            )
            infos.append({"part": p, "rows": meta.rows, "files": n_files, "input": meta.input})
        ledger_path = os.path.join(args.out, "_manifest", "ingested.json")
        ledger = []
        if os.path.exists(ledger_path):
            with open(ledger_path) as f:
                ledger = json.load(f)
        tomb_path = os.path.join(args.out, "_manifest", "tombstones.json")
        tombstones = []
        if os.path.exists(tomb_path):
            with open(tomb_path) as f:
                tombstones = json.load(f)
        sample = manifest.read(parts[0]) if parts else None
        print(
            json.dumps(
                {
                    "parts_committed": len(parts),
                    "rows_total": sum(i["rows"] for i in infos),
                    "multi_file_parts": sum(1 for i in infos if i["files"] > 1),
                    "n_parts": sample.n_parts if sample else None,
                    "salt_chunk": sample.salt_chunk if sample else None,
                    "extractor_version": sample.extractor_version if sample else None,
                    "ingested_waves": ledger,
                    "tombstoned_convs": tombstones,
                    "parts": infos,
                }
            )
        )
        return 0

    import ray

    if args.cmd == "delete":
        from bank_statement_pdf_parser_ray.pipelines.flagship import delete_conversations

        owns = not ray.is_initialized()
        if owns:
            ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)
        try:
            print(json.dumps(delete_conversations(args.out, args.conv)))
        finally:
            if owns:
                ray.shutdown()
        return 0

    if args.cmd == "ingest":
        from bank_statement_pdf_parser_ray.pipelines.flagship import ingest_append

        owns = not ray.is_initialized()
        if owns:
            ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)
        try:
            print(json.dumps(ingest_append(args.input, args.out, wave_id=args.wave_id, mode=args.mode)))
        finally:
            if owns:
                ray.shutdown()
        return 0

    if args.cmd == "compact":
        from bank_statement_pdf_parser_ray.pipelines.flagship import compact_output

        owns = not ray.is_initialized()
        if owns:
            ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)
        try:
            print(json.dumps(compact_output(args.out)))
        finally:
            if owns:
                ray.shutdown()
        return 0

    if args.cmd == "query":
        if not args.name or not args.sf_dir:
            p.error("query requires NAME and --sf-dir (or --list)")
        from bank_statement_pdf_parser_ray.registry import queries

        reg = queries()
        if args.name not in reg:
            print(json.dumps({"error": f"unknown query {args.name!r}; see --list"}))
            return 1
        owns = not ray.is_initialized()
        if owns:
            ray.init(
                address="local",
                num_cpus=args.num_cpus,
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
        try:
            import pandas as pd

            res = reg[args.name](args.sf_dir)
            df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            if args.out and args.out.endswith(".csv"):
                df.to_csv(args.out, index=False)
            elif args.out:
                df.to_parquet(args.out, index=False)
            else:
                print(df.head(args.show).to_string(index=False))
            print(json.dumps({"query": args.name, "rows": len(df), "cols": list(map(str, df.columns)), "out": args.out}))
            return 0
        finally:
            if owns:
                ray.shutdown()

    if args.cmd == "prep":
        owns = not ray.is_initialized()
        if owns:
            ray.init(
                address="local",
                num_cpus=args.num_cpus,
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
        try:
            from bank_statement_pdf_parser_ray.pipelines.datapipe import write_prep_corpus

            summary = write_prep_corpus(args.sf_dir, args.out, per_stratum=args.per_stratum)
            print(json.dumps(summary))
            return 0
        finally:
            if owns:
                ray.shutdown()

    if args.cmd == "dedup":
        owns = not ray.is_initialized()
        if owns:
            ray.init(
                address="local",
                num_cpus=args.num_cpus,
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
        try:
            from bank_statement_pdf_parser_ray.pipelines import datapipe as dp

            fn = {
                "exact": dp.exact_dedup,
                "minhash": dp.minhash_candidates,
                "verified": lambda d: dp.minhash_verified(d, threshold=args.threshold),
            }[args.method]
            ds = fn(args.sf_dir).materialize()  # one execution for write + count
            ds.write_parquet(args.out)
            print(json.dumps({"method": args.method, "rows": ds.count(), "out": args.out}))
            return 0
        finally:
            if owns:
                ray.shutdown()

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

            # prompt actor-pool ramp for compute-dominated jobs (see
            # pipelines/flagship.py pool-floor note)
            DataContext.get_current().autoscaling_config.actor_pool_util_upscaling_threshold = 1.0
        except Exception:
            pass
    try:
        from bank_statement_pdf_parser_ray.pipelines.flagship import read_extracted, run_flagship

        source = args.input
        if args.format != "parquet":
            from bank_statement_pdf_parser_ray.sources.transcripts import read_transcripts

            source = read_transcripts(args.input, fmt=args.format)
        summary = run_flagship(
            source, args.out, n_parts=args.n_parts, salt_chunk=args.salt_chunk
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
