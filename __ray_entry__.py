"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ray.init()/ray.shutdown().

Thin shim: the actual registry lives in
``bank_statement_pdf_parser_ray/registry.py`` so the CLI (`python -m
bank_statement_pdf_parser_ray query <name>`) resolves the same names the
driver checks.
"""

from __future__ import annotations

from bank_statement_pdf_parser_ray.registry import entry, oracle_sql, queries

__all__ = ["entry", "queries", "oracle_sql"]
