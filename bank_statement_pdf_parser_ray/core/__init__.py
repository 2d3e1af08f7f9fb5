"""Pure-Python extraction core — zero Ray imports.

Shared verbatim by the sequential oracle (oracle.py) and the distributed
stages (stages/extract.py) so that distribution can never change string
content (SURVEY.md §7 "hard parts": per-turn text equality makes every
whitespace/Unicode decision semantic).
"""

from bank_statement_pdf_parser_ray.core.extract import extract_payload  # noqa: F401
from bank_statement_pdf_parser_ray.core.sniff import sniff_kind  # noqa: F401
