"""bank_statement_pdf_parser_ray — a Ray-Data-native transcript-extraction engine.

Built from scratch (NOT a port) with the capability surface of
abhinavraj314/Bank-Statement-PDF-Parser (reference: /root/reference/README.md:1-2
— "parses bank statement PDFs from UOB, DBS, OCBC, and HDFC, extracts all
transaction data, and outputs a clean, standardized" table), generalized per
the driver spec (BASELINE.json north_star/north_rule) into per-turn
main-content extraction over Parquet transcript tables:

- content sniffing routes each ``text`` payload to a PDF-layout parser,
  an HTML boilerplate stripper, or a plain-text normalizer
  (``core/``, SURVEY.md §2 M1-M9, F1-F5);
- extraction runs as ``map_batches`` over zero-copy Arrow with an actor pool
  holding warm parser state (``stages/extract.py``, A1);
- a single salted hash shuffle on ``conv_id`` restores stable turn ordering,
  dedups replayed fragments and validates running balances
  (``stages/order.py``, O1/D1/G3);
- per-partition lineage + checkpoint manifest make the job resumable
  (``state/manifest.py``, S5);
- ``pipelines/datapipe.py`` adds the large-scale training-data operators
  (dedup families, ANN search, text analysis, multimodal plumbing).

The sequential oracle (``oracle.py``) shares the same ``core`` functions, so
pytest verifies per-turn text equality between the distributed pipeline and
the oracle under stable (conv_id, turn_idx) ordering.
"""

EXTRACTOR_VERSION = "bspp-ray/0.2.0"

__all__ = ["EXTRACTOR_VERSION"]
