"""OCR fallback path (core/rasterfont.py): bitmap-font rasterization of
a statement page and template-matcher recovery, end-to-end through the
extractor — a rasterized statement must yield the SAME transaction rows
as its text original (SURVEY.md §2.3 A1 "OCR fallbacks")."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pytest

from bank_statement_pdf_parser_ray.core.extract import extract_payload
from bank_statement_pdf_parser_ray.core.rasterfont import (
    FONT,
    RASTER_MARKER,
    _signature,
    ocr_page,
    parse_pgm,
    render_page,
    raster_payload_pgm,
    rasterize_payload,
)
from bank_statement_pdf_parser_ray.core.sniff import KIND_RASTER, sniff_kind
from bank_statement_pdf_parser_ray.sources.corpus import gen_statement


class TestFont:
    def test_all_glyphs_distinct(self):
        sigs = [_signature(bm) for bm in FONT.values()]
        assert len(set(sigs)) == len(sigs)

    def test_render_ocr_identity_on_covered_text(self):
        text = "The quick brown fox; 0123456789 (ABC) [def] 1,234.56 -- 50% & #9 @x!"
        assert ocr_page(render_page(text)) == text

    def test_trailing_whitespace_normalizes(self):
        assert ocr_page(render_page("a  \nb\t")) == "a\nb?"  # tab has no glyph

    def test_unknown_glyph_comes_back_as_question_mark(self):
        assert ocr_page(render_page("café")) == "caf?"

    def test_unreadable_blobs(self):
        assert ocr_page(b"") == ""
        assert ocr_page(b"P5 2 2 255\n\x00") == ""  # truncated
        assert parse_pgm(b"not a pgm") is None


class TestRasterPayloadRouting:
    def test_sniffer_detects_envelope(self):
        env = rasterize_payload("hello world")
        assert sniff_kind(env) == KIND_RASTER

    def test_plain_page_roundtrip(self):
        out = extract_payload(rasterize_payload("Just a plain paragraph of text."))
        assert out["content_kind"] == KIND_RASTER
        assert out["error"] == ""
        assert out["extracted_text"] == extract_payload("Just a plain paragraph of text.")[
            "extracted_text"
        ]

    def test_corrupt_envelope_quarantines(self):
        out = extract_payload(RASTER_MARKER + "\n@@not-base64@@")
        assert out["error"] != ""
        out2 = extract_payload(RASTER_MARKER + "\n")  # empty body
        assert out2["error"] != ""

    @pytest.mark.parametrize("seed", [3, 11, 29, 57])
    def test_scanned_statement_matches_text_extraction(self, seed):
        """The VERDICT done-criterion: a rasterized statement page
        round-trips through the OCR path to the same transaction rows
        the text path extracts."""
        stmt = gen_statement(random.Random(seed))
        direct = extract_payload(stmt)
        assert direct["content_kind"] == "pdf_layout"
        scanned = extract_payload(rasterize_payload(stmt))
        assert scanned["content_kind"] == KIND_RASTER
        assert scanned["error"] == ""
        assert scanned["transactions"] == direct["transactions"]
        assert len(direct["transactions"]) > 0
        assert scanned["extracted_text"] == direct["extracted_text"]
        assert scanned["balance_ok"] == direct["balance_ok"]

    def test_actor_hook_is_wired(self):
        from bank_statement_pdf_parser_ray.stages.extract import ExtractorActor

        actor = ExtractorActor()
        assert actor.ocr_fallback is not None
        stmt = gen_statement(random.Random(5))
        assert actor.ocr_fallback(render_page(stmt)) == "\n".join(
            ln.rstrip() for ln in stmt.split("\n")
        )


class TestRasterParse:
    def test_parse_pgm_matches_render(self):
        img = parse_pgm(render_page("AB\nC"))
        assert img is not None and img.shape == (18, 12)
        assert set(np.unique(img)) <= {0, 255}

    def test_envelope_extractor_none_on_garbage(self):
        assert raster_payload_pgm("plain text") is None


class TestRasterFlagshipParity:
    def test_distributed_equals_oracle_on_raster_corpus(self, tmp_path):
        """Flagship over a corpus with scanned-page payloads matches the
        sequential oracle per turn — the OCR path is distribution-safe."""
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.oracle import oracle_extract, oracle_validate
        from bank_statement_pdf_parser_ray.pipelines.flagship import run_flagship
        from bank_statement_pdf_parser_ray.schema import OUTPUT_SCHEMA
        from bank_statement_pdf_parser_ray.sources.corpus import gen_corpus

        corpus = gen_corpus(12, seed=91, raster_frac=0.3)
        kinds = [t[: len(RASTER_MARKER)] for t in corpus.column("text").to_pylist()]
        assert kinds.count(RASTER_MARKER) >= 5  # the family is actually present
        p = tmp_path / "raster.parquet"
        pq.write_table(corpus, str(p))
        ds = run_flagship(str(p), salt_chunk=50, n_parts=4)
        df = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        actual = pa.Table.from_pandas(df, preserve_index=False).select(OUTPUT_SCHEMA.names)
        rep = oracle_validate(oracle_extract(corpus), actual)
        assert rep["pass"], rep
        assert rep["text_equality_rate"] == 1.0
        kinds_out = set(df["content_kind"])
        assert "raster" in kinds_out
        # scanned statements still produce transaction rows
        raster_rows = df[df["content_kind"] == "raster"]
        assert any(len(t) > 0 for t in raster_rows["transactions"])
