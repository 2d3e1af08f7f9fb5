"""core/tiff.py: lossless round-trip parity across the whole option
matrix, TIFF-variant LZW/PackBits engines, the OCR route, and the
MediaDecodeActor wiring."""

import numpy as np
import pyarrow as pa
import pytest

from bank_statement_pdf_parser_ray.core.tiff import (
    TiffUnsupported,
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    decode_tiff_luma,
    encode_tiff_gray,
    encode_tiff_rgb,
)


class TestLzw:
    def test_round_trip_random(self):
        rng = np.random.default_rng(0)
        for n in (0, 1, 7, 100, 5000, 40_000):
            data = bytes(rng.integers(0, 256, n, dtype=np.uint8)) if n else b""
            assert _lzw_decode(_lzw_encode(data), n) == data

    def test_round_trip_low_entropy_forces_table_reset(self):
        rng = np.random.default_rng(1)
        big = bytes(rng.integers(0, 4, 300_000, dtype=np.uint8))
        assert _lzw_decode(_lzw_encode(big), len(big)) == big

    def test_kwkwk_case(self):
        # abababab... drives the code-equals-table-size branch
        data = b"ab" * 2000
        assert _lzw_decode(_lzw_encode(data), len(data)) == data

    def test_truncated_stream_raises(self):
        enc = _lzw_encode(b"hello world, hello world")
        with pytest.raises(ValueError):
            _lzw_decode(enc[: len(enc) // 2], 24)


class TestPackBits:
    def test_round_trip(self):
        rng = np.random.default_rng(2)
        for n in (0, 1, 5, 129, 1000):
            d = bytes(rng.integers(0, 3, n, dtype=np.uint8))
            assert _packbits_decode(_packbits_encode(d), n) == d

    def test_long_runs(self):
        d = b"\x00" * 500 + b"\x07" * 3 + bytes(range(200))
        assert _packbits_decode(_packbits_encode(d), len(d)) == d


class TestRoundTrip:
    @pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
    @pytest.mark.parametrize("pred", [1, 2])
    @pytest.mark.parametrize("big_endian", [False, True])
    def test_gray_lossless(self, comp, pred, big_endian):
        rng = np.random.default_rng(3)
        for hh, ww in ((48, 64), (17, 33), (1, 1), (100, 258)):
            g = rng.integers(0, 256, (hh, ww), dtype=np.uint8)
            blob = encode_tiff_gray(g, compression=comp, predictor=pred, big_endian=big_endian)
            out = decode_tiff_luma(blob)
            assert out.shape == (hh, ww)
            assert np.array_equal((out * 255).round().astype(np.uint8), g)

    @pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
    def test_rgb_luma(self, comp):
        rng = np.random.default_rng(4)
        c = rng.integers(0, 256, (20, 31, 3), dtype=np.uint8)
        out = decode_tiff_luma(encode_tiff_rgb(c, compression=comp, predictor=2))
        assert np.allclose(out, c.astype(np.float32).mean(axis=2) / 255.0, atol=1e-6)

    def test_white_is_zero_inverts(self):
        rng = np.random.default_rng(5)
        g = rng.integers(0, 256, (10, 10), dtype=np.uint8)
        out = decode_tiff_luma(encode_tiff_gray(g, white_is_zero=True))
        assert np.array_equal((out * 255).round().astype(np.uint8), g)

    def test_multi_strip_layout(self):
        # rows_per_strip smaller than height: several strips, incl. a
        # ragged final one
        rng = np.random.default_rng(6)
        g = rng.integers(0, 256, (37, 12), dtype=np.uint8)
        blob = encode_tiff_gray(g, compression="lzw", rows_per_strip=10)
        assert np.array_equal((decode_tiff_luma(blob) * 255).round().astype(np.uint8), g)


class TestMalformed:
    def test_bad_magic(self):
        with pytest.raises(ValueError):
            decode_tiff_luma(b"XX\x2a\x00" + b"\x00" * 16)

    def test_truncated_header(self):
        with pytest.raises(ValueError):
            decode_tiff_luma(b"II*\x00")

    def test_strip_overrun(self):
        g = np.zeros((4, 4), dtype=np.uint8)
        blob = encode_tiff_gray(g, compression="none")
        with pytest.raises(ValueError):
            decode_tiff_luma(blob[: len(blob) - 40])

    def test_unsupported_is_valueerror(self):
        assert issubclass(TiffUnsupported, ValueError)


class TestOcrRoute:
    def test_ocr_reads_tiff_pages(self):
        from bank_statement_pdf_parser_ray.core.rasterfont import (
            ocr_page,
            render_page,
            render_page_tiff,
        )

        text = "TXN 01/02 DEPOSIT 1,234.56"
        assert ocr_page(render_page_tiff(text)) == text
        # bit-identical to the PGM route on the same text
        assert ocr_page(render_page_tiff(text)) == ocr_page(render_page(text))

    def test_extract_payload_tiff_envelope(self):
        from bank_statement_pdf_parser_ray.core.extract import extract_payload
        from bank_statement_pdf_parser_ray.core.rasterfont import rasterize_payload

        text = "balance line 42"
        out = extract_payload(rasterize_payload(text, fmt="tiff"))
        assert out["extracted_text"] == text
        assert out["error"] == ""

    def test_corpus_raster_mix_includes_tiff(self):
        import base64
        import random

        from bank_statement_pdf_parser_ray.core.rasterfont import RASTER_MARKER
        from bank_statement_pdf_parser_ray.sources.corpus import gen_turn_text

        rng = random.Random(11)
        pages = []
        for _ in range(300):
            t = gen_turn_text(rng, raster_frac=0.5)
            if t.startswith(RASTER_MARKER):
                pages.append(base64.b64decode(t[len(RASTER_MARKER) :].strip()))
        magics = {p[:2] for p in pages}
        assert b"II" in magics and b"P5" in magics  # both families present


class TestActorWiring:
    def test_media_decode_actor_tiff_parity_with_pgm(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import (
            MediaDecodeActor,
            _synth_raster,
        )

        raster = _synth_raster(9, "tiff parity with pgm")
        img = np.frombuffer(raster, np.uint8).reshape(48, 64)
        for kwargs in (
            dict(compression="lzw", predictor=2),
            dict(compression="packbits", big_endian=True),
            dict(compression="none"),
        ):
            via_tiff = MediaDecodeActor._decode_image(encode_tiff_gray(img, **kwargs))
            via_pgm = MediaDecodeActor._decode_image(b"P5 64 48 255\n" + raster)
            assert via_tiff is not None and via_pgm is not None
            assert np.array_equal(via_tiff, via_pgm), kwargs

    def test_corrupt_tiff_falls_back_not_raises(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import MediaDecodeActor

        assert MediaDecodeActor._decode_image(b"II*\x00" + b"\xff" * 40) is None
