"""From-scratch PNG codec (core/png.py) and its wiring into the
multimodal decode path (MediaDecodeActor).

PNG is lossless, so the ground truth is exact round-trip identity: the
encoder cycles through all five scanline filters (one per row, y % 5),
which means a single decode of its output exercises every unfilter
branch (None/Sub/Up/Average/Paeth). Palette, gray+alpha, and RGBA
streams — which the encoder does not emit — are hand-assembled here
from raw chunks to pin those color-type paths independently."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from bank_statement_pdf_parser_ray.core.png import (
    PngUnsupported,
    decode_png_luma,
    encode_png_gray,
    encode_png_rgb,
)


def _rng_img(h, w, ch=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _raw_png(w, h, color_type, pixel_rows: bytes, extra=b"") -> bytes:
    """Assemble a filter-0-only PNG from raw pixel bytes."""
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    stride = w * ch
    lines = b"".join(
        b"\x00" + pixel_rows[y * stride : (y + 1) * stride] for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(lines))
        + _chunk(b"IEND", b"")
    )


class TestRoundTrip:
    @pytest.mark.parametrize("h,w", [(1, 1), (5, 3), (48, 64), (13, 37)])
    def test_gray_exact(self, h, w):
        img = _rng_img(h, w, seed=h * 100 + w)
        out = decode_png_luma(encode_png_gray(img))
        assert out.shape == (h, w)
        assert np.array_equal((out * 255).round().astype(np.uint8), img)

    def test_rgb_luma_is_channel_mean(self):
        img = _rng_img(16, 9, 3, seed=7)
        out = decode_png_luma(encode_png_rgb(img))
        want = img.astype(np.float32).mean(axis=2) / 255.0
        assert np.allclose(out, want)

    def test_all_five_filters_appear_in_encoder_output(self):
        # the encoder keys the filter on y % 5; decode of a >=5-row image
        # therefore covers every unfilter path — pin that invariant
        blob = encode_png_gray(_rng_img(10, 8, seed=1))
        # find the IDAT payload and check the per-row filter bytes
        pos = blob.index(b"IDAT") + 4
        length = struct.unpack(">I", blob[pos - 8 : pos - 4])[0]
        raw = zlib.decompress(blob[pos : pos + length])
        filt = {raw[y * 9] for y in range(10)}
        assert filt == {0, 1, 2, 3, 4}


class TestColorTypes:
    def test_palette(self):
        idx = np.array([[0, 1], [2, 1]], np.uint8)
        plte = bytes([255, 0, 0, 0, 255, 0, 10, 20, 30])
        blob = _raw_png(2, 2, 3, idx.tobytes(), extra=_chunk(b"PLTE", plte))
        out = decode_png_luma(blob)
        want = np.array([[255 / 3, 255 / 3], [60 / 3, 255 / 3]], np.float32) / 255.0
        assert np.allclose(out, want, atol=1e-6)

    def test_palette_index_out_of_range_rejected(self):
        blob = _raw_png(1, 1, 3, b"\x05", extra=_chunk(b"PLTE", bytes(9)))
        with pytest.raises(ValueError):
            decode_png_luma(blob)

    def test_gray_alpha_ignores_alpha(self):
        px = bytes([100, 0, 200, 255])  # two pixels: (g,a)
        out = decode_png_luma(_raw_png(2, 1, 4, px))
        assert np.allclose(out, np.array([[100, 200]], np.float32) / 255.0)

    def test_rgba_ignores_alpha(self):
        px = bytes([30, 60, 90, 0, 90, 120, 150, 255])
        out = decode_png_luma(_raw_png(2, 1, 6, px))
        assert np.allclose(out, np.array([[60, 120]], np.float32) / 255.0)


class TestRejection:
    def test_crc_mismatch(self):
        blob = bytearray(encode_png_gray(_rng_img(4, 4)))
        blob[-10] ^= 0xFF  # flip a byte inside IDAT payload/CRC region
        with pytest.raises(ValueError):
            decode_png_luma(bytes(blob))

    def test_truncated_interlaced_stream_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):  # 2x2 Adam7 needs 4 passes of bytes
            decode_png_luma(blob)

    def test_illegal_depth_for_color_type_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)  # 4-bit RGB: illegal
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(10)))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            decode_png_luma(blob)

    def test_bad_signature_and_truncation(self):
        with pytest.raises(ValueError):
            decode_png_luma(b"NOTAPNG" + bytes(32))
        with pytest.raises(ValueError):
            decode_png_luma(encode_png_gray(_rng_img(4, 4))[:-6])


class TestActorWiring:
    def test_actor_sniffs_png_and_reports_source_dims(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import MediaDecodeActor

        img = _rng_img(48, 64, seed=3)
        out = MediaDecodeActor._decode_image(encode_png_gray(img))
        assert out is not None and out.shape == (48, 64)
        assert np.array_equal((out * 255).round().astype(np.uint8), img)

    def test_corrupt_interlaced_falls_back_to_fake_path(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import MediaDecodeActor

        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
        blob = (  # interlace flag set but stream holds one pass's bytes
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + _chunk(b"IEND", b"")
        )
        assert MediaDecodeActor._decode_image(blob) is None

    def test_actor_decodes_interlaced_and_16bit(self):
        from bank_statement_pdf_parser_ray.core.png import (
            encode_png_gray16,
            encode_png_gray_interlaced,
        )
        from bank_statement_pdf_parser_ray.pipelines.datapipe import MediaDecodeActor

        img = _rng_img(48, 64, seed=5)
        out = MediaDecodeActor._decode_image(encode_png_gray_interlaced(img))
        assert out is not None and np.array_equal((out * 255).round().astype(np.uint8), img)
        img16 = (img.astype(np.uint16) << 8) | 0x7F
        out16 = MediaDecodeActor._decode_image(encode_png_gray16(img16))
        assert out16 is not None and np.allclose(out16, img16.astype(np.float32) / 65535.0)


class TestExtendedDepths:
    """Round 4: every legal (depth, interlace) combination decodes
    LOSSLESS against the source raster via the fixture encoders."""

    @pytest.mark.parametrize("shape", [(48, 64), (33, 41), (1, 1), (7, 3), (9, 16)])
    def test_adam7_lossless(self, shape):
        from bank_statement_pdf_parser_ray.core.png import encode_png_gray_interlaced

        img = _rng_img(*shape, seed=shape[0])
        out = decode_png_luma(encode_png_gray_interlaced(img))
        assert np.array_equal(out, img.astype(np.float32) / 255.0)

    @pytest.mark.parametrize("shape", [(48, 64), (33, 41), (7, 3)])
    def test_16bit_lossless(self, shape):
        from bank_statement_pdf_parser_ray.core.png import encode_png_gray16

        rng = np.random.default_rng(shape[1])
        img = rng.integers(0, 65536, shape).astype(np.uint16)
        out = decode_png_luma(encode_png_gray16(img))
        assert np.allclose(out, img.astype(np.float32) / 65535.0)

    @pytest.mark.parametrize("depth", [1, 2, 4])
    @pytest.mark.parametrize("shape", [(48, 64), (5, 13)])
    def test_subbyte_lossless(self, depth, shape):
        from bank_statement_pdf_parser_ray.core.png import encode_png_gray_depth

        rng = np.random.default_rng(depth * 10 + shape[1])
        img = rng.integers(0, 1 << depth, shape).astype(np.uint8)
        out = decode_png_luma(encode_png_gray_depth(img, depth))
        assert np.array_equal(out, img.astype(np.float32) / ((1 << depth) - 1))
