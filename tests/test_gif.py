"""From-scratch GIF codec (core/gif.py) and its wiring into the
multimodal decode path (MediaDecodeActor).

GIF is lossless (palette indices round-trip exactly), so the decoder's
ground truth for our own encoder is bit-equality with the source image.
Decoder correctness independent of the encoder is pinned by a
HAND-ASSEMBLED minimal GIF whose LZW bitstream was derived on paper
from the GIF89a spec (variable-width codes, clear/end codes, the
compress-style width-growth phase)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bank_statement_pdf_parser_ray.core.gif import (
    GifUnsupported,
    _lzw_decode,
    _lzw_encode,
    decode_gif_luma,
    encode_gif_gray,
    encode_gif_rgb,
)


def _luma_to_u8(dec: np.ndarray) -> np.ndarray:
    return (dec * 255.0).round().astype(np.int64)


class TestGrayRoundTrip:
    @pytest.mark.parametrize("shape", [(1, 1), (2, 3), (48, 64), (33, 41)])
    def test_lossless(self, shape):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        dec = decode_gif_luma(encode_gif_gray(img))
        assert dec.shape == shape and dec.dtype == np.float32
        assert np.array_equal(_luma_to_u8(dec), img.astype(np.int64))

    def test_interlaced_lossless(self):
        # >=8 rows so all four interlace passes are non-empty
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, size=(13, 9), dtype=np.uint8)
        blob = encode_gif_gray(img, interlace=True)
        assert np.array_equal(_luma_to_u8(decode_gif_luma(blob)), img.astype(np.int64))
        # interlace flag actually set in the image descriptor
        assert blob[: 6] == b"GIF89a"

    def test_repetitive_image_compresses(self):
        img = np.tile(np.arange(16, dtype=np.uint8) * 16, (32, 8))
        blob = encode_gif_gray(img)
        assert len(blob) < img.size  # LZW actually compressing
        assert np.array_equal(_luma_to_u8(decode_gif_luma(blob)), img.astype(np.int64))

    def test_table_full_reset_path(self):
        # 128x128 noise assigns >4096 LZW entries -> encoder emits a
        # mid-stream clear code; decode must still be lossless
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(128, 128), dtype=np.uint8)
        assert np.array_equal(
            _luma_to_u8(decode_gif_luma(encode_gif_gray(img))), img.astype(np.int64)
        )


class TestRgbRoundTrip:
    def test_exact_palette(self):
        rng = np.random.default_rng(5)
        palette = rng.integers(0, 256, size=(17, 3), dtype=np.uint8)
        idx = rng.integers(0, 17, size=(20, 30))
        img = palette[idx]
        dec = _luma_to_u8(decode_gif_luma(encode_gif_rgb(img)))
        expect = (img.astype(np.float32).mean(axis=2) / 255.0 * 255.0).round().astype(np.int64)
        assert np.array_equal(dec, expect)

    def test_small_palette_narrow_codes(self):
        # 2 colors -> 2-bit LZW min code size path
        img = np.zeros((9, 9, 3), dtype=np.uint8)
        img[::2, ::2] = 255
        dec = _luma_to_u8(decode_gif_luma(encode_gif_rgb(img)))
        assert set(np.unique(dec)) == {0, 255}

    def test_too_many_colors_raises(self):
        i = np.arange(300)
        img = np.stack([i % 256, i // 256, i % 7], axis=1).astype(np.uint8).reshape(10, 30, 3)
        assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
        with pytest.raises(GifUnsupported):
            encode_gif_rgb(img)


class TestHandAssembled:
    def test_spec_derived_bitstream(self):
        """2x2 checker, 2-entry palette, mcs=2. Hand-derived LZW codes:
        clear(4)@3, 0@3, 1@3, 1@3 (width grows AFTER this emit because
        the pre-assignment slot count reached 8), 0@4, end(5)@4
        -> packed LSB-first = 0x050244 -> bytes 44 02 05."""
        blob = (
            b"GIF89a"
            + struct.pack("<HH", 2, 2)
            + bytes([0x80, 0, 0])  # global table, 2 entries
            + bytes([10, 20, 30, 200, 210, 220])  # palette
            + bytes([0x2C])
            + struct.pack("<HHHH", 0, 0, 2, 2)
            + bytes([0x00])  # no local table, no interlace
            + bytes([2])  # LZW min code size
            + bytes([3]) + b"\x44\x02\x05"  # one data sub-block
            + bytes([0x00, 0x3B])
        )
        dec = _luma_to_u8(decode_gif_luma(blob))
        lum0 = round((10 + 20 + 30) / 3 / 255 * 255)
        lum1 = round((200 + 210 + 220) / 3 / 255 * 255)
        assert dec.tolist() == [[lum0, lum1], [lum1, lum0]]

    def test_extension_blocks_skipped(self):
        # our encoder embeds a graphic-control extension; add a comment
        # extension too and decode must be unaffected
        img = np.arange(64, dtype=np.uint8).reshape(8, 8) * 4
        blob = encode_gif_gray(img)
        head, tail = blob[:13 + 768], blob[13 + 768 :]
        comment = bytes([0x21, 0xFE, 5]) + b"hello" + bytes([0x00])
        assert np.array_equal(
            _luma_to_u8(decode_gif_luma(head + comment + tail)), img.astype(np.int64)
        )


class TestGuards:
    def test_bad_signature(self):
        with pytest.raises(ValueError):
            decode_gif_luma(b"NOTAGIF" + b"\x00" * 32)

    def test_truncated(self):
        blob = encode_gif_gray(np.zeros((4, 4), dtype=np.uint8))
        with pytest.raises(ValueError):
            decode_gif_luma(blob[: len(blob) // 2])

    def test_no_frame(self):
        blob = b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x00, 0, 0, 0x3B])
        with pytest.raises(ValueError):
            decode_gif_luma(blob)

    def test_missing_palette(self):
        blob = (
            b"GIF89a"
            + struct.pack("<HH", 2, 2)
            + bytes([0x00, 0, 0])  # no global table
            + bytes([0x2C])
            + struct.pack("<HHHH", 0, 0, 2, 2)
            + bytes([0x00, 2, 1, 0x44, 0x00, 0x3B])
        )
        with pytest.raises(ValueError):
            decode_gif_luma(blob)

    def test_lzw_code_out_of_range(self):
        # all-ones codes reference slots far past the table
        with pytest.raises(ValueError):
            _lzw_decode(b"\xff" * 8, 2, 16)


class TestLzwKernel:
    @pytest.mark.parametrize("mcs", [2, 4, 8])
    def test_roundtrip_random(self, mcs):
        rng = np.random.default_rng(mcs)
        idx = rng.integers(0, 1 << mcs, size=5000, dtype=np.uint8)
        out = _lzw_decode(_lzw_encode(idx, mcs), mcs, len(idx))
        assert np.array_equal(out, idx)

    def test_kwkwk_case(self):
        # 'aaaa...' immediately hits the code==len(table) branch
        idx = np.zeros(64, dtype=np.uint8)
        out = _lzw_decode(_lzw_encode(idx, 2), 2, 64)
        assert np.array_equal(out, idx)


class TestMediaActorGifPath:
    def test_actor_decodes_gif(self):
        import pyarrow as pa

        from bank_statement_pdf_parser_ray.pipelines.datapipe import MediaDecodeActor

        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
        actor = MediaDecodeActor(target_size=(8, 8))
        t = pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "media": pa.array([encode_gif_gray(img)], pa.binary()),
            }
        )
        out = actor(t)
        # source dims reported => the REAL decode path ran, not the fake
        assert out.column("height").to_pylist() == [48]
        assert out.column("width").to_pylist() == [64]
