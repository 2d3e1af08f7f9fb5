"""From-scratch baseline JPEG codec (core/jpeg.py) and its wiring into
the multimodal decode path (MediaDecodeActor, image_neardup).

The decoder's ground truth is an INDEPENDENT reference implemented here
in the test: pad -> level shift -> orthonormal DCT -> quantize/dequantize
-> IDCT -> round/clip. Decoding an image our encoder produced must match
that reference BIT-EXACTLY (same quantized coefficients by construction,
so the only freedom is arithmetic order — pinned to chained matmul)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from bank_statement_pdf_parser_ray.core.jpeg import (
    JpegUnsupported,
    _DCT_M,
    decode_jpeg_luma,
    encode_jpeg_color420,
    encode_jpeg_gray,
    quant_table,
)


def _reference_roundtrip(img: np.ndarray, quality: int) -> np.ndarray:
    """Sequential numpy reference for gray baseline encode->decode."""
    h, w = img.shape
    qt = quant_table(quality).astype(np.float64)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    pad = np.empty((ph, pw), np.uint8)
    pad[:h, :w] = img
    pad[h:, :w] = img[h - 1 : h, :]
    pad[:, w:] = pad[:, w - 1 : w]
    blocks = (
        pad.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8).astype(np.float64)
        - 128.0
    )
    coefs = _DCT_M @ blocks @ _DCT_M.T
    deq = np.round(coefs.reshape(-1, 64) / qt) * qt
    rec = _DCT_M.T @ deq.reshape(-1, 8, 8) @ _DCT_M + 128.0
    rec = np.clip(np.round(rec), 0, 255)
    return (
        rec.reshape(ph // 8, pw // 8, 8, 8).transpose(0, 2, 1, 3).reshape(ph, pw)[:h, :w]
    ).astype(np.int64)


class TestGrayRoundTrip:
    @pytest.mark.parametrize("shape", [(8, 8), (48, 64), (33, 41)])
    @pytest.mark.parametrize("quality", [25, 50, 75, 95])
    def test_bit_exact_vs_reference(self, shape, quality):
        rng = np.random.default_rng(42)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        dec = decode_jpeg_luma(encode_jpeg_gray(img, quality=quality))
        assert dec.shape == shape and dec.dtype == np.float32
        out = (dec * 255.0).round().astype(np.int64)
        assert np.array_equal(out, _reference_roundtrip(img, quality))

    def test_smooth_image_low_error(self):
        img = (np.add.outer(np.arange(48), np.arange(64)) * 2 % 256).astype(np.uint8)
        dec = (decode_jpeg_luma(encode_jpeg_gray(img, 75)) * 255).round()
        assert np.abs(dec - img).mean() < 2.0

    def test_restart_markers_change_nothing(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (48, 64), np.uint8)
        a = decode_jpeg_luma(encode_jpeg_gray(img, 50))
        b = decode_jpeg_luma(encode_jpeg_gray(img, 50, restart_interval=3))
        assert np.array_equal(a, b)


class TestColor420:
    def test_luma_plane_matches_bt601_y(self):
        rng = np.random.default_rng(7)
        rgb = rng.integers(0, 256, (40, 56, 3), np.uint8)
        lum = decode_jpeg_luma(encode_jpeg_color420(rgb, 75))
        assert lum.shape == (40, 56)
        r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
        y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
        # lossy, but the luma channel must track Y within quant error
        assert np.abs(lum * 255 - y).mean() < 12.0

    def test_color_restart_identical(self):
        rng = np.random.default_rng(9)
        rgb = rng.integers(0, 256, (32, 48, 3), np.uint8)
        a = decode_jpeg_luma(encode_jpeg_color420(rgb, 75))
        b = decode_jpeg_luma(encode_jpeg_color420(rgb, 75, restart_interval=2))
        assert np.array_equal(a, b)


class TestProgressive:
    """SOF2 decode (spectral selection + successive approximation) is
    pinned BIT-IDENTICAL to baseline decode: both encoders carry the
    same quantized coefficients, so any decoder divergence — EOB runs,
    ZRL spans, correction-bit order, DC point transform — flips a
    pixel."""

    @pytest.mark.parametrize("shape", [(48, 64), (33, 41), (8, 8), (17, 9)])
    @pytest.mark.parametrize("quality", [20, 35, 75, 92])
    def test_bit_parity_with_baseline(self, shape, quality):
        from bank_statement_pdf_parser_ray.core.jpeg import encode_jpeg_gray_progressive

        rng = np.random.default_rng(hash(shape) % 1000 + quality)
        img = rng.integers(0, 256, shape, np.uint8)
        base = decode_jpeg_luma(encode_jpeg_gray(img, quality))
        prog = decode_jpeg_luma(encode_jpeg_gray_progressive(img, quality))
        assert np.array_equal(base, prog)

    def test_smooth_and_flat_images(self):
        from bank_statement_pdf_parser_ray.core.jpeg import encode_jpeg_gray_progressive

        grad = np.clip(np.add.outer(np.linspace(0, 200, 48), np.linspace(0, 255, 64)) / 2, 0, 255).astype(np.uint8)
        flat = np.full((24, 24), 77, np.uint8)
        for img in (grad, flat):
            b = decode_jpeg_luma(encode_jpeg_gray(img, 50))
            p = decode_jpeg_luma(encode_jpeg_gray_progressive(img, 50))
            assert np.array_equal(b, p)

    def test_is_actually_sof2(self):
        from bank_statement_pdf_parser_ray.core.jpeg import encode_jpeg_gray_progressive

        blob = encode_jpeg_gray_progressive(np.zeros((8, 8), np.uint8), 75)
        assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob
        assert blob.count(b"\xff\xda") == 6  # six scans

    def test_media_actor_decodes_progressive(self):
        from bank_statement_pdf_parser_ray.core.jpeg import encode_jpeg_gray_progressive
        from bank_statement_pdf_parser_ray.pipelines.datapipe import MediaDecodeActor

        img = (np.add.outer(np.arange(48), np.arange(64)) % 256).astype(np.uint8)
        out = MediaDecodeActor._decode_image(encode_jpeg_gray_progressive(img, 90))
        assert out is not None and out.shape == (48, 64)
        assert np.abs(out * 255 - img).mean() < 3.0


class TestDecoderGuards:

    def test_not_a_jpeg_raises(self):
        with pytest.raises(ValueError):
            decode_jpeg_luma(b"P5 2 2 255\n\x00\x00\x00\x00")

    def test_truncated_stream_raises_not_hangs(self):
        blob = encode_jpeg_gray(np.full((16, 16), 200, np.uint8), 50)
        with pytest.raises(ValueError):
            decode_jpeg_luma(blob[:20])


class TestMediaActorJpegPath:
    def test_decode_image_routes_jpeg(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import MediaDecodeActor

        img = (np.add.outer(np.arange(48), np.arange(64)) % 256).astype(np.uint8)
        out = MediaDecodeActor._decode_image(encode_jpeg_gray(img, 90))
        assert out is not None and out.shape == (48, 64)
        assert np.abs(out * 255 - img).mean() < 3.0
        # corrupt JPEG falls back to None (fake path), never raises
        assert MediaDecodeActor._decode_image(b"\xff\xd8" + b"\x00" * 40) is None

    def test_synth_blob_mixes_formats_and_jpeg_is_real(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import _synth_image_blob

        blobs = [_synth_image_blob(i, f"document body number {i}") for i in range(64)]
        kinds = {b[:2] for b in blobs}
        assert b"\xff\xd8" in kinds and b"P5" in kinds
        n_jpeg = sum(b[:2] == b"\xff\xd8" for b in blobs)
        assert 4 <= n_jpeg <= 32  # ~1/4 keyed on content hash
        jpeg = next(b for b in blobs if b[:2] == b"\xff\xd8")
        assert decode_jpeg_luma(jpeg).shape == (48, 64)

    def test_image_neardup_mixed_corpus(self, tmp_path):
        """Duplicated texts cluster regardless of which format the
        content hash assigns them; singletons stay singletons."""
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.datapipe import (
            _synth_image_blob,
            image_neardup,
        )

        # pick one text that lands in JPEG and one that lands in PGM so
        # the planted clusters exercise both decode paths
        def fmt(s: str) -> bytes:
            return _synth_image_blob(0, s)[:2]

        jpeg_text = next(
            s for s in (f"jpeg candidate {i}" for i in range(200)) if fmt(s) == b"\xff\xd8"
        )
        pgm_text = next(s for s in (f"pgm candidate {i}" for i in range(200)) if fmt(s) == b"P5")
        texts = [jpeg_text] * 3 + [pgm_text] * 2 + ["a singleton document payload"]
        n = len(texts)
        docs = pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["t"] * n),
                "n_chars": pa.array([len(s) for s in texts], pa.int64()),
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        out = image_neardup(str(tmp_path)).to_pandas().sort_values("media_id")
        assert out[out["media_id"] < 3]["cluster_rep"].tolist() == [0, 0, 0]
        assert out[out["media_id"] < 3]["cluster_size"].tolist() == [3, 3, 3]
        assert out[out["media_id"].isin([3, 4])]["cluster_rep"].tolist() == [3, 3]
        assert out[out["media_id"] == 5]["cluster_size"].tolist() == [1]
