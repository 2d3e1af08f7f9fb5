"""core/mp4.py: ISO-BMFF container probe round trip and the actor's
container-metadata path."""

import numpy as np
import pyarrow as pa
import pytest

from bank_statement_pdf_parser_ray.core.mp4 import parse_mp4_meta, synth_mp4_stub


class TestProbe:
    def test_round_trip(self):
        m = parse_mp4_meta(synth_mp4_stub(7, n_frames=24, fps=12, width=320, height=240))
        assert m["brand"] == "isom"
        assert m["n_tracks"] == 1
        assert m["n_samples"] == 24
        assert abs(m["duration_s"] - 2.0) < 1e-9
        assert (m["width"], m["height"]) == (320, 240)
        assert m["codecs"] == ["avc1"]
        assert "vide" in m["handlers"]

    @pytest.mark.parametrize("nf,fps", [(1, 1), (8, 25), (600, 30)])
    def test_duration_arithmetic(self, nf, fps):
        m = parse_mp4_meta(synth_mp4_stub(1, n_frames=nf, fps=fps))
        assert m["n_samples"] == nf
        assert abs(m["duration_s"] - nf / fps) < 1e-9

    def test_garbage_and_truncation(self):
        assert parse_mp4_meta(b"not an mp4 at all") is None
        assert parse_mp4_meta(b"") is None
        full = synth_mp4_stub(3)
        # cut inside moov: framing check stops cleanly -> None (no moov
        # metadata survives) rather than raising
        assert parse_mp4_meta(full[:40]) is None

    def test_payload_is_opaque(self):
        a = parse_mp4_meta(synth_mp4_stub(1, payload=b"\x00" * 64))
        b = parse_mp4_meta(synth_mp4_stub(1, payload=b"\xff" * 999))
        assert a["n_samples"] == b["n_samples"]
        assert a["duration_s"] == b["duration_s"]


class TestActorPath:
    def _table(self, blobs):
        return pa.table(
            {
                "media_id": pa.array(range(len(blobs)), pa.int64()),
                "media": pa.array(blobs, pa.binary()),
            }
        )

    def test_mp4_metadata_row(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import VideoFrameSampleActor

        out = VideoFrameSampleActor(4)(self._table([synth_mp4_stub(9, n_frames=10, fps=5)]))
        assert out.num_rows == 1
        assert out.column("frame_idx")[0].as_py() is None
        assert out.column("mean_luma")[0].as_py() is None
        assert out.column("n_frames")[0].as_py() == 10
        assert out.column("width")[0].as_py() == 320
        assert abs(out.column("fps")[0].as_py() - 5.0) < 1e-9

    def test_unknown_blob_stays_all_null(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import VideoFrameSampleActor

        out = VideoFrameSampleActor(4)(self._table([b"\x01\x02" * 40]))
        assert out.num_rows == 1
        assert out.column("n_frames")[0].as_py() is None
        assert out.column("width")[0].as_py() is None


class TestMediaProbe:
    def test_probe_every_family(self):
        import struct

        from bank_statement_pdf_parser_ray.core.gif import encode_gif_gray
        from bank_statement_pdf_parser_ray.core.jpeg import (
            encode_jpeg_gray,
            encode_jpeg_gray_progressive,
        )
        from bank_statement_pdf_parser_ray.core.mediaprobe import probe_media
        from bank_statement_pdf_parser_ray.core.png import encode_png_gray
        from bank_statement_pdf_parser_ray.core.tiff import encode_tiff_gray

        img = ((np.arange(48 * 64).reshape(48, 64) * 7) % 256).astype(np.uint8)
        cases = {
            "pgm": b"P5 64 48 255\n" + img.tobytes(),
            "jpeg": encode_jpeg_gray(img, quality=35),
            "jpeg-prog": encode_jpeg_gray_progressive(img, quality=35),
            "png": encode_png_gray(img),
            "gif": encode_gif_gray(img),
            "tiff": encode_tiff_gray(img),
        }
        for name, blob in cases.items():
            m = probe_media(blob)
            assert m["kind"] == name.split("-")[0], (name, m)
            assert (m["width"], m["height"]) == (64, 48), (name, m)

    def test_probe_wav_y4m_mp4(self):
        from bank_statement_pdf_parser_ray.core.mediaprobe import probe_media
        from bank_statement_pdf_parser_ray.core.mp4 import synth_mp4_stub
        from bank_statement_pdf_parser_ray.pipelines.datapipe import _synth_wav, _synth_y4m

        w = probe_media(_synth_wav(3))
        assert w["kind"] == "wav" and w["sample_rate"] == 8000 and w["channels"] == 1
        assert abs(w["duration_s"] - 0.25) < 1e-6
        y = probe_media(_synth_y4m(5, n_frames=7))
        assert y["kind"] == "y4m" and (y["width"], y["height"]) == (16, 12)
        assert y["n_frames"] == 7 and abs(y["duration_s"] - 7 / 25) < 1e-9
        m = probe_media(synth_mp4_stub(2, n_frames=10, fps=5, width=100, height=80))
        assert m["kind"] == "mp4" and (m["width"], m["height"]) == (100, 80)
        assert m["n_frames"] == 10 and m["codec"] == "avc1"

    def test_probe_webp_header_geometry(self):
        import struct

        from bank_statement_pdf_parser_ray.core.mediaprobe import probe_media

        w, h = 640, 480
        bits = ((w - 1) & 0x3FFF) | (((h - 1) & 0x3FFF) << 14)
        vp8l = bytes([0x2F]) + struct.pack("<I", bits)
        chunk = b"VP8L" + struct.pack("<I", len(vp8l) + 1) + vp8l + b"\x00"
        blob = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        m = probe_media(blob)
        assert m == {"kind": "webp", "width": 640, "height": 480, "codec": "vp8l"}

    def test_probe_never_raises(self):
        from bank_statement_pdf_parser_ray.core.mediaprobe import probe_media

        for blob in (b"", b"\x00", b"RIFF\xff\xff\xff\xffWEBP", b"P5 bad", b"\xff\xd8\xff",
                     b"II*\x00" + b"\xff" * 20, b"YUV4MPEG2 Wx\n", bytes(range(256))):
            out = probe_media(blob)
            assert isinstance(out, dict) and "kind" in out

    def test_media_probe_pipeline(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.datapipe import media_probe

        n = 20
        texts = [f"probe doc {i} words here" for i in range(n)]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(n), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(["en"] * n),
                    "source": pa.array(["t"] * n),
                    "n_chars": pa.array([len(s) for s in texts], pa.int64()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        out = media_probe(str(tmp_path)).to_pandas().set_index("media_id").sort_index()
        assert len(out) == n
        kinds = {0: "pgm", 1: "bmp", 2: "jpeg", 3: "png", 4: "gif", 5: "tiff",
                 6: "wav", 7: "y4m", 8: "mp4", 9: "webp"}
        for i in range(n):
            assert out.loc[i, "kind"] == kinds[i % 10], i
            if i % 10 in (0, 1, 2, 3, 4, 5, 9):
                assert (out.loc[i, "width"], out.loc[i, "height"]) == (64, 48), i
            if i % 10 == 8:
                assert out.loc[i, "n_frames"] == 8 + i % 17
                assert out.loc[i, "codec"] == "avc1"
            if i % 10 == 6:
                assert out.loc[i, "sample_rate"] == 8000
