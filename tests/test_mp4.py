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
