"""WARC source (sources/warc.py): record framing, record-at-time gzip,
HTTP split, response selection, and the warc_ingest round trip.

Framing ground truth is the spec layout itself: records our writer
emits must re-parse to the same payloads (writer and parser share no
code path beyond the header names), and hand-corrupted streams must
fail loudly rather than return partial rows."""

from __future__ import annotations

import gzip

import numpy as np
import pyarrow as pa
import pytest

from bank_statement_pdf_parser_ray.sources.warc import (
    _split_http,
    parse_warc,
    read_warc,
    write_warc,
)

PAGES = [
    (
        "https://example.org/a/1",
        "<html><body><p>the first page body with plenty of words to keep "
        "the content block past the boilerplate heuristics of the "
        "stripper for sure</p></body></html>",
    ),
    (
        "https://example.org/b/2",
        "<html><body><p>another real page &amp; its escaped entity body "
        "with enough running text to be kept as content</p></body></html>",
    ),
]


class TestFraming:
    @pytest.mark.parametrize("gz", [False, True])
    def test_roundtrip_counts_and_types(self, tmp_path, gz):
        p = str(tmp_path / ("f.warc.gz" if gz else "f.warc"))
        n = write_warc(PAGES, p, gzip_members=gz)
        assert n == 1 + 2 * len(PAGES)  # warcinfo + (request, response) per page
        recs = list(parse_warc(open(p, "rb").read()))
        assert len(recs) == n
        types = [h["warc-type"] for h, _ in recs]
        assert types == ["warcinfo", "request", "response", "request", "response"]

    def test_gzip_members_are_per_record(self, tmp_path):
        """Record-at-time compression: each record its own gzip member,
        so truncating to the first member still yields one whole record."""
        p = str(tmp_path / "f.warc.gz")
        write_warc(PAGES, p)
        blob = open(p, "rb").read()
        # locate the second member by magic after the first
        second = blob.index(b"\x1f\x8b", 2)
        first = list(parse_warc(blob[:second]))
        assert len(first) == 1 and first[0][0]["warc-type"] == "warcinfo"

    def test_http_split(self):
        ctype, body = _split_http(b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n<x>")
        assert ctype == "text/html; charset=utf-8" and body == b"<x>"
        ctype, body = _split_http(b"not an http message")
        assert ctype == "" and body == b"not an http message"

    def test_truncated_payload_raises(self, tmp_path):
        p = str(tmp_path / "f.warc")
        write_warc(PAGES, p, gzip_members=False)
        with pytest.raises(ValueError):
            list(parse_warc(open(p, "rb").read()[:-40]))

    def test_truncated_gzip_member_raises(self, tmp_path):
        p = str(tmp_path / "f.warc.gz")
        write_warc(PAGES, p)
        with pytest.raises(ValueError):
            list(parse_warc(open(p, "rb").read()[:-10]))

    def test_bad_version_line_raises(self):
        with pytest.raises(ValueError):
            list(parse_warc(b"HTTP/1.0 200\r\nContent-Length: 0\r\n\r\n\r\n\r\n"))


class TestReadWarc:
    def test_documents_shape_and_strip(self, tmp_path):
        from bank_statement_pdf_parser_ray.core.html_strip import strip_html

        p = str(tmp_path / "f.warc.gz")
        write_warc(PAGES, p)
        out = read_warc([p]).to_pandas().sort_values("url").reset_index(drop=True)
        assert list(out.columns) == ["doc_id", "url", "content_type", "text", "n_chars"]
        assert len(out) == 2  # responses only; warcinfo/request skipped
        assert out["url"].tolist() == [u for u, _ in PAGES]
        for i, (_, html_doc) in enumerate(PAGES):
            assert out.loc[i, "text"] == strip_html(html_doc)[0]
        assert (out["content_type"] == "text/html").all()
        assert out["doc_id"].is_unique and (out["doc_id"] >= 0).all()

    def test_sharded_read_parallel_units(self, tmp_path):
        p1, p2 = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
        write_warc(PAGES[:1], p1)
        write_warc(PAGES[1:], p2)
        out = read_warc([p1, p2]).to_pandas()
        assert len(out) == 2 and set(out["url"]) == {u for u, _ in PAGES}


class TestWarcIngestQuery:
    def test_round_trips_document_text(self, tmp_path):
        """Every long-enough document body must survive render -> WARC
        -> gzip -> parse -> strip with text equal to the stripper's own
        output on the rendered page, and lineage (doc_id in the URL)
        must cover the whole input."""
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines import datapipe as dp

        texts = [
            f"document number {i} with a good amount of running text so the "
            f"content heuristics keep it intact end to end {'word ' * 10}"
            for i in range(12)
        ]
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(12), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 12),
                "source": pa.array(["warcsrc"] * 12),
                "n_chars": pa.array([len(s) for s in texts], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = dp.warc_ingest(str(tmp_path)).to_pandas()
        assert len(out) == 12
        orig_ids = sorted(int(u.rsplit("/", 1)[1]) for u in out["url"])
        assert orig_ids == list(range(12))
        from bank_statement_pdf_parser_ray.core.normalize import normalize_text

        by_orig = {int(u.rsplit("/", 1)[1]): s for u, s in zip(out["url"], out["text"])}
        for i, s in enumerate(texts):
            assert by_orig[i] == normalize_text(s), i
        # rerun hits the cached corpus and returns identical rows
        again = dp.warc_ingest(str(tmp_path)).to_pandas()
        assert sorted(again["doc_id"]) == sorted(out["doc_id"])
