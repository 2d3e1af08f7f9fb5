"""Header-only media metadata probe — the profiling pass a 100 TB
multimodal pipeline runs FIRST: identify every blob's container and
pull dimensions / duration / codec from fixed header structures alone,
touching O(1) bytes per blob regardless of payload size. Decode cost
is then only spent on blobs the profile admits (format allow-lists,
resolution/duration gates, codec routing).

All parsers read public formats from their specs: netpbm P5/P6, BMP
(BITMAPINFOHEADER), JPEG (SOF scan, T.81), PNG (IHDR), GIF (logical
screen descriptor), TIFF 6.0 (IFD, via core/tiff), RIFF/WAVE (fmt +
data chunks), WebP (RIFF: VP8X canvas, VP8L stream header's 14-bit
dims, lossy VP8's frame tag + start code + 14-bit dims), YUV4MPEG2
(stream header), MP4/ISO-BMFF (core/mp4 box walk). A probe NEVER
raises on hostile bytes — unknown/corrupt input reports kind
"unknown" with NULL fields.

Note the asymmetry with MediaDecodeActor: WebP PIXELS still need a
codec library (the honest-fallback list), but its GEOMETRY is plain
header arithmetic — so the probe covers strictly more formats than the
decoder, exactly as in production (ffprobe-before-ffmpeg).
"""

from __future__ import annotations

import struct


def _pnm_dims(blob: bytes) -> "tuple[int, int] | None":
    toks, pos = [], 2
    while len(toks) < 2 and pos < len(blob):
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        toks.append(blob[start:pos])
    try:
        w, h = int(toks[0]), int(toks[1])
    except (IndexError, ValueError):
        return None
    return (w, h) if w > 0 and h > 0 else None


def _jpeg_dims(blob: bytes) -> "tuple[int, int] | None":
    pos, n = 2, len(blob)
    while pos + 1 < n:
        if blob[pos] != 0xFF:
            return None
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9 or marker == 0xDA:
            return None  # hit entropy data without a SOF
        if pos + 2 > n:
            return None
        (seg_len,) = struct.unpack_from(">H", blob, pos)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):  # any SOFn
            if pos + 7 > n:
                return None
            h, w = struct.unpack_from(">HH", blob, pos + 3)
            return (w, h) if w and h else None
        pos += seg_len
    return None


def _webp_meta(blob: bytes) -> "dict | None":
    if len(blob) < 16 or blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        return None
    pos, n = 12, len(blob)
    out = {"kind": "webp"}
    while pos + 8 <= n:
        fourcc = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = pos + 8
        if fourcc == b"VP8X" and body + 10 <= n:
            # 24-bit canvas dims, minus one
            w = int.from_bytes(blob[body + 4 : body + 7], "little") + 1
            h = int.from_bytes(blob[body + 7 : body + 10], "little") + 1
            out.update(width=w, height=h, codec="vp8x")
            return out
        if fourcc == b"VP8L" and body + 5 <= n and blob[body] == 0x2F:
            bits = int.from_bytes(blob[body + 1 : body + 5], "little")
            out.update(
                width=(bits & 0x3FFF) + 1,
                height=((bits >> 14) & 0x3FFF) + 1,
                codec="vp8l",
            )
            return out
        if fourcc == b"VP8 " and body + 10 <= n:
            # lossy VP8: 3-byte frame tag, start code 9d 01 2a, then
            # 14-bit width/height (little-endian, low 14 bits)
            if blob[body + 3 : body + 6] != b"\x9d\x01\x2a":
                return None
            (w,) = struct.unpack_from("<H", blob, body + 6)
            (h,) = struct.unpack_from("<H", blob, body + 8)
            out.update(width=w & 0x3FFF, height=h & 0x3FFF, codec="vp8")
            return out
        pos = body + size + (size & 1)  # chunks are 2-byte aligned
    return None


def _wav_meta(blob: bytes) -> "dict | None":
    if len(blob) < 44 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    pos, n = 12, len(blob)
    out = {"kind": "wav"}
    sr = channels = bits = 0
    data_bytes = None
    while pos + 8 <= n:
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = pos + 8
        if cid == b"fmt " and body + 16 <= n:
            _fmt, channels, sr = struct.unpack_from("<HHI", blob, body)
            bits = struct.unpack_from("<H", blob, body + 14)[0]
        elif cid == b"data":
            data_bytes = size
        pos = body + size + (size & 1)
    if not sr or not channels:
        return None
    out.update(sample_rate=sr, channels=channels)
    if data_bytes is not None and bits:
        out["duration_s"] = data_bytes / (sr * channels * (bits // 8 or 1))
    return out


def probe_media(blob: bytes) -> dict:
    """blob -> metadata dict; always returns, never raises. Keys:
    kind (always), and per-kind: width, height, duration_s,
    sample_rate, channels, codec, n_frames."""
    try:
        return _probe(blob)
    except Exception:
        return {"kind": "unknown"}


def _probe(blob: bytes) -> dict:
    if not blob or len(blob) < 8:
        return {"kind": "unknown"}
    if blob[:2] in (b"P5", b"P6"):
        d = _pnm_dims(blob)
        return {"kind": "pgm" if blob[:2] == b"P5" else "ppm", "width": d[0], "height": d[1]} if d else {"kind": "unknown"}
    if blob[:2] == b"BM" and len(blob) >= 26:
        w, h = struct.unpack_from("<ii", blob, 18)
        return {"kind": "bmp", "width": abs(w), "height": abs(h)}
    if blob[:2] == b"\xff\xd8":
        d = _jpeg_dims(blob)
        return {"kind": "jpeg", "width": d[0], "height": d[1]} if d else {"kind": "jpeg"}
    if blob[:8] == b"\x89PNG\r\n\x1a\n" and len(blob) >= 24:
        w, h = struct.unpack_from(">II", blob, 16)
        return {"kind": "png", "width": w, "height": h}
    if blob[:6] in (b"GIF87a", b"GIF89a") and len(blob) >= 10:
        w, h = struct.unpack_from("<HH", blob, 6)
        return {"kind": "gif", "width": w, "height": h}
    if blob[:4] in (b"II*\x00", b"MM\x00*"):
        from bank_statement_pdf_parser_ray.core.tiff import _read_ifd

        tags = _read_ifd(blob, "<" if blob[:2] == b"II" else ">")
        out = {"kind": "tiff"}
        if 256 in tags and 257 in tags:
            out.update(width=tags[256][0], height=tags[257][0])
        return out
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        return _webp_meta(blob) or {"kind": "unknown"}
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return _wav_meta(blob) or {"kind": "unknown"}
    if blob.startswith(b"YUV4MPEG2"):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import VideoFrameSampleActor

        hdr = VideoFrameSampleActor._parse_header(blob)
        if hdr is None:
            return {"kind": "unknown"}
        w, h, fps, fbytes, pos = hdr
        rec = 6 + fbytes
        nf = (len(blob) - pos) // rec if rec else 0
        out = {"kind": "y4m", "width": w, "height": h, "n_frames": nf}
        if fps:
            out["duration_s"] = nf / fps
        return out
    if len(blob) >= 12 and blob[4:8] == b"ftyp":
        from bank_statement_pdf_parser_ray.core.mp4 import parse_mp4_meta

        m = parse_mp4_meta(blob)
        if m is None:
            return {"kind": "unknown"}
        out = {"kind": "mp4"}
        for k_src, k_dst in (
            ("width", "width"), ("height", "height"), ("duration_s", "duration_s"),
            ("n_samples", "n_frames"),
        ):
            if k_src in m:
                out[k_dst] = m[k_src]
        if m.get("codecs"):
            out["codec"] = m["codecs"][0]
        return out
    return {"kind": "unknown"}
