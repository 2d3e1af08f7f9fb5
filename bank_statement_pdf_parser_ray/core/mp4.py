"""ISO Base Media File Format (MP4) container probe — from the public
ISO/IEC 14496-12 box structure. This is deliberately a CONTAINER
parser, not a codec: real video pipelines probe duration / resolution /
codec fourcc to filter and route BEFORE paying any decode, and that
probe needs no codec library. The sample payloads (H.264 etc.) stay
honestly undecoded — `VideoFrameSampleActor` emits a metadata row with
NULL frame features for MP4 blobs, never a fake frame.

Implemented boxes: ftyp, moov/mvhd (version 0 and 1), trak/tkhd,
mdia/mdhd, hdlr, minf/stbl/stsd (first sample entry fourcc; visual
entry width/height), stts (sample count). 64-bit largesize framing
supported; unknown boxes are skipped by size.

The fixture encoder builds a minimal valid container (ftyp + moov with
one video trak + mdat carrying an opaque payload) so the probe path is
round-trip-pinned without any codec dependency.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(blob: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", blob, pos)
        btype = blob[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", blob, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to the end of the enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            return  # malformed framing: stop cleanly
        yield btype, body, pos + size
        pos += size


def _walk(blob: bytes, start: int, end: int, out: dict) -> None:
    for btype, body, bend in _boxes(blob, start, end):
        if btype == b"ftyp":
            out["brand"] = blob[body : body + 4].decode("latin-1")
        elif btype == b"mvhd":
            ver = blob[body]
            if ver == 1 and bend - body >= 28:
                ts, dur = struct.unpack_from(">IQ", blob, body + 20)
            elif bend - body >= 20:
                ts, dur = struct.unpack_from(">II", blob, body + 12)
            else:
                continue
            if ts > 0:
                out["duration_s"] = dur / ts
        elif btype == b"tkhd":
            # width/height are the LAST two 16.16 fixed-point fields
            if bend - body >= 8:
                w, h = struct.unpack_from(">II", blob, bend - 8)
                if w and h:
                    out.setdefault("width", w >> 16)
                    out.setdefault("height", h >> 16)
        elif btype == b"hdlr":
            if bend - body >= 12:
                out.setdefault("handlers", []).append(blob[body + 8 : body + 12].decode("latin-1"))
        elif btype == b"stsd":
            if bend - body >= 16:
                # first sample entry: 8 bytes version/flags/count, then
                # entry size (4) + fourcc (4)
                fourcc = blob[body + 12 : body + 16].decode("latin-1")
                out.setdefault("codecs", []).append(fourcc)
        elif btype == b"stts":
            if bend - body >= 8:
                (n_entries,) = struct.unpack_from(">I", blob, body + 4)
                total = 0
                for e in range(n_entries):
                    off = body + 8 + 8 * e
                    if off + 8 > bend:
                        break
                    cnt, _delta = struct.unpack_from(">II", blob, off)
                    total += cnt
                out["n_samples"] = out.get("n_samples", 0) + total
        elif btype == b"trak":
            out["n_tracks"] = out.get("n_tracks", 0) + 1
            _walk(blob, body, bend, out)
        elif btype in _CONTAINERS:
            _walk(blob, body, bend, out)


def parse_mp4_meta(blob: bytes) -> "dict | None":
    """Probe an MP4/ISO-BMFF container -> metadata dict, or None when
    the bytes are not a parseable container. Keys (when present):
    brand, duration_s, n_tracks, n_samples, width, height, handlers,
    codecs."""
    if len(blob) < 12 or blob[4:8] != b"ftyp":
        return None
    out: dict = {}
    _walk(blob, 0, len(blob), out)
    if "brand" not in out or "n_tracks" not in out:
        return None
    return out


def synth_mp4_stub(
    doc_id: int,
    n_frames: int = 24,
    fps: int = 12,
    width: int = 320,
    height: int = 240,
    payload: bytes = b"",
) -> bytes:
    """Minimal valid one-video-track container with an OPAQUE mdat
    payload (codec bytes deliberately meaningless — the probe must not
    need them). Deterministic per doc_id."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    timescale = fps
    dur = n_frames
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", timescale, dur)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H2x", 0x0100)  # volume
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">B3B", 0, 0, 0, 7)
        + struct.pack(">II", 0, 0)
        + struct.pack(">I4xI", 1, dur)  # track id, duration
        + b"\x00" * 16
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = box(
        b"mdhd",
        struct.pack(">B3x", 0) + struct.pack(">II", 0, 0) + struct.pack(">II", timescale, dur) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = box(b"hdlr", struct.pack(">B3x", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"probe\x00")
    stsd_entry = (
        struct.pack(">I", 86)
        + b"avc1"
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data ref index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame count
        + b"\x00" * 32
        + struct.pack(">H", 24)  # depth
        + struct.pack(">h", -1)
    )
    stsd = box(b"stsd", struct.pack(">B3xI", 0, 1) + stsd_entry)
    stts = box(b"stts", struct.pack(">B3xI", 0, 1) + struct.pack(">II", n_frames, 1))
    stbl = box(b"stbl", stsd + stts)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    if not payload:
        # deterministic opaque "codec" bytes — never parsed
        payload = (doc_id.to_bytes(8, "big", signed=False) * 16)[:128]
    mdat = box(b"mdat", payload)
    return ftyp + moov + mdat
