"""From-scratch TIFF 6.0 codec — the baseline subset scanned documents
actually ship: 8-bit grayscale and RGB, strip layout, Compression 1
(none) / 5 (TIFF-variant LZW) / 32773 (PackBits), Predictor 2
(horizontal differencing), PhotometricInterpretation 0/1/2, both byte
orders. Implemented from the public TIFF 6.0 specification (Adobe,
1992): §8 baseline fields, §9 PackBits, §13 LZW incl. the early-change
convention, §14 differencing predictor.

Reference parity note: the reference repo (see SURVEY.md §0) contains
no code; this module generalizes its scanned-statement ingestion the
same way core/jpeg.py and core/png.py do — a real decoder behind
``MediaDecodeActor`` and the raster/OCR statement path, with a
lossless-pinned encoder for fixtures.

TIFF LZW differs from GIF's (core/gif.py) in every packing detail —
MSB-first bit order, byte-string alphabet of size 256 with Clear=256 /
EOI=257, and the EARLY-CHANGE width bump at (1 << width) - 1 — so it
gets its own engine rather than a parameterized reuse.

Scope kept honest: tiles, 1/4/16-bit samples, CCITT fax compressions
and planar configuration 2 raise ``TiffUnsupported`` (a ValueError, so
``MediaDecodeActor`` falls back to the labeled fake path instead of
crashing the task).
"""

from __future__ import annotations

import struct

import numpy as np

_CLEAR = 256
_EOI = 257
_TABLE_MAX = 4094  # reset before code 4095 per spec §13


class TiffUnsupported(ValueError):
    """Valid-looking TIFF using a feature outside this codec's scope."""


# ---------------------------------------------------------------------------
# TIFF-variant LZW (spec §13)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF LZW -> raw bytes (at most ``expected`` of them)."""
    val = int.from_bytes(data, "big")
    nbits = 8 * len(data)
    pos = 0  # bits consumed from the MSB end
    width = 9
    base: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    while pos + width <= nbits and len(out) < expected:
        code = (val >> (nbits - pos - width)) & ((1 << width) - 1)
        pos += width
        if code == _CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == _EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("tiff: first LZW code after clear out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
        else:
            raise ValueError("tiff: LZW code out of range")
        if prev is not None and len(table) < _TABLE_MAX:
            table.append(prev + entry[:1])
            # EARLY CHANGE: the encoder (spec §13 / libtiff alike) bumps
            # its width when its next free code hits (1<<width)-1; this
            # decoder's table lags the encoder's by ONE entry, so the
            # same boundary lands at len(table) == (1<<width)-2
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
        out += entry
        prev = entry
    if len(out) < expected:
        raise ValueError("tiff: LZW stream ended before the strip was full")
    return bytes(out[:expected])


def _lzw_encode(data: bytes) -> bytes:
    """raw bytes -> TIFF LZW stream (early-change, MSB-first)."""
    out = bytearray()
    acc = 0
    acc_bits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, acc_bits
        acc = (acc << w) | code
        acc_bits += w
        while acc_bits >= 8:
            acc_bits -= 8
            out.append((acc >> acc_bits) & 0xFF)

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return {bytes([i]): i for i in range(256)}, _EOI + 1, 9

    table, next_code, width = fresh()
    emit(_CLEAR, width)
    w_seq = b""
    for b in data:
        wk = w_seq + bytes([b])
        if wk in table:
            w_seq = wk
            continue
        emit(table[w_seq], width)
        table[wk] = next_code
        next_code += 1
        # early change: bump BEFORE the slot count reaches 2^width
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code > _TABLE_MAX:
            emit(_CLEAR, width)
            table, next_code, width = fresh()
        w_seq = bytes([b])
    if w_seq:
        emit(table[w_seq], width)
    emit(_EOI, width)
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# PackBits (spec §9)
# ---------------------------------------------------------------------------


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            if i + h + 1 > n:
                raise ValueError("tiff: truncated PackBits literal")
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if i >= n:
                raise ValueError("tiff: truncated PackBits repeat")
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op
    if len(out) < expected:
        raise ValueError("tiff: PackBits stream ended before the strip was full")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:  # repeat run
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        # literal run: until the next >=2 repeat or 128 bytes
        j = i + 1
        while j < n and j - i < 128 and not (j + 1 < n and data[j + 1] == data[j]):
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


# ---------------------------------------------------------------------------
# IFD plumbing
# ---------------------------------------------------------------------------

_TYPE_SIZE = {1: 1, 3: 2, 4: 4}


def _read_ifd(blob: bytes, order: str) -> dict[int, list[int]]:
    (ifd_off,) = struct.unpack_from(order + "I", blob, 4)
    if ifd_off + 2 > len(blob):
        raise ValueError("tiff: truncated IFD offset")
    (n_entries,) = struct.unpack_from(order + "H", blob, ifd_off)
    tags: dict[int, list[int]] = {}
    for e in range(n_entries):
        off = ifd_off + 2 + 12 * e
        if off + 12 > len(blob):
            raise ValueError("tiff: truncated IFD entry")
        tag, typ = struct.unpack_from(order + "HH", blob, off)
        (count,) = struct.unpack_from(order + "I", blob, off + 4)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # RATIONAL/ASCII metadata: irrelevant to decode
        total = size * count
        if total <= 4:
            data_off = off + 8
        else:
            (data_off,) = struct.unpack_from(order + "I", blob, off + 8)
            if data_off + total > len(blob):
                raise ValueError("tiff: IFD value overruns the file")
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack_from(order + str(count) + fmt, blob, data_off))
    return tags


def decode_tiff_luma(blob: bytes) -> np.ndarray:
    """Decode the first IFD of a TIFF -> float32 luma HxW in [0, 1].

    Raises ``ValueError`` on malformed streams and ``TiffUnsupported``
    (a ValueError subclass) on out-of-scope features, so actor-pool
    callers can fall back without a special case."""
    if len(blob) < 8:
        raise ValueError("tiff: too short")
    if blob[:2] == b"II":
        order = "<"
    elif blob[:2] == b"MM":
        order = ">"
    else:
        raise ValueError("tiff: bad byte-order mark")
    (magic,) = struct.unpack_from(order + "H", blob, 2)
    if magic != 42:
        raise ValueError("tiff: bad magic")
    tags = _read_ifd(blob, order)
    try:
        width = tags[256][0]
        height = tags[257][0]
        strip_offs = tags[273]
        strip_counts = tags[279]
    except KeyError as e:
        raise ValueError(f"tiff: missing required tag {e}")
    bits = tags.get(258, [8])
    spp = tags.get(277, [1])[0]
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    pred = tags.get(317, [1])[0]
    rows_per_strip = tags.get(278, [height])[0] or height
    planar = tags.get(284, [1])[0]
    if any(b != 8 for b in bits):
        raise TiffUnsupported(f"tiff: {bits}-bit samples (8-bit only)")
    if spp not in (1, 3):
        raise TiffUnsupported(f"tiff: {spp} samples/pixel")
    if comp not in (1, 5, 32773):
        raise TiffUnsupported(f"tiff: compression {comp}")
    if photo not in (0, 1, 2):
        raise TiffUnsupported(f"tiff: photometric {photo}")
    if pred not in (1, 2):
        raise TiffUnsupported(f"tiff: predictor {pred}")
    if planar != 1:
        raise TiffUnsupported("tiff: planar configuration 2")
    if width <= 0 or height <= 0 or len(strip_offs) != len(strip_counts):
        raise ValueError("tiff: inconsistent geometry")
    row_bytes = width * spp
    rows_out: list[bytes] = []
    for s, (o, c) in enumerate(zip(strip_offs, strip_counts)):
        if o + c > len(blob):
            raise ValueError("tiff: strip overruns the file")
        n_rows = min(rows_per_strip, height - s * rows_per_strip)
        if n_rows <= 0:
            raise ValueError("tiff: more strips than rows")
        raw = blob[o : o + c]
        need = n_rows * row_bytes
        if comp == 5:
            raw = _lzw_decode(raw, need)
        elif comp == 32773:
            raw = _packbits_decode(raw, need)
        elif len(raw) < need:
            raise ValueError("tiff: truncated uncompressed strip")
        rows_out.append(raw[:need])
    data = np.frombuffer(b"".join(rows_out), dtype=np.uint8)
    img = data.reshape(height, width, spp)
    if pred == 2:
        # horizontal differencing per row per channel (spec §14):
        # stored values are deltas, recover with a modular cumsum
        img = np.cumsum(img.astype(np.uint16), axis=1, dtype=np.uint16).astype(np.uint8)
    lum = img.astype(np.float32).mean(axis=2) / 255.0 if spp == 3 else img[:, :, 0].astype(np.float32) / 255.0
    if photo == 0:  # WhiteIsZero: scanned bilevel/gray convention
        lum = 1.0 - lum
    return lum


# ---------------------------------------------------------------------------
# encode (fixture/writer path; lossless — parity-pinned in tests)
# ---------------------------------------------------------------------------


def _encode(
    img: np.ndarray,
    spp: int,
    compression: str,
    predictor: int,
    big_endian: bool,
    rows_per_strip: int,
    photometric: int,
) -> bytes:
    order = ">" if big_endian else "<"
    h, w = img.shape[:2]
    pix = img.reshape(h, w, spp).astype(np.uint8)
    if predictor == 2:
        # first column raw, then mod-256 horizontal deltas per channel
        zero = np.zeros((h, 1, spp), dtype=np.int16)
        pix = np.diff(pix.astype(np.int16), axis=1, prepend=zero).astype(np.uint8)
    comp_id = {"none": 1, "lzw": 5, "packbits": 32773}[compression]
    encoder = {
        "none": lambda b: b,
        "lzw": _lzw_encode,
        "packbits": _packbits_encode,
    }[compression]
    strips = []
    for r0 in range(0, h, rows_per_strip):
        strips.append(encoder(pix[r0 : r0 + rows_per_strip].tobytes()))
    # layout: header | strip data | IFD | out-of-line arrays
    pos = 8
    strip_offs = []
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)
    n_strips = len(strips)
    entries: list[tuple[int, int, int, list[int]]] = [
        (256, 4, 1, [w]),
        (257, 4, 1, [h]),
        (258, 3, spp, [8] * spp),
        (259, 3, 1, [comp_id]),
        (262, 3, 1, [photometric]),
        (273, 4, n_strips, strip_offs),
        (277, 3, 1, [spp]),
        (278, 4, 1, [rows_per_strip]),
        (279, 4, n_strips, [len(s) for s in strips]),
    ]
    if predictor == 2:
        entries.append((317, 3, 1, [predictor]))
    entries.sort()
    ifd_off = pos
    ifd_size = 2 + 12 * len(entries) + 4
    extra_off = ifd_off + ifd_size
    ifd = bytearray(struct.pack(order + "H", len(entries)))
    extra = bytearray()
    for tag, typ, count, vals in entries:
        size = _TYPE_SIZE[typ]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        packed = struct.pack(order + str(count) + fmt, *vals)
        ent = struct.pack(order + "HHI", tag, typ, count)
        if len(packed) <= 4:
            ent += packed + b"\x00" * (4 - len(packed))
        else:
            ent += struct.pack(order + "I", extra_off + len(extra))
            extra += packed
        ifd += ent
    ifd += struct.pack(order + "I", 0)  # next-IFD pointer
    head = (b"II" if not big_endian else b"MM") + struct.pack(order + "HI", 42, ifd_off)
    return head + b"".join(strips) + bytes(ifd) + bytes(extra)


def encode_tiff_gray(
    img: np.ndarray,
    compression: str = "lzw",
    predictor: int = 1,
    big_endian: bool = False,
    rows_per_strip: int = 16,
    white_is_zero: bool = False,
) -> bytes:
    """uint8 HxW -> single-IFD grayscale TIFF (strip layout)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_tiff_gray wants uint8 HxW")
    src = (255 - img) if white_is_zero else img
    return _encode(
        src, 1, compression, predictor, big_endian, rows_per_strip, 0 if white_is_zero else 1
    )


def encode_tiff_rgb(
    img: np.ndarray,
    compression: str = "lzw",
    predictor: int = 1,
    big_endian: bool = False,
    rows_per_strip: int = 16,
) -> bytes:
    """uint8 HxWx3 -> single-IFD RGB TIFF (strip layout)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_tiff_rgb wants uint8 HxWx3")
    return _encode(img, 3, compression, predictor, big_endian, rows_per_strip, 2)
