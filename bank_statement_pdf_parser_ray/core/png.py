"""From-scratch PNG (ISO/IEC 15948 / RFC 2083) codec over stdlib zlib.

PNG is the web's dominant lossless image format; DEFLATE — the only
compression PNG uses — ships in the Python standard library (``zlib``),
so unlike JPEG no entropy coder needs rebuilding: the honest work is
the container (chunk framing + CRC32), the five scanline filters, and
the color models.

- ``decode_png_luma(blob)`` decodes a PNG and returns the luma plane
  as float32 in [0, 1]. Color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha) and 6 (RGBA) are supported at every legal bit depth
  (1/2/4-bit gray+palette, 8-bit, 16-bit big-endian), interlaced
  (Adam7, seven independent sub-image passes scattered back on the
  grid) or not; RGB collapses to luma by channel mean (the house
  convention shared with the PPM/BMP decoders in
  ``MediaDecodeActor``). Chunk CRCs are verified. Nothing in the PNG
  core raises ``PngUnsupported`` anymore; the class remains for
  malformed-but-plausible streams callers treat as codec-lib work.
- ``encode_png_gray(img)`` / ``encode_png_rgb(img)`` emit standards-
  valid PNGs whose scanlines cycle through ALL five filter types
  (None/Sub/Up/Average/Paeth keyed on row index), so a round-trip
  through the decoder exercises every unfilter path; any external PNG
  reader opens their output. ``encode_png_gray16`` (16-bit),
  ``encode_png_gray_depth`` (1/2/4-bit) and
  ``encode_png_gray_interlaced`` (Adam7) manufacture fixtures for the
  extended decode paths, pinned LOSSLESS against the source raster.

Scanline unfiltering is vectorized where the data dependency allows:
Up is one whole-row add, Sub is a per-channel-lane cumulative sum
(mod-256 addition is associative, so ``np.cumsum`` on a widened dtype
then ``& 0xFF`` reconstructs the chain in one shot); Average and Paeth
recursions depend on the just-reconstructed left neighbor, so they run
a per-pixel loop over the row — acceptable because rows are short
relative to corpus size and the heavy lifting (DEFLATE) is C-speed in
zlib. Everything here is public knowledge: the PNG spec's filter
definitions (§6) and the sample Paeth predictor.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "PngUnsupported",
    "decode_png_luma",
    "encode_png_gray",
    "encode_png_rgb",
    "encode_png_gray16",
    "encode_png_gray_depth",
    "encode_png_gray_interlaced",
]

_SIG = b"\x89PNG\r\n\x1a\n"
# channels per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# legal bit depths per color type (PNG spec §11.2.2)
_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}
# Adam7 pass origins and steps: (x0, y0, dx, dy)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


class PngUnsupported(ValueError):
    """Valid-looking PNG using a feature outside this codec's scope."""


def _chunks(blob: bytes):
    """Yield (type, data) pairs, verifying each chunk CRC."""
    pos = len(_SIG)
    n = len(blob)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        end = pos + 8 + length
        if end + 4 > n:
            raise ValueError("png: truncated chunk")
        data = blob[pos + 8 : end]
        (crc,) = struct.unpack_from(">I", blob, end)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError("png: chunk crc mismatch")
        yield ctype, data
        pos = end + 4
        if ctype == b"IEND":
            return
    raise ValueError("png: missing IEND")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters. raw = h rows of (1 + stride)
    bytes; ``bpp`` is the filter unit in BYTES (max(1, ch*depth//8) per
    the spec — sub-byte depths filter on whole bytes)."""
    raw = raw.reshape(h, 1 + stride)
    ftypes = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(h):
        f = int(ftypes[y])
        row = raw[y, 1:].astype(np.uint16)
        if f == 0:  # None
            rec = row
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp]
            rec = row.copy()
            for c in range(bpp):
                lane = rec[c::bpp].astype(np.uint64)
                rec[c::bpp] = (np.cumsum(lane) & 0xFF).astype(np.uint16)
        elif f == 2:  # Up
            rec = (row + prev) & 0xFF
        elif f == 3:  # Average — left-neighbor recursion, per-pixel loop
            rec = row
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth — left-neighbor recursion, per-pixel loop
            rec = row
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def _row_bytes(w: int, ch: int, depth: int) -> int:
    return (w * ch * depth + 7) // 8


def _decode_pass(buf: bytes, h: int, w: int, depth: int, ch: int) -> np.ndarray:
    """One (sub-)image's filtered scanlines -> (h, w, ch) uint16 SAMPLE
    array (raw sample values, not yet scaled)."""
    stride = _row_bytes(w, ch, depth)
    bpp = max(1, (ch * depth) // 8)
    raw = np.frombuffer(buf, np.uint8)
    if len(raw) != h * (1 + stride):
        raise ValueError("png: scanline size mismatch")
    un = _unfilter(raw, h, stride, bpp)
    if depth == 8:
        return un.reshape(h, w, ch).astype(np.uint16)
    if depth == 16:
        hi = un[:, 0::2].astype(np.uint16)
        lo = un[:, 1::2].astype(np.uint16)
        return ((hi << 8) | lo).reshape(h, w, ch)
    # sub-byte depths: gray/palette only (ch == 1), MSB-first packing
    bits = np.unpackbits(un, axis=1)[:, : w * depth].reshape(h, w, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    return (bits.astype(np.uint16) * weights).sum(axis=2, dtype=np.uint16)[:, :, None]


def decode_png_luma(blob: bytes) -> np.ndarray:
    """Decode a PNG (any legal depth, Adam7 or not) -> float32 luma
    HxW in [0,1].

    Raises ``ValueError`` on malformed streams (``PngUnsupported`` is a
    ValueError subclass, so a caller catching ValueError treats both as
    "not decodable here").
    """
    if not blob.startswith(_SIG):
        raise ValueError("png: bad signature")
    ihdr = None
    palette: np.ndarray | None = None
    idat = bytearray()
    for ctype, data in _chunks(blob):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if len(data) % 3:
                raise ValueError("png: bad PLTE length")
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
    if ihdr is None:
        raise ValueError("png: missing IHDR")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("png: unknown compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"png: unknown interlace method {interlace}")
    if ctype_n not in _CHANNELS:
        raise ValueError(f"png: bad color type {ctype_n}")
    if depth not in _DEPTHS[ctype_n]:
        raise ValueError(f"png: bit depth {depth} illegal for color type {ctype_n}")
    if w <= 0 or h <= 0 or not idat:
        raise ValueError("png: empty image")
    ch = _CHANNELS[ctype_n]
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        px = _decode_pass(raw, h, w, depth, ch)
    else:  # Adam7: seven sub-images concatenated in the one zlib stream
        px = np.zeros((h, w, ch), dtype=np.uint16)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            nbytes = ph * (1 + _row_bytes(pw, ch, depth))
            px[y0::dy, x0::dx] = _decode_pass(raw[pos : pos + nbytes], ph, pw, depth, ch)
            pos += nbytes
        if pos != len(raw):
            raise ValueError("png: interlaced stream size mismatch")
    if ctype_n == 3:
        if palette is None:
            raise ValueError("png: palette image without PLTE")
        if int(px.max()) >= len(palette):
            raise ValueError("png: palette index out of range")
        rgb = palette[px[:, :, 0]]
        return rgb.astype(np.float32).mean(axis=2) / 255.0
    maxv = float((1 << depth) - 1)
    if ctype_n in (0, 4):  # gray (+alpha: luma ignores alpha)
        return px[:, :, 0].astype(np.float32) / maxv
    return px[:, :, :3].astype(np.float32).mean(axis=2) / maxv  # 2 / 6


def _filter_row(f: int, row: np.ndarray, prev: np.ndarray, ch: int) -> np.ndarray:
    """Apply filter type f to one reconstructed row (encoder side)."""
    r = row.astype(np.int32)
    left = np.zeros_like(r)
    left[ch:] = r[:-ch]
    up = prev.astype(np.int32)
    upleft = np.zeros_like(up)
    upleft[ch:] = up[:-ch]
    if f == 0:
        out = r
    elif f == 1:
        out = r - left
    elif f == 2:
        out = r - up
    elif f == 3:
        out = r - ((left + up) >> 1)
    else:  # Paeth
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))
        out = r - pred
    return (out & 0xFF).astype(np.uint8)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _encode(img: np.ndarray, ctype_n: int) -> bytes:
    ch = _CHANNELS[ctype_n]
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape(h, w * ch).astype(np.uint8)
    lines = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        f = y % 5  # cycle every filter type: decoder coverage by design
        lines.append(f)
        lines.extend(_filter_row(f, flat[y], prev, ch).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_n, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _chunk(b"IEND", b"")
    )


def encode_png_gray(img: np.ndarray) -> bytes:
    """uint8 HxW -> 8-bit grayscale PNG (scanline filters cycle 0..4)."""
    if img.ndim != 2:
        raise ValueError("png: gray encoder wants HxW")
    return _encode(img[:, :, None], 0)


def encode_png_rgb(img: np.ndarray) -> bytes:
    """uint8 HxWx3 -> 8-bit truecolor PNG (scanline filters cycle 0..4)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("png: rgb encoder wants HxWx3")
    return _encode(img, 2)


def _png_container(w: int, h: int, depth: int, ctype_n: int, interlace: int, lines: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype_n, 0, 0, interlace)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(lines, 6))
        + _chunk(b"IEND", b"")
    )


def _filter_lines(rows: np.ndarray, bpp: int) -> bytes:
    """Filter a (h, stride)-byte raster, cycling all five filter types."""
    lines = bytearray()
    prev = np.zeros(rows.shape[1], dtype=np.uint8)
    for y in range(rows.shape[0]):
        f = y % 5
        lines.append(f)
        lines.extend(_filter_row(f, rows[y], prev, bpp).tobytes())
        prev = rows[y]
    return bytes(lines)


def encode_png_gray16(img: np.ndarray) -> bytes:
    """uint16 HxW -> 16-bit grayscale PNG (big-endian samples; filters
    cycle 0..4 with the 2-byte filter unit). Lossless fixture for the
    deep-depth decode path."""
    if img.ndim != 2 or img.dtype != np.uint16:
        raise ValueError("png: gray16 encoder wants uint16 HxW")
    h, w = img.shape
    rows = np.ascontiguousarray(img.astype(">u2")).view(np.uint8).reshape(h, 2 * w)
    return _png_container(w, h, 16, 0, 0, _filter_lines(rows, 2))


def encode_png_gray_depth(img: np.ndarray, depth: int) -> bytes:
    """uint8 HxW with values < 2**depth -> 1/2/4-bit grayscale PNG
    (MSB-first packing; filters cycle on the byte rows)."""
    if depth not in (1, 2, 4):
        raise ValueError("png: sub-byte encoder wants depth 1, 2 or 4")
    if img.ndim != 2 or int(img.max(initial=0)) >= (1 << depth):
        raise ValueError(f"png: values must fit {depth} bits")
    h, w = img.shape
    bits = (
        (img[:, :, None].astype(np.uint8) >> np.arange(depth - 1, -1, -1)[None, None, :]) & 1
    ).reshape(h, w * depth)
    rows = np.packbits(bits, axis=1)  # pads the row tail with zero bits
    return _png_container(w, h, depth, 0, 0, _filter_lines(rows, 1))


def encode_png_gray_interlaced(img: np.ndarray) -> bytes:
    """uint8 HxW -> Adam7-interlaced 8-bit grayscale PNG: each of the
    seven passes is filtered independently (cycling filters), all
    passes concatenated into the one zlib stream per the spec."""
    if img.ndim != 2:
        raise ValueError("png: interlaced encoder wants HxW")
    h, w = img.shape
    lines = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        lines.extend(_filter_lines(np.ascontiguousarray(sub, dtype=np.uint8), 1))
    return _png_container(w, h, 8, 0, 1, bytes(lines))
