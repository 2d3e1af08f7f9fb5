"""From-scratch PNG (ISO/IEC 15948 / RFC 2083) codec over stdlib zlib.

PNG is the web's dominant lossless image format; DEFLATE — the only
compression PNG uses — ships in the Python standard library (``zlib``),
so unlike JPEG no entropy coder needs rebuilding: the honest work is
the container (chunk framing + CRC32), the five scanline filters, and
the color models.

- ``decode_png_luma(blob)`` decodes a non-interlaced 8-bit PNG and
  returns the luma plane as float32 in [0, 1]. Color types 0 (gray),
  2 (RGB), 3 (palette), 4 (gray+alpha) and 6 (RGBA) are supported; RGB
  collapses to luma by channel mean (the house convention shared with
  the PPM/BMP decoders in ``MediaDecodeActor``). Chunk CRCs are
  verified. Adam7 interlace, 16-bit depth and sub-byte depths raise
  ``PngUnsupported`` — callers treat that as "needs a codec lib".
- ``encode_png_gray(img)`` / ``encode_png_rgb(img)`` emit standards-
  valid PNGs whose scanlines cycle through ALL five filter types
  (None/Sub/Up/Average/Paeth keyed on row index), so a round-trip
  through the decoder exercises every unfilter path; any external PNG
  reader opens their output.

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
]

_SIG = b"\x89PNG\r\n\x1a\n"
# channels per pixel by color type (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


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


def _unfilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse the per-scanline filters. raw = h rows of (1 + w*ch)."""
    stride = w * ch
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
            for c in range(ch):
                lane = rec[c::ch].astype(np.uint64)
                rec[c::ch] = (np.cumsum(lane) & 0xFF).astype(np.uint16)
        elif f == 2:  # Up
            rec = (row + prev) & 0xFF
        elif f == 3:  # Average — left-neighbor recursion, per-pixel loop
            rec = row
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                rec[x] = (rec[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth — left-neighbor recursion, per-pixel loop
            rec = row
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_png_luma(blob: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG -> float32 luma HxW in [0,1].

    Raises ``ValueError`` on malformed streams and ``PngUnsupported``
    (a ValueError subclass) on valid-but-out-of-scope features, so a
    caller catching ValueError treats both as "not decodable here".
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
    if interlace != 0:
        raise PngUnsupported("png: Adam7 interlace")
    if depth != 8:
        raise PngUnsupported(f"png: bit depth {depth}")
    if ctype_n not in _CHANNELS:
        raise ValueError(f"png: bad color type {ctype_n}")
    if w <= 0 or h <= 0 or not idat:
        raise ValueError("png: empty image")
    ch = _CHANNELS[ctype_n]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if len(raw) != h * (1 + w * ch):
        raise ValueError("png: scanline size mismatch")
    px = _unfilter(raw, h, w, ch).reshape(h, w, ch)
    if ctype_n == 3:
        if palette is None:
            raise ValueError("png: palette image without PLTE")
        if int(px.max()) >= len(palette):
            raise ValueError("png: palette index out of range")
        rgb = palette[px[:, :, 0]]
        return rgb.astype(np.float32).mean(axis=2) / 255.0
    if ctype_n == 0:
        return px[:, :, 0].astype(np.float32) / 255.0
    if ctype_n == 4:  # gray + alpha: luma ignores alpha
        return px[:, :, 0].astype(np.float32) / 255.0
    return px[:, :, :3].astype(np.float32).mean(axis=2) / 255.0  # 2 / 6


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
