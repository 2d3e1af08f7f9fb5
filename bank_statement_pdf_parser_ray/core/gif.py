"""From-scratch GIF (GIF87a/GIF89a) codec — pure Python + numpy.

GIF is the third web-native image format next to JPEG and PNG, and the
only one of the three whose compression (LZW, variable-width codes up
to 12 bits) is NOT in the Python standard library — so unlike
``core.png`` the entropy coder is rebuilt here from the published
specification (CompuServe GIF89a spec, 1990; the LZW variant is the
one Welch 1984 describes with GIF's clear/end codes and deferred
width growth).

- ``decode_gif_luma(blob)`` decodes the FIRST image frame of a GIF and
  returns its luma plane as float32 HxW in [0, 1] (palette RGB
  collapsed by channel mean — the house convention shared with the
  PPM/BMP/PNG decoders in ``MediaDecodeActor``). Global and local
  color tables, interlaced row order (the four-pass 8/8/4/2 schedule)
  and arbitrary extension blocks (graphic control, comment,
  application) are handled; animation frames past the first are
  ignored — features over a thumbnail stream don't need them.
- ``encode_gif_gray(img)`` / ``encode_gif_rgb(img)`` emit
  standards-valid GIF89a blobs (any external GIF reader opens them):
  a real LZW encoder with clear-code table resets at 4096 entries,
  sub-block framing, and an optional interlaced layout so a round trip
  exercises the decoder's deinterlace path. The RGB encoder builds an
  exact palette and refuses images with more than 256 distinct colors
  (true-color GIF needs per-frame tiling — out of scope).

LZW is an inherently sequential chain (each code may reference the
entry created by the previous one), so the code loop is per-code
Python — acceptable because corpus thumbnails are small and the actor
pool amortizes everything else; the bitstream unpack itself is one
``int.from_bytes`` + shifts, not a per-bit loop.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "GifUnsupported",
    "decode_gif_luma",
    "encode_gif_gray",
    "encode_gif_rgb",
]

_MAX_CODE = 1 << 12  # GIF caps LZW codes at 12 bits

# interlace pass schedule: (first row, row step) per spec appendix E
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


class GifUnsupported(ValueError):
    """Valid-looking GIF using a feature outside this codec's scope."""


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, npix: int) -> np.ndarray:
    """GIF-variant LZW -> uint8 palette indices (exactly npix of them)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"gif: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    # one big little-endian integer; codes are LSB-first slices of it
    val = int.from_bytes(data, "little")
    nbits = 8 * len(data)
    pos = 0
    out = bytearray()
    prev: bytes | None = None
    while pos + width <= nbits:
        code = (val >> pos) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first code after clear out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
        else:
            raise ValueError("gif: LZW code out of range")
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        out += entry
        prev = entry
        if len(out) >= npix:
            break
    if len(out) < npix:
        raise ValueError("gif: LZW stream ended before the frame was full")
    return np.frombuffer(bytes(out[:npix]), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """uint8 palette indices -> GIF-variant LZW byte stream."""
    clear = 1 << min_code_size
    end = clear + 1
    out_val = 0
    out_bits = 0

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return {bytes([i]): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, width = fresh()

    def emit(code: int, w: int) -> None:
        nonlocal out_val, out_bits
        out_val |= code << out_bits
        out_bits += w

    emit(clear, width)
    w_seq = b""
    for k in indices.tobytes():
        wk = w_seq + bytes([k])
        if wk in table:
            w_seq = wk
            continue
        emit(table[w_seq], width)
        # de-facto standard phase (compress/ppmtogif): the width check
        # uses the slot count BEFORE this emit's assignment, so the
        # decoder (which appends one entry behind) flips width on the
        # same code index
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code < _MAX_CODE:
            table[wk] = next_code
            next_code += 1
        else:  # table full: reset so long streams stay decodable
            emit(clear, width)
            table, next_code, width = fresh()
        w_seq = bytes([k])
    if w_seq:
        emit(table[w_seq], width)
    emit(end, width)
    n = (out_bits + 7) // 8
    return out_val.to_bytes(n, "little")


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _sub_blocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; return (data, new pos)."""
    parts = []
    n = len(blob)
    while True:
        if pos >= n:
            raise ValueError("gif: truncated sub-blocks")
        size = blob[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        if pos + size > n:
            raise ValueError("gif: truncated sub-block")
        parts.append(blob[pos : pos + size])
        pos += size


def _color_table(blob: bytes, pos: int, packed: int) -> tuple[np.ndarray | None, int]:
    if not packed & 0x80:
        return None, pos
    n = 2 << (packed & 0x07)
    end = pos + 3 * n
    if end > len(blob):
        raise ValueError("gif: truncated color table")
    return np.frombuffer(blob, np.uint8, count=3 * n, offset=pos).reshape(n, 3), end


def decode_gif_luma(blob: bytes) -> np.ndarray:
    """Decode the first frame of a GIF -> float32 luma HxW in [0, 1].

    Raises ``ValueError`` on malformed streams and ``GifUnsupported``
    (a ValueError subclass) on valid-but-out-of-scope features, so a
    caller catching ValueError treats both as "not decodable here".
    """
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    if len(blob) < 13:
        raise ValueError("gif: truncated header")
    packed = blob[10]
    gct, pos = _color_table(blob, 13, packed)
    n = len(blob)
    while pos < n:
        marker = blob[pos]
        pos += 1
        if marker == 0x3B:  # trailer before any image
            break
        if marker == 0x21:  # extension: label byte, then sub-blocks
            if pos >= n:
                raise ValueError("gif: truncated extension")
            pos += 1
            _, pos = _sub_blocks(blob, pos)
            continue
        if marker != 0x2C:
            raise ValueError(f"gif: unknown block marker 0x{marker:02x}")
        if pos + 9 > n:
            raise ValueError("gif: truncated image descriptor")
        _left, _top, w, h = struct.unpack_from("<HHHH", blob, pos)
        ipacked = blob[pos + 8]
        pos += 9
        if w <= 0 or h <= 0:
            raise ValueError("gif: empty frame")
        lct, pos = _color_table(blob, pos, ipacked)
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("gif: frame without any color table")
        if pos >= n:
            raise ValueError("gif: missing LZW min code size")
        mcs = blob[pos]
        data, _ = _sub_blocks(blob, pos + 1)
        idx = _lzw_decode(data, mcs, w * h).reshape(h, w)
        if ipacked & 0x40:  # interlaced: four-pass row schedule
            rows = np.concatenate(
                [np.arange(first, h, step) for first, step in _INTERLACE]
            )
            out = np.empty_like(idx)
            out[rows] = idx
            idx = out
        if int(idx.max()) >= len(palette):
            raise ValueError("gif: palette index out of range")
        rgb = palette[idx]
        return rgb.astype(np.float32).mean(axis=2) / 255.0
    raise ValueError("gif: no image frame")


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _encode(idx: np.ndarray, palette: np.ndarray, interlace: bool) -> bytes:
    h, w = idx.shape
    bits = max(2, int(len(palette) - 1).bit_length())
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    if interlace:
        rows = np.concatenate([np.arange(first, h, step) for first, step in _INTERLACE])
        idx = idx[rows]
    mcs = bits
    lzw = _lzw_encode(idx.reshape(-1), mcs)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])  # LSD packed, bg, aspect
    out += pal.tobytes()
    # a graphic-control extension so decoders exercise extension skipping
    out += bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])  # no local table
    out += bytes([mcs])
    for i in range(0, len(lzw), 255):
        part = lzw[i : i + 255]
        out += bytes([len(part)]) + part
    out += bytes([0x00, 0x3B])
    return bytes(out)


def encode_gif_gray(img: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 HxW -> GIF89a with a 256-entry grayscale palette."""
    if img.ndim != 2:
        raise ValueError("gif: gray encoder wants HxW")
    ramp = np.arange(256, dtype=np.uint8)
    palette = np.stack([ramp, ramp, ramp], axis=1)
    return _encode(img.astype(np.uint8), palette, interlace)


def encode_gif_rgb(img: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 HxWx3 -> GIF89a with an exact palette (<=256 colors)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("gif: rgb encoder wants HxWx3")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3).astype(np.uint8)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise GifUnsupported(f"gif: {len(palette)} distinct colors (max 256)")
    return _encode(idx.reshape(h, w).astype(np.uint8), palette, interlace)
