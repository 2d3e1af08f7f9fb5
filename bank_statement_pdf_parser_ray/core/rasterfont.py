"""5x7 bitmap font: rasterize text pages to binary PGM and OCR them back.

The reference's scanned-statement path implies an OCR fallback
(BASELINE.json north_star: "actor pools holding warm parser state
(... OCR fallbacks)"). No OCR library ships in this environment, so the
fallback is a from-scratch fixed-pitch template matcher over the same
bitmap font the corpus rasterizer uses:

- ``render_page(text)`` draws each character into a 6x9 cell (5x7
  glyph + 1px column gap + 2px line gap) on a white page, black ink,
  and emits binary PGM (P5) bytes.
- ``ocr_page(pgm)`` segments the fixed-pitch grid back into cells,
  thresholds, and matches each cell's 35-bit signature against the
  font's inverse map — exact template matching, the trivial-but-real
  OCR any fixed-font raster permits. Unknown glyphs come back as ``?``.
- ``rasterize_payload(text)`` / raster payload detection wrap the PGM
  in a base64 envelope with a leading marker line so scanned pages can
  travel through the engine's ``text`` column (input_hint schema has no
  binary column; real deployments would use one).

Uppercase, digits and punctuation are handcrafted; lowercase glyphs are
the uppercase forms dropped one row (a lowered baseline), which keeps
every bitmap distinct — asserted by tests — without 26 more drawings.
"""

from __future__ import annotations

import base64
import binascii

import numpy as np

RASTER_MARKER = "%PGM-PAGE-B64%"

CELL_W, CELL_H = 6, 9  # 5x7 glyph + 1px gap right + 2px gap below

# fmt: off
_ART: dict[str, str] = {
    "A": ".XXX. X...X X...X XXXXX X...X X...X X...X",
    "B": "XXXX. X...X XXXX. X...X X...X X...X XXXX.",
    "C": ".XXX. X...X X.... X.... X.... X...X .XXX.",
    "D": "XXXX. X...X X...X X...X X...X X...X XXXX.",
    "E": "XXXXX X.... XXXX. X.... X.... X.... XXXXX",
    "F": "XXXXX X.... XXXX. X.... X.... X.... X....",
    "G": ".XXX. X...X X.... X.XXX X...X X...X .XXX.",
    "H": "X...X X...X XXXXX X...X X...X X...X X...X",
    "I": "XXXXX ..X.. ..X.. ..X.. ..X.. ..X.. XXXXX",
    "J": "..XXX ...X. ...X. ...X. ...X. X..X. .XX..",
    "K": "X...X X..X. XXX.. X.X.. X..X. X...X X...X",
    "L": "X.... X.... X.... X.... X.... X.... XXXXX",
    "M": "X...X XX.XX X.X.X X.X.X X...X X...X X...X",
    "N": "X...X XX..X X.X.X X..XX X...X X...X X...X",
    "O": ".XXX. X...X X...X X...X X...X X...X .XXX.",
    "P": "XXXX. X...X X...X XXXX. X.... X.... X....",
    "Q": ".XXX. X...X X...X X...X X.X.X X..X. .XX.X",
    "R": "XXXX. X...X X...X XXXX. X.X.. X..X. X...X",
    "S": ".XXXX X.... X.... .XXX. ....X ....X XXXX.",
    "T": "XXXXX ..X.. ..X.. ..X.. ..X.. ..X.. ..X..",
    "U": "X...X X...X X...X X...X X...X X...X .XXX.",
    "V": "X...X X...X X...X X...X X...X .X.X. ..X..",
    "W": "X...X X...X X...X X.X.X X.X.X XX.XX X...X",
    "X": "X...X X...X .X.X. ..X.. .X.X. X...X X...X",
    "Y": "X...X X...X .X.X. ..X.. ..X.. ..X.. ..X..",
    "Z": "XXXXX ....X ...X. ..X.. .X... X.... XXXXX",
    "0": ".XXX. X...X X..XX X.X.X XX..X X...X .XXX.",
    "1": "..X.. .XX.. ..X.. ..X.. ..X.. ..X.. .XXX.",
    "2": ".XXX. X...X ....X ...X. ..X.. .X... XXXXX",
    "3": "XXXXX ...X. ..X.. ...X. ....X X...X .XXX.",
    "4": "...X. ..XX. .X.X. X..X. XXXXX ...X. ...X.",
    "5": "XXXXX X.... XXXX. ....X ....X X...X .XXX.",
    "6": "..XX. .X... X.... XXXX. X...X X...X .XXX.",
    "7": "XXXXX ....X ...X. ..X.. .X... .X... .X...",
    "8": ".XXX. X...X X...X .XXX. X...X X...X .XXX.",
    "9": ".XXX. X...X X...X .XXXX ....X ...X. .XX..",
    ".": "..... ..... ..... ..... ..... .XX.. .XX..",
    ",": "..... ..... ..... ..... .XX.. ..X.. .X...",
    ":": "..... .XX.. .XX.. ..... .XX.. .XX.. .....",
    ";": "..... .XX.. .XX.. ..... .XX.. ..X.. .X...",
    "'": "..X.. ..X.. ..... ..... ..... ..... .....",
    '"': ".X.X. .X.X. ..... ..... ..... ..... .....",
    "-": "..... ..... ..... XXXXX ..... ..... .....",
    "_": "..... ..... ..... ..... ..... ..... XXXXX",
    "/": "....X ....X ...X. ..X.. .X... X.... X....",
    "\\": "X.... X.... .X... ..X.. ...X. ....X ....X",
    "|": "..X.. ..X.. ..X.. ..X.. ..X.. ..X.. ..X..",
    "(": "...X. ..X.. .X... .X... .X... ..X.. ...X.",
    ")": ".X... ..X.. ...X. ...X. ...X. ..X.. .X...",
    "[": ".XXX. .X... .X... .X... .X... .X... .XXX.",
    "]": ".XXX. ...X. ...X. ...X. ...X. ...X. .XXX.",
    "+": "..... ..X.. ..X.. XXXXX ..X.. ..X.. .....",
    "*": "..... X.X.X .XXX. XXXXX .XXX. X.X.X .....",
    "=": "..... ..... XXXXX ..... XXXXX ..... .....",
    "$": "..X.. .XXXX X.X.. .XXX. ..X.X XXXX. ..X..",
    "%": "XX..X XX..X ...X. ..X.. .X... X..XX X..XX",
    "&": ".XX.. X..X. X.X.. .X... X.X.X X..X. .XX.X",
    "#": ".X.X. .X.X. XXXXX .X.X. XXXXX .X.X. .X.X.",
    "@": ".XXX. X...X X.XXX X.X.X X.XX. X.... .XXXX",
    "!": "..X.. ..X.. ..X.. ..X.. ..X.. ..... ..X..",
    "?": ".XXX. X...X ....X ...X. ..X.. ..... ..X..",
    "<": "...X. ..X.. .X... X.... .X... ..X.. ...X.",
    ">": ".X... ..X.. ...X. ....X ...X. ..X.. .X...",
    # form feed: statements carry \x0c page breaks; a scanner's page
    # separator mark, so OCR recovers the page structure exactly
    "\x0c": "XXXXX ..... XXXXX ..... XXXXX ..... XXXXX",
}
# fmt: on


def _bitmap(art: str) -> np.ndarray:
    rows = art.split()
    assert len(rows) == 7 and all(len(r) == 5 for r in rows), art
    return np.array([[c == "X" for c in r] for r in rows], dtype=bool)


def _build_font() -> dict[str, np.ndarray]:
    font: dict[str, np.ndarray] = {" ": np.zeros((7, 5), dtype=bool)}
    for ch, art in _ART.items():
        font[ch] = _bitmap(art)
    for ch in "abcdefghijklmnopqrstuvwxyz":
        # lowered baseline, bottom row wrapping to the top: a rotation
        # is bijective, so letters that differ only in their last row
        # (E/F, O/Q) stay distinct in lowercase too
        font[ch] = np.roll(font[ch.upper()], 1, axis=0)
    return font


FONT: dict[str, np.ndarray] = _build_font()

_UNKNOWN = _bitmap("X.X.X .X.X. X.X.X .X.X. X.X.X .X.X. X.X.X")  # checkerboard


def _signature(cell: np.ndarray) -> int:
    """35-bit integer signature of one 7x5 boolean glyph cell."""
    return int.from_bytes(np.packbits(cell.reshape(-1)).tobytes(), "big")


# signature -> char, built once; the checkerboard maps to '?'
_SIG_TO_CHAR: dict[int, str] = {}
for _ch, _bm in FONT.items():
    _SIG_TO_CHAR.setdefault(_signature(_bm), _ch)
_SIG_TO_CHAR.setdefault(_signature(_UNKNOWN), "?")


def render_page(text: str) -> bytes:
    """Rasterize a text page into binary PGM: black 5x7 glyphs on a
    fixed-pitch 6x9 grid, white background. Tabs are not expanded;
    characters without a glyph draw the checkerboard (OCR returns ?)."""
    lines = text.split("\n")
    n_cols = max((len(ln) for ln in lines), default=0) or 1
    h = CELL_H * max(len(lines), 1)
    w = CELL_W * n_cols
    page = np.full((h, w), 255, dtype=np.uint8)
    for li, ln in enumerate(lines):
        y0 = li * CELL_H
        for ci, ch in enumerate(ln):
            glyph = FONT.get(ch, _UNKNOWN)
            x0 = ci * CELL_W
            cell = page[y0 : y0 + 7, x0 : x0 + 5]
            cell[glyph] = 0
    return b"P5 %d %d 255\n" % (w, h) + page.tobytes()


def parse_pgm(blob: bytes) -> "np.ndarray | None":
    """Minimal binary-P5 parse -> uint8 HxW, or None."""
    if blob[:2] != b"P5":
        return None
    toks: list[bytes] = []
    pos = 2
    while len(toks) < 3 and pos < len(blob):
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
    pos += 1
    try:
        w, h, maxval = (int(x) for x in toks)
    except ValueError:
        return None
    if w <= 0 or h <= 0 or maxval > 255:
        return None
    data = np.frombuffer(blob, dtype=np.uint8, count=min(w * h, len(blob) - pos), offset=pos)
    if len(data) < w * h:
        return None
    return data.reshape(h, w)


def ocr_page(blob: bytes) -> str:
    """Fixed-pitch template OCR: threshold, cut the 6x9 grid, match each
    cell's 35-bit signature against the font. Trailing spaces are
    stripped per line (render_page never draws them anyway).

    Accepts binary-P5 PGM or baseline TIFF (``core.tiff`` — scanned
    statements in the wild ship as TIFF); anything else OCRs to ""."""
    img = _page_gray(blob)
    if img is None:
        return ""
    ink = img < 128
    h, w = ink.shape
    n_rows, n_cols = h // CELL_H, w // CELL_W
    lines: list[str] = []
    for li in range(n_rows):
        y0 = li * CELL_H
        chars: list[str] = []
        for ci in range(n_cols):
            x0 = ci * CELL_W
            cell = ink[y0 : y0 + 7, x0 : x0 + 5]
            if cell.shape != (7, 5):
                break
            chars.append(_SIG_TO_CHAR.get(_signature(cell), "?"))
        lines.append("".join(chars).rstrip())
    return "\n".join(lines)


def _page_gray(blob: bytes) -> "np.ndarray | None":
    """Page bytes -> uint8 HxW: PGM or baseline TIFF, else None."""
    if not blob:
        return None
    if blob[:2] == b"P5":
        return parse_pgm(blob)
    if blob[:4] in (b"II*\x00", b"MM\x00*"):
        from bank_statement_pdf_parser_ray.core.tiff import decode_tiff_luma

        try:
            return (decode_tiff_luma(blob) * 255.0).round().astype(np.uint8)
        except ValueError:
            return None
    return None


def render_page_tiff(text: str) -> bytes:
    """Rasterize like ``render_page`` but emit a scanned-statement-style
    TIFF: LZW + horizontal predictor, WhiteIsZero photometric (the
    bilevel-scanner convention) — exercising the core.tiff decode path
    end-to-end through the flagship OCR route."""
    from bank_statement_pdf_parser_ray.core.tiff import encode_tiff_gray

    pgm = render_page(text)
    img = parse_pgm(pgm)
    assert img is not None
    return encode_tiff_gray(img, compression="lzw", predictor=2, white_is_zero=True)


def rasterize_payload(text: str, fmt: str = "pgm") -> str:
    """Wrap a rasterized page in the base64 text envelope the sniffer
    recognizes (scanned-page stand-in for a binary column). ``fmt``
    picks the page format: "pgm" (default) or "tiff"."""
    page = render_page_tiff(text) if fmt == "tiff" else render_page(text)
    return RASTER_MARKER + "\n" + base64.b64encode(page).decode("ascii")


def raster_payload_pgm(payload: str) -> "bytes | None":
    """Extract PGM bytes from an envelope payload, or None."""
    if not payload.startswith(RASTER_MARKER):
        return None
    try:
        return base64.b64decode(payload[len(RASTER_MARKER) :].strip(), validate=True)
    except (binascii.Error, ValueError):
        return None
