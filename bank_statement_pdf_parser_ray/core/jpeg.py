"""From-scratch baseline JPEG (ITU-T T.81) codec in pure numpy.

The build environment ships no codec libraries, yet a real multimodal
corpus is overwhelmingly JPEG — so the multimodal decode path
(``MediaDecodeActor``) gets a real compressed format here rather than a
stub: baseline sequential DCT, Huffman entropy coding, 8-bit precision.

- ``decode_jpeg_luma(blob)`` decodes a baseline (SOF0/1) or PROGRESSIVE
  (SOF2) JFIF stream and returns the luma plane as float32 in [0, 1].
  Grayscale (1 component) and YCbCr (3 components, any sampling factors
  up to 2x2 — 4:4:4 / 4:2:2 / 4:2:0) are supported; chroma blocks are
  entropy-decoded to keep the bitstream aligned but skip the IDCT.
  Restart markers (DRI/RSTn) are honored. Progressive covers both
  spectral selection and successive approximation (T.81 G.1.2: DC
  first/refine, AC first with EOBn runs, AC refinement with embedded
  correction bits); progressive chroma AC scans are skipped whole
  (each is its own entropy segment, so alignment is preserved).
  Arithmetic coding and 12-bit precision raise ``JpegUnsupported`` —
  callers treat that as "needs a codec lib".
- ``encode_jpeg_gray(img, quality)`` emits a standards-valid grayscale
  baseline JPEG (Annex K quantization + Huffman tables, IJG quality
  scaling); ``encode_jpeg_gray_progressive`` emits the same quantized
  coefficients as a 6-scan progressive stream (DC 2 passes, two AC
  spectral bands x 2 successive-approximation passes), so progressive
  decode is pinned BIT-IDENTICAL to baseline decode on the same input.
  They exist so tests and the synthetic corpus can manufacture REAL
  JPEG bytes deterministically; any external decoder reads the output.

Everything is public knowledge: ITU-T T.81 (1992) Annexes F/G/K and the
IJG quality-scaling formula. The DCT is the exact orthonormal DCT-II
via an 8x8 cosine matrix (float64), applied to all blocks of an image
in one einsum — the per-symbol Huffman loop is the only Python loop.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "JpegUnsupported",
    "decode_jpeg_luma",
    "encode_jpeg_gray",
    "encode_jpeg_gray_progressive",
    "encode_jpeg_color420",
    "quant_table",
]


class JpegUnsupported(ValueError):
    """Stream is JPEG but uses features outside baseline sequential."""


# --- constants (T.81 Annex K) ------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_BASE_LUMA_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

# standard luminance Huffman tables (Annex K.3): BITS[1..16] then values
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix M: coeffs = M @ block @ M.T."""
    x = np.arange(8, dtype=np.float64)
    m = np.cos((2.0 * x[None, :] + 1.0) * x[:, None] * np.pi / 16.0)
    m *= np.sqrt(2.0 / 8.0)
    m[0, :] = np.sqrt(1.0 / 8.0)
    return m


_DCT_M = _dct_matrix()


def quant_table(quality: int) -> np.ndarray:
    """IJG quality scaling of the Annex K.1 luminance table (raster order)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((_BASE_LUMA_Q * scale + 50) // 100, 1, 255).astype(np.int64)


# --- Huffman machinery -------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_lut(bits: list[int], vals: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-peek lookup tables: peek -> (symbol, code length).

    65536 int16 entries per table; length 0 marks an invalid prefix.
    Turns per-symbol decoding into one table gather instead of a
    bit-by-bit tree walk.
    """
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym, ln


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            # past-the-end pads with 1s (T.81 F.2.2.5 marker-detection pad)
            b = self.data[self.pos] if self.pos < len(self.data) else 0xFF
            self.pos += 1
            self.buf = (self.buf << 8) | b
            self.nbits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.buf >> (self.nbits - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.nbits -= k
        self.buf &= (1 << self.nbits) - 1

    def get(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill(k)
        v = (self.buf >> (self.nbits - k)) & ((1 << k) - 1)
        self.skip(k)
        return v


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


# --- decoder -----------------------------------------------------------------


def decode_jpeg_luma(blob: bytes) -> np.ndarray:
    """Decode a baseline or progressive JPEG; return luma as float32
    HxW in [0, 1].

    Raises ``JpegUnsupported`` for unsupported coding processes and
    ``ValueError`` for corrupt streams.
    """
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) ; comps = [(cid, hs, vs, tq)]
    progressive = False
    prog = None  # _ProgState once the first progressive SOS is seen
    n = len(blob)
    while pos < n:
        if blob[pos] != 0xFF:
            raise ValueError(f"marker sync lost at byte {pos}")
        if pos + 1 >= n:
            # A lone trailing 0xFF (truncated stream): IndexError here
            # would escape MediaDecodeActor's ValueError fallback and
            # crash the decode task instead of yielding a None row.
            raise ValueError("truncated JPEG stream (lone 0xFF at EOF)")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / bare RSTn
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", blob, pos)[0]
        body = blob[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise JpegUnsupported("16-bit quantization tables")
                z = np.frombuffer(body, dtype=np.uint8, count=64, offset=off + 1)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = z  # file stores zigzag order -> raster
                qtabs[tq] = tbl
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                huff[(tc, th)] = _decode_lut(bits, vals)
                off += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = body[0], struct.unpack_from(">H", body, 1)[0], struct.unpack_from(">H", body, 3)[0], body[5]
            if prec != 8:
                raise JpegUnsupported(f"{prec}-bit precision")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci], body[7 + 3 * ci], body[8 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegUnsupported(f"SOF{marker - 0xC0} (non-baseline coding)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []  # (comp_index, dc_table, ac_table)
            comp_ids = [c[0] for c in frame[2]]
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan.append((comp_ids.index(cs), tt >> 4, tt & 0x0F))
            data_start = pos + seg_len
            if not progressive:
                return _decode_scan(blob, data_start, frame, scan, qtabs, huff, restart_interval)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            segments, end_pos = _split_entropy(blob, data_start)
            if prog is None:
                prog = _ProgState(frame)
            prog.decode_scan(scan, ss, se, ah, al, segments, huff, restart_interval)
            pos = end_pos
            continue
        pos += seg_len
    if progressive and prog is not None:
        return prog.output(qtabs)
    raise ValueError("no SOS marker in stream")


def _split_entropy(blob: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from `start` to the next real marker, split on
    RSTn boundaries, with 0xFF00 byte stuffing removed — one de-stuffed
    buffer per restart interval (one buffer total when DRI is unused).
    Also returns the byte position of the terminating marker so a
    multi-scan (progressive) parse can continue from there."""
    segments: list[bytes] = []
    cur = bytearray()
    pos = start
    n = len(blob)
    while pos < n:
        b = blob[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = blob[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed 0xFF data byte
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: interval boundary
            segments.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # any real marker ends the scan
            break
    segments.append(bytes(cur))
    return segments, min(pos, n)


def _decode_scan(blob, data_start, frame, scan, qtabs, huff, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    segments, _ = _split_entropy(blob, data_start)
    # luma component geometry
    li = 0  # luma is always the first frame component
    lci, lhs, lvs = li, comps[li][1], comps[li][2]
    luma_bw = mcux * lhs  # luma blocks across
    luma_bh = mcuy * lvs
    luma_coefs = np.zeros((luma_bh * luma_bw, 64), dtype=np.int64)
    dc_pred = [0] * len(comps)
    reader = _BitReader(segments[0])
    seg_idx = 0
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                seg_idx += 1
                reader = _BitReader(segments[seg_idx])
                dc_pred = [0] * len(comps)
            for ci, dc_t, ac_t in scan:
                _, hs, vs, tq = comps[ci]
                q = qtabs[tq]
                dsym, dlen = huff[(0, dc_t)]
                asym, alen = huff[(1, ac_t)]
                for by in range(vs):
                    for bx in range(hs):
                        coefs = _decode_block(reader, dsym, dlen, asym, alen)
                        dc_pred[ci] += coefs[0]
                        coefs[0] = dc_pred[ci]
                        if ci == lci:
                            row = my * lvs + by
                            col = mx * lhs + bx
                            zz = np.zeros(64, dtype=np.int64)
                            zz[ZIGZAG] = coefs
                            luma_coefs[row * luma_bw + col] = zz * q[: len(q)]
            mcu += 1
    # luma plane covers ceil(w*hs/hmax) x ceil(h*vs/vmax) source samples
    lw = -(-w * lhs // hmax)
    lh = -(-h * lvs // vmax)
    return _idct_luma(luma_coefs, luma_bh, luma_bw, lh, lw)


def _idct_luma(luma_coefs: np.ndarray, luma_bh: int, luma_bw: int, lh: int, lw: int) -> np.ndarray:
    """(n_blocks, 64) DEQUANTIZED raster-order coefficients -> float32
    luma plane in [0, 1] — one vectorized IDCT over every block."""
    blocks = luma_coefs.reshape(-1, 8, 8).astype(np.float64)
    # plain chained matmul keeps the contraction order pinned so the
    # rounded output is reproducible bit-for-bit across numpy builds
    pix = _DCT_M.T @ blocks @ _DCT_M + 128.0
    pix = np.clip(np.round(pix), 0, 255)
    img = (
        pix.reshape(luma_bh, luma_bw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(luma_bh * 8, luma_bw * 8)
    )
    return (img[:lh, :lw] / 255.0).astype(np.float32)


def _decode_block(reader: _BitReader, dsym, dlen, asym, alen) -> np.ndarray:
    """One 8x8 block -> 64 zigzag-order coefficients (DC is the DIFF)."""
    out = np.zeros(64, dtype=np.int64)
    p = reader.peek16()
    ln = int(dlen[p])
    if ln == 0:
        raise ValueError("invalid DC Huffman prefix")
    reader.skip(ln)
    t = int(dsym[p])
    out[0] = _extend(reader.get(t), t)
    k = 1
    while k < 64:
        p = reader.peek16()
        ln = int(alen[p])
        if ln == 0:
            raise ValueError("invalid AC Huffman prefix")
        reader.skip(ln)
        rs = int(asym[p])
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        out[k] = _extend(reader.get(s), s)
        k += 1
    return out


# --- progressive decoder (T.81 Annex G.1.2) ----------------------------------


class _ProgState:
    """Cross-scan coefficient accumulator for progressive (SOF2) decode.

    Stores QUANTIZED coefficients in zigzag order per component block;
    each SOS merges its (spectral band, bit plane) contribution; the
    IDCT runs once at EOI. Chroma coefficients are stored for DC scans
    (interleaved DC must consume their bits to stay aligned) but chroma
    AC scans are skipped whole — every progressive AC scan is single-
    component with its own entropy segment, so skipping costs nothing.
    """

    def __init__(self, frame) -> None:
        h, w, comps = frame
        self.frame = frame
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        self.coef: dict[int, np.ndarray] = {}
        for ci, (_cid, hs, vs, _tq) in enumerate(comps):
            self.coef[ci] = np.zeros((self.mcuy * vs * self.mcux * hs, 64), dtype=np.int64)
        self.eobrun = 0

    def _grid(self, ci: int) -> tuple[int, int]:
        """Non-interleaved block grid (rows, cols) of one component:
        ceil of the component's sample dims over 8 (T.81 A.2.2)."""
        h, w, comps = self.frame
        _, hs, vs, _ = comps[ci]
        ch = -(-h * vs // self.vmax)
        cw = -(-w * hs // self.hmax)
        return -(-ch // 8), -(-cw // 8)

    def decode_scan(self, scan, ss, se, ah, al, segments, huff, ri) -> None:
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan with Se != 0")
            self._dc_scan(scan, ah, al, segments, huff, ri)
        else:
            if len(scan) != 1:
                raise ValueError("progressive AC scan must be single-component")
            if scan[0][0] != 0:
                return  # chroma AC never reaches the luma output
            self._ac_scan(scan[0], ss, se, ah, al, segments, huff, ri)

    # -- DC scans --------------------------------------------------------------

    def _dc_block(self, reader, arr, idx, ci, dc_t, ah, al, preds, huff) -> None:
        if ah == 0:
            dsym, dlen = huff[(0, dc_t)]
            p = reader.peek16()
            ln = int(dlen[p])
            if ln == 0:
                raise ValueError("invalid DC Huffman prefix")
            reader.skip(ln)
            t = int(dsym[p])
            preds[ci] += _extend(reader.get(t), t)
            arr[idx, 0] = preds[ci] << al
        else:  # refinement: one appended magnitude bit per block
            arr[idx, 0] += reader.get(1) << al

    def _dc_scan(self, scan, ah, al, segments, huff, ri) -> None:
        h, w, comps = self.frame
        preds = [0] * len(comps)
        reader = _BitReader(segments[0])
        seg_idx = 0
        cnt = 0
        if len(scan) > 1:  # interleaved: MCU grid, every scan component
            for my in range(self.mcuy):
                for mx in range(self.mcux):
                    if ri and cnt and cnt % ri == 0:
                        seg_idx += 1
                        reader = _BitReader(segments[seg_idx])
                        preds = [0] * len(comps)
                    for ci, dc_t, _ in scan:
                        _, hs, vs, _tq = comps[ci]
                        bw = self.mcux * hs
                        for by in range(vs):
                            for bx in range(hs):
                                idx = (my * vs + by) * bw + (mx * hs + bx)
                                self._dc_block(reader, self.coef[ci], idx, ci, dc_t, ah, al, preds, huff)
                    cnt += 1
        else:  # single-component: the component's own (unpadded) grid
            ci, dc_t, _ = scan[0]
            bh_eff, bw_eff = self._grid(ci)
            bw = self.mcux * comps[ci][1]
            for byi in range(bh_eff):
                for bxi in range(bw_eff):
                    if ri and cnt and cnt % ri == 0:
                        seg_idx += 1
                        reader = _BitReader(segments[seg_idx])
                        preds = [0] * len(comps)
                    self._dc_block(reader, self.coef[ci], byi * bw + bxi, ci, dc_t, ah, al, preds, huff)
                    cnt += 1

    # -- AC scans --------------------------------------------------------------

    def _ac_scan(self, sc, ss, se, ah, al, segments, huff, ri) -> None:
        ci, _, ac_t = sc
        asym, alen = huff[(1, ac_t)]
        bh_eff, bw_eff = self._grid(ci)
        bw = self.mcux * self.frame[2][ci][1]
        arr = self.coef[ci]
        reader = _BitReader(segments[0])
        seg_idx = 0
        self.eobrun = 0
        cnt = 0
        for byi in range(bh_eff):
            for bxi in range(bw_eff):
                if ri and cnt and cnt % ri == 0:
                    seg_idx += 1
                    reader = _BitReader(segments[seg_idx])
                    self.eobrun = 0
                row = arr[byi * bw + bxi]
                if ah == 0:
                    self._ac_first(reader, row, ss, se, al, asym, alen)
                else:
                    self._ac_refine(reader, row, ss, se, al, asym, alen)
                cnt += 1

    def _ac_first(self, reader, row, ss, se, al, asym, alen) -> None:
        """G.1.2.2: first AC scan of a band — values at bit plane Al,
        zero runs, ZRL, and EOBn end-of-band runs."""
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        k = ss
        while k <= se:
            p = reader.peek16()
            ln = int(alen[p])
            if ln == 0:
                raise ValueError("invalid AC Huffman prefix")
            reader.skip(ln)
            rs = int(asym[p])
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL: 16 zero coefficients
                    k += 16
                    continue
                self.eobrun = (1 << r) - 1  # EOBn: this band + eobrun more
                if r:
                    self.eobrun += reader.get(r)
                break
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            row[k] = _extend(reader.get(s), s) << al
            k += 1

    def _ac_refine(self, reader, row, ss, se, al, asym, alen) -> None:
        """G.1.2.3: AC successive-approximation refinement — newly
        nonzero coefficients arrive as ±1<<Al; previously nonzero ones
        take one embedded correction bit each, read in positional order
        while walking runs and end-of-band spans."""
        p1 = 1 << al
        k = ss
        if self.eobrun == 0:
            while k <= se:
                p = reader.peek16()
                ln = int(alen[p])
                if ln == 0:
                    raise ValueError("invalid AC Huffman prefix")
                reader.skip(ln)
                rs = int(asym[p])
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r != 15:
                        self.eobrun = 1 << r
                        if r:
                            self.eobrun += reader.get(r)
                        break
                    val = 0  # ZRL: span 16 zero-history coefficients
                elif s == 1:
                    val = p1 if reader.get(1) else -p1
                else:
                    raise ValueError("AC refinement magnitude > 1")
                while k <= se:
                    c = int(row[k])
                    if c != 0:
                        if reader.get(1) and (abs(c) & p1) == 0:
                            row[k] = c + (p1 if c > 0 else -p1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val != 0 and k <= se:
                    row[k] = val
                k += 1
        if self.eobrun > 0:
            while k <= se:  # end-of-band span: correction bits only
                c = int(row[k])
                if c != 0:
                    if reader.get(1) and (abs(c) & p1) == 0:
                        row[k] = c + (p1 if c > 0 else -p1)
                k += 1
            self.eobrun -= 1

    def output(self, qtabs) -> np.ndarray:
        h, w, comps = self.frame
        _, lhs, lvs, tq = comps[0]
        zig = self.coef[0]
        ras = np.zeros_like(zig)
        ras[:, ZIGZAG] = zig
        coefs = ras * qtabs[tq][None, :]
        luma_bh, luma_bw = self.mcuy * lvs, self.mcux * lhs
        lw = -(-w * lhs // self.hmax)
        lh = -(-h * lvs // self.vmax)
        return _idct_luma(coefs, luma_bh, luma_bw, lh, lw)


# --- encoder (grayscale baseline) --------------------------------------------


class _BitWriter:
    __slots__ = ("out", "acc", "nacc")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nacc += length
        while self.nacc >= 8:
            b = (self.acc >> (self.nacc - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nacc -= 8
            self.acc &= (1 << self.nacc) - 1

    def flush(self) -> bytes:
        if self.nacc:
            pad = 8 - self.nacc
            b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF  # pad with 1s
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nacc = 0
            self.acc = 0
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (category ssss, ssss-bit code) per F.1.2.1.1/F.1.2.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, v if v > 0 else v + (1 << t) - 1


def _plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """uint8 plane -> (rows, cols, 64) zigzag-order quantized coefficients."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), dtype=np.uint8)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[h - 1 : h, :]  # edge-replicate pad
    padded[:, w:] = padded[:, w - 1 : w]
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coefs = _DCT_M @ blocks @ _DCT_M.T
    qc = np.round(coefs.reshape(-1, 64) / q.astype(np.float64)[None, :]).astype(np.int64)
    return qc[:, ZIGZAG].reshape(ph // 8, pw // 8, 64)


def _write_block(wtr: _BitWriter, b: np.ndarray, pred: int, dc_codes, ac_codes) -> int:
    """Huffman-encode one zigzag block; returns the new DC predictor."""
    diff = int(b[0]) - pred
    t, code = _magnitude(diff)
    c, ln = dc_codes[t]
    wtr.put(c, ln)
    wtr.put(code, t)
    nz = np.flatnonzero(b[1:])
    k = 0
    for idx in nz:
        run = int(idx) - k
        while run >= 16:
            c, ln = ac_codes[0xF0]  # ZRL
            wtr.put(c, ln)
            run -= 16
        t, code = _magnitude(int(b[1 + idx]))
        c, ln = ac_codes[(run << 4) | t]
        wtr.put(c, ln)
        wtr.put(code, t)
        k = int(idx) + 1
    if k < 63:
        c, ln = ac_codes[0x00]  # EOB
        wtr.put(c, ln)
    return int(b[0])


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _headers(h: int, w: int, q: np.ndarray, comps: list[tuple[int, int, int]], dri: int) -> bytes:
    """SOI..SOS headers; comps = [(comp_id, hs, vs)], one shared table set."""
    zz_q = np.empty(64, dtype=np.uint8)
    zz_q[:] = q[ZIGZAG]
    out = b"\xff\xd8"  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += _seg(0xDB, b"\x00" + zz_q.tobytes())  # DQT table 0
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])  # all comps use quant table 0
    out += _seg(0xC0, sof)
    out += _seg(0xC4, b"\x00" + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS))
    out += _seg(0xC4, b"\x10" + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS))
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    sos = bytes([len(comps)])
    for cid, _, _ in comps:
        sos += bytes([cid, 0x00])  # DC table 0 / AC table 0 for every comp
    out += _seg(0xDA, sos + b"\x00\x3f\x00")
    return out


def encode_jpeg_gray(img: np.ndarray, quality: int = 75, restart_interval: int = 0) -> bytes:
    """uint8 HxW grayscale -> baseline JFIF bytes (Annex K tables)."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_jpeg_gray wants a uint8 HxW array")
    h, w = img.shape
    q = quant_table(quality)
    zz = _plane_blocks(img, q)
    dc_codes = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    out = bytearray(_headers(h, w, q, [(1, 1, 1)], restart_interval))
    wtr = _BitWriter()
    pred = 0
    mcu = 0
    rst = 0
    for by in range(zz.shape[0]):
        for bx in range(zz.shape[1]):
            if restart_interval and mcu and mcu % restart_interval == 0:
                out += wtr.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                wtr = _BitWriter()
                pred = 0
            pred = _write_block(wtr, zz[by, bx], pred, dc_codes, ac_codes)
            mcu += 1
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _enc_ac_first(wtr: _BitWriter, band: np.ndarray, ac_codes) -> None:
    """One block's first-scan band encode (values already point-
    transformed): zero runs, ZRL, EOB0 for the trailing run."""
    r = 0
    for v in band:
        v = int(v)
        if v == 0:
            r += 1
            continue
        while r >= 16:
            c, ln = ac_codes[0xF0]
            wtr.put(c, ln)
            r -= 16
        t, code = _magnitude(v)
        c, ln = ac_codes[(r << 4) | t]
        wtr.put(c, ln)
        wtr.put(code, t)
        r = 0
    if r:
        c, ln = ac_codes[0x00]  # EOB (run of 1 — no EOBn symbols needed)
        wtr.put(c, ln)


def _enc_ac_refine(wtr: _BitWriter, band: np.ndarray, al: int, ac_codes) -> None:
    """One block's refinement-scan band encode (G.1.2.3 / libjpeg
    encode_mcu_AC_refine shape): newly nonzero coefficients emit
    (run, 1) + sign; previously nonzero ones buffer their correction
    bit, flushed after the next emitted symbol so the decoder reads
    them in positional order during its run/EOB walks."""
    r = 0
    br: list[int] = []
    for v in band:
        t = abs(int(v)) >> al
        if t == 0:
            r += 1
            continue
        while r > 15:
            c, ln = ac_codes[0xF0]
            wtr.put(c, ln)
            r -= 16
            for bit in br:
                wtr.put(bit, 1)
            br = []
        if t > 1:  # previously nonzero: one correction bit
            br.append(t & 1)
            continue
        c, ln = ac_codes[(r << 4) | 1]
        wtr.put(c, ln)
        wtr.put(1 if v > 0 else 0, 1)
        for bit in br:
            wtr.put(bit, 1)
        br = []
        r = 0
    if r or br:
        c, ln = ac_codes[0x00]
        wtr.put(c, ln)
        for bit in br:
            wtr.put(bit, 1)


def encode_jpeg_gray_progressive(img: np.ndarray, quality: int = 75) -> bytes:
    """uint8 HxW grayscale -> PROGRESSIVE (SOF2) JFIF bytes carrying the
    exact same quantized coefficients as ``encode_jpeg_gray``, so the
    decoded output is pinned bit-identical to the baseline path.

    Six scans exercise every progressive decode branch: DC first at
    Al=1 + DC refinement; two spectral bands (1-5, 6-63) each as an
    Al=1 first scan and an Ah=1->Al=0 refinement scan with embedded
    correction bits."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_jpeg_gray_progressive wants a uint8 HxW array")
    h, w = img.shape
    q = quant_table(quality)
    flat = _plane_blocks(img, q).reshape(-1, 64)
    dc_codes = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    zz_q = np.empty(64, dtype=np.uint8)
    zz_q[:] = q[ZIGZAG]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + zz_q.tobytes())
    out += _seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xC4, b"\x00" + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS))
    out += _seg(0xC4, b"\x10" + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS))

    def sos(ss: int, se: int, ah: int, al: int) -> bytes:
        return _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    # scan 1: DC first, point transform 1 (arithmetic shift per G.1.2.1)
    wtr = _BitWriter()
    pred = 0
    for b in flat:
        v = int(b[0]) >> 1
        t, code = _magnitude(v - pred)
        c, ln = dc_codes[t]
        wtr.put(c, ln)
        wtr.put(code, t)
        pred = v
    out += sos(0, 0, 0, 1) + wtr.flush()
    # scan 2: DC refinement — one bit per block
    wtr = _BitWriter()
    for b in flat:
        wtr.put(int(b[0]) & 1, 1)
    out += sos(0, 0, 1, 0) + wtr.flush()
    # scans 3-6: two spectral bands, first (Al=1) then refine (Al=0)
    for ss, se in ((1, 5), (6, 63)):
        wtr = _BitWriter()
        for b in flat:
            band = b[ss : se + 1]
            sent = np.sign(band) * (np.abs(band) >> 1)  # toward-zero /2
            _enc_ac_first(wtr, sent, ac_codes)
        out += sos(ss, se, 0, 1) + wtr.flush()
    for ss, se in ((1, 5), (6, 63)):
        wtr = _BitWriter()
        for b in flat:
            _enc_ac_refine(wtr, b[ss : se + 1], 0, ac_codes)
        out += sos(ss, se, 1, 0) + wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_color420(rgb_or_gray: np.ndarray, quality: int = 75, restart_interval: int = 0) -> bytes:
    """uint8 HxWx3 RGB (or HxW gray, replicated) -> YCbCr 4:2:0 baseline
    JFIF. Fixture-grade: all three components share the luminance
    quantization and Huffman tables (valid per T.81; real encoders use
    separate chroma tables for better rate). Exists so the decoder's
    interleaved-MCU and restart paths are exercised by tests."""
    a = np.asarray(rgb_or_gray)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.dtype != np.uint8 or a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_jpeg_color420 wants uint8 HxWx3 (or HxW)")
    h, w = a.shape[:2]
    r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
    y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255).astype(np.uint8)
    cb = np.clip(np.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b), 0, 255)
    cr = np.clip(np.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b), 0, 255)
    # pad to even dims, then 2x2 box-average subsample the chroma
    ph, pw = -(-h // 2) * 2, -(-w // 2) * 2

    def sub(c: np.ndarray) -> np.ndarray:
        p = np.empty((ph, pw), dtype=np.float64)
        p[:h, :w] = c
        p[h:, :w] = c[h - 1 : h, :]
        p[:, w:] = p[:, w - 1 : w]
        return np.clip(
            np.round(p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))), 0, 255
        ).astype(np.uint8)

    q = quant_table(quality)
    # luma padded so each MCU has a full 2x2 of Y blocks
    mh, mw = -(-h // 16) * 16, -(-w // 16) * 16
    ypad = np.empty((mh, mw), dtype=np.uint8)
    ypad[:h, :w] = y
    ypad[h:, :w] = y[h - 1 : h, :]
    ypad[:, w:] = ypad[:, w - 1 : w]
    yb = _plane_blocks(ypad, q)
    cbb = _plane_blocks(sub(cb), q)
    crb = _plane_blocks(sub(cr), q)
    dc_codes = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    out = bytearray(_headers(h, w, q, [(1, 2, 2), (2, 1, 1), (3, 1, 1)], restart_interval))
    wtr = _BitWriter()
    preds = [0, 0, 0]
    mcu = 0
    rst = 0
    for my in range(mh // 16):
        for mx in range(mw // 16):
            if restart_interval and mcu and mcu % restart_interval == 0:
                out += wtr.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                wtr = _BitWriter()
                preds = [0, 0, 0]
            for by in range(2):
                for bx in range(2):
                    preds[0] = _write_block(
                        wtr, yb[2 * my + by, 2 * mx + bx], preds[0], dc_codes, ac_codes
                    )
            preds[1] = _write_block(wtr, cbb[my, mx], preds[1], dc_codes, ac_codes)
            preds[2] = _write_block(wtr, crb[my, mx], preds[2], dc_codes, ac_codes)
            mcu += 1
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
