"""GIF87a/89a codec — pure stdlib + numpy, no image libraries.

Scope (honest boundaries, like the JPEG/PNG codecs'): global and local
color tables, variable-width LZW (LSB-first bit packing, CLEAR/EOI,
4096-entry table with reset), interlaced images (the 4-pass row
schedule), multi-frame animation with Graphic Control Extensions
(delay, transparency index, disposal methods 0/1/2 — "restore to
previous" (3) raises). GIF is lossless on indexed content, so
decode(encode(frames)) round-trips the palette-mapped pixels
BIT-EXACTLY — the property the tests enforce.

Determinism contract: decode is exact integer table lookups (no float
anywhere), so the independent per-scalar golden walk in
oracle/golden.py (first literal LZW code → palette entry) matches the
full decoder on pixel (0,0) trivially and exactly.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# ----------------------------------------------------------------------
# LZW (GIF flavor: LSB-first bits, variable 3-12 bit codes)
# ----------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code
    eoi = clear + 1
    out = np.empty(n_pixels, np.uint8)
    n_out = 0
    pos = 0          # bit position, LSB-first within each byte
    width = min_code + 1
    table: list[bytes] = []
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code + 1
        prev = None

    reset()
    total_bits = len(data) * 8
    while n_out < n_pixels:
        if pos + width > total_bits:
            raise ValueError("truncated GIF LZW stream")
        byte = pos >> 3
        # up to 12 bits span at most 3 bytes
        chunk = int.from_bytes(data[byte:byte + 3], "little")
        code = (chunk >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("bad GIF LZW code")
        take = min(len(entry), n_pixels - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError("GIF pixel data ends early")
    return out


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code + 1
    table: dict[tuple[int, int], int] = {}
    nxt = eoi + 1
    put(clear, width)
    data = indices.tolist()
    cur = data[0]
    for k in data[1:]:
        if (cur, k) in table:
            cur = table[(cur, k)]
            continue
        put(cur, width)
        table[(cur, k)] = nxt
        nxt += 1
        if nxt - 1 == (1 << width) and width < 12:
            width += 1
        if nxt == 4096:
            put(clear, width)
            table.clear()
            width = min_code + 1
            nxt = eoi + 1
        cur = k
    put(cur, width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(b: bytes) -> bytes:
    """LZW stream → length-prefixed sub-blocks (≤255) + terminator."""
    out = bytearray()
    for i in range(0, len(b), 255):
        chunk = b[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ----------------------------------------------------------------------
# encode
# ----------------------------------------------------------------------

def encode_gif(frames, palette: np.ndarray, *, delays_ms=None,
               interlace: bool = False, transparent: int | None = None,
               bg: int = 0) -> bytes:
    """Indexed frames → GIF89a bytes. ``frames`` is a list of HxW uint8
    index arrays (full canvas) or (x0, y0, array) sub-rectangles
    composited onto the previous frame; ``palette`` is (n≤256, 3)
    uint8. One GCE per frame carries the delay (centiseconds on the
    wire), optional ``transparent`` index and disposal 1 (leave in
    place — the compositing animation convention)."""
    palette = np.ascontiguousarray(palette, np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
        raise ValueError("palette must be (n<=256, 3) uint8")
    norm = []
    for f in frames:
        if isinstance(f, tuple):
            x0, y0, arr = f
        else:
            x0, y0, arr = 0, 0, f
        arr = np.ascontiguousarray(arr, np.uint8)
        if arr.size and int(arr.max()) >= len(palette):
            raise ValueError("frame index exceeds palette")
        norm.append((x0, y0, arr))
    if not norm or norm[0][0] or norm[0][1]:
        raise ValueError("first frame must cover the canvas at (0, 0)")
    h, w = norm[0][2].shape
    if delays_ms is None:
        delays_ms = [100] * len(norm)

    # global color table padded to a power of two ≥ 2
    gct_bits = max(1, int(len(palette) - 1).bit_length())
    gct = np.zeros((1 << gct_bits, 3), np.uint8)
    gct[:len(palette)] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), bg, 0)
    out += gct.tobytes()
    for (x0, y0, arr), delay in zip(norm, delays_ms):
        fh, fw = arr.shape
        tflag = 1 if transparent is not None else 0
        out += bytes([0x21, 0xF9, 4, (1 << 2) | tflag])   # GCE, disposal 1
        out += struct.pack("<H", max(0, int(delay)) // 10)
        out += bytes([transparent or 0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", x0, y0, fw, fh)
        out += bytes([0x40 if interlace else 0x00])       # no LCT
        if interlace:
            rows = [arr[o::s] for o, s in _INTERLACE]
            flat = np.concatenate([r.reshape(-1) for r in rows])
        else:
            flat = arr.reshape(-1)
        min_code = max(2, gct_bits)
        out += bytes([min_code])
        out += _subblocks(_lzw_encode(flat, min_code))
    out += bytes([0x3B])
    return bytes(out)


# ----------------------------------------------------------------------
# decode
# ----------------------------------------------------------------------

def decode_gif(b: bytes):
    """GIF bytes → (frames, delays_ms): composited HxWx3 uint8 RGB
    canvases (one per image block) and per-frame delays."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w), np.int64)       # palette indices
    if gct is not None:
        canvas[:] = bg
    frames, delays = [], []
    delay_cs = 0
    transparent = None
    disposal = 0
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:                     # trailer
            break
        if block == 0x21:                     # extension
            label = b[pos]
            pos += 1
            if label == 0xF9:                 # graphic control
                sz = b[pos]
                gflags = b[pos + 1]
                delay_cs = struct.unpack_from("<H", b, pos + 2)[0]
                transparent = b[pos + 4] if gflags & 1 else None
                disposal = (gflags >> 2) & 7
                if disposal == 3:
                    raise NotImplementedError(
                        "GIF disposal 'restore to previous'")
                pos += sz + 1
            else:                             # skip any other extension
                while b[pos]:
                    pos += b[pos] + 1
                pos += 1
                continue
            while b[pos]:                     # GCE terminator (defensive)
                pos += b[pos] + 1
            pos += 1
        elif block == 0x2C:                   # image descriptor
            x0, y0, fw, fh = struct.unpack_from("<HHHH", b, pos)
            iflags = b[pos + 8]
            pos += 9
            pal = gct
            if iflags & 0x80:                 # local color table
                n = 2 << (iflags & 7)
                pal = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF image without any color table")
            min_code = b[pos]
            pos += 1
            chunks = []
            while b[pos]:
                ln = b[pos]
                chunks.append(b[pos + 1:pos + 1 + ln])
                pos += ln + 1
            pos += 1
            idx = _lzw_decode(b"".join(chunks), min_code, fw * fh)
            if iflags & 0x40:                 # deinterlace
                img = np.empty((fh, fw), np.uint8)
                at = 0
                for o, s in _INTERLACE:
                    rows = len(range(o, fh, s))
                    img[o::s] = idx[at:at + rows * fw].reshape(rows, fw)
                    at += rows * fw
            else:
                img = idx.reshape(fh, fw)
            region = canvas[y0:y0 + fh, x0:x0 + fw]
            if transparent is not None:
                keep = img == transparent
                region[:] = np.where(keep, region, img)
            else:
                region[:] = img
            frames.append(pal[canvas.clip(0, len(pal) - 1)])
            delays.append(delay_cs * 10)
            if disposal == 2:                 # restore to background
                region[:] = bg
            transparent = None
            delay_cs = 0
            disposal = 0
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF without image data")
    return frames, delays
