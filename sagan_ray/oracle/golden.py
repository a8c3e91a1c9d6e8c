"""Golden-parquet oracles for operators whose semantics DuckDB SQL can't
express (hash sketches, pixel kernels). Each generator is an INDEPENDENT
naive implementation — per-row spec functions plus brute-force scans, no
banding/exchange/batched kernels — written to a fixed path that the
registered oracle SQL reads with ``read_parquet``. The driver gate runs
the Ray query first and the SQL second for each name, so the query
callable (re)writes its golden before the SQL reads it; the comparison
then checks the whole distributed pipeline (vectorized kernel + LSH
banding + exchange) against the sequential spec, the same shape as
oracle/evaluator.py for the engine.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd

from ..datapipe.hashing import hash_array_pure as _hash_pure
import pyarrow as pa

GOLDEN_DIR = "/tmp/sagan_ray_golden"


def _write(tbl: pa.Table, name: str) -> str:
    import pyarrow.parquet as pq

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def _popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount for uint64 arrays (numpy<2 lacks bitwise_count)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = ((x & np.uint64(0x3333333333333333))
         + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def write_golden_simhash(sf_dir: str, max_hamming: int) -> str:
    """Expected output of ``dedup_simhash``: per-row ``_simhash64`` (the
    transcription spec) + a chunked brute-force O(n²) Hamming scan — no
    banding, no batched kernel, no exchange."""
    import pyarrow.parquet as pq

    from ..datapipe.dedup import _simhash64

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
    sigs = np.array([_simhash64(x) for x in t.column("text").to_pylist()],
                    dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids, sigs = ids[order], sigs[order]
    oa, ob, oh = [], [], []
    chunk = 1024
    for s in range(0, len(ids), chunk):
        ham = _popcount64(sigs[s:s + chunk, None] ^ sigs[None, :])
        ii, jj = np.where(ham <= max_hamming)
        m = ids[ii + s] < ids[jj]       # each unordered pair once, no self
        oa.extend(ids[ii + s][m].tolist())
        ob.extend(ids[jj][m].tolist())
        oh.extend(ham[ii, jj][m].astype(np.int64).tolist())
    tbl = pa.table({"a": pa.array(oa, pa.int64()),
                    "b": pa.array(ob, pa.int64()),
                    "hamming": pa.array(oh, pa.int64())})
    return _write(tbl, "dedup_simhash")


def write_golden_embed_lsh(sf_dir: str, *, threshold: float, n_planes: int,
                           n_tables: int, seed: int,
                           max_bucket: int) -> str:
    """Expected output of ``embed_near_dup_lsh``: per-row sequential
    hyperplane hashing (python dict buckets, per-row dgemv projections,
    per-pair np.dot cosine) — no exchange, no batch matmuls. The plane
    matrix and the truncation rule are spec constants shared with the
    pipeline; everything else is independent arithmetic (float64, so the
    ~1e-16 summation-order noise between dgemm and per-row dots cannot
    flip a sign bit or a threshold boundary)."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    ids, vecs = ids[order], vecs[order]
    unit = np.empty_like(vecs)
    for i in range(len(vecs)):
        n = float(np.sqrt((vecs[i] * vecs[i]).sum()))
        unit[i] = vecs[i] / (n if n else 1.0)
    planes = np.random.default_rng(seed).standard_normal(
        (n_tables, vecs.shape[1], n_planes))
    pairs: set[tuple[int, int]] = set()
    for tt in range(n_tables):
        buckets: dict[int, list[int]] = {}
        for i in range(len(ids)):
            proj = unit[i] @ planes[tt]
            bkt = 0
            for p in range(n_planes):
                if proj[p] > 0:
                    bkt |= 1 << p
            buckets.setdefault(bkt, []).append(i)
        for members in buckets.values():
            members = sorted(members, key=lambda i: ids[i])[:max_bucket]
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    i, j = members[x], members[y]
                    if float(np.dot(unit[i], unit[j])) >= threshold:
                        pairs.add((int(ids[i]), int(ids[j])))
    rows = sorted(pairs)
    tbl = pa.table({"a": pa.array([r[0] for r in rows], pa.int64()),
                    "b": pa.array([r[1] for r in rows], pa.int64())})
    return _write(tbl, "embed_near_dup_lsh")


def write_golden_embed_ivf(sf_dir: str, *, n_queries: int, k: int,
                           n_cells: int, nprobe: int, sample_size: int,
                           seed: int) -> str:
    """Expected output of ``embed_ivf``: sequential IVF — SplitMix64
    id-hash sample (same spec function), an independent per-row Lloyd's
    loop (per-point cell scans, per-cell integer sums — not the
    pipeline's dgemm), per-row cell assignment and per-query candidate
    scans. Bit-identical to the distributed run BY CONSTRUCTION: both
    sides operate on the ``_unit_grid`` fixed-point unit vectors
    (g = rint(v·2^14), u = rint(g/‖g‖·2^14)), so every dot here — this
    loop's np.dot, the pipeline's blocked dgemm — is the same EXACT
    integer; centroid updates renormalize integer sums with an exact
    int64 ‖S‖² on both sides (datapipe/ann.py::_unit_grid docstring)."""
    import pyarrow.parquet as pq

    from ..datapipe.ann import IVF_FIX, _splitmix64

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    ids, vecs = ids[order], vecs[order]
    unit = np.empty_like(vecs)
    for i in range(len(vecs)):           # sequential per-row grid spec
        g = np.rint(vecs[i] * IVF_FIX)
        ss = sum(int(c) * int(c) for c in g)       # exact Python ints
        n = float(np.sqrt(float(ss))) if ss else 1.0
        unit[i] = np.rint(g / n * IVF_FIX)

    q = unit[:n_queries]                   # queries = smallest vec_ids
    qids = np.arange(n_queries)            # query_id = position, as in ivf_topk

    h = _splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    samp_order = sorted(range(len(ids)), key=lambda i: (int(h[i]), int(ids[i])))
    samp = [unit[i] for i in samp_order[:sample_size]]

    cent = [samp[c].copy() for c in range(min(n_cells, len(samp)))]
    for _ in range(8):
        sums = [np.zeros(vecs.shape[1]) for _ in cent]
        cnts = [0] * len(cent)
        for v in samp:
            best, best_s = 0, -np.inf
            for c in range(len(cent)):
                s = float(np.dot(v, cent[c]))      # exact integer dot
                if s > best_s:
                    best, best_s = c, s
            sums[best] += v                        # exact integer sums
            cnts[best] += 1
        for c in range(len(cent)):
            if cnts[c]:
                S = sums[c]
                ss = sum(int(x) * int(x) for x in S)
                if ss > 0:
                    cent[c] = np.rint(S / np.sqrt(float(ss)) * IVF_FIX)

    assign = np.empty(len(ids), dtype=np.int64)
    for i in range(len(ids)):
        best, best_s = 0, -np.inf
        for c in range(len(cent)):
            s = float(np.dot(unit[i], cent[c]))
            if s > best_s:
                best, best_s = c, s
        assign[i] = best

    oq, ov, orr = [], [], []
    for qi in range(n_queries):
        sims = [(float(np.dot(q[qi], cent[c])), c) for c in range(len(cent))]
        cells = [c for _, c in sorted(sims, key=lambda sc: (-sc[0], sc[1]))][:nprobe]
        cand = [(float(np.dot(unit[i], q[qi])), int(ids[i]))
                for i in range(len(ids)) if assign[i] in cells]
        cand.sort(key=lambda sv: (-sv[0], sv[1]))
        for rank, (_, vid) in enumerate(cand[:k], 1):
            oq.append(int(qids[qi]))
            ov.append(vid)
            orr.append(rank)
    tbl = pa.table({"query_id": pa.array(oq, pa.int64()),
                    "vec_id": pa.array(ov, pa.int64()),
                    "rank": pa.array(orr, pa.int64())})
    return _write(tbl, "embed_ivf")


def _bmp_first_pixel_gray(b: bytes) -> float:
    """Independent minimal BMP walk: gray value of the DECODED image's
    (0, 0) pixel — which for a bottom-up BMP lives on the LAST stored
    row. Deliberately does not share code with datapipe.multimodal's
    decoder; 24-bit uncompressed only (the synthetic corpus)."""
    assert b[:2] == b"BM"
    off = struct.unpack_from("<I", b, 10)[0]
    w = struct.unpack_from("<i", b, 18)[0]
    h = struct.unpack_from("<i", b, 22)[0]
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    assert bpp == 24 and comp == 0
    stride = (w * 3 + 3) & ~3
    row = abs(h) - 1 if h > 0 else 0    # bottom-up storage ↔ top row
    p = off + row * stride
    blue, green, red = b[p], b[p + 1], b[p + 2]
    # float32 at every step, in ((R+G)+B)/3 then /255 order — the same
    # rounding sequence the pipeline's float32 mean-pool performs, so
    # the 6-decimal rounding downstream can never straddle differently
    s = np.float32(np.float32(np.float32(red) + np.float32(green))
                   + np.float32(blue))
    gray = np.float32(s / np.float32(3.0))
    return float(np.float32(gray / np.float32(255.0)))


def _png_first_pixel_gray(b: bytes) -> float:
    """Independent minimal PNG walk: gray of pixel (0, 0). Every PNG
    filter type predicts the FIRST pixel of the FIRST row from zeros
    (left/up/upper-left all absent ⇒ 0), so recon(0,0) == the raw bytes
    right after row 0's filter byte — no unfiltering needed. This holds
    for Adam7 streams too: interlace pass 1 starts at (0, 0), so the
    stream's first scanline's first pixel IS pixel (0, 0). Handles
    gray/RGB/palette/gray+alpha/RGBA at depth 8 or 16 (high byte).
    Shares only stdlib zlib with the pipeline decoder, none of its
    code."""
    import zlib

    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat = 8, []
    depth = ctype = None
    plte = b""
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos:pos + 4], "big")
        typ = b[pos + 4:pos + 8]
        if typ == b"IHDR":
            depth, ctype = b[pos + 16], b[pos + 17]
        elif typ == b"PLTE":
            plte = b[pos + 8:pos + 8 + ln]
        elif typ == b"IDAT":
            idat.append(b[pos + 8:pos + 8 + ln])
        elif typ == b"IEND":
            break
        pos += 12 + ln
    d = zlib.decompressobj()
    head = d.decompress(b"".join(idat), 17)  # filter byte + first pixel
    step = 2 if depth == 16 else 1           # 16-bit: high byte
    if depth < 8:
        v = head[1] >> (8 - depth)           # MSB-first sub-byte sample
        if ctype == 3:
            red, green, blue = plte[3 * v:3 * v + 3]
        else:
            red = green = blue = v * 255 // ((1 << depth) - 1)
    elif ctype == 3:
        red, green, blue = plte[3 * head[1]:3 * head[1] + 3]
    elif ctype in (0, 4):
        red = green = blue = head[1]
    else:
        red, green, blue = head[1], head[1 + step], head[1 + 2 * step]
    s = np.float32(np.float32(np.float32(red) + np.float32(green))
                   + np.float32(blue))
    gray = np.float32(s / np.float32(3.0))
    return float(np.float32(gray / np.float32(255.0)))


_JPEG_ZIG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]


def _jpeg_first_pixel_gray(b: bytes) -> float:
    """Independent minimal baseline-JPEG walk: gray of pixel (0, 0).

    Follows the integer decode SPEC in datapipe/jpeg.py's docstring
    (12-bit cosine matrix, one rounded 24-bit shift, 16-bit color
    constants, floor shifts) but shares none of its code: dict-walk
    Huffman instead of mincode/maxcode tables, per-scalar math.cos
    basis, pure-Python-int IDCT of the single needed output pixel.
    Every step is exact integer arithmetic, so this matches the
    vectorized decoder bit-for-bit by construction."""
    import math

    assert b[:2] == b"\xff\xd8"
    pos = 2
    qts: dict[int, list[int]] = {}
    codes: dict[tuple[int, int], dict] = {}
    comp_ids: list[int] = []
    comp_tq: list[int] = []
    comp_hv: list[tuple[int, int]] = []
    scans: list[dict] = []
    prog = lossless = False
    while pos < len(b):
        assert b[pos] == 0xFF
        m = b[pos + 1]
        pos += 2
        if m in (0x01,) or 0xD0 <= m <= 0xD8:
            continue
        if m == 0xD9:
            break
        ln = int.from_bytes(b[pos:pos + 2], "big")
        body = b[pos + 2:pos + ln]
        pos += ln
        if m == 0xDB:
            p = 0
            while p < len(body):
                qts[body[p] & 0xF] = list(body[p + 1:p + 65])
                p += 65
        elif m == 0xC4:
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0xF
                counts = list(body[p + 1:p + 17])
                nv = sum(counts)
                vals = list(body[p + 17:p + 17 + nv])
                d: dict = {}
                code = k = 0
                for lng in range(1, 17):
                    for _ in range(counts[lng - 1]):
                        d[(lng, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                codes[(cls, tid)] = d
                p += 17 + nv
        elif m in (0xC0, 0xC2, 0xC3):
            prog = m == 0xC2
            lossless = m == 0xC3
            ncomp = body[5]
            comp_ids = [body[6 + 3 * c] for c in range(ncomp)]
            comp_tq = [body[6 + 3 * c + 2] for c in range(ncomp)]
            comp_hv = [(body[6 + 3 * c + 1] >> 4, body[6 + 3 * c + 1] & 0xF)
                       for c in range(ncomp)]
        elif m == 0xDA:
            ns = body[0]
            sel = [comp_ids.index(body[1 + 2 * c]) for c in range(ns)]
            tts = [(body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0xF)
                   for c in range(ns)]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            # entropy data runs to the next real marker (FF00 stuffing
            # and RSTn markers are not scan terminators); block (0,0)
            # always precedes the first restart, so only the first
            # entropy segment is kept and unstuffed
            e = pos
            while True:
                i = b.find(b"\xff", e)
                if i < 0 or i + 1 >= len(b):
                    i = len(b)
                    break
                nx = b[i + 1]
                if nx == 0x00:
                    e = i + 2
                elif nx == 0xFF:
                    e = i + 1
                else:
                    break
            scans.append({"sel": sel, "tts": tts, "ss": ss, "se": se,
                          "ah": ahal >> 4, "al": ahal & 0xF,
                          "codes": dict(codes),
                          "bits": b[pos:i].replace(b"\xff\x00", b"\xff")})
            while i + 1 < len(b) and 0xD0 <= b[i + 1] <= 0xD7:
                # skip past RSTn and its following entropy segment
                e = i + 2
                while True:
                    j = b.find(b"\xff", e)
                    if j < 0 or j + 1 >= len(b):
                        j = len(b)
                        break
                    nx = b[j + 1]
                    if nx == 0x00:
                        e = j + 2
                    elif nx == 0xFF:
                        e = j + 1
                    else:
                        break
                i = j
            pos = i
            if not prog:
                break

    cur = {"buf": b"", "bp": 0}

    def bit() -> int:
        v = (cur["buf"][cur["bp"] >> 3] >> (7 - (cur["bp"] & 7))) & 1
        cur["bp"] += 1
        return v

    def read_code(d: dict) -> int:
        lng = c = 0
        while True:
            c = (c << 1) | bit()
            lng += 1
            if (lng, c) in d:
                return d[(lng, c)]

    def recv_extend(s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | bit()
        if s and v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return v

    # the SAME IEEE op sequence the pipeline's matrix build performs
    # (0.5·cos, then ×1/√2 on row 0, then rint(·4096)) — elementwise
    # stability makes scalar and vectorized construction identical
    aq = [[int(np.rint(((0.5 * math.cos((2 * n + 1) * k * math.pi / 16.0))
                        * ((1.0 / math.sqrt(2.0)) if k == 0 else 1.0))
                       * 4096.0))
           for n in range(8)] for k in range(8)]

    if lossless:
        # SOF3: pixel (0,0) of each component is the scan's first
        # sample — default prediction 2^(P-Pt-1) plus the first coded
        # difference, << Pt; components are raw RGB (NO color transform
        # in lossless mode)
        sc = scans[0]
        cur["buf"], cur["bp"] = sc["bits"], 0
        pt = sc["al"]
        dflt = 1 << (8 - pt - 1)
        out0: list[int] = []
        for si in range(len(sc["tts"])):
            td = sc["tts"][si][0]
            s = read_code(sc["codes"][(0, td)])
            diff = 32768 if s == 16 else recv_extend(s)
            out0.append(min(255, max(0, ((dflt + diff) & 0xFFFF) << pt)))
        if len(out0) == 1:
            red = green = blue = out0[0]
        else:
            red, green, blue = out0
        s32 = np.float32(np.float32(np.float32(red) + np.float32(green))
                         + np.float32(blue))
        gray = np.float32(s32 / np.float32(3.0))
        return float(np.float32(gray / np.float32(255.0)))

    coefs = [[0] * 64 for _ in comp_tq]
    if not prog:
        # baseline: the first MCU interleaves hi*vi data units per
        # component; the FIRST one is the 8x8 block covering pixel
        # (0,0) (chroma upsampling is sample replication, so chroma
        # (0,0) maps too). The rest must still be entropy-decoded to
        # advance the bits.
        sc = scans[0]
        cur["buf"], cur["bp"] = sc["bits"], 0
        cds = sc["codes"]
        for si, ci in enumerate(sc["sel"]):
            td, ta = sc["tts"][si]
            hi, vi = comp_hv[ci] if comp_hv else (1, 1)
            coef = coefs[ci]
            for unit in range(hi * vi):
                s = read_code(cds[(0, td)])
                dc = recv_extend(s)
                if unit == 0:
                    coef[0] = dc
                k = 1
                while k < 64:
                    sym = read_code(cds[(1, ta)])
                    if sym == 0x00:
                        break
                    run, sz = sym >> 4, sym & 0xF
                    if sz == 0:
                        k += 16
                        continue
                    k += run
                    v = recv_extend(sz)
                    if unit == 0:
                        coef[k] = v
                    k += 1
    else:
        # progressive: block (0,0) of every component is (part of) the
        # FIRST MCU / data unit of each scan, so each scan contributes
        # its spectral band / approximation bits from the scan's very
        # first entropy bits (T.81 Annex G, replayed per-scalar)
        for sc in scans:
            cur["buf"], cur["bp"] = sc["bits"], 0
            cds = sc["codes"]
            ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
            if ss == 0:                      # DC scan (interleaved ok)
                for si, ci in enumerate(sc["sel"]):
                    hi, vi = comp_hv[ci] if comp_hv else (1, 1)
                    dcd = cds.get((0, sc["tts"][si][0]))
                    pred = 0
                    for unit in range(hi * vi if len(sc["sel"]) > 1
                                      else 1):
                        if ah == 0:
                            s = read_code(dcd)
                            pred += recv_extend(s)
                            if unit == 0:
                                coefs[ci][0] = pred << al
                        else:
                            bb = bit()
                            if unit == 0 and bb:
                                coefs[ci][0] |= 1 << al
            else:                            # AC scan: one component
                ci = sc["sel"][0]
                acd = cds.get((1, sc["tts"][0][1]))
                coef = coefs[ci]
                if ah == 0:
                    k = ss
                    while k <= se:
                        sym = read_code(acd)
                        run, sz = sym >> 4, sym & 0xF
                        if sz == 0:
                            if run == 15:
                                k += 16
                                continue
                            break                    # EOBn ends block 0
                        k += run
                        coef[k] = recv_extend(sz) << al
                        k += 1
                else:
                    p1 = 1 << al
                    k = ss
                    hit_eob = False
                    while k <= se:
                        sym = read_code(acd)
                        run, sz = sym >> 4, sym & 0xF
                        if sz == 0:
                            if run != 15:
                                hit_eob = True
                                break
                            val = 0                  # ZRL
                        else:
                            val = p1 if bit() else -p1
                        while k <= se:
                            c = coef[k]
                            if c:
                                if bit() and (c & p1) == 0:
                                    coef[k] = c + (p1 if c >= 0 else -p1)
                            else:
                                if run == 0:
                                    break
                                run -= 1
                            k += 1
                        if val and k <= se:
                            coef[k] = val
                        k += 1
                    if hit_eob:
                        for _ in range(run):        # drain EOBn ext bits
                            bit()
                        for kk in range(k, se + 1):
                            c = coef[kk]
                            if c and bit() and (c & p1) == 0:
                                coefs[ci][kk] = c + (p1 if c >= 0 else -p1)

    out: list[int] = []
    for ci, coef in enumerate(coefs):
        q = qts[comp_tq[ci]]
        f = [[0] * 8 for _ in range(8)]
        for kk in range(64):
            rm = _JPEG_ZIG[kk]
            f[rm // 8][rm % 8] = coef[kk] * q[kk]
        p00 = 0
        for u in range(8):
            for v in range(8):
                p00 += aq[u][0] * f[u][v] * aq[v][0]
        val = ((p00 + (1 << 23)) >> 24) + 128
        out.append(min(255, max(0, val)))

    if len(out) == 1:
        red = green = blue = out[0]
    else:
        y, cb, cr = out
        cb -= 128
        cr -= 128
        red = min(255, max(0, y + ((91881 * cr + 32768) >> 16)))
        green = min(255, max(0, y - ((22554 * cb + 46802 * cr + 32768) >> 16)))
        blue = min(255, max(0, y + ((116130 * cb + 32768) >> 16)))
    s32 = np.float32(np.float32(np.float32(red) + np.float32(green))
                     + np.float32(blue))
    gray = np.float32(s32 / np.float32(3.0))
    return float(np.float32(gray / np.float32(255.0)))


def write_golden_multimodal(n: int, seed: int) -> str:
    """Expected output of ``multimodal_features``: the 8×8 mean-pool
    feature head of each image is the gray of the top-left DECODED pixel
    (grid cell (0,0) of a nearest-neighbor downsample maps to pixel
    (0,0)), computed here by a from-scratch walk over the same
    deterministic corpus (BMP bottom-up row walk / PNG first-scanline
    inflate / sequential integer baseline-JPEG decode of pixel (0,0) —
    see the three helpers). JPEG is lossy, so both sides compare the
    decoded pixel; the integer decode spec makes them bit-equal."""
    from ..datapipe.multimodal import synth_media

    media = synth_media(n, seed=seed)
    oid, oval = [], []
    for mid, kind, payload in zip(media.column("media_id").to_pylist(),
                                  media.column("kind").to_pylist(),
                                  media.column("payload").to_pylist()):
        if kind != "image":
            continue
        oid.append(mid)
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            gray = _png_first_pixel_gray(payload)
        elif payload[:2] == b"\xff\xd8":
            gray = _jpeg_first_pixel_gray(payload)
        elif payload[:6] in (b"GIF87a", b"GIF89a"):
            gray = _gif_first_pixel_gray(payload)
        elif payload[:2] in (b"P5", b"P6"):
            gray = _pnm_first_pixel_gray(payload)
        elif payload[:4] in (b"II*\x00", b"MM\x00*"):
            gray = _tiff_first_pixel_gray(payload)
        else:
            gray = _bmp_first_pixel_gray(payload)
        oval.append(round(gray, 6))
    tbl = pa.table({"media_id": pa.array(oid, pa.int64()),
                    "feat_head": pa.array(oval, pa.float64())})
    return _write(tbl, "multimodal_features")


def _splitmix64_int(x: int) -> int:
    """Per-id SplitMix64 in plain Python ints (independent of the
    numpy-vectorized sampler it checks)."""
    m = (1 << 64) - 1
    x = (x + 0x9E3779B97F4A7C15) & m
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & m
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & m
    return x ^ (x >> 31)


def _wav_first_sample(b: bytes) -> tuple[float, int]:
    """Independent minimal RIFF/WAVE walk (no stdlib ``wave``): channel-0
    first sample as decoded float32 + per-channel frame count, matching
    decode_wav's elementwise op chain (int → float32, ÷ float32 full
    scale) bit-for-bit."""
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    pos = 12
    ch = bits = None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        ln = int.from_bytes(b[pos + 4:pos + 8], "little")
        body = b[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if cid == b"fmt ":
            ch = int.from_bytes(body[2:4], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            sw = bits // 8
            nframes = len(body) // (sw * ch)
            raw = body[:sw]
            if sw == 1:
                v = raw[0] - 128
            elif sw == 3:
                u = raw[0] | (raw[1] << 8) | (raw[2] << 16)
                v = u - ((u >> 23) << 24)
            else:
                v = int.from_bytes(raw, "little", signed=True)
            full = np.float32((1 << (8 * sw - 1)) - 1)
            return float(np.float32(np.float32(v) / full)), nframes
    raise ValueError("WAV without data chunk")


def write_golden_multimodal_av(n: int, seed: int) -> str:
    """Expected output of ``multimodal_av``: audio rows probed by an
    independent RIFF walk, video rows by a from-scratch SGV1 container
    walk + the BMP first-pixel helper — none of the pipeline's codec
    code is reused, so agreement IS the check."""
    from ..datapipe.multimodal import synth_media

    media = synth_media(n, seed=seed)
    oid, okind, ofeat, on = [], [], [], []
    for mid, kind, payload in zip(media.column("media_id").to_pylist(),
                                  media.column("kind").to_pylist(),
                                  media.column("payload").to_pylist()):
        if kind == "audio":
            feat, cnt = _wav_first_sample(payload)
            feat = round(feat, 6)
        elif kind == "video":
            if payload[:6] in (b"GIF87a", b"GIF89a"):
                rgb, nf = _gif_probe(payload)
                red, green, blue = rgb
                s32 = np.float32(np.float32(np.float32(red)
                                            + np.float32(green))
                                 + np.float32(blue))
                g = np.float32(s32 / np.float32(3.0))
                feat = round(float(np.float32(g / np.float32(255.0))), 6)
                cnt = nf
            else:
                assert payload[:4] == b"SGV1"
                nf = int.from_bytes(payload[4:8], "little")
                first_len = int.from_bytes(payload[12:16], "little")
                off = 12 + 4 * nf
                feat = round(_bmp_first_pixel_gray(
                    payload[off:off + first_len]), 6)
                cnt = nf
        else:
            continue
        oid.append(mid)
        okind.append(kind)
        ofeat.append(feat)
        on.append(cnt)
    tbl = pa.table({"media_id": pa.array(oid, pa.int64()),
                    "kind": pa.array(okind, pa.string()),
                    "feat": pa.array(ofeat, pa.float64()),
                    "n": pa.array(on, pa.int64())})
    return _write(tbl, "multimodal_av")


def write_golden_audio_features(n: int, seed: int) -> str:
    """Expected output of ``multimodal_audio``: every audio clip decoded
    by an independent RIFF walk (no stdlib ``wave``) and accumulated
    SAMPLE-BY-SAMPLE in arbitrary-precision Python ints — none of the
    pipeline's numpy vectorization — exact integers, so agreement with
    the batched ``AudioIntFeatures`` stage is bit-for-bit."""
    from ..datapipe.multimodal import synth_media

    media = synth_media(n, seed=seed)
    rows = []
    for mid, kind, payload in zip(media.column("media_id").to_pylist(),
                                  media.column("kind").to_pylist(),
                                  media.column("payload").to_pylist()):
        if kind != "audio":
            continue
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        pos, ch, bits, data = 12, None, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            ln = int.from_bytes(payload[pos + 4:pos + 8], "little")
            body = payload[pos + 8:pos + 8 + ln]
            pos += 8 + ln + (ln & 1)
            if cid == b"fmt ":
                ch = int.from_bytes(body[2:4], "little")
                bits = int.from_bytes(body[14:16], "little")
            elif cid == b"data":
                data = body
        sw = bits // 8
        stride = sw * ch
        nf = len(data) // stride
        ns = zc = peak = dc = en = 0
        prev_neg = None
        for f in range(nf):                 # channel 0 of each frame
            raw = data[f * stride:f * stride + sw]
            if sw == 1:
                v = raw[0] - 128
            elif sw == 3:
                u = raw[0] | (raw[1] << 8) | (raw[2] << 16)
                v = u - ((u >> 23) << 24)
            else:
                v = int.from_bytes(raw, "little", signed=True)
            ns += 1
            neg = v < 0
            if prev_neg is not None and neg != prev_neg:
                zc += 1
            prev_neg = neg
            peak = max(peak, abs(v))
            dc += v
            g = (v << 8 if sw == 1 else v if sw == 2
                 else v >> 8 if sw == 3 else v >> 16)
            en += g * g
        rows.append((mid, ns, zc, peak, dc, en))
    tbl = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_samples": pa.array([r[1] for r in rows], pa.int64()),
        "zero_crossings": pa.array([r[2] for r in rows], pa.int64()),
        "peak_abs": pa.array([r[3] for r in rows], pa.int64()),
        "dc_sum": pa.array([r[4] for r in rows], pa.int64()),
        "energy16": pa.array([r[5] for r in rows], pa.int64()),
    })
    return _write(tbl, "multimodal_audio")


def write_golden_bloom(sf_dir: str, probe_words: list[str], *, p: int,
                       k: int) -> str:
    """Expected output of ``corpus_word_bloom``: a sequential Bloom
    filter — per-doc regex word lists, one bit set per (word, hash row)
    in a plain Python bytearray loop (no flat arrays, no np.bitwise_or
    scatter, no batch blobs), popcount via bin().count. Bit-identical to
    the distributed sketch BY CONSTRUCTION: OR is a semilattice (any
    combine topology gives the same bitmap) and the bit-index function
    is the shared spec (datapipe/sketch.py::_bf_bit)."""
    import re

    import pandas as pd
    import pyarrow.parquet as pq

    from ..datapipe.sketch import _bf_bit

    nbits = 1 << p
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
    texts = t.column("text").to_pylist()
    order = np.argsort(ids, kind="stable")
    texts = [texts[i] for i in order]
    word_re = re.compile(r"[a-z0-9_]+")

    bits = bytearray(nbits >> 3)
    for x in texts:
        ws = word_re.findall((x or "").lower())
        if not ws:
            continue
        hs = _hash_pure(np.array(ws, dtype=object)).astype(np.uint64)
        for j in range(k):
            for ix in _bf_bit(hs, j, nbits):
                bits[int(ix) >> 3] |= 1 << (int(ix) & 7)
    fill = sum(bin(b).count("1") for b in bits)

    out_w, out_p = [], []
    for w in probe_words:
        h = _hash_pure(
            np.array([w], dtype=object)).astype(np.uint64)
        hit = all((bits[int(_bf_bit(h, j, nbits)[0]) >> 3]
                   >> (int(_bf_bit(h, j, nbits)[0]) & 7)) & 1
                  for j in range(k))
        out_w.append(w)
        out_p.append(int(hit))
    tbl = pa.table({"word": pa.array(out_w, pa.string()),
                    "present": pa.array(out_p, pa.int64()),
                    "fill_bits": pa.array([fill] * len(out_w), pa.int64())})
    return _write(tbl, "corpus_word_bloom")


def _gif_probe(b: bytes) -> tuple[tuple[int, int, int], int]:
    """Independent minimal GIF walk: RGB of pixel (0, 0) of the first
    frame + total frame count. The first LZW code after CLEAR always
    decodes to a single literal index (the table holds only roots), so
    pixel (0,0) needs no table building — a per-bit LSB-first read of
    the first few codes. Shares none of datapipe/gif.py's code."""
    assert b[:6] in (b"GIF87a", b"GIF89a")
    flags, bg = b[10], b[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = b[pos:pos + 3 * n]
        pos += 3 * n
    first_rgb = None
    nframes = 0
    transparent = None
    while pos < len(b):
        blk = b[pos]
        pos += 1
        if blk == 0x3B:
            break
        if blk == 0x21:
            label = b[pos]
            pos += 1
            tr = transparent
            if label == 0xF9:
                tr = b[pos + 4] if (b[pos + 1] & 1) else None
            while b[pos]:
                pos += b[pos] + 1
            pos += 1
            transparent = tr
            continue
        assert blk == 0x2C
        x0 = int.from_bytes(b[pos:pos + 2], "little")
        y0 = int.from_bytes(b[pos + 2:pos + 4], "little")
        iflags = b[pos + 8]
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = b[pos:pos + 3 * n]
            pos += 3 * n
        mc = b[pos]
        pos += 1
        chunks = []
        while b[pos]:
            ln = b[pos]
            chunks.append(b[pos + 1:pos + 1 + ln])
            pos += ln + 1
        pos += 1
        if nframes == 0:
            assert x0 == 0 and y0 == 0, "first frame must be full-canvas"
            data = b"".join(chunks)
            clear = 1 << mc
            width = mc + 1
            bp = 0

            def bits(n: int) -> int:
                nonlocal bp
                v = 0
                for j in range(n):
                    v |= ((data[(bp + j) >> 3] >> ((bp + j) & 7)) & 1) << j
                bp += n
                return v

            code = bits(width)
            while code == clear:
                code = bits(width)
            idx = code                       # first literal = root entry
            if transparent is not None and idx == transparent:
                idx = bg
            first_rgb = tuple(pal[3 * idx:3 * idx + 3])
        nframes += 1
        transparent = None
    assert first_rgb is not None
    return first_rgb, nframes


def _rgb_gray6(red: int, green: int, blue: int) -> float:
    s = np.float32(np.float32(np.float32(red) + np.float32(green))
                   + np.float32(blue))
    gray = np.float32(s / np.float32(3.0))
    return float(np.float32(gray / np.float32(255.0)))


def _pnm_first_pixel_gray(b: bytes) -> float:
    """Independent minimal netpbm walk: per-character header scan
    (magic, #-comments, three decimal fields, one whitespace), then the
    first 1 or 3 raster bytes."""
    assert b[:2] in (b"P5", b"P6")
    pos, vals = 2, []
    while len(vals) < 3:
        c = b[pos:pos + 1]
        if c == b"#":
            while b[pos:pos + 1] != b"\n":
                pos += 1
            pos += 1
        elif c.isspace():
            pos += 1
        else:
            num = 0
            while not b[pos:pos + 1].isspace():
                num = num * 10 + (b[pos] - 48)
                pos += 1
            vals.append(num)
    pos += 1
    maxval = vals[2]

    def scale(v: int) -> int:
        return v * 255 // maxval if maxval != 255 else v

    if b[:2] == b"P5":
        v = scale(b[pos])
        return _rgb_gray6(v, v, v)
    return _rgb_gray6(scale(b[pos]), scale(b[pos + 1]), scale(b[pos + 2]))


def _tiff_first_pixel_gray(b: bytes) -> float:
    """Independent minimal TIFF walk: IFD entry scan for photometric /
    samples-per-pixel / first strip offset, then the first raster
    bytes — per-scalar int.from_bytes, no struct reuse."""
    big = b[:2] == b"MM"
    order = "big" if big else "little"

    def rd(off: int, n: int) -> int:
        return int.from_bytes(b[off:off + n], order)

    ifd = rd(4, 4)
    n = rd(ifd, 2)
    spp, strip0 = 1, None
    for i in range(n):
        o = ifd + 2 + 12 * i
        tag, typ = rd(o, 2), rd(o + 2, 2)
        cnt = rd(o + 4, 4)
        size = {1: 1, 3: 2, 4: 4}[typ]
        voff = o + 8 if cnt * size <= 4 else rd(o + 8, 4)
        if tag == 277:
            spp = rd(voff, size)
        elif tag == 273:
            strip0 = rd(voff, size)
    if spp == 1:
        v = b[strip0]
        return _rgb_gray6(v, v, v)
    return _rgb_gray6(b[strip0], b[strip0 + 1], b[strip0 + 2])


def _gif_first_pixel_gray(b: bytes) -> float:
    red, green, blue = _gif_probe(b)[0]
    s = np.float32(np.float32(np.float32(red) + np.float32(green))
                   + np.float32(blue))
    gray = np.float32(s / np.float32(3.0))
    return float(np.float32(gray / np.float32(255.0)))


def write_golden_webdataset(samples) -> str:
    """Expected output of ``webdataset_read``: computed from the
    SOURCE-OF-TRUTH sample list (before any tar bytes exist), so the
    gate verifies the whole write-shards → distributed-parse round
    trip — a reader bug and a writer bug both surface as a mismatch."""
    import zlib

    ks, es, ns, cs = [], [], [], []
    for key, members in samples:
        for ext in sorted(members):
            ks.append(key)
            es.append(ext)
            ns.append(len(members[ext]))
            cs.append(zlib.crc32(members[ext]))
    tbl = pa.table({"key": pa.array(ks, pa.string()),
                    "ext": pa.array(es, pa.string()),
                    "n_bytes": pa.array(ns, pa.int64()),
                    "crc": pa.array(cs, pa.int64())})
    return _write(tbl, "webdataset_read")


def write_golden_kmeans(sf_dir: str, *, k: int, n_iters: int) -> str:
    """Expected output of ``embed_kmeans``: sequential per-row Lloyd over
    the fixed-point grid (the spec datapipe/cluster.py documents) — a
    Python loop computing |x-c|^2 directly per row, integer sums, no
    matmul, no batching, no exchange. Exact integer arithmetic is what
    makes the two implementations land on identical assignments."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    q = np.rint(np.asarray(t.column("embedding").to_pylist(),
                           dtype=np.float64) * float(1 << 20))
    order = np.argsort(ids, kind="stable")
    ids, q = ids[order], q[order]
    hashes = np.array([_splitmix64_int(int(np.uint64(i))) for i in ids],
                      dtype=np.uint64)
    seed_rows = np.argsort(hashes, kind="stable")[:k]
    cent = q[seed_rows].copy()

    def assign_row(x):
        best, best_d = 0, None
        for j in range(len(cent)):
            diff = x - cent[j]
            d2 = float(diff @ diff)
            if best_d is None or d2 < best_d:
                best, best_d = j, d2
        return best

    for _ in range(n_iters):
        sums = np.zeros_like(cent)
        counts = np.zeros(len(cent), dtype=np.int64)
        for i in range(len(q)):
            a = assign_row(q[i])
            sums[a] += q[i]
            counts[a] += 1
        for j in range(len(cent)):
            if counts[j]:
                cent[j] = np.rint(sums[j] / counts[j])
    clusters = np.array([assign_row(q[i]) for i in range(len(q))],
                        dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "cluster": pa.array(clusters, pa.int64())})
    return _write(tbl, "embed_kmeans")


def write_golden_shuffle(sf_dir: str, *, n_shards: int) -> str:
    """Expected output of ``docs_shuffle``: per-row SplitMix64 in plain
    Python ints, a sequential sort per shard — no exchange, no numpy
    hashing."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()]
    rows = [(_splitmix64_int(i % (1 << 64)), i) for i in ids]
    by_shard: dict[int, list] = {}
    for h, i in rows:
        by_shard.setdefault(h % n_shards, []).append((h, i))
    oid, osh, opos = [], [], []
    for sh, members in by_shard.items():
        for pos, (h, i) in enumerate(sorted(members)):
            oid.append(i)
            osh.append(sh)
            opos.append(pos)
    tbl = pa.table({"doc_id": pa.array(oid, pa.int64()),
                    "shard": pa.array(osh, pa.int64()),
                    "pos": pa.array(opos, pa.int64())})
    return _write(tbl, "docs_shuffle")


def write_golden_pca(sf_dir: str, *, n_components: int) -> str:
    """Expected output of ``embed_pca``: per-row Python-int moment
    accumulation (no chunked matmul), the same mean/cov/eigh/sign spec,
    per-row np.dot projections. The exact-integer moments guarantee the
    eigensolver sees identical bits; projections agree to ~1e-15."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    FIX = float(1 << 20)
    q = np.rint(np.asarray(t.column("embedding").to_pylist(),
                           dtype=np.float64) * FIX).astype(np.int64)
    n, d = q.shape
    s1 = [0] * d
    s2 = [[0] * d for _ in range(d)]
    for row in q:                      # plain Python ints — exact
        r = [int(x) for x in row]
        for i in range(d):
            s1[i] += r[i]
            for j in range(d):
                s2[i][j] += r[i] * r[j]
    m = np.array(s1, dtype=np.float64) / n
    cov = np.array(s2, dtype=np.float64) / n - np.outer(m, m)
    w, v = np.linalg.eigh(cov)
    comp = np.ascontiguousarray(v[:, ::-1][:, :n_components].T)
    flip = comp[np.arange(len(comp)),
                np.argmax(np.abs(comp), axis=1)] < 0
    comp[flip] *= -1.0
    mean = m / FIX
    cols = {"vec_id": pa.array(ids, pa.int64())}
    proj = np.stack([(row / FIX - mean) @ comp.T for row in q])
    for j in range(n_components):
        cols[f"pc{j}"] = pa.array(proj[:, j], pa.float64())
    return _write(pa.table(cols), "embed_pca")


def write_golden_hll(sf_dir: str, *, p: int) -> str:
    """Expected output of ``corpus_vocab_sketch``: a sequential per-word
    HyperLogLog — Python-int register updates (int.bit_length, no numpy
    vector kernels) and a left-to-right register-sum loop. Shares only
    the word hash primitive (pd.util.hash_array — the whole text family's
    tokenizer/hash spec) with the batched kernel; the register/estimate
    logic is independent (datapipe/sketch.py must match bit-exactly)."""
    import math
    import re

    import pandas as pd
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["text"])
    m = 1 << p
    reg = [0] * m
    mask64 = (1 << 64) - 1
    word_re = re.compile(r"[a-z0-9_]+")
    for txt in t.column("text").to_pylist():
        words = word_re.findall(txt.lower())
        if not words:
            continue
        hs = _hash_pure(np.array(words, dtype=object))
        for h in hs.tolist():
            idx = h >> (64 - p)
            rest = (h << p) & mask64
            rho = (64 - rest.bit_length() + 1) if rest else (64 - p) + 1
            if rho > reg[idx]:
                reg[idx] = rho
    alpha = 0.7213 / (1.0 + 1.079 / m)
    acc = 0.0
    for r in reg:
        acc += 2.0 ** (-r)
    raw = alpha * m * m / acc
    zeros = sum(1 for r in reg if r == 0)
    if raw <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    else:
        est = raw
    tbl = pa.table({"m": pa.array([m], pa.int64()),
                    "n_vocab_est": pa.array([est], pa.float64())})
    return _write(tbl, "corpus_vocab_sketch")


def write_golden_quantized(sf_dir: str, *, n_queries: int, k: int) -> str:
    """Expected output of ``embed_quantized_topk``: sequential full-scan
    search over int8-quantized vectors — per-query Python loop, explicit
    integer dots, no batching/exchange. Shares only the per-row quantize
    primitive (`ann._quantize_rows` — row-wise ops, identical results at
    any call shape) with the distributed path; scoring/ranking here is
    independent. Scores are exact-int dots × two scales, so they are
    bit-identical to the distributed run and ranks hash-match."""
    import pyarrow.parquet as pq

    from ..datapipe.ann import _quantize_rows

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    codes, scale = _quantize_rows(mat)
    codes32 = codes.astype(np.int32)
    qids = np.arange(n_queries)        # query_id = position, as in topk
    qcodes, qscale = codes32[:n_queries], scale[:n_queries]

    out_q, out_v, out_r = [], [], []
    for c in range(len(qids)):
        scores = np.empty(len(ids), np.float64)
        for i in range(len(ids)):
            idot = int(np.dot(codes32[i], qcodes[c]))
            scores[i] = (idot * scale[i]) * qscale[c]
        top = np.lexsort((ids, -scores))[:k]
        out_q.extend([int(qids[c])] * len(top))
        out_v.extend(ids[top].tolist())
        out_r.extend(range(1, len(top) + 1))
    tbl = pa.table({"query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "rank": pa.array(out_r, pa.int64())})
    return _write(tbl, "embed_quantized_topk")


def write_golden_rp(sf_dir: str, *, n_queries: int, k: int, d_out: int,
                    seed: int) -> str:
    """Expected output of ``embed_rp_topk``: sequential full-scan search
    in the ±1 JL projection — one corpus row at a time through the
    shared row-wise grid primitive (`ann._rp_grid` on a 1-row matrix —
    elementwise ops, identical at any call shape; the quantized-golden
    stance), then explicit per-query integer dots and a lexsort. No
    batching, no exchange, no shared ranking code."""
    import pyarrow.parquet as pq

    from ..datapipe.ann import IVF_FIX, _rp_grid, _rp_signs

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    signs = _rp_signs(mat.shape[1], d_out, seed)
    grid = np.empty((len(ids), d_out), dtype=np.float64)
    for i in range(len(ids)):                   # per-row, never blocked
        grid[i] = _rp_grid(mat[i:i + 1], signs)[0]
    qpos = np.argsort(ids, kind="stable")[:n_queries]   # ids sorted: 0..n
    out_q, out_v, out_r = [], [], []
    for c in range(n_queries):
        qv = grid[qpos[c]].astype(np.int64)
        scores = np.empty(len(ids), np.float64)
        for i in range(len(ids)):
            scores[i] = int(np.dot(grid[i].astype(np.int64), qv)) / (
                IVF_FIX * IVF_FIX)
        top = np.lexsort((ids, -scores))[:k]
        out_q.extend([c] * len(top))
        out_v.extend(ids[top].tolist())
        out_r.extend(range(1, len(top) + 1))
    tbl = pa.table({"query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "rank": pa.array(out_r, pa.int64())})
    return _write(tbl, "embed_rp_topk")


def write_golden_bpe(sf_dir: str, *, n_sample: int, n_merges: int,
                     seed: int) -> str:
    """Expected output of ``text_tokens_bpe``: an independent sequential
    BPE — per-doc regex word lists, Counter-based pair counting, per-word
    encode loops (a word→len memo only; no flat arrays, no unique/scatter,
    no broadcast) — over the same spec as datapipe/bpe.py's module
    docstring. Sample = n_sample docs with smallest SplitMix64(id^seed)."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from ..datapipe.ann import _splitmix64

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
    texts = t.column("text").to_pylist()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    texts = [texts[i] for i in order]
    word_re = re.compile(r"[a-z0-9_]+")
    doc_words = [word_re.findall((x or "").lower()) for x in texts]

    h = _splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    samp = sorted(range(len(ids)), key=lambda i: int(h[i]))[:n_sample]
    freq = Counter()
    for i in samp:
        freq.update(doc_words[i])

    # -- train: naive spec loops
    vocab = {w: list(w) for w in freq if w}

    def merge_once(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    merges = []
    for _ in range(n_merges):
        pc_ = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc_[(syms[i], syms[i + 1])] += freq[w]
        if not pc_:
            break
        pair, cnt = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append(pair)
        for w in list(vocab):
            vocab[w] = merge_once(vocab[w], pair[0], pair[1])
    rank = {p: r for r, p in enumerate(merges)}

    memo: dict[str, int] = {}

    def enc_len(w: str) -> int:
        # heavy-tail cap: identical SPEC constant as the pipeline
        # (datapipe/bpe.py BPE_MAX_WORD_CHARS) — capped prefix encodes,
        # each excess char is one token
        from ..datapipe.bpe import BPE_MAX_WORD_CHARS

        tail = 0
        if len(w) > BPE_MAX_WORD_CHARS:
            tail = len(w) - BPE_MAX_WORD_CHARS
            w = w[:BPE_MAX_WORD_CHARS]
        v = memo.get(w)
        if v is not None:
            return v + tail
        syms = list(w)
        while len(syms) > 1:
            cand = [(rank[(syms[i], syms[i + 1])], i)
                    for i in range(len(syms) - 1)
                    if (syms[i], syms[i + 1]) in rank]
            if not cand:
                break
            r = min(cand)[0]
            pair = merges[r]
            syms = merge_once(syms, pair[0], pair[1])
        memo[w] = len(syms)
        return len(syms) + tail

    n_words = [len(ws) for ws in doc_words]
    n_bpe = [sum(enc_len(w) for w in ws) for ws in doc_words]
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "n_words": pa.array(n_words, pa.int64()),
                    "n_tokens_bpe": pa.array(n_bpe, pa.int64())})
    return _write(tbl, "text_tokens_bpe")


def write_golden_quality_model(sf_dir: str, *, seed: int) -> str:
    """Expected output of ``text_quality_model``: a sequential per-doc
    scorer — regex word lists, per-word hash→bucket lookups, Python-int
    logit accumulation — sharing only the SPEC constants (weight formula,
    W_DIM/W_RANGE, the rounded sigmoid) with the actor-pool pipeline.
    Exact because weights and counts are integers; the sigmoid rounds to
    1e-12 on both sides (datapipe/quality_model.py docstring)."""
    import re

    import pandas as pd
    import pyarrow.parquet as pq

    from ..datapipe.ann import _splitmix64
    from ..datapipe.quality_model import W_DIM, W_RANGE

    b = np.arange(W_DIM, dtype=np.uint64)
    w = (_splitmix64(b ^ np.uint64(seed))
         % np.uint64(2 * W_RANGE + 1)).astype(np.int64) - W_RANGE

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
    texts = t.column("text").to_pylist()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    texts = [texts[i] for i in order]
    word_re = re.compile(r"[a-z0-9_]+")

    n_words_out, logit_out = [], []
    for x in texts:
        ws = word_re.findall((x or "").lower())
        logit = 0
        if ws:
            # one hash_array per doc (element-wise stable); the logit
            # accumulation stays a Python-int loop
            hs = _hash_pure(
                np.array(ws, dtype=object)).astype(np.uint64)
            bs = _splitmix64(hs) % np.uint64(W_DIM)
            for bb in bs:
                logit += int(w[int(bb)])
        n_words_out.append(len(ws))
        logit_out.append(logit)
    # ONE vectorized np.exp over the collected logit array — the same SIMD
    # array kernel the pipeline uses, so the published rounded score can
    # never flake on a per-scalar-vs-array 1-ulp exp difference (the
    # logits themselves are exact integers derived independently above)
    logit_arr = np.array(logit_out, dtype=np.float64)
    n_arr = np.maximum(np.array(n_words_out, dtype=np.int64), 1)
    score_out = np.round(
        1.0 / (1.0 + np.exp(-logit_arr / (n_arr * float(W_RANGE)))), 12)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "n_words": pa.array(n_words_out, pa.int64()),
                    "logit_q": pa.array(logit_out, pa.int64()),
                    "model_quality": pa.array(score_out, pa.float64())})
    return _write(tbl, "text_quality_model")


def write_golden_cms(sf_dir: str, probe_words: list[str], *, depth: int,
                     width: int) -> str:
    """Expected output of ``corpus_word_cms``: a sequential Count-Min —
    per-doc regex word lists, one counter increment per word occurrence
    per row in a plain Python loop (no flat arrays, no np.add.at, no
    batch blobs). Bit-identical to the distributed sketch BY CONSTRUCTION
    because counters are exact integer sums (any combine topology gives
    the same array) and the row-index function is the shared spec
    (datapipe/sketch.py::_cms_index)."""
    import re

    import pandas as pd
    import pyarrow.parquet as pq

    from ..datapipe.sketch import _cms_index

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
    texts = t.column("text").to_pylist()
    order = np.argsort(ids, kind="stable")
    texts = [texts[i] for i in order]
    word_re = re.compile(r"[a-z0-9_]+")

    cms = [[0] * width for _ in range(depth)]
    for x in texts:
        ws = word_re.findall((x or "").lower())
        if not ws:
            continue
        hs = _hash_pure(
            np.array(ws, dtype=object)).astype(np.uint64)
        for j in range(depth):
            # one spec-function call per (doc, row); the counter
            # increments stay a plain Python loop
            for ix in _cms_index(hs, j, width):
                cms[j][int(ix)] += 1

    out_w, out_e = [], []
    for w in probe_words:
        h = _hash_pure(
            np.array([w], dtype=object)).astype(np.uint64)
        est = min(cms[j][int(_cms_index(h, j, width)[0])]
                  for j in range(depth))
        out_w.append(w)
        out_e.append(est)
    tbl = pa.table({"word": pa.array(out_w, pa.string()),
                    "est": pa.array(out_e, pa.int64())})
    return _write(tbl, "corpus_word_cms")


def write_golden_group_hll(sf_dir: str, *, key_col: str, val_col: str,
                           p: int) -> str:
    """Expected output of ``events_user_hll``: a sequential per-row
    grouped HyperLogLog — Python-int register updates (int.bit_length)
    into one register list per key and a left-to-right register-sum
    loop per key. Shares only the value-hash primitive
    (pd.util.hash_array over the int64 column — elementwise-stable, so
    one vectorized call here equals the kernel's per-batch calls) with
    the batched kernel (datapipe/sketch.py::hll_group_distinct), which
    must match bit-exactly."""
    import math

    import pandas as pd
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=[key_col, val_col])
    m = 1 << p
    mask64 = (1 << 64) - 1
    keys = t.column(key_col).to_pylist()
    hs = _hash_pure(
        t.column(val_col).to_numpy(zero_copy_only=False)).tolist()
    regs: dict = {}
    for kk, h in zip(keys, hs):
        reg = regs.setdefault(kk, [0] * m)
        idx = h >> (64 - p)
        rest = (h << p) & mask64
        rho = (64 - rest.bit_length() + 1) if rest else (64 - p) + 1
        if rho > reg[idx]:
            reg[idx] = rho
    alpha = 0.7213 / (1.0 + 1.079 / m)
    ks, ests = sorted(regs), []
    for kk in ks:
        acc = 0.0
        for r in regs[kk]:
            acc += 2.0 ** (-r)
        raw = alpha * m * m / acc
        zeros = sum(1 for r in regs[kk] if r == 0)
        ests.append(m * math.log(m / zeros)
                    if raw <= 2.5 * m and zeros > 0 else raw)
    tbl = pa.table({key_col: pa.array(ks, pa.string()),
                    "m": pa.array([m] * len(ks), pa.int64()),
                    "n_est": pa.array(ests, pa.float64())})
    return _write(tbl, "events_user_hll")


def write_golden_compress(sf_dir: str, *, level: int) -> str:
    """Expected output of ``text_compress_ratio``: a sequential per-row
    loop over the documents table computing len(zlib.compress(utf8)) —
    zlib at a fixed level is the shared deterministic primitive (like
    pd.util.hash_array for the hash family); the batching/rounding
    around it is what the distributed kernel must reproduce."""
    import zlib

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids, nraw, ncmp = [], [], []
    for did, txt in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
        b = txt.encode("utf-8")
        ids.append(did)
        nraw.append(len(b))
        ncmp.append(len(zlib.compress(b, level)))
    # lengths accumulate sequentially above; the ratio rounding uses the
    # SAME np.round primitive as the kernel (np.round and Python
    # round(x, 6) are not the same decimal rounding — the
    # quality-model/ADVICE lesson: share the elementwise primitive,
    # derive the inputs independently)
    nr = np.array(nraw, np.int64)
    nc = np.array(ncmp, np.int64)
    ratio = np.round(np.where(nr > 0, nc / np.maximum(nr, 1), 1.0), 6)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "n_bytes": pa.array(nr, pa.int64()),
                    "n_deflate": pa.array(nc, pa.int64()),
                    "ratio": pa.array(ratio, pa.float64())})
    return _write(tbl, "text_compress_ratio")


def write_golden_cdc(sf_dir: str, *, bits: int, min_size: int,
                     max_size: int) -> str:
    """Expected output of ``dedup.cdc_chunk_stats``: a per-BYTE
    sequential walk of each document (gear rolling hash h = h*2 +
    GEAR[b] mod 2^64, candidate cut when h's low ``bits`` are zero,
    min/max-size chunk walk, final partial kept), then a brute
    hash→distinct-docs dict marking duplicated chunks. GEAR is the
    SplitMix64 finalizer of (byte+1), computed here with Python ints;
    the only shared elementwise primitive is pd.util.hash_array for
    the chunk-content id (the hash-family stance)."""
    import pandas as pd
    import pyarrow.parquet as pq

    M64 = (1 << 64) - 1

    def _smix(v: int) -> int:
        v = (v + 0x9E3779B97F4A7C15) & M64
        v = ((v ^ (v >> 30)) * 0xBF58476D1CE4E5B9) & M64
        v = ((v ^ (v >> 27)) * 0x94D049BB133111EB) & M64
        return v ^ (v >> 31)

    gear = [_smix(b + 1) for b in range(256)]
    cmask = (1 << bits) - 1

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    per_doc: dict[int, list[tuple[int, int]]] = {}   # doc -> [(hash, len)]
    owners: dict[int, set[int]] = {}                 # chunk hash -> docs
    for did, txt in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
        data = txt.encode("utf-8")
        chunks: list[bytes] = []
        h = 0
        start = 0
        for j, b in enumerate(data):
            h = (h * 2 + gear[b]) & M64
            clen = j + 1 - start
            if (clen == max_size
                    or ((h & cmask) == 0 and clen >= min_size)):
                chunks.append(data[start:j + 1])
                start = j + 1
        if len(data) > start:
            chunks.append(data[start:])
        hashes = (_hash_pure(np.array(chunks, dtype=object))
                  .astype(np.uint64) if chunks else np.array([], np.uint64))
        rows = []
        for c, g in zip(chunks, hashes):
            rows.append((int(g), len(c)))
            owners.setdefault(int(g), set()).add(did)
        per_doc[did] = rows

    ids = sorted(per_doc)
    nch, nby, dch, dby = [], [], [], []
    for did in ids:
        rows = per_doc[did]
        nch.append(len(rows))
        nby.append(sum(ln for _, ln in rows))
        dup = [(g, ln) for g, ln in rows if len(owners[g]) >= 2]
        dch.append(len(dup))
        dby.append(sum(ln for _, ln in dup))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "n_chunks": pa.array(nch, pa.int64()),
                    "n_bytes": pa.array(nby, pa.int64()),
                    "n_dup_chunks": pa.array(dch, pa.int64()),
                    "n_dup_bytes": pa.array(dby, pa.int64())})
    return _write(tbl, "dedup_cdc")


def write_golden_entropy(sf_dir: str) -> str:
    """Expected output of ``textstats.byte_entropy``: byte counts from
    a sequential per-doc Python loop (collections.Counter over the
    utf-8 bytes), then the SAME ``_entropy_from_counts`` float kernel
    over the independently-derived count matrix — identical kernel,
    independent inputs (the quality-model stance)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from ..datapipe.textstats import _entropy_from_counts

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids, nby, dby = [], [], []
    rows = []
    for did, txt in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
        b = txt.encode("utf-8")
        c = Counter(b)
        row = np.zeros(256, np.int64)
        for byte, k in c.items():
            row[byte] = k
        ids.append(did)
        nby.append(len(b))
        dby.append(len(c))
        rows.append(row)
    cnt = (np.stack(rows) if rows else np.zeros((0, 256), np.int64))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "n_bytes": pa.array(nby, pa.int64()),
                    "distinct_bytes": pa.array(dby, pa.int64()),
                    "entropy": pa.array(_entropy_from_counts(cnt),
                                        pa.float64())})
    return _write(tbl, "text_entropy")


def write_golden_cdc_coverage(sf_dir: str, *, split_id: int, bits: int,
                              min_size: int, max_size: int) -> str:
    """Expected output of ``dedup.cdc_coverage_vs_prior`` with the
    prior corpus = docs with doc_id < split_id and the new corpus = the
    rest: the same per-byte sequential gear walk as
    ``write_golden_cdc``, a plain Python set of prior chunk hashes, and
    per-new-doc covered chunk/byte sums."""
    import pandas as pd
    import pyarrow.parquet as pq

    M64 = (1 << 64) - 1

    def _smix(v: int) -> int:
        v = (v + 0x9E3779B97F4A7C15) & M64
        v = ((v ^ (v >> 30)) * 0xBF58476D1CE4E5B9) & M64
        v = ((v ^ (v >> 27)) * 0x94D049BB133111EB) & M64
        return v ^ (v >> 31)

    gear = [_smix(b + 1) for b in range(256)]
    cmask = (1 << bits) - 1

    def walk(txt: str) -> list[tuple[int, int]]:
        data = txt.encode("utf-8")
        chunks: list[bytes] = []
        h = 0
        start = 0
        for j, b in enumerate(data):
            h = (h * 2 + gear[b]) & M64
            clen = j + 1 - start
            if (clen == max_size
                    or ((h & cmask) == 0 and clen >= min_size)):
                chunks.append(data[start:j + 1])
                start = j + 1
        if len(data) > start:
            chunks.append(data[start:])
        hashes = (_hash_pure(np.array(chunks, dtype=object))
                  .astype(np.uint64) if chunks else [])
        return [(int(g), len(c)) for c, g in zip(chunks, hashes)]

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    prior: set[int] = set()
    new_rows: dict[int, list[tuple[int, int]]] = {}
    for did, txt in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
        rows = walk(txt)
        if did < split_id:
            prior.update(g for g, _ in rows)
        else:
            new_rows[did] = rows
    ids = sorted(new_rows)
    nch, nby, cch, cby = [], [], [], []
    for did in ids:
        rows = new_rows[did]
        cov = [(g, ln) for g, ln in rows if g in prior]
        nch.append(len(rows))
        nby.append(sum(ln for _, ln in rows))
        cch.append(len(cov))
        cby.append(sum(ln for _, ln in cov))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "n_chunks": pa.array(nch, pa.int64()),
                    "n_bytes": pa.array(nby, pa.int64()),
                    "cov_chunks": pa.array(cch, pa.int64()),
                    "cov_bytes": pa.array(cby, pa.int64())})
    return _write(tbl, "dedup_cdc_incremental")


def write_golden_mmr(sf_dir: str, *, n_queries: int, k: int,
                     shortlist: int) -> str:
    """Expected output of ``embed_mmr``: a sequential MMR — per-row
    unit-grid quantization (one row at a time; ``_unit_grid``'s ops are
    elementwise IEEE, so single-row calls equal the batched broadcast),
    per-candidate integer-dot loops, an explicit python greedy over the
    (rel desc, id asc) shortlist. Exact because every relevance and
    pairwise similarity is an integer grid dot and the published floats
    divide by 2^28 (exact binary division) — the quantized-topk stance."""
    import pyarrow.parquet as pq

    from ..datapipe.ann import _unit_grid

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    raw = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    ids, raw = ids[order], raw[order]
    grid = np.empty_like(raw)
    for i in range(len(raw)):                     # per-row, sequential
        grid[i] = _unit_grid(raw[i:i + 1])[0]
    gi = grid.astype(np.int64)
    # queries = the n smallest vec_ids through the float32 query path
    q32 = raw[:n_queries].astype(np.float32).astype(np.float64)
    qgrid = np.empty_like(q32)
    for c in range(n_queries):
        qgrid[c] = _unit_grid(q32[c:c + 1])[0]
    qi = qgrid.astype(np.int64)
    scale = float(1 << 28)

    out = []
    for c in range(n_queries):
        rel = {}
        for i in range(len(ids)):
            rel[int(ids[i])] = int(np.dot(gi[i], qi[c]))
        short = sorted(rel, key=lambda d: (-rel[d], d))[:shortlist]
        sel: list[int] = []
        maxsim = {d: 0 for d in short}
        pos = {int(ids[i]): i for i in range(len(ids))}
        for rank in range(1, min(k, len(short)) + 1):
            best, best_key = None, None
            for d in short:
                if d in sel:
                    continue
                key = rel[d] if rank == 1 else rel[d] - maxsim[d]
                if best is None or key > best_key or \
                        (key == best_key and d < best):
                    best, best_key = d, key
            sel.append(best)
            out.append((c, best, rank, rel[best] / scale,
                        best_key / scale))
            for d in short:
                s = int(np.dot(gi[pos[d]], gi[pos[best]]))
                maxsim[d] = s if rank == 1 else max(maxsim[d], s)
    tbl = pa.table({
        "query_id": pa.array([r[0] for r in out], pa.int64()),
        "vec_id": pa.array([r[1] for r in out], pa.int64()),
        "rank": pa.array([r[2] for r in out], pa.int64()),
        "relevance": pa.array([r[3] for r in out], pa.float64()),
        "mmr": pa.array([r[4] for r in out], pa.float64())})
    return _write(tbl, "embed_mmr")


def write_golden_pq(sf_dir: str, *, n_queries: int, k: int, m_sub: int,
                    n_codes: int, rerank: int, sample_size: int,
                    seed: int) -> str:
    """Expected output of ``embed_pq_topk``: a sequential product-
    quantization search — per-row unit-grid quantization, SplitMix64
    smallest-k sample (same spec function), per-subspace Lloyd's with
    per-point code scans (strict ``<`` keeps the LOWEST code, matching
    numpy argmin's first-occurrence), per-row encoding scans, per-query
    ADC sums and an explicit global (adc desc, id) shortlist → exact-dot
    rerank. Bit-identical to the distributed run BY CONSTRUCTION: every
    distance/score term on both sides is an exact integer in float64
    (grid coords ≤ 2^14), and the one float op per centroid update —
    ``rint(S / n)`` — is the same elementwise IEEE division
    (datapipe/ann.py::_pq_train docstring)."""
    import pyarrow.parquet as pq

    from ..datapipe.ann import _pq_bounds, _splitmix64, _unit_grid

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    raw = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    ids, raw = ids[order], raw[order]
    grid = np.empty_like(raw)
    for i in range(len(raw)):                     # per-row, sequential
        grid[i] = _unit_grid(raw[i:i + 1])[0]
    # queries = the n smallest vec_ids through the float32 query path
    q32 = raw[:n_queries].astype(np.float32).astype(np.float64)
    qgrid = np.empty_like(q32)
    for c in range(n_queries):
        qgrid[c] = _unit_grid(q32[c:c + 1])[0]

    d = grid.shape[1]
    bounds = _pq_bounds(d, m_sub)
    h = _splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    samp_order = sorted(range(len(ids)),
                        key=lambda i: (int(h[i]), int(ids[i])))
    samp = [grid[i] for i in samp_order[:sample_size]]

    books = []
    for s in range(m_sub):
        sub = [v[bounds[s]:bounds[s + 1]] for v in samp]
        C = [sub[c].copy() for c in range(min(n_codes, len(sub)))]
        for _ in range(8):
            sums = [np.zeros(bounds[s + 1] - bounds[s]) for _ in C]
            cnts = [0] * len(C)
            for x in sub:
                best, best_d = 0, None
                for c in range(len(C)):
                    cc = sum(int(v) * int(v) for v in C[c])
                    dv = cc - 2 * int(np.dot(x, C[c]))   # exact ints
                    if best_d is None or dv < best_d:
                        best, best_d = c, dv
                sums[best] += x
                cnts[best] += 1
            for c in range(len(C)):
                if cnts[c]:
                    C[c] = np.rint(sums[c] / cnts[c])
        books.append(C)

    def encode_row(v):
        code = []
        for s in range(m_sub):
            x = v[bounds[s]:bounds[s + 1]]
            best, best_d = 0, None
            for c in range(len(books[s])):
                cb = books[s][c]
                cc = sum(int(w) * int(w) for w in cb)
                dv = cc - 2 * int(np.dot(x, cb))
                if best_d is None or dv < best_d:
                    best, best_d = c, dv
            code.append(best)
        return code

    codes = [encode_row(grid[i]) for i in range(len(ids))]

    oq, ov, oc, orr = [], [], [], []
    for qn in range(n_queries):
        adc = []
        for i in range(len(ids)):
            s_tot = 0
            for s in range(m_sub):
                qs = qgrid[qn][bounds[s]:bounds[s + 1]]
                s_tot += int(np.dot(books[s][codes[i][s]], qs))
            adc.append((s_tot, int(ids[i]), i))
        adc.sort(key=lambda r: (-r[0], r[1]))
        short = adc[:rerank]
        exact = [(int(np.dot(grid[i], qgrid[qn])), vid)
                 for _, vid, i in short]
        exact.sort(key=lambda r: (-r[0], r[1]))
        for rank, (dot, vid) in enumerate(exact[:k], 1):
            oq.append(qn)
            ov.append(vid)
            oc.append(float(dot))
            orr.append(rank)
    tbl = pa.table({"query_id": pa.array(oq, pa.int64()),
                    "vec_id": pa.array(ov, pa.int64()),
                    "cosine": pa.array(oc, pa.float64()),
                    "rank": pa.array(orr, pa.int64())})
    return _write(tbl, "embed_pq_topk")


def write_golden_ivfpq(sf_dir: str, *, n_queries: int, k: int,
                       n_cells: int, nprobe: int, m_sub: int,
                       n_codes: int, rerank: int, sample_size: int,
                       seed: int) -> str:
    """Expected output of ``embed_ivfpq_index``: a sequential IVF-PQ —
    the ivf golden's per-point kmeans, residual codebooks via per-point
    Lloyd scans (strict ``<`` keeps the lowest code), per-row cell
    assignment + residual encoding scans, and per-query ADC
    (q·cent_cell + Σ_s book dots, all exact python ints) over the
    probed cells' members with explicit global sorts. Bit-identical to
    the distributed index BY CONSTRUCTION: every term on both sides is
    an exact integer in float64 (grid coords ≤ 2^14, residuals ≤ 2^15)
    and the centroid updates share the one IEEE division
    (ann.py::build_ivfpq_index / search_ivfpq_index docstrings)."""
    import pyarrow.parquet as pq

    from ..datapipe.ann import IVF_FIX, _pq_bounds, _splitmix64

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    ids, vecs = ids[order], vecs[order]
    unit = np.empty_like(vecs)
    for i in range(len(vecs)):           # sequential per-row grid spec
        g = np.rint(vecs[i] * IVF_FIX)
        ss = sum(int(c) * int(c) for c in g)       # exact Python ints
        n = float(np.sqrt(float(ss))) if ss else 1.0
        unit[i] = np.rint(g / n * IVF_FIX)
    q32 = vecs[:n_queries].astype(np.float32).astype(np.float64)
    qgrid = np.empty_like(q32)
    for c in range(n_queries):
        g = np.rint(q32[c] * IVF_FIX)
        ss = sum(int(v) * int(v) for v in g)
        n = float(np.sqrt(float(ss))) if ss else 1.0
        qgrid[c] = np.rint(g / n * IVF_FIX)

    h = _splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    samp_order = sorted(range(len(ids)),
                        key=lambda i: (int(h[i]), int(ids[i])))
    samp = [unit[i] for i in samp_order[:sample_size]]

    cent = [samp[c].copy() for c in range(min(n_cells, len(samp)))]
    for _ in range(8):
        sums = [np.zeros(vecs.shape[1]) for _ in cent]
        cnts = [0] * len(cent)
        for v in samp:
            best, best_s = 0, -np.inf
            for c in range(len(cent)):
                s = float(np.dot(v, cent[c]))      # exact integer dot
                if s > best_s:
                    best, best_s = c, s
            sums[best] += v
            cnts[best] += 1
        for c in range(len(cent)):
            if cnts[c]:
                S = sums[c]
                ss = sum(int(x) * int(x) for x in S)
                if ss > 0:
                    cent[c] = np.rint(S / np.sqrt(float(ss)) * IVF_FIX)

    def cell_of(v):
        best, best_s = 0, -np.inf
        for c in range(len(cent)):
            s = float(np.dot(v, cent[c]))
            if s > best_s:
                best, best_s = c, s
        return best

    d = vecs.shape[1]
    bounds = _pq_bounds(d, m_sub)
    resid_samp = [v - cent[cell_of(v)] for v in samp]

    books = []
    for s in range(m_sub):
        sub = [r[bounds[s]:bounds[s + 1]] for r in resid_samp]
        C = [sub[c].copy() for c in range(min(n_codes, len(sub)))]
        for _ in range(8):
            sums = [np.zeros(bounds[s + 1] - bounds[s]) for _ in C]
            cnts = [0] * len(C)
            for x in sub:
                best, best_d = 0, None
                for c in range(len(C)):
                    cc = sum(int(v) * int(v) for v in C[c])
                    dv = cc - 2 * int(np.dot(x, C[c]))   # exact ints
                    if best_d is None or dv < best_d:
                        best, best_d = c, dv
                sums[best] += x
                cnts[best] += 1
            for c in range(len(C)):
                if cnts[c]:
                    C[c] = np.rint(sums[c] / cnts[c])
        books.append(C)

    assign = np.empty(len(ids), dtype=np.int64)
    codes = []
    for i in range(len(ids)):
        cc_i = cell_of(unit[i])
        assign[i] = cc_i
        r = unit[i] - cent[cc_i]
        code = []
        for s in range(m_sub):
            x = r[bounds[s]:bounds[s + 1]]
            best, best_d = 0, None
            for c in range(len(books[s])):
                cb = books[s][c]
                cc = sum(int(w) * int(w) for w in cb)
                dv = cc - 2 * int(np.dot(x, cb))
                if best_d is None or dv < best_d:
                    best, best_d = c, dv
            code.append(best)
        codes.append(code)

    oq, ov, oc, orr = [], [], [], []
    for qn in range(n_queries):
        sims = [(float(np.dot(qgrid[qn], cent[c])), c)
                for c in range(len(cent))]
        cells = [c for _, c in
                 sorted(sims, key=lambda sc: (-sc[0], sc[1]))][:nprobe]
        cand = []
        for i in range(len(ids)):
            if assign[i] not in cells:
                continue
            s_tot = int(np.dot(qgrid[qn], cent[assign[i]]))
            for s in range(m_sub):
                qs = qgrid[qn][bounds[s]:bounds[s + 1]]
                s_tot += int(np.dot(books[s][codes[i][s]], qs))
            cand.append((s_tot, int(ids[i]), i))
        cand.sort(key=lambda r: (-r[0], r[1]))
        short = cand[:rerank]
        exact = [(int(np.dot(unit[i], qgrid[qn])), vid)
                 for _, vid, i in short]
        exact.sort(key=lambda r: (-r[0], r[1]))
        for rank, (dot, vid) in enumerate(exact[:k], 1):
            oq.append(qn)
            ov.append(vid)
            oc.append(float(dot))
            orr.append(rank)
    tbl = pa.table({"query_id": pa.array(oq, pa.int64()),
                    "vec_id": pa.array(ov, pa.int64()),
                    "cosine": pa.array(oc, pa.float64()),
                    "rank": pa.array(orr, pa.int64())})
    return _write(tbl, "embed_ivfpq_index")


def write_golden_embed_outliers(sf_dir: str, *, k: int, n_iters: int,
                                q: float, bucket_shift: int) -> str:
    """Expected output of ``embed_outliers``: the sequential fixed-point
    kmeans of ``write_golden_kmeans`` (per-row |x−c|² scans, integer
    sums) followed by a sequential replay of the bucket-quantile fence —
    per-row exact-integer d² to the OWN centroid, bucket = d² >> shift,
    per-cluster threshold bucket at the exact-rational rank
    ceil(q·n), outlier iff bucket strictly greater. Every quantity on
    both sides is an exact integer (coords ≤ 2^20, d² ≤ 2^48) and the
    rank arithmetic is rational — bit-identical by construction."""
    import math
    from fractions import Fraction

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    qm = np.rint(np.asarray(t.column("embedding").to_pylist(),
                            dtype=np.float64) * float(1 << 20))
    order = np.argsort(ids, kind="stable")
    ids, qm = ids[order], qm[order]
    hashes = np.array([_splitmix64_int(int(np.uint64(i))) for i in ids],
                      dtype=np.uint64)
    seed_rows = np.argsort(hashes, kind="stable")[:k]
    cent = qm[seed_rows].copy()

    def assign_row(x):
        best, best_d = 0, None
        for j in range(len(cent)):
            diff = x - cent[j]
            d2 = float(diff @ diff)
            if best_d is None or d2 < best_d:
                best, best_d = j, d2
        return best, best_d

    for _ in range(n_iters):
        sums = np.zeros_like(cent)
        counts = np.zeros(len(cent), dtype=np.int64)
        for i in range(len(qm)):
            a, _ = assign_row(qm[i])
            sums[a] += qm[i]
            counts[a] += 1
        for j in range(len(cent)):
            if counts[j]:
                cent[j] = np.rint(sums[j] / counts[j])

    assign = np.empty(len(ids), np.int64)
    d2s = np.empty(len(ids), np.int64)
    for i in range(len(qm)):
        a, d2 = assign_row(qm[i])
        assign[i] = a
        d2s[i] = int(d2)

    bkts = d2s >> bucket_shift
    thr = {}
    for cl in range(len(cent)):
        sel = np.flatnonzero(assign == cl)
        if not len(sel):
            continue
        h = {}
        for b in bkts[sel]:
            h[int(b)] = h.get(int(b), 0) + 1
        n = len(sel)
        rank = max(1, math.ceil(Fraction(str(float(q))) * n))
        cum = 0
        for b in sorted(h):
            cum += h[b]
            if cum >= rank:
                thr[cl] = b
                break
    oi, oc, od = [], [], []
    for i in range(len(ids)):
        if int(bkts[i]) > thr[int(assign[i])]:
            oi.append(int(ids[i]))
            oc.append(int(assign[i]))
            od.append(int(d2s[i]))
    tbl = pa.table({"vec_id": pa.array(oi, pa.int64()),
                    "cluster": pa.array(oc, pa.int64()),
                    "d2": pa.array(od, pa.int64())})
    return _write(tbl, "embed_outliers")


def _phash_sequential(payload: bytes) -> int:
    """Sequential per-image pHash derivation (the golden's independent
    composition of the spec steps: per-scalar luma over the resize index
    selection, einsum DCT over the shared fixed-point spec matrix —
    exact int64, so evaluation order can't split the sides — Python
    sorted()/bit loops for median + hash)."""
    from ..datapipe.multimodal import decode_image
    from ..datapipe.phash import PHASH_SIZE, _dct32_q

    d = _dct32_q()
    img = decode_image(payload)
    h, w = img.shape[:2]
    yi = [min((y * h) // PHASH_SIZE, h - 1) for y in range(PHASH_SIZE)]
    xi = [min((x * w) // PHASH_SIZE, w - 1) for x in range(PHASH_SIZE)]
    small = np.empty((PHASH_SIZE, PHASH_SIZE), dtype=np.int64)
    for a, y in enumerate(yi):
        for b, x in enumerate(xi):
            rr, gg, bb = (int(img[y, x, 0]), int(img[y, x, 1]),
                          int(img[y, x, 2]))
            small[a, b] = (77 * rr + 150 * gg + 29 * bb) >> 8
    t = np.einsum("kx,xy,ly->kl", d, small, d)
    block = [int(v) for v in t[:8, :8].reshape(-1)]
    med = sorted(block)[31]
    v = 0
    for i, c in enumerate(block):
        if c > med:
            v |= 1 << i
    return v


def write_golden_phash(n: int, seed: int, *, max_hamming: int) -> str:
    """Expected output of ``dedup_phash``: per-image SEQUENTIAL pHash
    derivation (per-scalar luma on the spec's resize index selection,
    einsum DCT over the shared fixed-point spec matrix ``_dct32_q()`` —
    exact int64, so evaluation order can't split the sides; Python
    sorted()/bit loops for median + hash) plus a brute-force O(n²)
    Hamming scan — no banding, no batched kernel, no exchange. Decode
    goes through the shared codec boundary, whose correctness the
    multimodal goldens pin with independent format walks."""
    from ..datapipe.phash import synth_phash_media

    corpus = synth_phash_media(n, seed=seed)
    ids = np.asarray(corpus.column("media_id").to_pylist(), dtype=np.int64)
    sigs = np.array([_phash_sequential(p)
                     for p in corpus.column("payload").to_pylist()],
                    dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids, sigs = ids[order], sigs[order]
    oa, ob, oh = [], [], []
    for i in range(len(ids)):
        ham = _popcount64(sigs[i] ^ sigs[i + 1:])
        for j in np.flatnonzero(ham <= max_hamming):
            oa.append(int(ids[i]))
            ob.append(int(ids[i + 1 + j]))
            oh.append(int(ham[j]))
    tbl = pa.table({"a": pa.array(oa, pa.int64()),
                    "b": pa.array(ob, pa.int64()),
                    "hamming": pa.array(oh, pa.int64())})
    return _write(tbl, "dedup_phash")


def write_golden_pagerank(n_nodes: int, seed: int, *,
                          n_iters: int) -> str:
    """Expected output of ``graph_pagerank``: the exact-integer PageRank
    recurrence (datapipe/graph.py docstring) evaluated SEQUENTIALLY —
    per-edge Python loops, no broadcast, no partial vectors, no Ray.
    Exact int64 arithmetic on both sides makes the comparison bit-exact
    regardless of how the distributed run blocks or reduces."""
    from ..datapipe.graph import PR_GRID, synth_link_graph

    edges = synth_link_graph(n_nodes, seed=seed)
    src = edges.column("src").to_pylist()
    dst = edges.column("dst").to_pylist()
    deg = [0] * n_nodes
    for u in src:
        deg[u] += 1
    r = [PR_GRID] * n_nodes
    s_total = n_nodes * PR_GRID
    d_num, d_den = 85, 100
    base = (d_den - d_num) * (s_total // n_nodes) // d_den
    for _ in range(n_iters):
        contrib = [r[u] // deg[u] if deg[u] else 0 for u in range(n_nodes)]
        dangling = sum(r[u] for u in range(n_nodes) if deg[u] == 0)
        in_v = [0] * n_nodes
        for u, v in zip(src, dst):
            in_v[v] += contrib[u]
        r = [base + d_num * (in_v[v] + dangling // n_nodes) // d_den
             for v in range(n_nodes)]
    tbl = pa.table({"node": pa.array(list(range(n_nodes)), pa.int64()),
                    "rank": pa.array(r, pa.int64())})
    return _write(tbl, "graph_pagerank")


def write_golden_kcore(n_nodes: int, seed: int, *, k: int) -> str:
    """Expected output of ``graph_kcore``: ONE-AT-A-TIME sequential
    peeling with python sets/dicts — repeatedly delete any single node
    of degree < k until none remains (the textbook algorithm). The
    k-core is the unique maximal subgraph with min degree ≥ k, so this
    and the distributed batch-deletion fixpoint agree exactly; final
    (node, in-core degree) rows, node-sorted."""
    from ..datapipe.graph import synth_link_graph

    edges = synth_link_graph(n_nodes, seed=seed)
    adj: dict[int, set[int]] = {}
    for u, v in zip(edges.column("src").to_pylist(),
                    edges.column("dst").to_pylist()):
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for u in list(adj):
            if len(adj[u]) < k:
                for v in adj.pop(u):
                    adj[v].discard(u)
                changed = True
    nodes = sorted(adj)
    tbl = pa.table({"node": pa.array(nodes, pa.int64()),
                    "deg": pa.array([len(adj[u]) for u in nodes],
                                    pa.int64())})
    return _write(tbl, "graph_kcore")


def write_golden_phash_search(n: int, seed: int, *,
                              max_hamming: int) -> str:
    """Expected output of ``dedup_phash_index``: corpus = the base
    images of ``synth_phash_media`` (media_id < n), queries = the
    planted recompression variants (media_id ≥ n); sequential per-image
    hashes + a brute-force query × corpus Hamming scan — no index, no
    partition pruning, no exchange."""
    from ..datapipe.phash import synth_phash_media

    tbl = synth_phash_media(n, seed=seed)
    ids = np.asarray(tbl.column("media_id").to_pylist(), dtype=np.int64)
    sigs = np.array([_phash_sequential(p)
                     for p in tbl.column("payload").to_pylist()],
                    dtype=np.uint64)
    corpus = ids < n
    cids, csig = ids[corpus], sigs[corpus]
    qids, qsig = ids[~corpus], sigs[~corpus]
    oq, oi, oh = [], [], []
    for qpos in np.argsort(qids, kind="stable"):
        ham = _popcount64(qsig[qpos] ^ csig)
        for j in np.flatnonzero(ham <= max_hamming):
            oq.append(int(qids[qpos]))
            oi.append(int(cids[j]))
            oh.append(int(ham[j]))
    tbl_out = pa.table({"query_id": pa.array(oq, pa.int64()),
                        "media_id": pa.array(oi, pa.int64()),
                        "hamming": pa.array(oh, pa.int64())})
    return _write(tbl_out, "dedup_phash_index")


def write_golden_quarantine(n: int, seed: int) -> str:
    """Expected output of ``multimodal_quarantine``: a sequential walk of
    the mixed-health corpus through the same ``decode_image`` fault
    boundary (the boundary IS the spec here — the codecs' decode
    correctness is independently pinned by the multimodal goldens'
    format walks; this gate pins the quarantine classification and that
    the distributed run is layout-invariant)."""
    from ..datapipe.multimodal import decode_image, synth_corrupt_media

    tbl = synth_corrupt_media(n, seed=seed)
    st, er, hh, ww = [], [], [], []
    for p in tbl.column("payload").to_pylist():
        try:
            img = decode_image(p)
            st.append("ok")
            er.append("")
            hh.append(int(img.shape[0]))
            ww.append(int(img.shape[1]))
        except Exception as e:
            st.append("corrupt")
            er.append(type(e).__name__)
            hh.append(0)
            ww.append(0)
    out = pa.table({"media_id": tbl.column("media_id"),
                    "status": pa.array(st, pa.string()),
                    "err": pa.array(er, pa.string()),
                    "height": pa.array(hh, pa.int64()),
                    "width": pa.array(ww, pa.int64())})
    return _write(out, "multimodal_quarantine")


def write_golden_kcenter(sf_dir: str, *, k: int) -> str:
    """Expected output of ``embed_coreset``: a sequential greedy
    k-center (Gonzalez) selection over the ``_unit_grid`` sphere —
    seed = smallest id, then argmin over (max-dot-to-selected, id).
    Shares only the grid spec with the pipeline (``_unit_grid`` is
    elementwise IEEE, identical per-row and vectorized); the greedy
    loop, the maxdot bookkeeping and the tie-break are an independent
    straight-line numpy transcription. Every dot is an exact int64, so
    the trajectory matches cluster.py::kcenter_coreset bit-for-bit."""
    import pyarrow.parquet as pq

    from ..datapipe.ann import _mat, _unit_grid

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    u = _unit_grid(_mat(t, "embedding",
                        dtype=np.float64)[order]).astype(np.int64)
    n = len(ids)
    sentinel = -(1 << 62)
    md = np.full(n, sentinel, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    out_rank, out_id, out_md = [], [], []
    for rank in range(min(k, n)):
        live = np.flatnonzero(alive)
        # argmin by (maxdot, id); ids are sorted so the first minimal
        # maxdot among live rows IS the id tie-break
        i = live[int(np.argmin(md[live]))]
        out_rank.append(rank)
        out_id.append(int(ids[i]))
        out_md.append(int(md[i]))
        alive[i] = False
        md = np.maximum(md, u @ u[i])
    tbl = pa.table({"rank": pa.array(out_rank, pa.int64()),
                    "vec_id": pa.array(out_id, pa.int64()),
                    "maxdot": pa.array(out_md, pa.int64())})
    return _write(tbl, "embed_coreset")


def write_golden_pair_hist(sf_dir: str, *, rate: float = 0.5,
                           n_bins: int = 64) -> str:
    """Expected output of ``embed_pair_hist``: sequential per-anchor
    pair enumeration over the Knuth-hash-sampled subset on the
    ``_unit_grid`` sphere. Shares only the SPEC constants with the
    pipeline (the grid, the Knuth threshold, the integer bin
    expression); the pair walk is an independent per-anchor loop —
    every dot is an exact int64, so the block-pair exchange must match
    bit-for-bit."""
    import pyarrow.parquet as pq

    from ..datapipe.ann import _mat, _unit_grid

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    knuth = np.uint64(2654435761)
    mod32 = np.uint64(1) << np.uint64(32)
    thr = np.uint64(int(min(max(rate, 0.0), 1.0) * float(mod32)))
    keep = ((ids.astype(np.uint64) * knuth) % mod32) < thr
    order = np.argsort(ids[keep], kind="stable")
    u = _unit_grid(_mat(t, "embedding",
                        dtype=np.float64)[keep][order]).astype(np.int64)
    grid2 = np.int64(1) << np.int64(28)
    span = np.int64(1) << np.int64(29)
    counts = np.zeros(n_bins, dtype=np.int64)
    for i in range(1, len(u)):
        dots = (u[:i].astype(np.float64) @ u[i].astype(np.float64)) \
            .astype(np.int64)
        b = np.clip((dots + grid2) * np.int64(n_bins) // span,
                    0, n_bins - 1)
        counts += np.bincount(b, minlength=n_bins)
    nz = np.flatnonzero(counts)
    tbl = pa.table({
        "bin": pa.array(nz.astype(np.int64), pa.int64()),
        "cos_lo": pa.array(nz.astype(np.float64) * (2.0 / n_bins) - 1.0,
                           pa.float64()),
        "n_pairs": pa.array(counts[nz], pa.int64())})
    return _write(tbl, "embed_pair_hist")


def write_golden_cluster_quality(sf_dir: str, *, k: int,
                                 n_iters: int) -> str:
    """Expected output of ``embed_cluster_quality``: the sequential
    per-row Lloyd of ``write_golden_kmeans`` followed by a per-row
    Python-int inertia accumulation (no numpy sums — every d² folds
    into an arbitrary-precision int), mean_d2 = inertia / n as the same
    big-int true division the pipeline performs."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    q = np.rint(np.asarray(t.column("embedding").to_pylist(),
                           dtype=np.float64) * float(1 << 20))
    order = np.argsort(ids, kind="stable")
    ids, q = ids[order], q[order]
    hashes = np.array([_splitmix64_int(int(np.uint64(i))) for i in ids],
                      dtype=np.uint64)
    seed_rows = np.argsort(hashes, kind="stable")[:k]
    cent = q[seed_rows].copy()

    def assign_row(x):
        best, best_d = 0, None
        for j in range(len(cent)):
            diff = x - cent[j]
            d2 = float(diff @ diff)
            if best_d is None or d2 < best_d:
                best, best_d = j, d2
        return best

    for _ in range(n_iters):
        sums = np.zeros_like(cent)
        counts = np.zeros(len(cent), dtype=np.int64)
        for i in range(len(q)):
            a = assign_row(q[i])
            sums[a] += q[i]
            counts[a] += 1
        for j in range(len(cent)):
            if counts[j]:
                cent[j] = np.rint(sums[j] / counts[j])
    n = [0] * k
    inertia = [0] * k
    mx = [-1] * k
    for i in range(len(q)):
        a = assign_row(q[i])
        diff = q[i] - cent[a]
        d2 = int(diff @ diff)
        n[a] += 1
        inertia[a] += d2
        mx[a] = max(mx[a], d2)
    rows = [(j, n[j], inertia[j], mx[j], inertia[j] / n[j])
            for j in range(k) if n[j]]
    tbl = pa.table({
        "cluster": pa.array([r[0] for r in rows], pa.int64()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "inertia": pa.array([r[2] for r in rows], pa.int64()),
        "max_d2": pa.array([r[3] for r in rows], pa.int64()),
        "mean_d2": pa.array([r[4] for r in rows], pa.float64())})
    return _write(tbl, "embed_cluster_quality")


def write_golden_pack_bfd(sf_dir: str, *, capacity: int,
                          n_shards: int = 16) -> str:
    """Expected output of ``doc_pack_bfd``: per-shard best-fit-
    decreasing replayed NAIVELY — for each doc a linear scan over all
    open bins picking the largest fill that fits (ties → largest bin
    id), no sorted containers. Shares only the documented rule with
    datapipe/pack.py::pack_bins_bfd (which uses a bisect-sorted fill
    list); the two mechanisms agreeing on every row is the check."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "n_chars"])
    ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
    cnt = np.asarray(t.column("n_chars").to_pylist(), dtype=np.int64)
    rows = []
    for sh in range(n_shards):
        m = ((ids.astype(np.uint64) * np.uint64(2654435761))
             % (np.uint64(1) << np.uint64(32))) \
            % np.uint64(n_shards) == np.uint64(sh)
        sid, sc = ids[m], cnt[m]
        order = sorted(range(len(sid)), key=lambda i: (-sc[i], sid[i]))
        fills: list[int] = []
        for i in order:
            ci = int(sc[i])
            best = -1
            if ci <= capacity:
                for b in range(len(fills)):
                    if fills[b] + ci <= capacity and \
                            (best < 0 or fills[b] >= fills[best]):
                        best = b
            if best < 0:
                best = len(fills)
                fills.append(0)
            rows.append((int(sid[i]), sh, best, fills[best]))
            fills[best] += ci
    rows.sort()
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "shard": pa.array([r[1] for r in rows], pa.int64()),
        "bin": pa.array([r[2] for r in rows], pa.int64()),
        "fill": pa.array([r[3] for r in rows], pa.int64())})
    return _write(tbl, "doc_pack_bfd")


def write_golden_audio_trim(n: int, seed: int) -> str:
    """Expected output of ``multimodal_audio_trim``: every clip decoded
    by an independent per-byte RIFF walk (no stdlib ``wave``, no numpy)
    and scanned sequentially for the maximal edge runs of exact-zero
    channel-0 samples; all-silent clips report lead = n_samples,
    trail = 0, n_kept = 0 (the stage's documented convention)."""
    from ..datapipe.multimodal import synth_padded_audio

    media = synth_padded_audio(n, seed=seed)
    rows = []
    for mid, payload in zip(media.column("media_id").to_pylist(),
                            media.column("payload").to_pylist()):
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        pos, ch, bits, data = 12, None, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            ln = int.from_bytes(payload[pos + 4:pos + 8], "little")
            body = payload[pos + 8:pos + 8 + ln]
            pos += 8 + ln + (ln & 1)
            if cid == b"fmt ":
                ch = int.from_bytes(body[2:4], "little")
                bits = int.from_bytes(body[14:16], "little")
            elif cid == b"data":
                data = body
        sw = bits // 8
        stride = sw * ch
        nf = len(data) // stride
        first = last = None
        for f in range(nf):                 # channel 0 of each frame
            raw = data[f * stride:f * stride + sw]
            if sw == 1:
                v = raw[0] - 128
            elif sw == 3:
                u = raw[0] | (raw[1] << 8) | (raw[2] << 16)
                v = u - ((u >> 23) << 24)
            else:
                v = int.from_bytes(raw, "little", signed=True)
            if v != 0:
                if first is None:
                    first = f
                last = f
        if first is None:
            rows.append((mid, nf, nf, 0, 0))
        else:
            rows.append((mid, nf, first, nf - 1 - last,
                         last - first + 1))
    tbl = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_samples": pa.array([r[1] for r in rows], pa.int64()),
        "lead": pa.array([r[2] for r in rows], pa.int64()),
        "trail": pa.array([r[3] for r in rows], pa.int64()),
        "n_kept": pa.array([r[4] for r in rows], pa.int64()),
    })
    return _write(tbl, "multimodal_audio_trim")


def write_golden_scene_cuts(n: int, seed: int, threshold: int) -> str:
    """Expected output of ``multimodal_scenes``: an independent SGV1
    container walk, with each transition's energy accumulated PER BYTE
    over the two frames' raw BMP pixel arrays (offset/stride read from
    the headers) in arbitrary-precision Python ints. Row padding is
    zero in both frames of a same-size pair, so the byte walk equals
    the pipeline's decoded-RGB |Δ| sum exactly — and shares none of its
    code."""
    from ..datapipe.multimodal import synth_scene_videos

    media = synth_scene_videos(n, seed=seed)
    rows = []
    for mid, payload in zip(media.column("media_id").to_pylist(),
                            media.column("payload").to_pylist()):
        assert payload[:4] == b"SGV1"
        nf = int.from_bytes(payload[4:8], "little")
        lens = [int.from_bytes(payload[12 + 4 * i:16 + 4 * i], "little")
                for i in range(nf)]
        off = 12 + 4 * nf
        frames = []
        for ln in lens:
            frames.append(payload[off:off + ln])
            off += ln

        def pixel_bytes(b: bytes) -> bytes:
            assert b[:2] == b"BM"
            po = int.from_bytes(b[10:14], "little")
            w = int.from_bytes(b[18:22], "little", signed=True)
            h = abs(int.from_bytes(b[22:26], "little", signed=True))
            stride = (w * 3 + 3) & ~3
            return b[po:po + stride * h]

        for t in range(1, nf):
            a, b = pixel_bytes(frames[t - 1]), pixel_bytes(frames[t])
            en = 0
            for x, y in zip(a, b):
                en += x - y if x >= y else y - x
            rows.append((mid, t, en, en > threshold))
    tbl = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "frame_idx": pa.array([r[1] for r in rows], pa.int64()),
        "energy": pa.array([r[2] for r in rows], pa.int64()),
        "is_cut": pa.array([r[3] for r in rows], pa.bool_()),
    })
    return _write(tbl, "multimodal_scenes")


def write_golden_knn_graph(sf_dir: str, *, k: int) -> str:
    """Expected output of ``embed_knn_graph``: per-row unit-grid
    quantization (one row at a time — ``_unit_grid``'s ops are
    elementwise IEEE, so single-row calls equal the batched broadcast),
    per-pair integer dots via an explicit double loop, per-src top-k by
    an explicit (dot desc, id asc) sort excluding self, and a mutual
    set intersection. Every dot is an exact int ≤ d·2^28, so the
    distributed block-pair run matches bit-for-bit by construction."""
    import pyarrow.parquet as pq

    from ..datapipe.ann import _unit_grid

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    raw = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    ids, raw = ids[order], raw[order]
    n = len(ids)
    grid = np.empty_like(raw)
    for i in range(n):                            # per-row, sequential
        grid[i] = _unit_grid(raw[i:i + 1])[0]
    gi = grid.astype(np.int64)

    topk: dict[int, list[tuple[int, int]]] = {}
    dots: dict[tuple[int, int], int] = {}
    for i in range(n):
        cand = []
        for j in range(n):
            if j == i:
                continue
            d = int(np.dot(gi[i], gi[j]))
            cand.append((int(ids[j]), d))
            dots[(int(ids[i]), int(ids[j]))] = d
        cand.sort(key=lambda p: (-p[1], p[0]))
        topk[int(ids[i])] = cand[:k]

    rows = []
    for i in range(n):
        a = int(ids[i])
        for b, d in topk[a]:
            if a < b and any(x == a for x, _ in topk[b]):
                rows.append((a, b, d))
    rows.sort()
    tbl = pa.table({"src": pa.array([r[0] for r in rows], pa.int64()),
                    "dst": pa.array([r[1] for r in rows], pa.int64()),
                    "dot": pa.array([r[2] for r in rows], pa.int64())})
    return _write(tbl, "embed_knn_graph")


def write_golden_audio_fp(n: int, seed: int) -> str:
    """Expected fingerprints for ``dedup_audio_fp``: every clip decoded
    by an independent per-byte RIFF walk (no stdlib ``wave``, no
    numpy), energies accumulated as Python ints over sequential
    256-sample frames on the common 16-bit grid, rise bits packed
    MSB-first by hand. The dedup step itself is left to the REAL SQL
    oracle (min(media_id) OVER the fingerprint partition)."""
    from ..datapipe.multimodal import synth_dup_audio

    media = synth_dup_audio(n, seed=seed)
    rows = []
    for mid, payload in zip(media.column("media_id").to_pylist(),
                            media.column("payload").to_pylist()):
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        pos, ch, bits, data = 12, None, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            ln = int.from_bytes(payload[pos + 4:pos + 8], "little")
            body = payload[pos + 8:pos + 8 + ln]
            pos += 8 + ln + (ln & 1)
            if cid == b"fmt ":
                ch = int.from_bytes(body[2:4], "little")
                bits = int.from_bytes(body[14:16], "little")
            elif cid == b"data":
                data = body
        sw = bits // 8
        stride = sw * ch
        nsamp = len(data) // stride
        g = []
        for f in range(nsamp):                  # channel 0, per byte
            raw = data[f * stride:f * stride + sw]
            if sw == 1:
                v = (raw[0] - 128) << 8
            elif sw == 2:
                v = int.from_bytes(raw, "little", signed=True)
            elif sw == 3:
                u = raw[0] | (raw[1] << 8) | (raw[2] << 16)
                v = (u - ((u >> 23) << 24)) >> 8
            else:
                v = int.from_bytes(raw, "little", signed=True) >> 16
            g.append(v)
        nf = nsamp // 256
        e = []
        for fr in range(nf):
            s = 0
            for v in g[fr * 256:(fr + 1) * 256]:
                s += v * v
            e.append(s)
        bitlist = [1 if e[f] > e[f - 1] else 0 for f in range(1, nf)]
        while len(bitlist) % 8:
            bitlist.append(0)
        fp = bytes(
            sum(b << (7 - k) for k, b in enumerate(bitlist[i:i + 8]))
            for i in range(0, len(bitlist), 8)).hex()
        rows.append((mid, nf, e[0] if nf else 0, fp))
    tbl = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_frames": pa.array([r[1] for r in rows], pa.int64()),
        "e0": pa.array([r[2] for r in rows], pa.int64()),
        "fp": pa.array([r[3] for r in rows], pa.string())})
    return _write(tbl, "audio_fp")


def write_golden_knn_graph_ivf(sf_dir: str, *, k: int, n_cells: int,
                               sample_size: int, seed: int) -> str:
    """Expected output of ``embed_knn_graph_ivf``: the
    write_golden_embed_ivf sequential IVF spec (per-row grid loop,
    SplitMix64 smallest sample, per-point Lloyd scans, ``>`` assignment
    scans keeping the lowest cell) followed by a per-cell double-loop
    mutual top-k with (dot desc, id asc) ties. Exact by the unit-grid
    integer-dot construction."""
    import pyarrow.parquet as pq

    from ..datapipe.ann import IVF_FIX, _splitmix64

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    ids, vecs = ids[order], vecs[order]
    unit = np.empty_like(vecs)
    for i in range(len(vecs)):
        g = np.rint(vecs[i] * IVF_FIX)
        ss = sum(int(c) * int(c) for c in g)
        n = float(np.sqrt(float(ss))) if ss else 1.0
        unit[i] = np.rint(g / n * IVF_FIX)

    h = _splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    samp_order = sorted(range(len(ids)),
                        key=lambda i: (int(h[i]), int(ids[i])))
    samp = [unit[i] for i in samp_order[:sample_size]]
    cent = [samp[c].copy() for c in range(min(n_cells, len(samp)))]
    for _ in range(8):
        sums = [np.zeros(vecs.shape[1]) for _ in cent]
        cnts = [0] * len(cent)
        for v in samp:
            best, best_s = 0, -np.inf
            for c in range(len(cent)):
                s = float(np.dot(v, cent[c]))
                if s > best_s:
                    best, best_s = c, s
            sums[best] += v
            cnts[best] += 1
        for c in range(len(cent)):
            if cnts[c]:
                S = sums[c]
                ss = sum(int(x) * int(x) for x in S)
                if ss > 0:
                    cent[c] = np.rint(S / np.sqrt(float(ss)) * IVF_FIX)

    cells: dict[int, list[int]] = {}
    for i in range(len(ids)):
        best, best_s = 0, -np.inf
        for c in range(len(cent)):
            s = float(np.dot(unit[i], cent[c]))
            if s > best_s:
                best, best_s = c, s
        cells.setdefault(best, []).append(i)

    rows = []
    for members in cells.values():
        if len(members) < 2:
            continue
        topk = {}
        dots = {}
        for i in members:
            cand = []
            for j in members:
                if j == i:
                    continue
                d = int(np.dot(unit[i].astype(np.int64),
                               unit[j].astype(np.int64)))
                cand.append((int(ids[j]), d))
                dots[(int(ids[i]), int(ids[j]))] = d
            cand.sort(key=lambda p: (-p[1], p[0]))
            topk[int(ids[i])] = cand[:k]
        for i in members:
            a = int(ids[i])
            for b, d in topk[a]:
                if a < b and any(x == a for x, _ in topk[b]):
                    rows.append((a, b, d))
    rows.sort()
    tbl = pa.table({"src": pa.array([r[0] for r in rows], pa.int64()),
                    "dst": pa.array([r[1] for r in rows], pa.int64()),
                    "dot": pa.array([r[2] for r in rows], pa.int64())})
    return _write(tbl, "embed_knn_graph_ivf")


def write_golden_label_prop(sf_dir: str, *, k: int, n_iters: int,
                            seed_mod: int) -> str:
    """Expected output of ``embed_label_prop``: the
    write_golden_knn_graph sequential edge construction (per-row grid,
    double-loop dots, (dot desc, id asc) top-k, mutual intersection)
    followed by an explicit per-edge synchronous propagation loop with
    Python-dict vote counts — argmax ties to the LOWEST label id, a
    node with no labeled neighbor keeps its current label, seeds
    (vec_id % seed_mod == 0) immutable."""
    import pyarrow.parquet as pq

    from ..datapipe.ann import _unit_grid

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding", "label"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    raw = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    true_lab = np.asarray(t.column("label").to_pylist(), dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids, raw, true_lab = ids[order], raw[order], true_lab[order]
    n = len(ids)
    grid = np.empty_like(raw)
    for i in range(n):
        grid[i] = _unit_grid(raw[i:i + 1])[0]
    gi = grid.astype(np.int64)

    topk = {}
    for i in range(n):
        cand = []
        for j in range(n):
            if j != i:
                cand.append((int(ids[j]), int(np.dot(gi[i], gi[j]))))
        cand.sort(key=lambda p: (-p[1], p[0]))
        topk[int(ids[i])] = [p[0] for p in cand[:k]]
    adj: dict[int, list[int]] = {int(v): [] for v in ids}
    for i in range(n):
        a = int(ids[i])
        for b in topk[a]:
            if a < b and a in topk[b]:
                adj[a].append(b)
                adj[b].append(a)

    lab = {int(ids[i]): (int(true_lab[i]) if ids[i] % seed_mod == 0
                         else -1) for i in range(n)}
    seeds = {v for v in lab if v % seed_mod == 0}
    n_labels = max(lab.values()) + 1
    for _ in range(n_iters):
        new = {}
        for v in lab:
            votes = [0] * n_labels
            for u in adj[v]:
                if lab[u] >= 0:
                    votes[lab[u]] += 1
            if v in seeds or sum(votes) == 0:
                new[v] = lab[v]
            else:
                best = 0
                for c in range(1, n_labels):     # strict > keeps lowest
                    if votes[c] > votes[best]:
                        best = c
                new[v] = best
        lab = new
    nodes = sorted(lab)
    tbl = pa.table({"node": pa.array(nodes, pa.int64()),
                    "label": pa.array([lab[v] for v in nodes],
                                      pa.int64())})
    return _write(tbl, "embed_label_prop")


def write_golden_minhash_calibration(sf_dir: str, *, k: int, n_perm: int,
                                     bands: int, seed: int) -> str:
    """Expected (a, b, matches) for ``dedup_minhash_calibration``: a
    sequential replay — per-row shingles + ``_signature`` (the spec
    function, as in every minhash golden), per-row band keys via the
    shared key kernel on a 1-row matrix (elementwise uint64, identical
    to the batched call), an explicit dict-of-buckets candidate scan,
    and a per-pair Python count of agreeing permutations. The exact
    Jaccard column is left to the REAL SQL side (the dedup_minhash
    shingle CTE recomputes it from the same parquet)."""
    import pyarrow.parquet as pq

    from ..datapipe.dedup import (_band_keys_from_sigs, _minhash_params,
                                  _shingle_hashes, _signature)

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    a_p, b_p = _minhash_params(n_perm, seed)

    sigs = {}
    buckets: dict[tuple, list[int]] = {}
    for i, did in enumerate(ids):
        sig = _signature(_shingle_hashes(texts[i] or "", k), a_p, b_p)
        sigs[did] = sig
        keys = _band_keys_from_sigs(sig[None, :], bands)[0]
        for band in range(bands):
            buckets.setdefault((band, int(keys[band])), []).append(did)

    pairs = set()
    for members in buckets.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                pairs.add((ms[x], ms[y]))

    rows = []
    for a, b in sorted(pairs):
        m = sum(1 for p in range(n_perm) if sigs[a][p] == sigs[b][p])
        rows.append((a, b, m))
    tbl = pa.table({"a": pa.array([r[0] for r in rows], pa.int64()),
                    "b": pa.array([r[1] for r in rows], pa.int64()),
                    "matches": pa.array([r[2] for r in rows], pa.int64())})
    return _write(tbl, "minhash_calibration")


def write_golden_rouge_l(sf_dir: str) -> str:
    """Expected output of ``text_rouge_l``: the candidate is each
    document's first 10 (whitespace) words doubled — exactly the
    text_rouge fixture — and the LCS comes from the classic FULL 2-D
    DP table (the operator uses a rolling two-row sweep; same spec,
    different mechanics). rouge_l = one int/int division."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    rows = []
    for did, text in zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()):
        w = (text or "").strip().split()
        head = w[:10]
        cand_tokens = [tok.lower() for tok in head + head]
        ref = [tok.lower() for tok in w]
        m, n = len(ref), len(cand_tokens)
        dp = [[0] * (n + 1) for _ in range(m + 1)]
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                if ref[i - 1] == cand_tokens[j - 1]:
                    dp[i][j] = dp[i - 1][j - 1] + 1
                else:
                    dp[i][j] = max(dp[i - 1][j], dp[i][j - 1])
        l = dp[m][n]
        rows.append((did, l, m, l / m if m else 0.0))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lcs": pa.array([r[1] for r in rows], pa.int64()),
        "ref_total": pa.array([r[2] for r in rows], pa.int64()),
        "rouge_l": pa.array([r[3] for r in rows], pa.float64())})
    return _write(tbl, "text_rouge_l")


_BLEU_GOLDEN_CACHE: dict = {}


def write_golden_bleu(sf_dir: str, max_n: int = 4) -> str:
    """Expected output of ``text_bleu``: candidate = each document's
    first 10 (whitespace) words doubled (the ROUGE fixture — the
    repetition exercises clipping, the short candidate exercises the
    brevity penalty). Counts come from per-row ``collections.Counter``
    over TUPLE n-grams (entirely different mechanics from the
    operator's incremental factorize), then ONE vectorized call into
    the operator's own ``_bleu_from_counts`` float kernel over the
    collected integer arrays (the text_entropy stance: share the float
    kernel, derive the integers independently; per ADVICE_r4 the
    kernel call is vectorized, not per-scalar)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from ..datapipe.lines import _bleu_from_counts

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids, clip_rows, tot_rows, rl_rows, cl_rows = [], [], [], [], []
    for did, text in zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()):
        ref = [w for w in (text or "").lower().split()]
        head = (text or "").strip().split()[:10]
        cand = [w.lower() for w in head + head]
        clips, tots = [], []
        for ng in range(1, max_n + 1):
            rc = Counter(tuple(ref[i:i + ng])
                         for i in range(len(ref) - ng + 1))
            cc = Counter(tuple(cand[i:i + ng])
                         for i in range(len(cand) - ng + 1))
            clips.append(sum(min(c, rc.get(g, 0))
                             for g, c in cc.items()))
            tots.append(max(len(cand) - ng + 1, 0))
        ids.append(did)
        clip_rows.append(clips)
        tot_rows.append(tots)
        rl_rows.append(len(ref))
        cl_rows.append(len(cand))
    clip = np.asarray(clip_rows, np.int64).reshape(len(ids), max_n)
    tot = np.asarray(tot_rows, np.int64).reshape(len(ids), max_n)
    ref_len = np.asarray(rl_rows, np.int64)
    cand_len = np.asarray(cl_rows, np.int64)
    bleu = _bleu_from_counts(clip, tot, ref_len, cand_len, max_n)
    _BLEU_GOLDEN_CACHE[(sf_dir, max_n)] = (clip, tot, ref_len, cand_len)
    cols = {"doc_id": pa.array(ids, pa.int64())}
    for j in range(max_n):
        cols[f"clip{j + 1}"] = pa.array(clip[:, j], pa.int64())
        cols[f"tot{j + 1}"] = pa.array(tot[:, j], pa.int64())
    cols["ref_len"] = pa.array(ref_len, pa.int64())
    cols["cand_len"] = pa.array(cand_len, pa.int64())
    cols["bleu"] = pa.array(bleu, pa.float64())
    return _write(pa.table(cols), "text_bleu")


def write_golden_chrf(sf_dir: str, max_n: int = 6) -> str:
    """Expected output of ``text_chrf``: candidate = first 10 words
    doubled (the ROUGE/BLEU fixture). Counts come from per-row dict
    counting over BYTES-substring n-grams of the lowercased utf-8 text
    with exactly the operator's 6 ASCII whitespace bytes removed —
    the golden implements the SAME documented byte-level deviation
    (not str.split, which also strips unicode whitespace and counts
    characters: on non-ASCII text the two diverge, per the
    fifth-session review). Mechanics stay independent (Python bytes
    slices vs packed int64 codes); one vectorized call into the
    operator's ``_chrf_from_counts`` kernel."""
    from collections import Counter

    import pyarrow.parquet as pq

    from ..datapipe.lines import _chrf_from_counts

    _ws = frozenset(b"\t\n\x0b\x0c\r ")

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids, clip_r, ctot_r, rtot_r = [], [], [], []
    for did, text in zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()):
        head = (text or "").strip().split()[:10]
        cand_s = " ".join(head) + " " + " ".join(head)
        cand = bytes(c for c in cand_s.lower().encode("utf-8")
                     if c not in _ws)
        ref = bytes(c for c in (text or "").lower().encode("utf-8")
                    if c not in _ws)
        clips, cts, rts = [], [], []
        for ng in range(1, max_n + 1):
            rc = Counter(ref[i:i + ng]
                         for i in range(len(ref) - ng + 1))
            cc = Counter(cand[i:i + ng]
                         for i in range(len(cand) - ng + 1))
            clips.append(sum(min(v, rc.get(g, 0))
                             for g, v in cc.items()))
            cts.append(max(len(cand) - ng + 1, 0))
            rts.append(max(len(ref) - ng + 1, 0))
        ids.append(did)
        clip_r.append(clips)
        ctot_r.append(cts)
        rtot_r.append(rts)
    clip = np.asarray(clip_r, np.int64).reshape(len(ids), max_n)
    ctot = np.asarray(ctot_r, np.int64).reshape(len(ids), max_n)
    rtot = np.asarray(rtot_r, np.int64).reshape(len(ids), max_n)
    chrf = _chrf_from_counts(clip, ctot, rtot)
    cols = {"doc_id": pa.array(ids, pa.int64())}
    for j in range(max_n):
        cols[f"clip{j + 1}"] = pa.array(clip[:, j], pa.int64())
        cols[f"ctot{j + 1}"] = pa.array(ctot[:, j], pa.int64())
        cols[f"rtot{j + 1}"] = pa.array(rtot[:, j], pa.int64())
    cols["chrf"] = pa.array(chrf, pa.float64())
    return _write(pa.table(cols), "text_chrf")


def write_golden_corpus_bleu(sf_dir: str, max_n: int = 4) -> str:
    """Expected output of ``text_bleu_corpus``: the SAME sequential
    per-doc Counter derivation as ``write_golden_bleu`` (shared via a
    cache keyed on sf_dir), integer components summed corpus-wide,
    one call into the shared kernel — micro-average semantics."""
    from ..datapipe.lines import _bleu_from_counts

    if (sf_dir, max_n) not in _BLEU_GOLDEN_CACHE:
        write_golden_bleu(sf_dir, max_n)
    clip, tot, ref_len, cand_len = _BLEU_GOLDEN_CACHE[(sf_dir, max_n)]
    cs = clip.sum(axis=0, keepdims=True)
    ts = tot.sum(axis=0, keepdims=True)
    rl = np.array([int(ref_len.sum())], np.int64)
    cl = np.array([int(cand_len.sum())], np.int64)
    bleu = _bleu_from_counts(cs, ts, rl, cl, max_n)
    cols = {}
    for j in range(max_n):
        cols[f"clip{j + 1}"] = pa.array([int(cs[0, j])], pa.int64())
    for j in range(max_n):
        cols[f"tot{j + 1}"] = pa.array([int(ts[0, j])], pa.int64())
    cols["ref_len"] = pa.array(rl, pa.int64())
    cols["cand_len"] = pa.array(cl, pa.int64())
    cols["bleu"] = pa.array(bleu, pa.float64())
    return _write(pa.table(cols), "text_bleu_corpus")


def write_golden_mst(edges_tbl: "pa.Table") -> str:
    """Expected output of ``graph_mst``: sequential KRUSKAL over the
    same unique canonical (a, b, w) edges, sorted by the packed
    (w, a, b) pseudo-weight — the strict total order under which the
    MSF is unique, so the distributed Borůvka in
    datapipe/graph.py::minimum_spanning_forest must produce the
    IDENTICAL edge set (different algorithm, same spec). Plain
    union-find, no numpy in the accumulation."""
    a = edges_tbl.column("a").to_pylist()
    b = edges_tbl.column("b").to_pylist()
    w = edges_tbl.column("w").to_pylist()
    order = sorted(range(len(a)), key=lambda i: (w[i], a[i], b[i]))
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    rows = []
    for i in order:
        ra, rb = find(a[i]), find(b[i])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            rows.append((a[i], b[i], w[i]))
    rows.sort()
    tbl = pa.table({
        "a": pa.array([r[0] for r in rows], pa.int64()),
        "b": pa.array([r[1] for r in rows], pa.int64()),
        "w": pa.array([r[2] for r in rows], pa.int64())})
    return _write(tbl, "graph_mst")


def write_golden_corpus_chrf(sf_dir: str, max_n: int = 6) -> str:
    """Expected output of ``text_chrf_corpus``: the write_golden_chrf
    sequential byte-substring derivation re-run (cheap), components
    summed corpus-wide, one call into the shared kernel."""
    from collections import Counter

    import pyarrow.parquet as pq

    from ..datapipe.lines import _chrf_from_counts

    _ws = frozenset(b"\t\n\x0b\x0c\r ")
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    clip = np.zeros((1, max_n), np.int64)
    ctot = np.zeros((1, max_n), np.int64)
    rtot = np.zeros((1, max_n), np.int64)
    for text in t.column("text").to_pylist():
        head = (text or "").strip().split()[:10]
        cand_s = " ".join(head) + " " + " ".join(head)
        cand = bytes(c for c in cand_s.lower().encode("utf-8")
                     if c not in _ws)
        ref = bytes(c for c in (text or "").lower().encode("utf-8")
                    if c not in _ws)
        for ng in range(1, max_n + 1):
            rc = Counter(ref[i:i + ng]
                         for i in range(len(ref) - ng + 1))
            cc = Counter(cand[i:i + ng]
                         for i in range(len(cand) - ng + 1))
            clip[0, ng - 1] += sum(min(v, rc.get(g, 0))
                                   for g, v in cc.items())
            ctot[0, ng - 1] += max(len(cand) - ng + 1, 0)
            rtot[0, ng - 1] += max(len(ref) - ng + 1, 0)
    score = _chrf_from_counts(clip, ctot, rtot)
    cols = {}
    for j in range(max_n):
        cols[f"clip{j + 1}"] = pa.array([int(clip[0, j])], pa.int64())
    for j in range(max_n):
        cols[f"ctot{j + 1}"] = pa.array([int(ctot[0, j])], pa.int64())
    for j in range(max_n):
        cols[f"rtot{j + 1}"] = pa.array([int(rtot[0, j])], pa.int64())
    cols["chrf"] = pa.array(score, pa.float64())
    return _write(pa.table(cols), "text_chrf_corpus")


def write_golden_betweenness(n_nodes: int, seed: int,
                             sources: list) -> str:
    """Expected output of ``graph_betweenness``: sequential Brandes
    from the same pivot set over the same unique undirected edge set.
    σ is exact int; each backward level iterates the DAG edges in
    (v asc, w asc) order with plain float adds — the operator folds
    the identical elementwise contributions with np.add.at in the
    identical order, so the floats are bit-equal."""
    from ..datapipe.graph import dedup_undirected, synth_link_graph

    import ray.data as rd

    ded = dedup_undirected(
        rd.from_arrow(synth_link_graph(n_nodes, seed=seed)))
    import pyarrow as _pa
    tbl = _pa.concat_tables(list(ded.iter_batches(
        batch_format="pyarrow")))
    a = tbl.column("a").to_pylist()
    b = tbl.column("b").to_pylist()
    adj: dict = {}
    for x, y in zip(a, b):
        adj.setdefault(x, []).append(y)
        adj.setdefault(y, []).append(x)

    bc = [0.0] * n_nodes
    for s in sources:
        dist = [-1] * n_nodes
        sigma = [0] * n_nodes
        dist[s] = 0
        sigma[s] = 1
        frontier = [s]
        levels = [[s]]
        while frontier:
            nxt = set()
            for v in frontier:
                for w in adj.get(v, ()):
                    if dist[w] == -1:
                        nxt.add(w)
            nxt = sorted(nxt)
            for w in nxt:
                dist[w] = len(levels)
                sigma[w] = sum(sigma[v] for v in adj.get(w, ())
                               if dist[v] == len(levels) - 1)
            if not nxt:
                break
            levels.append(nxt)
            frontier = nxt
        delta = [0.0] * n_nodes
        for L in range(len(levels) - 1, 0, -1):
            # DAG edges (v at L-1, w at L) in (v, w) order — the
            # operator's np.add.at order
            dag = sorted(
                (v, w)
                for x, y in zip(a, b)
                for (v, w) in ((x, y), (y, x))
                if dist[v] == L - 1 and dist[w] == L)
            for v, w in dag:
                delta[v] += (sigma[v] / sigma[w]) * (1.0 + delta[w])
        delta[s] = 0.0
        for i in range(n_nodes):
            bc[i] += delta[i]

    out = pa.table({
        "node": pa.array(np.arange(n_nodes, dtype=np.int64),
                         pa.int64()),
        "betweenness": pa.array(np.asarray(bc, np.float64),
                                pa.float64())})
    return _write(out, "graph_betweenness")
