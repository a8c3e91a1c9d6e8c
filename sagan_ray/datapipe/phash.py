"""Perceptual image hashing (pHash) + Hamming near-dup over media tables.

Recompression-robust image dedup — the image analog of SimHash text
dedup and a core web-scale curation operator (the same picture saved as
PNG and re-saved as JPEG must collapse to one asset). The reference has
no image pipeline; this sits in the beyond-reference curation tier next
to ``datapipe/multimodal.py``.

Spec (every step after decode is EXACT INTEGER arithmetic — the
``datapipe/cluster.py`` fixed-point discipline — so the batched
pipeline, any Ray block layout, and the sequential golden in
``oracle/golden.py::write_golden_phash`` produce bit-identical hashes):

1. decode payload → H×W×3 uint8 RGB (``multimodal.decode_image``, the
   shared codec boundary — decode correctness is independently pinned
   by the multimodal goldens' from-scratch format walks);
2. integer luma  g = (77·R + 150·G + 29·B) >> 8   (int64, 0..255);
3. nearest-neighbor resize to 32×32 via pure index arithmetic
   (``yi = arange(32)·h // 32``) — no interpolation, no floats;
4. fixed-point 2-D DCT-II:  T = D @ G @ Dᵀ  with
   D[k,x] = round(2^13 · c_k · cos((2x+1)kπ/64)),  c_0 = √(1/32),
   c_k = √(2/32) — ``_dct32_q()`` is SPEC DATA shared by the kernel and
   the golden (the quality-model stance: the golden composes the steps
   with its own sequential code but reads the same constant table, so a
   1-ulp libm difference in matrix CONSTRUCTION can never split the two
   sides).  |D| ≤ 2^13·0.25, so |T| < 2^41 — exact in int64;
5. take the top-left 8×8 low-frequency block (64 coefficients,
   DC included), med = sorted block[31] (lower middle — stays integer);
6. bit i·8+j = 1  iff  T[i,j] > med  →  64-bit hash (uint64).

Near-dup pairing mirrors ``dedup.simhash_dedup``: 8 bands × 8 bits
(pigeonhole: recall is guaranteed for Hamming distance ≤ 7), candidate
pairs per (band, key) bucket via the shared offset-arange construction
with the ``max_band`` skew guard, one SWAR popcount verify pass, then a
pair-keyed exchange dedupes band collisions.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

PHASH_SIZE = 32          # resize target (spec)
PHASH_Q = 13             # DCT fixed-point scale: 2^13 (spec)
PHASH_BANDS = 8          # 8 bands × 8 bits → recall guaranteed ≤ 7
_DCT32_Q = None


def _dct32_q() -> np.ndarray:
    """Fixed-point 32-point DCT-II matrix (int64, spec constant).

    Built ONCE with one vectorized cos call; both the batched kernel and
    the sequential golden read this same table (see module docstring for
    why sharing the constant is the correct independence boundary)."""
    global _DCT32_Q
    if _DCT32_Q is None:
        n = PHASH_SIZE
        k = np.arange(n, dtype=np.float64)[:, None]
        x = np.arange(n, dtype=np.float64)[None, :]
        c = np.full(n, np.sqrt(2.0 / n))
        c[0] = np.sqrt(1.0 / n)
        m = c[:, None] * np.cos((2 * x + 1) * k * np.pi / (2 * n))
        _DCT32_Q = np.rint(m * (1 << PHASH_Q)).astype(np.int64)
    return _DCT32_Q


def _gray_i64(img: np.ndarray) -> np.ndarray:
    """Integer luma: (77R + 150G + 29B) >> 8 on H×W×3 uint8 → int64."""
    v = img.astype(np.int64)
    return (77 * v[:, :, 0] + 150 * v[:, :, 1] + 29 * v[:, :, 2]) >> 8


def _resize_idx(n_src: int) -> np.ndarray:
    """Spec resize index map: arange(32)·n // 32, clipped."""
    return (np.arange(PHASH_SIZE, dtype=np.int64) * n_src
            // PHASH_SIZE).clip(0, n_src - 1)


def phash64(img: np.ndarray) -> int:
    """Per-image pHash SPEC (steps 2-6 above). The batched stage calls
    this per decoded image; the golden re-derives each step with its own
    sequential code and must match bit-exactly."""
    g = _gray_i64(img)
    h, w = g.shape
    small = g[_resize_idx(h)][:, _resize_idx(w)]          # 32×32 int64
    d = _dct32_q()
    t = d @ small @ d.T                                   # exact int64
    block = t[:8, :8].reshape(-1)
    med = np.sort(block, kind="stable")[31]
    bits = block > med
    return int(np.sum(bits.astype(np.uint64)
                      << np.arange(64, dtype=np.uint64)))


def phash_table(ds, *, id_col: str = "media_id",
                payload_col: str = "payload", batch_size: int = 64):
    """media table → (id, phash uint64) Dataset. The per-row loop is the
    codec boundary (decode is inherently per-payload; the codecs are
    vectorized numpy inside); everything downstream is batched."""

    def stage(tbl: pa.Table) -> pa.Table:
        from .multimodal import decode_image

        hashes = np.array([phash64(decode_image(p))
                           for p in tbl.column(payload_col).to_pylist()],
                          dtype=np.uint64)
        return pa.table({id_col: tbl.column(id_col),
                         "phash": pa.array(hashes, pa.uint64())})

    return ds.map_batches(stage, batch_format="pyarrow",
                          batch_size=batch_size)


def phash_dedup(ds, *, max_hamming: int = 6, id_col: str = "media_id",
                payload_col: str = "payload", max_band: int = 8192):
    """Near-dup image pairs (a, b, hamming) within Hamming distance
    ≤ ``max_hamming`` of the 64-bit pHash. Same shuffle shape as
    ``dedup.simhash_dedup``: only (id, hash, band key) rows — never
    payload bytes — cross the exchange."""
    import pandas as pd

    from .dedup import _group_pairs_idx, _popcount_u64
    from .exchange import hash_group_apply

    nb = PHASH_BANDS

    def bands(tbl: pa.Table) -> pa.Table:
        ids = np.asarray(tbl.column(id_col).to_pylist(), dtype=np.int64)
        s = tbl.column("phash").to_numpy(zero_copy_only=False
                                         ).astype(np.uint64)
        bix = np.arange(nb, dtype=np.uint64)
        s_rep = np.repeat(s, nb)
        keys = ((s_rep >> np.tile(bix, len(s)) * np.uint64(8))
                & np.uint64(0xFF)).astype(np.int64)
        return pa.table({id_col: pa.array(np.repeat(ids, nb), pa.int64()),
                         "band": pa.array(np.tile(bix.astype(np.int32),
                                                  len(s)), pa.int32()),
                         "key": pa.array(keys, pa.int64()),
                         "sig": pa.array(s_rep, pa.uint64())})

    def pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import logging

        df = df.sort_values(["band", "key", id_col], kind="mergesort")
        band = df["band"].to_numpy()
        key = df["key"].to_numpy()
        ids = df[id_col].to_numpy()
        sigs = df["sig"].to_numpy()
        if not len(df):
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        bnd = np.flatnonzero((band[1:] != band[:-1]) | (key[1:] != key[:-1]))
        counts = np.diff(np.concatenate([[0], bnd + 1, [len(df)]]))
        keep = counts <= max_band
        dropped = int((~keep).sum())
        if dropped:
            logging.getLogger(__name__).warning(
                "phash_dedup: dropped %d band buckets (> %d images) "
                "from candidate generation", dropped, max_band)
        ai, bi = _group_pairs_idx(counts, keep)
        d = _popcount_u64(sigs[ai].astype(np.uint64)
                          ^ sigs[bi].astype(np.uint64))
        m = d <= max_hamming
        return pd.DataFrame({"a": ids[ai][m].astype(np.int64),
                             "b": ids[bi][m].astype(np.int64),
                             "hamming": d[m].astype(np.int64)})

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("hamming", pa.int64())])
    hashed = phash_table(ds, id_col=id_col, payload_col=payload_col)
    cands = hash_group_apply(hashed.map_batches(bands,
                                                batch_format="pyarrow"),
                             ["band", "key"], pairs_bucket,
                             out_schema=pair_schema)
    return hash_group_apply(cands, ["a", "b"],
                            lambda g: g.drop_duplicates(subset=["a", "b"]),
                            out_schema=pair_schema)


# ----------------------------------------------------------------------
# deterministic corpus with planted recompression near-dups
# ----------------------------------------------------------------------

def synth_phash_media(n: int, seed: int = 7) -> pa.Table:
    """n base images (distinct low-frequency sinusoid mixes + noise,
    cycling PNG / JPEG / BMP encodings) plus one RECOMPRESSED VARIANT
    per i % 3 == 0 base: the identical pixel array re-encoded lossily
    (JPEG q70) or re-encoded from a JPEG base as PNG of its decode —
    the classic same-image-different-compression near-dup. Variant
    media_id = n + (i // 3)."""
    from .jpeg import encode_jpeg
    from .multimodal import decode_image, encode_bmp, encode_png

    rng = np.random.default_rng(seed)
    ids, payloads, mimes = [], [], []

    def base_image() -> np.ndarray:
        h = int(rng.integers(24, 64))
        w = int(rng.integers(24, 64))
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        chans = []
        for _ in range(3):
            fx = float(rng.uniform(0.5, 3.0))
            fy = float(rng.uniform(0.5, 3.0))
            ph = float(rng.uniform(0, 2 * np.pi))
            amp = float(rng.uniform(60, 120))
            base = 128 + amp * np.sin(
                2 * np.pi * (fx * xx / w + fy * yy / h) + ph)
            chans.append(base)
        img = np.stack(chans, axis=-1)
        img = img + rng.normal(0, 6, img.shape)
        return np.clip(img, 0, 255).astype(np.uint8)

    for i in range(n):
        img = base_image()
        sel = i % 3
        if sel == 0:
            payload, mime = encode_png(img, filters=i % 5), "image/png"
        elif sel == 1:
            payload = encode_jpeg(img, quality=85, subsampling="4:4:4")
            mime = "image/jpeg"
        else:
            payload, mime = encode_bmp(img), "image/bmp"
        ids.append(i)
        payloads.append(payload)
        mimes.append(mime)
        if i % 3 == 0:
            # variant: re-encode what a user would actually have — the
            # DECODE of the stored asset — at a different quality
            px = decode_image(payload)
            vp = encode_jpeg(px, quality=70, subsampling="4:4:4")
            ids.append(n + i // 3)
            payloads.append(vp)
            mimes.append("image/jpeg")
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "payload": pa.array(payloads, pa.binary()),
                     "mime": pa.array(mimes, pa.string())})


# ----------------------------------------------------------------------
# persistent pHash index (the reverse-image-search layout)
# ----------------------------------------------------------------------

def build_phash_index(ds, index_dir: str, *, id_col: str = "media_id",
                      payload_col: str = "payload") -> int:
    """Persist a reverse-image-search index: 8 band rows per image
    (band, key, id, phash) written parquet-partitioned by
    ``band=<b>/key=<k>`` — the operator's own bucket key as the
    partition key (the datapipe/index.py / ann.py discipline), so a
    query reads ONLY its 8 matching (band, key) directories out of
    8×256, and the build is resumable per partition. Returns the number
    of indexed images."""
    import json
    import os

    hashed = phash_table(ds, id_col=id_col, payload_col=payload_col)
    nb = PHASH_BANDS

    def bands(tbl: pa.Table) -> pa.Table:
        ids = np.asarray(tbl.column(id_col).to_pylist(), dtype=np.int64)
        s = tbl.column("phash").to_numpy(zero_copy_only=False
                                         ).astype(np.uint64)
        bix = np.arange(nb, dtype=np.uint64)
        s_rep = np.repeat(s, nb)
        keys = ((s_rep >> np.tile(bix, len(s)) * np.uint64(8))
                & np.uint64(0xFF)).astype(np.int64)
        return pa.table({"band": pa.array(np.tile(bix.astype(np.int32),
                                                  len(s)), pa.int32()),
                         "key": pa.array(keys, pa.int64()),
                         id_col: pa.array(np.repeat(ids, nb), pa.int64()),
                         "phash": pa.array(s_rep, pa.uint64())})

    # sort by the partition key before the partitioned write — an
    # unsorted stream emits one file per (partition × write task),
    # measured 1.16M files at 100k docs on the minhash twin
    # (dedup_index.py); sorted it is ≈ one file per partition
    (hashed.map_batches(bands, batch_format="pyarrow")
     .sort(["band", "key"])
     .write_parquet(index_dir, partition_cols=["band", "key"]))
    n = ds.count()
    with open(os.path.join(index_dir, "_meta.json"), "w") as f:
        json.dump({"n_images": int(n), "bands": nb}, f)
    return int(n)


def update_phash_index(index_dir: str, new_ds, *,
                       id_col: str = "media_id",
                       payload_col: str = "payload") -> int:
    """Append new images to an existing index: identical band rows land
    as NEW FILES inside the same content-keyed partition dirs, so search
    (which unions a partition's files) is bit-equal to a full rebuild
    over old ∪ new. Returns the new total image count."""
    import json
    import os

    built = build_phash_index(new_ds, index_dir + ".append",
                              id_col=id_col, payload_col=payload_col)
    # merge the append run's partition dirs into the live index
    src = index_dir + ".append"
    for band_dir in sorted(os.listdir(src)):
        if not band_dir.startswith("band="):
            continue
        for key_dir in sorted(os.listdir(os.path.join(src, band_dir))):
            sdir = os.path.join(src, band_dir, key_dir)
            ddir = os.path.join(index_dir, band_dir, key_dir)
            os.makedirs(ddir, exist_ok=True)
            for fn in os.listdir(sdir):
                os.replace(os.path.join(sdir, fn),
                           os.path.join(ddir, f"append-{fn}"))
    import shutil

    shutil.rmtree(src)
    meta_path = os.path.join(index_dir, "_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["n_images"] = int(meta["n_images"]) + built
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta["n_images"]


def search_phash_index(index_dir: str, query_hashes: np.ndarray, *,
                       max_hamming: int = 6,
                       query_ids: np.ndarray | None = None,
                       id_col: str = "media_id"):
    """All indexed images within ``max_hamming`` of each query hash
    (uint64 array — hash payloads first with ``phash64``; queries are
    the small side by operator contract). Reads ONLY the union of the
    queries' 8 (band, key) partitions; recall is exact for
    ``max_hamming`` ≤ 7 (pigeonhole over 8 bands — asserted). Returns a
    Dataset (query_id, id, hamming), each match once."""
    import os

    import ray
    import ray.data as rd

    from .dedup import _popcount_u64
    from .exchange import hash_group_apply

    assert max_hamming <= 7, "8x8-bit banding only guarantees d <= 7"
    q = np.asarray(query_hashes, dtype=np.uint64)
    qids = (np.arange(len(q)) if query_ids is None
            else np.asarray(query_ids)).astype(np.int64)
    out_schema = pa.schema([("query_id", pa.int64()),
                            (id_col, pa.int64()),
                            ("hamming", pa.int64())])
    if not len(q):
        return rd.from_arrow(out_schema.empty_table())

    bk2q: dict[tuple[int, int], list[int]] = {}
    for pos in range(len(q)):
        for b in range(PHASH_BANDS):
            key = int((q[pos] >> np.uint64(8 * b)) & np.uint64(0xFF))
            bk2q.setdefault((b, key), []).append(pos)
    files = []
    for b, key in sorted(bk2q):
        d = os.path.join(index_dir, f"band={b}", f"key={key}")
        if os.path.isdir(d):
            files.extend(os.path.join(d, fn) for fn in sorted(os.listdir(d))
                         if fn.endswith(".parquet"))
    if not files:
        return rd.from_arrow(out_schema.empty_table())
    ref = ray.put((q, qids, {k: np.asarray(v, np.int64)
                             for k, v in bk2q.items()}))

    def probe(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        qm, qi, lookup = ray.get(ref)
        # partition columns materialize as STRINGS on read-back
        band = pc.cast(tbl.column("band"), pa.int64()).to_numpy(
            zero_copy_only=False)
        key = pc.cast(tbl.column("key"), pa.int64()).to_numpy(
            zero_copy_only=False)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        sig = tbl.column("phash").to_numpy(zero_copy_only=False
                                           ).astype(np.uint64)
        oq, oi, oh = [], [], []
        bk = band.astype(np.int64) * 256 + key
        order = np.argsort(bk, kind="stable")
        bounds = np.flatnonzero(np.diff(bk[order])) + 1
        for seg in np.split(order, bounds):
            b, k = int(band[seg[0]]), int(key[seg[0]])
            qpos = lookup.get((b, k))
            if qpos is None:
                continue
            # queries-in-bucket × rows-in-bucket popcount verify
            d = _popcount_u64(qm[qpos][:, None] ^ sig[seg][None, :])
            ii, jj = np.nonzero(d <= max_hamming)
            oq.extend(qi[qpos[ii]].tolist())
            oi.extend(ids[seg][jj].tolist())
            oh.extend(d[ii, jj].astype(np.int64).tolist())
        return pa.table({"query_id": pa.array(oq, pa.int64()),
                         id_col: pa.array(oi, pa.int64()),
                         "hamming": pa.array(oh, pa.int64())})

    # partition columns come back as dictionary/int columns on read —
    # select explicitly so probe sees band/key/id/phash
    cands = rd.read_parquet(files).map_batches(probe,
                                               batch_format="pyarrow")
    return hash_group_apply(
        cands, ["query_id", id_col],
        lambda g: g.drop_duplicates(subset=["query_id", id_col]),
        out_schema=out_schema)


def compact_phash_index(index_dir: str) -> int:
    """Rewrite the band=/key= partition tree to ~one file per
    partition (each update lands one file set per touched partition;
    search unions a partition's files, so compaction is pure layout
    maintenance — search bit-equal before/after, the
    compact_minhash_index stance). ``_meta.json`` is untouched
    (pyarrow dataset discovery ignores ``_``-prefixed files). Returns
    the parquet file count after compaction."""
    import os
    import shutil

    import ray.data as rd

    tmp = index_dir + ".compact"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    (rd.read_parquet(index_dir)
     .sort(["band", "key"])
     .write_parquet(tmp, partition_cols=["band", "key"]))
    for ent in sorted(os.listdir(index_dir)):
        if ent.startswith("band="):
            shutil.rmtree(os.path.join(index_dir, ent))
    for ent in sorted(os.listdir(tmp)):
        if ent.startswith("band="):
            os.replace(os.path.join(tmp, ent),
                       os.path.join(index_dir, ent))
    shutil.rmtree(tmp, ignore_errors=True)
    n = 0
    for _root, _dirs, files in os.walk(index_dir):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n
