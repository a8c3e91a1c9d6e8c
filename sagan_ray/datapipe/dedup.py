"""Deduplication operators over a documents table (doc_id, text, ...).

Shapes (ray_guide 'Aggregation at scale' / MinHash-LSH pattern):
- exact: content-hash per batch (vectorized) → groupby(hash) → keep first.
  Only the 16-byte hash + id cross the shuffle, never the text.
- MinHash-LSH: shingle→minhash signature per batch → explode to
  (band, band_hash, doc_id) rows → groupby bands → candidate pairs →
  verify true Jaccard. Signature math is vectorized numpy universal
  hashing; determinism comes from fixed seeds.
- SimHash: 64-bit signature, banded into 4×16-bit keys so any pair within
  Hamming distance 3 shares at least one band bucket.
- embedding cosine: normalize per batch; candidate generation via random
  hyperplane LSH buckets; exact cosine verify within buckets.
"""

from __future__ import annotations

import hashlib
import itertools
import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"\S+")

_MERSENNE = (1 << 61) - 1


def _hash_texts_md5(texts) -> list[str]:
    return [hashlib.md5(t.encode("utf-8", "surrogatepass")).hexdigest() for t in texts]


# ----------------------------------------------------------------------
# exact dedup
# ----------------------------------------------------------------------

def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the smallest id per distinct text. Returns the surviving rows
    (all original columns). Only the 16-byte content hash partitions the
    exchange; within a bucket texts are exact-compared (collision-safe)."""
    from .exchange import hash_group_apply

    def add_hash(tbl: pa.Table) -> pa.Table:
        texts = tbl.column(text_col).to_pylist()
        return tbl.append_column("__h", pa.array(_hash_texts_md5(texts)))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        return (g.drop_duplicates(subset=[text_col], keep="first")
                 .drop(columns=["__h"]))

    return hash_group_apply(ds.map_batches(add_hash, batch_format="pyarrow"),
                            ["__h"], keep_first)


# ----------------------------------------------------------------------
# shingling + minhash
# ----------------------------------------------------------------------

# word → stable 64-bit hash, memoized per process (vocabulary is small
# relative to corpus; blake2b only runs once per distinct word)
_WORD_HASHES: dict[str, int] = {}
_HORNER = np.uint64(1099511628211)


def _word_hash(w: str) -> int:
    h = _WORD_HASHES.get(w)
    if h is None:
        if len(_WORD_HASHES) > 2_000_000:
            _WORD_HASHES.clear()
        h = int.from_bytes(hashlib.blake2b(w.encode("utf-8", "surrogatepass"),
                                           digest_size=8).digest(), "little")
        _WORD_HASHES[w] = h
    return h


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Deterministic 61-bit hashes of word k-shingles — vectorized Horner
    combine over memoized per-word hashes (no per-shingle digest)."""
    words = _WORD_RE.findall(text.lower())
    if not words:
        return np.array([_word_hash("") % _MERSENNE], dtype=np.uint64)
    wh = np.fromiter((_word_hash(w) for w in words), dtype=np.uint64,
                     count=len(words))
    if len(words) < k:
        acc = wh[0]
        for j in range(1, len(words)):
            acc = acc * _HORNER + wh[j]
        return np.array([acc % _MERSENNE], dtype=np.uint64)
    n = len(words) - k + 1
    acc = wh[:n].copy()
    for j in range(1, k):
        acc = acc * _HORNER + wh[j:j + n]     # uint64 wraparound is the mod
    return acc % _MERSENNE


def _minhash_params(n_perm: int, seed: int = 1234):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def _signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(shingles) == 0:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    # (n_perm, n_shingles) universal hash, min per row — vectorized
    x = shingles.astype(np.uint64)
    h = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE
    return h.min(axis=1)


def minhash_lsh_candidates(ds, *, text_col: str = "text", id_col: str = "doc_id",
                           k: int = 3, n_perm: int = 64, bands: int = 16,
                           seed: int = 1234):
    """Candidate pair Dataset (a, b) with a < b from LSH band collisions."""
    assert n_perm % bands == 0
    rows_per_band = n_perm // bands
    a_p, b_p = _minhash_params(n_perm, seed)

    def sig_batch(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_pylist()
        texts = tbl.column(text_col).to_pylist()
        out_id, out_band, out_key = [], [], []
        for i, t in zip(ids, texts):
            sig = _signature(_shingle_hashes(t, k), a_p, b_p)
            for band in range(bands):
                chunk = sig[band * rows_per_band:(band + 1) * rows_per_band]
                key = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out_id.append(i)
                out_band.append(band)
                out_key.append(key)
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "band": pa.array(out_band, pa.int32()),
                         "key": pa.array(out_key, pa.string())})

    def pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # all rows of each (band, key) group are in this bucket: sort,
        # find boundaries, pair within groups of ≥2
        df = df.sort_values(["band", "key", id_col], kind="mergesort")
        keys = (df["band"].astype(str) + "|" + df["key"].astype(str)).to_numpy()
        ids = df[id_col].to_numpy()
        out_a, out_b = [], []
        start = 0
        for i in range(1, len(df) + 1):
            if i == len(df) or keys[i] != keys[start]:
                if i - start > 1:
                    grp = sorted(set(ids[start:i].tolist()))
                    for x, y in itertools.combinations(grp, 2):
                        out_a.append(x)
                        out_b.append(y)
                start = i
        return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                             "b": pd.Series(out_b, dtype="int64")})

    from .exchange import hash_group_apply

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    cands = hash_group_apply(ds.map_batches(sig_batch, batch_format="pyarrow"),
                             ["band", "key"], pairs_bucket,
                             out_schema=pair_schema)
    # distinct pairs (a pair can collide in several bands)
    return hash_group_apply(cands, ["a", "b"],
                            lambda g: g.drop_duplicates(),
                            out_schema=pair_schema)


def _jaccard(t1: str, t2: str, k: int = 3) -> float:
    s1 = set(_shingle_hashes(t1, k).tolist())
    s2 = set(_shingle_hashes(t2, k).tolist())
    if not s1 and not s2:
        return 1.0
    return len(s1 & s2) / max(1, len(s1 | s2))


def minhash_lsh_dedup(ds, *, threshold: float = 0.8, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 3, n_perm: int = 64,
                      bands: int = 16):
    """Verified near-dup pairs: LSH candidates whose true shingle Jaccard
    ≥ threshold. Texts for verification ride a broadcast id→text lookup
    (fine while the candidate set is small relative to the corpus; at
    100 TB the verify stage would join against the corpus by id instead)."""
    import ray

    cands = minhash_lsh_candidates(ds, text_col=text_col, id_col=id_col,
                                   k=k, n_perm=n_perm, bands=bands)
    # ONE execution for the id→text lookup — two separate .to_pandas()
    # calls can deliver blocks in different orders and mis-zip the pairs
    lookup_df = ds.select_columns([id_col, text_col]).to_pandas()
    texts_ref = ray.put(dict(zip(lookup_df[id_col], lookup_df[text_col])))

    def verify(tbl: pa.Table) -> pa.Table:
        lookup = ray.get(texts_ref)
        a = tbl.column("a").to_pylist()
        b = tbl.column("b").to_pylist()
        sims = [_jaccard(lookup[x], lookup[y], k) for x, y in zip(a, b)]
        out = tbl.append_column("jaccard", pa.array(sims, pa.float64()))
        import pyarrow.compute as pc
        return out.filter(pc.greater_equal(out.column("jaccard"), threshold))

    return cands.map_batches(verify, batch_format="pyarrow")


def ngram_jaccard_pairs(ds, *, threshold: float = 0.5, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3):
    """Exact n-gram Jaccard similar pairs via inverted-shingle join: explode
    (shingle_hash → id), groupby shingle, pair within posting lists, count
    co-occurrences, normalize by set sizes. Exact (no LSH approximation);
    cost bounded by posting-list sizes."""

    def explode(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_pylist()
        texts = tbl.column(text_col).to_pylist()
        oid, osh, osz = [], [], []
        for i, t in zip(ids, texts):
            sh = np.unique(_shingle_hashes(t, k))
            oid.extend([i] * len(sh))
            osh.extend(sh.tolist())
            osz.extend([len(sh)] * len(sh))
        return pa.table({id_col: pa.array(oid, pa.int64()),
                         "sh": pa.array(osh, pa.uint64()),
                         "size": pa.array(osz, pa.int64())})

    def postings_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sh", id_col], kind="mergesort")
        sh = df["sh"].to_numpy()
        ids = df[id_col].to_numpy()
        sizes = df["size"].to_numpy()
        out = []
        start = 0
        for i in range(1, len(df) + 1):
            if i == len(df) or sh[i] != sh[start]:
                if i - start > 1:
                    rows = sorted(set(zip(ids[start:i].tolist(),
                                          sizes[start:i].tolist())))
                    for x, y in itertools.combinations(rows, 2):
                        out.append((x[0], y[0], x[1], y[1]))
                start = i
        return pd.DataFrame(out, columns=["a", "b", "sa", "sb"]).astype(
            {"a": "int64", "b": "int64", "sa": "int64", "sb": "int64"})

    def finish_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # count co-occurrences per (a,b): vectorized groupby-size
        g = (df.groupby(["a", "b", "sa", "sb"], sort=False)
               .size().reset_index(name="inter"))
        j = g["inter"] / (g["sa"] + g["sb"] - g["inter"]).clip(lower=1)
        g = g.assign(jaccard=j.astype("float64"))
        g = g[g["jaccard"] >= threshold]
        return g[["a", "b", "jaccard"]].astype(
            {"a": "int64", "b": "int64", "jaccard": "float64"})

    from .exchange import hash_group_apply

    posts_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                              ("sa", pa.int64()), ("sb", pa.int64())])
    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("jaccard", pa.float64())])
    posts = hash_group_apply(ds.map_batches(explode, batch_format="pyarrow"),
                             ["sh"], postings_bucket, out_schema=posts_schema)
    return hash_group_apply(posts, ["a", "b"], finish_bucket,
                            out_schema=out_schema)


# ----------------------------------------------------------------------
# simhash
# ----------------------------------------------------------------------

def _simhash64(text: str) -> int:
    words = _WORD_RE.findall(text.lower())
    if not words:
        return 0
    wh = np.fromiter((_word_hash(w) for w in words), dtype=np.uint64,
                     count=len(words))
    # vectorized bit unpack: (n_words, 64) sign contributions
    bits = (wh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = np.where(bits.astype(bool), 1, -1).sum(axis=0)
    v = 0
    for i in range(64):
        if acc[i] > 0:
            v |= 1 << i
    return v


def simhash_dedup(ds, *, max_hamming: int = 3, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Pairs within Hamming distance ≤ max_hamming of 64-bit SimHash.
    Banding into 4×16-bit keys guarantees recall for distance ≤ 3
    (pigeonhole: 3 differing bits can touch at most 3 of 4 bands)."""

    def sig(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_pylist()
        texts = tbl.column(text_col).to_pylist()
        oid, oband, okey, osig = [], [], [], []
        for i, t in zip(ids, texts):
            s = _simhash64(t)
            for band in range(4):
                oid.append(i)
                oband.append(band)
                okey.append((s >> (band * 16)) & 0xFFFF)
                osig.append(s)
        return pa.table({id_col: pa.array(oid, pa.int64()),
                         "band": pa.array(oband, pa.int32()),
                         "key": pa.array(okey, pa.int64()),
                         "sig": pa.array(osig, pa.uint64())})

    def pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["band", "key", id_col], kind="mergesort")
        keys = (df["band"].astype(str) + "|" + df["key"].astype(str)).to_numpy()
        ids = df[id_col].to_numpy()
        sigs = df["sig"].to_numpy()
        out = []
        start = 0
        for i in range(1, len(df) + 1):
            if i == len(df) or keys[i] != keys[start]:
                if i - start > 1:
                    rows = sorted(set(zip(ids[start:i].tolist(),
                                          sigs[start:i].tolist())))
                    for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
                        d = bin(int(sa) ^ int(sb)).count("1")
                        if d <= max_hamming:
                            out.append((ia, ib, d))
                start = i
        return pd.DataFrame(out, columns=["a", "b", "hamming"]).astype(
            {"a": "int64", "b": "int64", "hamming": "int64"})

    from .exchange import hash_group_apply

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("hamming", pa.int64())])
    cands = hash_group_apply(ds.map_batches(sig, batch_format="pyarrow"),
                             ["band", "key"], pairs_bucket,
                             out_schema=pair_schema)
    return hash_group_apply(cands, ["a", "b"],
                            lambda g: g.drop_duplicates(subset=["a", "b"]),
                            out_schema=pair_schema)


# ----------------------------------------------------------------------
# embedding near-dup
# ----------------------------------------------------------------------

def embedding_near_dup(ds, *, threshold: float = 0.95, vec_col: str = "embedding",
                       id_col: str = "vec_id", n_planes: int = 8, seed: int = 7,
                       dim: int | None = None):
    """Cosine-similar pairs via random-hyperplane LSH buckets + exact
    verification inside each bucket. Recall is probabilistic; n_planes=8
    gives 256 buckets. For guaranteed-exact small-scale checks use the
    brute-force path in tests."""
    rng = np.random.default_rng(seed)
    planes = None

    def bucketize(tbl: pa.Table) -> pa.Table:
        nonlocal planes
        vecs = np.asarray(tbl.column(vec_col).to_pylist(), dtype=np.float32)
        if planes is None:
            planes = np.random.default_rng(seed).standard_normal(
                (vecs.shape[1], n_planes)).astype(np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        signs = (unit @ planes) > 0
        bucket = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        return pa.table({id_col: tbl.column(id_col),
                         "bucket": pa.array(bucket),
                         "unit": pa.array(unit.tolist(),
                                          pa.list_(pa.float32()))})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        mat = np.asarray(g["unit"].tolist(), dtype=np.float32)
        sims = mat @ mat.T
        ii, jj = np.where(np.triu(sims, 1) >= threshold)
        if len(ii) == 0:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        a = np.minimum(ids[ii], ids[jj])
        b = np.maximum(ids[ii], ids[jj])
        return pd.DataFrame({"a": a, "b": b,
                             "cosine": sims[ii, jj].astype(np.float64)})

    return (ds.map_batches(bucketize, batch_format="pyarrow")
              .groupby("bucket").map_groups(pairs, batch_format="pandas"))
